"""Native C++ marshalling vs the numpy fallback (must agree bit-for-bit)."""

import numpy as np
import pytest

from qserve_tpu import native


@pytest.fixture(scope="module")
def has_native():
    return native.get_lib() is not None


def _both(fn_args_kw):
    """Run a native.pack_* call with and without the native lib."""
    fn, args, kw = fn_args_kw
    lib_out = fn(*args, **kw)
    saved, native._lib = native._lib, None
    saved_tried, native._tried = native._tried, True
    try:
        py_out = fn(*args, **kw)
    finally:
        native._lib, native._tried = saved, saved_tried
    return lib_out, py_out


class TestPackDecode:
    def test_matches_fallback(self, has_native):
        if not has_native:
            pytest.skip("no toolchain")
        args = (
            [5, 6, 7], [10, 200, 33],
            [[1, 2], [3, 4, 5, 6], [7]], 4, 5,
        )
        (t1, c1, b1), (t2, c2, b2) = _both((native.pack_decode, args, {}))
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(b1, b2)

    def test_shapes_and_padding(self):
        tok, ctx, bt = native.pack_decode([9], [3], [[2, 8]], B_pad=4, maxP=3)
        assert tok.tolist() == [9, 0, 0, 0]
        assert ctx.tolist() == [3, 0, 0, 0]
        assert bt.tolist() == [[2, 8, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0]]


class TestPackPrefill:
    def test_matches_fallback(self, has_native):
        if not has_native:
            pytest.skip("no toolchain")
        prompts = [[11, 12, 13, -200, -200, 14], [21, 22]]
        tables = [[0, 1, 2], [3]]
        args = (prompts, tables, 2, 16, 4)
        kw = dict(image_token=-200)
        out1, out2 = _both((native.pack_prefill, args, kw))
        for a, b in zip(out1[:-1], out2[:-1]):
            np.testing.assert_array_equal(a, b)
        assert out1[-1] == out2[-1] == 8

    def test_stream_layout(self):
        prompts = [[11, 12, 13], [21, 22]]
        tables = [[4, 5], [6]]
        tok, pos, seg, pg, sl, img, last, total = native.pack_prefill(
            prompts, tables, block_size=2, T_pad=8, B_pad=2
        )
        assert total == 5
        assert tok.tolist() == [11, 12, 13, 21, 22, 0, 0, 0]
        assert pos.tolist() == [0, 1, 2, 0, 1, 0, 0, 0]
        assert seg.tolist() == [1, 1, 1, 2, 2, 0, 0, 0]
        assert pg.tolist() == [4, 4, 5, 6, 6, -1, -1, -1]
        assert sl.tolist() == [0, 1, 0, 0, 1, 0, 0, 0]
        assert last.tolist() == [2, 4]

    def test_image_indices(self):
        prompts = [[1, -200, -200, 2], [-200, 3]]
        tables = [[0], [1]]
        tok, pos, seg, pg, sl, img, last, total = native.pack_prefill(
            prompts, tables, 8, 8, 2, image_token=-200
        )
        assert img.tolist() == [0, 0, 1, 0, 2, 0, 0, 0]
