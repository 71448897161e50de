"""End-to-end model tests on a tiny random Llama (CPU, XLA fallback ops)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.config import QuantSpec
from qserve_tpu.kernels import kv_cache as kvc
from qserve_tpu.models import llama

PAGE = 16  # small pages for tests


def tiny_args(precision="w16a16kv8", group_size=-1, scan=True):
    return llama.LlamaArgs(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=32,
        quant=QuantSpec.from_precision(precision, group_size),
        scan_layers=scan,
    )


@functools.lru_cache(maxsize=8)
def fixture(precision, group_size=-1, scan=True):
    args = tiny_args(precision, group_size, scan)
    fp = llama.random_float_params(jax.random.PRNGKey(0), args, scale=0.05)
    params = llama.quantize_params(fp, args)
    return args, fp, params


def make_cache(args, num_pages=32):
    return kvc.create_kv_cache(
        args.num_layers, num_pages, args.num_kv_heads, PAGE, args.head_dim,
        kv_bits=args.quant.kv_bits,
    )


def run_prefill(args, params, kv, tokens, block_table, pad_to=32):
    """Single sequence helper: tokens list -> (logits [V], kv)."""
    T = len(tokens)
    tok = np.zeros(pad_to, np.int32)
    tok[:T] = tokens
    pos = np.zeros(pad_to, np.int32)
    pos[:T] = np.arange(T)
    seg = np.zeros(pad_to, np.int32)
    seg[:T] = 1
    pages = np.full(pad_to, -1, np.int32)
    pages[:T] = block_table[np.arange(T) // PAGE]
    slots = np.zeros(pad_to, np.int32)
    slots[:T] = np.arange(T) % PAGE
    last = np.array([T - 1], np.int32)
    logits, kv = llama.prefill(
        params, kv, *map(jnp.asarray, (tok, pos, seg, pages, slots, last)), args
    )
    return logits[0], kv


def cos_sim(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


TOKENS = [3, 17, 92, 41, 7, 150, 23, 88, 200, 5, 66, 91, 12, 33, 77, 101, 9, 55]


class TestPrefillParity:
    @pytest.mark.parametrize("scan", [True, False])
    def test_w16_prefill_matches_float_reference(self, scan):
        args, fp, params = fixture("w16a16kv8", -1, scan)
        kv = make_cache(args)
        bt = np.array([0, 1, 2, 3], np.int32)
        logits, _ = run_prefill(args, params, kv, TOKENS, bt)
        ref = llama.reference_forward_float(fp, args, jnp.asarray(TOKENS))[-1]
        assert cos_sim(logits, ref) > 0.995

    def test_w8a8_prefill_close(self):
        args, fp, params = fixture("w8a8kv8")
        kv = make_cache(args)
        logits, _ = run_prefill(args, params, kv, TOKENS, np.arange(4, dtype=np.int32))
        ref = llama.reference_forward_float(fp, args, jnp.asarray(TOKENS))[-1]
        assert cos_sim(logits, ref) > 0.98

    @pytest.mark.parametrize("gs", [-1, 128])
    def test_w4a8_prefill_close(self, gs):
        args, fp, params = fixture("w4a8kv4", gs)
        kv = make_cache(args)
        logits, _ = run_prefill(args, params, kv, TOKENS, np.arange(4, dtype=np.int32))
        ref = llama.reference_forward_float(fp, args, jnp.asarray(TOKENS))[-1]
        assert cos_sim(logits, ref) > 0.90  # 4-bit noise on random weights


class TestDecodeParity:
    @pytest.mark.parametrize("precision,tol", [("w16a16kv8", 0.94), ("w8a8kv8", 0.93)])
    def test_decode_matches_reference_positions(self, precision, tol):
        """Decode step t tracks the float reference logits at position t.

        Tolerance is loose because decode reads the KV8-quantized cache while
        the reference is pure fp32 (same asymmetry as the reference engine);
        random ~N(0, 0.05) weights amplify relative quant noise. Exact paging
        correctness is covered by test_batched_decode_matches_single and
        test_decode_equals_growing_prefill.
        """
        args, fp, params = fixture(precision)
        kv = make_cache(args)
        bt = np.arange(4, dtype=np.int32)
        T0 = 8
        _, kv = run_prefill(args, params, kv, TOKENS[:T0], bt)
        ref_all = llama.reference_forward_float(fp, args, jnp.asarray(TOKENS))

        block_tables = jnp.asarray(bt)[None, :]
        for t in range(T0, len(TOKENS)):
            logits, kv = llama.decode(
                params, kv,
                jnp.asarray([TOKENS[t]], jnp.int32),
                block_tables,
                jnp.asarray([t + 1], jnp.int32),
                args,
            )
            assert cos_sim(logits[0], ref_all[t]) > tol, f"step {t}"

    def test_batched_decode_matches_single(self):
        """Two sequences decoded together == each decoded alone (paging)."""
        args, fp, params = fixture("w4a8kv4")
        toks_a, toks_b = TOKENS[:10], TOKENS[5:17]

        def single(toks, bt_rows):
            kv = make_cache(args)
            _, kv = run_prefill(args, params, kv, toks[:-1], bt_rows)
            logits, _ = llama.decode(
                params, kv,
                jnp.asarray([toks[-1]], jnp.int32),
                jnp.asarray(bt_rows)[None, :],
                jnp.asarray([len(toks)], jnp.int32),
                args,
            )
            return logits[0]

        la = single(toks_a, np.array([7, 3, 1, 0], np.int32))
        lb = single(toks_b, np.array([2, 9, 4, 6], np.int32))

        # batched: prefill both into one cache (packed), then decode together
        kv = make_cache(args)
        bt_a = np.array([7, 3, 1, 0], np.int32)
        bt_b = np.array([2, 9, 4, 6], np.int32)
        _, kv = run_prefill(args, params, kv, toks_a[:-1], bt_a, pad_to=32)
        _, kv = run_prefill(args, params, kv, toks_b[:-1], bt_b, pad_to=32)
        logits, _ = llama.decode(
            params, kv,
            jnp.asarray([toks_a[-1], toks_b[-1]], jnp.int32),
            jnp.asarray(np.stack([bt_a, bt_b])),
            jnp.asarray([len(toks_a), len(toks_b)], jnp.int32),
            args,
        )
        assert cos_sim(la, logits[0]) > 0.9999
        assert cos_sim(lb, logits[1]) > 0.9999

    def test_pad_rows_are_inert(self):
        """A padded (context_len=0) row must not disturb real rows or cache."""
        args, fp, params = fixture("w4a8kv4")
        kv = make_cache(args)
        bt = np.array([0, 1, 2, 3], np.int32)
        _, kv = run_prefill(args, params, kv, TOKENS[:9], bt)

        bt1 = jnp.asarray(bt)[None, :]
        l1, kv1 = llama.decode(
            params, kv, jnp.asarray([TOKENS[9]], jnp.int32), bt1,
            jnp.asarray([10], jnp.int32), args,
        )
        bt2 = jnp.asarray(np.stack([bt, np.zeros(4, np.int32)]))
        l2, kv2 = llama.decode(
            params, kv, jnp.asarray([TOKENS[9], 0], jnp.int32), bt2,
            jnp.asarray([10, 0], jnp.int32), args,
        )
        np.testing.assert_allclose(
            np.asarray(l1[0]), np.asarray(l2[0]), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(kv1.data), np.asarray(kv2.data)
        )

    def test_decode_equals_growing_prefill(self):
        """Incremental decode == full re-prefill of the grown sequence.

        Both paths read/write the same quantized KV pages for *past* tokens?
        No — prefill attends fp K/V while decode reads the quantized cache,
        so compare the *information flow*: positions, paging, masking. With
        KV8 the quant noise is small, so logits must correlate > 0.99 and
        greedy tokens must agree at every step.
        """
        args, fp, params = fixture("w16a16kv8")
        bt = np.arange(4, dtype=np.int32)
        seq = TOKENS[:8]
        # incremental path
        kv = make_cache(args)
        _, kv = run_prefill(args, params, kv, seq, bt)
        block_tables = jnp.asarray(bt)[None, :]
        agree = 0
        steps = range(8, 14)
        for t in steps:
            tok = TOKENS[t]
            logits_dec, kv = llama.decode(
                params, kv, jnp.asarray([tok], jnp.int32), block_tables,
                jnp.asarray([t + 1], jnp.int32), args,
            )
            # full re-prefill path
            kv2 = make_cache(args)
            logits_pre, _ = run_prefill(args, params, kv2, TOKENS[: t + 1], bt)
            assert cos_sim(logits_dec[0], logits_pre) > 0.94, f"step {t}"
            agree += int(jnp.argmax(logits_dec[0])) == int(jnp.argmax(logits_pre))
        # KV8-vs-fp noise on random weights may flip an occasional close
        # argmax race; a positional/paging bug would flip nearly all.
        assert agree >= len(steps) - 1, f"only {agree}/{len(steps)} greedy agreements"

    def test_scan_equals_unrolled(self):
        args_s, fp, params_s = fixture("w4a8kv4", -1, True)
        args_u, _, params_u = fixture("w4a8kv4", -1, False)
        kv_s, kv_u = make_cache(args_s), make_cache(args_u)
        bt = np.arange(4, dtype=np.int32)
        ls, _ = run_prefill(args_s, params_s, kv_s, TOKENS[:8], bt)
        lu, _ = run_prefill(args_u, params_u, kv_u, TOKENS[:8], bt)
        # scan vs unrolled changes XLA fusion order -> different f32 rounding,
        # amplified by the int8 requant steps; semantics must still agree.
        assert cos_sim(ls, lu) > 0.999


class TestGreedyGeneration:
    def test_greedy_decode_deterministic(self):
        args, fp, params = fixture("w4a8kv4")
        kv = make_cache(args)
        bt = np.arange(4, dtype=np.int32)
        logits, kv = run_prefill(args, params, kv, TOKENS[:6], bt)
        out = []
        tok = int(jnp.argmax(logits))
        block_tables = jnp.asarray(bt)[None, :]
        for t in range(6, 14):
            out.append(tok)
            logits, kv = llama.decode(
                params, kv, jnp.asarray([tok], jnp.int32), block_tables,
                jnp.asarray([t + 1], jnp.int32), args,
            )
            tok = int(jnp.argmax(logits[0]))
        assert all(0 <= t < args.vocab_size for t in out)
        assert np.isfinite(np.asarray(logits)).all()


class TestQuantLmHead:
    """lm_head_bits=8: W8 per-channel logits GEMM (beyond-reference option)."""

    def test_w8_lm_head_logits_close_to_bf16(self):
        args16, fp, params16 = fixture("w16a16kv8")
        quant8 = QuantSpec.from_precision("w16a16kv8", lm_head_bits=8)
        import dataclasses as _dc
        args8 = _dc.replace(args16, quant=quant8)
        params8 = llama.quantize_params(fp, args8)
        from qserve_tpu.layers import linear as lin
        assert isinstance(params8.lm_head, lin.W8Linear)

        kv16 = make_cache(args16)
        kv8 = make_cache(args8)
        bt = np.array([0, 1, 2, 3], np.int32)
        l16, _ = run_prefill(args16, params16, kv16, TOKENS, bt)
        l8, _ = run_prefill(args8, params8, kv8, TOKENS, bt)
        assert cos_sim(l16, l8) > 0.999
        # greedy tokens agree on a well-separated distribution
        assert int(jnp.argmax(l16)) == int(jnp.argmax(l8))

    def test_w8_lm_head_nll_close(self):
        args16, fp, params16 = fixture("w16a16kv8")
        import dataclasses as _dc
        quant8 = QuantSpec.from_precision("w16a16kv8", lm_head_bits=8)
        args8 = _dc.replace(args16, quant=quant8)
        params8 = llama.quantize_params(fp, args8)
        tok = np.zeros(64, np.int32)
        tok[:len(TOKENS)] = TOKENS
        n16, c16 = llama.teacher_forced_nll(
            params16, jnp.asarray(tok), jnp.int32(len(TOKENS)), args16,
            row_chunk=16)
        n8, c8 = llama.teacher_forced_nll(
            params8, jnp.asarray(tok), jnp.int32(len(TOKENS)), args8,
            row_chunk=16)
        assert int(c16) == int(c8)
        assert abs(float(n16) - float(n8)) / max(float(n16), 1e-9) < 0.02
