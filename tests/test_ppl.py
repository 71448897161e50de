"""Perplexity harness tests: teacher-forced NLL vs the float reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.config import QuantSpec
from qserve_tpu.eval.ppl import evaluate_ppl
from qserve_tpu.models import llama

TINY = dict(
    vocab_size=256, hidden_size=128, intermediate_size=256,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
)


def _nll_from_logits(logits, tokens):
    """Naive NLL of tokens[1:] from full [T, V] logits."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tl = jnp.take_along_axis(logp[:-1], tokens[1:, None], axis=-1)[:, 0]
    return -jnp.sum(tl)


@pytest.fixture(scope="module")
def tiny_setup():
    args16 = llama.LlamaArgs(**TINY, quant=QuantSpec.from_precision("w16a16kv8"))
    fp = llama.random_float_params(jax.random.PRNGKey(0), args16, scale=0.05)
    return args16, fp


def test_teacher_forced_nll_matches_float_reference(tiny_setup):
    args16, fp = tiny_setup
    params = llama.quantize_params(fp, args16)
    T = 64
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 256, T), jnp.int32)

    nll, cnt = llama.teacher_forced_nll(params, tokens, jnp.int32(T), args16,
                                        row_chunk=16)
    ref_logits = llama.reference_forward_float(fp, args16, tokens)
    ref_nll = _nll_from_logits(ref_logits, tokens)
    assert int(cnt) == T - 1
    # w16a16 path is bf16 weights; allow ~1% relative tolerance
    assert abs(float(nll) - float(ref_nll)) / max(float(ref_nll), 1.0) < 0.02


def test_nll_respects_length_mask(tiny_setup):
    args16, fp = tiny_setup
    params = llama.quantize_params(fp, args16)
    rng = np.random.default_rng(1)
    tokens = np.zeros(64, np.int32)
    tokens[:40] = rng.integers(0, 256, 40)

    nll_a, cnt_a = llama.teacher_forced_nll(
        params, jnp.asarray(tokens), jnp.int32(40), args16, row_chunk=16
    )
    # garbage in the padded tail must not change the score
    tokens2 = tokens.copy()
    tokens2[40:] = rng.integers(0, 256, 24)
    nll_b, cnt_b = llama.teacher_forced_nll(
        params, jnp.asarray(tokens2), jnp.int32(40), args16, row_chunk=16
    )
    assert int(cnt_a) == int(cnt_b) == 39
    np.testing.assert_allclose(float(nll_a), float(nll_b), rtol=1e-5)


def test_quantized_ppl_close_to_float(tiny_setup):
    args16, fp = tiny_setup
    argsq = llama.LlamaArgs(**TINY, quant=QuantSpec.from_precision("w4a8kv4"))
    pq = llama.quantize_params(fp, argsq)
    p16 = llama.quantize_params(fp, args16)

    ids = np.random.default_rng(2).integers(0, 256, 256).astype(np.int32)
    ppl_q = evaluate_ppl(pq, argsq, ids, seqlen=128, row_chunk=32)
    ppl_f = evaluate_ppl(p16, args16, ids, seqlen=128, row_chunk=32)
    assert np.isfinite(ppl_q) and np.isfinite(ppl_f)
    # random tiny model: quantization shifts PPL slightly, not wildly
    assert abs(ppl_q - ppl_f) / ppl_f < 0.2


def test_evaluate_ppl_windows(tiny_setup):
    args16, fp = tiny_setup
    params = llama.quantize_params(fp, args16)
    ids = np.random.default_rng(3).integers(0, 256, 300).astype(np.int32)
    # 300 tokens, seqlen 128 -> 2 windows; max_windows caps it to 1
    p2 = evaluate_ppl(params, args16, ids, seqlen=128, row_chunk=32)
    p1 = evaluate_ppl(params, args16, ids, seqlen=128, max_windows=1, row_chunk=32)
    assert np.isfinite(p2) and np.isfinite(p1)
    assert p1 != p2
