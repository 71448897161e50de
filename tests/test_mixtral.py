"""Mixtral sparse-MoE tests: routing math, parity vs float reference, engine."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
from qserve_tpu.kernels import kv_cache as kvc
from qserve_tpu.models import llama, mixtral

TINY = dict(
    vocab_size=128, hidden_size=64, intermediate_size=96,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    num_experts=4, moe_top_k=2,
)


def tiny_args(precision="w16a16kv8", gs=-1):
    return llama.LlamaArgs(**TINY, quant=QuantSpec.from_precision(precision, gs))


@pytest.fixture(scope="module")
def float_params():
    return mixtral.random_float_params(
        jax.random.PRNGKey(0), tiny_args(), scale=0.08
    )


def _run_prefill(params, args, tokens):
    T = len(tokens)
    kv = kvc.create_kv_cache(args.num_layers, 4, args.num_kv_heads, 16,
                             args.head_dim, args.quant.kv_bits)
    tok = np.zeros(16, np.int32); tok[:T] = tokens
    pos = np.zeros(16, np.int32); pos[:T] = np.arange(T)
    seg = np.zeros(16, np.int32); seg[:T] = 1
    pages = np.full(16, -1, np.int32); pages[:T] = 0
    slots = np.zeros(16, np.int32); slots[:T] = np.arange(T)
    logits, _ = llama.prefill(
        params, kv, *map(jnp.asarray, (tok, pos, seg, pages, slots,
                                       np.array([T - 1], np.int32))),
        tiny_args() if False else args,
    )
    return np.asarray(logits[0], np.float32)


class TestMoEParity:
    def test_w16_matches_float_reference(self, float_params):
        args = tiny_args("w16a16kv8")
        params = mixtral.quantize_params(float_params, args)
        tokens = [3, 17, 42, 7, 99]
        ours = _run_prefill(params, args, tokens)
        ref = llama.reference_forward_float(
            float_params, args, jnp.asarray(tokens, jnp.int32)
        )
        ref_last = np.asarray(ref[-1], np.float32)
        # bf16 weights + KV8 cache vs f32 reference
        assert np.abs(ours - ref_last).max() < 0.05 * max(np.abs(ref_last).max(), 1)
        # same top-1 prediction
        assert ours.argmax() == ref_last.argmax()

    @pytest.mark.parametrize("precision", ["w4a8kv4", "w8a8kv8"])
    def test_quantized_close(self, float_params, precision):
        args = tiny_args(precision)
        params = mixtral.quantize_params(float_params, args)
        tokens = [3, 17, 42, 7, 99]
        ours = _run_prefill(params, args, tokens)
        ref = np.asarray(
            llama.reference_forward_float(
                float_params, args, jnp.asarray(tokens, jnp.int32)
            )[-1],
            np.float32,
        )
        # quantization noise but same scale of outputs
        denom = max(np.abs(ref).max(), 1e-3)
        assert np.abs(ours - ref).max() / denom < 0.35

    def test_decode_runs(self, float_params):
        args = tiny_args("w4a8kv4")
        params = mixtral.quantize_params(float_params, args)
        kv = kvc.create_kv_cache(args.num_layers, 4, args.num_kv_heads, 16,
                                 args.head_dim, 4)
        bt = jnp.asarray([[0, 1]], jnp.int32)
        logits, kv = llama.decode(
            params, kv, jnp.asarray([5], jnp.int32), bt,
            jnp.asarray([1], jnp.int32), args,
        )
        assert np.isfinite(np.asarray(logits, np.float32)).all()


class TestRouting:
    @pytest.mark.parametrize(
        "precision,gs",
        [("w4a8kv4", -1), ("w4a8kv4", 32), ("w8a8kv8", -1),
         ("w16a16kv8", -1)],
    )
    def test_routed_dispatch_matches_dense(self, float_params, precision, gs):
        """The grouped-GEMM routed MoE dispatch (prefill) must reproduce the
        masked dense loop: same experts, same math, different schedule."""
        import dataclasses

        args = tiny_args(precision, gs)
        params = mixtral.quantize_params(float_params, args)
        rng = np.random.default_rng(3)
        T = 64
        h = jnp.asarray(rng.standard_normal((T, args.hidden_size)) * 0.3,
                        jnp.bfloat16)
        args_dense = dataclasses.replace(args, moe_route_min_tokens=10**9)
        args_routed = dataclasses.replace(
            args, moe_route_min_tokens=1, moe_route_block=16
        )
        lp = params.layers[0] if not args.scan_layers else jax.tree.map(
            lambda a: a, params.layers
        )
        int8_act = args.quant.act_bits == 8
        gs = args.quant.group_size if args.quant.group_size > 0 else 128
        li = jnp.int32(0)
        dense = llama._moe_mlp(lp, h, args_dense, int8_act, gs, li=li,
                               stacked=args.scan_layers)
        routed = llama._moe_mlp(lp, h, args_routed, int8_act, gs, li=li,
                                stacked=args.scan_layers)
        d = np.asarray(dense, np.float32)
        r = np.asarray(routed, np.float32)
        assert np.abs(d - r).max() < 1e-3 * max(np.abs(d).max(), 1.0), (
            np.abs(d - r).max()
        )

    def test_routed_prefill_generation_matches_dense(self, float_params):
        """End-to-end prefill through the routed dispatch == dense loop."""
        import dataclasses

        args = tiny_args("w4a8kv4")
        params = mixtral.quantize_params(float_params, args)
        tokens = [3, 17, 42, 7, 99, 5, 23, 81]
        dense_logits = _run_prefill(params, args, tokens)
        args_r = dataclasses.replace(
            args, moe_route_min_tokens=1, moe_route_block=16
        )
        routed_logits = _run_prefill(params, args_r, tokens)
        assert np.abs(dense_logits - routed_logits).max() < 1e-2 * max(
            np.abs(dense_logits).max(), 1.0
        )

    def test_topk_weights_normalized_and_sparse(self):
        """_moe_mlp must weight exactly top-k experts, renormalized."""
        args = tiny_args("w16a16kv8")
        T, E, NE = 4, args.hidden_size, args.num_experts
        key = jax.random.PRNGKey(1)
        fp = mixtral.random_float_params(key, args, scale=0.1)
        params = mixtral.quantize_params(fp, args)
        lp = jax.tree.map(lambda a: a[0], params.layers)  # layer 0

        h = jax.random.normal(key, (T, E), jnp.bfloat16) * 0.3
        out = llama._moe_mlp(lp, h, args, int8_act=False, gs=128)

        # manual: float expert mix on the rmsnorm'd input
        from qserve_tpu.kernels import ops

        x = ops.rmsnorm(h, lp.post_ln, args.rms_eps)
        logits = np.asarray(
            ops.matmul(x, lp.router.astype(jnp.bfloat16), jnp.float32)
        )
        probs = jax.nn.softmax(jnp.asarray(logits), -1)
        topv, topi = jax.lax.top_k(probs, args.moe_top_k)
        topv = topv / jnp.sum(topv, -1, keepdims=True)
        expect = np.zeros((T, E), np.float32)
        from qserve_tpu.layers import linear as lin

        for e in range(NE):
            e_gu = jax.tree.map(lambda a: a[e], lp.gate_up)
            e_dn = jax.tree.map(lambda a: a[e], lp.down)
            gu = lin.apply_linear(e_gu, x, 128)
            d = np.asarray(
                lin.apply_linear(e_dn, ops.silu_mul(gu), 128), np.float32
            )
            w = np.asarray(jnp.sum(jnp.where(topi == e, topv, 0.0), -1))
            expect += w[:, None] * d
        np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-2, atol=2e-3)


class TestMixtralLoader:
    def test_hf_roundtrip(self, tmp_path):
        from safetensors.numpy import save_file

        args = tiny_args("w8a8kv8")
        rng = np.random.default_rng(0)
        E, I, V, NE = 64, 96, 128, 4
        cfg = dict(
            architectures=["MixtralForCausalLM"], vocab_size=V, hidden_size=E,
            intermediate_size=I, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_local_experts=NE, num_experts_per_tok=2,
            rope_theta=1e6, rms_norm_eps=1e-5,
        )
        d = tmp_path / "mixtral"
        d.mkdir()
        with open(d / "config.json", "w") as f:
            json.dump(cfg, f)
        state = {
            "model.embed_tokens.weight": rng.standard_normal((V, E), np.float32) * .05,
            "model.norm.weight": np.ones(E, np.float32),
            "lm_head.weight": rng.standard_normal((V, E), np.float32) * .05,
        }
        for li in range(2):
            p = f"model.layers.{li}"
            state.update({
                f"{p}.input_layernorm.weight": np.ones(E, np.float32),
                f"{p}.post_attention_layernorm.weight": np.ones(E, np.float32),
                f"{p}.self_attn.q_proj.weight": rng.standard_normal((E, E), np.float32) * .05,
                f"{p}.self_attn.k_proj.weight": rng.standard_normal((32, E), np.float32) * .05,
                f"{p}.self_attn.v_proj.weight": rng.standard_normal((32, E), np.float32) * .05,
                f"{p}.self_attn.o_proj.weight": rng.standard_normal((E, E), np.float32) * .05,
                f"{p}.block_sparse_moe.gate.weight": rng.standard_normal((NE, E), np.float32) * .05,
            })
            for e in range(NE):
                q = f"{p}.block_sparse_moe.experts.{e}"
                state.update({
                    f"{q}.w1.weight": rng.standard_normal((I, E), np.float32) * .05,
                    f"{q}.w2.weight": rng.standard_normal((E, I), np.float32) * .05,
                    f"{q}.w3.weight": rng.standard_normal((I, E), np.float32) * .05,
                })
        save_file(state, str(d / "model.safetensors"))

        from qserve_tpu.models import loader

        args2, params = loader.load_model(str(d), QuantSpec.from_precision("w8a8kv8"))
        assert args2.num_experts == NE and args2.moe_top_k == 2
        assert isinstance(
            jax.tree.map(lambda a: a[0], params.layers), llama.MoELayerParams
        )
        out = _run_prefill(params, args2, [1, 2, 3])
        assert np.isfinite(out).all()


class TestMixtralEngine:
    def test_generation(self):
        from qserve_tpu.engine.llm_engine import LLMEngine
        from qserve_tpu.sampling_params import SamplingParams
        from qserve_tpu.worker.worker import Worker

        args = tiny_args("w4a8kv4")
        fp = mixtral.random_float_params(jax.random.PRNGKey(2), args, scale=0.08)
        params = mixtral.quantize_params(fp, args)
        cache = CacheConfig(block_size=16, num_device_pages=64,
                            quant=args.quant)
        sched = SchedulerConfig(max_num_batched_tokens=256, max_num_seqs=4,
                                max_model_len=64)
        worker = Worker.create(args, cache, sched, params=params)
        engine = LLMEngine(worker, sched, cache, tokenizer=None)
        engine.add_request("m0", prompt_token_ids=[1, 2, 3],
                           sampling_params=SamplingParams(
                               max_tokens=5, temperature=0.0, ignore_eos=True))
        outs = []
        steps = 0
        while engine.has_unfinished_requests() and steps < 20:
            outs.extend(engine.step())
            steps += 1
        done = [o for o in outs if o.finished]
        assert len(done) == 1
        assert len(done[0].outputs[0]["token_ids"]) == 5
