"""VLM pipeline tests: CLIP tower parity vs transformers, projector, splicing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.config import QuantSpec
from qserve_tpu.models import clip, llama, mm_projector, vila
from qserve_tpu.utils.constants import IMAGE_TOKEN_INDEX


class TestClipTower:
    @pytest.fixture(scope="class")
    def hf_pair(self):
        """Tiny torch CLIPVisionModel + our params built from its state dict."""
        import torch
        from transformers import CLIPVisionConfig, CLIPVisionModel

        cfg = CLIPVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=3,
            num_attention_heads=4, image_size=32, patch_size=8,
        )
        torch.manual_seed(0)
        model = CLIPVisionModel(cfg).eval()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        args = clip.VisionArgs.from_hf_config(cfg.to_dict())
        args = clip.VisionArgs(**{**args.__dict__, "compute_dtype": jnp.float32})
        params = clip.params_from_hf_state(state, args)
        return model, params, args

    def test_parity_with_transformers(self, hf_pair):
        import torch

        model, params, args = hf_pair
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)

        with torch.no_grad():
            hf_out = model(torch.from_numpy(img), output_hidden_states=True)
        ref = hf_out.hidden_states[-2][:, 1:].numpy()  # drop CLS, layer -2

        ours = np.asarray(clip.forward_features(params, jnp.asarray(img), args))
        assert ours.shape == ref.shape == (2, 16, 64)
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)

    def test_bf16_close(self, hf_pair):
        _, params, args = hf_pair
        args16 = clip.VisionArgs(**{**args.__dict__, "compute_dtype": jnp.bfloat16})
        img = jnp.asarray(np.random.default_rng(1).standard_normal((1, 3, 32, 32)),
                          jnp.float32)
        a = np.asarray(clip.forward_features(params, img, args))
        b = np.asarray(clip.forward_features(params, img, args16), np.float32)
        assert np.abs(a - b).max() / (np.abs(a).max() + 1e-6) < 0.1


class TestProjector:
    def test_linear(self):
        args = mm_projector.ProjectorArgs("linear", 64, 96, grid=4,
                                          compute_dtype=jnp.float32)
        p = mm_projector.random_params(jax.random.PRNGKey(0), args)
        x = jnp.ones((2, 16, 64))
        y = mm_projector.apply_projector(p, x, args)
        assert y.shape == (2, 16, 96)
        assert args.tokens_per_image == 16

    def test_mlp2x_gelu_matches_manual(self):
        args = mm_projector.ProjectorArgs("mlp2x_gelu", 8, 12, grid=2,
                                          compute_dtype=jnp.float32)
        p = mm_projector.random_params(jax.random.PRNGKey(1), args, scale=0.5)
        x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4, 8)),
                        jnp.float32)
        y = mm_projector.apply_projector(p, x, args)
        ref = x @ p.weights[0] + p.biases[0]
        ref = jax.nn.gelu(ref, approximate=False) @ p.weights[1] + p.biases[1]
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5)

    def test_downsample(self):
        args = mm_projector.ProjectorArgs("mlp_downsample", 16, 32, grid=3,
                                          compute_dtype=jnp.float32)
        assert args.tokens_per_image == 4  # ceil(3/2)^2
        assert args.in_features == 64
        p = mm_projector.random_params(jax.random.PRNGKey(2), args)
        x = jnp.ones((2, 9, 16))
        y = mm_projector.apply_projector(p, x, args)
        assert y.shape == (2, 4, 32)

    def test_downsample_2x2_layout(self):
        # even grid: neighbors (r, c), (r, c+1), (r+1, c), (r+1, c+1) concat
        grid = 4
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1)
        y = mm_projector.downsample_2x2(x, grid)
        assert y.shape == (1, 4, 4)
        np.testing.assert_array_equal(np.asarray(y[0, 0]), [0, 1, 4, 5])
        np.testing.assert_array_equal(np.asarray(y[0, 3]), [10, 11, 14, 15])

    def test_hf_state_loading(self):
        state = {
            "model.mm_projector.0.weight": np.ones((12, 8), np.float32),
            "model.mm_projector.0.bias": np.zeros(12, np.float32),
            "model.mm_projector.2.weight": np.ones((12, 12), np.float32),
            "model.mm_projector.2.bias": np.zeros(12, np.float32),
        }
        args = mm_projector.ProjectorArgs("mlp2x_gelu", 8, 12, grid=2)
        p = mm_projector.params_from_hf_state(state, args)
        assert len(p.weights) == 2
        assert p.weights[0].shape == (8, 12)


class TestPromptExpansion:
    def test_expand(self):
        ids = [1, 2, IMAGE_TOKEN_INDEX, 3]
        out = vila.expand_multimodal_prompt(ids, 4)
        assert out == [1, 2] + [IMAGE_TOKEN_INDEX] * 4 + [3]

    def test_tokenizer_image_token(self):
        class Tok:
            bos_token_id = 9

            def encode(self, s):
                return [9] + [ord(c) % 50 + 10 for c in s.strip()]

        ids = vila.tokenizer_image_token("ab <image> cd", Tok())
        assert ids.count(IMAGE_TOKEN_INDEX) == 1
        assert ids[0] == 9
        assert ids.count(9) == 1  # BOS stripped from the second chunk


class TestVlmPrefill:
    def test_image_splice_changes_logits(self):
        qargs = QuantSpec.from_precision("w8a8kv8")
        largs = llama.LlamaArgs(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16, quant=qargs,
        )
        fp = llama.random_float_params(jax.random.PRNGKey(0), largs, scale=0.05)
        params = llama.quantize_params(fp, largs)

        from qserve_tpu.kernels import kv_cache as kvc

        tpi = 4
        T = 16
        raw = [1, 2] + [IMAGE_TOKEN_INDEX] * tpi + [3]
        n = len(raw)
        tok = np.zeros(T, np.int32)
        tok[:n] = raw
        pos = np.zeros(T, np.int32); pos[:n] = np.arange(n)
        seg = np.zeros(T, np.int32); seg[:n] = 1
        pages = np.full(T, -1, np.int32); pages[:n] = 0
        slots = np.zeros(T, np.int32); slots[:n] = np.arange(n)
        img_idx = np.zeros(T, np.int32)
        img_idx[2 : 2 + tpi] = np.arange(tpi)
        last = np.array([n - 1], np.int32)

        def run(embeds):
            kv = kvc.create_kv_cache(2, 2, 2, 16, 16, 8)
            logits, _ = vila.vlm_prefill(
                params, kv, jnp.asarray(tok), embeds, jnp.asarray(img_idx),
                jnp.asarray(pos), jnp.asarray(seg), jnp.asarray(pages),
                jnp.asarray(slots), jnp.asarray(last), largs,
            )
            return np.asarray(logits)

        e1 = jnp.asarray(np.random.default_rng(1).standard_normal((tpi, 64)),
                         jnp.float32) * 0.1
        e2 = e1 + 0.5
        l1a, l1b = run(e1), run(e1)
        l2 = run(e2)
        np.testing.assert_array_equal(l1a, l1b)
        assert np.abs(l1a - l2).max() > 1e-4

    def test_no_image_matches_plain_prefill(self):
        qargs = QuantSpec.from_precision("w8a8kv8")
        largs = llama.LlamaArgs(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16, quant=qargs,
        )
        fp = llama.random_float_params(jax.random.PRNGKey(3), largs, scale=0.05)
        params = llama.quantize_params(fp, largs)
        from qserve_tpu.kernels import kv_cache as kvc

        T = 8
        tok = np.arange(1, T + 1).astype(np.int32)
        pos = np.arange(T, dtype=np.int32)
        seg = np.ones(T, np.int32)
        pages = np.zeros(T, np.int32)
        slots = np.arange(T, dtype=np.int32)
        last = np.array([T - 1], np.int32)
        dummy_embeds = jnp.zeros((1, 64), jnp.float32)
        img_idx = np.zeros(T, np.int32)

        kv1 = kvc.create_kv_cache(2, 2, 2, 16, 16, 8)
        l1, _ = vila.vlm_prefill(
            params, kv1, jnp.asarray(tok), dummy_embeds, jnp.asarray(img_idx),
            jnp.asarray(pos), jnp.asarray(seg), jnp.asarray(pages),
            jnp.asarray(slots), jnp.asarray(last), largs,
        )
        kv2 = kvc.create_kv_cache(2, 2, 2, 16, 16, 8)
        l2, _ = llama.prefill(
            params, kv2, jnp.asarray(tok), jnp.asarray(pos), jnp.asarray(seg),
            jnp.asarray(pages), jnp.asarray(slots), jnp.asarray(last), largs,
        )
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


class TestEncodeImages:
    def test_end_to_end_shapes(self):
        vargs = clip.VisionArgs(
            hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
            image_size=16, patch_size=8, compute_dtype=jnp.float32,
        )
        pargs = mm_projector.ProjectorArgs("mlp2x_gelu", 32, 48, grid=vargs.grid,
                                           compute_dtype=jnp.float32)
        largs = llama.LlamaArgs(
            vocab_size=64, hidden_size=48, intermediate_size=96,
            num_layers=1, num_heads=4, num_kv_heads=2, head_dim=12,
            quant=QuantSpec.from_precision("w8a8kv8"),
        )
        args = vila.VilaArgs(llm=largs, vision=vargs, projector=pargs)
        params = vila.random_params(jax.random.PRNGKey(0), args)
        imgs = jnp.asarray(
            np.random.default_rng(0).standard_normal((3, 3, 16, 16)), jnp.float32
        )
        flat = vila.encode_images(params, imgs, args)
        assert flat.shape == (3 * args.tokens_per_image, 48)
        assert np.isfinite(np.asarray(flat, np.float32)).all()
