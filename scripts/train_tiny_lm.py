"""Train a small byte-level Llama on the local corpus; save an HF checkpoint.

Purpose: the accuracy north star is ΔPPL(FP16 -> W4A8KV4) measured through
the real converter + serving kernels (reference README.md:371-389). With no
network access there is no public checkpoint to download, so this trains a
REAL (non-random) model on locally available text; ΔPPL between its FP16 and
QoQ-quantized forms is then a genuine accuracy measurement for the whole
pipeline. See scripts/eval_tiny_ppl.py for the measurement step.

The checkpoint is written in HF-Llama format (config.json +
model.safetensors with model.layers.N.* names, [OC, IC] torch layout) so it
exercises the standard loader / self-quantizer path like any downloaded
model would.

Usage:
  python scripts/build_tiny_corpus.py /tmp/corpus --mb 64
  python scripts/train_tiny_lm.py /tmp/corpus /tmp/tinylm \
      --steps 4000 --batch 64 --seq 512
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# byte vocabulary: 0..255 bytes, 256 = BOS; padded to an MXU-friendly 384
VOCAB = 384
BOS = 256


def model_config(hidden=512, inter=1536, layers=8, heads=4, kv_heads=2):
    return dict(
        architectures=["LlamaForCausalLM"],
        vocab_size=VOCAB,
        hidden_size=hidden,
        intermediate_size=inter,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        head_dim=hidden // heads,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        max_position_embeddings=4096,
        model_type="llama",
        torch_dtype="float32",
    )


# Named geometries: "26m" is the round-2 model; "110m" is the round-3 scale-up
# (less quantization-sensitive, cuts eval noise for the RTN-vs-optimized-scale
# comparison). head_dim stays 128 on the larger model to match the flagship
# serving-kernel path.
GEOMETRIES = {
    "26m": dict(hidden=512, inter=1536, layers=8, heads=4, kv_heads=2),
    "110m": dict(hidden=1024, inter=2816, layers=10, heads=8, kv_heads=2),
    # ~400M params: one more doubling toward the 8B target; GQA 3:1 and
    # head_dim 128 keep it on the flagship kernel path (train with --remat)
    "400m": dict(hidden=1536, inter=4096, layers=16, heads=12, kv_heads=4),
}


def init_params(key, cfg):
    E, I, L = cfg["hidden_size"], cfg["intermediate_size"], cfg["num_hidden_layers"]
    V = cfg["vocab_size"]
    D = cfg["head_dim"]
    Hq, Hkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]

    def init(k, shape, fan_in):
        return jax.random.normal(k, shape, jnp.float32) / np.sqrt(fan_in)

    keys = jax.random.split(key, L + 2)
    layers = []
    for li in range(L):
        ks = jax.random.split(keys[li], 4)
        layers.append(dict(
            input_ln=jnp.ones((E,), jnp.float32),
            qkv=init(ks[0], (E, (Hq + 2 * Hkv) * D), E),
            o=init(ks[1], (Hq * D, E), Hq * D),
            post_ln=jnp.ones((E,), jnp.float32),
            gate_up=init(ks[2], (E, 2 * I), E),
            down=init(ks[3], (I, E), I),
        ))
    return dict(
        embed=init(keys[-2], (V, E), E) * np.sqrt(E) * 0.02,
        layers=layers,
        final_ln=jnp.ones((E,), jnp.float32),
        lm_head=init(keys[-1], (E, V), E),
    )


def forward(params, tokens, cfg, remat: bool = False):
    """[B, T] int32 -> logits [B, T, V] (bf16 compute, f32 logits).

    remat=True rematerializes each decoder layer on the backward pass
    (jax.checkpoint) — at the 400m geometry the stored [B, H, T, T]
    attention probabilities alone would otherwise exceed v5e HBM."""
    B, T = tokens.shape
    E = cfg["hidden_size"]
    D = cfg["head_dim"]
    Hq, Hkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    rep = Hq // Hkv
    h = params["embed"][tokens].astype(jnp.bfloat16)
    pos = jnp.arange(T)
    inv = 1.0 / (cfg["rope_theta"] ** (jnp.arange(0, D, 2) / D))
    ang = pos[:, None] * inv[None, :]
    cos = jnp.cos(ang).astype(jnp.bfloat16)
    sin = jnp.sin(ang).astype(jnp.bfloat16)

    def rope(x):  # [B, T, H, D]
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate(
            [x1 * cos[None, :, None] - x2 * sin[None, :, None],
             x2 * cos[None, :, None] + x1 * sin[None, :, None]], axis=-1
        )

    def rms(x, w):
        xf = x.astype(jnp.float32)
        v = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(v + cfg["rms_norm_eps"]) * w).astype(jnp.bfloat16)

    causal = jnp.tril(jnp.ones((T, T), jnp.bool_))

    def layer(h, fl):
        x = rms(h, fl["input_ln"])
        qkv = x @ fl["qkv"].astype(jnp.bfloat16)
        q, k, v = jnp.split(qkv, [Hq * D, (Hq + Hkv) * D], axis=-1)
        q = rope(q.reshape(B, T, Hq, D))
        k = rope(k.reshape(B, T, Hkv, D))
        v = v.reshape(B, T, Hkv, D)
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        s = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) / np.sqrt(D)
        s = jnp.where(causal[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        attn = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, Hq * D)
        h = h + attn @ fl["o"].astype(jnp.bfloat16)
        x = rms(h, fl["post_ln"])
        gu = x @ fl["gate_up"].astype(jnp.bfloat16)
        g, u = jnp.split(gu, 2, axis=-1)
        return h + (
            jax.nn.silu(g.astype(jnp.float32)).astype(jnp.bfloat16) * u
        ) @ fl["down"].astype(jnp.bfloat16)

    if remat:
        layer = jax.checkpoint(layer)
    for fl in params["layers"]:
        h = layer(h, fl)
    h = rms(h, params["final_ln"])
    return (h @ params["lm_head"].astype(jnp.bfloat16)).astype(jnp.float32)


def loss_fn(params, tokens, cfg, remat: bool = False):
    logits = forward(params, tokens[:, :-1], cfg, remat)
    targets = tokens[:, 1:]
    lse = jax.nn.logsumexp(logits, axis=-1)
    tl = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(lse - tl)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--chunk", type=int, default=50, help="steps per dispatch")
    ap.add_argument("--geometry", choices=sorted(GEOMETRIES), default="26m")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize layers on backward (400m on one v5e)")
    args = ap.parse_args()

    import optax

    cfg = model_config(**GEOMETRIES[args.geometry])
    data = np.fromfile(os.path.join(args.corpus_dir, "train.bin"), np.uint8)
    print(f"train corpus: {len(data) / 1e6:.1f} MB")
    data_dev = jax.device_put(jnp.asarray(data, jnp.int32))

    params = init_params(jax.random.PRNGKey(0), cfg)
    warmup = min(100, args.steps // 4)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, args.lr * 0.1
    )
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched, weight_decay=0.01))
    opt_state = opt.init(params)

    B, T = args.batch, args.seq

    @functools.partial(jax.jit, donate_argnames=("params", "opt_state"))
    def train_chunk(params, opt_state, data_dev, key, step0):
        def body(carry, i):
            params, opt_state = carry
            k = jax.random.fold_in(key, i)
            starts = jax.random.randint(k, (B,), 0, data_dev.shape[0] - T - 1)
            rows = jax.vmap(
                lambda s: jax.lax.dynamic_slice(data_dev, (s,), (T + 1,))
            )(starts)
            rows = jnp.concatenate(
                [jnp.full((B, 1), BOS, jnp.int32), rows], axis=1
            )[:, : T + 1]
            loss, grads = jax.value_and_grad(loss_fn)(
                params, rows, cfg, args.remat
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), step0 + jnp.arange(args.chunk)
        )
        return params, opt_state, losses

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for c in range(args.steps // args.chunk):
        params, opt_state, losses = train_chunk(
            params, opt_state, data_dev, jax.random.fold_in(key, c),
            jnp.int32(c * args.chunk),
        )
        losses = np.asarray(losses)
        print(
            f"step {min((c + 1) * args.chunk, args.steps):5d}  "
            f"loss {losses[-1]:.4f} (mean {losses.mean():.4f})  "
            f"{time.time() - t0:6.1f}s",
            flush=True,
        )

    # ---- save HF-format checkpoint ([OC, IC] torch layout) ----
    from safetensors.numpy import save_file

    os.makedirs(args.out_dir, exist_ok=True)
    E = cfg["hidden_size"]
    D = cfg["head_dim"]
    Hq, Hkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    flat = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_ln"], np.float32),
        "lm_head.weight": np.asarray(params["lm_head"], np.float32).T.copy(),
    }
    for li, fl in enumerate(params["layers"]):
        pre = f"model.layers.{li}"
        qkv = np.asarray(fl["qkv"], np.float32)  # [E, (Hq+2Hkv)*D]
        q, k, v = np.split(qkv, [Hq * D, (Hq + Hkv) * D], axis=1)
        flat[f"{pre}.self_attn.q_proj.weight"] = q.T.copy()
        flat[f"{pre}.self_attn.k_proj.weight"] = k.T.copy()
        flat[f"{pre}.self_attn.v_proj.weight"] = v.T.copy()
        flat[f"{pre}.self_attn.o_proj.weight"] = np.asarray(fl["o"], np.float32).T.copy()
        gu = np.asarray(fl["gate_up"], np.float32)
        g, u = np.split(gu, 2, axis=1)
        flat[f"{pre}.mlp.gate_proj.weight"] = g.T.copy()
        flat[f"{pre}.mlp.up_proj.weight"] = u.T.copy()
        flat[f"{pre}.mlp.down_proj.weight"] = np.asarray(fl["down"], np.float32).T.copy()
        flat[f"{pre}.input_layernorm.weight"] = np.asarray(fl["input_ln"], np.float32)
        flat[f"{pre}.post_attention_layernorm.weight"] = np.asarray(
            fl["post_ln"], np.float32
        )
    save_file(flat, os.path.join(args.out_dir, "model.safetensors"))
    with open(os.path.join(args.out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"saved HF checkpoint to {args.out_dir}")


if __name__ == "__main__":
    main()
