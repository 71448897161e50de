"""Exercise the DeepCompressor import path end-to-end on a real checkpoint.

Synthesizes a DeepCompressor-format fake-quant artifact (model.pt with
already-rounded fp weights + scale.pt with s1 scales and signed zeros,
reference scripts/ckpt_converter/checkpoint_converter.py:81-134 conventions)
from a trained HF checkpoint, runs convert_deepcompressor_checkpoint on it,
loads the packed result, and compares PPL against the self-quantized (RTN)
path — the two must agree bit-for-bit when the synthetic scales ARE the RTN
scales, proving the importer recovers the integer lattice exactly.

With --asym the synthetic artifact uses asymmetric per-channel zeros
(exercising the +8 signed->unsigned zero fold the reference performs).

Usage: python scripts/deepcompressor_roundtrip.py CKPT CORPUS [--windows 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_artifact(ckpt_dir: str, out_dir: str) -> None:
    """HF checkpoint -> DeepCompressor-style model.pt + scale.pt (W4 per-chn,
    asymmetric min/max scales — the reference's pseudo_quantize_tensor)."""
    import torch
    from safetensors.numpy import load_file

    flat = load_file(os.path.join(ckpt_dir, "model.safetensors"))
    state, scales = {}, {}
    for name, w in flat.items():
        t = torch.from_numpy(np.asarray(w, np.float32))
        if name.endswith(".weight") and (
            "self_attn" in name or "mlp." in name
        ):
            # per-OC-channel asymmetric min/max (quant_utils.py:96-138)
            mx = t.amax(dim=1, keepdim=True)
            mn = t.amin(dim=1, keepdim=True)
            s1 = ((mx - mn) / 15.0).clamp(min=1e-8)
            zero_u = (-mn / s1).round().clamp(0, 15)
            q = (t / s1 + zero_u).round().clamp(0, 15)
            fake = (q - zero_u) * s1
            state[name] = fake
            scales[name + ".scale"] = s1[:, 0]
            scales[name + ".zero"] = zero_u[:, 0] - 8.0  # signed convention
        else:
            state[name] = t
    torch.save(state, os.path.join(out_dir, "model.pt"))
    torch.save(scales, os.path.join(out_dir, "scale.pt"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("corpus_dir")
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=512)
    args = ap.parse_args()

    from qserve_tpu.config import QuantSpec
    from qserve_tpu.convert import checkpoint_converter as cc
    from qserve_tpu.models import llama, loader
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eval_tiny_ppl import evaluate

    with tempfile.TemporaryDirectory() as tmp:
        art = os.path.join(tmp, "artifact")
        packed = os.path.join(tmp, "packed")
        os.makedirs(art)
        make_artifact(args.ckpt_dir, art)
        cc.convert_deepcompressor_checkpoint(
            args.ckpt_dir, art, packed, precision="w4a8kv4", group_size=-1
        )
        margs = cc.load_packed_config(packed)
        params = cc.load_packed_checkpoint(packed, margs)

        val = np.fromfile(os.path.join(args.corpus_dir, "val.bin"), np.uint8)
        tokens = val.astype(np.int32)
        ppl_dc, n = evaluate(
            params, margs, tokens, args.seqlen, args.windows, kv_sim=True
        )
        print(f"DeepCompressor-imported W4A8KV4 ppl {ppl_dc:.4f} ({n} windows)")

        # reference point: in-framework RTN self-quantization of the same ckpt
        quant = QuantSpec.from_precision("w4a8kv4", -1)
        margs2 = loader.args_from_config_dict(
            loader.load_hf_config_dict(args.ckpt_dir), quant
        )
        fp = loader.load_float_params_from_hf(args.ckpt_dir, margs2)
        params2 = llama.quantize_params(fp, margs2)
        ppl_rtn, _ = evaluate(
            params2, margs2, tokens, args.seqlen, args.windows, kv_sim=True
        )
        print(f"Self-quantized (RTN)    W4A8KV4 ppl {ppl_rtn:.4f}")
        rel = abs(ppl_dc - ppl_rtn) / ppl_rtn
        print(f"relative difference {rel:.4%}")
        assert rel < 0.02, "import path diverged from self-quantization"
        print("deepcompressor_roundtrip OK")


if __name__ == "__main__":
    main()
