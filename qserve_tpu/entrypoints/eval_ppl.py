"""WikiText-2 perplexity evaluation entry point.

In-framework replacement for the reference's external accuracy pipeline
(README.md:371-389 delegates PPL to DeepCompressor; protocol: concatenated
corpus, eval seqlen 2048, non-overlapping windows). Compares the quantized
serving path against the in-framework FP16 (w16a16) baseline:

  python -m qserve_tpu.entrypoints.eval_ppl --model <dir> \
      --precision w4a8kv4 --group-size -1 --data wikitext2.txt \
      [--baseline]            # also evaluate w16a16 and report ΔPPL
"""

from __future__ import annotations

import argparse
import json


def load_corpus_text(path: str) -> str:
    """A plain-text file, or a HF datasets dir/name if datasets is importable
    and the data is available locally (no network)."""
    import os

    if os.path.isfile(path):
        with open(path, encoding="utf-8") as f:
            return f.read()
    # try HF datasets from local cache (e.g. "wikitext:wikitext-2-raw-v1:test")
    parts = path.split(":")
    from datasets import load_dataset  # type: ignore

    name = parts[0]
    config = parts[1] if len(parts) > 1 else None
    split = parts[2] if len(parts) > 2 else "test"
    ds = load_dataset(name, config, split=split)
    return "\n\n".join(ds["text"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, required=True, help="local HF model dir")
    p.add_argument("--precision", type=str, default="w4a8kv4")
    p.add_argument("--group-size", type=int, default=-1)
    p.add_argument("--quant-path", type=str, default=None)
    p.add_argument("--data", type=str, required=True,
                   help="plain-text corpus file or datasets spec name:config:split")
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--max-windows", type=int, default=None)
    p.add_argument("--baseline", action="store_true",
                   help="also evaluate w16a16 and report the PPL delta")
    cli = p.parse_args()

    from qserve_tpu.config import QuantSpec
    from qserve_tpu.eval.ppl import evaluate_ppl, tokenize_text
    from qserve_tpu.models import loader
    from qserve_tpu.utils.tokenizer import get_tokenizer

    tokenizer = get_tokenizer(cli.model)
    text = load_corpus_text(cli.data)
    ids = tokenize_text(tokenizer, text)
    print(f"corpus: {len(ids)} tokens, {len(ids) // cli.seqlen} windows")

    quant = QuantSpec.from_precision(cli.precision, cli.group_size)
    args, params = loader.load_model(cli.model, quant, quant_path=cli.quant_path)
    ppl = evaluate_ppl(params, args, ids, cli.seqlen, cli.max_windows,
                       progress=True)
    result = {"precision": quant.precision, "group_size": cli.group_size,
              "seqlen": cli.seqlen, "ppl": round(ppl, 4)}

    if cli.baseline:
        del params
        fq = QuantSpec.from_precision("w16a16kv8", -1)
        fargs, fparams = loader.load_model(cli.model, fq)
        fppl = evaluate_ppl(fparams, fargs, ids, cli.seqlen, cli.max_windows,
                            progress=True)
        result["ppl_fp16"] = round(fppl, 4)
        result["delta"] = round(ppl - fppl, 4)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
