"""Build a byte-level LM corpus from text available on the local machine.

The accuracy protocol (reference README.md:371-389) wants WikiText-2, which
needs network access; in an air-gapped environment this builds the closest
available real corpus — Python source + documentation text from the
installed distribution (~hundreds of MB) — deduplicated, shuffled at file
granularity, split train/val. The resulting LM task is real (natural
English in docstrings/comments + formal structure), so FP16-vs-quantized
ΔPPL measured on it is a genuine end-to-end accuracy signal for the QoQ
pipeline (quantizer -> packed checkpoint -> serving kernels -> eval).

Usage: python scripts/build_tiny_corpus.py OUT_DIR [--mb 64]
Writes OUT_DIR/{train,val}.bin (raw bytes).
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import os
import random


def gather(limit_bytes: int) -> bytes:
    roots = [
        "/opt/venv/lib/python3.12/site-packages",
        os.path.dirname(os.__file__),
        "/usr/share/doc",
    ]
    files = []
    for root in roots:
        for pat in ("**/*.py", "**/*.md", "**/*.rst", "**/*.txt"):
            files.extend(glob.glob(os.path.join(root, pat), recursive=True))
    rng = random.Random(0)
    rng.shuffle(files)
    seen = set()
    chunks = []
    total = 0
    for f in files:
        try:
            with open(f, "rb") as fh:
                data = fh.read()
        except OSError:
            continue
        if not data or len(data) > 4 << 20:
            continue
        # ASCII-dominated text only; skip minified/binary-ish blobs
        printable = sum(32 <= b < 127 or b in (9, 10) for b in data[:4096])
        if printable < 0.97 * min(len(data), 4096):
            continue
        h = hashlib.sha1(data).digest()
        if h in seen:
            continue
        seen.add(h)
        chunks.append(data + b"\n\x00")  # \x00 = document separator
        total += len(data)
        if total >= limit_bytes:
            break
    print(f"gathered {len(chunks)} files, {total / 1e6:.1f} MB")
    return b"".join(chunks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--mb", type=int, default=64)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    data = gather(args.mb << 20)
    n_val = max(len(data) // 20, 1 << 20)  # 5% (>= 1MB) held out
    with open(os.path.join(args.out_dir, "val.bin"), "wb") as f:
        f.write(data[:n_val])
    with open(os.path.join(args.out_dir, "train.bin"), "wb") as f:
        f.write(data[n_val:])
    print(f"train {len(data) - n_val} bytes, val {n_val} bytes -> {args.out_dir}")


if __name__ == "__main__":
    main()
