#!/bin/bash
# Per-model max-throughput recipes on one TPU v5e chip (16GB HBM).
# Reference counterpart: scripts/benchmark/benchmark_{a100,l40s}.sh — batch
# and page-count pairs per model; here via bench.py env knobs.
# W4A8KV4 per-channel (A100-style) by default; set GROUP=128 for the
# per-group (L40S-style) configs.
set -e
GROUP=${GROUP:--1}

run() {
  echo "== $1 =="
  QSERVE_BENCH_MODEL=$2 QSERVE_BENCH_BATCH=$3 QSERVE_BENCH_CTX=$4 \
  QSERVE_BENCH_PAGE=256 QSERVE_BENCH_GROUP=$GROUP python bench.py
}

# model geometry, batch, avg decode ctx (1024 in + 512/2 out)
run "Llama-3-8B"    8b   128 1280
run "TinyLlama-1.1B" 1b  256 1280
