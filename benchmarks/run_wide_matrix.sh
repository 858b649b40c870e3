#!/bin/bash
# Wide-regime knob matrix on the real TPU: one JSON line per config.
#
# Measures benchmarks/bench_wide.py --mode single at --dim_b (default the
# Illumina-450k width) across the optimizer/precision knobs:
#   fp32 AdamW (baseline)  | bf16 matmuls | bf16 moments | both | Adafactor
#   | Adafactor + bf16 matmuls
# at batch 32 (reference recipe) and batch 256 (the wide regime's sweet
# spot — RESULTS.md scale demo #2). ~12 fresh programs, so expect relay
# compile minutes per config on a cold relay; steady-state numbers are what
# lands in RESULTS.md.
#
# Usage: bash benchmarks/run_wide_matrix.sh [dim_b] [n] [epochs]
set -u
DIM_B=${1:-450000}
N=${2:-2048}
EPOCHS=${3:-6}
OUT=${WIDE_MATRIX_OUT:-/tmp/wide_matrix_$(date +%Y%m%d_%H%M%S).jsonl}
cd "$(dirname "$0")/.."

run() { # batch compute_dtype moments_dtype optimizer
  echo "=== batch=$1 compute=$2 moments=$3 opt=$4 ===" >&2
  timeout 1200 python benchmarks/bench_wide.py --mode single \
    --dim_b "$DIM_B" --n "$N" --epochs "$EPOCHS" --batch_size "$1" \
    --compute_dtype "$2" --moments_dtype "$3" --optimizer "$4" \
    2>>"$OUT.stderr" | tee -a "$OUT"
}

for BATCH in 32 256; do
  run "$BATCH" float32  float32  adamw      # baseline
  run "$BATCH" bfloat16 float32  adamw      # MXU bf16 matmuls
  run "$BATCH" float32  bfloat16 adamw      # bf16 moment storage
  run "$BATCH" bfloat16 bfloat16 adamw      # both
  run "$BATCH" float32  float32  adafactor  # factored moments
  run "$BATCH" bfloat16 float32  adafactor  # factored + bf16 matmuls
done
echo "results: $OUT (stderr log: $OUT.stderr)" >&2
