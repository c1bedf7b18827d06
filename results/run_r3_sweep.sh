#!/usr/bin/env bash
# One-command round-3 op sweep (VERDICT item 3): ALL ops, f32 + bf16, with
# formula + XLA-roofline columns, committed as results/bench_v5e_1chip_r3.csv
# (+ _bf16_r3). Run on the real chip; ~15 min warm-cache.
#
# The two sweeps run SEQUENTIALLY in separate processes (one TPU process at
# a time — CLAUDE.md), and each CSV is written incrementally by jtps bench's
# failure-skip path, so a mid-sweep env fault keeps completed rows.
set -ue
cd "$(dirname "$0")/.."

python -m jax_tpus_benchmark_physics_simulation_tpu.cli bench \
  --csv results/bench_v5e_1chip_r3.csv "$@"
python -m jax_tpus_benchmark_physics_simulation_tpu.cli bench \
  --precision bfloat16 --csv results/bench_v5e_1chip_bf16_r3.csv "$@"
echo "sweeps done:"
ls -la results/bench_v5e_1chip_r3.csv results/bench_v5e_1chip_bf16_r3.csv
