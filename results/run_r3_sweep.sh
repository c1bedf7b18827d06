#!/usr/bin/env bash
# One-command round-3 op sweep (VERDICT item 3): ALL ops, f32 + bf16, with
# formula + XLA-roofline columns, committed as results/bench_v5e_1chip_r3.csv
# (+ _bf16_r3). Run on the real chip; ~15 min warm-cache.
#
# All processes run SEQUENTIALLY (one TPU process at a time — CLAUDE.md).
# 3D_FFT at the default depth-6 x 4096^2 reproducibly CRASHES the remote
# v5e worker ("TPU worker process crashed or restarted"), poisoning every
# op dispatched after it in the same process (this is what truncated the
# round-2 sweep). Each precision therefore runs as: main ops in one
# process, then 3D_FFT alone in a quarantine process appending to the same
# CSV — the worker restarts cleanly between processes.
set -ue
cd "$(dirname "$0")/.."

MAIN_OPS=2D,3D,Conv,2D_FFT,Bandwidth
for prec in float32 bfloat16; do
  suffix=""
  [ "$prec" = bfloat16 ] && suffix="_bf16"
  csv=results/bench_v5e_1chip${suffix}_r3.csv
  python -m jax_tpus_benchmark_physics_simulation_tpu.cli bench \
    --precision "$prec" --ops "$MAIN_OPS" --csv "$csv" "$@"
  python -m jax_tpus_benchmark_physics_simulation_tpu.cli bench \
    --precision "$prec" --ops 3D_FFT --csv "$csv" --csv-append "$@" \
    || echo "3D_FFT ($prec) crashed the worker (known; rows above survive)"
done
echo "sweeps done:"
ls -la results/bench_v5e_1chip_r3.csv results/bench_v5e_1chip_bf16_r3.csv
