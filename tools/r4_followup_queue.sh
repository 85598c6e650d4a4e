#!/bin/bash
# Follow-up chip measurements after the main when_chip_returns.sh queue:
# confirm the new library defaults (SG_TDNN_FAST=1, attack-path bf16
# Cholesky panels, SG_DFT_FAST_PRECISION=default), then sweep batch to
# amortize this session's elevated per-call dispatch floor (~+0.25-0.3 s
# vs the r3 session; diagnosed by the dip scaling inversely with call
# duration: audionet -31%, xv -26%, xv-EOT4 -12%, CW2 ~0%).
cd /root/repo
log=${1:-/tmp/r4_followup.log}
run() { echo "=== $* ===" >> "$log"; env "$@" python -u bench.py 2>&1 | grep -v WARNING | tail -1 >> "$log"; }

# new-defaults confirms (stacked levers)
run BENCH_MODEL=xv_plda                         # expect ~138-140 (was 129.2 pre-flip)
run BENCH_MODEL=iv_plda                         # expect ~47-48 (was 44.8)
run BENCH_MODEL=audionet                        # expect ~157 (was 135.5)

# batch sweeps: amortize the session dispatch floor, maybe move defaults
run BENCH_MODEL=xv_plda BENCH_SWEEP=128,256,384,512
run BENCH_MODEL=audionet BENCH_SWEEP=128,256,512

# iv: chol panel-rows under bf16 trailing updates (bigger panels halve
# the sequential sweep count; bf16 makes the wider trailing update cheap)
run BENCH_MODEL=iv_plda SG_CHOL_NB=32
run BENCH_MODEL=iv_plda SG_CHOL_NB=64
run BENCH_MODEL=iv_plda BENCH_BATCH=1024

echo DONE >> "$log"
