#!/bin/bash
# Round-3 on-chip measurement queue (VERDICT r2 next #2,3,4,7).
# Strictly sequential: the host has one core and the axon tunnel serialises
# anyway; each step writes its own log + JSON so a mid-queue failure loses
# nothing.  Usage: bash perf_r3/run_queue.sh >/tmp/r3_queue.log 2>&1
set -u
cd /root/repo
OUT=/root/repo/perf_r3
mkdir -p "$OUT"

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$to" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S) ==="
  tail -c 2000 "$OUT/$name.json"
  echo
}

# 1. headline VGL clip with repeats (band for the 4.61 vs 4.81 drift)
step headline_vgl 3600 python -u bench.py
# 2. raw UNet denoiser steps/s with repeats
step unet 2400 env BENCH_MODE=unet python -u bench.py
# 3. train_vgl baseline steps/s
step train_vgl 3600 env BENCH_MODE=train_vgl python -u bench.py
# 4. fused Pallas 8-bit Adam A/B (pending r2 item (a))
step train_vgl_adamkernel 3600 env BENCH_MODE=train_vgl TTV_ADAM_KERNEL=1 python -u bench.py
# 5. on-chip learning-sanity curve (300 fixed-batch steps, per-step readback)
step train_vgl_curve 5400 env BENCH_MODE=train_vgl BENCH_CURVE=300 python -u bench.py
# 6. serving layer on the chip (single-request latency + 4-concurrent)
step serving 5400 env BENCH_MODE=serving python -u bench.py
# 7. real-TPU topology AOT: train step fsdp sweep (one fsdp per run; the
#    CLI forks per degree itself, but run them separately for per-log rc)
step aot_train_fsdp2 2400 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 2
step aot_train_fsdp4 2400 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 4
step aot_train_fsdp8 2400 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 8
# 8. real-TPU topology AOT: full-size serving ('clip','cfg') program
step aot_serving 3600 python -u -m this_and_that_vdm_tpu.cli.aot_memory --program serving --topology v5e:2x4
echo "=== queue done $(date -u +%H:%M:%S) ==="
