#!/bin/bash
# Round-3 queue 2: the topology-AOT jobs with realistic budgets (the
# full-size train-step AOT needs >40 min/config of 1-core local libtpu
# compile; queue 1's 2400 s budgets timed out) + the transient-500 unet
# bench re-run.  Highest-value first.
set -u
cd /root/repo
OUT=/root/repo/perf_r3
step() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$to" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  echo "=== $name rc=$? $(date -u +%H:%M:%S) ==="
  tail -c 1000 "$OUT/$name.json"; echo
}

step unet 2400 env BENCH_MODE=unet python -u bench.py
step aot_serving 6000 python -u -m this_and_that_vdm_tpu.cli.aot_memory --program serving --topology v5e:2x4
step aot_train_fsdp2 6000 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 2
step aot_train_fsdp4 6000 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 4
step aot_train_fsdp8 6000 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 8
echo "=== queue2 done $(date -u +%H:%M:%S) ==="
