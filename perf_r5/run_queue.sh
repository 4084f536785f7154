#!/bin/bash
# Round-5 queue: the fsdp2 recovery attempt (VERDICT r4 weak #4 / item 4).
# fsdp2 OOMed by 249 MiB with frozen towers replicated (perf_r4); the
# `frozen_sharding: fsdp` lever (train_loop.py) splits the ~2.1 GiB bf16
# towers over the fsdp axis, reclaiming ~1.07 GiB/chip at fsdp=2.
# TPU-scheduled topology-AOT of the SHIPPED program (flash + fused 8-bit
# Adam via shard_map), same invocation class as perf_r4/run_queue.sh.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH:-}
OUT=/root/repo/perf_r5
step() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$to" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  echo "=== $name rc=$? $(date -u +%H:%M:%S) ==="
  tail -c 600 "$OUT/$name.json"; echo
}
step aot_train_fsdp2_fsharded 14400 python -u -m this_and_that_vdm_tpu.cli.aot_memory \
  --topology v5e:2x4 --fsdp 2 --flash shardmap --frozen-sharding fsdp
echo "=== queue5 done $(date -u +%H:%M:%S) ==="
