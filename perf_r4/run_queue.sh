#!/bin/bash
# Round-4 queue: topology-AOT of the SHIPPED full-size programs
# (VERDICT r3 missing #1 + weak #2 in one shot):
#   train rows = 8-bit Adam state + bf16 frozen towers + flash kernel via
#   shard_map (the runtime-default program; cli/aot_memory.py defaults);
#   serving row = flash-on build of the round-3 serving artifact.
# Strictly sequential (libtpu lockfile + single host core).
set -u
cd /root/repo
# plain-script invocations put perf_r4/ (not the repo) on sys.path; keep the
# axon site too (clobbering PYTHONPATH loses the TPU plugin)
export PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH:-}
OUT=/root/repo/perf_r4
step() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$to" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  echo "=== $name rc=$? $(date -u +%H:%M:%S) ==="
  tail -c 600 "$OUT/$name.json"; echo
}
step probe_shardmap 1200 python -u perf_r4/probe_shardmap_topo.py
# if Mosaic-via-shard_map cannot be emitted, fall back to the kernels-off
# upper-bound build — the 8-bit-Adam + bf16-frozen rows still land
FLASH=shardmap
grep -q "^OK:" "$OUT/probe_shardmap.json" || FLASH=xla
echo "=== flash mode: $FLASH ==="
step aot_train_fsdp2 14400 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 2 --flash $FLASH
step aot_train_fsdp4 14400 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 4 --flash $FLASH
step aot_train_fsdp8 14400 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 8 --flash $FLASH
step aot_serving_flash 9000 python -u -m this_and_that_vdm_tpu.cli.aot_memory --program serving --topology v5e:2x4 --flash $FLASH
echo "=== queue4 done $(date -u +%H:%M:%S) ==="
