#!/bin/bash
# Round-4 queue, part 2: the rows run_queue.sh did not land before the
# session ended (fsdp2 + probe landed; see run_queue.sh for the plan).
# probe_shardmap.json already says OK -> kernels-on (shardmap) builds.
set -u
cd /root/repo
# a SIGTERMed compile (session end) leaves the libtpu lockfile held; every
# subsequent topology init then ABORTs in seconds — clean it first
rm -f /tmp/libtpu_lockfile
export PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH:-}
OUT=/root/repo/perf_r4
step() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$to" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  echo "=== $name rc=$? $(date -u +%H:%M:%S) ==="
  tail -c 600 "$OUT/$name.json"; echo
}
step aot_train_fsdp4 14400 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 4 --flash shardmap
step aot_train_fsdp8 14400 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 8 --flash shardmap
step aot_serving_flash 9000 python -u -m this_and_that_vdm_tpu.cli.aot_memory --program serving --topology v5e:2x4 --flash shardmap
echo "=== queue4b done $(date -u +%H:%M:%S) ==="
