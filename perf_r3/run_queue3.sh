#!/bin/bash
# Round-3 queue 3: the three train-step topology-AOT jobs that queue2
# lost to the session-end SIGTERM.  fsdp2 ran 84 min without finishing
# under contention; give each 9000 s clean.
set -u
cd /root/repo
OUT=/root/repo/perf_r3
step() {
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$to" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  echo "=== $name rc=$? $(date -u +%H:%M:%S) ==="
  tail -c 600 "$OUT/$name.json"; echo
}
step aot_train_fsdp2 9000 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 2
step aot_train_fsdp4 9000 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 4
step aot_train_fsdp8 9000 python -u -m this_and_that_vdm_tpu.cli.aot_memory --topology v5e:2x4 --fsdp 8
echo "=== queue3 done $(date -u +%H:%M:%S) ==="
