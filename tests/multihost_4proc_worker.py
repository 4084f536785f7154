"""Worker for the 4-process (dcn, dp, fsdp) multihost test (VERDICT r3
item 5: the dcn axis only had unit tests; the 2-process record ran dcn=2
with fsdp=1).  Four jax.distributed processes, mesh (dcn=2, dp=1, fsdp=2)
— the fsdp axis INSIDE each dcn slice — through the REAL train_loop path:
rank-sharded loader, global_batch feed, collective checkpoint save, and
(phase 2) restore-RESUME across a full cluster restart.

Launched 4x by tests/test_multihost.py::test_four_process_dcn_fsdp_resume,
twice: phase 1 trains 0->2 and checkpoints; phase 2 is a fresh cluster that
must resume from step 2 and finish at step 4.

Reference analog: the accelerate launcher's static 4-process rendezvous
(config/accelerate_config.json, num_processes: 4) + resume-from-latest
(train_code/train_svd.py:599-627).
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]
max_steps = int(sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "4"
os.environ["JAX_PROCESS_ID"] = str(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

run_dir = os.path.join(outdir, "run")
cfg_path = os.path.join(outdir, f"cfg_{pid}.yaml")
os.makedirs(outdir, exist_ok=True)
with open(cfg_path, "w") as f:
    f.write(f"""
output_dir: {run_dir}
train_batch_size: 1
seed: 42
checkpointing_steps: 2
resume_from_checkpoint: latest
dataloader_num_workers: 2
lr_warmup_steps: 0
learning_rate: 1.0e-4
""")

from this_and_that_vdm_tpu.training import train_loop  # noqa: E402

train_loop.main([
    "--config", cfg_path, "--mode", "vl", "--synthetic", "8",
    "--nano", "--max-steps", str(max_steps), "--multihost",
    "--fsdp", "2", "--dcn", "2",
])

assert jax.process_count() == 4
from this_and_that_vdm_tpu.training import checkpoint as ckpt  # noqa: E402

latest = ckpt.latest_checkpoint(run_dir)
assert latest and ckpt.checkpoint_step(latest) == max_steps, latest

print(f"FOURPROC_OK proc={pid} steps={max_steps}", flush=True)
