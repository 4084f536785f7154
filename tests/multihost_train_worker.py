"""Worker for the 2-process full-train-loop multihost test (round 3,
VERDICT r2 item 1: the REAL train path — loader rank-sharding, global_batch
feed, metrics, collective checkpoint — across a jax.distributed cluster).

Launched twice by tests/test_multihost.py::test_two_process_train_loop.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

cfg_path = os.path.join(outdir, f"cfg_{pid}.yaml")
os.makedirs(outdir, exist_ok=True)
with open(cfg_path, "w") as f:
    f.write(f"""
output_dir: {os.path.join(outdir, 'run')}
train_batch_size: 1
seed: 42
checkpointing_steps: 1000
dataloader_num_workers: 2
lr_warmup_steps: 0
learning_rate: 1.0e-4
""")

from this_and_that_vdm_tpu.training import train_loop  # noqa: E402

train_loop.main([
    "--config", cfg_path, "--mode", "vl", "--synthetic", "8",
    "--nano", "--max-steps", "2", "--multihost",
])

assert jax.process_count() == 2
# the final collective checkpoint must exist and carry step 2
from this_and_that_vdm_tpu.training import checkpoint as ckpt  # noqa: E402

latest = ckpt.latest_checkpoint(os.path.join(outdir, "run"))
assert latest and ckpt.checkpoint_step(latest) == 2, latest

print(f"TRAINLOOP_OK proc={pid}", flush=True)
