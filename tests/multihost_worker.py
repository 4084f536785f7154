"""Worker for the 2-process CPU multihost smoke test (VERDICT #7).

Launched twice by tests/test_multihost.py; exercises
parallel.distributed_init + make_mesh(dcn=process_count) + a jitted
cross-process reduction (the gradient-psum pattern of the train step).
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from this_and_that_vdm_tpu.parallel import (  # noqa: E402
    distributed_init, global_batch, is_main_process, make_mesh, shard_batch,
)

assert distributed_init() is True
assert jax.process_count() == 2
assert is_main_process() == (pid == 0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

n_local = jax.local_device_count()
mesh = make_mesh(dcn=2, dp=n_local, fsdp=1)
assert mesh.axis_names == ("dcn", "dp", "fsdp")

# per-process LOCAL shard of a global batch, fed exactly like the train
# loop feeds it (global_batch); the value depends on the process so the
# reduction proves cross-DCN communication actually happened.  At
# n_local=1 the local leading dim (1) does NOT divide the mesh extent
# (2) — the round-2 bug was computing the spec from this local shape
# (silent replicate -> rank 0's data only -> sum 4, not 12).
x = global_batch({"x": np.full((n_local, 4), float(pid + 1), np.float32)},
                 mesh)["x"]
assert x.shape == (2 * n_local, 4), x.shape  # GLOBAL leading dim

# shard_batch on the local batch must now refuse loudly, not replicate
try:
    shard_batch({"x": np.zeros((1, 4), np.float32)},
                make_mesh(dcn=2, dp=n_local, fsdp=1))
except ValueError:
    pass
else:
    raise AssertionError("shard_batch silently accepted a non-divisible "
                         "batch leaf")

out_sharding = NamedSharding(mesh, P())
total = jax.jit(lambda a: a.sum(), out_shardings=out_sharding)(x)
got = float(jax.device_get(total.addressable_data(0)))
# proc 0 contributes 1.0 x (n_local*4) elems, proc 1 contributes 2.0 x same
assert got == 4 * n_local * 3, (got, n_local)

# --- checkpoint pattern of the train loop: host_replicated (collective on
# ALL ranks) -> rank-0 orbax save -> barrier -> restore on every rank.
# Regression for the round-2 review finding: a rank-0-only device_get of a
# cross-process-sharded state raises on non-addressable shards.
from jax.experimental import multihost_utils  # noqa: E402

from this_and_that_vdm_tpu.parallel import host_replicated  # noqa: E402
from this_and_that_vdm_tpu.training import checkpoint as ckpt  # noqa: E402

outdir = sys.argv[3]
big = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
sharded = jax.device_put(big, NamedSharding(mesh, P("dcn")))
assert not sharded.is_fully_addressable  # spans both processes
tree = {"w": sharded,
        "step": jax.device_put(np.int32(7), NamedSharding(mesh, P()))}
host = host_replicated(tree)
np.testing.assert_array_equal(np.asarray(host["w"]), big)
# orbax saves are collective (internal barriers): every rank calls save
ckpt.save_checkpoint(outdir, 7, host, total_limit=None)
multihost_utils.sync_global_devices("ckpt_written")
latest = ckpt.latest_checkpoint(outdir)
restored = ckpt.restore_checkpoint(
    latest, {"w": np.zeros_like(big), "step": np.array(0, np.int32)})
np.testing.assert_array_equal(restored["w"], big)
assert int(restored["step"]) == 7

print(f"MULTIHOST_OK proc={pid} sum={got}", flush=True)
