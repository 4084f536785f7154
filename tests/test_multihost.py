"""Multi-host entry: mesh-builder units + a real 2-process CPU smoke
(jax.distributed local cluster), per SURVEY.md §2.8's TPU-native equivalent
of the reference's accelerate/NCCL launcher."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

from this_and_that_vdm_tpu.parallel import (
    distributed_init, make_mesh, shard_batch,
)


def test_make_mesh_dcn_axis():
    devs = jax.devices()[:8]
    mesh = make_mesh(devs, dp=2, fsdp=2, dcn=2)
    assert mesh.axis_names == ("dcn", "dp", "fsdp")
    assert dict(mesh.shape) == {"dcn": 2, "dp": 2, "fsdp": 2}
    # batch sharded over all three data axes jointly
    spec = shard_batch({"x": np.zeros((8, 3))}, mesh)["x"].spec
    assert spec[0] == ("dcn", "dp", "fsdp")
    # slice devices stay contiguous within each dcn granule (ICI inside,
    # DCN outside)
    arr = mesh.devices
    flat = [d.id for d in np.asarray(devs)]
    assert [d.id for d in arr[0].ravel()] == flat[:4]
    assert [d.id for d in arr[1].ravel()] == flat[4:]


def test_make_mesh_default_no_dcn_axis():
    mesh = make_mesh(jax.devices()[:4], fsdp=2)
    assert mesh.axis_names == ("dp", "fsdp")


def test_distributed_init_noop_without_env(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "TTV_MULTIHOST"):
        monkeypatch.delenv(var, raising=False)
    assert distributed_init() is False


@pytest.mark.slow
def test_two_process_cpu_smoke(tmp_path):
    """Real jax.distributed cluster: 2 processes on localhost, gloo CPU
    collectives, cross-process reduction through a (dcn, dp, fsdp) mesh."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen([sys.executable, worker, str(pid), port,
                          str(tmp_path / "ckpts")],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK proc={pid}" in out, out[-3000:]
