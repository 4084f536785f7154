"""Device mesh + sharding rules (the TPU-native replacement for the
reference's accelerate/NCCL DDP — SURVEY.md §2.8).

Axes:
  * ``dp``   — pure data parallelism (batch). The reference's only strategy
               (4-GPU DDP via accelerate); here it rides ICI collectives
               emitted by XLA from sharding annotations.
  * ``fsdp`` — parameter/optimizer sharding (ZeRO-3 style): every weight
               tensor is split over its largest divisible axis; XLA inserts
               all-gathers for use and reduce-scatters for grads. The batch
               is sharded over (dp, fsdp) jointly, so fsdp devices also do
               data-parallel compute.

Single chip degenerates to a 1x1 mesh (everything replicated) with zero
overhead.  Multi-slice later: add an outer DCN axis and keep fsdp inside the
slice so gathers ride ICI.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None, dp: Optional[int] = None, fsdp: int = 1,
    dcn: int = 1,
) -> Mesh:
    """(dp, fsdp) mesh, optionally with an outer ``dcn`` data axis for
    multi-slice/multi-host runs (SURVEY.md §2.8 "DCN for multi-slice").

    With ``dcn > 1`` the mesh is ('dcn', 'dp', 'fsdp') and the device order
    keeps each slice's devices contiguous in the trailing axes, so fsdp
    all-gathers and within-slice dp all-reduces ride ICI while only the
    outer gradient reduction crosses DCN.  Under ``jax.distributed`` the
    natural choice is ``dcn = jax.process_count()`` (one slice per host)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // (fsdp * dcn)
    assert dp * fsdp * dcn == n, f"mesh {dcn}x{dp}x{fsdp} != {n} devices"
    if dcn > 1:
        arr = np.asarray(devices).reshape(dcn, dp, fsdp)
        return Mesh(arr, ("dcn", "dp", "fsdp"))
    arr = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(arr, ("dp", "fsdp"))


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host entry (the accelerate-launcher equivalent,
    config/accelerate_config.json): call before any backend-initialising
    JAX operation.  No-ops (returns False) when neither arguments nor the
    standard coordinator environment variables are present, so single-host
    runs need no flags.  Env contract (also honoured natively by
    ``jax.distributed.initialize`` on TPU pods): ``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``."""
    import os

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if (coordinator is None and num_processes is None
            and os.environ.get("JAX_NUM_PROCESSES") is None):
        # TPU pods auto-discover via metadata; only initialize when asked
        # (JAX_NUM_PROCESSES alone counts as asking — pods may omit the
        # coordinator and rely on auto-discovery, round-2 review)
        if os.environ.get("TTV_MULTIHOST") != "1":
            return False
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    # Force cross-process collective-context creation NOW, while every
    # process is aligned at the same line (all just returned from
    # initialize's rendezvous).  Without this, the context is lazily built
    # at the FIRST real collective — which on the CPU/gloo backend carries a
    # hard 30 s key-exchange deadline, so any >30 s inter-process skew
    # before that point (uneven tracing/compile load; observed on the
    # 1-core CI host under a concurrent compile) kills the job with
    # "Gloo context initialization failed: DEADLINE_EXCEEDED".  The barrier
    # costs one tiny allgather and makes later collectives reuse the
    # established context.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ttv distributed_init")
    return True


def is_main_process() -> bool:
    """Rank-0 gate for IO (reference: accelerator.is_main_process)."""
    return jax.process_index() == 0


def _fsdp_spec(shape, fsdp_size: int, min_size: int = 2**16) -> P:
    """Shard the largest axis divisible by the fsdp axis size; replicate
    small tensors (norm scales, biases) outright."""
    if fsdp_size == 1 or not shape:
        return P()
    size = int(np.prod(shape))
    if size < min_size:  # small tensors: replication is cheaper than gathers
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def shard_params(params: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """NamedShardings for a param/optimizer pytree under the fsdp rule.

    ``min_size``: tensors smaller than this stay replicated (gathers cost
    more than they save); tests shrink it to exercise sharding on tiny
    models."""
    fsdp_size = mesh.shape["fsdp"]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _fsdp_spec(np.shape(x), fsdp_size, min_size)),
        params,
    )


def _batch_axes(mesh: Mesh):
    axes = tuple(a for a in ("dcn", "dp", "fsdp") if a in mesh.axis_names)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return axes, n


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Batch axis sharded over all data axes jointly ((dcn,)dp,fsdp).

    Rank-0 leaves (scalars) are replicated; a batch-like leaf whose leading
    dim the mesh can't divide RAISES — the round-2 silent-replicate fallback
    turned a sharding mistake into wrong-but-running semantics (the
    multi-host local-vs-global batch bug rode exactly this; VERDICT r2 §3)."""
    axes, n = _batch_axes(mesh)

    def spec(x):
        if np.ndim(x) == 0:
            return NamedSharding(mesh, P())
        if np.shape(x)[0] % n:
            raise ValueError(
                f"batch leaf with leading dim {np.shape(x)[0]} is not "
                f"divisible by the mesh data extent {n} "
                f"(axes {axes}, mesh {dict(mesh.shape)}); refusing to "
                f"silently replicate a batch-like leaf")
        return NamedSharding(mesh, P(axes, *([None] * (np.ndim(x) - 1))))

    return jax.tree.map(spec, batch)


def global_batch(batch: Any, mesh: Mesh) -> Any:
    """Build GLOBAL device arrays from a PROCESS-LOCAL host batch.

    The multihost equivalent of ``device_put(batch, shard_batch(batch,
    mesh))``: each process passes only its local shard (leading dim
    ``global_B / process_count``, the DistributedSampler contract of the
    reference's accelerate DDP, train_svd.py:480-485) and gets back arrays
    whose global leading dim spans every process.  The sharding spec is
    computed from the GLOBAL shape — computing it from the local shape was
    the round-2 multi-host bug (a (1,·) local batch fell through to
    replicated and the cross-process reduction never happened).

    Single-process: identical to the device_put path (no copy semantics
    change), so callers can use it unconditionally."""
    axes, n = _batch_axes(mesh)
    nproc = jax.process_count()
    if nproc == 1:
        return jax.device_put(batch, shard_batch(batch, mesh))

    # every non-scalar leaf is treated as a per-process batch shard below;
    # a replicated non-scalar (shared constant vector) would be silently
    # concatenated into wrong global data, so insist the tree really is
    # batch-collated: all non-scalar leaves share the same leading dim
    lead = {np.asarray(l).shape[0] for l in jax.tree.leaves(batch)
            if np.asarray(l).ndim > 0}
    if len(lead) > 1:
        raise ValueError(
            "global_batch expects a batch-collated tree (every non-scalar "
            f"leaf shares one leading batch dim); got leading dims {sorted(lead)}. "
            "Replicated non-scalar leaves must be passed outside the batch.")

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            # replicated scalar: every process must hold the same value
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), x, x.shape)
        g0 = x.shape[0] * nproc
        if g0 % n:
            raise ValueError(
                f"global batch dim {g0} (= local {x.shape[0]} x "
                f"{nproc} processes) not divisible by mesh data extent {n}")
        s = NamedSharding(mesh, P(axes, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(
            s, x, (g0,) + x.shape[1:])

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda x: NamedSharding(mesh, P()), tree)


def host_replicated(tree: Any) -> Any:
    """Gather a (possibly cross-process-sharded) pytree to host numpy.

    Single-host: identity (no copy).  Multihost: a COLLECTIVE — every
    process must call it at the same point; afterwards rank-0-only IO
    (checkpoint write, validation render) is safe because the returned
    numpy leaves are process-local, so nothing downstream touches arrays
    spanning non-addressable devices.  TPU-native analog of accelerate's
    gather + ``is_main_process`` save pattern (train_svd.py:843-869)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    # tiled=True: gather global (non-fully-addressable) arrays to their
    # global shape (tiled=False would try to stack a new leading axis and
    # is rejected for global inputs)
    return multihost_utils.process_allgather(tree, tiled=True)


def replicate_to_mesh(tree: Any, mesh: Mesh) -> Any:
    """device_put every leaf fully replicated over the mesh (inference
    serving: parameters live on every chip)."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_leading(tree: Any, mesh: Mesh, axes: Optional[Sequence[str]] = None) -> Any:
    """device_put with the leading axis split over ``axes`` (default: every
    mesh axis) — the batch-of-clips axis for data-parallel inference."""
    axes = tuple(axes) if axes is not None else tuple(mesh.axis_names)
    s = NamedSharding(mesh, P(axes))
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def make_serving_mesh(devices: Optional[Sequence] = None, cfg: int = 1) -> Mesh:
    """('clip', 'cfg') mesh for inference serving.

    * ``clip`` — clips data-parallel (throughput), like the (dp, fsdp) batch
      axis but named for serving.
    * ``cfg``  — the classifier-free-guidance folded batch axis (latency):
      the uncond/cond halves are fully independent through the UNet and
      ControlNet, so splitting them over 2 chips halves per-step time at the
      cost of one small latent all-gather per denoise step (the CFG combine)
      riding ICI.  ``cfg`` should be 2 (standard CFG) or 3 (InstructPix2Pix).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % cfg == 0, f"{n} devices not divisible by cfg={cfg}"
    arr = np.asarray(devices).reshape(n // cfg, cfg)
    return Mesh(arr, ("clip", "cfg"))
