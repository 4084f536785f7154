"""Fused GroupNorm(+SiLU) Pallas kernel.

The denoiser calls GroupNorm ~70x per forward; the XLA path costs two fp32
reduction fusions plus an affine pass over the tensor (profiled ~10% of step
time even after the layout-friendly rewrite).  This kernel does one
read + one write per tensor: per-program [S, C] tile (a full batch row) in
VMEM, column sums, group combine via a tiny one-hot matmul (no lane-splitting
reshape), per-channel affine and optional SiLU fused into the write.

Opt-in via TTV_FUSED_GROUPNORM=1: after the layout-friendly XLA GroupNorm
rewrite in models/layers.py, the XLA path measured equal-or-faster end to end
(25-step UNet scan on 1x v5e: 122 ms/step XLA-GN vs 125 ms/step fused, both
with Pallas flash attention), so the kernel is kept for future tuning but
disabled by default.  Numerics identical (tests/test_groupnorm_pallas.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_TILE_BYTES = 8 * 2**20  # [S, C] fp32 working set budget per program


def supports(n: int, s: int, c: int, num_groups: int, dtype) -> bool:
    if os.environ.get("TTV_FUSED_GROUPNORM", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if c % num_groups or c % 128 or s % 8:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return s * c * 4 <= _MAX_TILE_BYTES


def _kernel(x_ref, scale_ref, bias_ref, onehot_ref, o_ref, *, eps, with_silu, count):
    x = x_ref[0].astype(jnp.float32)  # [S, C]
    onehot = onehot_ref[:]  # [C, G] fp32
    s1 = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    g1 = jnp.dot(s1, onehot, preferred_element_type=jnp.float32)  # [1, G]
    g2 = jnp.dot(s2, onehot, preferred_element_type=jnp.float32)
    mean = g1 / count
    # clamp: one-pass variance can cancel slightly negative on
    # (near-)constant groups -> rsqrt(neg) = NaN (see models/layers.py)
    var = jnp.maximum(g2 / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    # back to per-channel via the transposed one-hot
    inv_c = jnp.dot(inv, onehot.T, preferred_element_type=jnp.float32)  # [1, C]
    mean_c = jnp.dot(mean, onehot.T, preferred_element_type=jnp.float32)
    w = inv_c * scale_ref[:]  # [1, C]
    b = bias_ref[:] - mean_c * w
    y = x * w + b
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_pallas(x, scale2d, bias2d, onehot, *, eps, with_silu, count):
    """Raw pallas_call on (process-)local shapes; grid over the batch rows."""
    n, s, c = x.shape
    num_groups = onehot.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, with_silu=with_silu, count=count),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x, scale2d, bias2d, onehot)


# --------------------------------------------------------------------------
# Sharded-program compatibility (round 3, VERDICT r2 next #8): Mosaic kernels
# cannot be auto-partitioned by GSPMD; without a rule, flipping
# TTV_FUSED_GROUPNORM=1 inside a sharded (dp/fsdp/serving-mesh) program fails
# to compile.  The GN statistics are independent per batch row, so the rule
# shards the leading N axis and replicates S/C/params — each shard runs the
# kernel on its local rows (same treatment as ops/adam8bit_pallas.py).
# --------------------------------------------------------------------------
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _row_spec(sharding):
    spec = getattr(sharding, "spec", None)
    if spec is None or not tuple(spec):
        return P()
    return P(tuple(spec)[0], None, None)


def _cp_infer(mesh, arg_shapes, result_shape):
    return NamedSharding(mesh, _row_spec(arg_shapes[0].sharding))


def _cp_partition(eps, with_silu, count, mesh, arg_shapes, result_shape):
    row = NamedSharding(mesh, _row_spec(arg_shapes[0].sharding))
    repl = NamedSharding(mesh, P())

    def lower_fn(x, scale2d, bias2d, onehot):
        return _gn_pallas(x, scale2d, bias2d, onehot,
                          eps=eps, with_silu=with_silu, count=count)

    return mesh, lower_fn, row, (row, repl, repl, repl)


@functools.lru_cache(maxsize=None)
def _make_partitioned(eps: float, with_silu: bool, count: float):
    fn = custom_partitioning(
        lambda x, s, b, oh: _gn_pallas(x, s, b, oh, eps=eps,
                                       with_silu=with_silu, count=count))
    fn.def_partition(
        partition=functools.partial(_cp_partition, eps, with_silu, count),
        infer_sharding_from_operands=_cp_infer,
        # Shardy rule: batch factor n shards; token (s), channel (c), the
        # params' unit rows (u, v) and group (g) columns replicate.
        sharding_rule="n s c, u c, v c, c g -> n s c",
        need_replication_factors=("s", "c", "u", "v", "g"),
    )
    return fn


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "with_silu"))
def group_norm_silu(x, scale, bias, num_groups: int, eps: float, with_silu: bool):
    """x: [N, S, C] (stats per (N, group) over S and group channels)."""
    n, s, c = x.shape
    onehot = np.zeros((c, num_groups), np.float32)
    per = c // num_groups
    for g in range(num_groups):
        onehot[g * per : (g + 1) * per, g] = 1.0
    count = float(s * per)
    args = (
        x,
        scale.reshape(1, c).astype(jnp.float32),
        bias.reshape(1, c).astype(jnp.float32),
        jnp.asarray(onehot),
    )
    if jax.default_backend() != "tpu":
        # CPU interpret-mode tests: interpret pallas_calls carry ordered IO
        # effects that custom_partitioning cannot stage — call the body
        # directly (the partitioned path is TPU-only, like the kernel)
        return _gn_pallas(*args, eps=eps, with_silu=with_silu, count=count)
    return _make_partitioned(eps, with_silu, count)(*args)
