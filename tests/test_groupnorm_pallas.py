"""Fused Pallas GroupNorm(+SiLU) vs the XLA reference path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from this_and_that_vdm_tpu.models.layers import _group_norm
from this_and_that_vdm_tpu.ops import groupnorm_pallas as gnp


@pytest.mark.parametrize("with_silu", [False, True])
def test_kernel_matches_reference(with_silu):
    rng = np.random.RandomState(0)
    n, s, c, g = 3, 64, 256, 32
    x = jnp.asarray(rng.randn(n, s, c), jnp.float32)
    scale = jnp.asarray(rng.randn(c), jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)

    expected = _group_norm(x, scale, bias, g, 1e-5)
    if with_silu:
        expected = jax.nn.silu(expected)
    with pltpu.force_tpu_interpret_mode():
        got = gnp.group_norm_silu(x, scale, bias, g, 1e-5, with_silu)
    assert np.allclose(np.asarray(got), np.asarray(expected), atol=2e-5), \
        np.abs(np.asarray(got) - np.asarray(expected)).max()


def test_supports_gating(monkeypatch):
    f32 = jnp.float32
    monkeypatch.setenv("TTV_FUSED_GROUPNORM", "1")  # opt-in kernel
    if jax.default_backend() == "tpu":
        assert gnp.supports(28, 1536, 320, 32, jnp.bfloat16)
    assert not gnp.supports(28, 1536, 321, 32, f32)  # channels not /128... odd
    assert not gnp.supports(1, 3, 256, 32, f32)  # rows not /8
    assert not gnp.supports(1, 8192, 1280, 32, f32)  # tile too big
    monkeypatch.setenv("TTV_FUSED_GROUPNORM", "0")
    assert not gnp.supports(28, 1536, 320, 32, jnp.bfloat16)  # default off


def test_group_norm_constant_input_is_finite():
    """One-pass E[x^2]-mean^2 cancels slightly negative on (near-)constant
    groups; without the clamp rsqrt(var+eps) was NaN (hit by all-zero
    latents + time-embedding bias in the F=25 smoke).  Degenerate groups
    must normalise to ~bias like torch, both in the XLA path and the Pallas
    kernel."""
    from jax.experimental.pallas import tpu as pltpu

    c, g = 256, 32
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.full((c,), 0.25, jnp.float32)
    # per-channel constants large enough that fp32 cancellation error
    # exceeds eps=1e-5 (the NaN regime before the clamp)
    const = 100.0 + jnp.arange(c, dtype=jnp.float32) * 1e-4
    x = jnp.broadcast_to(const, (2, 8, 16, c))

    out = _group_norm(x, scale, bias, g, 1e-5)
    assert np.isfinite(np.asarray(out)).all()
    # x == mean within each group (up to the 1e-4 channel ramp): output ~bias
    assert np.abs(np.asarray(out) - 0.25).max() < 0.5

    with pltpu.force_tpu_interpret_mode():
        got = gnp.group_norm_silu(x.reshape(2, -1, c), scale, bias, g, 1e-5, False)
    assert np.isfinite(np.asarray(got)).all()


def test_gn_partitioning_rule_inside_sharded_program(monkeypatch):
    """Round-3 (VERDICT r2 next #8): the fused-GN knob must be safe inside a
    sharded program.  Mosaic bodies can't run on CPU (and interpret-mode
    callbacks can't lower inside the partitioner), so the kernel body is
    swapped for its XLA math: this validates the Shardy rule, the partition
    fn, and per-shard result assembly — the same treatment/coverage as flash
    attention and the fused Adam kernel."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    def xla_body(x, scale2d, bias2d, onehot, *, eps, with_silu, count):
        xf = x.astype(jnp.float32)
        s1 = jnp.einsum("nsc,cg->ng", xf, onehot)
        s2 = jnp.einsum("nsc,cg->ng", xf * xf, onehot)
        mean = s1 / count
        var = jnp.maximum(s2 / count - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        inv_c = jnp.einsum("ng,cg->nc", inv, onehot)[:, None, :]
        mean_c = jnp.einsum("ng,cg->nc", mean, onehot)[:, None, :]
        w = inv_c * scale2d
        b = bias2d - mean_c * w
        y = xf * w + b
        if with_silu:
            y = y * jax.nn.sigmoid(y)
        return y.astype(x.dtype)

    monkeypatch.setattr(gnp, "_gn_pallas", xla_body)
    gnp._make_partitioned.cache_clear()

    rng = np.random.RandomState(5)
    n, s, c, g = 8, 16, 256, 32
    x = jnp.asarray(rng.randn(n, s, c), jnp.float32)
    scale = jnp.asarray(rng.randn(c), jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    # the partitioned fn directly: group_norm_silu routes to it on TPU
    # backends only (CPU goes straight to the body for interpret tests)
    count = float(s * (c // g))
    onehot = np.zeros((c, g), np.float32)
    for gi in range(g):
        onehot[gi * (c // g): (gi + 1) * (c // g), gi] = 1.0
    part = gnp._make_partitioned(1e-5, True, count)
    got = jax.jit(lambda a: part(
        a, scale.reshape(1, c), bias.reshape(1, c), jnp.asarray(onehot)))(xs)
    gnp._make_partitioned.cache_clear()

    want = jax.nn.silu(_group_norm(x, scale, bias, g, 1e-5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
