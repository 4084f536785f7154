"""Opt-in TTV_FUSED_LN=1 block wiring must match the default path exactly
(same params, same inputs, XLA fallback math on CPU) and declare the
identical param tree (checkpoint contract)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from this_and_that_vdm_tpu.models.transformer import (
    BasicTransformerBlock,
    TemporalBasicTransformerBlock,
)


def _mk_spatial():
    blk = BasicTransformerBlock(heads=2, dim_head=16, cross_attention_dim=24)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 12, 32).astype(np.float32))
    ctx = jnp.asarray(rng.randn(4, 5, 24).astype(np.float32))
    return blk, x, ctx


def test_spatial_block_fused_matches_default(monkeypatch):
    blk, x, ctx = _mk_spatial()
    monkeypatch.setenv("TTV_FUSED_LN", "0")
    params = blk.init(jax.random.PRNGKey(0), x, ctx)
    ref = blk.apply(params, x, ctx)
    monkeypatch.setenv("TTV_FUSED_LN", "1")
    got = blk.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_temporal_block_fused_matches_default(monkeypatch):
    blk = TemporalBasicTransformerBlock(heads=2, dim_head=16, cross_attention_dim=24)
    rng = np.random.RandomState(1)
    b, f, s, c = 2, 4, 12, 32
    x = jnp.asarray(rng.randn(b * f, s, c).astype(np.float32))
    ctx = jnp.asarray(rng.randn(b, 5, 24).astype(np.float32))
    monkeypatch.setenv("TTV_FUSED_LN", "0")
    params = blk.init(jax.random.PRNGKey(0), x, f, ctx)
    ref = blk.apply(params, x, f, ctx)
    monkeypatch.setenv("TTV_FUSED_LN", "1")
    got = blk.apply(params, x, f, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("env", ["0", "1"])
def test_param_tree_identical(monkeypatch, env):
    blk, x, ctx = _mk_spatial()
    monkeypatch.setenv("TTV_FUSED_LN", "0")
    p0 = blk.init(jax.random.PRNGKey(0), x, ctx)
    monkeypatch.setenv("TTV_FUSED_LN", env)
    p1 = blk.init(jax.random.PRNGKey(0), x, ctx)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        assert a.shape == b.shape and a.dtype == b.dtype
