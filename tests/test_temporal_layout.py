"""Unfolded temporal-block layout (TTV_TEMPORAL_UNFOLDED) must match the
folded reference path bit-for-bit in math (same params, same inputs),
including the hw-major context-selection quirk at CFG batch 2."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from this_and_that_vdm_tpu.models.transformer import TemporalBasicTransformerBlock


@pytest.mark.parametrize("b,s", [(1, 12), (2, 12), (3, 9)])
def test_unfolded_matches_folded(monkeypatch, b, s):
    f, c = 4, 32
    blk = TemporalBasicTransformerBlock(heads=2, dim_head=16,
                                        cross_attention_dim=24)
    rng = np.random.RandomState(b * 100 + s)
    x = jnp.asarray(rng.randn(b * f, s, c).astype(np.float32))
    ctx = jnp.asarray(rng.randn(b, 5, 24).astype(np.float32))

    monkeypatch.setenv("TTV_TEMPORAL_UNFOLDED", "0")
    params = blk.init(jax.random.PRNGKey(0), x, f, ctx)
    folded = blk.apply(params, x, f, ctx)

    monkeypatch.setenv("TTV_TEMPORAL_UNFOLDED", "1")
    unfolded = blk.apply(params, x, f, ctx)

    np.testing.assert_allclose(np.asarray(unfolded), np.asarray(folded),
                               atol=2e-5)


def test_unfolded_param_structure_matches(monkeypatch):
    """Both layouts must init the identical param tree (checkpoint contract)."""
    f, c, b, s = 3, 32, 2, 8
    blk = TemporalBasicTransformerBlock(heads=2, dim_head=16,
                                        cross_attention_dim=24)
    x = jnp.zeros((b * f, s, c))
    ctx = jnp.zeros((b, 5, 24))
    monkeypatch.setenv("TTV_TEMPORAL_UNFOLDED", "0")
    p_folded = blk.init(jax.random.PRNGKey(0), x, f, ctx)
    monkeypatch.setenv("TTV_TEMPORAL_UNFOLDED", "1")
    p_unfolded = blk.init(jax.random.PRNGKey(0), x, f, ctx)
    ja, jb = jax.tree_util.tree_structure(p_folded), jax.tree_util.tree_structure(p_unfolded)
    assert ja == jb
    for a, bb in zip(jax.tree.leaves(p_folded), jax.tree.leaves(p_unfolded)):
        assert a.shape == bb.shape


def test_large_batch_falls_back_to_folded(monkeypatch):
    """Training batches (b > 3) must keep the folded path (no n-x cross
    attention blowup) — output unchanged by the env knob."""
    f, c, b, s = 3, 32, 5, 8
    blk = TemporalBasicTransformerBlock(heads=2, dim_head=16,
                                        cross_attention_dim=24)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b * f, s, c).astype(np.float32))
    ctx = jnp.asarray(rng.randn(b, 5, 24).astype(np.float32))
    monkeypatch.setenv("TTV_TEMPORAL_UNFOLDED", "0")
    params = blk.init(jax.random.PRNGKey(0), x, f, ctx)
    ref = blk.apply(params, x, f, ctx)
    monkeypatch.setenv("TTV_TEMPORAL_UNFOLDED", "1")
    np.testing.assert_array_equal(np.asarray(blk.apply(params, x, f, ctx)),
                                  np.asarray(ref))
