"""Per-clip batch independence via ``context_clips``.

The reference (diffusers 0.25.1 vendored, transformer_temporal.py:310-319)
broadcasts the temporal cross-attention context hw-major while queries fold
b-major — so for batch>1 each row reads context ``r % B``, cross-pairing
batch elements.  For the CFG pair (b=1 clip) that quirk is part of the
published weights' behavior and MUST be replicated (``context_clips=1``,
the default).  For multiple independent clips (serving micro-batches,
batch>1 training — paths the reference never exercises: it loops instances
serially and trains at per-GPU batch 1) the mapping must not leak across
clips: ``context_clips=B`` reproduces each clip's solo mapping exactly
(numerically — programs of different batch size fuse differently).
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from this_and_that_vdm_tpu.models.unet import (
    UNetConfig, UNetSpatioTemporalConditionModel)

F, H8, W8 = 2, 8, 16


def _setup(b):
    cfg = UNetConfig.nano()
    m = UNetSpatioTemporalConditionModel(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, F, H8, W8, 8)).astype(np.float32)
    st = rng.standard_normal((b, 1, cfg.cross_attention_dim)).astype(np.float32)
    ai = np.tile(np.array([[6.0, 200.0, 0.0]], np.float32), (b, 1))
    p = m.init(jr.PRNGKey(0), jnp.asarray(x), jnp.array(0.0),
               jnp.asarray(st), jnp.asarray(ai))
    return m, p, x, st, ai


def test_context_clips_makes_batch_rows_bit_independent():
    m, p, x, st, ai = _setup(4)
    full = np.asarray(m.apply(p, jnp.asarray(x), jnp.array(1.6),
                              jnp.asarray(st), jnp.asarray(ai),
                              context_clips=4))
    for i in range(4):
        one = np.asarray(m.apply(p, jnp.asarray(x[i:i + 1]), jnp.array(1.6),
                                 jnp.asarray(st[i:i + 1]),
                                 jnp.asarray(ai[i:i + 1])))
        # tight tolerance, not bit-equal: the b=4 and b=1 programs fuse/
        # reduce in different orders (float noise ~1e-6); any context leak
        # would show up at 1e-1 scale (see the quirk test below)
        np.testing.assert_allclose(full[i], one[0], atol=1e-5)


def test_default_keeps_reference_quirk():
    """context_clips=1 (default) must keep the reference's r % B mapping —
    batched rows deliberately differ from solo runs for batch>1 (weight
    parity at CFG batch 2 depends on it)."""
    m, p, x, st, ai = _setup(4)
    quirk = np.asarray(m.apply(p, jnp.asarray(x), jnp.array(1.6),
                               jnp.asarray(st), jnp.asarray(ai)))
    exact = np.asarray(m.apply(p, jnp.asarray(x), jnp.array(1.6),
                               jnp.asarray(st), jnp.asarray(ai),
                               context_clips=4))
    assert np.abs(quirk - exact).max() > 1e-3


def test_cfg_pair_fold_within_one_clip_unchanged():
    """b=1 clip, CFG fold 2 (the parity-critical case): context_clips=1 and
    the degenerate context_clips=... cannot differ — there is only one clip,
    and clips=1 IS the reference mapping."""
    m, p, x, st, ai = _setup(2)  # the CFG pair: batch rows [uncond; cond]
    a = np.asarray(m.apply(p, jnp.asarray(x), jnp.array(1.6),
                           jnp.asarray(st), jnp.asarray(ai)))
    b_ = np.asarray(m.apply(p, jnp.asarray(x), jnp.array(1.6),
                            jnp.asarray(st), jnp.asarray(ai),
                            context_clips=1))
    np.testing.assert_array_equal(a, b_)  # same code path: bit-equal
