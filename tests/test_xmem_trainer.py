"""XMem training stack (training/xmem_trainer.py) vs the reference losses
(track_anything_code/tracker/model/losses.py) and trainer semantics
(trainer.py:60-150)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from this_and_that_vdm_tpu.training import xmem_trainer as xt


# --- torch oracle: the reference loss code verbatim-in-behavior ------------

def _torch_dice(input_mask, cls_gt):
    num_objects = input_mask.shape[1]
    losses = []
    for i in range(num_objects):
        mask = input_mask[:, i].flatten(start_dim=1)
        gt = (cls_gt == (i + 1)).float().flatten(start_dim=1)
        numerator = 2 * (mask * gt).sum(-1)
        denominator = mask.sum(-1) + gt.sum(-1)
        losses.append(1 - (numerator + 1) / (denominator + 1))
    return torch.cat(losses).mean()


def _torch_bce(inp, target, it, start_warm, end_warm, top_p=0.15):
    if it < start_warm:
        return F.cross_entropy(inp, target), 1.0
    raw_loss = F.cross_entropy(inp, target, reduction="none").view(-1)
    num_pixels = raw_loss.numel()
    if it > end_warm:
        this_p = top_p
    else:
        this_p = top_p + (1 - top_p) * ((end_warm - it) / (end_warm - start_warm))
    loss, _ = torch.topk(raw_loss, int(num_pixels * this_p), sorted=False)
    return loss.mean(), this_p


def test_dice_loss_parity():
    rng = np.random.RandomState(0)
    m = rng.rand(2, 3, 16, 12).astype(np.float32)
    gt = rng.randint(0, 4, (2, 16, 12)).astype(np.int32)
    ours = float(xt.dice_loss(jnp.asarray(m), jnp.asarray(gt)))
    ref = float(_torch_dice(torch.from_numpy(m), torch.from_numpy(gt)))
    assert abs(ours - ref) < 1e-6, (ours, ref)


@pytest.mark.parametrize("it", [0, 45000, 99999])
def test_bootstrapped_ce_parity_single_sample(it):
    """The reference computes BCE per sample; compare per sample at all
    three schedule regimes (warm / annealing / converged)."""
    rng = np.random.RandomState(it % 97)
    logits = rng.randn(1, 4, 16, 12).astype(np.float32)
    target = rng.randint(0, 4, (1, 16, 12))
    ours, p_ours = xt.bootstrapped_ce(
        jnp.asarray(logits), jnp.asarray(target), it,
        start_warm=20000, end_warm=70000)
    ref, p_ref = _torch_bce(torch.from_numpy(logits),
                            torch.from_numpy(target).long(), it, 20000, 70000)
    assert abs(float(p_ours) - float(p_ref)) < 1e-6
    assert abs(float(ours) - float(ref)) < 1e-5, (float(ours), float(ref), it)


def test_bootstrapped_ce_channel_masking():
    """num_classes[b] restricts sample b's softmax to its live channels —
    equivalent to the reference's [:num_objects+1] slice."""
    rng = np.random.RandomState(3)
    logits = rng.randn(1, 4, 8, 8).astype(np.float32)
    target = rng.randint(0, 2, (1, 8, 8))
    full, _ = xt.bootstrapped_ce(jnp.asarray(logits[:, :2]),
                                 jnp.asarray(target), 0, 10, 20)
    masked, _ = xt.bootstrapped_ce(jnp.asarray(logits), jnp.asarray(target),
                                   0, 10, 20,
                                   num_classes=jnp.asarray([2]))
    assert abs(float(full) - float(masked)) < 1e-6


def test_ref_mask_semantics():
    key = jax.random.PRNGKey(0)
    b, slots, num_ref = 4, 7, 3
    for ti in (1, 2, 3, 5, 7):
        m = np.asarray(xt._ref_mask(key, b, slots, jnp.int32(ti), num_ref))
        assert m.shape == (b, slots)
        # frame 0 always kept; future slots never; quota respected
        assert (m[:, 0] == 1).all(), (ti, m)
        assert (m[:, ti:] == 0).all(), (ti, m)
        assert (m.sum(1) == min(ti, num_ref)).all(), (ti, m)


def test_xmem_train_step_smoke():
    """Two steps of the full teacher-forced multi-frame train step on a
    64x48 clip: losses finite, params actually move, grad flows through
    the scanned memory chain."""
    from this_and_that_vdm_tpu.models.xmem import XMem
    from this_and_that_vdm_tpu.training import trainer as base_trainer

    H, W, T, N, B = 64, 48, 4, 2, 1
    model = XMem()
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randn(B, T, H, W, 3).astype(np.float32) * 0.1)
    gt0 = jnp.asarray((rng.rand(B, N, H, W) > 0.7).astype(np.float32))
    cls_gt = jnp.asarray(rng.randint(0, N + 1, (B, T, H, W)).astype(np.int32))
    batch = dict(rgb=rgb, first_frame_gt=gt0, cls_gt=cls_gt,
                 selector=jnp.ones((B, N), jnp.float32),
                 num_objects=jnp.full((B,), N, jnp.int32))

    params = model.init(jax.random.PRNGKey(0), rgb[:, 0],
                        method=model.encode_key)
    hidden0 = jnp.zeros((B, N, H // 16, W // 16, model.hidden_dim))
    params = {"params": {
        **params["params"],
        **model.init(jax.random.PRNGKey(1), rgb[:, 0],
                     jnp.zeros((B, H // 16, W // 16, 1024)), hidden0, gt0,
                     True, method=model.encode_value)["params"],
        **model.init(jax.random.PRNGKey(2),
                     jnp.zeros((B, H // 16, W // 16, 1024)),
                     jnp.zeros((B, H // 8, W // 8, 512)),
                     jnp.zeros((B, H // 4, W // 4, 256)),
                     jnp.zeros((B, N, H // 16, W // 16, model.value_dim)),
                     hidden0, method=model.segment)["params"],
    }}

    cfg = xt.XMemTrainConfig(start_warm=1, end_warm=3, num_ref_frames=2,
                             learning_rate=1e-4)
    tx = xt.make_optimizer(cfg)
    state = base_trainer.init_train_state(params, tx)
    step = xt.make_xmem_train_step(model, tx, cfg)

    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state, m1 = step(state, batch, jnp.int32(0), jax.random.PRNGKey(3))
    state, m2 = step(state, batch, jnp.int32(5), jax.random.PRNGKey(4))
    for m in (m1, m2):
        for k, v in m.items():
            assert np.isfinite(float(v)), (k, float(v))
    assert float(m1["grad_norm"]) > 0.0
    assert float(m2["p"]) < 1.0 < float(m1["p"]) + 1e-6  # schedule engaged
    p1 = np.asarray(jax.tree.leaves(state.params)[0])
    assert not np.allclose(p0, p1)
