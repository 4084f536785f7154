"""XMem finetuning stack: losses + jitted multi-frame train step.

Closes the last SURVEY §2 inventory row (the reference's VOS training
stack, track_anything_code/tracker/model/losses.py + trainer.py:60-150 —
unused at reference *runtime* but part of its surface).

Reference behavior replicated:
  * bootstrapped cross-entropy with the warm-up schedule (losses.py:23-43):
    plain CE before ``start_warm``, then the hardest ``this_p`` fraction of
    pixels, ``this_p`` annealing linearly from 1.0 to ``top_p`` between
    ``start_warm`` and ``end_warm`` — computed PER SAMPLE, per frame, like
    the reference's ``bi`` loop;
  * dice loss over all object channels with the +1 smooth term
    (losses.py:8-19), background excluded via ``cls_gt == i+1``;
  * the teacher-forced multi-frame forward (trainer.py:80-118): frame 0's
    value comes from ground-truth masks, every later frame is segmented
    against the memory of all previous frames and writes back its OWN
    predicted masks, with random ref-frame subsampling past
    ``num_ref_frames`` (frame 0 always kept — the ``filler_one`` quirk) and
    a bernoulli(``deep_update_prob``) deep hidden update.

TPU-first redesign (vs the reference's python-list memory and per-sample
gather loops):
  * the memory bank is a FIXED-SHAPE buffer of T-1 slots; slot validity and
    ref-frame subsampling are a mask in the affinity softmax (the
    ``topk_softmax``/mask machinery models/xmem.py already uses) — no
    growing tensors, no dynamic shapes;
  * the frame loop is a ``lax.scan`` (one compiled program for any T);
  * bootstrapped CE's data-dependent top-k is a full per-sample sort + rank
    mask (static shapes; k is a traced scalar);
  * per-sample object-count restriction is a channel mask (-inf logits)
    instead of the reference's per-sample python slicing.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..models import xmem as xm


@dataclasses.dataclass(frozen=True)
class XMemTrainConfig:
    # losses.py schedule (reference stage configs: e.g. 20k/70k at s3)
    start_warm: int = 20000
    end_warm: int = 70000
    top_p: float = 0.15
    # trainer.py memory policy
    num_ref_frames: int = 3
    deep_update_prob: float = 0.2
    learning_rate: float = 1e-5
    weight_decay: float = 0.05


# ---------------------------------------------------------------------------
# losses (reference losses.py)
# ---------------------------------------------------------------------------

def dice_loss(mask_prob: jnp.ndarray, cls_gt: jnp.ndarray) -> jnp.ndarray:
    """mask_prob [B,N,H,W] (per-object prob, no background channel),
    cls_gt [B,H,W] int (0 = background, i+1 = object i).  Mean over all
    (sample, object) pairs, exactly like the reference's cat-then-mean."""
    n = mask_prob.shape[1]
    gt = (cls_gt[:, None] == (jnp.arange(n) + 1)[None, :, None, None]
          ).astype(jnp.float32)
    m = mask_prob.reshape(mask_prob.shape[:2] + (-1,))
    g = gt.reshape(gt.shape[:2] + (-1,))
    num = 2.0 * jnp.sum(m * g, -1)
    den = jnp.sum(m, -1) + jnp.sum(g, -1)
    return jnp.mean(1.0 - (num + 1.0) / (den + 1.0))


def _this_p(it, start_warm: int, end_warm: int, top_p: float):
    it = jnp.asarray(it, jnp.float32)
    anneal = top_p + (1.0 - top_p) * (end_warm - it) / (end_warm - start_warm)
    return jnp.where(it < start_warm, 1.0,
                     jnp.where(it > end_warm, top_p, anneal))


def bootstrapped_ce(logits: jnp.ndarray, target: jnp.ndarray, it,
                    start_warm: int, end_warm: int, top_p: float = 0.15,
                    num_classes: Optional[jnp.ndarray] = None):
    """Per-sample bootstrapped CE (losses.py:23-43), batched.

    logits [B,C,H,W]; target [B,H,W] int; ``num_classes`` [B] optional —
    channels >= num_classes[b] are excluded from sample b's softmax (the
    reference's ``[:num_objects[bi]+1]`` slice).  Returns (mean loss over
    B, this_p)."""
    b, c = logits.shape[:2]
    if num_classes is not None:
        chan_ok = jnp.arange(c)[None, :] < num_classes[:, None]  # [B,C]
        logits = jnp.where(chan_ok[:, :, None, None], logits, -jnp.inf)
    logp = jax.nn.log_softmax(logits, axis=1)
    raw = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]  # [B,H,W]
    raw = raw.reshape(b, -1)
    npix = raw.shape[1]

    p = _this_p(it, start_warm, end_warm, top_p)
    k = jnp.maximum((npix * p).astype(jnp.int32), 1)
    hard_first = jnp.sort(raw, axis=1)[:, ::-1]
    keep = (jnp.arange(npix)[None, :] < k).astype(raw.dtype)
    per_sample = jnp.sum(hard_first * keep, axis=1) / k.astype(raw.dtype)
    return jnp.mean(per_sample), p


def xmem_losses(logits_seq, masks_seq, cls_gt, it, cfg: XMemTrainConfig,
                num_objects: Optional[jnp.ndarray] = None):
    """LossComputer.compute equivalent (losses.py:46-68), vmapped over the
    T-1 supervised frames.

    logits_seq [T-1,B,1+N,H,W]; masks_seq [T-1,B,N,H,W];
    cls_gt [B,T,H,W]; num_objects [B] (live objects per sample)."""
    t1 = logits_seq.shape[0]
    targets = jnp.moveaxis(cls_gt[:, 1:], 1, 0)  # [T-1,B,H,W]
    ncls = None if num_objects is None else num_objects + 1

    def per_frame(lg, ms, tg):
        ce, p = bootstrapped_ce(lg, tg, it, cfg.start_warm, cfg.end_warm,
                                cfg.top_p, ncls)
        return ce, dice_loss(ms, tg), p

    ce, dice, p = jax.vmap(per_frame)(logits_seq, masks_seq, targets)
    total = jnp.sum(ce) + jnp.sum(dice)
    return dict(total_loss=total, ce_loss=jnp.mean(ce),
                dice_loss=jnp.mean(dice), p=jnp.mean(p),
                n_frames=jnp.float32(t1))


# ---------------------------------------------------------------------------
# the teacher-forced multi-frame forward (reference trainer.py:60-150)
# ---------------------------------------------------------------------------

def _ref_mask(key, b: int, slots: int, ti, num_ref: int) -> jnp.ndarray:
    """[B, slots] 0/1 mask selecting which memory slots frame ``ti`` reads.

    Valid slots are < ti.  When ti > num_ref, pick num_ref of them at
    random with slot 0 ALWAYS kept (trainer.py's ``filler_one``).  Static
    shapes: priorities + rank threshold instead of randperm-gather."""
    pri = jax.random.uniform(key, (b, slots))
    idx = jnp.arange(slots)[None, :]
    pri = jnp.where(idx == 0, -1.0, pri)          # frame 0 wins every draw
    pri = jnp.where(idx >= ti, 2.0, pri)          # future slots never picked
    rank = jnp.argsort(jnp.argsort(pri, axis=1), axis=1)
    quota = jnp.minimum(ti, num_ref)
    return (rank < quota).astype(jnp.float32)


def make_xmem_train_step(model: xm.XMem, tx, cfg: XMemTrainConfig):
    """Returns jitted ``step(state, batch, it, key) -> (state, metrics)``.

    ``batch``: rgb [B,T,H,W,3] ImageNet-normalized, first_frame_gt
    [B,N,H,W] binary, cls_gt [B,T,H,W] int32, selector [B,N] float
    (1 = live object), num_objects [B] int32.  ``state`` is a
    ``trainer.TrainState``.
    """
    from .trainer import TrainState

    def forward_losses(params, batch, it, key):
        rgb, gt0 = batch["rgb"], batch["first_frame_gt"]
        selector = batch["selector"]
        b, t = rgb.shape[:2]
        n_obj = gt0.shape[1]
        flat = rgb.reshape((b * t,) + rgb.shape[2:])
        key_k, sh_k, sel_k, f16, f8, f4 = model.apply(
            params, flat, method=model.encode_key)

        hq, wq = key_k.shape[1:3]
        p_tok = hq * wq

        def tok(x):  # [B*T, h, w, C] -> [B, T, P, C]
            return x.reshape(b, t, p_tok, x.shape[-1])

        keys, shrink, select = tok(key_k), tok(sh_k)[..., 0], tok(sel_k)
        f16 = f16.reshape((b, t) + f16.shape[1:])
        f8 = f8.reshape((b, t) + f8.shape[1:])
        f4 = f4.reshape((b, t) + f4.shape[1:])

        # frame 0: GT-mask value + zero hidden (trainer.py:66-79)
        hidden = jnp.zeros((b, n_obj) + f16.shape[2:4] + (model.hidden_dim,))
        v0, hidden = model.apply(params, rgb[:, 0], f16[:, 0], hidden, gt0,
                                 True, method=model.encode_value)

        slots = t - 1
        values = jnp.zeros((b, n_obj, slots, p_tok, v0.shape[-1]))
        values = values.at[:, :, 0].set(
            v0.reshape(b, n_obj, p_tok, v0.shape[-1]))
        mem_keys = keys[:, :slots].reshape(b, slots * p_tok, -1)
        mem_shrink = shrink[:, :slots].reshape(b, slots * p_tok)

        def scan_step(carry, x):
            hidden, values = carry
            ti, k_ref, k_deep = x["ti"], x["k_ref"], x["k_deep"]

            slot_mask = _ref_mask(k_ref, b, slots, ti, cfg.num_ref_frames)
            tok_mask = jnp.repeat(slot_mask, p_tok, axis=1)  # [B, slots*P]

            sim = xm.key_similarity(mem_keys, mem_shrink, x["qk"], x["qe"])
            sim = jnp.where(tok_mask[:, None, :] > 0, sim, -jnp.inf)
            affinity = jax.nn.softmax(sim, axis=-1)
            readout = jnp.einsum(
                "bpn,bonc->bopc", affinity,
                values.reshape(b, n_obj, slots * p_tok, -1))
            readout = readout.reshape(b, n_obj, hq, wq, -1)

            # strip_bg=True: logits keep the aggregated background channel
            # (CE target 0), masks drop it — encode_value and dice_loss both
            # take per-OBJECT channels (reference trainer.py:100-110 uses
            # prob[:, 1:] the same way)
            hidden, logits, masks = model.apply(
                params, x["f16"], x["f8"], x["f4"], readout, hidden,
                True, True, selector, method=model.segment)

            # write frame ti's value from its own prediction; the slot is
            # only ever read by frames > ti (the final write lands on a
            # clamped slot nobody reads)
            v16, h_deep = model.apply(params, x["frame"], x["f16"], hidden,
                                      masks, True, method=model.encode_value)
            deep = jax.random.bernoulli(k_deep, cfg.deep_update_prob)
            hidden = jnp.where(deep, h_deep, hidden)
            values = jax.lax.dynamic_update_slice(
                values, v16.reshape(b, n_obj, 1, p_tok, -1),
                (0, 0, ti, 0, 0))
            return (hidden, values), (logits, masks)

        tis = jnp.arange(1, t)
        ks = jax.random.split(key, 2 * (t - 1))
        xs = dict(
            ti=tis, k_ref=ks[: t - 1], k_deep=ks[t - 1:],
            qk=jnp.moveaxis(keys[:, 1:], 1, 0),
            qe=jnp.moveaxis(select[:, 1:], 1, 0),
            f16=jnp.moveaxis(f16[:, 1:], 1, 0),
            f8=jnp.moveaxis(f8[:, 1:], 1, 0),
            f4=jnp.moveaxis(f4[:, 1:], 1, 0),
            frame=jnp.moveaxis(rgb[:, 1:], 1, 0),
        )
        _, (logits_seq, masks_seq) = jax.lax.scan(
            scan_step, (hidden, values), xs)

        return xmem_losses(logits_seq, masks_seq, batch["cls_gt"], it, cfg,
                           batch.get("num_objects"))

    def loss_fn(params, batch, it, key):
        losses = forward_losses(params, batch, it, key)
        return losses["total_loss"], losses

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, it, key):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, it, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        losses["grad_norm"] = optax.global_norm(grads)
        return new_state, losses

    return step


def make_optimizer(cfg: XMemTrainConfig):
    """AdamW, the reference trainer's optimizer (trainer.py config)."""
    return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
