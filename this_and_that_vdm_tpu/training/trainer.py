"""EDM finetuning drivers for VL (UNet) and VGL (GestureNet).

TPU-native replacement for the reference trainers (train_code/train_svd.py:
271-904 and train_code/train_csvd.py:272-1004): one jitted, donated,
mesh-sharded train step containing the whole reference step — frozen VAE +
CLIP encodes, EDM noising, conditioning dropout, model forward, weighted
reconstruction loss, optax update.  Data parallelism and ZeRO-style parameter
sharding come from jax.sharding annotations (parallel/mesh.py); gradient
all-reduce is emitted by XLA (the accelerate/NCCL DDP equivalent).

Reference knob parity: constant-with-warmup LR (:556-565), AdamW
(betas 0.9/0.999, eps 1e-8, wd 1e-2, :495-506), ``partial_finetune`` = only
params whose path mentions attention or embeddings (:513-539), per-block
gradient checkpointing (UNetConfig.remat), VGL grad-norm clip 1.0
(train_csvd.py:927-929), conditioning dropout prob 0.1 (:744-762).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..pipelines import common as pcommon
from . import edm


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # mirrors config/train_image2video{,_gesturenet}.yaml (reference)
    learning_rate: float = 1e-5
    lr_warmup_steps: int = 500
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    noise_mean: float = 0.5
    noise_std: float = 1.4
    conditioning_dropout_prob: float = 0.1
    train_noise_aug_strength: float = 0.1
    process_fps: int = 7
    motion_bucket_id: int = 200
    max_grad_norm: Optional[float] = None  # 1.0 for VGL
    partial_finetune: bool = False
    use_text: bool = True
    gradient_accumulation_steps: int = 1  # optax.MultiSteps microbatching
    # VGL sparse-conditioning experiments (train_csvd.py:834-886, off by default)
    mask_unet_vae: bool = False
    mask_controlnet_vae: bool = False
    mask_proportion: float = 0.0
    use_8bit_adam: bool = False  # block-quantised Adam state (bitsandbytes parity)


def _is_partial_trainable(path) -> bool:
    """Reference partial_finetune: param name contains 'attn' or 'emb'."""
    return any(("attn" in str(k)) or ("emb" in str(k)) for k in path)


def make_optimizer(cfg: TrainConfig, params=None) -> optax.GradientTransformation:
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps),
            optax.constant_schedule(cfg.learning_rate),
        ],
        [cfg.lr_warmup_steps],
    )
    if cfg.use_8bit_adam:
        import os

        from .optimizers import adamw8bit

        # Fused single-pass Pallas update per leaf (ops/adam8bit_pallas.py);
        # numerics identical to the jnp path.  Default ON since the real-chip
        # A/B: 2.303 vs 2.087 steps/s full VGL train step (+10.4%,
        # perf_r3/train_vgl_adamkernel.json).  "auto" engages only where
        # supported (TPU, big-enough leaves); TTV_ADAM_KERNEL=0 opts out.
        kernel = False if os.environ.get("TTV_ADAM_KERNEL") == "0" else "auto"
        tx = adamw8bit(
            schedule, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon, weight_decay=cfg.adam_weight_decay,
            kernel=kernel,
        )
    else:
        tx = optax.adamw(
            schedule,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        )
    if cfg.max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    if cfg.partial_finetune:
        def label_fn(p):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "train"
                if _is_partial_trainable([getattr(k, "key", "") for k in path])
                else "freeze",
                p,
            )
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, label_fn)
    if cfg.gradient_accumulation_steps > 1:
        # the reference's accelerator.accumulate (train_svd.py:710)
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.params, s.opt_state), None),
    lambda _, children: TrainState(*children),
)


def init_train_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


# NOTE train/inference fps skew is REFERENCE behavior: training conditions
# on raw process_fps=7 (train_svd.py:779-788 passes process_fps unmodified)
# while both inference pipelines condition on fps-1=6 (SVD's base model was
# conditioned on fps-1; pipeline_stable_video_diffusion.py:453-456).  The
# published weights were finetuned with this skew, so both sides replicate
# their respective reference values exactly.
def make_add_time_ids(cfg: TrainConfig, motion_bucket_id) -> jnp.ndarray:
    """[B, 3] micro-conditioning ids: (fps, per-sample motion bucket,
    noise_aug).  The reference builds add_time_ids per sample
    (train_svd.py) — each clip conditions on its own flow-derived bucket,
    so the batch must never be collapsed to a mean."""
    motion = jnp.asarray(motion_bucket_id, jnp.float32).reshape(-1)
    b = motion.shape[0]
    return jnp.stack(
        [
            jnp.full((b,), float(cfg.process_fps)),
            motion,
            jnp.full((b,), cfg.train_noise_aug_strength),
        ],
        axis=-1,
    )


def _encode_conditioning_train(modules, frozen, frames, prompt_ids, use_text):
    """First frame -> CLIP states + VAE cond latents (train_svd.py:649-699,
    :722-729). frames: [B, F, H, W, 3] in [-1, 1]."""
    first = frames[:, 0]
    px = pcommon.clip_preprocess(first)
    image_embeds = modules["image_encoder"].apply(frozen["image_encoder"], px)
    text_states = None
    if use_text and prompt_ids is not None:
        text_states = modules["text_encoder"].apply(frozen["text_encoder"], prompt_ids)
    return pcommon.build_encoder_hidden_states(image_embeds, text_states)


def _vae_encode_frames(modules, frozen, frames, scaling_factor):
    b, f = frames.shape[:2]
    flat = frames.reshape(b * f, *frames.shape[2:])
    lat = modules["vae"].apply(frozen["vae"], flat, method="encode_mode")
    return lat.reshape(b, f, *lat.shape[1:]) * scaling_factor


def make_vl_train_step(
    unet, modules: dict, tx, cfg: TrainConfig
) -> Callable:
    """Returns jitted ``step(state, frozen, batch, key) -> (state, metrics)``.

    ``batch``: dict(video_frames [B,F,H,W,3] in [-1,1], prompt_ids [B,77],
    motion_bucket_id [B]). ``frozen``: params of vae/image_encoder/text_encoder.
    """
    scaling = modules["vae"].config.scaling_factor

    def loss_fn(params, frozen, batch, key):
        frames = batch["video_frames"].astype(jnp.float32)
        b, f = frames.shape[:2]
        k_sig, k_eps, k_aug, k_drop = jax.random.split(key, 4)

        latents = _vae_encode_frames(modules, frozen, frames, scaling)

        first = frames[:, 0]
        first = first + jax.random.normal(k_aug, first.shape) * cfg.train_noise_aug_strength
        cond_lat = modules["vae"].apply(frozen["vae"], first, method="encode_mode")
        cond_lat = jnp.repeat(cond_lat[:, None], f, axis=1)

        sigmas = edm.sample_sigmas(k_sig, b, cfg.noise_mean, cfg.noise_std)
        noise = jax.random.normal(k_eps, latents.shape)
        noisy, inp, timesteps = edm.edm_precondition(latents, noise, sigmas)

        states = _encode_conditioning_train(
            modules, frozen, frames, batch.get("prompt_ids"), cfg.use_text
        )
        if cfg.conditioning_dropout_prob:
            states, cond_lat = edm.conditioning_dropout(
                k_drop, states, cond_lat, cfg.conditioning_dropout_prob
            )

        inp = jnp.concatenate([inp, cond_lat], axis=-1)

        add_ids = make_add_time_ids(cfg, batch["motion_bucket_id"])

        # every batch row is an independent clip (no CFG fold in training):
        # per-sample temporal-context mapping (the reference trains at
        # per-GPU batch 1 so its hw-major quirk never mixes samples there)
        pred = unet.apply(params, inp, timesteps, states, add_ids,
                          context_clips=inp.shape[0])
        loss = edm.edm_loss(pred, noisy, latents, sigmas)
        return loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, frozen, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, frozen, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return step


def make_vgl_train_step(
    unet, controlnet, modules: dict, tx, cfg: TrainConfig
) -> Callable:
    """VGL: ControlNet trainable, UNet frozen (train_csvd.py:829-898).

    ``batch`` additionally carries ``condition`` [B,F,H,W,3] in [0,1]
    (gesture raster). ``frozen`` additionally carries ``unet`` params.
    """
    scaling = modules["vae"].config.scaling_factor

    def loss_fn(cn_params, frozen, batch, key):
        frames = batch["video_frames"].astype(jnp.float32)
        b, f = frames.shape[:2]
        k_sig, k_eps, k_aug, k_drop = jax.random.split(key, 4)

        latents = _vae_encode_frames(modules, frozen, frames, scaling)

        first = frames[:, 0]
        first = first + jax.random.normal(k_aug, first.shape) * cfg.train_noise_aug_strength
        cond_lat = modules["vae"].apply(frozen["vae"], first, method="encode_mode")
        cond_lat = jnp.repeat(cond_lat[:, None], f, axis=1)

        sigmas = edm.sample_sigmas(k_sig, b, cfg.noise_mean, cfg.noise_std)
        noise = jax.random.normal(k_eps, latents.shape)
        noisy, inp, timesteps = edm.edm_precondition(latents, noise, sigmas)

        states = _encode_conditioning_train(
            modules, frozen, frames, batch.get("prompt_ids"), cfg.use_text
        )
        if cfg.conditioning_dropout_prob:
            states, cond_lat = edm.conditioning_dropout(
                k_drop, states, cond_lat, cfg.conditioning_dropout_prob
            )

        # sparse-conditioning VAE-latent masking (train_csvd.py:834-886):
        # per-(frame, pixel) keep mask, channel-synchronised; when both flags
        # are on the UNet reuses the ControlNet's masked latents (reference
        # behaviour).
        cn_cond_lat = unet_cond_lat = cond_lat
        if cfg.mask_controlnet_vae or cfg.mask_unet_vae:
            k_mask = jax.random.fold_in(key, 17)
            keep = (
                jax.random.uniform(k_mask, (b, f) + cond_lat.shape[2:4] + (1,))
                < (1.0 - cfg.mask_proportion)
            ).astype(cond_lat.dtype)
            masked = cond_lat * keep
            if cfg.mask_controlnet_vae:
                cn_cond_lat = masked
            if cfg.mask_unet_vae:
                unet_cond_lat = masked

        cn_inp = jnp.concatenate([inp, cn_cond_lat], axis=-1)
        inp = jnp.concatenate([inp, unet_cond_lat], axis=-1)

        # gesture condition -> VAE latents (train_csvd.py:852-853; in [0,1])
        cond_img = batch["condition"].astype(jnp.float32)
        cflat = cond_img.reshape(b * f, *cond_img.shape[2:])
        gesture_lat = modules["vae"].apply(frozen["vae"], cflat, method="encode_mode")
        gesture_lat = gesture_lat.reshape(b, f, *gesture_lat.shape[1:])

        add_ids = make_add_time_ids(cfg, batch["motion_bucket_id"])

        res, mid = controlnet.apply(
            cn_params, cn_inp, timesteps, states, add_ids, gesture_lat,
            context_clips=b,
        )
        pred = unet.apply(
            frozen["unet"], inp, timesteps, states, add_ids,
            down_block_additional_residuals=res,
            mid_block_additional_residual=mid,
            context_clips=b,
        )
        return edm.edm_loss(pred, noisy, latents, sigmas)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, frozen, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, frozen, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step
