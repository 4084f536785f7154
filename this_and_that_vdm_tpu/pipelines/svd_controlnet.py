"""VGL inference pipeline: image + text + gesture raster -> video.

Replicates reference svd/pipeline_stable_video_diffusion_controlnet.py:
371-736 with one deliberate change: the per-step VAE encode of the (constant)
gesture condition inside the hot loop (:652) is hoisted out — semantically
identical, and it removes 25 redundant VAE encoder passes per clip.

Supports the reference's knobs: ``controlnet_conditioning_scale``,
``control_guidance_start/end`` step gating (:610-617), ``guess_mode`` with
logspace scales + zero-padded uncond residuals (:676-681), and the optional
``use_instructpix2pix`` 3-way CFG (:697-702).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.controlnet import ControlNetModel
from ..schedulers import make_svd_schedule
from . import common
from .svd import StableVideoDiffusionPipeline


@dataclasses.dataclass(eq=False)
class StableVideoDiffusionControlNetPipeline(StableVideoDiffusionPipeline):
    controlnet: ControlNetModel = None
    controlnet_params: Any = None

    @functools.cached_property
    def _encode_condition_img(self):
        @jax.jit
        def fn(vae_params, condition_img):
            """[F, H, W, 3] in [0,1] -> VAE latents [F, h, w, 4].

            The reference feeds the raster through the VAE in [0,1] range
            (prepare_condition_image :350-367 does no rescaling) — replicated.
            """
            return self.vae.apply(vae_params, condition_img, method="encode_mode")

        return fn

    def _denoise_cn_fn(self, num_steps: int, num_frames: int, ip2p: bool,
                       guess_mode: bool, ctrl_start: float, ctrl_end: float):
        key = ("denoise_cn", num_steps, num_frames, ip2p, guess_mode,
               ctrl_start, ctrl_end, self._bake_key())
        return self._cached_fn(
            key,
            lambda: self._build_denoise_cn_fn(
                num_steps, num_frames, ip2p, guess_mode, ctrl_start, ctrl_end
            ),
        )

    def _build_denoise_cn_fn(self, num_steps: int, num_frames: int, ip2p: bool,
                             guess_mode: bool, ctrl_start: float, ctrl_end: float):
        sched = make_svd_schedule(num_steps)
        sigmas = jnp.asarray(sched.sigmas)
        timesteps = jnp.asarray(sched.timesteps)
        mult = 3 if ip2p else 2

        # controlnet_keep gating per step (reference :610-617)
        keep = np.array(
            [
                1.0 - float(i / num_steps < ctrl_start or (i + 1) / num_steps > ctrl_end)
                for i in range(num_steps)
            ],
            np.float32,
        )
        keep = jnp.asarray(keep)
        baked = (self.unet_params, self.controlnet_params) if self.bake_params else None

        @jax.jit
        def fn(unet_params, cn_params, noise, states_cfg, image_latents_cfg,
               cond_latents, add_ids_cfg, guidance, cond_scale, image_guidance_scale):
            if baked is not None:
                unet_params, cn_params = baked
            img_lat = jnp.repeat(image_latents_cfg[:, None], num_frames, axis=1)
            b = noise.shape[0]
            # condition latents: [F, h, w, 4] shared across the clip batch
            # (reference API) or [B, F, h, w, 4] per-request (serving);
            # guess_mode runs controlnet on the cond half only, otherwise
            # duplicated across the CFG batch
            cn_batch = 1 if (guess_mode and mult > 1) else mult
            if cond_latents.ndim == 4:
                cn_cond = jnp.tile(cond_latents[None], (b * cn_batch, 1, 1, 1, 1))
            else:
                # CFG layout is branch-major blocks of B ([uncond(B); cond(B)])
                cn_cond = jnp.tile(cond_latents, (cn_batch, 1, 1, 1, 1))
            cn_cond = self._constrain_cfg(cn_cond, cfg_fold=cn_batch)

            def body(latents, i):
                inp = jnp.concatenate([latents] * mult, axis=0)
                inp = inp / jnp.sqrt(sigmas[i] ** 2 + 1.0)
                inp = jnp.concatenate([inp, img_lat], axis=-1)
                inp = self._constrain_cfg(inp, cfg_fold=mult)

                scale = cond_scale * keep[i]
                if guess_mode and mult > 1:
                    # conditional half only (reference AttnGuess path :664-681)
                    cn_inp = inp[b * (mult - 1):] if not ip2p else inp[:b]
                    cn_states = states_cfg[b * (mult - 1):] if not ip2p else states_cfg[:b]
                    cn_ids = add_ids_cfg[b * (mult - 1):] if not ip2p else add_ids_cfg[:b]
                    res, mid = self.controlnet.apply(
                        cn_params, cn_inp, timesteps[i], cn_states,
                        cn_ids, cn_cond, conditioning_scale=scale, guess_mode=True,
                        context_clips=b,
                    )
                    def pad_uncond(r):
                        # residuals go on the branch the ControlNet ran on:
                        # cond is LAST in the standard [uncond; cond] layout
                        # but FIRST in the ip2p [cond; uncond_t; uncond_i]
                        # layout (pipelines/common.cfg_concat).
                        zeros = [jnp.zeros_like(r)] * (mult - 1)
                        return jnp.concatenate(
                            [r] + zeros if ip2p else zeros + [r], axis=0
                        )

                    res = tuple(pad_uncond(r) for r in res)
                    mid = pad_uncond(mid)
                else:
                    res, mid = self.controlnet.apply(
                        cn_params, inp, timesteps[i], states_cfg,
                        add_ids_cfg, cn_cond, conditioning_scale=scale,
                        guess_mode=guess_mode, context_clips=b,
                    )

                pred = self.unet.apply(
                    unet_params, inp, timesteps[i], states_cfg, add_ids_cfg,
                    down_block_additional_residuals=res,
                    mid_block_additional_residual=mid,
                    context_clips=b,  # per-clip exact temporal-context map
                )
                if ip2p:
                    p_first, p_cond, p_uncond = jnp.split(pred, 3, axis=0)
                    pred = (
                        p_uncond
                        + guidance * (p_cond - p_uncond)
                        + image_guidance_scale * (p_cond - p_first)
                    )
                else:
                    p_uncond, p_cond = jnp.split(pred, 2, axis=0)
                    pred = p_uncond + guidance * (p_cond - p_uncond)
                return sched.step(pred, i, latents), None

            latents0 = noise * sched.init_noise_sigma
            latents, _ = jax.lax.scan(body, latents0, jnp.arange(num_steps))
            return latents

        return fn

    def __call__(
        self,
        image: np.ndarray,  # [B, H, W, 3] in [-1, 1]
        condition_img: np.ndarray,  # [F, H, W, 3] in [0, 1] (gesture raster)
        prompt_ids: Optional[np.ndarray] = None,
        num_frames: int = 14,
        num_inference_steps: int = 25,
        min_guidance_scale: float = 1.0,
        max_guidance_scale: float = 3.0,
        fps: int = 7,
        motion_bucket_id: int = 127,
        noise_aug_strength: float = 0.02,
        decode_chunk_size: Optional[int] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        image_noise: Optional[np.ndarray] = None,  # [B, H, W, 3] std-normal
        controlnet_conditioning_scale: float = 1.0,
        control_guidance_start: float = 0.0,
        control_guidance_end: float = 1.0,
        guess_mode: bool = False,
        use_instructpix2pix: bool = False,
        image_guidance_scale: float = 7.5,
        output_type: str = "np",
    ):
        b, h, w = image.shape[0], image.shape[1], image.shape[2]
        decode_chunk_size = decode_chunk_size or num_frames
        key = key if key is not None else jax.random.PRNGKey(0)
        k_img, k_lat = jax.random.split(key)

        image = jnp.asarray(image, jnp.float32)
        noise_img = noise_aug_strength * (
            jax.random.normal(k_img, image.shape, image.dtype)
            if image_noise is None else jnp.asarray(image_noise, image.dtype))
        ids = None if prompt_ids is None else jnp.asarray(prompt_ids)

        mode = "ip2p" if use_instructpix2pix else "standard"
        states_cfg, img_lat_cfg = self._encode_conditioning_cfg(
            self._cond_params(), image, ids, noise_img, mode
        )

        cond = jnp.asarray(condition_img, jnp.float32)
        if cond.ndim == 5:
            # per-request gestures [B, F, H, W, 3] (serving batches clips
            # with different conditions); the reference API is the shared
            # [F, H, W, 3] single-request form below
            cl = self._encode_condition_img(
                self.vae_params, cond.reshape((-1,) + cond.shape[2:]))
            cond_latents = cl.reshape(cond.shape[:2] + cl.shape[1:])
        else:
            cond_latents = self._encode_condition_img(self.vae_params, cond)

        mult = 3 if use_instructpix2pix else 2
        add_ids = common.get_add_time_ids(
            fps - 1, motion_bucket_id, noise_aug_strength, b, cfg_mult=mult
        )
        guidance = common.guidance_linspace(
            min_guidance_scale, max_guidance_scale, num_frames, b
        )

        if latents is None:
            latents = jax.random.normal(
                k_lat, (b, num_frames, h // 8, w // 8, 4), jnp.float32
            )
        latents = self._denoise_cn_fn(
            num_inference_steps, num_frames, use_instructpix2pix, guess_mode,
            float(control_guidance_start), float(control_guidance_end),
        )(
            None if self.bake_params else self.unet_params,
            None if self.bake_params else self.controlnet_params,
            latents, states_cfg, img_lat_cfg, cond_latents, add_ids, guidance,
            float(controlnet_conditioning_scale), float(image_guidance_scale),
        )

        if output_type == "latent":
            return np.asarray(latents)
        frames = self._decode_fn(decode_chunk_size)(self.vae_params, latents)
        if output_type == "uint8":
            return np.asarray(common.postprocess_frames_uint8(frames))
        frames01 = common.postprocess_frames(frames)
        return frames01

    @functools.cached_property
    def _encode_conditioning_cfg(self):
        @functools.partial(jax.jit, static_argnums=(4,))
        def fn(params, image_m11, input_ids, noise_img, mode):
            px = common.clip_preprocess(image_m11)
            image_embeds = self.image_encoder.apply(params["image_encoder"], px)
            text_states = None
            if self.text_encoder is not None and input_ids is not None:
                text_states = self.text_encoder.apply(params["text_encoder"], input_ids)
            states = common.build_encoder_hidden_states(image_embeds, text_states)
            noised = image_m11 + noise_img
            lat = self.vae.apply(params["vae"], noised, method="encode_mode")
            if mode == "ip2p":
                return common.cfg_concat(states, "ip2p_states"), common.cfg_concat(lat, "ip2p_image")
            return common.cfg_concat(states), common.cfg_concat(lat)

        return fn
