"""Shared pipeline stages: conditioning encode, VAE helpers, postprocess.

Numerics replicate reference svd/pipeline_stable_video_diffusion.py:
``encode_clip`` (:121-178), ``_encode_vae_image`` (:181-202),
``_get_add_time_ids`` (:204-230), ``decode_latents`` (:232-258) and the
image preprocessing around :459-479.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_with_antialiasing

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(image_m11: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] ``[B, H, W, 3]`` -> CLIP-normalised 224x224 ``[B, 224, 224, 3]``.

    Replicates: antialiased resize in [-1,1], back to [0,1], then CLIP
    mean/std (resize/crop/rescale disabled in the feature extractor).
    """
    chw = image_m11.transpose(0, 3, 1, 2)
    chw = resize_with_antialiasing(chw, (224, 224))
    chw = (chw + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, chw.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_STD, chw.dtype).reshape(1, 3, 1, 1)
    chw = (chw - mean) / std
    return chw.transpose(0, 2, 3, 1)


def joint_layer_norm(states: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """The reference's ad-hoc ``nn.LayerNorm((78, 1024))``: identity affine,
    statistics over the last TWO axes jointly (:163-164). Must be replicated
    exactly — it is part of the trained models' input contract."""
    x = states.astype(jnp.float32)
    mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.var(x, axis=(-2, -1), keepdims=True)
    return ((x - mean) * jax.lax.rsqrt(var + eps)).astype(states.dtype)


def build_encoder_hidden_states(
    image_embeds: jnp.ndarray,  # [B, D]
    text_states: Optional[jnp.ndarray],  # [B, 77, D] or None
) -> jnp.ndarray:
    """[text tokens; image token] then joint layer norm (when text is used)."""
    states = image_embeds[:, None, :]
    if text_states is not None:
        states = jnp.concatenate([text_states, states], axis=1)
        states = joint_layer_norm(states)
    return states


def cfg_concat(cond: jnp.ndarray, mode: str = "standard") -> jnp.ndarray:
    """Classifier-free-guidance batching.

    ``standard``: [negative(zeros); cond] (reference :168-174).
    ``instructpix2pix`` states order: [cond; zeros; zeros] (:182-183).
    """
    zeros = jnp.zeros_like(cond)
    if mode == "standard":
        return jnp.concatenate([zeros, cond], axis=0)
    if mode == "ip2p_states":
        return jnp.concatenate([cond, zeros, zeros], axis=0)
    if mode == "ip2p_image":  # [lat, lat, zeros] (:208-211)
        return jnp.concatenate([cond, cond, zeros], axis=0)
    raise ValueError(mode)


def get_add_time_ids(
    fps_minus_one: float,
    motion_bucket_id: float,
    noise_aug_strength: float,
    batch: int,
    cfg_mult: int,
) -> jnp.ndarray:
    ids = jnp.asarray([[fps_minus_one, motion_bucket_id, noise_aug_strength]], jnp.float32)
    ids = jnp.tile(ids, (batch, 1))
    return jnp.tile(ids, (cfg_mult, 1))


def guidance_linspace(
    min_scale: float, max_scale: float, num_frames: int, batch: int
) -> jnp.ndarray:
    g = jnp.linspace(min_scale, max_scale, num_frames, dtype=jnp.float32)
    return jnp.broadcast_to(g[None, :, None, None, None], (batch, num_frames, 1, 1, 1))


def decode_latents_chunked(vae_apply, latents: jnp.ndarray, scaling_factor: float,
                           decode_chunk_size: int) -> jnp.ndarray:
    """Chunked temporal-VAE decode (reference :232-258).

    ``latents``: [B, F, h, w, 4]. Chunk boundaries change the temporal conv
    receptive field, so chunking is part of the numerics contract — the frame
    axis is split into python-static chunks (at most two compiled shapes for
    F=14, chunk=8).
    """
    b, f = latents.shape[:2]
    z = latents / scaling_factor
    outs = []
    # Chunk the FRAME axis per clip (never across clips): the temporal convs
    # inside the decoder mix everything within a chunk, so a flat B*F chunking
    # (the reference's, which only ever sees B=1) would blend neighbouring
    # clips in a serving micro-batch AND change chunk boundaries vs a solo
    # run.  Decoding [B, chunk] as B videos of `chunk` frames keeps every
    # clip's receptive field identical to its B=1 decode.
    del b
    for i in range(0, f, decode_chunk_size):
        # [B, c, h, w, 4] -> B independent videos of c frames
        outs.append(vae_apply(z[:, i : i + decode_chunk_size]))
    return jnp.concatenate(outs, axis=1)  # [B, F, H, W, 3]


def postprocess_frames(frames_m11: jnp.ndarray) -> np.ndarray:
    """[-1,1] float -> [0,1] float32 numpy (np output mode of the reference)."""
    x = jnp.clip(frames_m11 / 2.0 + 0.5, 0.0, 1.0)
    return np.asarray(x, dtype=np.float32)


def frames_to_uint8(frames01: np.ndarray) -> np.ndarray:
    return np.clip(np.round(frames01 * 255.0), 0, 255).astype(np.uint8)


@jax.jit
def postprocess_frames_uint8(frames_m11: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float -> uint8 on-device (reference tensor2vid math,
    pipeline_stable_video_diffusion.py:48-60).  Casting before the
    device->host copy shrinks the transfer 4x — significant when the chip
    hangs off a network tunnel, and free on PCIe."""
    x = jnp.clip(frames_m11 / 2.0 + 0.5, 0.0, 1.0)
    return jnp.round(x * 255.0).astype(jnp.uint8)
