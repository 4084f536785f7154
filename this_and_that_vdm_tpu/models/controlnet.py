"""GestureNet — temporal ControlNet over the frozen SVD UNet encoder.

Replicates reference svd/temporal_controlnet.py:75-641: a trainable copy of
the UNet's down/mid path with

* ``conv_in_concat``: zero-initialised 12->320 conv consuming
  ``cat(noisy+cond latents [8], VAE(gesture raster) [4])`` (:200-206, concat
  at :576-580);
* zero-initialised 1x1 output convs: one for conv-in, one per resblock, one
  per downsampler, plus a mid zero conv (:252-297);
* heads ``(5,10,20,20)`` — index 2 differs from the UNet's ``(5,10,10,20)``
  (:168); the checkpoint dictates;
* output scaling: uniform ``conditioning_scale`` or ``guess_mode`` logspace
  0.1 -> 1.0 (:625-633).  ``inner_conditioning_scale`` is accepted but unused
  in the reference forward; we keep it for API parity.

``from_unet`` weight seeding lives in ``weights/convert.py``
(controlnet_params_from_unet) to keep the module pure.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import TimestepEmbedding, sinusoidal_embedding
from .resnet import Conv2d
from .unet_blocks import (
    CrossAttnDownBlockSpatioTemporal,
    DownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    in_channels: int = 8
    conditioning_channels: int = 3
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    transformer_layers_per_block: int = 1
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    remat: bool = False

    @staticmethod
    def tiny():
        return ControlNetConfig(
            block_out_channels=(32, 64, 64, 64),
            num_attention_heads=(2, 2, 4, 4),
            cross_attention_dim=48,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=24,
        )

    @staticmethod
    def mid():
        """Companion of UNetConfig.mid() for the multi-chip dryrun: the real
        4-level encoder topology and the GestureNet's REAL head counts
        (5,10,20,20) — note index 2 differs from the UNet's (5,10,10,20)
        (svd/temporal_controlnet.py:168) — at half width, real 32-group
        norms, zero convs and conv_in_concat all present."""
        return ControlNetConfig(
            block_out_channels=(160, 320, 640, 640),
            num_attention_heads=(5, 10, 20, 20),
            cross_attention_dim=256,
            remat=True,
        )

    @staticmethod
    def small():
        """Companion of UNetConfig.small() (fast-tier multi-chip dryrun):
        real 4-level encoder topology, 32-group norms, zero convs and
        conv_in_concat present, at (64,128,256,256) width."""
        return ControlNetConfig(
            block_out_channels=(64, 128, 256, 256),
            num_attention_heads=(2, 4, 8, 8),
            cross_attention_dim=128,
            addition_time_embed_dim=32,
            projection_class_embeddings_input_dim=96,
            remat=True,
        )

    @staticmethod
    def nano():
        """2-block companion of UNetConfig.nano() (sharded-path tests)."""
        return ControlNetConfig(
            down_block_types=(
                "CrossAttnDownBlockSpatioTemporal",
                "DownBlockSpatioTemporal",
            ),
            block_out_channels=(32, 32),
            num_attention_heads=(2, 2),
            cross_attention_dim=48,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=24,
        )


class ControlNetModel(nn.Module):
    config: ControlNetConfig = ControlNetConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, F, H, W, 8]
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,  # [B, S, D]
        added_time_ids: jnp.ndarray,  # [B, 3]
        controlnet_cond: jnp.ndarray,  # [B, F, H, W, 4] VAE-encoded gestures
        conditioning_scale: float = 1.0,
        guess_mode: bool = False,
        context_clips: int = 1,  # see models/transformer.py
        inner_conditioning_scale: float = 1.0,  # accepted-and-unused, like
        # the reference (temporal_controlnet.py:464 takes it but never uses
        # it in forward) — kept for API parity
    ):
        del inner_conditioning_scale
        cfg = self.config
        b, f = sample.shape[:2]
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4

        timesteps = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (b,))
        t_emb = sinusoidal_embedding(timesteps, ch0).astype(self.dtype)
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)
        time_embeds = sinusoidal_embedding(
            added_time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(b, -1).astype(self.dtype)
        emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="add_embedding")(
            time_embeds
        )

        temb = jnp.broadcast_to(emb[:, None, :], (b, f, emb.shape[-1]))
        context = jnp.repeat(encoder_hidden_states.astype(self.dtype), f, axis=0)
        image_only_indicator = jnp.zeros((b, f), self.dtype)

        x = jnp.concatenate(
            [sample.astype(self.dtype), controlnet_cond.astype(self.dtype)], axis=-1
        )
        x = Conv2d(ch0, 3, dtype=self.dtype, name="conv_in_concat", zero_init=True)(
            x.reshape(b * f, *x.shape[2:])
        ).reshape(b, f, *x.shape[2:4], ch0)

        if cfg.remat:
            _Down = nn.remat(DownBlockSpatioTemporal)
            _CrossDown = nn.remat(CrossAttnDownBlockSpatioTemporal)
            _Mid = nn.remat(UNetMidBlockSpatioTemporal)
        else:
            _Down, _CrossDown, _Mid = (
                DownBlockSpatioTemporal,
                CrossAttnDownBlockSpatioTemporal,
                UNetMidBlockSpatioTemporal,
            )

        down_res: Tuple[jnp.ndarray, ...] = (x,)
        for i, block_type in enumerate(cfg.down_block_types):
            is_final = i == len(cfg.block_out_channels) - 1
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                x, states = _CrossDown(
                    cfg.block_out_channels[i],
                    heads=cfg.num_attention_heads[i],
                    num_layers=cfg.layers_per_block,
                    transformer_layers=cfg.transformer_layers_per_block,
                    cross_attention_dim=cfg.cross_attention_dim,
                    context_clips=context_clips,
                    add_downsample=not is_final,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(x, temb, context, image_only_indicator)
            else:
                x, states = _Down(
                    cfg.block_out_channels[i],
                    num_layers=cfg.layers_per_block,
                    add_downsample=not is_final,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(x, temb, image_only_indicator)
            down_res += states

        x = _Mid(
            heads=cfg.num_attention_heads[-1],
            transformer_layers=cfg.transformer_layers_per_block,
            cross_attention_dim=cfg.cross_attention_dim,
            context_clips=context_clips,
            dtype=self.dtype,
            name="mid_block",
        )(x, temb, context, image_only_indicator)

        ctrl_res = []
        for i, r in enumerate(down_res):
            rb, rf = r.shape[:2]
            out = Conv2d(
                r.shape[-1],
                1,
                dtype=self.dtype,
                name=f"controlnet_down_blocks_{i}",
                zero_init=True,
            )(r.reshape(rb * rf, *r.shape[2:])).reshape(r.shape)
            ctrl_res.append(out)
        mid = Conv2d(
            x.shape[-1], 1, dtype=self.dtype, name="controlnet_mid_block", zero_init=True
        )(x.reshape(b * f, *x.shape[2:])).reshape(x.shape)

        if guess_mode:
            scales = np.logspace(-1, 0, len(ctrl_res) + 1)  # 0.1 .. 1.0
            ctrl_res = [r * float(s) * conditioning_scale for r, s in zip(ctrl_res, scales)]
            mid = mid * float(scales[-1]) * conditioning_scale
        else:
            ctrl_res = [r * conditioning_scale for r in ctrl_res]
            mid = mid * conditioning_scale

        return tuple(ctrl_res), mid
