"""UNetSpatioTemporalConditionModel — the SVD denoiser, TPU-native.

Replicates reference svd/unet_spatio_temporal_condition.py:75-536: config
``in_channels=8`` (4 noisy + 4 first-frame latents), ``out_channels=4``,
``block_out_channels=(320,640,1280,1280)``, heads ``(5,10,10,20)``,
``cross_attention_dim=1024``, 3x CrossAttnDownBlockSpatioTemporal +
DownBlockSpatioTemporal and mirrored up blocks, sinusoid->MLP timestep
embedding plus (fps, motion_bucket_id, noise_aug) micro-conditioning summed
into the per-frame embedding (:426-432), ControlNet residual injection points
(:481-491, :501-502).

I/O layout: ``sample [B, F, H, W, C]`` channels-last (the reference uses
``[B, F, C, H, W]``; pipelines convert at the boundary).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import GroupNorm, TimestepEmbedding, sinusoidal_embedding
from .resnet import Conv2d
from .unet_blocks import (
    CrossAttnDownBlockSpatioTemporal,
    CrossAttnUpBlockSpatioTemporal,
    DownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal,
    UpBlockSpatioTemporal,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    transformer_layers_per_block: int = 1
    num_attention_heads: Tuple[int, ...] = (5, 10, 10, 20)
    num_frames: int = 25
    remat: bool = False  # per-block activation checkpointing (training)

    @staticmethod
    def tiny():
        """Small config for tests: same topology, few channels."""
        return UNetConfig(
            block_out_channels=(32, 64, 64, 64),
            num_attention_heads=(2, 2, 2, 4),
            cross_attention_dim=48,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=24,
        )

    @staticmethod
    def mid():
        """Mid-size config for the multi-chip dryrun (VERDICT r3 item 4):
        the REAL 4-level topology, REAL head counts (5,10,10,20)
        (svd/unet_spatio_temporal_condition.py:75-101), 2 layers per block
        and real 32-group norms (every width divisible by 32), at half the
        production width so the sharded train program exercises the true
        layout/partitioning structure (per-head attention splits, fsdp
        weight shardings, Mosaic kernel partitioning) on a virtual CPU mesh
        in minutes.  Only widths are reduced: (160,320,640,640) vs
        (320,640,1280,1280), cross-attention 256 vs 1024."""
        return UNetConfig(
            block_out_channels=(160, 320, 640, 640),
            num_attention_heads=(5, 10, 10, 20),
            cross_attention_dim=256,
            remat=True,
        )

    @staticmethod
    def small():
        """Between tiny and mid, for the fast tier of the multi-chip dryrun
        (VERDICT r4 item 1): the REAL 4-level topology with real 32-group
        norms (every width divisible by 32) at quarter-ish width
        (64,128,256,256) so one sharded train step executes in seconds on a
        time-sliced virtual CPU mesh.  Head counts are uniform-dim (2,4,8,8)
        — the real (5,10,10,20) heads are exercised by the dryrun's MID VL
        leg and by ``UNetConfig.mid()`` tests."""
        return UNetConfig(
            block_out_channels=(64, 128, 256, 256),
            num_attention_heads=(2, 4, 8, 8),
            cross_attention_dim=128,
            addition_time_embed_dim=32,
            projection_class_embeddings_input_dim=96,
            remat=True,
        )

    @staticmethod
    def nano():
        """Minimal 2-block topology for sharded-path tests, where compile/
        trace wall-clock on the virtual CPU mesh dominates: one cross-attn
        down block + one plain block (and the mirrored ups) still exercise
        every layer type, skip concat, and ControlNet residual site."""
        return UNetConfig(
            down_block_types=(
                "CrossAttnDownBlockSpatioTemporal",
                "DownBlockSpatioTemporal",
            ),
            up_block_types=(
                "UpBlockSpatioTemporal",
                "CrossAttnUpBlockSpatioTemporal",
            ),
            block_out_channels=(32, 32),
            num_attention_heads=(2, 2),
            cross_attention_dim=48,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=24,
        )


class UNetSpatioTemporalConditionModel(nn.Module):
    config: UNetConfig = UNetConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, F, H, W, C_in]
        timestep: jnp.ndarray,  # scalar or [B]
        encoder_hidden_states: jnp.ndarray,  # [B, S, D]
        added_time_ids: jnp.ndarray,  # [B, 3]
        down_block_additional_residuals: Optional[Sequence[jnp.ndarray]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        context_clips: int = 1,  # independent clips in the batch; 1 = whole
        # batch one group (reference CFG-pair quirk, see transformer.py)
    ) -> jnp.ndarray:
        cfg = self.config
        b, f = sample.shape[:2]
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4

        # per-block remat mirrors the reference's torch.utils.checkpoint on
        # every down/mid/up block (unet_3d_blocks.py:2142-2167 etc.)
        if cfg.remat:
            _Down = nn.remat(DownBlockSpatioTemporal)
            _CrossDown = nn.remat(CrossAttnDownBlockSpatioTemporal)
            _Mid = nn.remat(UNetMidBlockSpatioTemporal)
            _Up = nn.remat(UpBlockSpatioTemporal)
            _CrossUp = nn.remat(CrossAttnUpBlockSpatioTemporal, static_argnums=())
        else:
            _Down, _CrossDown = DownBlockSpatioTemporal, CrossAttnDownBlockSpatioTemporal
            _Mid, _Up, _CrossUp = (
                UNetMidBlockSpatioTemporal,
                UpBlockSpatioTemporal,
                CrossAttnUpBlockSpatioTemporal,
            )

        timesteps = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (b,))
        t_emb = sinusoidal_embedding(timesteps, ch0).astype(self.dtype)
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)

        time_embeds = sinusoidal_embedding(
            added_time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(b, -1).astype(self.dtype)
        emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="add_embedding")(
            time_embeds
        )

        # per-frame conditioning tensors (b-major frame repeat)
        temb = jnp.broadcast_to(emb[:, None, :], (b, f, emb.shape[-1]))
        context = jnp.repeat(encoder_hidden_states.astype(self.dtype), f, axis=0)
        image_only_indicator = jnp.zeros((b, f), self.dtype)

        x = sample.astype(self.dtype)
        x = Conv2d(ch0, 3, dtype=self.dtype, name="conv_in")(
            x.reshape(b * f, *x.shape[2:])
        ).reshape(b, f, *sample.shape[2:4], ch0)

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

        if down_block_additional_residuals is not None:
            if len(down_block_additional_residuals) != len(down_res):
                raise ValueError(
                    f"ControlNet produced {len(down_block_additional_residuals)} "
                    f"residuals but the UNet has {len(down_res)} skip states — "
                    f"mismatched UNet/ControlNet configs (zip would silently "
                    f"drop skip connections)")
            down_res = tuple(
                r + add for r, add in zip(down_res, down_block_additional_residuals)
            )

        x = _Mid(
            heads=cfg.num_attention_heads[-1],
            transformer_layers=cfg.transformer_layers_per_block,
            cross_attention_dim=cfg.cross_attention_dim,
            context_clips=context_clips,
            dtype=self.dtype,
            name="mid_block",
        )(x, temb, context, image_only_indicator)

        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual

        rev_ch = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(cfg.num_attention_heads))
        n_res = cfg.layers_per_block + 1
        for i, block_type in enumerate(cfg.up_block_types):
            is_final = i == len(cfg.block_out_channels) - 1
            res_states = down_res[-n_res:]
            down_res = down_res[:-n_res]
            if block_type == "CrossAttnUpBlockSpatioTemporal":
                x = _CrossUp(
                    rev_ch[i],
                    heads=rev_heads[i],
                    num_layers=n_res,
                    transformer_layers=cfg.transformer_layers_per_block,
                    cross_attention_dim=cfg.cross_attention_dim,
                    context_clips=context_clips,
                    add_upsample=not is_final,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(x, res_states, temb, context, image_only_indicator)
            else:
                x = _Up(
                    rev_ch[i],
                    num_layers=n_res,
                    add_upsample=not is_final,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(x, res_states, temb, image_only_indicator)

        flat = x.reshape(b * f, *x.shape[2:])
        flat = GroupNorm(32, 1e-5, with_silu=True, name="conv_norm_out")(flat)
        flat = Conv2d(cfg.out_channels, 3, dtype=self.dtype, name="conv_out")(flat)
        return flat.reshape(b, f, *flat.shape[1:])
