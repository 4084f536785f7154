"""Down/mid/up blocks of the spatio-temporal UNet.

Replicates the five block types the SVD checkpoint actually uses (reference:
svd/diffusion_arch/unet_3d_blocks.py — DownBlockSpatioTemporal:1980,
CrossAttnDownBlockSpatioTemporal:2070, UpBlockSpatioTemporal:2192,
CrossAttnUpBlockSpatioTemporal:2281, UNetMidBlockSpatioTemporal:1870).  The
dead 3D/Motion/VAE-decoder block zoo is intentionally not ported (SURVEY.md
§2.1).  Epsilon quirks preserved from the reference: cross-attn down blocks
build resblocks with eps=1e-6 (:2098), plain down blocks and the mid block
with 1e-5 (:1999,:1895), and BOTH up-block types with 1e-6 — get_up_block
never forwards the UNet's resnet_eps=1e-5 into the SpatioTemporal branches
(:275-301), so the class defaults (:2201,:2291) apply (round-2 oracle
audit fix; previously both sides used 1e-5 here).

Block I/O layout: ``[B, F, H, W, C]``; ``temb``: ``[B, F, temb_dim]``;
``context``: ``[B*F, S, D]``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .resnet import Downsample2D, SpatioTemporalResBlock, Upsample2D
from .transformer import TransformerSpatioTemporalModel

Dtype = Any


def _flatten_bf(x):
    b, f = x.shape[:2]
    return x.reshape(b * f, *x.shape[2:])


def _unflatten_bf(x, b):
    return x.reshape(b, x.shape[0] // b, *x.shape[1:])


class DownBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, image_only_indicator):
        states = []
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-5, dtype=self.dtype, name=f"resnets_{i}"
            )(x, temb, image_only_indicator)
            states.append(x)
        if self.add_downsample:
            b = x.shape[0]
            x = _unflatten_bf(
                Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(
                    _flatten_bf(x)
                ),
                b,
            )
            states.append(x)
        return x, tuple(states)


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    out_channels: int
    heads: int
    num_layers: int = 2
    transformer_layers: int = 1
    cross_attention_dim: int = 1024
    context_clips: int = 1  # independent clips in the batch (see transformer.py)
    add_downsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, image_only_indicator):
        states = []
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-6, dtype=self.dtype, name=f"resnets_{i}"
            )(x, temb, image_only_indicator)
            x = TransformerSpatioTemporalModel(
                self.heads,
                self.out_channels // self.heads,
                num_layers=self.transformer_layers,
                cross_attention_dim=self.cross_attention_dim,
                context_clips=self.context_clips,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, context, image_only_indicator)
            states.append(x)
        if self.add_downsample:
            b = x.shape[0]
            x = _unflatten_bf(
                Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(
                    _flatten_bf(x)
                ),
                b,
            )
            states.append(x)
        return x, tuple(states)


class UNetMidBlockSpatioTemporal(nn.Module):
    heads: int
    transformer_layers: int = 1
    cross_attention_dim: int = 1024
    context_clips: int = 1  # independent clips in the batch (see transformer.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, image_only_indicator):
        c = x.shape[-1]
        x = SpatioTemporalResBlock(c, eps=1e-5, dtype=self.dtype, name="resnets_0")(
            x, temb, image_only_indicator
        )
        x = TransformerSpatioTemporalModel(
            self.heads,
            c // self.heads,
            num_layers=self.transformer_layers,
            cross_attention_dim=self.cross_attention_dim,
            context_clips=self.context_clips,
            dtype=self.dtype,
            name="attentions_0",
        )(x, context, image_only_indicator)
        x = SpatioTemporalResBlock(c, eps=1e-5, dtype=self.dtype, name="resnets_1")(
            x, temb, image_only_indicator
        )
        return x


class UpBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_states: Tuple[jnp.ndarray, ...], temb, image_only_indicator):
        for i in range(self.num_layers):
            res = res_states[-1]
            res_states = res_states[:-1]
            x = jnp.concatenate([x, res], axis=-1)
            # eps=1e-6: get_up_block drops resnet_eps for the SpatioTemporal
            # branches (unet_3d_blocks.py:275-301) -> class default applies
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-6, dtype=self.dtype, name=f"resnets_{i}"
            )(x, temb, image_only_indicator)
        if self.add_upsample:
            b = x.shape[0]
            x = _unflatten_bf(
                Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(
                    _flatten_bf(x)
                ),
                b,
            )
        return x


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    out_channels: int
    heads: int
    num_layers: int = 3
    transformer_layers: int = 1
    cross_attention_dim: int = 1024
    context_clips: int = 1  # independent clips in the batch (see transformer.py)
    add_upsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_states, temb, context, image_only_indicator):
        for i in range(self.num_layers):
            res = res_states[-1]
            res_states = res_states[:-1]
            x = jnp.concatenate([x, res], axis=-1)
            # eps=1e-6: get_up_block drops resnet_eps for the SpatioTemporal
            # branches (unet_3d_blocks.py:275-301) -> class default applies
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-6, dtype=self.dtype, name=f"resnets_{i}"
            )(x, temb, image_only_indicator)
            x = TransformerSpatioTemporalModel(
                self.heads,
                self.out_channels // self.heads,
                num_layers=self.transformer_layers,
                cross_attention_dim=self.cross_attention_dim,
                context_clips=self.context_clips,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, context, image_only_indicator)
        if self.add_upsample:
            b = x.shape[0]
            x = _unflatten_bf(
                Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(
                    _flatten_bf(x)
                ),
                b,
            )
        return x
