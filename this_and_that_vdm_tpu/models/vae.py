"""AutoencoderKLTemporalDecoder — SVD's VAE (2D encoder, temporal decoder).

Replicates diffusers' model as consumed by the reference (loaded at
test_code/inference.py:328-330; encode at train_code/train_svd.py:204-211 via
``latent_dist.mode()``; chunked temporal decode at
svd/pipeline_stable_video_diffusion.py:232-258), and the decoder blocks
mirrored in the reference tree (svd/diffusion_arch/unet_3d_blocks.py:
MidBlockTemporalDecoder:1757, UpBlockTemporalDecoder:1820).

Architecture (SVD config): encoder block_out_channels (128,256,512,512),
layers_per_block 2, latent_channels 4, scaling_factor 0.18215; decoder is the
temporal variant: SpatioTemporalResBlocks with ``merge_strategy='learned'`` +
``switch_spatial_to_temporal_mix`` and no temb, a single-head 512-dim
attention mid block, and a final (3,1,1) temporal conv over RGB.

Layout: encoder takes ``[N, H, W, 3]`` frames; decoder takes
``[B, F, h, w, 4]`` latents and returns ``[B, F, H, W, 3]``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .layers import GroupNorm
from .resnet import Conv2d, SpatioTemporalResBlock, TemporalConv3, Upsample2D

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = 0.18215

    @staticmethod
    def tiny():
        return VAEConfig(block_out_channels=(32, 32, 64, 64), scaling_factor=0.18215)


class ResnetBlock2DNoTemb(nn.Module):
    """VAE resblock: GN(eps 1e-6) -> SiLU -> conv, twice, + shortcut."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        h = GroupNorm(32, 1e-6, with_silu=True, name="norm1")(x)
        h = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(32, 1e-6, with_silu=True, name="norm2")(h)
        h = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)
        if cin != self.out_channels:
            x = Conv2d(self.out_channels, 1, dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head 512-dim attention with GroupNorm + residual (VAE style)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        residual = x
        t = GroupNorm(32, 1e-6, name="group_norm")(x).reshape(n, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(t)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(t)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(t)
        o = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return o.reshape(n, h, w, c) + residual


class EncoderDownsample(nn.Module):
    """Encoder downsample: pad (0,1) right/bottom then stride-2 VALID conv
    (torch ``Downsample2D(padding=0)`` semantics); checkpoint key ``.conv``."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(2, 2),
            padding="VALID",
            dtype=self.dtype,
            name="conv",
        )(x)


class DownEncoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = ResnetBlock2DNoTemb(self.out_channels, dtype=self.dtype, name=f"resnets_{j}")(x)
        if self.add_downsample:
            x = EncoderDownsample(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
        return x


class EncoderMidBlock2D(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        x = ResnetBlock2DNoTemb(c, dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(dtype=self.dtype, name="attentions_0")(x)
        return ResnetBlock2DNoTemb(c, dtype=self.dtype, name="resnets_1")(x)


class Encoder(nn.Module):
    """Plain 2D KL encoder (per-frame)."""

    config: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = Conv2d(cfg.block_out_channels[0], 3, dtype=self.dtype, name="conv_in")(x)
        for i, c in enumerate(cfg.block_out_channels):
            h = DownEncoderBlock2D(
                c,
                num_layers=cfg.layers_per_block,
                add_downsample=i != len(cfg.block_out_channels) - 1,
                dtype=self.dtype,
                name=f"down_blocks_{i}",
            )(h)
        h = EncoderMidBlock2D(dtype=self.dtype, name="mid_block")(h)
        h = GroupNorm(32, 1e-6, with_silu=True, name="conv_norm_out")(h)
        return Conv2d(2 * cfg.latent_channels, 3, dtype=self.dtype, name="conv_out")(h)


def _st_block(cout: int, dtype, name: str) -> SpatioTemporalResBlock:
    return SpatioTemporalResBlock(
        cout,
        eps=1e-6,
        temporal_eps=1e-5,
        merge_strategy="learned",
        switch_spatial_to_temporal_mix=True,
        dtype=dtype,
        name=name,
    )


class DecoderMidBlockTemporal(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        b, f = h.shape[:2]
        c = h.shape[-1]
        h = _st_block(c, self.dtype, "resnets_0")(h)
        flat = h.reshape(b * f, *h.shape[2:])
        flat = VAEAttention(dtype=self.dtype, name="attentions_0")(flat)
        h = flat.reshape(b, f, *flat.shape[1:])
        return _st_block(c, self.dtype, "resnets_1")(h)


class UpBlockTemporalDecoder(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        b, f = h.shape[:2]
        for j in range(self.num_layers):
            h = _st_block(self.out_channels, self.dtype, f"resnets_{j}")(h)
        if self.add_upsample:
            flat = h.reshape(b * f, *h.shape[2:])
            flat = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(flat)
            h = flat.reshape(b, f, *flat.shape[1:])
        return h


class TemporalDecoder(nn.Module):
    """Temporal decoder: frames-aware resblocks + final (3,1,1) RGB conv."""

    config: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        # z: [B, F, h, w, 4]
        cfg = self.config
        b, f = z.shape[:2]
        c_top = cfg.block_out_channels[-1]

        h = Conv2d(c_top, 3, dtype=self.dtype, name="conv_in")(
            z.reshape(b * f, *z.shape[2:])
        ).reshape(b, f, *z.shape[2:4], c_top)

        h = DecoderMidBlockTemporal(dtype=self.dtype, name="mid_block")(h)

        rev = list(reversed(cfg.block_out_channels))
        for i, c in enumerate(rev):
            h = UpBlockTemporalDecoder(
                c,
                num_layers=cfg.layers_per_block + 1,
                add_upsample=i != len(rev) - 1,
                dtype=self.dtype,
                name=f"up_blocks_{i}",
            )(h)

        flat = h.reshape(b * f, *h.shape[2:])
        flat = GroupNorm(32, 1e-6, with_silu=True, name="conv_norm_out")(flat)
        flat = Conv2d(3, 3, dtype=self.dtype, name="conv_out")(flat)
        h = flat.reshape(b, f, *flat.shape[1:])
        return TemporalConv3(3, dtype=self.dtype, name="time_conv_out")(h)


class AutoencoderKLTemporalDecoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = TemporalDecoder(self.config, dtype=self.dtype)
        self.quant_conv = Conv2d(2 * self.config.latent_channels, 1, dtype=self.dtype)

    def encode_mode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Deterministic posterior mean (reference uses ``latent_dist.mode()``
        everywhere). ``x``: [N, H, W, 3] in [-1, 1] -> [N, H/8, W/8, 4]."""
        moments = self.quant_conv(self.encoder(x))
        mean, _logvar = jnp.split(moments, 2, axis=-1)
        return mean

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """``z``: [B, F, h, w, 4] (already / scaling_factor) -> [B, F, H, W, 3]."""
        return self.decoder(z)

    def __call__(self, x, z):  # for .init only
        return self.encode_mode(x), self.decode(z)
