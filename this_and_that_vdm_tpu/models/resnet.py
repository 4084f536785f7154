"""Spatio-temporal residual blocks (channels-last, frames-explicit).

Canonical block tensor layout: ``[B, F, H, W, C]``; spatial convolutions fold
frames into batch, temporal convolutions are expressed as three shifted
pointwise matmuls (the kernel is (3,1,1)) so everything lands on the MXU —
no 3-D convolution, no Python loops over frames.

Numerics replicate diffusers' ``ResnetBlock2D`` / ``TemporalResnetBlock`` /
``SpatioTemporalResBlock`` / ``Downsample2D`` / ``Upsample2D`` as used by the
reference blocks (reference: svd/diffusion_arch/unet_3d_blocks.py:20-31
imports; block wiring at :1870-2396).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import GroupNorm

Dtype = Any


def Conv2d(
    features: int,
    kernel_size: int = 3,
    stride: int = 1,
    dtype: Dtype = jnp.float32,
    name: str = None,
    zero_init: bool = False,
) -> nn.Conv:
    """3x3/1x1 conv on ``[N, H, W, C]`` with torch-style padding.

    Plain ``nn.Conv`` so the param path is ``<name>/kernel`` — a 1:1 mirror
    of the HF checkpoint layout (weights/convert.py relies on this).
    """
    pad = (kernel_size - 1) // 2
    init = {}
    if zero_init:
        init = dict(kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dtype=dtype,
        name=name,
        **init,
    )


class TemporalConv3(nn.Module):
    """(3,1,1) temporal conv on ``[B, F, H, W, C]`` as 3 shifted matmuls."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (3, c_in, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        f = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = (
            jnp.einsum("bfhwc,cd->bfhwd", xp[:, 0:f], kernel[0])
            + jnp.einsum("bfhwc,cd->bfhwd", xp[:, 1 : f + 1], kernel[1])
            + jnp.einsum("bfhwc,cd->bfhwd", xp[:, 2 : f + 2], kernel[2])
        )
        return out + bias.astype(self.dtype)


class ResnetBlock2D(nn.Module):
    """GN -> SiLU -> conv -> (+temb) -> GN -> SiLU -> conv -> +shortcut."""

    out_channels: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        in_channels = x.shape[-1]
        h = GroupNorm(32, self.eps, with_silu=True, name="norm1")(x)
        h = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                jax.nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = GroupNorm(32, self.eps, with_silu=True, name="norm2")(h)
        h = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = Conv2d(self.out_channels, 1, dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    """Temporal twin of ResnetBlock2D with (3,1,1) convs over frames."""

    out_channels: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # x: [B, F, H, W, C]; GroupNorm stats span frames (rank-5 torch parity)
        in_channels = x.shape[-1]
        h = GroupNorm(32, self.eps, with_silu=True, name="norm1")(x)
        h = TemporalConv3(self.out_channels, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                jax.nn.silu(temb)
            )  # [B, F, C]
            h = h + t[:, :, None, None, :]
        h = GroupNorm(32, self.eps, with_silu=True, name="norm2")(h)
        h = TemporalConv3(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """Spatial resblock + temporal resblock merged by a learned AlphaBlender.

    Reference semantics: unet_3d_blocks.py blocks build this with
    ``merge_strategy='learned_with_images'`` (UNet) or
    ``'learned'`` + ``switch_spatial_to_temporal_mix`` (VAE temporal decoder).
    """

    out_channels: int
    eps: float = 1e-5
    temporal_eps: Optional[float] = None
    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: Optional[jnp.ndarray] = None,
        image_only_indicator: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        from .layers import AlphaBlender

        b, f, hh, ww, c = x.shape
        flat = x.reshape(b * f, hh, ww, c)
        temb_flat = None if temb is None else temb.reshape(b * f, -1)
        h = ResnetBlock2D(
            self.out_channels, eps=self.eps, dtype=self.dtype, name="spatial_res_block"
        )(flat, temb_flat)
        h = h.reshape(b, f, hh, ww, self.out_channels)

        h_t = TemporalResnetBlock(
            self.out_channels,
            eps=self.temporal_eps if self.temporal_eps is not None else self.eps,
            dtype=self.dtype,
            name="temporal_res_block",
        )(h, temb)

        return AlphaBlender(
            merge_strategy=self.merge_strategy,
            switch_spatial_to_temporal_mix=self.switch_spatial_to_temporal_mix,
            name="time_mixer",
        )(h, h_t, image_only_indicator)


class Downsample2D(nn.Module):
    """Strided 3x3 conv (torch asymmetric pad matches pad=1 on even sizes)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # diffusers-format checkpoints store this as downsamplers.N.conv.*
        return Conv2d(self.out_channels, 3, stride=2, dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv")(x)
