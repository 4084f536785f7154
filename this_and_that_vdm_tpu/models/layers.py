"""Shared flax primitives for the spatio-temporal diffusion stack.

All tensors are channels-last (NHWC / [..., C]) — the native TPU conv layout.
Normalisation statistics and attention softmax always run in float32
regardless of the compute dtype (bf16-safe); matmuls run in the module's
``dtype`` with fp32 accumulation via ``preferred_element_type`` handled by XLA.

Numerics replicate the diffusers building blocks the reference model is made
of (reference: svd/diffusion_arch/transformer_temporal.py imports
BasicTransformerBlock / TemporalBasicTransformerBlock / AlphaBlender at
:19-24; svd/unet_spatio_temporal_condition.py imports TimestepEmbedding /
Timesteps at :11).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention

Dtype = Any


def sinusoidal_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Transformer sinusoidal timestep embedding, float32 ``[B, dim]``.

    Matches diffusers ``Timesteps(dim, flip_sin_to_cos=True,
    downscale_freq_shift=0)`` used for UNet time / micro-conditioning /
    frame-position embeddings (reference: unet_spatio_temporal_condition.py
    :143,:148; transformer_temporal.py:266).
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear -> SiLU -> linear MLP over a sinusoid (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(x)
        x = jax.nn.silu(x)
        x = nn.Dense(self.out_dim or self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


def _group_norm(x: jnp.ndarray, scale, bias, num_groups: int, eps: float) -> jnp.ndarray:
    """GroupNorm over channels-last input; stats over every non-batch axis.

    Semantics of torch ``nn.GroupNorm`` on the channel-first mirror of ``x``:
    for rank-5 temporal tensors the frame axis participates in the statistics.

    TPU layout note: reshaping the lane (channel) axis into (groups, c/g) to
    reduce would split lanes and force expensive relayouts on every call
    (profiled at ~half the UNet runtime).  Instead: reduce the big tensor over
    the *spatial* axes only (layout-preserving, one pass per moment), then
    combine channels into groups on the tiny [N, C] moment tensors, and apply
    a single per-channel affine to the big tensor.  Stats in float32.
    """
    c = x.shape[-1]
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_spatial = 1
    for a in spatial_axes:
        n_spatial *= x.shape[a]

    s1 = jnp.sum(xf, axis=spatial_axes)  # [N, C]
    s2 = jnp.sum(xf * xf, axis=spatial_axes)  # [N, C]
    g1 = jnp.sum(s1.reshape(-1, num_groups, c // num_groups), axis=-1)
    g2 = jnp.sum(s2.reshape(-1, num_groups, c // num_groups), axis=-1)
    count = n_spatial * (c // num_groups)
    mean_g = g1 / count  # [N, G]
    # One-pass E[x^2] - mean^2 suffers catastrophic cancellation when the
    # group is (near-)constant: fp32 error ~1e-7*mean^2 can exceed eps and
    # drive var negative -> rsqrt(neg) = NaN (hit with all-zero latents +
    # time-embedding bias).  Clamp to 0; true variance >> the error is
    # unaffected, degenerate groups normalise to 0 like torch.
    var_g = jnp.maximum(g2 / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)

    # per-channel affine: y = x * (inv * scale) + (bias - mean * inv * scale)
    inv_c = jnp.repeat(inv_g, c // num_groups, axis=-1)  # [N, C]
    mean_c = jnp.repeat(mean_g, c // num_groups, axis=-1)
    w = inv_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * w
    bshape = (x.shape[0],) + (1,) * len(spatial_axes) + (c,)
    out = xf * w.reshape(bshape) + b.reshape(bshape)
    return out.astype(orig_dtype)


def _group_norm_maybe_silu(x, scale, bias, num_groups, eps, with_silu):
    out = _group_norm(x, scale, bias, num_groups, eps)
    return jax.nn.silu(out) if with_silu else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_group_norm(x, scale, bias, num_groups, eps, with_silu):
    from ..ops.groupnorm_pallas import group_norm_silu

    return group_norm_silu(x, scale, bias, num_groups, eps, with_silu)


def _fused_gn_fwd(x, scale, bias, num_groups, eps, with_silu):
    return _fused_group_norm(x, scale, bias, num_groups, eps, with_silu), (x, scale, bias)


def _fused_gn_bwd(num_groups, eps, with_silu, res, g):
    # backward through the XLA reference implementation (identical math); the
    # forward recompute it implies is what remat would do anyway.
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _group_norm_maybe_silu(x_, s_, b_, num_groups, eps, with_silu),
        x, scale, bias,
    )
    return vjp(g)


_fused_group_norm.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def group_norm_op(x, scale, bias, num_groups, eps, with_silu=False):
    """GroupNorm with optional fused SiLU; Pallas single-pass kernel on TPU
    when the folded [N, S, C] tile qualifies, XLA reference otherwise."""
    from ..ops import groupnorm_pallas as gnp

    c = x.shape[-1]
    n = x.shape[0]
    s = x.size // (n * c)
    if gnp.supports(n, s, c, num_groups, x.dtype):
        folded = x.reshape(n, s, c)
        out = _fused_group_norm(folded, scale, bias, num_groups, eps, with_silu)
        return out.reshape(x.shape)
    return _group_norm_maybe_silu(x, scale, bias, num_groups, eps, with_silu)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-5
    with_silu: bool = False  # fuse the SiLU that always follows in resblocks

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_op(x, scale, bias, self.num_groups, self.eps, self.with_silu)


def layer_norm_fp32(x: jnp.ndarray, scale, bias, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis with fp32 statistics."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return layer_norm_fp32(x, scale, bias, self.eps)


class _DenseParams(nn.Module):
    """Declares an ``nn.Dense``-compatible param subtree (same names, shapes,
    initialisers, fp32 storage) and returns the leaves instead of applying
    them — lets callers fuse the matmul (ops/ln_matmul.py) while keeping the
    checkpoint layout bit-identical."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_dim: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return k, b


class _LNParams(nn.Module):
    """``LayerNorm``-compatible param subtree, returned instead of applied."""

    @nn.compact
    def __call__(self, c: int):
        s = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return s, b


class Attention(nn.Module):
    """Multi-head attention (diffusers ``Attention`` with AttnProcessor2_0).

    q/k/v projections have no bias, output projection has bias; softmax in
    fp32. ``context`` enables cross-attention (kv projected from
    ``cross_attention_dim``-sized states).

    ``ln``: optional ``(scale, bias)`` of the preceding LayerNorm — when
    given, ``x`` arrives UN-normalised and the norm is fused into the q (and,
    for self-attention, combined qkv) projection via ``ops.ln_matmul`` so the
    normalised tensor never round-trips HBM.  Param tree is unchanged.
    """

    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        ln: Optional[tuple] = None,
    ) -> jnp.ndarray:
        from ..ops.ln_matmul import ln_matmul

        inner = self.heads * self.dim_head
        out_dim = x.shape[-1]
        ctx = x if context is None else context

        if ln is not None and context is None:
            # opt-in fused path (TTV_FUSED_LN=1): LN + combined qkv gemm.
            # Measured SLOWER than XLA's separate-gemm pattern end to end
            # (PERF.md round-2 study) — kept for study/tuning, not default.
            qk, _ = _DenseParams(inner, use_bias=False, name="to_q")(x.shape[-1])
            kk, _ = _DenseParams(inner, use_bias=False, name="to_k")(ctx.shape[-1])
            vk, _ = _DenseParams(inner, use_bias=False, name="to_v")(ctx.shape[-1])
            qkv = ln_matmul(
                x.astype(self.dtype), ln[0], ln[1],
                jnp.concatenate([qk, kk, vk], axis=1),
            )
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif ln is not None:
            qk, _ = _DenseParams(inner, use_bias=False, name="to_q")(x.shape[-1])
            q = ln_matmul(x.astype(self.dtype), ln[0], ln[1], qk)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, s, _ = q.shape
        skv = k.shape[1]
        q = q.reshape(b, s, self.heads, self.dim_head)
        k = k.reshape(b, skv, self.heads, self.dim_head)
        v = v.reshape(b, skv, self.heads, self.dim_head)

        out = dot_product_attention(q, k, v)
        out = out.reshape(b, s, inner)
        return nn.Dense(out_dim, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward: Linear(d, 2*i) -> x * gelu(gate) -> Linear(i, out).

    ``ln``: optional ``(scale, bias)`` of the preceding LayerNorm, fused into
    the first projection via ``ops.ln_matmul`` (x arrives un-normalised)."""

    dim_out: Optional[int] = None
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, ln: Optional[tuple] = None) -> jnp.ndarray:
        from ..ops.ln_matmul import ln_matmul

        dim = x.shape[-1]
        inner = dim * self.mult
        if ln is not None:
            pk, pb = _DenseParams(inner * 2, use_bias=True, name="proj")(dim)
            h = ln_matmul(x.astype(self.dtype), ln[0], ln[1], pk, pb)
        else:
            h = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(h.dtype)
        return nn.Dense(self.dim_out or dim, dtype=self.dtype, name="proj_out")(h)


class AlphaBlender(nn.Module):
    """Learned spatial/temporal mixer (diffusers AlphaBlender).

    ``merge_strategy='learned_with_images'``: per-position
    ``alpha = 1 where image_only else sigmoid(mix_factor)``;
    ``'learned'``: ``alpha = sigmoid(mix_factor)`` everywhere.
    Output ``alpha * spatial + (1-alpha) * temporal`` — or the transpose when
    ``switch_spatial_to_temporal_mix`` (used by the VAE temporal decoder).
    """

    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False

    @nn.compact
    def __call__(
        self,
        x_spatial: jnp.ndarray,
        x_temporal: jnp.ndarray,
        image_only_indicator: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        mix = self.param("mix_factor", nn.initializers.constant(0.5), (1,), jnp.float32)
        alpha_video = jax.nn.sigmoid(mix)[0]
        if self.merge_strategy == "learned":
            alpha = alpha_video
        elif self.merge_strategy == "learned_with_images":
            if image_only_indicator is None:
                alpha = alpha_video
            else:
                # indicator [B, F]; broadcast to x rank. x is either
                # [B, F, H, W, C] (resblocks) or [B*HW?, F, C]-folded handled
                # by callers passing pre-broadcast indicator.
                ind = image_only_indicator.astype(bool)
                alpha = jnp.where(ind, 1.0, alpha_video)  # [B, F]
                if x_spatial.ndim == 3:
                    # tokens folded as [B*F, S, C] (spatio-temporal transformer)
                    alpha = alpha.reshape(-1)[:, None, None]
                else:
                    # [B, F, ...spatial..., C] resblock layout
                    alpha = alpha.reshape(
                        alpha.shape + (1,) * (x_spatial.ndim - alpha.ndim)
                    )
        else:
            raise ValueError(self.merge_strategy)
        alpha = jnp.asarray(alpha, x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal
