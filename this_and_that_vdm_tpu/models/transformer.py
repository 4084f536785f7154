"""Spatio-temporal transformer (the hot path of the SVD denoiser).

Replicates reference svd/diffusion_arch/transformer_temporal.py:201-381
(``TransformerSpatioTemporalModel``) and the diffusers
``BasicTransformerBlock`` / ``TemporalBasicTransformerBlock`` it composes:

* per layer: spatial block (self-attn over H*W tokens + cross-attn on the
  78x1024 CLIP text+image states) then temporal block (attn over F frame
  tokens with spatial positions folded into batch), merged by a learned
  AlphaBlender;
* temporal cross-attention context is the *first frame's* encoder states,
  broadcast over spatial positions in hw-major order (:310-319) — the
  reference/diffusers row ordering is replicated exactly (it only matters for
  batch>1, i.e. the CFG pair);
* learned frame-position embedding: sinusoid(arange(F)) -> MLP, added before
  each temporal block (:328-339, :358-359).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (
    Attention,
    FeedForward,
    GroupNorm,
    LayerNorm,
    AlphaBlender,
    TimestepEmbedding,
    sinusoidal_embedding,
    _DenseParams,
    _LNParams,
)

Dtype = Any


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU-FF, all residual."""

    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..ops.ln_matmul import enabled as fused_ln

        c = x.shape[-1]
        if fused_ln():
            h = Attention(self.heads, self.dim_head, dtype=self.dtype, name="attn1")(
                x, ln=_LNParams(name="norm1")(c)
            )
        else:
            h = Attention(self.heads, self.dim_head, dtype=self.dtype, name="attn1")(
                LayerNorm(name="norm1")(x)
            )
        x = x + h
        if self.cross_attention_dim is not None:
            attn2 = Attention(
                self.heads,
                self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name="attn2",
            )
            if fused_ln():
                h = attn2(x, context, ln=_LNParams(name="norm2")(c))
            else:
                h = attn2(LayerNorm(name="norm2")(x), context)
            x = x + h
        if fused_ln():
            h = FeedForward(dtype=self.dtype, name="ff")(x, ln=_LNParams(name="norm3")(c))
        else:
            h = FeedForward(dtype=self.dtype, name="ff")(LayerNorm(name="norm3")(x))
        return x + h


class GroupedCrossAttention(nn.Module):
    """Cross-attention where rows share only ``n_ctx`` distinct contexts.

    The reference broadcasts the first frame's encoder states over all H*W
    spatial positions hw-major and runs K/V projections on the materialised
    ``[HW*B, 78, 1024]`` tensor (transformer_temporal.py:310-319) — row ``r``
    of the folded batch consumes context ``r % B``.  This module computes the
    SAME math with K/V projected once per distinct context (factor H*W fewer
    projection FLOPs and no giant intermediate), grouping query rows by
    ``r % n_ctx``.  Param layout matches diffusers ``Attention`` exactly.
    """

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x_rows: jnp.ndarray, ctx: jnp.ndarray, ln: Optional[tuple] = None,
        clips: int = 1,
    ) -> jnp.ndarray:
        from ..ops.ln_matmul import ln_matmul

        # x_rows: [R, F, C];  ctx: [n, S_kv, D].  With ``clips == 1`` row r
        # attends ctx[r % n] — the reference quirk above, REQUIRED for
        # bit-parity with the published weights at CFG batch 2.  With
        # ``clips`` independent clips in the batch (serving micro-batches,
        # batch>1 training; batch rows are branch-major blocks of ``clips``),
        # each clip reproduces its own solo-run mapping instead of leaking
        # its neighbours' contexts:  row (b=j*clips+i, p) -> ctx[((j*s + p)
        # % mult) * clips + i]  (mult = n // clips branches; for mult == 1,
        # training, this is simply each clip's own context).
        r, f, c = x_rows.shape
        n = ctx.shape[0]
        inner = self.heads * self.dim_head

        if ln is not None:
            qkern, _ = _DenseParams(inner, use_bias=False, name="to_q")(c)
            q = ln_matmul(x_rows.astype(self.dtype), ln[0], ln[1], qkern)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x_rows)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        m = r // n
        k = k.reshape(n, -1, self.heads, self.dim_head)
        v = v.reshape(n, -1, self.heads, self.dim_head)

        inv = None
        if clips == 1:
            q = q.reshape(m, n, f, self.heads, self.dim_head).transpose(1, 0, 2, 3, 4)
        else:
            # static permutation grouping rows by their context (each of the
            # n contexts serves exactly m rows — the mapping is balanced)
            order, inv = _clip_exact_order(r, n, clips)
            q = q[order].reshape(n, m, f, self.heads, self.dim_head)

        logits = jnp.einsum(
            "cmfhd,ckhd->cmhfk", q, k, preferred_element_type=jnp.float32
        ).astype(jnp.float32) * (self.dim_head**-0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("cmhfk,ckhd->cmfhd", probs, v)
        if inv is None:
            out = out.transpose(1, 0, 2, 3, 4).reshape(r, f, inner)
        else:
            out = out.reshape(r, f, inner)[inv]
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


def _unfolded_temporal_enabled() -> bool:
    """Layout experiment knob (read at trace time): run the temporal block
    on [B, F, S, C] views with frame-axis einsum attention instead of the
    materialised [B*S, F, C] fold — the fold/unfold transposes showed up as
    part of the 10% layout/copy share in the round-1 xplane trace."""
    import os

    return os.environ.get("TTV_TEMPORAL_UNFOLDED", "0") == "1"


def _clip_exact_order(r: int, n: int, clips: int):
    """Static row permutation for the per-clip exact context mapping.

    Rows ``r = b*s + p`` with batch rows ``b = j*clips + i`` (branch-major
    blocks of ``clips`` independent clips); context index
    ``((j*s + p) % mult) * clips + i`` — each clip's rows see the same
    row->context pattern its solo run would, so co-batched clips cannot
    leak into each other.  Every context serves exactly ``s`` rows (the
    mapping is balanced), so grouping rows context-major turns the gather
    back into dense per-context attention.  Returns (order, inverse)."""
    import numpy as _np

    if r % n or n % clips:
        raise ValueError(
            f"context_clips={clips} must divide the {n} contexts and rows "
            f"({r}) must fold evenly — got a non-divisible batch layout")
    s = r // n
    mult = n // clips
    rows = _np.arange(r)
    b, p = rows // s, rows % s
    i, j = b % clips, b // clips
    ctx = ((j * s + p) % mult) * clips + i
    order = _np.argsort(ctx, kind="stable")
    inv = _np.argsort(order)
    return jnp.asarray(order), jnp.asarray(inv)


class FrameAxisAttention(nn.Module):
    """Self-attention over the FRAME axis of [B, F, S, C] without folding S
    into batch: dot_generals carry (B, S, heads) as batch dims so XLA can
    absorb the layout change into the matmuls.  Param layout identical to
    ``Attention`` (to_q/to_k/to_v/to_out)."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, F, S, C]
        b, f, s, c = x.shape
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        q = q.reshape(b, f, s, self.heads, self.dim_head)
        k = k.reshape(b, f, s, self.heads, self.dim_head)
        v = v.reshape(b, f, s, self.heads, self.dim_head)
        logits = jnp.einsum(
            "bfshd,bgshd->bshfg", q, k, preferred_element_type=jnp.float32
        ).astype(jnp.float32) * (self.dim_head**-0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bshfg,bgshd->bfshd", probs, v)
        out = out.reshape(b, f, s, inner)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


class GroupedCrossAttentionUnfolded(nn.Module):
    """GroupedCrossAttention math on the unfolded [B, F, S, C] layout.

    The reference's hw-major broadcast means folded row ``r = b*S + s``
    consumes ``ctx[r % n]`` — here realised by computing the (cheap, 78-key)
    cross-attention against every candidate context and one-hot selecting
    per (b, s).  Cost n x the tiny cross-attn; only used when the static
    batch is small (CFG pairs/triples), never in training."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, ctx: jnp.ndarray,
                 clips: int = 1) -> jnp.ndarray:
        b, f, s, c = x.shape
        n = ctx.shape[0]
        if n % clips:
            raise ValueError(f"context_clips={clips} must divide {n} contexts")
        mult = n // clips
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        q = q.reshape(b, f, s, self.heads, self.dim_head)
        k = k.reshape(n, -1, self.heads, self.dim_head)
        v = v.reshape(n, -1, self.heads, self.dim_head)
        logits = jnp.einsum(
            "bfshd,nkhd->nbshfk", q, k, preferred_element_type=jnp.float32
        ).astype(jnp.float32) * (self.dim_head**-0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("nbshfk,nkhd->nbfshd", probs, v)
        # per-clip exact mapping (== the reference r % n quirk at clips=1;
        # see GroupedCrossAttention / _clip_exact_order)
        bb = jnp.arange(b)[:, None]
        pp = jnp.arange(s)[None, :]
        sel = ((bb // clips * s + pp) % mult) * clips + bb % clips  # [b, s]
        onehot = jax.nn.one_hot(sel, n, dtype=out.dtype)
        out = jnp.einsum("nbfshd,bsn->bfshd", out, onehot)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(
            out.reshape(b, f, s, inner))


class TemporalBasicTransformerBlock(nn.Module):
    """Attention over the frame axis; spatial tokens folded into batch.

    Input ``[B*F, S, C]``; internally reordered to ``[B*S, F, C]``.
    ``time_mix_inner_dim == dim`` in SVD so the input FF is residual.
    Cross-attention context comes compact as ``[B, S_kv, D]`` (first-frame
    states); row->context mapping replicates the reference's hw-major
    broadcast exactly (see GroupedCrossAttention).

    With ``TTV_TEMPORAL_UNFOLDED=1`` and a small static batch, the same math
    runs on [B, F, S, C] views (no fold/unfold transposes) — parity-tested
    against the folded path.
    """

    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        num_frames: int,
        context: Optional[jnp.ndarray] = None,  # [B, S_kv, D] compact
        clips: int = 1,
    ) -> jnp.ndarray:
        bf, s, c = x.shape
        b = bf // num_frames
        if _unfolded_temporal_enabled() and b <= 3:
            h = x.reshape(b, num_frames, s, c)
            residual = h
            h = FeedForward(dtype=self.dtype, name="ff_in")(LayerNorm(name="norm_in")(h))
            h = h + residual
            h = h + FrameAxisAttention(
                self.heads, self.dim_head, dtype=self.dtype, name="attn1"
            )(LayerNorm(name="norm1")(h))
            if self.cross_attention_dim is not None:
                h = h + GroupedCrossAttentionUnfolded(
                    self.heads, self.dim_head, dtype=self.dtype, name="attn2"
                )(LayerNorm(name="norm2")(h), context, clips=clips)
            h = h + FeedForward(dtype=self.dtype, name="ff")(LayerNorm(name="norm3")(h))
            return h.reshape(bf, s, c)

        from ..ops.ln_matmul import enabled as fused_ln

        h = x.reshape(b, num_frames, s, c).transpose(0, 2, 1, 3).reshape(b * s, num_frames, c)

        residual = h
        if fused_ln():
            h = FeedForward(dtype=self.dtype, name="ff_in")(h, ln=_LNParams(name="norm_in")(c))
        else:
            h = FeedForward(dtype=self.dtype, name="ff_in")(LayerNorm(name="norm_in")(h))
        h = h + residual  # is_res: dim == time_mix_inner_dim

        attn1 = Attention(self.heads, self.dim_head, dtype=self.dtype, name="attn1")
        if fused_ln():
            h = h + attn1(h, ln=_LNParams(name="norm1")(c))
        else:
            h = h + attn1(LayerNorm(name="norm1")(h))
        if self.cross_attention_dim is not None:
            attn2 = GroupedCrossAttention(
                self.heads, self.dim_head, dtype=self.dtype, name="attn2"
            )
            if fused_ln():
                h = h + attn2(h, context, ln=_LNParams(name="norm2")(c),
                              clips=clips)
            else:
                h = h + attn2(LayerNorm(name="norm2")(h), context, clips=clips)
        if fused_ln():
            h = h + FeedForward(dtype=self.dtype, name="ff")(h, ln=_LNParams(name="norm3")(c))
        else:
            h = h + FeedForward(dtype=self.dtype, name="ff")(LayerNorm(name="norm3")(h))

        return h.reshape(b, s, num_frames, c).transpose(0, 2, 1, 3).reshape(bf, s, c)


class TransformerSpatioTemporalModel(nn.Module):
    heads: int
    dim_head: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    # independent clips in the batch: 1 = whole batch one group (the
    # reference CFG-pair quirk, required for weight parity); serving /
    # batch>1 training set it to the clip count for per-clip exact mapping
    context_clips: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, F, H, W, C]
        context: jnp.ndarray,  # [B*F, S, D] encoder states, frame-repeated
        image_only_indicator: Optional[jnp.ndarray] = None,  # [B, F]
    ) -> jnp.ndarray:
        b, f, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        hw = hh * ww

        # Temporal cross-attn context: first frame's states per batch element.
        # Kept compact [B, S, D]; the hw-major broadcast of the reference
        # (transformer_temporal.py:310-319) is realised as the row->context
        # mapping inside GroupedCrossAttention (row r -> ctx[r % B]).
        time_context = context.reshape(b, f, *context.shape[1:])[:, 0]

        flat = x.reshape(b * f, hh, ww, c)
        residual = flat
        h = GroupNorm(32, 1e-6, name="norm")(flat)
        h = h.reshape(b * f, hw, c)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)

        # Frame-position embedding (b-major fold: rows [b*F + f]).
        frame_ids = jnp.tile(jnp.arange(f, dtype=jnp.float32), (b,))
        t_emb = sinusoidal_embedding(frame_ids, c).astype(h.dtype)
        emb = TimestepEmbedding(c * 4, out_dim=c, dtype=self.dtype, name="time_pos_embed")(
            t_emb
        )[:, None, :]

        # ONE AlphaBlender shared across layers (diffusers creates a single
        # self.time_mixer in __init__, transformer_temporal.py:267, reused by
        # every layer; constructing it inside the loop would also collide on
        # the flax name at num_layers >= 2)
        time_mixer = AlphaBlender(merge_strategy="learned_with_images",
                                  name="time_mixer")
        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                self.heads,
                self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, context)
            h_mix = TemporalBasicTransformerBlock(
                self.heads,
                self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"temporal_transformer_blocks_{i}",
            )(h + emb, f, time_context, clips=self.context_clips)
            h = time_mixer(h, h_mix, image_only_indicator)

        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        h = h.reshape(b * f, hh, ww, c) + residual
        return h.reshape(b, f, hh, ww, c)
