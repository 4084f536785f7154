"""Attention compute paths.

Two interchangeable backends behind one API:

* ``xla`` — einsum attention with fp32 softmax. XLA already fuses this well
  for the short sequences in this model family (spatial <=1536 tokens,
  temporal 14, cross 78), and it is the numerics reference.
* ``pallas`` — flash-attention TPU kernel (``ops/flash_attention.py``) used
  for the large spatial self-attention shapes where keeping the S×S score
  matrix out of HBM pays off.

Shapes follow ``[batch, seq, heads, head_dim]``.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = os.environ.get("TTV_ATTENTION_BACKEND", "auto")


def set_backend(name: str) -> None:
    """``pallas_shardmap``: the flash kernel staged through shard_map instead
    of custom_partitioning — the topology-AOT path (cli/aot_memory.py), where
    the compile-only backend cannot emit the partitioning callback.  Requires
    flash_attention.set_shardmap(mesh, batch_axes) first."""
    global _BACKEND
    assert name in ("auto", "xla", "pallas", "pallas_shardmap")
    _BACKEND = name


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention, fp32 softmax, no masking (the model
    family never masks: full spatial/temporal/cross attention only)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if _BACKEND == "pallas_shardmap":
        from .flash_attention import flash_attention_shardmap, shardmap_supports

        if shardmap_supports(q, k, v):
            return flash_attention_shardmap(q, k, v, scale=scale)
    elif _BACKEND in ("auto", "pallas"):
        from .flash_attention import flash_attention, supports

        # "pallas" is a preference, not a guarantee: unsupported shapes
        # (cross-attention, tiny/unaligned sequences, CPU) still take XLA.
        if supports(q, k, v):
            return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)
