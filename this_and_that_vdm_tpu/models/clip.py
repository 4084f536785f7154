"""CLIP text / vision encoders in flax (frozen conditioning models).

Replicates the two transformers models the reference loads (SURVEY.md §2.2):

* ``CLIPVisionModelWithProjection`` — laion ViT-H/14 as shipped inside the
  SVD repo (hidden 1280, 32 layers, 16 heads, patch 14, GELU, projection to
  1024); used for the single image token
  (reference: svd/pipeline_stable_video_diffusion.py:147-148).
* ``CLIPTextModel`` — SD2.1 text encoder (hidden 1024, 23 layers, GELU,
  causal mask, 77 positions); used for the 77 text tokens
  (reference: train_code/train_svd.py:214-231, pipeline :158).

Param paths mirror the transformers state-dict so weights/convert.py's
``clip_state_dict_to_flax`` is mechanical.  Attention softmax in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_positions: int = 77
    layer_norm_eps: float = 1e-5

    @staticmethod
    def tiny():
        return CLIPTextConfig(vocab_size=64, hidden_size=32, num_layers=2,
                              num_heads=4, intermediate_size=64, max_positions=16)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    patch_size: int = 14
    image_size: int = 224
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5

    @staticmethod
    def tiny():
        return CLIPVisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                                intermediate_size=64, patch_size=8, image_size=32,
                                projection_dim=24)


class CLIPAttention(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal: bool) -> jnp.ndarray:
        b, s, c = x.shape
        d = c // self.heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x).reshape(b, s, self.heads, d)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x).reshape(b, s, self.heads, d)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x).reshape(b, s, self.heads, d)
        if causal:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            logits = logits.astype(jnp.float32) * (d**-0.5)
            mask = jnp.tril(jnp.ones((s, s), bool))
            logits = jnp.where(mask[None, None], logits, -jnp.inf)
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        else:
            o = dot_product_attention(q, k, v)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(o.reshape(b, s, c))


class CLIPLayer(nn.Module):
    heads: int
    intermediate: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal: bool) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=self.eps, name="layer_norm1")(x)
        x = x + CLIPAttention(self.heads, dtype=self.dtype, name="self_attn")(h, causal)
        h = nn.LayerNorm(epsilon=self.eps, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate, dtype=self.dtype, name="mlp_fc1")(h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPEncoder(nn.Module):
    num_layers: int
    heads: int
    intermediate: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal: bool) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = CLIPLayer(
                self.heads, self.intermediate, eps=self.eps, dtype=self.dtype,
                name=f"layers_{i}",
            )(x, causal)
        return x


class CLIPTextModel(nn.Module):
    """Returns ``last_hidden_state`` [B, S, hidden] (what the reference uses)."""

    config: CLIPTextConfig = CLIPTextConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_positions, cfg.hidden_size, dtype=self.dtype,
                       name="position_embedding")(
            jnp.arange(input_ids.shape[1])[None, :]
        )
        x = tok + pos
        x = CLIPEncoder(cfg.num_layers, cfg.num_heads, cfg.intermediate_size,
                        eps=cfg.layer_norm_eps, dtype=self.dtype, name="encoder")(
            x, causal=True
        )
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")(x)


class CLIPVisionModelWithProjection(nn.Module):
    """Returns ``image_embeds`` [B, projection_dim]."""

    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        # pixel_values: [B, H, W, 3], CLIP-normalised
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)), patches],
            axis=1,
        )
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = nn.Embed(n_pos, cfg.hidden_size, dtype=self.dtype, name="position_embedding")(
            jnp.arange(x.shape[1])[None, :]
        )
        x = x + pos
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="pre_layrnorm")(x)
        x = CLIPEncoder(cfg.num_layers, cfg.num_heads, cfg.intermediate_size,
                        eps=cfg.layer_norm_eps, dtype=self.dtype, name="encoder")(
            x, causal=False
        )
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="post_layernorm")(x[:, 0])
        return nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype, name="visual_projection"
        )(pooled)
