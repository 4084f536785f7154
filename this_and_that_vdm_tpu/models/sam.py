"""Segment Anything (SAM) in flax — TPU-native, channels-last.

The reference pip-installs ``segment-anything`` and drives it with point/box
prompts at three curation sites (SURVEY §2.2):
`curation_pipeline/select_frame_with_this_that.py:387-390` (gripper mask from
point+box), `track_anything_code/tools/base_segmenter.py:25-27` (first-frame
click mask for tracking) and `scripts/generate_traj.py:505-508`
(positive/negative labelled points).  This module is a from-scratch
reimplementation of the SAM architecture (image-encoder ViT, prompt encoder,
two-way-transformer mask decoder) so the curation stack runs natively on
TPU with the published ``sam_vit_{b,l,h}`` checkpoints — no torch or
external package in the loop.

TPU-first design decisions:
  * channels-last NHWC end to end (the official torch code itself carries
    ViT activations as B,H,W,C — the layout is native here, not a port);
  * windowed ViT attention is batched: the 14x14 windows fold into the batch
    axis and run as one dense attention (B*nW, 196, C) on the MXU;
  * decomposed relative-position bias is added as two einsums (same math as
    the official ``add_decomposed_rel_pos``) with fp32 softmax;
  * the 2x2-stride-2 transposed convs of the mask upscaler have no overlap,
    so they are computed as a single einsum + pixel-shuffle reshape (exactly
    equivalent, MXU-friendly, no gradient-of-conv lowering);
  * everything jits with static shapes: prompts are padded to a fixed
    ``max_points`` slot count with "not a point" embeddings, which the
    architecture already defines for exactly this purpose.

Weight mapping from the published checkpoints (``sam_vit_h_4b8939.pth`` et
al. — plain torch ``state_dict`` files) lives in
``weights/convert.py::sam_state_dict_to_flax``.  Host-side pre/postprocessing
(longest-side resize, normalisation, mask upscale back to the original
resolution) lives in ``curation/detectors.NativeSAMSegmenter``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import layer_norm_fp32

# SAM input normalisation (official sam.py pixel_mean/pixel_std buffers).
SAM_PIXEL_MEAN = (123.675, 116.28, 103.53)
SAM_PIXEL_STD = (58.395, 57.12, 57.375)
MASK_THRESHOLD = 0.0


@dataclass(frozen=True)
class SamConfig:
    """Architecture hyperparameters (official ``build_sam.py`` registry)."""

    img_size: int = 1024
    patch_size: int = 16
    # image encoder (ViT-H defaults)
    encoder_embed_dim: int = 1280
    encoder_depth: int = 32
    encoder_num_heads: int = 16
    encoder_global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    mlp_ratio: float = 4.0
    # prompt encoder / decoder
    prompt_embed_dim: int = 256
    mask_in_chans: int = 16
    decoder_depth: int = 2
    decoder_num_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    @classmethod
    def vit_h(cls) -> "SamConfig":
        return cls()

    @classmethod
    def vit_l(cls) -> "SamConfig":
        return cls(encoder_embed_dim=1024, encoder_depth=24,
                   encoder_num_heads=16,
                   encoder_global_attn_indexes=(5, 11, 17, 23))

    @classmethod
    def vit_b(cls) -> "SamConfig":
        return cls(encoder_embed_dim=768, encoder_depth=12,
                   encoder_num_heads=12,
                   encoder_global_attn_indexes=(2, 5, 8, 11))

    @classmethod
    def tiny(cls) -> "SamConfig":
        """Test-size config: 64px image, 4x4 token grid, 2 blocks."""
        return cls(img_size=64, patch_size=16, encoder_embed_dim=32,
                   encoder_depth=2, encoder_num_heads=2,
                   encoder_global_attn_indexes=(1,), window_size=2,
                   prompt_embed_dim=16, mask_in_chans=4, decoder_mlp_dim=32,
                   decoder_num_heads=2, iou_head_hidden_dim=16)


# --------------------------------------------------------------------------
# Image encoder (official image_encoder.py)
# --------------------------------------------------------------------------


class MLPBlock(nn.Module):
    """Linear -> exact GELU -> Linear (official common.py::MLPBlock)."""

    hidden: int
    dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.hidden, name="lin1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(d, name="lin2")(x)


def _rel_pos_bias(rel_pos: jnp.ndarray, q_size: int) -> jnp.ndarray:
    """[2*S-1, Dh] table -> [S, S, Dh] gathered relative embeddings
    (official ``get_rel_pos`` with q_size == k_size, no interpolation —
    the table is sized for the static block geometry)."""
    coords = jnp.arange(q_size)
    rel = coords[:, None] - coords[None, :] + (q_size - 1)
    return rel_pos[rel]


class ViTAttention(nn.Module):
    """Windowed/global ViT attention with decomposed rel-pos bias
    (official image_encoder.py::Attention + add_decomposed_rel_pos)."""

    num_heads: int
    input_size: int  # tokens per side (window_size or grid_size)

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C] with H == W == input_size
        b, h, w, c = x.shape
        dh = c // self.num_heads
        qkv = nn.Dense(3 * c, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, dh)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # [B, S, nH, Dh] each

        attn = jnp.einsum("bqhd,bkhd->bhqk", q * (dh ** -0.5), k)

        rel_h = self.param(
            "rel_pos_h", nn.initializers.zeros,
            (2 * self.input_size - 1, dh), jnp.float32)
        rel_w = self.param(
            "rel_pos_w", nn.initializers.zeros,
            (2 * self.input_size - 1, dh), jnp.float32)
        rh = _rel_pos_bias(rel_h.astype(x.dtype), h)  # [h, h, Dh]
        rw = _rel_pos_bias(rel_w.astype(x.dtype), w)  # [w, w, Dh]
        rq = q.reshape(b, h, w, self.num_heads, dh)
        bias_h = jnp.einsum("bhwnd,hkd->bnhwk", rq, rh)  # [B,nH,h,w,kh]
        bias_w = jnp.einsum("bhwnd,wkd->bnhwk", rq, rw)  # [B,nH,h,w,kw]
        attn = attn.reshape(b, self.num_heads, h, w, h, w)
        attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
        attn = attn.reshape(b, self.num_heads, h * w, h * w)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h * w, c)
        return nn.Dense(c, name="proj")(out).reshape(b, h, w, c)


def window_partition(x: jnp.ndarray, ws: int):
    """[B, H, W, C] -> [B*nW, ws, ws, C] with bottom/right zero padding."""
    b, h, w, c = x.shape
    ph, pw = (-h) % ws, (-w) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(x: jnp.ndarray, ws: int, padded_hw, out_hw):
    hp, wp = padded_hw
    h, w = out_hw
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class ViTBlock(nn.Module):
    cfg: SamConfig
    window_size: int  # 0 = global attention

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            hw = x.shape[1:3]
            x, padded = window_partition(x, self.window_size)
            size = self.window_size
        else:
            size = cfg.grid_size
        x = ViTAttention(cfg.encoder_num_heads, size, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, padded, hw)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        return x + MLPBlock(int(x.shape[-1] * cfg.mlp_ratio), name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """1024x1024x3 -> 64x64x256 embedding (official image_encoder.py)."""

    cfg: SamConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        g = cfg.grid_size
        p = cfg.patch_size
        x = nn.Conv(cfg.encoder_embed_dim, (p, p), strides=(p, p),
                    padding="VALID", name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, cfg.encoder_embed_dim), jnp.float32)
        x = x + pos.astype(x.dtype)
        for i in range(cfg.encoder_depth):
            ws = 0 if i in cfg.encoder_global_attn_indexes else cfg.window_size
            x = ViTBlock(cfg, ws, name=f"blocks_{i}")(x)
        # neck: 1x1 conv -> LN -> 3x3 conv -> LN (LayerNorm2d == channel LN)
        x = nn.Conv(cfg.prompt_embed_dim, (1, 1), use_bias=False,
                    name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln1")(x)
        x = nn.Conv(cfg.prompt_embed_dim, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2")(x)
        return nn.LayerNorm(epsilon=1e-6, name="neck_ln2")(x)


# --------------------------------------------------------------------------
# Prompt encoder (official prompt_encoder.py)
# --------------------------------------------------------------------------


class PositionEmbeddingRandom(nn.Module):
    """Random-fourier positional encoding.  The gaussian matrix is a
    checkpoint buffer (fixed at SAM training time), held here as a param the
    converter fills."""

    num_pos_feats: int

    @nn.compact
    def __call__(self, coords01: jnp.ndarray) -> jnp.ndarray:
        gauss = self.param(
            "gaussian", lambda k, s: jax.random.normal(k, s, jnp.float32),
            (2, self.num_pos_feats))
        c = (2.0 * coords01 - 1.0) @ gauss.astype(coords01.dtype)
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid(self, size: int) -> jnp.ndarray:
        """[size, size, 2*num_pos_feats] dense PE over pixel centres."""
        ys = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
        xs = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        return self(jnp.stack([xx, yy], axis=-1))


class PromptEncoder(nn.Module):
    """Points/boxes/mask -> sparse [B, N, C] + dense [B, g, g, C] embeddings.

    Point labels (official ``_embed_points``): 1 positive, 0 negative,
    -1 padding ("not a point"), 2/3 box corners.  Boxes are passed as two
    corner points with labels 2 and 3 — identical math to the official
    ``_embed_boxes`` and it keeps one static-shape code path for jit.
    """

    cfg: SamConfig

    def setup(self):
        c = self.cfg.prompt_embed_dim
        self.pe_layer = PositionEmbeddingRandom(c // 2, name="pe_layer")
        # official point_embeddings ModuleList order:
        # [neg point, pos point, box corner 1 (top-left), box corner 2]
        self.point_embed_neg = self.param("point_embed_neg", nn.initializers.normal(1.0), (c,))
        self.point_embed_pos = self.param("point_embed_pos", nn.initializers.normal(1.0), (c,))
        self.box_embed_1 = self.param("box_embed_1", nn.initializers.normal(1.0), (c,))
        self.box_embed_2 = self.param("box_embed_2", nn.initializers.normal(1.0), (c,))
        self.not_a_point = self.param("not_a_point", nn.initializers.normal(1.0), (c,))
        self.no_mask = self.param("no_mask", nn.initializers.normal(1.0), (c,))
        m = self.cfg.mask_in_chans
        self.mask_conv1 = nn.Conv(m // 4, (2, 2), strides=(2, 2), name="mask_conv1")
        self.mask_ln1 = nn.LayerNorm(epsilon=1e-6, name="mask_ln1")
        self.mask_conv2 = nn.Conv(m, (2, 2), strides=(2, 2), name="mask_conv2")
        self.mask_ln2 = nn.LayerNorm(epsilon=1e-6, name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.cfg.prompt_embed_dim, (1, 1), name="mask_conv3")

    def __call__(self, points_xy, labels, mask_input=None):
        """points_xy [B, N, 2] in input-image pixels (already +0.5-centred by
        the caller — see NativeSAMSegmenter), labels [B, N] int32,
        mask_input optional [B, 4g, 4g, 1] low-res mask logits."""
        cfg = self.cfg
        pe = self.pe_layer(points_xy / cfg.img_size)
        lbl = labels[..., None]
        # official _embed_points: PE zeroed for label -1, then the label's
        # learned embedding is added
        base = jnp.where(lbl == -1, jnp.zeros_like(pe), pe)
        add = jnp.where(
            lbl == -1, self.not_a_point.astype(pe.dtype),
            jnp.where(lbl == 0, self.point_embed_neg.astype(pe.dtype),
                      jnp.where(lbl == 1, self.point_embed_pos.astype(pe.dtype),
                                jnp.where(lbl == 2, self.box_embed_1.astype(pe.dtype),
                                          self.box_embed_2.astype(pe.dtype)))))
        sparse = base + add

        g = cfg.grid_size
        if mask_input is None:
            dense = jnp.broadcast_to(
                self.no_mask.astype(pe.dtype),
                (points_xy.shape[0], g, g, cfg.prompt_embed_dim))
        else:
            m = self.mask_conv1(mask_input)
            m = jax.nn.gelu(self.mask_ln1(m), approximate=False)
            m = self.mask_conv2(m)
            m = jax.nn.gelu(self.mask_ln2(m), approximate=False)
            dense = self.mask_conv3(m)
        return sparse, dense

    def dense_pe(self):
        return self.pe_layer.grid(self.cfg.grid_size)


# --------------------------------------------------------------------------
# Mask decoder (official mask_decoder.py + transformer.py)
# --------------------------------------------------------------------------


class DecoderAttention(nn.Module):
    """Decoder attention with optional internal downsampling
    (official transformer.py::Attention)."""

    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = q.shape[-1]
        inner = d // self.downsample_rate
        dh = inner // self.num_heads
        qp = nn.Dense(inner, name="q_proj")(q)
        kp = nn.Dense(inner, name="k_proj")(k)
        vp = nn.Dense(inner, name="v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, dh)

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(dh)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        out = out.reshape(q.shape[0], q.shape[1], inner)
        return nn.Dense(d, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    cfg: SamConfig
    skip_first_layer_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        if self.skip_first_layer_pe:
            queries = DecoderAttention(cfg.decoder_num_heads, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(
                cfg.decoder_num_heads, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(
            cfg.decoder_num_heads, 2, name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        queries = queries + MLPBlock(cfg.decoder_mlp_dim, name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(
            cfg.decoder_num_heads, 2, name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        # image_embedding/image_pe: [B, g, g, C] -> [B, g*g, C]
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c)
        queries = point_embedding
        for i in range(self.cfg.decoder_depth):
            queries, keys = TwoWayAttentionBlock(
                self.cfg, skip_first_layer_pe=(i == 0), name=f"layers_{i}")(
                queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DecoderAttention(
            self.cfg.decoder_num_heads, 2, name="final_attn_token_to_image")(
            q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries)
        return queries, keys


class Deconv2x(nn.Module):
    """2x2-stride-2 transposed conv as einsum + pixel shuffle.  With kernel
    == stride the windows never overlap, so torch's ConvTranspose2d is
    exactly ``out[2i+di, 2j+dj, o] = sum_c x[i,j,c] * w[c,o,di,dj] + b`` —
    one MXU einsum and a reshape here (no conv-transpose lowering)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (2, 2, cin, self.features), jnp.float32)
        y = jnp.einsum("bhwc,xyco->bhwxyo", x, k.astype(x.dtype))
        b_, h, w, _, _, o = y.shape
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * h, 2 * w, o)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32).astype(x.dtype)
        return y


class MLP(nn.Module):
    """ReLU MLP (official mask_decoder.py::MLP, sigmoid_output=False)."""

    hidden: int
    out: int
    depth: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            last = i == self.depth - 1
            x = nn.Dense(self.out if last else self.hidden, name=f"layers_{i}")(x)
            if not last:
                x = jax.nn.relu(x)
        return x


class MaskDecoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt):
        """image_embeddings [B, g, g, C] (B=1 broadcast over prompts),
        image_pe [g, g, C], sparse [P, N, C], dense [P, g, g, C].
        Returns (masks [P, num_mask_tokens, 4g, 4g], iou_pred [P, tokens])."""
        cfg = self.cfg
        c = cfg.prompt_embed_dim
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, c))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (cfg.num_mask_tokens, c))
        p = sparse_prompt.shape[0]
        tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.broadcast_to(tokens[None], (p,) + tokens.shape)
        tokens = jnp.concatenate([tokens.astype(sparse_prompt.dtype),
                                  sparse_prompt], axis=1)

        src = jnp.broadcast_to(image_embeddings,
                               (p,) + image_embeddings.shape[1:])
        src = src + dense_prompt
        pos = jnp.broadcast_to(image_pe[None], src.shape).astype(src.dtype)

        hs, src = TwoWayTransformer(cfg, name="transformer")(src, pos, tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1:1 + cfg.num_mask_tokens]

        g = cfg.grid_size
        up = src.reshape(p, g, g, c)
        up = Deconv2x(c // 4, name="upscale_conv1")(up)
        up = jax.nn.gelu(nn.LayerNorm(epsilon=1e-6, name="upscale_ln")(up),
                         approximate=False)
        up = Deconv2x(c // 8, name="upscale_conv2")(up)
        up = jax.nn.gelu(up, approximate=False)  # [P, 4g, 4g, C/8]

        hyper = jnp.stack([
            MLP(c, c // 8, 3, name=f"hyper_mlps_{i}")(mask_out[:, i])
            for i in range(cfg.num_mask_tokens)
        ], axis=1)  # [P, T, C/8]
        masks = jnp.einsum("ptc,phwc->pthw", hyper, up)
        iou_pred = MLP(cfg.iou_head_hidden_dim, cfg.num_mask_tokens,
                       cfg.iou_head_depth, name="iou_head")(iou_out)
        return masks, iou_pred


# --------------------------------------------------------------------------
# Full model
# --------------------------------------------------------------------------


class Sam(nn.Module):
    """Full SAM: ``encode_image`` once per frame, then ``predict`` per
    prompt set (the official SamPredictor split, as jittable methods)."""

    cfg: SamConfig

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.cfg, name="image_encoder")
        self.prompt_encoder = PromptEncoder(self.cfg, name="prompt_encoder")
        self.mask_decoder = MaskDecoder(self.cfg, name="mask_decoder")

    def encode_image(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """[B, img, img, 3] SAM-normalised pixels -> [B, g, g, C]."""
        return self.image_encoder(pixels)

    def predict(self, image_embedding, points_xy, labels, mask_input=None):
        """image_embedding [1, g, g, C]; points_xy [P, N, 2] (input-image
        pixel coords, centre-shifted), labels [P, N].
        Returns (low-res mask logits [P, T, 4g, 4g], iou [P, T])."""
        sparse, dense = self.prompt_encoder(points_xy, labels, mask_input)
        image_pe = self.prompt_encoder.dense_pe()
        return self.mask_decoder(image_embedding, image_pe, sparse, dense)

    def __call__(self, pixels, points_xy, labels):
        """init-convenience: full forward on one image."""
        emb = self.encode_image(pixels)
        return self.predict(emb, points_xy, labels)


def preprocess_np(image_rgb_uint8, img_size: int):
    """Host-side: longest-side resize + normalise + bottom/right pad.

    Returns (padded [1, img, img, 3] float32, (new_h, new_w) the unpadded
    content size).  Resize matches the official ResizeLongestSide (PIL
    bilinear on uint8)."""
    import numpy as np
    from PIL import Image

    h, w = image_rgb_uint8.shape[:2]
    scale = img_size / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    resized = np.asarray(
        Image.fromarray(image_rgb_uint8).resize((nw, nh), Image.BILINEAR),
        np.float32)
    mean = np.asarray(SAM_PIXEL_MEAN, np.float32)
    std = np.asarray(SAM_PIXEL_STD, np.float32)
    x = (resized - mean) / std
    out = np.zeros((img_size, img_size, 3), np.float32)
    out[:nh, :nw] = x
    return out[None], (nh, nw)


def transform_coords_np(coords_xy, orig_hw, img_size: int):
    """Original-image pixel coords -> resized-image coords (+0.5 centring).

    Official order: ``ResizeLongestSide.apply_coords`` scales first, then
    ``_embed_points`` shifts +0.5 in model-input space."""
    import numpy as np

    h, w = orig_hw
    scale = img_size / max(h, w)
    # per-axis ratios against the ROUNDED resized size (official
    # get_preprocess_shape + apply_coords)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    c = np.asarray(coords_xy, np.float32).copy()
    c[..., 0] = c[..., 0] * (nw / w)
    c[..., 1] = c[..., 1] * (nh / h)
    return c + 0.5


def postprocess_masks_np(low_res_logits, input_hw, orig_hw, img_size: int):
    """[P, T, 4g, 4g] logits -> [P, T, H, W] at the original resolution
    (official postprocess_masks: bilinear to img_size, crop pad, bilinear to
    original)."""
    import numpy as np

    p, t = low_res_logits.shape[:2]
    x = jnp.asarray(low_res_logits)
    x = jax.image.resize(x, (p, t, img_size, img_size), "bilinear")
    x = x[:, :, :input_hw[0], :input_hw[1]]
    x = jax.image.resize(x, (p, t) + tuple(orig_hw), "bilinear")
    return np.asarray(x)
