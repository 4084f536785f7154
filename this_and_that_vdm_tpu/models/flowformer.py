"""FlowFormer optical flow in flax — TPU-native, channels-last.

The reference's trajectory generator imports a user-vendored
``flowformer_code`` (scripts/generate_traj.py:20-26 — the code is NOT in
the reference repo) configured by config/flowformer_config.py.  Round 3
shipped two halves of that contract: the ``FlowFormerFlow`` torch adapter
(curation/detectors.py) for users who vendor the original, and native RAFT
(models/raft.py) as the in-framework flow network, with the substitution
quantified on fixtures (PARITY.md, perf_r4/flow_substitution.json).  This
module closes the remaining architecture gap: FlowFormer itself (Huang et
al., ECCV 2022 — the cost-volume transformer the reference's config
describes), implemented from scratch in flax.

Architecture (mirroring config/flowformer_config.py field-for-field where
the fields name the original FlowFormer design):
  * feature/context encoders — Twins-SVT first two stages (``fnet``/
    ``cnet`` = 'twins', encoder_latent_dim=256): 4x4 then 2x2 patch
    embeds, alternating locally-grouped self-attention (LSA, window w_s)
    and global sub-sampled attention (GSA, stride-sr key/value pooling),
    PEG depthwise-conv positional encoding after each stage's first block
    — 1/8 resolution, 256-d;
  * cost volume — all-pairs dot product, 1/sqrt(D) scaled (shared with
    RAFT's ``build_corr_pyramid`` level 0);
  * cost memory encoder — each source pixel's cost map is patchified
    (patch_size=8 -> cost_latent_input_dim=64 tokens with linear PE) and
    summarised into ``cost_latent_token_num=8`` latent tokens of dim
    ``cost_latent_dim=128`` by perceiver-style cross-attention, then
    ``encoder_depth=3`` Alternate-Group Transformer (AGT) layers:
    intra-cost-map self-attention over each pixel's K latents alternating
    with inter-cost-map locally-grouped attention across the source-pixel
    grid (one group per latent index);
  * cost memory decoder — ``decoder_depth`` shared-weight recurrent
    iterations: a 9x9 local cost retrieval around the current flow
    (RAFT's bilinear lookup), a positional cost query cross-attending to
    that pixel's cost memory (cost_heads_num heads, query_latent_dim
    query projection), a motion encoder over [local cost, decoded cost,
    flow], GMA global motion aggregation over context attention
    (gma='GMA'), a separable ConvGRU, and RAFT's convex 8x upsampling.

TPU-first notes:
  * channels-last NHWC, fp32 (offline curation tooling; the cost volume
    steers sub-pixel lookups — same precision pinning as models/raft.py);
  * the decoder loop is a ``lax.scan`` over a parameter-free closure
    (``flowformer_forward``) — one compiled update program for any
    iteration count;
  * LSA pads the token grid to a window multiple and folds windows into
    the batch axis (the same fold models/sam.py uses), so every attention
    is a dense batched matmul on the MXU — no gather/scatter;
  * the AGT inter-map attention reshapes [B*HW, K, D] -> [B*K, H, W, D]
    and reuses the LSA block — grouping is a layout change, not a kernel.

Weights: the published FlowFormer checkpoints cannot be fetched in this
environment (zero egress) and the reference does not vendor the torch
source, so unlike RAFT (weights/convert.py::raft_state_dict_to_flax,
oracle-parity-tested) this module ships architecture + training path only;
``flowformer_params_load``/``_save`` persist native flax params as .npz.
For published-checkpoint inference the ``FlowFormerFlow`` adapter remains
the supported path, exactly as the reference expects of its users.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .raft import (
    SepConvGRU,
    bilinear_sample,
    build_corr_pyramid,
    coords_grid,
    upsample_flow_convex,
    pad_to_multiple,
)

__all__ = [
    "FlowFormerConfig",
    "FlowFormer",
    "flowformer_forward",
    "flowformer_params_save",
    "flowformer_params_load",
    "pad_to_multiple",
]


@dataclass(frozen=True)
class FlowFormerConfig:
    # twins encoder (percostformer3.cnet/fnet='twins',
    # encoder_latent_dim=256)
    embed_dims: Tuple[int, int] = (128, 256)
    depths: Tuple[int, int] = (2, 2)
    num_heads: Tuple[int, int] = (4, 8)
    window_size: int = 7
    sr_ratios: Tuple[int, int] = (8, 4)
    mlp_ratio: int = 4
    # cost memory encoder (flowformer_config.py:26-30)
    patch_size: int = 8              # .patch_size
    cost_latent_input_dim: int = 64  # .cost_latent_input_dim
    cost_latent_token_num: int = 8   # .cost_latent_token_num
    cost_latent_dim: int = 128       # .cost_latent_dim
    cost_heads_num: int = 1          # .cost_heads_num
    encoder_depth: int = 3           # .encoder_depth
    # decoder (flowformer_config.py:63 decoder_depth=12, :41 gma='GMA')
    query_latent_dim: int = 64       # .query_latent_dim
    decoder_depth: int = 12
    hdim: int = 128                  # GRU hidden (context split, RAFT-style)
    cdim: int = 128                  # context inp dim
    use_gma: bool = True

    @property
    def encoder_latent_dim(self) -> int:
        return self.embed_dims[-1]

    @classmethod
    def sintel(cls) -> "FlowFormerConfig":
        """The reference config/flowformer_config.py values verbatim."""
        return cls()

    @classmethod
    def tiny(cls) -> "FlowFormerConfig":
        """Test-size config: same topology, minutes-not-hours compiles."""
        return cls(embed_dims=(16, 32), depths=(2, 2), num_heads=(2, 2),
                   window_size=4, sr_ratios=(4, 2), mlp_ratio=2,
                   patch_size=4, cost_latent_input_dim=16,
                   cost_latent_token_num=4, cost_latent_dim=32,
                   cost_heads_num=1, encoder_depth=1, query_latent_dim=16,
                   decoder_depth=3, hdim=16, cdim=16)


# ---------------------------------------------------------------------------
# Twins-SVT encoder pieces
# ---------------------------------------------------------------------------


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = jax.nn.gelu(x)
        return nn.Dense(self.out, name="fc2")(x)


def _window_fold(x: jnp.ndarray, ws: int):
    """[B, H, W, C] -> ([B*nh*nw, ws*ws, C], pad_h, pad_w): pad the grid to
    a window multiple and fold windows into batch (dense MXU attention)."""
    b, h, w, c = x.shape
    ph, pw = (-h) % ws, (-w) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    nh, nw = (h + ph) // ws, (w + pw) // ws
    x = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * nh * nw, ws * ws, c), ph, pw


def _window_unfold(x: jnp.ndarray, b: int, h: int, w: int, ws: int,
                   ph: int, pw: int):
    nh, nw = (h + ph) // ws, (w + pw) // ws
    x = x.reshape(b, nh, nw, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, h + ph, w + pw, -1)
    return x[:, :h, :w]


def _mhsa(q, k, v, heads: int):
    """Plain batched multi-head attention: [B, Nq, C] x [B, Nk, C]."""
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // heads
    q = q.reshape(b, nq, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, nk, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, nk, heads, d).transpose(0, 2, 1, 3)
    a = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(d))
    a = jax.nn.softmax(a, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
    return o.transpose(0, 2, 1, 3).reshape(b, nq, c)


class LocallyGroupedAttn(nn.Module):
    """Twins LSA: window-partitioned self-attention on the 2D grid."""

    dim: int
    heads: int
    ws: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, _ = x.shape
        t, ph, pw = _window_fold(x, self.ws)
        qkv = nn.Dense(3 * self.dim, name="qkv")(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = _mhsa(q, k, v, self.heads)
        o = nn.Dense(self.dim, name="proj")(o)
        return _window_unfold(o, b, h, w, self.ws, ph, pw)


class GlobalSubsampledAttn(nn.Module):
    """Twins GSA: every token attends to a stride-sr pooled key/value set."""

    dim: int
    heads: int
    sr: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        q = nn.Dense(self.dim, name="q")(x.reshape(b, h * w, c))
        kv_in = x
        if self.sr > 1:
            ph, pw = (-h) % self.sr, (-w) % self.sr
            kv_in = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            kv_in = nn.Conv(self.dim, (self.sr, self.sr),
                            strides=(self.sr, self.sr), name="sr")(kv_in)
            kv_in = nn.LayerNorm(name="sr_norm")(kv_in)
        kv = nn.Dense(2 * self.dim, name="kv")(
            kv_in.reshape(b, -1, self.dim))
        k, v = jnp.split(kv, 2, axis=-1)
        o = _mhsa(q, k, v, self.heads)
        o = nn.Dense(self.dim, name="proj")(o)
        return o.reshape(b, h, w, self.dim)


class TwinsBlock(nn.Module):
    """Pre-norm transformer block over the [B, H, W, C] grid."""

    dim: int
    heads: int
    mlp_ratio: int
    ws: int = 0   # > 0 -> LSA(ws); 0 -> GSA(sr)
    sr: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="norm1")(x)
        if self.ws > 0:
            y = LocallyGroupedAttn(self.dim, self.heads, self.ws,
                                   name="attn")(y)
        else:
            y = GlobalSubsampledAttn(self.dim, self.heads, self.sr,
                                     name="attn")(y)
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        y = Mlp(self.dim * self.mlp_ratio, self.dim, name="mlp")(y)
        return x + y


class PEG(nn.Module):
    """Twins positional-encoding generator: residual depthwise 3x3 conv."""

    dim: int

    @nn.compact
    def __call__(self, x):
        return x + nn.Conv(self.dim, (3, 3), feature_group_count=self.dim,
                           name="proj")(x)


class TwinsEncoder(nn.Module):
    """Twins-SVT first two stages (del_layers=True): 4x4 patch embed ->
    stage of [LSA, GSA, ...] blocks with a PEG after block 0, then 2x2
    embed + second stage — 1/8 resolution, embed_dims[-1] channels."""

    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3], H,W multiples of 8
        cfg = self.cfg
        for si, (dim, depth, heads, sr) in enumerate(zip(
                cfg.embed_dims, cfg.depths, cfg.num_heads, cfg.sr_ratios)):
            patch = 4 if si == 0 else 2
            x = nn.Conv(dim, (patch, patch), strides=(patch, patch),
                        name=f"patch_embed{si}")(x)
            x = nn.LayerNorm(name=f"patch_norm{si}")(x)
            for bi in range(depth):
                ws = cfg.window_size if bi % 2 == 0 else 0
                x = TwinsBlock(dim, heads, cfg.mlp_ratio, ws=ws, sr=sr,
                               name=f"stage{si}_block{bi}")(x)
                if bi == 0:
                    x = PEG(dim, name=f"stage{si}_peg")(x)
        return x


# ---------------------------------------------------------------------------
# Cost memory encoder
# ---------------------------------------------------------------------------


def _linear_pe(h: int, w: int, dim: int, name: str):
    """Linear positional encoding of the normalised (x, y) grid
    (percostformer3.pe='linear'): a Dense over [x, y, 1] coordinates."""
    ys, xs = jnp.meshgrid(jnp.linspace(-1.0, 1.0, h),
                          jnp.linspace(-1.0, 1.0, w), indexing="ij")
    coords = jnp.stack([xs, ys, jnp.ones_like(xs)], -1)  # [h, w, 3]
    return nn.Dense(dim, use_bias=False, name=name)(coords)


class CostMemoryEncoder(nn.Module):
    """cost maps [B*H1W1, H2, W2, 1] -> cost memory [B*H1W1, K, D]."""

    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, cost_maps, h1: int, w1: int):
        cfg = self.cfg
        p, k_num, d = cfg.patch_size, cfg.cost_latent_token_num, cfg.cost_latent_dim
        n, h2, w2, _ = cost_maps.shape
        b = n // (h1 * w1)

        # patchify each pixel's cost map into tokens + linear PE
        ph, pw = (-h2) % p, (-w2) % p
        x = jnp.pad(cost_maps, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = nn.Conv(cfg.cost_latent_input_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        th, tw = x.shape[1], x.shape[2]
        x = x + _linear_pe(th, tw, cfg.cost_latent_input_dim, "token_pe")
        tokens = x.reshape(n, th * tw, cfg.cost_latent_input_dim)
        tokens = nn.Dense(d, name="token_proj")(tokens)

        # perceiver-style latent summary: K learned latents cross-attend
        latents = self.param("latents", nn.initializers.normal(0.02),
                             (k_num, d))
        q = jnp.broadcast_to(latents[None], (n, k_num, d))
        y = nn.LayerNorm(name="xattn_norm")(tokens)
        q2 = nn.Dense(d, name="xattn_q")(q)
        k2 = nn.Dense(d, name="xattn_k")(y)
        v2 = nn.Dense(d, name="xattn_v")(y)
        mem = q + nn.Dense(d, name="xattn_proj")(
            _mhsa(q2, k2, v2, cfg.cost_heads_num))
        mem = mem + Mlp(d * cfg.mlp_ratio, d, name="xattn_mlp")(
            nn.LayerNorm(name="xattn_mlp_norm")(mem))

        # AGT layers: intra-cost-map self-attn over each pixel's K latents,
        # then inter-cost-map locally-grouped attention across the source
        # grid (one group per latent index — a reshape, not a new kernel)
        for li in range(cfg.encoder_depth):
            y = nn.LayerNorm(name=f"agt{li}_intra_norm")(mem)
            qkv = nn.Dense(3 * d, name=f"agt{li}_intra_qkv")(y)
            q3, k3, v3 = jnp.split(qkv, 3, axis=-1)
            mem = mem + nn.Dense(d, name=f"agt{li}_intra_proj")(
                _mhsa(q3, k3, v3, cfg.cost_heads_num))
            mem = mem + Mlp(d * cfg.mlp_ratio, d, name=f"agt{li}_intra_mlp")(
                nn.LayerNorm(name=f"agt{li}_intra_mlp_norm")(mem))

            grid = mem.reshape(b, h1, w1, k_num, d)
            grid = grid.transpose(0, 3, 1, 2, 4).reshape(b * k_num, h1, w1, d)
            grid = TwinsBlock(d, cfg.cost_heads_num, cfg.mlp_ratio,
                              ws=cfg.window_size,
                              name=f"agt{li}_inter")(grid)
            mem = grid.reshape(b, k_num, h1, w1, d).transpose(0, 2, 3, 1, 4)
            mem = mem.reshape(n, k_num, d)
        return mem


# ---------------------------------------------------------------------------
# Cost memory decoder (recurrent)
# ---------------------------------------------------------------------------


class CostQueryDecoder(nn.Module):
    """Local 9x9 cost + flow-position PE -> query -> cross-attn into the
    pixel's cost memory -> decoded cost feature [B, H1, W1, D]."""

    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, local_cost, coords_norm, memory):
        cfg = self.cfg
        b, h1, w1, _ = local_cost.shape
        d = cfg.cost_latent_dim
        q = nn.Dense(cfg.query_latent_dim, name="query_embed")(local_cost)
        pe = nn.Dense(cfg.query_latent_dim, use_bias=False,
                      name="query_pe")(coords_norm)
        q = nn.Dense(d, name="q")(jax.nn.gelu(q + pe))
        q = q.reshape(b * h1 * w1, 1, d)
        y = nn.LayerNorm(name="mem_norm")(memory)
        k = nn.Dense(d, name="k")(y)
        v = nn.Dense(d, name="v")(y)
        o = nn.Dense(d, name="proj")(_mhsa(q, k, v, cfg.cost_heads_num))
        return o.reshape(b, h1, w1, d)


class FFMotionEncoder(nn.Module):
    """[local cost, decoded cost] + flow -> motion features (dim 128,
    flow re-appended) — RAFT's motion-encoder shape with the decoded cost
    feature alongside the raw local costs."""

    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, flow, corr_feat):
        h = self.cfg.hdim  # 128 -> RAFT's 256/192/128/64/126 widths
        c = jax.nn.relu(nn.Conv(2 * h, (1, 1), name="convc1")(corr_feat))
        c = jax.nn.relu(nn.Conv(3 * h // 2, (3, 3), name="convc2")(c))
        f = jax.nn.relu(nn.Conv(h, (7, 7), name="convf1")(flow))
        f = jax.nn.relu(nn.Conv(h // 2, (3, 3), name="convf2")(f))
        out = jax.nn.relu(nn.Conv(h - 2, (3, 3), name="conv")(
            jnp.concatenate([c, f], -1)))
        return jnp.concatenate([out, flow], -1)


class GMA(nn.Module):
    """Global motion aggregation (gma='GMA'): queries/keys from context,
    values from motion features, learned-gamma residual."""

    dim: int

    @nn.compact
    def __call__(self, context, motion):
        b, h, w, _ = context.shape
        q = nn.Dense(self.dim, name="to_q")(context).reshape(b, h * w, -1)
        k = nn.Dense(self.dim, name="to_k")(context).reshape(b, h * w, -1)
        v = nn.Dense(self.dim, name="to_v")(motion).reshape(b, h * w, -1)
        a = jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(jnp.float32(self.dim))
        o = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(a, -1), v)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return motion + gamma * o.reshape(b, h, w, self.dim)


class FFUpdateBlock(nn.Module):
    """One decoder iteration: motion encode (+GMA) -> SepConvGRU ->
    (delta flow, convex-upsample mask)."""

    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, net, inp, corr_feat, flow, context):
        cfg = self.cfg
        motion = FFMotionEncoder(cfg, name="encoder")(flow, corr_feat)
        feats = [inp, motion]
        if cfg.use_gma:
            feats.append(GMA(motion.shape[-1], name="gma")(context, motion))
        net = SepConvGRU(cfg.hdim, name="gru")(
            net, jnp.concatenate(feats, -1))
        d = jax.nn.relu(nn.Conv(2 * cfg.hdim, (3, 3),
                                name="flow_head_conv1")(net))
        delta = nn.Conv(2, (3, 3), name="flow_head_conv2")(d)
        m = jax.nn.relu(nn.Conv(2 * cfg.hdim, (3, 3), name="mask_0")(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), name="mask_2")(m)
        return net, mask, delta


class FlowFormer(nn.Module):
    """Encode/update split mirroring models/raft.RAFT so
    ``flowformer_forward`` can drive the decoder with ``lax.scan``."""

    cfg: FlowFormerConfig

    def setup(self):
        self.fnet = TwinsEncoder(self.cfg, name="fnet")
        self.cnet = TwinsEncoder(self.cfg, name="cnet")
        self.memory_encoder = CostMemoryEncoder(self.cfg,
                                                name="memory_encoder")
        self.query_decoder = CostQueryDecoder(self.cfg, name="query_decoder")
        self.update_block = FFUpdateBlock(self.cfg, name="update_block")
        self.context_proj = nn.Dense(self.cfg.hdim + self.cfg.cdim,
                                     name="context_proj")

    def encode(self, image1, image2):
        """images [B, H, W, 3] in [0, 255] (H, W multiples of 8) ->
        (cost_maps [B*H1W1, H1, W1, 1], memory, net, inp, context)."""
        x = 2.0 * (jnp.concatenate([image1, image2], 0) / 255.0) - 1.0
        fmaps = self.fnet(x).astype(jnp.float32)
        f1, f2 = jnp.split(fmaps, 2, axis=0)
        cost_maps = build_corr_pyramid(f1, f2, num_levels=1)[0]
        h1, w1 = f1.shape[1], f1.shape[2]
        memory = self.memory_encoder(cost_maps, h1, w1)
        c = self.cnet(2.0 * (image1 / 255.0) - 1.0)
        ctx = self.context_proj(c)
        net = jnp.tanh(ctx[..., :self.cfg.hdim])
        inp = jax.nn.relu(ctx[..., self.cfg.hdim:])
        return cost_maps, memory, net, inp, c

    def update(self, net, inp, context, memory, cost_maps, coords0, coords1):
        b, h1, w1, _ = coords1.shape
        r = 4
        d = jnp.linspace(-r, r, 2 * r + 1, dtype=jnp.float32)
        oy, ox = jnp.meshgrid(d, d, indexing="ij")
        off = jnp.stack([ox.reshape(-1), oy.reshape(-1)], -1)
        c = coords1.reshape(b * h1 * w1, 1, 2) + off[None]
        local = bilinear_sample(cost_maps, c).reshape(b, h1, w1, -1)

        norm = jnp.asarray([max(w1 - 1, 1), max(h1 - 1, 1)], jnp.float32)
        coords_norm = 2.0 * coords1 / norm - 1.0
        decoded = self.query_decoder(
            local, coords_norm, memory)
        corr_feat = jnp.concatenate([local, decoded], -1)
        flow = coords1 - coords0
        return self.update_block(net, inp, corr_feat, flow, context)

    def __call__(self, image1, image2):
        """init-friendly full forward (one unrolled iteration); use
        ``flowformer_forward`` for real runs."""
        return flowformer_forward(self, None, image1, image2, iters=1,
                                  _bound=self)


def flowformer_forward(model: FlowFormer, variables, image1, image2,
                       iters: int = 0, _bound: FlowFormer = None,
                       return_all: bool = False):
    """Encode once, ``lax.scan`` the recurrent decoder, convex upsample.
    Returns (flow_low [B, H/8, W/8, 2], flow_up [B, H, W, 2]); with
    ``return_all`` additionally the per-iteration low-res flows
    [iters, B, H/8, W/8, 2] (RAFT-style gamma-weighted sequence loss,
    perf_r5/flowformer_functional.py)."""
    cfg = model.cfg
    iters = iters or cfg.decoder_depth

    def apply(method, *args):
        if _bound is not None:
            return method(_bound, *args)
        return model.apply(variables, *args, method=method)

    cost_maps, memory, net, inp, context = apply(
        FlowFormer.encode, image1, image2)
    b, h1, w1 = context.shape[0], context.shape[1], context.shape[2]
    coords0 = coords_grid(b, h1, w1)

    def body(carry, _):
        net, coords1 = carry
        net, mask, delta = apply(FlowFormer.update, net, inp, context,
                                 memory, cost_maps, coords0, coords1)
        c1 = coords1 + delta
        return (net, c1), (mask, c1)

    if _bound is not None:
        (net, coords1), (mask, _) = body((net, coords0), None)
        coords_all = coords1[None]
    else:
        (net, coords1), (masks, coords_all) = jax.lax.scan(
            body, (net, coords0), None, length=iters)
        mask = masks[-1]
    flow_low = coords1 - coords0
    flow_up = upsample_flow_convex(flow_low, mask)
    if return_all:
        return flow_low, flow_up, coords_all - coords0[None]
    return flow_low, flow_up


# ---------------------------------------------------------------------------
# Param persistence (native .npz — no torch layout exists to convert from)
# ---------------------------------------------------------------------------


def flowformer_params_save(path: str, params,
                           cfg: "FlowFormerConfig" = None) -> None:
    """Pass ``cfg`` to make the archive self-describing: load can then
    rebuild the right model without the caller knowing the config (the
    travelling-config pattern of weights/export.py, here as a ``__config__``
    JSON blob inside the .npz)."""
    import json as _json

    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    if cfg is not None:
        import dataclasses as _dc

        arrays["__config__"] = np.frombuffer(
            _json.dumps(_dc.asdict(cfg)).encode("utf-8"), dtype=np.uint8)
    np.savez(path, **arrays)


def flowformer_config_from_archive(path: str):
    """Read the embedded ``__config__`` blob (``flowformer_params_save``
    with cfg) back into a FlowFormerConfig, or None for older archives."""
    import json as _json

    import numpy as np

    with np.load(path) as z:
        if "__config__" not in z.files:
            return None
        d = _json.loads(bytes(z["__config__"]).decode("utf-8"))
    return FlowFormerConfig(
        **{k: tuple(v) if isinstance(v, list) else v for k, v in d.items()})


def flowformer_params_load(path: str, cfg: FlowFormerConfig = None):
    """Rebuild the params pytree from ``flowformer_params_save`` output by
    re-initialising shapes and filling from the archive (keys are
    ``jax.tree_util.keystr`` paths, stable across flax versions).  With
    ``cfg=None`` the config embedded in the archive is used (and its absence
    is an error)."""
    import numpy as np

    if cfg is None:
        cfg = flowformer_config_from_archive(path)
        if cfg is None:
            raise ValueError(
                f"{path!r} has no embedded __config__ and no cfg was given; "
                "pass cfg= or re-save with flowformer_params_save(..., cfg=)")

    model = FlowFormer(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 64, 64, 3))))
    with np.load(path) as z:
        data = dict(z)

    def fill(keypath, leaf):
        key = jax.tree_util.keystr(keypath)
        if key not in data:
            raise KeyError(f"missing param {key} in {path!r}")
        arr = jnp.asarray(data[key])
        if arr.shape != leaf.shape:
            raise ValueError(
                f"{key}: archive shape {arr.shape} != model {leaf.shape}")
        return arr

    return jax.tree_util.tree_map_with_path(fill, shapes)
