"""RAFT optical flow in flax — TPU-native, channels-last.

The reference's trajectory generator and motion statistics run on dense
optical flow from a user-vendored FlowFormer (scripts/generate_traj.py:20-26
imports ``flowformer_code`` which is NOT in the reference repo; the user
must supply code + checkpoint).  This module gives the framework a flow
network of its own: RAFT (Teed & Deng, ECCV 2020) — the architecture
FlowFormer itself builds on (FlowFormer reuses RAFT's correlation lookup
and recurrent decoder) — implemented from scratch in flax so the widely
published ``raft-things.pth`` / ``raft-sintel.pth`` checkpoints run
natively on TPU.  The FlowFormer adapter (curation/detectors.FlowFormerFlow)
remains for users who vendor the original, exactly as the reference expects.

Architecture (original princeton-vl/RAFT "large" model):
  * feature encoder ``fnet`` — residual CNN, instance norm, 1/8 resolution,
    256-d output, shared weights across both frames;
  * context encoder ``cnet`` — same topology with (eval-mode) batch norm,
    split into GRU hidden state (tanh) and context features (relu);
  * all-pairs 4D correlation volume, 4-level average-pooled pyramid,
    radius-4 bilinear lookup around the current flow estimate;
  * recurrent update block — motion encoder, separable ConvGRU
    (1x5 then 5x1), flow head, and a 64x9 convex-upsampling mask head.

TPU-first notes:
  * channels-last NHWC; fp32 throughout (offline curation tooling — the
    correlation volume and GRU recurrence are precision-sensitive);
  * the iteration loop is a ``lax.scan`` over a parameter-free update
    closure (``raft_forward``), so ``iters`` is static and the trace stays
    compact;
  * the correlation lookup's bilinear sampling is 4 batched gathers per
    pyramid level (``take_along_axis`` on the flattened volume) — exactly
    grid_sample(align_corners=True, zeros padding) semantics;
  * convex upsampling is one einsum over the unfolded 3x3 neighbourhood.

Weight mapping from official checkpoints: ``weights/convert.py::
raft_state_dict_to_flax`` (+ ``RAFTConfig.from_state_dict`` shape
inference).  Parity: tests/test_raft.py vs tests/raft_oracle.py (torch,
official state-dict layout), same scheme as test_sam/test_yolo/test_xmem.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .xmem import FrozenBatchNorm


@dataclass(frozen=True)
class RAFTConfig:
    enc_dims: Tuple[int, int, int, int] = (64, 64, 96, 128)  # stem, layer1-3
    fdim: int = 256       # fnet output dim
    hdim: int = 128       # GRU hidden dim
    cdim: int = 128       # context dim
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12       # update iterations (RAFT's small-model default 12;
    #                       the official demos use 20 — override per call)
    me_c1: int = 256      # motion-encoder widths (convc1/convc2/convf1/convf2)
    me_c2: int = 192
    me_f1: int = 128
    me_f2: int = 64
    motion_dim: int = 128  # motion feature dim (conv emits motion_dim-2 + flow)
    fh_dim: int = 256      # flow-head hidden
    mask_dim: int = 256    # upsample-mask-head hidden

    @property
    def corr_planes(self) -> int:
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2

    @classmethod
    def large(cls) -> "RAFTConfig":
        """Checkpoint-compatible raft-things/sintel/kitti config."""
        return cls()

    @classmethod
    def tiny(cls) -> "RAFTConfig":
        """Test-size config (same topology, ~1000x fewer FLOPs)."""
        return cls(enc_dims=(8, 8, 12, 16), fdim=16, hdim=16, cdim=16,
                   corr_levels=2, corr_radius=2, iters=3,
                   me_c1=24, me_c2=16, me_f1=12, me_f2=8, motion_dim=16,
                   fh_dim=16, mask_dim=16)

    @classmethod
    def from_state_dict(cls, sd, corr_levels: int = 4) -> "RAFTConfig":
        """Infer every width from an official checkpoint's shapes."""
        import numpy as np

        def shape(k):
            return np.asarray(sd[k]).shape

        d0 = shape("fnet.conv1.weight")[0]
        d1 = shape("fnet.layer1.0.conv1.weight")[0]
        d2 = shape("fnet.layer2.0.conv1.weight")[0]
        d3 = shape("fnet.layer3.0.conv1.weight")[0]
        fdim = shape("fnet.conv2.weight")[0]
        hdim = shape("update_block.flow_head.conv1.weight")[1]
        cdim = shape("cnet.conv2.weight")[0] - hdim
        corr_planes = shape("update_block.encoder.convc1.weight")[1]
        k2 = corr_planes // corr_levels
        radius = (int(round(k2 ** 0.5)) - 1) // 2
        me_c1 = shape("update_block.encoder.convc1.weight")[0]
        me_c2 = shape("update_block.encoder.convc2.weight")[0]
        me_f1 = shape("update_block.encoder.convf1.weight")[0]
        me_f2 = shape("update_block.encoder.convf2.weight")[0]
        motion_dim = shape("update_block.encoder.conv.weight")[0] + 2
        fh_dim = shape("update_block.flow_head.conv1.weight")[0]
        mask_dim = shape("update_block.mask.0.weight")[0]
        return cls(enc_dims=(d0, d1, d2, d3), fdim=fdim, hdim=hdim,
                   cdim=cdim, corr_levels=corr_levels, corr_radius=radius,
                   me_c1=me_c1, me_c2=me_c2, me_f1=me_f1, me_f2=me_f2,
                   motion_dim=motion_dim, fh_dim=fh_dim, mask_dim=mask_dim)


def _conv(features: int, kernel, stride: int = 1, name=None) -> nn.Conv:
    """torch-default Conv2d (bias=True) with symmetric padding (k-1)//2."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel)
    return nn.Conv(features, kernel, strides=(stride, stride), padding=pad,
                   name=name)


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.InstanceNorm2d defaults: per-sample per-channel over H,W,
    affine=False (no parameters — matches the official checkpoints, whose
    fnet norms contribute no state-dict entries)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ResidualBlock(nn.Module):
    """RAFT encoder residual block: two 3x3 convs (norm+relu after each),
    1x1 strided downsample shortcut when stride != 1."""

    planes: int
    stride: int
    norm: str  # 'instance' | 'batch'

    def _norm(self, name: str, x):
        if self.norm == "batch":
            return FrozenBatchNorm(name=name)(x)
        return _instance_norm(x)

    @nn.compact
    def __call__(self, x):
        y = _conv(self.planes, 3, self.stride, name="conv1")(x)
        y = jax.nn.relu(self._norm("norm1", y))
        y = _conv(self.planes, 3, 1, name="conv2")(y)
        y = jax.nn.relu(self._norm("norm2", y))
        if self.stride != 1:
            x = _conv(self.planes, 1, self.stride, name="downsample_0")(x)
            x = self._norm("downsample_1", x)
        return jax.nn.relu(x + y)


class BasicEncoder(nn.Module):
    """fnet/cnet: 7x7 stride-2 stem + three 2-block stages (1/8 res) + 1x1."""

    cfg: RAFTConfig
    out_dim: int
    norm: str

    @nn.compact
    def __call__(self, x):
        d0, d1, d2, d3 = self.cfg.enc_dims
        x = _conv(d0, 7, 2, name="conv1")(x)
        if self.norm == "batch":
            x = FrozenBatchNorm(name="norm1")(x)
        else:
            x = _instance_norm(x)
        x = jax.nn.relu(x)
        for i, (d, s) in enumerate(((d1, 1), (d2, 2), (d3, 2)), start=1):
            x = ResidualBlock(d, s, self.norm, name=f"layer{i}_0")(x)
            x = ResidualBlock(d, 1, self.norm, name=f"layer{i}_1")(x)
        return _conv(self.out_dim, 1, 1, name="conv2")(x)


class BasicMotionEncoder(nn.Module):
    """corr + flow -> motion features (motion_dim, flow re-appended)."""

    cfg: RAFTConfig

    @nn.compact
    def __call__(self, flow, corr):
        cfg = self.cfg
        cor = jax.nn.relu(_conv(cfg.me_c1, 1, name="convc1")(corr))
        cor = jax.nn.relu(_conv(cfg.me_c2, 3, name="convc2")(cor))
        flo = jax.nn.relu(_conv(cfg.me_f1, 7, name="convf1")(flow))
        flo = jax.nn.relu(_conv(cfg.me_f2, 3, name="convf2")(flo))
        out = jax.nn.relu(_conv(cfg.motion_dim - 2, 3, name="conv")(
            jnp.concatenate([cor, flo], -1)))
        return jnp.concatenate([out, flow], -1)


class SepConvGRU(nn.Module):
    """Separable ConvGRU: a horizontal (1x5) pass then a vertical (5x1)."""

    hidden: int

    @nn.compact
    def __call__(self, h, x):
        for suffix, kernel in (("1", (1, 5)), ("2", (5, 1))):
            hx = jnp.concatenate([h, x], -1)
            z = jax.nn.sigmoid(_conv(self.hidden, kernel, name=f"convz{suffix}")(hx))
            r = jax.nn.sigmoid(_conv(self.hidden, kernel, name=f"convr{suffix}")(hx))
            q = jnp.tanh(_conv(self.hidden, kernel, name=f"convq{suffix}")(
                jnp.concatenate([r * h, x], -1)))
            h = (1 - z) * h + z * q
        return h


class BasicUpdateBlock(nn.Module):
    """One RAFT iteration: motion encode -> GRU -> (delta flow, up mask)."""

    cfg: RAFTConfig

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        cfg = self.cfg
        motion = BasicMotionEncoder(cfg, name="encoder")(flow, corr)
        net = SepConvGRU(cfg.hdim, name="gru")(
            net, jnp.concatenate([inp, motion], -1))
        d = jax.nn.relu(_conv(cfg.fh_dim, 3, name="flow_head_conv1")(net))
        delta = _conv(2, 3, name="flow_head_conv2")(d)
        m = jax.nn.relu(_conv(cfg.mask_dim, 3, name="mask_0")(net))
        mask = 0.25 * _conv(64 * 9, 1, name="mask_2")(m)
        return net, mask, delta


class RAFT(nn.Module):
    """Expose encode (parameters) separately from the parameter-free
    iteration math so ``raft_forward`` can drive the update loop with
    ``lax.scan`` (same encode/iterate split as models/sam.Sam)."""

    cfg: RAFTConfig

    def setup(self):
        self.fnet = BasicEncoder(self.cfg, self.cfg.fdim, "instance",
                                 name="fnet")
        self.cnet = BasicEncoder(self.cfg, self.cfg.hdim + self.cfg.cdim,
                                 "batch", name="cnet")
        self.update_block = BasicUpdateBlock(self.cfg, name="update_block")

    def encode(self, image1, image2):
        """images [B, H, W, 3] in [0, 255] (H, W multiples of 8) ->
        (f1, f2 [B, H/8, W/8, fdim] fp32, net, inp)."""
        x = 2.0 * (jnp.concatenate([image1, image2], 0) / 255.0) - 1.0
        fmaps = self.fnet(x).astype(jnp.float32)
        f1, f2 = jnp.split(fmaps, 2, axis=0)
        c = self.cnet(2.0 * (image1 / 255.0) - 1.0)
        net = jnp.tanh(c[..., :self.cfg.hdim])
        inp = jax.nn.relu(c[..., self.cfg.hdim:])
        return f1, f2, net, inp

    def update(self, net, inp, corr, flow):
        return self.update_block(net, inp, corr, flow)

    def __call__(self, image1, image2, iters: int = 0):
        """init-friendly full forward (small static iteration count when
        tracing for parameter shapes; use ``raft_forward`` for real runs)."""
        return raft_forward(self, None, image1, image2,
                            iters or self.cfg.iters, _bound=self)


# --------------------------------------------------------------------------
# Parameter-free correlation / upsampling math
# --------------------------------------------------------------------------


def build_corr_pyramid(f1: jnp.ndarray, f2: jnp.ndarray,
                       num_levels: int) -> Tuple[jnp.ndarray, ...]:
    """All-pairs correlation, scaled 1/sqrt(D), average-pooled pyramid.
    Returns per level [B*H*W, H/2^i, W/2^i, 1] fp32 (query-major layout —
    each query pixel owns a little correlation image to sample from)."""
    b, h, w, d = f1.shape
    # precision pinned: TPU default matmul precision would run this in
    # bf16 passes, and the correlation values steer sub-pixel lookups —
    # the one matmul here that cannot tolerate truncation (it is tiny:
    # (HW/64)^2 x fdim at 1/8 resolution)
    corr = jnp.einsum("bpd,bqd->bpq", f1.reshape(b, h * w, d),
                      f2.reshape(b, h * w, d),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    corr = corr / jnp.sqrt(jnp.float32(d))
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
        pyramid.append(corr)
    return tuple(pyramid)


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """grid_sample(align_corners=True, padding='zeros') in pixel coords.
    img [N, H, W, 1], coords [N, K, 2] (x, y) -> [N, K]."""
    n, h, w, _ = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    flat = img.reshape(n, h * w)
    out = 0.0
    for xi, wx in ((x0, x0 + 1 - x), (x0 + 1, x - x0)):
        for yi, wy in ((y0, y0 + 1 - y), (y0 + 1, y - y0)):
            valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            v = jnp.take_along_axis(flat, yc * w + xc, axis=1)
            out = out + v * (wx * wy * valid)
    return out


def lookup_corr(pyramid: Sequence[jnp.ndarray], coords: jnp.ndarray,
                radius: int) -> jnp.ndarray:
    """Sample a (2r+1)^2 window around coords/2^i at every level.
    coords [B, H, W, 2] (x, y) -> [B, H, W, levels*(2r+1)^2].

    Window enumeration replicates the official CorrBlock exactly: delta =
    stack(meshgrid(dy, dx), -1), whose first component (added to x) varies
    along the window's ROW axis — dx/dy ranges are identical so the values
    agree, but the 81-channel order is the transpose of the natural one and
    the checkpoint's convc1 weights expect precisely this order."""
    b, h, w, _ = coords.shape
    r = radius
    d = jnp.linspace(-r, r, 2 * r + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(d, d, indexing="ij")  # transpose quirk: see above
    off = jnp.stack([oy.reshape(-1), ox.reshape(-1)], -1)  # [(2r+1)^2, 2]
    flat_coords = coords.reshape(b * h * w, 1, 2)
    out = []
    for i, corr in enumerate(pyramid):
        c = flat_coords / (2.0 ** i) + off[None]
        out.append(bilinear_sample(corr, c).reshape(b, h, w, -1))
    return jnp.concatenate(out, -1)


def coords_grid(b: int, h: int, w: int) -> jnp.ndarray:
    """[B, H, W, 2] pixel-centre grid, (x, y) channel order."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.broadcast_to(jnp.stack([xs, ys], -1)[None], (b, h, w, 2))


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex combination of the 3x3 neighbourhood of 8*flow under the
    softmax(9)-normalised learned mask; 8x upsampling.
    flow [B, H, W, 2], mask [B, H, W, 64*9] -> [B, 8H, 8W, 2]."""
    b, h, w, _ = flow.shape
    m = jax.nn.softmax(mask.reshape(b, h, w, 9, 8, 8), axis=3)
    f = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # unfold 3x3: k = ky*3+kx (row-major), value flow[y-1+ky, x-1+kx]
    uf = jnp.stack([f[:, ky:ky + h, kx:kx + w, :]
                    for ky in range(3) for kx in range(3)], axis=3)
    up = jnp.einsum("bhwkuv,bhwkc->bhuwvc", m, uf)
    return up.reshape(b, 8 * h, 8 * w, 2)


def raft_forward(model: RAFT, variables, image1, image2, iters: int = 12,
                 _bound: RAFT = None):
    """Full flow estimate: encode once, ``lax.scan`` the update block, convex
    upsample.  Returns (flow_low [B, H/8, W/8, 2], flow_up [B, H, W, 2])."""
    cfg = model.cfg

    def apply(method, *args):
        if _bound is not None:  # already inside module.init/apply
            return method(_bound, *args)
        return model.apply(variables, *args, method=method)

    f1, f2, net, inp = apply(RAFT.encode, image1, image2)
    pyramid = build_corr_pyramid(f1, f2, cfg.corr_levels)
    b, h8, w8, _ = f1.shape
    coords0 = coords_grid(b, h8, w8)

    def body(carry, _):
        net, coords1 = carry
        corr = lookup_corr(pyramid, coords1, cfg.corr_radius)
        flow = coords1 - coords0
        net, mask, delta = apply(RAFT.update, net, inp, corr, flow)
        return (net, coords1 + delta), mask

    if _bound is not None:
        # init trace: one unrolled step is enough to create every parameter
        (net, coords1), mask = body((net, coords0), None)
    else:
        (net, coords1), masks = jax.lax.scan(
            body, (net, coords0), None, length=iters)
        mask = masks[-1]
    flow_low = coords1 - coords0
    return flow_low, upsample_flow_convex(flow_low, mask)


def pad_to_multiple(img: "np.ndarray", multiple: int = 8):
    """Sintel-style InputPadder (left/right split, top-heavy vertical),
    replicate padding.  img [H, W, C] numpy -> (padded, (top, left, H, W))."""
    import numpy as np

    h, w = img.shape[:2]
    ph, pw = (-h) % multiple, (-w) % multiple
    top, left = ph // 2, pw // 2
    out = np.pad(img, ((top, ph - top), (left, pw - left), (0, 0)),
                 mode="edge")
    return out, (top, left, h, w)
