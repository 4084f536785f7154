"""XMem video-object-segmentation network in flax (TPU-native, channels-last).

The reference vendors XMem for curation-time mask propagation
(track_anything_code/tracker/model/{network,modules,resnet,cbam,
group_modules,aggregate,memory_util}.py, SURVEY §2.7): a ResNet50 key
encoder + key projection (key/shrinkage/selection), a ResNet18 value
encoder fused with image features through a CBAM block and a GRU hidden
state, an space-time memory readout (L2 attention with shrinkage/selection
and top-k softmax), and a multi-scale decoder with a GRU hidden updater.

TPU-first design decisions vs the reference:
  * channels-last NHWC; the object ("group") axis folds into batch for convs;
  * memory attention is token-major — keys ``[B, N, CK]``, queries
    ``[B, P, CK]`` — so similarity/readout are plain batched matmuls on the
    MXU instead of the reference's channel-major bmm
    (tracker/model/memory_util.py:7-80);
  * inference-only: batch norms are frozen affine transforms over the
    checkpoint's running statistics (the reference also only runs XMem in
    eval mode here, track_anything_code/tracker/base_tracker.py:36);
  * top-k softmax uses ``lax.top_k`` + scatter over the memory axis.

Weight mapping from the published ``XMem-s012.pth`` checkpoint lives in
``weights/convert.py::xmem_state_dict_to_flax``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# ImageNet normalisation applied to frames before XMem
# (reference tracker/util/range_transform.py).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_imagenet(frames_01: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] in [0,1] -> ImageNet-normalised."""
    mean = jnp.asarray(IMAGENET_MEAN, frames_01.dtype)
    std = jnp.asarray(IMAGENET_STD, frames_01.dtype)
    return (frames_01 - mean) / std


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm2d: affine over stored running statistics."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return (x * inv + (bias - mean * inv)).astype(x.dtype)


def _conv(features: int, kernel: int, stride: int = 1, use_bias: bool = False,
          name: Optional[str] = None, dilation: int = 1) -> nn.Conv:
    pad = (kernel - 1) // 2 * dilation
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=use_bias,
                   kernel_dilation=(dilation, dilation), name=name)


def _max_pool_3x3s2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class BasicBlock(nn.Module):
    """ResNet18-style block (tracker/model/resnet.py:46-75)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        r = x
        y = _conv(self.planes, 3, self.stride, name="conv1")(x)
        y = FrozenBatchNorm(name="bn1")(y)
        y = jax.nn.relu(y)
        y = _conv(self.planes, 3, name="conv2")(y)
        y = FrozenBatchNorm(name="bn2")(y)
        if self.has_downsample:
            r = _conv(self.planes, 1, self.stride, name="downsample_0")(x)
            r = FrozenBatchNorm(name="downsample_1")(r)
        return jax.nn.relu(y + r)


class Bottleneck(nn.Module):
    """ResNet50-style block, expansion 4 (tracker/model/resnet.py:78-114)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        r = x
        y = _conv(self.planes, 1, name="conv1")(x)
        y = jax.nn.relu(FrozenBatchNorm(name="bn1")(y))
        y = _conv(self.planes, 3, self.stride, name="conv2")(y)
        y = jax.nn.relu(FrozenBatchNorm(name="bn2")(y))
        y = _conv(self.planes * 4, 1, name="conv3")(y)
        y = FrozenBatchNorm(name="bn3")(y)
        if self.has_downsample:
            r = _conv(self.planes * 4, 1, self.stride, name="downsample_0")(x)
            r = FrozenBatchNorm(name="downsample_1")(r)
        return jax.nn.relu(y + r)


def _res_layer(block, planes: int, blocks: int, stride: int, in_ch: int,
               name: str):
    expansion = 4 if block is Bottleneck else 1
    layers = []
    for i in range(blocks):
        s = stride if i == 0 else 1
        needs_ds = i == 0 and (s != 1 or in_ch != planes * expansion)
        layers.append(block(planes, s, needs_ds, name=f"{name}_{i}"))
        in_ch = planes * expansion
    return layers


class KeyEncoder(nn.Module):
    """ResNet50 trunk through layer3 -> (f16:1024, f8:512, f4:256)
    (tracker/model/modules.py:153-175; key encoder trunk names its layer1
    ``res2`` in the checkpoint)."""

    @nn.compact
    def __call__(self, frame: jnp.ndarray):
        x = _conv(64, 7, 2, name="conv1")(frame)
        x = jax.nn.relu(FrozenBatchNorm(name="bn1")(x))
        x = _max_pool_3x3s2(x)
        for blk in _res_layer(Bottleneck, 64, 3, 1, 64, "res2"):
            x = blk(x)
        f4 = x
        for blk in _res_layer(Bottleneck, 128, 4, 2, 256, "layer2"):
            x = blk(x)
        f8 = x
        for blk in _res_layer(Bottleneck, 256, 6, 2, 512, "layer3"):
            x = blk(x)
        return x, f8, f4  # f16, f8, f4


class ChannelGate(nn.Module):
    """CBAM channel attention: shared MLP over avg+max pooled descriptors
    (tracker/model/cbam.py:21-48). torch names mlp.1/mlp.3 -> mlp_1/mlp_3."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mlp_1 = nn.Dense(self.channels // self.reduction, name="mlp_1")
        mlp_3 = nn.Dense(self.channels, name="mlp_3")
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        att = mlp_3(jax.nn.relu(mlp_1(avg))) + mlp_3(jax.nn.relu(mlp_1(mx)))
        return x * jax.nn.sigmoid(att)[:, None, None, :]


class SpatialGate(nn.Module):
    """CBAM spatial attention: [max;mean] over channels -> 7x7 conv
    (tracker/model/cbam.py:54-64)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = jnp.concatenate(
            [jnp.max(x, axis=-1, keepdims=True),
             jnp.mean(x, axis=-1, keepdims=True)], axis=-1)
        att = nn.Conv(1, (7, 7), padding=((3, 3), (3, 3)), use_bias=True,
                      name="spatial_conv")(pooled)
        return x * jax.nn.sigmoid(att)


class CBAM(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ChannelGate(self.channels, name="ChannelGate")(x)
        return SpatialGate(name="SpatialGate")(x)


class GroupResBlock(nn.Module):
    """relu-conv-relu-conv residual block; 3x3 shortcut when dims change
    (tracker/model/group_modules.py:36-55). Operates on folded [(B·N),H,W,C]."""

    out_dim: int

    @nn.compact
    def __call__(self, g: jnp.ndarray) -> jnp.ndarray:
        y = _conv(self.out_dim, 3, use_bias=True, name="conv1")(jax.nn.relu(g))
        y = _conv(self.out_dim, 3, use_bias=True, name="conv2")(jax.nn.relu(y))
        if g.shape[-1] != self.out_dim:
            g = _conv(self.out_dim, 3, use_bias=True, name="downsample")(g)
        return y + g


class FeatureFusionBlock(nn.Module):
    """Distribute image features over object groups, fuse with CBAM
    (tracker/model/modules.py:22-41). x: [B,h,w,Cx]; g: [B,N,h,w,Cg]."""

    mid_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
        b, n = g.shape[:2]
        g = jnp.concatenate(
            [jnp.broadcast_to(x[:, None], (b, n) + x.shape[1:]), g], axis=-1)
        g = g.reshape((b * n,) + g.shape[2:])
        g = GroupResBlock(self.mid_dim, name="block1")(g)
        r = CBAM(self.mid_dim, name="attention")(g)
        g = GroupResBlock(self.out_dim, name="block2")(g + r)
        return g.reshape((b, n) + g.shape[1:])


def _gru_update(values: jnp.ndarray, h: jnp.ndarray, hidden_dim: int):
    """XMem's GRU variant: new value before the forget gate
    (tracker/model/modules.py:64-73)."""
    forget = jax.nn.sigmoid(values[..., :hidden_dim])
    update = jax.nn.sigmoid(values[..., hidden_dim:hidden_dim * 2])
    new_value = jnp.tanh(values[..., hidden_dim * 2:])
    return forget * h * (1.0 - update) + update * new_value


class HiddenReinforcer(nn.Module):
    """Single GRU in the value encoder (tracker/model/modules.py:77-99)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, g: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        b, n = g.shape[:2]
        gh = jnp.concatenate([g, h], axis=-1).reshape((b * n,) + g.shape[2:-1] + (-1,))
        values = _conv(self.hidden_dim * 3, 3, use_bias=True, name="transform")(gh)
        return _gru_update(values.reshape((b, n) + values.shape[1:]), h,
                           self.hidden_dim)


class HiddenUpdater(nn.Module):
    """Multi-scale feature GRU in the decoder (tracker/model/modules.py:44-74).
    g16/g8/g4 come at strides 16/8/4; g8/g4 are area-downsampled to /16."""

    mid_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, g16, g8, g4, h):
        b, n = g16.shape[:2]

        def fold(g):
            return g.reshape((b * n,) + g.shape[2:])

        def area_down(g, factor):
            return nn.avg_pool(g, (factor, factor), strides=(factor, factor))

        g = (_conv(self.mid_dim, 1, use_bias=True, name="g16_conv")(fold(g16))
             + _conv(self.mid_dim, 1, use_bias=True, name="g8_conv")(
                 area_down(fold(g8), 2))
             + _conv(self.mid_dim, 1, use_bias=True, name="g4_conv")(
                 area_down(fold(g4), 4)))
        gh = jnp.concatenate([g, fold(h)], axis=-1)
        values = _conv(self.hidden_dim * 3, 3, use_bias=True, name="transform")(gh)
        return _gru_update(values.reshape((b, n) + values.shape[1:]), h,
                           self.hidden_dim)


class ValueEncoder(nn.Module):
    """ResNet18 trunk over [image; mask; other-masks] fused with key features
    (tracker/model/modules.py:102-150)."""

    value_dim: int = 512
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, image, image_feat_f16, h, masks, others,
                 is_deep_update: bool = True):
        b, n = masks.shape[:2]
        g = jnp.stack([masks, others], axis=-1)  # [B,N,H,W,2]
        img = jnp.broadcast_to(image[:, None], (b, n) + image.shape[1:])
        g = jnp.concatenate([img, g], axis=-1).reshape(
            (b * n,) + image.shape[1:-1] + (5,))

        g = _conv(64, 7, 2, name="conv1")(g)
        g = FrozenBatchNorm(name="bn1")(g)
        g = jax.nn.relu(_max_pool_3x3s2(g))
        for blk in _res_layer(BasicBlock, 64, 2, 1, 64, "layer1"):
            g = blk(g)
        for blk in _res_layer(BasicBlock, 128, 2, 2, 64, "layer2"):
            g = blk(g)
        for blk in _res_layer(BasicBlock, 256, 2, 2, 128, "layer3"):
            g = blk(g)

        g = g.reshape((b, n) + g.shape[1:])
        g = FeatureFusionBlock(self.value_dim, self.value_dim, name="fuser")(
            image_feat_f16, g)
        if is_deep_update:
            h = HiddenReinforcer(self.hidden_dim, name="hidden_reinforce")(g, h)
        return g, h


class KeyProjection(nn.Module):
    """f16 -> (key, shrinkage=d²+1, selection=sigmoid(e))
    (tracker/model/modules.py:194-211)."""

    key_dim: int = 64

    @nn.compact
    def __call__(self, x, need_s: bool = True, need_e: bool = True):
        key = _conv(self.key_dim, 3, use_bias=True, name="key_proj")(x)
        shrinkage = selection = None
        if need_s:
            d = _conv(1, 3, use_bias=True, name="d_proj")(x)
            shrinkage = jnp.square(d) + 1.0
        if need_e:
            e = _conv(self.key_dim, 3, use_bias=True, name="e_proj")(x)
            selection = jax.nn.sigmoid(e)
        return key, shrinkage, selection


def _bilinear_up(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """F.interpolate(..., mode='bilinear', align_corners=False) == half-pixel
    resize (jax.image 'linear')."""
    b = x.shape[0]
    h, w = x.shape[-3], x.shape[-2]
    return jax.image.resize(x, x.shape[:-3] + (h * factor, w * factor,
                                               x.shape[-1]), method="linear")


class UpsampleBlock(nn.Module):
    """skip conv + 2x bilinear-upsampled groups + GroupResBlock
    (tracker/model/modules.py:178-191)."""

    up_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, skip_f, up_g):
        b, n = up_g.shape[:2]
        skip = _conv(self.up_dim, 3, use_bias=True, name="skip_conv")(skip_f)
        g = _bilinear_up(up_g.reshape((b * n,) + up_g.shape[2:]), 2)
        g = g + jnp.broadcast_to(skip[:, None], (b, n) + skip.shape[1:]
                                 ).reshape((b * n,) + skip.shape[1:])
        g = GroupResBlock(self.out_dim, name="out_conv")(g)
        return g.reshape((b, n) + g.shape[1:])


class Decoder(nn.Module):
    """Memory readout + hidden -> logits at full resolution
    (tracker/model/modules.py:214-250)."""

    value_dim: int = 512
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, f16, f8, f4, hidden_state, memory_readout,
                 h_out: bool = True):
        b, n = memory_readout.shape[:2]
        g16 = FeatureFusionBlock(512, 512, name="fuser")(
            f16, jnp.concatenate([memory_readout, hidden_state], axis=-1))
        g8 = UpsampleBlock(512, 256, name="up_16_8")(f8, g16)
        g4 = UpsampleBlock(256, 256, name="up_8_4")(f4, g8)
        logits = _conv(1, 3, use_bias=True, name="pred")(
            jax.nn.relu(g4.reshape((b * n,) + g4.shape[2:])))
        if h_out:
            g4_cat = jnp.concatenate(
                [g4, logits.reshape((b, n) + logits.shape[1:])], axis=-1)
            hidden_state = HiddenUpdater(256, self.hidden_dim,
                                         name="hidden_update")(g16, g8, g4_cat,
                                                               hidden_state)
        else:
            hidden_state = None
        logits = _bilinear_up(logits, 4)
        return hidden_state, logits.reshape((b, n) + logits.shape[1:-1])


def aggregate(prob: jnp.ndarray, axis: int, return_logits: bool = False):
    """STM soft-aggregation with an implicit background channel
    (tracker/model/aggregate.py)."""
    bg = jnp.prod(1.0 - prob, axis=axis, keepdims=True)
    new_prob = jnp.clip(jnp.concatenate([bg, prob], axis=axis), 1e-7, 1 - 1e-7)
    logits = jnp.log(new_prob / (1.0 - new_prob))
    prob = jax.nn.softmax(logits, axis=axis)
    if return_logits:
        return logits, prob
    return prob


# ---------------------------------------------------------------------------
# Memory attention math — token-major ([B, N, C]) batched matmuls.
# Reference: tracker/model/memory_util.py.
# ---------------------------------------------------------------------------

def key_similarity(mk: jnp.ndarray, ms: Optional[jnp.ndarray],
                   qk: jnp.ndarray, qe: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Negative (selection-weighted) squared L2 similarity.

    mk: [B, N, CK] memory keys;   ms: [B, N] shrinkage or None;
    qk: [B, P, CK] query keys;    qe: [B, P, CK] selection or None.
    Returns [B, P, N] (query-major; the memory axis is last so top-k softmax
    and the readout matmul run along the minor dimension).
    """
    ck = mk.shape[-1]
    if qe is not None:
        a_sq = jnp.einsum("bpc,bnc->bpn", qe, jnp.square(mk))
        two_ab = 2.0 * jnp.einsum("bpc,bnc->bpn", qk * qe, mk)
        b_sq = jnp.sum(qe * jnp.square(qk), axis=-1, keepdims=True)
        sim = -a_sq + two_ab - b_sq
    else:
        a_sq = jnp.sum(jnp.square(mk), axis=-1)[:, None, :]
        two_ab = 2.0 * jnp.einsum("bpc,bnc->bpn", qk, mk)
        sim = -a_sq + two_ab
    if ms is not None:
        sim = sim * ms[:, None, :]
    return sim / math.sqrt(ck)


def topk_softmax(sim: jnp.ndarray, top_k: Optional[int] = None,
                 valid_n: Optional[jnp.ndarray] = None,
                 return_usage: bool = False):
    """Softmax over the memory axis (last), keeping only the top-k entries
    (tracker/model/memory_util.py:41-65).  ``valid_n`` masks out padded
    memory slots (static-shape jit-friendliness: memory buffers are padded)."""
    n = sim.shape[-1]
    if valid_n is not None:
        mask = jnp.arange(n) < valid_n
        sim = jnp.where(mask, sim, -jnp.inf)
    if top_k is not None and top_k < n:
        vals, idx = jax.lax.top_k(sim, top_k)
        w = jax.nn.softmax(vals, axis=-1)
        affinity = jnp.zeros_like(sim).at[
            jnp.arange(sim.shape[0])[:, None, None],
            jnp.arange(sim.shape[1])[None, :, None], idx].set(w)
    else:
        affinity = jax.nn.softmax(sim, axis=-1)
        if valid_n is not None:
            affinity = jnp.where(mask, affinity, 0.0)
    if return_usage:
        return affinity, jnp.sum(affinity, axis=1)  # usage per memory slot
    return affinity


def memory_readout(affinity: jnp.ndarray, mv: jnp.ndarray) -> jnp.ndarray:
    """[B,P,N] x [B,N,CV] -> [B,P,CV] (tracker/model/memory_util.py:73-80)."""
    return jnp.einsum("bpn,bnc->bpc", affinity, mv)


class XMem(nn.Module):
    """Top-level XMem (tracker/model/network.py:17-132), inference surface:
    ``encode_key`` / ``encode_value`` / ``read_memory`` / ``segment``."""

    key_dim: int = 64
    value_dim: int = 512
    hidden_dim: int = 64

    def setup(self):
        self.key_encoder = KeyEncoder()
        self.key_proj = KeyProjection(self.key_dim)
        self.value_encoder = ValueEncoder(self.value_dim, self.hidden_dim)
        self.decoder = Decoder(self.value_dim, self.hidden_dim)

    def encode_key(self, frame, need_sk: bool = True, need_ek: bool = True):
        """frame [B,H,W,3] -> key/shrinkage/selection at /16 + f16/f8/f4."""
        f16, f8, f4 = self.key_encoder(frame)
        key, shrinkage, selection = self.key_proj(f16, need_sk, need_ek)
        return key, shrinkage, selection, f16, f8, f4

    def encode_value(self, frame, image_feat_f16, h16, masks,
                     is_deep_update: bool = True):
        """masks [B,N,H,W] -> value [B,N,h,w,CV], new hidden.

        The "others" channel is the sum of all other objects' masks
        (network.py:72-85)."""
        n = masks.shape[1]
        if n == 1:
            others = jnp.zeros_like(masks)
        else:
            total = jnp.sum(masks, axis=1, keepdims=True)
            others = total - masks
        return self.value_encoder(frame, image_feat_f16, h16, masks, others,
                                  is_deep_update)

    def read_memory(self, query_key, query_selection, memory_key,
                    memory_shrinkage, memory_value, top_k: Optional[int] = None):
        """Training-style single-group readout.

        query_key [B,P,CK], memory_key [B,N,CK], memory_value [B,num_obj,N,CV]
        -> [B,num_obj,P,CV]."""
        affinity = topk_softmax(
            key_similarity(memory_key, memory_shrinkage, query_key,
                           query_selection), top_k)
        return jnp.einsum("bpn,bonc->bopc", affinity, memory_value)

    def segment(self, f16, f8, f4, memory_readout_g, hidden_state,
                h_out: bool = True, strip_bg: bool = True, selector=None):
        """memory_readout_g [B,N,h,w,CV] -> (hidden, logits, prob).

        ``selector`` [B,N] or [B,N,1,1]: live-object mask applied to the
        per-object probabilities before aggregation (training-time path,
        network.py:112-113 — dead channels must not steal probability
        from the background)."""
        hidden_state, logits = self.decoder(f16, f8, f4, hidden_state,
                                            memory_readout_g, h_out=h_out)
        prob = jax.nn.sigmoid(logits)
        if selector is not None:
            prob = prob * jnp.reshape(selector, selector.shape[:2] + (1, 1))
        logits, prob = aggregate(prob, axis=1, return_logits=True)
        if strip_bg:
            prob = prob[:, 1:]
        return hidden_state, logits, prob
