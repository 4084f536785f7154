"""YOLOv8 detector in flax — TPU-native, channels-last.

The reference's curation auto-labeler detects the robot gripper with an
ultralytics YOLOv8 model (custom weights, curation_pipeline/
select_frame_with_this_that.py:384-385; SURVEY §2.2).  This module
reimplements the YOLOv8 detection architecture from scratch so those
checkpoints run natively on TPU with no ultralytics/torch in the inference
loop: CSP backbone (Conv/C2f/SPPF), PAN-FPN head, decoupled Detect head
with Distribution Focal Loss (DFL) box regression.

TPU-first notes:
  * channels-last NHWC; eval-mode BatchNorm folds to an affine
    (models/xmem.FrozenBatchNorm — curation only ever runs eval);
  * the DFL expectation (softmax over ``reg_max`` bins x arange) is a
    closed-form einsum, not the official fixed-weight conv;
  * box decode (anchors + strides + dist2bbox) happens inside the jitted
    forward so one device call returns [B, N, 4+nc] predictions;
  * NMS and letterboxing are tiny host-side numpy (as in ultralytics).

Weight mapping from ultralytics ``.pt`` checkpoints lives in
``weights/convert.py::yolo_state_dict_to_flax`` +
``load_ultralytics_state_dict`` (a shell-unpickler — no ultralytics
package needed even at convert time).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .xmem import FrozenBatchNorm


def _make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(x + divisor / 2) // divisor * divisor)


@dataclass(frozen=True)
class YOLOv8Config:
    """Scale hyperparameters (ultralytics yolov8.yaml ``scales`` table)."""

    nc: int = 1  # the gripper detector is single-class
    depth: float = 0.33
    width: float = 0.25
    max_channels: int = 1024
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)

    def ch(self, base: int) -> int:
        return _make_divisible(min(base, self.max_channels) * self.width)

    def n(self, base: int) -> int:
        return max(round(base * self.depth), 1)

    @classmethod
    def n_scale(cls, nc: int = 1) -> "YOLOv8Config":
        return cls(nc=nc)

    @classmethod
    def s_scale(cls, nc: int = 1) -> "YOLOv8Config":
        return cls(nc=nc, width=0.50)

    @classmethod
    def m_scale(cls, nc: int = 1) -> "YOLOv8Config":
        return cls(nc=nc, depth=0.67, width=0.75, max_channels=768)

    @classmethod
    def tiny(cls, nc: int = 1) -> "YOLOv8Config":
        """Test-size: half-width n with a 4-bin DFL."""
        return cls(nc=nc, width=0.125, reg_max=4)

    @classmethod
    def from_state_dict(cls, sd) -> "YOLOv8Config":
        """Infer (nc, depth, width, max_channels, reg_max) from an
        ultralytics state dict — robust to custom-trained models."""
        import numpy as np

        w0 = np.asarray(sd["model.0.conv.weight"]).shape[0]
        width = w0 / 64.0
        n2 = len({k.split(".")[3] for k in sd if k.startswith("model.2.m.")})
        depth = n2 / 3.0
        nc = np.asarray(sd["model.22.cv3.0.2.weight"]).shape[0]
        reg_max = np.asarray(sd["model.22.cv2.0.2.weight"]).shape[0] // 4
        c5 = np.asarray(sd["model.9.cv2.conv.weight"]).shape[0]
        for mc in (1024, 768, 512):
            if _make_divisible(min(1024, mc) * width) == c5:
                max_channels = mc
                break
        else:
            max_channels = 1024
        return cls(nc=int(nc), depth=depth, width=width,
                   max_channels=max_channels, reg_max=int(reg_max))


class ConvBNSiLU(nn.Module):
    """ultralytics ``Conv``: Conv2d (no bias) + BN(eps 1e-3) + SiLU."""

    features: int
    kernel: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=pad, use_bias=False, name="conv")(x)
        x = FrozenBatchNorm(eps=1e-3, name="bn")(x)
        return jax.nn.silu(x)


class Bottleneck(nn.Module):
    """C2f bottleneck: two 3x3 convs, optional residual (e=1.0)."""

    features: int
    shortcut: bool

    @nn.compact
    def __call__(self, x):
        y = ConvBNSiLU(self.features, 3, name="cv1")(x)
        y = ConvBNSiLU(self.features, 3, name="cv2")(y)
        return x + y if self.shortcut else y


class C2f(nn.Module):
    """Cross-stage partial with 2 splits + n bottlenecks, all concatenated."""

    features: int
    n: int
    shortcut: bool

    @nn.compact
    def __call__(self, x):
        c = self.features // 2
        y = ConvBNSiLU(2 * c, 1, name="cv1")(x)
        parts = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            parts.append(
                Bottleneck(c, self.shortcut, name=f"m_{i}")(parts[-1]))
        return ConvBNSiLU(self.features, 1, name="cv2")(
            jnp.concatenate(parts, axis=-1))


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 stride-1 maxpools."""

    features: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 2
        x = ConvBNSiLU(c, 1, name="cv1")(x)
        outs = [x]
        for _ in range(3):
            outs.append(nn.max_pool(
                outs[-1], (5, 5), strides=(1, 1), padding=((2, 2), (2, 2))))
        return ConvBNSiLU(self.features, 1, name="cv2")(
            jnp.concatenate(outs, axis=-1))


def _upsample2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class Detect(nn.Module):
    """Decoupled head + DFL decode (ultralytics ``Detect`` inference path).

    Returns [B, N, 4+nc]: xywh boxes in input-image pixels + class
    probabilities (sigmoid)."""

    cfg: YOLOv8Config
    ch3: int  # P3 channel count (sizes the head widths, official rule)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cfg = self.cfg
        c2 = max(16, self.ch3 // 4, cfg.reg_max * 4)
        c3 = max(self.ch3, min(cfg.nc, 100))
        outs = []
        for i, f in enumerate(feats):
            box = ConvBNSiLU(c2, 3, name=f"cv2_{i}_0")(f)
            box = ConvBNSiLU(c2, 3, name=f"cv2_{i}_1")(box)
            box = nn.Conv(4 * cfg.reg_max, (1, 1), name=f"cv2_{i}_2")(box)
            cls = ConvBNSiLU(c3, 3, name=f"cv3_{i}_0")(f)
            cls = ConvBNSiLU(c3, 3, name=f"cv3_{i}_1")(cls)
            cls = nn.Conv(cfg.nc, (1, 1), name=f"cv3_{i}_2")(cls)
            outs.append((box, cls))

        boxes, scores = [], []
        for (box, cls), stride in zip(outs, cfg.strides):
            b_, h, w, _ = box.shape
            # anchor cell centres in feature units (make_anchors, offset 0.5)
            xs = jnp.arange(w, dtype=jnp.float32) + 0.5
            ys = jnp.arange(h, dtype=jnp.float32) + 0.5
            ax, ay = jnp.meshgrid(xs, ys)  # [h, w]
            anchors = jnp.stack([ax, ay], -1).reshape(1, h * w, 2)
            # DFL: softmax over reg_max bins -> expectation (closed form,
            # equals the official fixed arange-weight conv)
            d = box.reshape(b_, h * w, 4, cfg.reg_max)
            d = jax.nn.softmax(d.astype(jnp.float32), axis=-1)
            d = jnp.einsum("bnkr,r->bnk", d,
                           jnp.arange(cfg.reg_max, dtype=jnp.float32))
            lt, rb = d[..., :2], d[..., 2:]
            x1y1 = anchors - lt
            x2y2 = anchors + rb
            cxy = (x1y1 + x2y2) / 2
            wh = x2y2 - x1y1
            boxes.append(jnp.concatenate([cxy, wh], -1) * stride)
            scores.append(jax.nn.sigmoid(
                cls.reshape(b_, h * w, cfg.nc).astype(jnp.float32)))
        return jnp.concatenate(
            [jnp.concatenate(boxes, 1), jnp.concatenate(scores, 1)], -1)


class YOLOv8(nn.Module):
    """Full detection model (ultralytics yolov8.yaml topology, hardcoded)."""

    cfg: YOLOv8Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        c1, c2, c3 = cfg.ch(64), cfg.ch(128), cfg.ch(256)
        c4, c5 = cfg.ch(512), cfg.ch(1024)
        n1, n2 = cfg.n(3), cfg.n(6)

        x = ConvBNSiLU(c1, 3, 2, name="model_0")(x)
        x = ConvBNSiLU(c2, 3, 2, name="model_1")(x)
        x = C2f(c2, n1, True, name="model_2")(x)
        x = ConvBNSiLU(c3, 3, 2, name="model_3")(x)
        p3 = C2f(c3, n2, True, name="model_4")(x)
        x = ConvBNSiLU(c4, 3, 2, name="model_5")(p3)
        p4 = C2f(c4, n2, True, name="model_6")(x)
        x = ConvBNSiLU(c5, 3, 2, name="model_7")(p4)
        x = C2f(c5, n1, True, name="model_8")(x)
        p5 = SPPF(c5, name="model_9")(x)

        x = _upsample2x(p5)
        x = jnp.concatenate([x, p4], -1)
        h12 = C2f(c4, n1, False, name="model_12")(x)
        x = _upsample2x(h12)
        x = jnp.concatenate([x, p3], -1)
        h15 = C2f(c3, n1, False, name="model_15")(x)
        x = ConvBNSiLU(c3, 3, 2, name="model_16")(h15)
        x = jnp.concatenate([x, h12], -1)
        h18 = C2f(c4, n1, False, name="model_18")(x)
        x = ConvBNSiLU(c4, 3, 2, name="model_19")(h18)
        x = jnp.concatenate([x, p5], -1)
        h21 = C2f(c5, n1, False, name="model_21")(x)

        return Detect(cfg, ch3=c3, name="model_22")([h15, h18, h21])


# --------------------------------------------------------------------------
# Host-side pre/postprocessing (ultralytics predict path)
# --------------------------------------------------------------------------


def letterbox_np(image: "np.ndarray", imgsz: int = 640, stride: int = 32):
    """Minimal-rectangle letterbox (ultralytics LetterBox, auto=True,
    center=True, color 114): scale to fit, pad each dim up to a stride
    multiple, split padding between both sides.

    Returns (padded image, ratio, (dw, dh) left/top pad)."""
    import cv2
    import numpy as np

    h, w = image.shape[:2]
    r = min(imgsz / h, imgsz / w)
    nw, nh = round(w * r), round(h * r)
    dw, dh = (-nw) % stride, (-nh) % stride
    dw, dh = dw / 2, dh / 2
    if (nw, nh) != (w, h):
        image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    out = cv2.copyMakeBorder(image, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=(114, 114, 114))
    return out, r, (left, top)


def nms_np(boxes_xywh, scores, conf_thres: float = 0.25,
           iou_thres: float = 0.7, max_det: int = 300):
    """Class-agnostic-per-class NMS on host (ultralytics
    non_max_suppression defaults).  boxes_xywh [N, 4], scores [N, nc].
    Returns (boxes_xywh [M, 4], conf [M], cls [M])."""
    import numpy as np

    cls = scores.argmax(-1)
    conf = scores.max(-1)
    keep0 = conf > conf_thres
    boxes_xywh, conf, cls = boxes_xywh[keep0], conf[keep0], cls[keep0]
    if len(conf) == 0:
        return (np.zeros((0, 4), np.float32), np.zeros((0,), np.float32),
                np.zeros((0,), np.int64))
    x1 = boxes_xywh[:, 0] - boxes_xywh[:, 2] / 2
    y1 = boxes_xywh[:, 1] - boxes_xywh[:, 3] / 2
    x2 = x1 + boxes_xywh[:, 2]
    y2 = y1 + boxes_xywh[:, 3]
    # per-class offset trick keeps one pass class-aware
    off = cls.astype(np.float32) * 7680.0
    order = conf.argsort()[::-1]
    keep = []
    xx1, yy1, xx2, yy2 = x1 + off, y1 + off, x2 + off, y2 + off
    areas = (x2 - x1) * (y2 - y1)
    while order.size and len(keep) < max_det:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        iw = np.maximum(
            0.0, np.minimum(xx2[i], xx2[rest]) - np.maximum(xx1[i], xx1[rest]))
        ih = np.maximum(
            0.0, np.minimum(yy2[i], yy2[rest]) - np.maximum(yy1[i], yy1[rest]))
        inter = iw * ih
        iou = inter / (areas[i] + areas[rest] - inter + 1e-9)
        order = rest[iou <= iou_thres]
    keep = np.asarray(keep, np.int64)
    return boxes_xywh[keep], conf[keep], cls[keep]


def scale_boxes_np(boxes_xywh, ratio: float, pad_lt, orig_hw):
    """Letterboxed-image xywh -> original-image xywh, clipped."""
    import numpy as np

    b = np.asarray(boxes_xywh, np.float32).copy()
    b[:, 0] = (b[:, 0] - pad_lt[0]) / ratio
    b[:, 1] = (b[:, 1] - pad_lt[1]) / ratio
    b[:, 2:] = b[:, 2:] / ratio
    h, w = orig_hw
    b[:, 0] = b[:, 0].clip(0, w)
    b[:, 1] = b[:, 1].clip(0, h)
    return b
