"""Compact torch-CPU oracle of the YOLOv8 detector (eval mode), with
state-dict keys matching the ultralytics ``DetectionModel`` layout exactly
(ultralytics/nn/{tasks,modules/{conv,block,head}}.py — the package the
reference uses for gripper detection,
curation_pipeline/select_frame_with_this_that.py:384-385).

Independent re-derivation for parity: tests randomly initialise this
oracle, convert its ``state_dict()`` through
weights/convert.py::yolo_state_dict_to_flax, and require models/yolov8.py
to agree.  Test-only code; never imported by the framework.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = Conv(c1, c2, 3, 1)
        self.cv2 = Conv(c2, c2, 3, 1)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            Bottleneck(self.c, self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class DFL(nn.Module):
    def __init__(self, c1=16):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        if not self.conv.weight.is_meta:  # meta-device shape-only builds
            self.conv.weight.data[:] = torch.arange(c1).float().view(1, c1, 1, 1)
        self.c1 = c1

    def forward(self, x):
        b, _, a = x.shape
        return self.conv(
            x.view(b, 4, self.c1, a).transpose(2, 1).softmax(1)).view(b, 4, a)


def make_anchors(feats, strides, grid_cell_offset=0.5):
    anchor_points, stride_tensor = [], []
    for x, stride in zip(feats, strides):
        _, _, h, w = x.shape
        sx = torch.arange(w).float() + grid_cell_offset
        sy = torch.arange(h).float() + grid_cell_offset
        sy, sx = torch.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(torch.stack((sx, sy), -1).view(-1, 2))
        stride_tensor.append(torch.full((h * w, 1), float(stride)))
    return torch.cat(anchor_points), torch.cat(stride_tensor)


def dist2bbox(distance, anchor_points, xywh=True, dim=-1):
    lt, rb = distance.chunk(2, dim)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return torch.cat((c_xy, wh), dim)
    return torch.cat((x1y1, x2y2), dim)


class Detect(nn.Module):
    def __init__(self, nc, ch, reg_max=16, strides=(8, 16, 32)):
        super().__init__()
        self.nc = nc
        self.reg_max = reg_max
        self.no = nc + reg_max * 4
        self.strides = strides
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1)) for x in ch)
        self.cv3 = nn.ModuleList(
            nn.Sequential(Conv(x, c3, 3), Conv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for x in ch)
        self.dfl = DFL(reg_max)

    def forward(self, x):
        for i in range(len(x)):
            x[i] = torch.cat((self.cv2[i](x[i]), self.cv3[i](x[i])), 1)
        anchors, strides = make_anchors(x, self.strides, 0.5)
        anchors = anchors.transpose(0, 1)
        strides = strides.transpose(0, 1)
        x_cat = torch.cat(
            [xi.view(x[0].shape[0], self.no, -1) for xi in x], 2)
        box = x_cat[:, :self.reg_max * 4]
        cls = x_cat[:, self.reg_max * 4:]
        dbox = dist2bbox(self.dfl(box), anchors.unsqueeze(0),
                         xywh=True, dim=1) * strides
        return torch.cat((dbox, cls.sigmoid()), 1)


class Upsample(nn.Module):
    def forward(self, x):
        return F.interpolate(x, scale_factor=2, mode="nearest")


class DetectionModel(nn.Module):
    """yolov8.yaml topology; ``cfg`` is models/yolov8.YOLOv8Config."""

    def __init__(self, cfg):
        super().__init__()
        c1, c2, c3 = cfg.ch(64), cfg.ch(128), cfg.ch(256)
        c4, c5 = cfg.ch(512), cfg.ch(1024)
        n1, n2 = cfg.n(3), cfg.n(6)
        ident = nn.Identity  # placeholder keeps Sequential indexes aligned
        self.model = nn.Sequential(
            Conv(3, c1, 3, 2),               # 0
            Conv(c1, c2, 3, 2),              # 1
            C2f(c2, c2, n1, True),           # 2
            Conv(c2, c3, 3, 2),              # 3
            C2f(c3, c3, n2, True),           # 4
            Conv(c3, c4, 3, 2),              # 5
            C2f(c4, c4, n2, True),           # 6
            Conv(c4, c5, 3, 2),              # 7
            C2f(c5, c5, n1, True),           # 8
            SPPF(c5, c5),                    # 9
            Upsample(),                      # 10
            ident(),                         # 11 (concat)
            C2f(c5 + c4, c4, n1, False),     # 12
            Upsample(),                      # 13
            ident(),                         # 14 (concat)
            C2f(c4 + c3, c3, n1, False),     # 15
            Conv(c3, c3, 3, 2),              # 16
            ident(),                         # 17 (concat)
            C2f(c3 + c4, c4, n1, False),     # 18
            Conv(c4, c4, 3, 2),              # 19
            ident(),                         # 20 (concat)
            C2f(c4 + c5, c5, n1, False),     # 21
            Detect(cfg.nc, (c3, c4, c5), cfg.reg_max, cfg.strides),  # 22
        )

    @torch.no_grad()
    def forward(self, x):
        m = self.model
        x = m[2](m[1](m[0](x)))
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        x = m[12](torch.cat([m[10](p5), p4], 1))
        h12 = x
        h15 = m[15](torch.cat([m[13](x), p3], 1))
        h18 = m[18](torch.cat([m[16](h15), h12], 1))
        h21 = m[21](torch.cat([m[19](h18), p5], 1))
        return m[22]([h15, h18, h21])
