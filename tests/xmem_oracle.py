"""Compact torch-CPU oracle of XMem (eval mode), with state-dict keys
matching the published ``XMem-s012.pth`` checkpoint layout exactly
(reference: track_anything_code/tracker/model/{network,modules,resnet,
cbam,group_modules,memory_util,aggregate}.py).

An independent re-derivation of the numerics: parity tests randomly
initialise this oracle, convert its state dict through
weights/convert.py::xmem_state_dict_to_flax, and require the flax model to
agree — validating the model wiring and the converter in one shot.
Test-only code; never imported by the framework.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------------
# ResNet trunks (eval-mode BN)
# --------------------------------------------------------------------------

class BBlock(nn.Module):  # resnet18 basic block
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + r)


class BNeck(nn.Module):  # resnet50 bottleneck
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * 4
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + r)


def _layer18(cin, cout, blocks, stride):
    mods = [BBlock(cin, cout, stride)]
    mods += [BBlock(cout, cout) for _ in range(blocks - 1)]
    return nn.Sequential(*mods)


def _layer50(cin, planes, blocks, stride):
    mods = [BNeck(cin, planes, stride)]
    mods += [BNeck(planes * 4, planes) for _ in range(blocks - 1)]
    return nn.Sequential(*mods)


class KeyEncoderO(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.res2 = _layer50(64, 64, 3, 1)
        self.layer2 = _layer50(256, 128, 4, 2)
        self.layer3 = _layer50(512, 256, 6, 2)

    def forward(self, f):
        x = self.maxpool(F.relu(self.bn1(self.conv1(f))))
        f4 = self.res2(x)
        f8 = self.layer2(f4)
        f16 = self.layer3(f8)
        return f16, f8, f4


# --------------------------------------------------------------------------
# Fusion / attention / GRU blocks
# --------------------------------------------------------------------------

class GroupResBlockO(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.downsample = nn.Conv2d(cin, cout, 3, padding=1) if cin != cout else None

    def forward(self, g):  # folded [(B N), C, H, W]
        y = self.conv2(F.relu(self.conv1(F.relu(g))))
        if self.downsample is not None:
            g = self.downsample(g)
        return y + g


class CBAMO(nn.Module):
    def __init__(self, c, reduction=16):
        super().__init__()
        self.ChannelGate = nn.Module()
        self.ChannelGate.mlp = nn.Sequential(
            nn.Identity(), nn.Linear(c, c // reduction), nn.ReLU(),
            nn.Linear(c // reduction, c))
        self.SpatialGate = nn.Module()
        self.SpatialGate.spatial = nn.Module()
        self.SpatialGate.spatial.conv = nn.Conv2d(2, 1, 7, padding=3)

    def forward(self, x):
        avg = x.mean((2, 3))
        mx = x.amax((2, 3))
        att = self.ChannelGate.mlp(avg) + self.ChannelGate.mlp(mx)
        x = x * torch.sigmoid(att)[:, :, None, None]
        pooled = torch.cat([x.amax(1, keepdim=True), x.mean(1, keepdim=True)], 1)
        return x * torch.sigmoid(self.SpatialGate.spatial.conv(pooled))


class FeatureFusionO(nn.Module):
    def __init__(self, x_dim, g_dim, mid, out):
        super().__init__()
        self.block1 = GroupResBlockO(x_dim + g_dim, mid)
        self.attention = CBAMO(mid)
        self.block2 = GroupResBlockO(mid, out)

    def forward(self, x, g):  # x [B,C,H,W]; g [B,N,C,H,W]
        b, n = g.shape[:2]
        g = torch.cat([x[:, None].expand(-1, n, -1, -1, -1), g], 2).flatten(0, 1)
        g = self.block1(g)
        g = self.block2(g + self.attention(g))
        return g.view(b, n, *g.shape[1:])


def _gru(values, h, hd):
    forget = torch.sigmoid(values[:, :, :hd])
    update = torch.sigmoid(values[:, :, hd:hd * 2])
    new = torch.tanh(values[:, :, hd * 2:])
    return forget * h * (1 - update) + update * new


class HiddenReinforcerO(nn.Module):
    def __init__(self, g_dim, hd):
        super().__init__()
        self.hd = hd
        self.transform = nn.Conv2d(g_dim + hd, hd * 3, 3, padding=1)

    def forward(self, g, h):
        b, n = g.shape[:2]
        v = self.transform(torch.cat([g, h], 2).flatten(0, 1)).view(b, n, -1, *g.shape[-2:])
        return _gru(v, h, self.hd)


class HiddenUpdaterO(nn.Module):
    def __init__(self, g_dims, mid, hd):
        super().__init__()
        self.hd = hd
        self.g16_conv = nn.Conv2d(g_dims[0], mid, 1)
        self.g8_conv = nn.Conv2d(g_dims[1], mid, 1)
        self.g4_conv = nn.Conv2d(g_dims[2], mid, 1)
        self.transform = nn.Conv2d(mid + hd, hd * 3, 3, padding=1)

    def forward(self, g16, g8, g4, h):
        b, n = g16.shape[:2]

        def fold(t):
            return t.flatten(0, 1)

        g = (self.g16_conv(fold(g16))
             + self.g8_conv(F.interpolate(fold(g8), scale_factor=0.5, mode="area"))
             + self.g4_conv(F.interpolate(fold(g4), scale_factor=0.25, mode="area")))
        g = g.view(b, n, -1, *g.shape[-2:])
        v = self.transform(torch.cat([g, h], 2).flatten(0, 1)).view(b, n, -1, *g.shape[-2:])
        return _gru(v, h, self.hd)


class ValueEncoderO(nn.Module):
    def __init__(self, value_dim=512, hidden_dim=64):
        super().__init__()
        self.conv1 = nn.Conv2d(5, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = _layer18(64, 64, 2, 1)
        self.layer2 = _layer18(64, 128, 2, 2)
        self.layer3 = _layer18(128, 256, 2, 2)
        self.fuser = FeatureFusionO(1024, 256, value_dim, value_dim)
        self.hidden_reinforce = HiddenReinforcerO(value_dim, hidden_dim)

    def forward(self, image, f16, h, masks, others, deep_update=True):
        b, n = masks.shape[:2]
        g = torch.stack([masks, others], 2)
        g = torch.cat([image[:, None].expand(-1, n, -1, -1, -1), g], 2).flatten(0, 1)
        g = F.relu(self.maxpool(self.bn1(self.conv1(g))))
        g = self.layer3(self.layer2(self.layer1(g)))
        g = self.fuser(f16, g.view(b, n, *g.shape[1:]))
        if deep_update:
            h = self.hidden_reinforce(g, h)
        return g, h


class KeyProjectionO(nn.Module):
    def __init__(self, in_dim=1024, key_dim=64):
        super().__init__()
        self.key_proj = nn.Conv2d(in_dim, key_dim, 3, padding=1)
        self.d_proj = nn.Conv2d(in_dim, 1, 3, padding=1)
        self.e_proj = nn.Conv2d(in_dim, key_dim, 3, padding=1)

    def forward(self, x):
        return (self.key_proj(x), self.d_proj(x) ** 2 + 1,
                torch.sigmoid(self.e_proj(x)))


class UpsampleBlockO(nn.Module):
    def __init__(self, skip_dim, up_dim, out_dim):
        super().__init__()
        self.skip_conv = nn.Conv2d(skip_dim, up_dim, 3, padding=1)
        self.out_conv = GroupResBlockO(up_dim, out_dim)

    def forward(self, skip_f, up_g):
        b, n = up_g.shape[:2]
        skip = self.skip_conv(skip_f)
        g = F.interpolate(up_g.flatten(0, 1), scale_factor=2, mode="bilinear",
                          align_corners=False)
        g = self.out_conv(skip[:, None].expand(-1, n, -1, -1, -1).flatten(0, 1) + g)
        return g.view(b, n, *g.shape[1:])


class DecoderO(nn.Module):
    def __init__(self, val_dim=512, hidden_dim=64):
        super().__init__()
        self.fuser = FeatureFusionO(1024, val_dim + hidden_dim, 512, 512)
        self.hidden_update = HiddenUpdaterO([512, 256, 256 + 1], 256, hidden_dim)
        self.up_16_8 = UpsampleBlockO(512, 512, 256)
        self.up_8_4 = UpsampleBlockO(256, 256, 256)
        self.pred = nn.Conv2d(256, 1, 3, padding=1)

    def forward(self, f16, f8, f4, hidden, readout, h_out=True):
        b, n = readout.shape[:2]
        g16 = self.fuser(f16, torch.cat([readout, hidden], 2))
        g8 = self.up_16_8(f8, g16)
        g4 = self.up_8_4(f4, g8)
        logits = self.pred(F.relu(g4.flatten(0, 1)))
        if h_out:
            g4c = torch.cat([g4, logits.view(b, n, 1, *logits.shape[-2:])], 2)
            hidden = self.hidden_update(g16, g8, g4c, hidden)
        else:
            hidden = None
        logits = F.interpolate(logits, scale_factor=4, mode="bilinear",
                               align_corners=False)
        return hidden, logits.view(b, n, *logits.shape[-2:])


class XMemOracle(nn.Module):
    def __init__(self):
        super().__init__()
        self.key_encoder = KeyEncoderO()
        self.key_proj = KeyProjectionO()
        self.value_encoder = ValueEncoderO()
        self.decoder = DecoderO()

    def encode_key(self, frame):
        f16, f8, f4 = self.key_encoder(frame)
        key, shrinkage, selection = self.key_proj(f16)
        return key, shrinkage, selection, f16, f8, f4

    def encode_value(self, frame, f16, h, masks, deep_update=True):
        n = masks.shape[1]
        if n == 1:
            others = torch.zeros_like(masks)
        else:
            others = masks.sum(1, keepdim=True) - masks
        return self.value_encoder(frame, f16, h, masks, others, deep_update)

    def segment(self, f16, f8, f4, readout, hidden, h_out=True):
        hidden, logits = self.decoder(f16, f8, f4, hidden, readout, h_out)
        prob = torch.sigmoid(logits)
        logits, prob = aggregate_o(prob, 1, return_logits=True)
        return hidden, logits, prob


def aggregate_o(prob, dim, return_logits=False):
    bg = torch.prod(1 - prob, dim=dim, keepdim=True)
    new_prob = torch.cat([bg, prob], dim).clamp(1e-7, 1 - 1e-7)
    logits = torch.log(new_prob / (1 - new_prob))
    prob = F.softmax(logits, dim=dim)
    return (logits, prob) if return_logits else prob


def similarity_o(mk, ms, qk, qe):
    """Channel-major reference math: mk [B,CK,N], ms [B,1,N] (or None),
    qk/qe [B,CK,P]. Returns [B,N,P]."""
    ck = mk.shape[1]
    if qe is not None:
        mk_t = mk.transpose(1, 2)
        a_sq = mk_t.pow(2) @ qe
        two_ab = 2 * (mk_t @ (qk * qe))
        b_sq = (qe * qk.pow(2)).sum(1, keepdim=True)
        sim = -a_sq + two_ab - b_sq
    else:
        a_sq = mk.pow(2).sum(1).unsqueeze(2)
        sim = -a_sq + 2 * (mk.transpose(1, 2) @ qk)
    if ms is not None:
        sim = sim * ms.transpose(1, 2)
    return sim / math.sqrt(ck)


def topk_softmax_o(sim, top_k=None):
    """Softmax over the memory axis (dim=1) keeping top-k entries."""
    if top_k is not None and top_k < sim.shape[1]:
        values, indices = torch.topk(sim, k=top_k, dim=1)
        x_exp = values.exp()
        x_exp = x_exp / x_exp.sum(1, keepdim=True)
        return torch.zeros_like(sim).scatter_(1, indices, x_exp)
    return F.softmax(sim, dim=1)


def randomize_bn_stats(module: nn.Module, seed: int = 0):
    """Give every BN nontrivial running stats so conversion is exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.2)
