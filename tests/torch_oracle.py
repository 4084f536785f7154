"""Compact torch-CPU oracle of the SVD spatio-temporal UNet / GestureNet.

An independent re-derivation of the reference architecture's numerics
(reference: svd/unet_spatio_temporal_condition.py, svd/temporal_controlnet.py,
svd/diffusion_arch/{unet_3d_blocks,transformer_temporal}.py and the diffusers
primitives they import), with state_dict keys matching the HF checkpoint
layout exactly.  Parity tests randomly initialise this oracle, convert its
state dict through weights/convert.py, and require the flax models to agree
— which validates the model wiring and the converter in one shot.

Test-only code; never imported by the framework.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timesteps_embed(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
    args = t.float()[:, None] * exponent.exp()[None]
    emb = torch.cat([args.sin(), args.cos()], dim=-1)
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)  # flip sin->cos


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim, out_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, out_dim or dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class Mixer(nn.Module):
    """AlphaBlender; alpha = sigmoid(mix_factor) (indicator always zeros here)."""

    def __init__(self, switch=False):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.tensor([0.5]))
        self.switch = switch

    def forward(self, spatial, temporal):
        a = torch.sigmoid(self.mix_factor)
        if self.switch:
            a = 1.0 - a
        return a * spatial + (1 - a) * temporal


class ResnetBlock2D(nn.Module):
    def __init__(self, cin, cout, temb, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb:
            self.time_emb_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    def __init__(self, cin, cout, temb, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = nn.Conv3d(cin, cout, (3, 1, 1), padding=(1, 0, 0))
        if temb:
            self.time_emb_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = nn.Conv3d(cout, cout, (3, 1, 1), padding=(1, 0, 0))
        if cin != cout:
            self.conv_shortcut = nn.Conv3d(cin, cout, 1)

    def forward(self, x, temb=None):
        # x: [B, C, F, H, W]; temb: [B, F, tc]
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            t = self.time_emb_proj(F.silu(temb))  # [B, F, C]
            h = h + t.permute(0, 2, 1)[:, :, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    def __init__(self, cin, cout, temb, eps, temporal_eps=None, switch=False, strategy="learned_with_images"):
        super().__init__()
        self.spatial_res_block = ResnetBlock2D(cin, cout, temb, eps)
        self.temporal_res_block = TemporalResnetBlock(
            cout, cout, temb, temporal_eps if temporal_eps is not None else eps
        )
        self.time_mixer = Mixer(switch=switch)

    def forward(self, x, temb, num_frames):
        # x: [B*F, C, H, W]; temb: [B*F, tc] or None
        h = self.spatial_res_block(x, temb)
        bf, c, hh, ww = h.shape
        b = bf // num_frames
        h5 = h.reshape(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        temb5 = None if temb is None else temb.reshape(b, num_frames, -1)
        ht = self.temporal_res_block(h5, temb5)
        out = self.time_mixer(h5, ht)
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


class Attention(nn.Module):
    def __init__(self, dim, heads, dim_head, ctx_dim=None):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(ctx_dim or dim, inner, bias=False)
        self.to_v = nn.Linear(ctx_dim or dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim)])

    def forward(self, x, ctx=None):
        c = x if ctx is None else ctx
        b, s, _ = x.shape
        q = self.to_q(x).view(b, s, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(c).view(b, c.shape[1], self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(c).view(b, c.shape[1], self.heads, self.dim_head).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, s, -1)
        return self.to_out[0](o)


class GEGLUFF(nn.Module):
    def __init__(self, dim, dim_out=None):
        super().__init__()
        proj = nn.Linear(dim, dim * 8)
        self.net = nn.ModuleList([nn.Module(), nn.Identity(), nn.Linear(dim * 4, dim_out or dim)])
        self.net[0].proj = proj

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, ctx_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, dim_head, ctx_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = GEGLUFF(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class TemporalBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, ctx_dim):
        super().__init__()
        self.norm_in = nn.LayerNorm(dim)
        self.ff_in = GEGLUFF(dim)
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, dim_head, ctx_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = GEGLUFF(dim)

    def forward(self, x, num_frames, ctx):
        bf, s, c = x.shape
        b = bf // num_frames
        h = x.reshape(b, num_frames, s, c).permute(0, 2, 1, 3).reshape(b * s, num_frames, c)
        h = h + self.ff_in(self.norm_in(h))
        h = h + self.attn1(self.norm1(h))
        h = h + self.attn2(self.norm2(h), ctx)
        h = h + self.ff(self.norm3(h))
        return h.reshape(b, s, num_frames, c).permute(0, 2, 1, 3).reshape(bf, s, c)


class TransformerSpatioTemporalModel(nn.Module):
    def __init__(self, heads, dim_head, cin, layers, ctx_dim):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(32, cin, eps=1e-6)
        self.proj_in = nn.Linear(cin, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, dim_head, ctx_dim) for _ in range(layers)]
        )
        self.temporal_transformer_blocks = nn.ModuleList(
            [TemporalBasicTransformerBlock(inner, heads, dim_head, ctx_dim) for _ in range(layers)]
        )
        self.time_pos_embed = TimestepEmbedding(cin, cin * 4, out_dim=cin)
        self.time_mixer = Mixer()
        self.proj_out = nn.Linear(inner, cin)

    def forward(self, x, ctx, num_frames):
        bf, c, hh, ww = x.shape
        b = bf // num_frames
        # first-frame context broadcast hw-major (reference quirk)
        ctx_first = ctx.reshape(b, num_frames, *ctx.shape[1:])[:, 0]
        time_ctx = ctx_first[None].expand(hh * ww, -1, -1, -1).reshape(hh * ww * b, *ctx_first.shape[1:])

        residual = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
        h = self.proj_in(h)

        frame_ids = torch.arange(num_frames).repeat(b)
        emb = self.time_pos_embed(timesteps_embed(frame_ids, c))[:, None, :]

        for blk, tblk in zip(self.transformer_blocks, self.temporal_transformer_blocks):
            h = blk(h, ctx)
            hmix = tblk(h + emb, num_frames, time_ctx)
            h = self.time_mixer(h, hmix)

        h = self.proj_out(h)
        return h.reshape(bf, hh, ww, c).permute(0, 3, 1, 2) + residual


class DownBlockST(nn.Module):
    def __init__(self, cin, cout, temb, n=2, downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList(
            [SpatioTemporalResBlock(cin if i == 0 else cout, cout, temb, eps=1e-5) for i in range(n)]
        )
        if downsample:
            ds = nn.Module()
            ds.conv = nn.Conv2d(cout, cout, 3, stride=2, padding=1)  # HF key: downsamplers.N.conv
            self.downsamplers = nn.ModuleList([ds])

    def forward(self, x, temb, f):
        states = []
        for r in self.resnets:
            x = r(x, temb, f)
            states.append(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0].conv(x)
            states.append(x)
        return x, states


class CrossDownBlockST(nn.Module):
    def __init__(self, cin, cout, temb, heads, ctx_dim, n=2, downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList(
            [SpatioTemporalResBlock(cin if i == 0 else cout, cout, temb, eps=1e-6) for i in range(n)]
        )
        self.attentions = nn.ModuleList(
            [TransformerSpatioTemporalModel(heads, cout // heads, cout, 1, ctx_dim) for _ in range(n)]
        )
        if downsample:
            ds = nn.Module()
            ds.conv = nn.Conv2d(cout, cout, 3, stride=2, padding=1)  # HF key: downsamplers.N.conv
            self.downsamplers = nn.ModuleList([ds])

    def forward(self, x, temb, ctx, f):
        states = []
        for r, a in zip(self.resnets, self.attentions):
            x = a(r(x, temb, f), ctx, f)
            states.append(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0].conv(x)
            states.append(x)
        return x, states


class MidBlockST(nn.Module):
    def __init__(self, c, temb, heads, ctx_dim):
        super().__init__()
        self.resnets = nn.ModuleList(
            [SpatioTemporalResBlock(c, c, temb, eps=1e-5) for _ in range(2)]
        )
        self.attentions = nn.ModuleList(
            [TransformerSpatioTemporalModel(heads, c // heads, c, 1, ctx_dim)]
        )

    def forward(self, x, temb, ctx, f):
        x = self.resnets[0](x, temb, f)
        x = self.attentions[0](x, ctx, f)
        return self.resnets[1](x, temb, f)


class UpBlockST(nn.Module):
    def __init__(self, cins, cout, temb, upsample=True):
        super().__init__()
        # eps=1e-6: get_up_block does NOT forward the UNet's resnet_eps=1e-5
        # into the SpatioTemporal branches (unet_3d_blocks.py:275-301), so
        # the class default 1e-6 (:2201) applies in the reference
        self.resnets = nn.ModuleList(
            [SpatioTemporalResBlock(ci, cout, temb, eps=1e-6) for ci in cins]
        )
        if upsample:
            us = nn.Module()
            us.conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = nn.ModuleList([us])

    def forward(self, x, res, temb, f):
        for r in self.resnets:
            x = torch.cat([x, res.pop()], dim=1)
            x = r(x, temb, f)
        if hasattr(self, "upsamplers"):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class CrossUpBlockST(nn.Module):
    def __init__(self, cins, cout, temb, heads, ctx_dim, upsample=True):
        super().__init__()
        # eps=1e-6, same get_up_block non-forwarding as UpBlockST (:2291)
        self.resnets = nn.ModuleList(
            [SpatioTemporalResBlock(ci, cout, temb, eps=1e-6) for ci in cins]
        )
        self.attentions = nn.ModuleList(
            [TransformerSpatioTemporalModel(heads, cout // heads, cout, 1, ctx_dim) for _ in cins]
        )
        if upsample:
            us = nn.Module()
            us.conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = nn.ModuleList([us])

    def forward(self, x, res, temb, ctx, f):
        for r, a in zip(self.resnets, self.attentions):
            x = torch.cat([x, res.pop()], dim=1)
            x = a(r(x, temb, f), ctx, f)
        if hasattr(self, "upsamplers"):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


def _up_in_channels(channels, layers_per_block):
    """(skip+prev) input widths for each up block, reference unet logic."""
    rev = list(reversed(channels))
    out = []
    prev = rev[0]
    for i in range(len(channels)):
        cout = rev[i]
        cins = []
        for j in range(layers_per_block + 1):
            skip = rev[min(i + 1, len(channels) - 1)] if j == layers_per_block else cout
            cin = prev if j == 0 else cout
            cins.append(cin + skip)
        out.append(cins)
        prev = cout
    return out


class UNetOracle(nn.Module):
    def __init__(self, channels=(32, 64, 64, 64), heads=(2, 2, 2, 4), ctx_dim=48,
                 add_dim=8, proj_dim=24, in_ch=8, out_ch=4):
        super().__init__()
        self.channels, self.heads, self.add_dim = channels, heads, add_dim
        temb = channels[0] * 4
        self.conv_in = nn.Conv2d(in_ch, channels[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(channels[0], temb)
        self.add_embedding = TimestepEmbedding(proj_dim, temb)
        self.layers_per_block = 2  # resnets per down block (reference fixed)
        blocks = []
        cin = channels[0]
        for i, c in enumerate(channels):
            last = i == len(channels) - 1
            if i < len(channels) - 1:  # reference: all but the last are cross-attn
                blocks.append(CrossDownBlockST(cin, c, temb, heads[i], ctx_dim, downsample=not last))
            else:
                blocks.append(DownBlockST(cin, c, temb, downsample=not last))
            cin = c
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = MidBlockST(channels[-1], temb, heads[-1], ctx_dim)
        upins = _up_in_channels(channels, 2)
        rev = list(reversed(channels))
        rheads = list(reversed(heads))
        ups = []
        for i in range(len(channels)):
            last = i == len(channels) - 1
            if i == 0:
                ups.append(UpBlockST(upins[i], rev[i], temb, upsample=not last))
            else:
                ups.append(CrossUpBlockST(upins[i], rev[i], temb, rheads[i], ctx_dim, upsample=not last))
        self.up_blocks = nn.ModuleList(ups)
        self.conv_norm_out = nn.GroupNorm(32, channels[0], eps=1e-5)
        self.conv_out = nn.Conv2d(channels[0], out_ch, 3, padding=1)

    def embed(self, t, add_ids, b):
        emb = self.time_embedding(timesteps_embed(t.expand(b), self.channels[0]))
        add = timesteps_embed(add_ids.flatten(), self.add_dim).reshape(b, -1)
        return emb + self.add_embedding(add)

    def forward(self, sample, t, ctx, add_ids, down_extra=None, mid_extra=None):
        # sample [B, F, C, H, W]; ctx [B, S, D]; add_ids [B, 3]
        b, f = sample.shape[:2]
        emb = self.embed(t, add_ids, b)
        temb = emb.repeat_interleave(f, dim=0)
        ctx = ctx.repeat_interleave(f, dim=0)
        x = self.conv_in(sample.flatten(0, 1))
        res = [x]
        for blk in self.down_blocks:
            if isinstance(blk, CrossDownBlockST):
                x, states = blk(x, temb, ctx, f)
            else:
                x, states = blk(x, temb, f)
            res += states
        if down_extra is not None:
            res = [r + e for r, e in zip(res, down_extra)]
        x = self.mid_block(x, temb, ctx, f)
        if mid_extra is not None:
            x = x + mid_extra
        for blk in self.up_blocks:
            take = res[-(self.layers_per_block + 1):]
            res = res[:-(self.layers_per_block + 1)]
            if isinstance(blk, CrossUpBlockST):
                x = blk(x, take, temb, ctx, f)
            else:
                x = blk(x, take, temb, f)
        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x.reshape(b, f, *x.shape[1:])


class ControlNetOracle(nn.Module):
    def __init__(self, channels=(32, 64, 64, 64), heads=(2, 2, 4, 4), ctx_dim=48,
                 add_dim=8, proj_dim=24):
        super().__init__()
        self.channels, self.heads, self.add_dim = channels, heads, add_dim
        temb = channels[0] * 4
        self.conv_in_concat = nn.Conv2d(12, channels[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(channels[0], temb)
        self.add_embedding = TimestepEmbedding(proj_dim, temb)
        blocks = []
        cin = channels[0]
        for i, c in enumerate(channels):
            last = i == len(channels) - 1
            if i < len(channels) - 1:  # reference: all but the last are cross-attn
                blocks.append(CrossDownBlockST(cin, c, temb, heads[i], ctx_dim, downsample=not last))
            else:
                blocks.append(DownBlockST(cin, c, temb, downsample=not last))
            cin = c
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = MidBlockST(channels[-1], temb, heads[-1], ctx_dim)
        zeros = [nn.Conv2d(channels[0], channels[0], 1)]
        for i, c in enumerate(channels):
            zeros += [nn.Conv2d(c, c, 1), nn.Conv2d(c, c, 1)]
            if i < len(channels) - 1:
                zeros.append(nn.Conv2d(c, c, 1))
        self.controlnet_down_blocks = nn.ModuleList(zeros)
        self.controlnet_mid_block = nn.Conv2d(channels[-1], channels[-1], 1)

    def forward(self, sample, t, ctx, add_ids, cond, scale=1.0):
        b, f = sample.shape[:2]
        emb = self.time_embedding(timesteps_embed(t.expand(b), self.channels[0]))
        add = timesteps_embed(add_ids.flatten(), self.add_dim).reshape(b, -1)
        emb = emb + self.add_embedding(add)
        temb = emb.repeat_interleave(f, dim=0)
        ctx = ctx.repeat_interleave(f, dim=0)
        x = torch.cat([sample, cond], dim=2).flatten(0, 1)
        x = self.conv_in_concat(x)
        res = [x]
        for blk in self.down_blocks:
            if isinstance(blk, CrossDownBlockST):
                x, states = blk(x, temb, ctx, f)
            else:
                x, states = blk(x, temb, f)
            res += states
        x = self.mid_block(x, temb, ctx, f)
        out = [z(r) * scale for z, r in zip(self.controlnet_down_blocks, res)]
        mid = self.controlnet_mid_block(x) * scale
        return out, mid


# ----------------------------- VAE oracle ---------------------------------


class VAEResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class VAEAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        n, c, h, w = x.shape
        t = self.group_norm(x).view(n, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        o = F.scaled_dot_product_attention(
            q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)
        ).squeeze(1)
        o = self.to_out[0](o)
        return o.transpose(1, 2).view(n, c, h, w) + x


class VAEEncoderOracle(nn.Module):
    def __init__(self, channels=(32, 32, 64, 64), latent=4):
        super().__init__()
        self.conv_in = nn.Conv2d(3, channels[0], 3, padding=1)
        blocks = []
        cin = channels[0]
        for i, c in enumerate(channels):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([VAEResnet(cin if j == 0 else c, c) for j in range(2)])
            if i < len(channels) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)
                blk.downsamplers = nn.ModuleList([ds])
            blocks.append(blk)
            cin = c
        self.down_blocks = nn.ModuleList(blocks)
        mid = nn.Module()
        mid.resnets = nn.ModuleList([VAEResnet(channels[-1], channels[-1]) for _ in range(2)])
        mid.attentions = nn.ModuleList([VAEAttn(channels[-1])])
        self.mid_block = mid
        self.conv_norm_out = nn.GroupNorm(32, channels[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(channels[-1], 2 * latent, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(F.pad(h, (0, 1, 0, 1)))
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class VAEDecoderOracle(nn.Module):
    def __init__(self, channels=(32, 32, 64, 64), latent=4):
        super().__init__()
        ctop = channels[-1]
        self.conv_in = nn.Conv2d(latent, ctop, 3, padding=1)
        mid = nn.Module()
        mid.resnets = nn.ModuleList(
            [SpatioTemporalResBlock(ctop, ctop, None, eps=1e-6, temporal_eps=1e-5, switch=True)
             for _ in range(2)]
        )
        mid.attentions = nn.ModuleList([VAEAttn(ctop)])
        self.mid_block = mid
        rev = list(reversed(channels))
        ups = []
        prev = ctop
        for i, c in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [SpatioTemporalResBlock(prev if j == 0 else c, c, None, eps=1e-6,
                                        temporal_eps=1e-5, switch=True) for j in range(3)]
            )
            if i < len(rev) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            ups.append(blk)
            prev = c
        self.up_blocks = nn.ModuleList(ups)
        self.conv_norm_out = nn.GroupNorm(32, channels[0], eps=1e-6)
        self.conv_out = nn.Conv2d(channels[0], 3, 3, padding=1)
        self.time_conv_out = nn.Conv3d(3, 3, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, z, num_frames):
        h = self.conv_in(z)
        h = self.mid_block.resnets[0](h, None, num_frames)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h, None, num_frames)
        for blk in self.up_blocks:
            for r in blk.resnets:
                h = r(h, None, num_frames)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        bf, c, hh, ww = h.shape
        b = bf // num_frames
        h5 = h.reshape(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        h5 = self.time_conv_out(h5)
        return h5.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


class VAEOracle(nn.Module):
    def __init__(self, channels=(32, 32, 64, 64), latent=4):
        super().__init__()
        self.encoder = VAEEncoderOracle(channels, latent)
        self.decoder = VAEDecoderOracle(channels, latent)
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)

    def encode_mode(self, x):
        moments = self.quant_conv(self.encoder(x))
        return moments.chunk(2, dim=1)[0]
