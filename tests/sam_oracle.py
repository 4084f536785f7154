"""Compact torch-CPU oracle of Segment Anything (eval mode), with
state-dict keys matching the published ``sam_vit_*.pth`` checkpoint layout
exactly (facebookresearch/segment-anything: modeling/{image_encoder,
prompt_encoder,mask_decoder,transformer,common}.py — the package the
reference pip-installs, curation_pipeline/select_frame_with_this_that.py
:387-390).

Independent re-derivation for parity: tests randomly initialise this
oracle, convert its ``state_dict()`` through
weights/convert.py::sam_state_dict_to_flax, and require models/sam.py to
agree — validating model wiring and converter in one shot.  Test-only
code; never imported by the framework.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class LayerNorm2d(nn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):  # [B, C, H, W]
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class MLPBlock(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.lin1 = nn.Linear(dim, hidden)
        self.lin2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.lin2(F.gelu(self.lin1(x)))


# --------------------------------------------------------------------------
# Image encoder
# --------------------------------------------------------------------------


def get_rel_pos(q_size, k_size, rel_pos):
    # tables are sized exactly (no interpolation branch needed in tests)
    assert rel_pos.shape[0] == 2 * max(q_size, k_size) - 1
    q_coords = torch.arange(q_size)[:, None]
    k_coords = torch.arange(k_size)[None, :]
    relative = q_coords - k_coords + (k_size - 1)
    return rel_pos[relative.long()]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = (
        attn.view(B, q_h, q_w, k_h, k_w)
        + rel_h[:, :, :, :, None]
        + rel_w[:, :, :, None, :]
    ).view(B, q_h * q_w, k_h * k_w)
    return attn


class ViTAttention(nn.Module):
    def __init__(self, dim, num_heads, input_size):
        super().__init__()
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.rel_pos_h = nn.Parameter(torch.zeros(2 * input_size[0] - 1, head_dim))
        self.rel_pos_w = nn.Parameter(torch.zeros(2 * input_size[1] - 1, head_dim))

    def forward(self, x):  # [B, H, W, C]
        B, H, W, _ = x.shape
        qkv = (
            self.qkv(x.reshape(B, H * W, -1))
            .reshape(B, H * W, 3, self.num_heads, -1)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.reshape(3, B * self.num_heads, H * W, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = add_decomposed_rel_pos(
            attn, q, self.rel_pos_h, self.rel_pos_w, (H, W), (H, W))
        attn = attn.softmax(dim=-1)
        x = (
            (attn @ v)
            .view(B, self.num_heads, H, W, -1)
            .permute(0, 2, 3, 1, 4)
            .reshape(B, H, W, -1)
        )
        return self.proj(x)


def window_partition(x, ws):
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    windows = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, C)
    return windows, (Hp, Wp)


def window_unpartition(windows, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // ws // ws)
    x = windows.view(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, Hp, Wp, -1)
    return x[:, :H, :W].contiguous()


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, window_size, input_size):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = ViTAttention(
            dim, num_heads,
            input_size if window_size == 0 else (window_size, window_size))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio))
        self.window_size = window_size

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        x = self.attn(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class ImageEncoderViT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        g = cfg.img_size // cfg.patch_size
        d = cfg.encoder_embed_dim
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(
            3, d, cfg.patch_size, cfg.patch_size)
        self.pos_embed = nn.Parameter(torch.zeros(1, g, g, d))
        self.blocks = nn.ModuleList([
            Block(d, cfg.encoder_num_heads, cfg.mlp_ratio,
                  0 if i in cfg.encoder_global_attn_indexes else cfg.window_size,
                  (g, g))
            for i in range(cfg.encoder_depth)
        ])
        self.neck = nn.Sequential(
            nn.Conv2d(d, cfg.prompt_embed_dim, 1, bias=False),
            LayerNorm2d(cfg.prompt_embed_dim),
            nn.Conv2d(cfg.prompt_embed_dim, cfg.prompt_embed_dim, 3,
                      padding=1, bias=False),
            LayerNorm2d(cfg.prompt_embed_dim),
        )

    def forward(self, x):  # [B, 3, H, W]
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))


# --------------------------------------------------------------------------
# Prompt encoder
# --------------------------------------------------------------------------


class PositionEmbeddingRandom(nn.Module):
    def __init__(self, num_pos_feats):
        super().__init__()
        self.register_buffer(
            "positional_encoding_gaussian_matrix",
            torch.randn(2, num_pos_feats))

    def _pe_encoding(self, coords):
        coords = 2 * coords - 1
        coords = coords @ self.positional_encoding_gaussian_matrix
        coords = 2 * math.pi * coords
        return torch.cat([torch.sin(coords), torch.cos(coords)], dim=-1)

    def forward(self, size):
        h, w = size
        grid = torch.ones(h, w)
        y_embed = (grid.cumsum(0) - 0.5) / h
        x_embed = (grid.cumsum(1) - 0.5) / w
        pe = self._pe_encoding(torch.stack([x_embed, y_embed], dim=-1))
        return pe.permute(2, 0, 1)

    def forward_with_coords(self, coords, image_size):
        c = coords.clone()
        c[..., 0] = c[..., 0] / image_size[1]
        c[..., 1] = c[..., 1] / image_size[0]
        return self._pe_encoding(c.float())


class PromptEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.prompt_embed_dim
        self.embed_dim = c
        self.input_image_size = (cfg.img_size, cfg.img_size)
        self.image_embedding_size = (cfg.img_size // cfg.patch_size,) * 2
        self.pe_layer = PositionEmbeddingRandom(c // 2)
        self.point_embeddings = nn.ModuleList(
            [nn.Embedding(1, c) for _ in range(4)])
        self.not_a_point_embed = nn.Embedding(1, c)
        m = cfg.mask_in_chans
        self.mask_downscaling = nn.Sequential(
            nn.Conv2d(1, m // 4, 2, 2), LayerNorm2d(m // 4), nn.GELU(),
            nn.Conv2d(m // 4, m, 2, 2), LayerNorm2d(m), nn.GELU(),
            nn.Conv2d(m, c, 1))
        self.no_mask_embed = nn.Embedding(1, c)

    def embed_points(self, points, labels):
        """points already +0.5-shifted (the caller mirrors _embed_points'
        shift so flax and oracle receive identical coords); labels may be
        -1/0/1/2/3 (padding, neg, pos, box corners)."""
        pe = self.pe_layer.forward_with_coords(points, self.input_image_size)
        pe[labels == -1] = 0.0
        pe[labels == -1] += self.not_a_point_embed.weight[0]
        pe[labels == 0] += self.point_embeddings[0].weight[0]
        pe[labels == 1] += self.point_embeddings[1].weight[0]
        pe[labels == 2] += self.point_embeddings[2].weight[0]
        pe[labels == 3] += self.point_embeddings[3].weight[0]
        return pe

    def forward(self, points, labels, mask_input=None):
        sparse = self.embed_points(points, labels)
        if mask_input is None:
            g = self.image_embedding_size[0]
            dense = self.no_mask_embed.weight.reshape(1, -1, 1, 1).expand(
                points.shape[0], -1, g, g)
        else:
            dense = self.mask_downscaling(mask_input)
        return sparse, dense

    def get_dense_pe(self):
        return self.pe_layer(self.image_embedding_size).unsqueeze(0)


# --------------------------------------------------------------------------
# Mask decoder + two-way transformer
# --------------------------------------------------------------------------


class DecoderAttention(nn.Module):
    def __init__(self, dim, num_heads, downsample_rate=1):
        super().__init__()
        self.num_heads = num_heads
        inner = dim // downsample_rate
        self.internal_dim = inner
        self.q_proj = nn.Linear(dim, inner)
        self.k_proj = nn.Linear(dim, inner)
        self.v_proj = nn.Linear(dim, inner)
        self.out_proj = nn.Linear(inner, dim)

    def _sep(self, x):
        b, n, c = x.shape
        return x.reshape(b, n, self.num_heads, c // self.num_heads).transpose(1, 2)

    def forward(self, q, k, v):
        q = self._sep(self.q_proj(q))
        k = self._sep(self.k_proj(k))
        v = self._sep(self.v_proj(v))
        attn = (q @ k.permute(0, 1, 3, 2)) / math.sqrt(q.shape[-1])
        attn = attn.softmax(dim=-1)
        out = attn @ v
        b, h, n, d = out.shape
        out = out.transpose(1, 2).reshape(b, n, h * d)
        return self.out_proj(out)


class TwoWayAttentionBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_dim, skip_first_layer_pe):
        super().__init__()
        self.self_attn = DecoderAttention(dim, num_heads)
        self.norm1 = nn.LayerNorm(dim)
        self.cross_attn_token_to_image = DecoderAttention(dim, num_heads, 2)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MLPBlock(dim, mlp_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.norm4 = nn.LayerNorm(dim)
        self.cross_attn_image_to_token = DecoderAttention(dim, num_heads, 2)
        self.skip_first_layer_pe = skip_first_layer_pe

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self.cross_attn_token_to_image(q, k, keys)
        queries = self.norm2(queries)
        queries = queries + self.mlp(queries)
        queries = self.norm3(queries)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + self.cross_attn_image_to_token(k, q, queries)
        keys = self.norm4(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    def __init__(self, depth, dim, num_heads, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList([
            TwoWayAttentionBlock(dim, num_heads, mlp_dim, i == 0)
            for i in range(depth)])
        self.final_attn_token_to_image = DecoderAttention(dim, num_heads, 2)
        self.norm_final_attn = nn.LayerNorm(dim)

    def forward(self, image_embedding, image_pe, point_embedding):
        bs, c, h, w = image_embedding.shape
        keys = image_embedding.flatten(2).permute(0, 2, 1)
        key_pe = image_pe.flatten(2).permute(0, 2, 1)
        queries = point_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        queries = self.norm_final_attn(queries)
        return queries, keys


class MLP(nn.Module):
    def __init__(self, input_dim, hidden_dim, output_dim, num_layers):
        super().__init__()
        h = [hidden_dim] * (num_layers - 1)
        self.layers = nn.ModuleList(
            nn.Linear(n, k) for n, k in zip([input_dim] + h, h + [output_dim]))

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i < len(self.layers) - 1:
                x = F.relu(x)
        return x


class MaskDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.prompt_embed_dim
        self.num_mask_tokens = cfg.num_multimask_outputs + 1
        self.transformer = TwoWayTransformer(
            cfg.decoder_depth, c, cfg.decoder_num_heads, cfg.decoder_mlp_dim)
        self.iou_token = nn.Embedding(1, c)
        self.mask_tokens = nn.Embedding(self.num_mask_tokens, c)
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(c, c // 4, 2, 2), LayerNorm2d(c // 4),
            nn.GELU(), nn.ConvTranspose2d(c // 4, c // 8, 2, 2), nn.GELU())
        self.output_hypernetworks_mlps = nn.ModuleList([
            MLP(c, c, c // 8, 3) for _ in range(self.num_mask_tokens)])
        self.iou_prediction_head = MLP(
            c, cfg.iou_head_hidden_dim, self.num_mask_tokens,
            cfg.iou_head_depth)

    def forward(self, image_embeddings, image_pe, sparse, dense):
        output_tokens = torch.cat(
            [self.iou_token.weight, self.mask_tokens.weight], dim=0)
        output_tokens = output_tokens.unsqueeze(0).expand(
            sparse.size(0), -1, -1)
        tokens = torch.cat((output_tokens, sparse), dim=1)
        src = torch.repeat_interleave(image_embeddings, tokens.shape[0], 0)
        src = src + dense
        pos_src = torch.repeat_interleave(image_pe, tokens.shape[0], 0)
        b, c, h, w = src.shape
        hs, src = self.transformer(src, pos_src, tokens)
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens, :]
        src = src.transpose(1, 2).view(b, c, h, w)
        upscaled = self.output_upscaling(src)
        hyper_in = torch.stack([
            self.output_hypernetworks_mlps[i](mask_tokens_out[:, i, :])
            for i in range(self.num_mask_tokens)], dim=1)
        b, c, h, w = upscaled.shape
        masks = (hyper_in @ upscaled.view(b, c, h * w)).view(b, -1, h, w)
        iou_pred = self.iou_prediction_head(iou_token_out)
        return masks, iou_pred


class Sam(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.image_encoder = ImageEncoderViT(cfg)
        self.prompt_encoder = PromptEncoder(cfg)
        self.mask_decoder = MaskDecoder(cfg)

    @torch.no_grad()
    def forward(self, pixels_nchw, points, labels):
        """pixels [1, 3, S, S] SAM-normalised; points [P, N, 2] (+0.5
        shifted, model-input coords); labels [P, N].  Returns (low-res mask
        logits [P, T, 4g, 4g], iou [P, T])."""
        emb = self.image_encoder(pixels_nchw)
        sparse, dense = self.prompt_encoder(points, labels)
        return self.mask_decoder(
            emb, self.prompt_encoder.get_dense_pe(), sparse, dense)
