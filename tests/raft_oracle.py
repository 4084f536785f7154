"""Torch RAFT oracle in the OFFICIAL princeton-vl/RAFT state-dict layout
(fnet/cnet BasicEncoder, update_block with encoder/gru/flow_head/mask),
re-derived from the paper + published checkpoint key/shape contract so
tests/test_raft.py validates both models/raft.py and the
weights/convert.raft_state_dict_to_flax converter in one shot — the same
scheme as sam_oracle/yolo_oracle/xmem_oracle.

Only behaviors the published checkpoints exercise are implemented: the
"large" topology, eval mode (frozen batch norm in cnet, parameter-free
instance norm in fnet), zero dropout, no alternate-corr."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResidualBlock(nn.Module):
    def __init__(self, in_planes, planes, norm_fn="instance", stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1, stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.relu = nn.ReLU(inplace=True)
        if norm_fn == "instance":
            self.norm1 = nn.InstanceNorm2d(planes)
            self.norm2 = nn.InstanceNorm2d(planes)
            if stride != 1:
                self.norm3 = nn.InstanceNorm2d(planes)
        else:
            self.norm1 = nn.BatchNorm2d(planes)
            self.norm2 = nn.BatchNorm2d(planes)
            if stride != 1:
                self.norm3 = nn.BatchNorm2d(planes)
        if stride == 1:
            self.downsample = None
        else:
            # the official code registers norm3 inside the Sequential too,
            # so checkpoints carry BOTH norm3.* and downsample.1.* keys
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride), self.norm3)

    def forward(self, x):
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class BasicEncoder(nn.Module):
    def __init__(self, cfg, output_dim, norm_fn):
        super().__init__()
        d0, d1, d2, d3 = cfg.enc_dims
        if norm_fn == "instance":
            self.norm1 = nn.InstanceNorm2d(d0)
        else:
            self.norm1 = nn.BatchNorm2d(d0)
        self.conv1 = nn.Conv2d(3, d0, 7, stride=2, padding=3)
        self.relu1 = nn.ReLU(inplace=True)
        self.layer1 = nn.Sequential(ResidualBlock(d0, d1, norm_fn, 1),
                                    ResidualBlock(d1, d1, norm_fn, 1))
        self.layer2 = nn.Sequential(ResidualBlock(d1, d2, norm_fn, 2),
                                    ResidualBlock(d2, d2, norm_fn, 1))
        self.layer3 = nn.Sequential(ResidualBlock(d2, d3, norm_fn, 2),
                                    ResidualBlock(d3, d3, norm_fn, 1))
        self.conv2 = nn.Conv2d(d3, output_dim, 1)

    def forward(self, x):
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv2(x)


class BasicMotionEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.convc1 = nn.Conv2d(cfg.corr_planes, cfg.me_c1, 1)
        self.convc2 = nn.Conv2d(cfg.me_c1, cfg.me_c2, 3, padding=1)
        self.convf1 = nn.Conv2d(2, cfg.me_f1, 7, padding=3)
        self.convf2 = nn.Conv2d(cfg.me_f1, cfg.me_f2, 3, padding=1)
        self.conv = nn.Conv2d(cfg.me_c2 + cfg.me_f2, cfg.motion_dim - 2, 3,
                              padding=1)

    def forward(self, flow, corr):
        cor = F.relu(self.convc2(F.relu(self.convc1(corr))))
        flo = F.relu(self.convf2(F.relu(self.convf1(flow))))
        out = F.relu(self.conv(torch.cat([cor, flo], 1)))
        return torch.cat([out, flow], 1)


class SepConvGRU(nn.Module):
    def __init__(self, hidden_dim, input_dim):
        super().__init__()
        hi = hidden_dim + input_dim
        self.convz1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convr1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convq1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convz2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))
        self.convr2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))
        self.convq2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        for convz, convr, convq in ((self.convz1, self.convr1, self.convq1),
                                    (self.convz2, self.convr2, self.convq2)):
            hx = torch.cat([h, x], 1)
            z = torch.sigmoid(convz(hx))
            r = torch.sigmoid(convr(hx))
            q = torch.tanh(convq(torch.cat([r * h, x], 1)))
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    def __init__(self, input_dim, hidden_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(input_dim, hidden_dim, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_dim, 2, 3, padding=1)

    def forward(self, x):
        return self.conv2(F.relu(self.conv1(x)))


class BasicUpdateBlock(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = BasicMotionEncoder(cfg)
        self.gru = SepConvGRU(cfg.hdim, cfg.cdim + cfg.motion_dim)
        self.flow_head = FlowHead(cfg.hdim, cfg.fh_dim)
        self.mask = nn.Sequential(
            nn.Conv2d(cfg.hdim, cfg.mask_dim, 3, padding=1),
            nn.ReLU(inplace=True),
            nn.Conv2d(cfg.mask_dim, 64 * 9, 1))

    def forward(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        net = self.gru(net, torch.cat([inp, motion], 1))
        delta = self.flow_head(net)
        mask = 0.25 * self.mask(net)
        return net, mask, delta


def bilinear_sampler(img, coords):
    """grid_sample in pixel coords, align_corners=True, zeros padding."""
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


def coords_grid(batch, ht, wd):
    coords = torch.meshgrid(torch.arange(ht), torch.arange(wd),
                            indexing="ij")
    coords = torch.stack(coords[::-1], dim=0).float()
    return coords[None].repeat(batch, 1, 1, 1)


class CorrBlock:
    def __init__(self, fmap1, fmap2, num_levels=4, radius=4):
        self.num_levels = num_levels
        self.radius = radius
        b, d, h, w = fmap1.shape
        corr = torch.matmul(fmap1.view(b, d, h * w).transpose(1, 2),
                            fmap2.view(b, d, h * w))
        corr = corr.view(b, h, w, 1, h, w) / torch.sqrt(torch.tensor(float(d)))
        corr = corr.reshape(b * h * w, 1, h, w)
        self.pyramid = [corr]
        for _ in range(num_levels - 1):
            corr = F.avg_pool2d(corr, 2, stride=2)
            self.pyramid.append(corr)

    def __call__(self, coords):
        r = self.radius
        coords = coords.permute(0, 2, 3, 1)
        b, h, w, _ = coords.shape
        out = []
        for i in range(self.num_levels):
            dx = torch.linspace(-r, r, 2 * r + 1)
            dy = torch.linspace(-r, r, 2 * r + 1)
            # official quirk: (dy, dx) stacked last — the component added to
            # x varies along the window ROW axis
            delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"),
                                dim=-1)
            centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** i
            coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
            corr = bilinear_sampler(self.pyramid[i], coords_lvl)
            out.append(corr.view(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2).contiguous().float()


class RAFT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.fnet = BasicEncoder(cfg, cfg.fdim, "instance")
        self.cnet = BasicEncoder(cfg, cfg.hdim + cfg.cdim, "batch")
        self.update_block = BasicUpdateBlock(cfg)

    def upsample_flow(self, flow, mask):
        N, _, H, W = flow.shape
        mask = mask.view(N, 1, 9, 8, 8, H, W)
        mask = torch.softmax(mask, dim=2)
        up_flow = F.unfold(8 * flow, [3, 3], padding=1)
        up_flow = up_flow.view(N, 2, 9, 1, 1, H, W)
        up_flow = torch.sum(mask * up_flow, dim=2)
        up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
        return up_flow.reshape(N, 2, 8 * H, 8 * W)

    @torch.no_grad()
    def forward(self, image1, image2, iters=12):
        """images [B, 3, H, W] in [0, 255] -> (flow_low, flow_up)."""
        cfg = self.cfg
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0
        fmap1, fmap2 = self.fnet(torch.cat([image1, image2], 0)).float().chunk(2)
        corr_fn = CorrBlock(fmap1, fmap2, cfg.corr_levels, cfg.corr_radius)
        cnet = self.cnet(image1)
        net, inp = torch.split(cnet, [cfg.hdim, cfg.cdim], dim=1)
        net, inp = torch.tanh(net), torch.relu(inp)
        n, _, h8, w8 = fmap1.shape
        coords0 = coords_grid(n, h8, w8)
        coords1 = coords_grid(n, h8, w8)
        flow_up = None
        for _ in range(iters):
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, up_mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
            flow_up = self.upsample_flow(coords1 - coords0, up_mask)
        return coords1 - coords0, flow_up
