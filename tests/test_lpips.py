"""LPIPS-alex parity vs a from-scratch torch oracle through the converter."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from this_and_that_vdm_tpu.utils.lpips import (
    LPIPS, lpips_fn, lpips_params_from_torch, video_lpips)

SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _alexnet_features():
    # torchvision alexnet.features layout (indices matter for the state dict)
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU())  # final MaxPool (idx 12)
    # of torchvision alexnet is after the last relu — unused by LPIPS and
    # breaks on tiny test inputs, so it is omitted (no params, no key shift)


def _oracle_lpips(features, lins, x, y):
    def feats(z):
        z = (z - SHIFT) / SCALE
        out = []
        for i, layer in enumerate(features):
            z = layer(z)
            if i in (1, 4, 7, 9, 11):  # relu outputs
                out.append(z)
        return out

    total = torch.zeros(x.shape[0])
    for fx, fy, w in zip(feats(x), feats(y), lins):
        nx = fx / torch.sqrt((fx ** 2).sum(1, keepdim=True) + 1e-10)
        ny = fy / torch.sqrt((fy ** 2).sum(1, keepdim=True) + 1e-10)
        d = F.conv2d((nx - ny) ** 2, w)
        total = total + d.mean((2, 3)).squeeze(1)
    return total


def test_lpips_parity_and_properties():
    torch.manual_seed(0)
    features = _alexnet_features().eval()
    channels = [64, 192, 384, 256, 256]
    lins = [torch.rand(1, c, 1, 1) * 0.1 for c in channels]

    alex_state = {f"features.{k}": v.detach().numpy()
                  for k, v in features.state_dict().items()}
    lin_state = {f"lin{i}.model.1.weight": w.numpy()
                 for i, w in enumerate(lins)}
    params = lpips_params_from_torch(alex_state, lin_state)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 35, 35)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 35, 35)).astype(np.float32)

    with torch.no_grad():
        ref = _oracle_lpips(features, lins,
                            torch.from_numpy(x), torch.from_numpy(y)).numpy()
    ours = np.asarray(lpips_fn(params)(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)

    # identity -> 0; distance is symmetric and non-negative
    same = np.asarray(lpips_fn(params)(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(same, 0.0, atol=1e-6)

    # video driver accepts uint8 frame stacks
    fa = rng.integers(0, 255, (3, 35, 35, 3), np.uint8)
    fb = rng.integers(0, 255, (3, 35, 35, 3), np.uint8)
    v = video_lpips(params, fa, fb)
    assert np.isfinite(v) and v >= 0.0
    assert video_lpips(params, fa, fa) < 1e-6
