"""LPIPS perceptual metric (AlexNet backbone) in JAX.

The reference lists ``lpips`` (and pyiqa) in requirements.txt:18,26 for
offline perceptual evaluation but ships no driver (SURVEY §4.3).  This is
the in-framework driver: the standard LPIPS-alex formulation —

    d(x, y) = sum_l mean_hw || w_l ⊙ (phi_l(x)^ - phi_l(y)^) ||_2^2

where phi_l are AlexNet relu features, ^ is channel-unit-normalisation and
w_l are the learned non-negative 1x1 weights — as pure jitted JAX,
channels-last.

Weights: ``lpips_params_from_torch(alexnet_state, lin_state)`` converts the
torchvision AlexNet ``features`` state dict plus the LPIPS ``lin*`` weights
(the two files the lpips pip package combines).  Without weights the module
still runs (random init) for smoke/integration tests; calibrated scores
require the converted checkpoint.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ImageNet normalisation used by LPIPS's ScalingLayer (lpips/lpips.py).
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# torchvision AlexNet `features` conv layer indices and shapes.
_ALEX_CONVS = (
    # (torch features idx, out_ch, kernel, stride, pad)
    (0, 64, 11, 4, 2),
    (3, 192, 5, 1, 2),
    (6, 384, 3, 1, 1),
    (8, 256, 3, 1, 1),
    (10, 256, 3, 1, 1),
)
_CHANNELS = tuple(c for _, c, *_ in _ALEX_CONVS)


class _AlexFeatures(nn.Module):
    """torchvision AlexNet ``features`` trunk; returns the 5 relu outputs."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        feats = []
        for i, (idx, ch, k, s, p) in enumerate(_ALEX_CONVS):
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), name=f"conv{idx}")(x)
            x = jax.nn.relu(x)
            feats.append(x)
            if i < 2:  # maxpool after relu1 and relu2
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """LPIPS-alex distance between two [B, H, W, 3] images in [-1, 1]."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, jnp.float32)
        scale = jnp.asarray(_SCALE, jnp.float32)
        net = _AlexFeatures(name="net")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)

        total = jnp.zeros(x.shape[0], jnp.float32)
        for li, (gx, gy) in enumerate(zip(fx, fy)):
            nx = gx * jax.lax.rsqrt(
                jnp.sum(jnp.square(gx), -1, keepdims=True) + 1e-10)
            ny = gy * jax.lax.rsqrt(
                jnp.sum(jnp.square(gy), -1, keepdims=True) + 1e-10)
            diff2 = jnp.square(nx - ny)
            w = self.param(f"lin{li}", nn.initializers.uniform(0.1),
                           (_CHANNELS[li],), jnp.float32)
            # learned non-negative 1x1 conv then spatial mean
            total = total + jnp.mean(jnp.sum(diff2 * w, axis=-1), axis=(1, 2))
        return total


def lpips_params_from_torch(alexnet_state: Mapping[str, np.ndarray],
                            lin_state: Mapping[str, np.ndarray]) -> Dict:
    """torchvision ``alexnet`` state dict (``features.N.weight/bias``) +
    LPIPS linear weights (``lin{i}.model.1.weight``, shape [1, C, 1, 1]) ->
    flax params for :class:`LPIPS`."""
    params: Dict = {"net": {}}
    for idx, *_ in _ALEX_CONVS:
        w = np.asarray(alexnet_state[f"features.{idx}.weight"])
        b = np.asarray(alexnet_state[f"features.{idx}.bias"])
        params["net"][f"conv{idx}"] = {
            "kernel": w.transpose(2, 3, 1, 0), "bias": b}
    for li in range(len(_ALEX_CONVS)):
        key = f"lin{li}.model.1.weight"
        w = np.asarray(lin_state[key]).reshape(-1)
        params[f"lin{li}"] = w
    return {"params": params}


def lpips_fn(params):
    """Jitted ``(x, y) -> [B]`` distance; inputs [B, H, W, 3] in [-1, 1]."""
    model = LPIPS()

    @jax.jit
    def run(x, y):
        return model.apply(params, x, y)

    return run


def video_lpips(params, frames_a: np.ndarray, frames_b: np.ndarray) -> float:
    """Mean LPIPS over corresponding frames ([F, H, W, 3] uint8 or [0,1])."""
    a = np.asarray(frames_a, np.float32)
    b = np.asarray(frames_b, np.float32)
    if a.max() > 1.5:
        a, b = a / 255.0, b / 255.0
    a = a * 2.0 - 1.0
    b = b * 2.0 - 1.0
    return float(np.mean(np.asarray(lpips_fn(params)(jnp.asarray(a),
                                                     jnp.asarray(b)))))
