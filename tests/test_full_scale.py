"""Full-scale parity: the REAL model configs vs the torch oracle (slow).

Round-1 gap (VERDICT #1): every parity test used tiny configs, so head-dim-64
attention at 20 heads, head-dim-128 at block 2 (1280/10), the 1280-channel
GroupNorm, and converter behaviour on full-size trees were never checked.
These tests instantiate the real SVD shapes (reference
svd/unet_spatio_temporal_condition.py:75-101, svd/temporal_controlnet.py:
146-172, SVD VAE (128,256,512,512)) at fp32 on CPU with 1-2 frames and a
reduced spatial extent (the listed risk axes are channel/head counts, not
H x W).

All tests are marked slow: several minutes each on the 1-core CPU host.
Run with `pytest -m slow tests/test_full_scale.py`.
"""

import gc

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from this_and_that_vdm_tpu.models.unet import UNetSpatioTemporalConditionModel, UNetConfig
from this_and_that_vdm_tpu.models.controlnet import ControlNetModel, ControlNetConfig
from this_and_that_vdm_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
from this_and_that_vdm_tpu.weights.convert import torch_state_dict_to_flax
from torch_oracle import UNetOracle, ControlNetOracle, VAEOracle

pytestmark = pytest.mark.slow

B, F = 1, 2
H, W = 16, 24  # latent extent (128x192 pixels); channels/heads are full-size

REAL_UNET = dict(channels=(320, 640, 1280, 1280), heads=(5, 10, 10, 20),
                 ctx_dim=1024, add_dim=256, proj_dim=768)
REAL_CN = dict(channels=(320, 640, 1280, 1280), heads=(5, 10, 20, 20),
               ctx_dim=1024, add_dim=256, proj_dim=768)
REAL_VAE = dict(channels=(128, 256, 512, 512))


def _np_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _unet_inputs(seed=0):
    rng = np.random.RandomState(seed)
    sample = rng.randn(B, F, 8, H, W).astype(np.float32)
    ctx = rng.randn(B, 78, 1024).astype(np.float32)  # real 78x1024 states
    add_ids = np.array([[6.0, 200.0, 0.1]], np.float32)
    t = np.float32(1.637)
    return sample, ctx, add_ids, t


def test_full_scale_unet_parity():
    """Real UNetConfig(): (320,640,1280,1280), heads (5,10,10,20) — covers
    head_dim 64 @ 5/10/20 heads, head_dim 128 @ block 2, 1280-ch GroupNorm,
    and the converter on the full 1.5B-param tree."""
    torch.manual_seed(0)
    oracle = UNetOracle(**REAL_UNET).eval()
    params = torch_state_dict_to_flax(_np_state(oracle))

    sample, ctx, add_ids, t = _unet_inputs()
    with torch.no_grad():
        expected = oracle(
            torch.tensor(sample), torch.tensor(t), torch.tensor(ctx),
            torch.tensor(add_ids),
        ).numpy()
    del oracle
    gc.collect()

    model = UNetSpatioTemporalConditionModel(UNetConfig())
    got = model.apply(
        params,
        jnp.asarray(sample.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(t),
        jnp.asarray(ctx),
        jnp.asarray(add_ids),
    )
    got = np.asarray(got).transpose(0, 1, 4, 2, 3)
    err = np.abs(got - expected).max()
    assert err < 5e-4, err  # fp32; full-depth accumulation across 1280 ch


def test_full_scale_controlnet_parity():
    """Real ControlNetConfig(): heads (5,10,20,20) — note index 2 differs
    from the UNet (temporal_controlnet.py:168); zero convs + 12->320
    conv_in_concat at full width."""
    torch.manual_seed(1)
    oracle = ControlNetOracle(**REAL_CN).eval()
    params = torch_state_dict_to_flax(_np_state(oracle))

    sample, ctx, add_ids, t = _unet_inputs(1)
    rng = np.random.RandomState(2)
    cond = rng.randn(B, F, 4, H, W).astype(np.float32)
    with torch.no_grad():
        res_t, mid_t = oracle(
            torch.tensor(sample), torch.tensor(t), torch.tensor(ctx),
            torch.tensor(add_ids), torch.tensor(cond), scale=0.7,
        )
    del oracle
    gc.collect()

    cn = ControlNetModel(ControlNetConfig())
    res_j, mid_j = cn.apply(
        params,
        jnp.asarray(sample.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(t),
        jnp.asarray(ctx),
        jnp.asarray(add_ids),
        jnp.asarray(cond.transpose(0, 1, 3, 4, 2)),
        conditioning_scale=0.7,
    )

    def _flat(x):
        a = np.asarray(x).transpose(0, 1, 4, 2, 3)
        return a.reshape(-1, *a.shape[2:])

    assert len(res_j) == len(res_t)
    for rj, rt in zip(res_j, res_t):
        err = np.abs(_flat(rj) - rt.numpy()).max()
        assert err < 5e-4, (rj.shape, err)
    assert np.abs(_flat(mid_j) - mid_t.numpy()).max() < 5e-4


def test_full_scale_vae_parity():
    """Real SVD VAE (128,256,512,512): encoder mode-latents + temporal
    decoder at full channel width."""
    torch.manual_seed(2)
    oracle = VAEOracle(**REAL_VAE).eval()
    params = torch_state_dict_to_flax(_np_state(oracle))

    rng = np.random.RandomState(3)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    z = rng.randn(F, 4, 8, 12).astype(np.float32)
    with torch.no_grad():
        lat_t = oracle.encode_mode(torch.tensor(x)).numpy()
        dec_t = oracle.decoder(torch.tensor(z), num_frames=F).numpy()
    del oracle
    gc.collect()

    vae = AutoencoderKLTemporalDecoder(VAEConfig())
    lat_j = vae.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), method="encode_mode")
    assert np.abs(np.asarray(lat_j).transpose(0, 3, 1, 2) - lat_t).max() < 5e-4

    dec_j = vae.apply(
        params,
        jnp.asarray(z.transpose(0, 2, 3, 1)).reshape(1, F, 8, 12, 4),
        method="decode",
    )
    dec_j = np.asarray(dec_j).reshape(F, 64, 96, 3).transpose(0, 3, 1, 2)
    assert np.abs(dec_j - dec_t).max() < 5e-4
