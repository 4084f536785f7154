"""Temporal-VAE parity: flax encoder/decoder + converter vs torch oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from this_and_that_vdm_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
from this_and_that_vdm_tpu.weights.convert import torch_state_dict_to_flax
from torch_oracle import VAEOracle


@pytest.fixture(scope="module")
def vae_pair():
    torch.manual_seed(0)
    oracle = VAEOracle().eval()
    params = torch_state_dict_to_flax(
        {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    )
    model = AutoencoderKLTemporalDecoder(VAEConfig.tiny())
    return oracle, model, params


def test_encoder_parity(vae_pair):
    oracle, model, params = vae_pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 48).astype(np.float32)
    with torch.no_grad():
        expected = oracle.encode_mode(torch.tensor(x)).numpy()
    got = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), method="encode_mode")
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == expected.shape == (2, 4, 4, 6)
    assert np.allclose(got, expected, atol=5e-5), np.abs(got - expected).max()


def test_decoder_parity(vae_pair):
    oracle, model, params = vae_pair
    rng = np.random.RandomState(1)
    B, F = 1, 3
    z = rng.randn(B * F, 4, 4, 6).astype(np.float32)
    with torch.no_grad():
        expected = oracle.decoder(torch.tensor(z), num_frames=F).numpy()
    zj = jnp.asarray(z.transpose(0, 2, 3, 1).reshape(B, F, 4, 6, 4))
    got = model.apply(params, zj, method="decode")
    got = np.asarray(got).reshape(B * F, 32, 48, 3).transpose(0, 3, 1, 2)
    assert np.allclose(got, expected, atol=5e-5), np.abs(got - expected).max()
