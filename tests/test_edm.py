"""EDM training transform parity vs direct torch math (train_svd.py:709-833)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from this_and_that_vdm_tpu.training import edm


def test_precondition_matches_reference_formulas():
    rng = np.random.RandomState(0)
    lat = rng.randn(3, 4, 8, 8, 4).astype(np.float32)
    eps = rng.randn(*lat.shape).astype(np.float32)
    sig = np.array([0.3, 1.7, 12.0], np.float32)

    noisy, inp, t = edm.edm_precondition(jnp.asarray(lat), jnp.asarray(eps), jnp.asarray(sig))

    s = torch.tensor(sig)[:, None, None, None, None]
    tl = torch.tensor(lat)
    noisy_t = tl + torch.tensor(eps) * s
    inp_t = noisy_t / ((s**2 + 1) ** 0.5)
    assert np.allclose(np.asarray(noisy), noisy_t.numpy(), atol=1e-6)
    assert np.allclose(np.asarray(inp), inp_t.numpy(), atol=1e-6)
    assert np.allclose(np.asarray(t), 0.25 * np.log(sig), atol=1e-5)


def test_loss_matches_reference_formulas():
    rng = np.random.RandomState(1)
    pred = rng.randn(2, 3, 4, 4, 4).astype(np.float32)
    noisy = rng.randn(*pred.shape).astype(np.float32)
    target = rng.randn(*pred.shape).astype(np.float32)
    sig = np.array([0.5, 4.0], np.float32)

    got = float(edm.edm_loss(jnp.asarray(pred), jnp.asarray(noisy), jnp.asarray(target), jnp.asarray(sig)))

    s = torch.tensor(sig)[:, None, None, None, None]
    c_out = -s / (s**2 + 1) ** 0.5
    c_skip = 1 / (s**2 + 1)
    denoised = torch.tensor(pred) * c_out + c_skip * torch.tensor(noisy)
    weigh = (1 + s**2) * s**-2.0
    loss = torch.mean(
        (weigh * (denoised - torch.tensor(target)) ** 2).reshape(2, -1), dim=1
    ).mean()
    assert np.isclose(got, float(loss), rtol=1e-5)


def test_sigma_distribution_moments():
    key = jax.random.PRNGKey(0)
    s = edm.sample_sigmas(key, 200_000, loc=0.5, scale=1.4)
    logs = np.log(np.asarray(s))
    assert abs(logs.mean() - 0.5) < 0.02
    assert abs(logs.std() - 1.4) < 0.02


def test_conditioning_dropout_masks():
    key = jax.random.PRNGKey(3)
    states = jnp.ones((1000, 78, 8))
    cond = jnp.ones((1000, 4, 4, 4))
    s2, c2 = edm.conditioning_dropout(key, states, cond, prob=0.1)
    drop_text = float((np.asarray(s2)[:, 0, 0] == 0).mean())
    drop_img = float((np.asarray(c2)[:, 0, 0, 0] == 0).mean())
    # text dropped with p<0.2; image dropped for 0.1<=p<0.3
    assert abs(drop_text - 0.2) < 0.05
    assert abs(drop_img - 0.2) < 0.05
