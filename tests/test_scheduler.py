"""Scheduler numerics vs the published SVD EulerDiscrete/EDM configuration."""

import numpy as np
import jax.numpy as jnp

from this_and_that_vdm_tpu.schedulers import make_svd_schedule
from this_and_that_vdm_tpu.schedulers.euler_discrete import karras_sigmas


def test_karras_ladder_endpoints():
    s = karras_sigmas(25)
    assert np.isclose(s[0], 700.0)
    assert np.isclose(s[-1], 0.002)
    assert np.all(np.diff(s) < 0)


def test_karras_interior_value_closed_form():
    # Independent closed-form spot check at i=12 of 25 (ramp value 0.5).
    rho = 7.0
    expected = (700.0 ** (1 / rho) + 0.5 * (0.002 ** (1 / rho) - 700.0 ** (1 / rho))) ** rho
    s = karras_sigmas(25)
    assert np.isclose(s[12], expected, rtol=1e-12)


def test_schedule_shapes_and_init_sigma():
    sched = make_svd_schedule(25)
    assert sched.sigmas.shape == (26,)
    assert sched.sigmas[-1] == 0.0
    assert sched.timesteps.shape == (25,)
    # timestep_spacing "leading" -> sqrt(sigma_max^2 + 1)
    assert np.isclose(sched.init_noise_sigma, np.sqrt(700.0**2 + 1.0))
    # continuous timestep type: t = 0.25 ln sigma
    assert np.allclose(sched.timesteps, 0.25 * np.log(sched.sigmas[:-1]), atol=1e-6)


def test_scale_model_input():
    sched = make_svd_schedule(25)
    x = jnp.ones((2, 3), jnp.float32) * 5.0
    got = sched.scale_model_input(x, 0)
    sigma = sched.sigmas[0]
    assert np.allclose(np.asarray(got), 5.0 / np.sqrt(sigma**2 + 1.0), rtol=1e-6)


def test_euler_step_matches_manual_edm_math():
    sched = make_svd_schedule(25)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4).astype(np.float32)
    pred = rng.randn(2, 4).astype(np.float32)
    i = 7
    got = np.asarray(sched.step(jnp.asarray(pred), i, jnp.asarray(x)))

    sigma = float(sched.sigmas[i])
    sigma_next = float(sched.sigmas[i + 1])
    denoised = pred * (-sigma / np.sqrt(sigma**2 + 1)) + x / (sigma**2 + 1)
    expected = x + (x - denoised) / sigma * (sigma_next - sigma)
    assert np.allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_full_scan_converges_for_identity_denoiser():
    # If the model perfectly predicts the EDM target for data x0=0, the ODE
    # must drive any start point to ~0 at sigma=0.
    sched = make_svd_schedule(25)
    x = jnp.full((4,), sched.init_noise_sigma, jnp.float32)
    for i in range(sched.num_steps):
        sigma = sched.sigmas[i]
        # model_output that makes denoised == 0: solve 0 = c_out*m + c_skip*x
        m = (x / (sigma**2 + 1)) * jnp.sqrt(sigma**2 + 1.0) / sigma
        x = sched.step(m, i, x)
    assert np.allclose(np.asarray(x), 0.0, atol=1e-4)
