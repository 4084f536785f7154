"""EulerDiscrete EDM scheduler (Karras sigmas) as pure JAX.

Replicates the numerics of the EulerDiscreteScheduler configuration shipped
with ``stabilityai/stable-video-diffusion-img2vid`` as used by the reference
(This&That VDM) pipelines (reference: svd/pipeline_stable_video_diffusion.py:
496 ``set_timesteps``, :531 ``scale_model_input``, :551 ``step``; scheduler
config registered at :100-116).  The relevant configuration is::

    prediction_type      = "v_prediction"
    timestep_type        = "continuous"     ->  t_i = 0.25 * ln(sigma_i)
    use_karras_sigmas    = True, rho = 7
    sigma_min, sigma_max = 0.002, 700.0
    timestep_spacing     = "leading"        ->  init_noise_sigma = sqrt(s_max^2+1)
    s_churn              = 0 (default)      ->  pure ODE Euler step

With ``use_karras_sigmas`` and a continuous timestep type, the training-beta
grid never enters the inference math: the sigma ladder is the closed-form
Karras ramp from ``sigma_max`` down to ``sigma_min`` and the timesteps are a
pure function of the sigmas.  Everything here is static (host-side numpy) so
the denoise loop can be a ``lax.scan`` over a precomputed sigma table.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

SVD_SIGMA_MIN = 0.002
SVD_SIGMA_MAX = 700.0
SVD_RHO = 7.0


@dataclasses.dataclass(frozen=True)
class EulerDiscreteSchedule:
    """A fully-materialised inference schedule.

    Attributes:
      sigmas: ``[num_steps + 1]`` float32 — Karras sigma ladder with a final 0.
      timesteps: ``[num_steps]`` float32 — ``0.25 * ln(sigma_i)`` (continuous).
      init_noise_sigma: scalar — multiply unit Gaussian noise by this to get
        the starting latent (reference: prepare_latents ``* init_noise_sigma``).
      num_steps: number of denoising steps.
    """

    sigmas: np.ndarray
    timesteps: np.ndarray
    init_noise_sigma: float
    num_steps: int

    def scale_model_input(self, sample: jnp.ndarray, step_index) -> jnp.ndarray:
        """EDM c_in preconditioning: ``x / sqrt(sigma^2 + 1)``."""
        sigma = jnp.asarray(self.sigmas)[step_index]
        return sample / jnp.sqrt(sigma * sigma + 1.0)

    def step(
        self,
        model_output: jnp.ndarray,
        step_index,
        sample: jnp.ndarray,
    ) -> jnp.ndarray:
        """One Euler ODE step: x_{i+1} = x_i + (x_i - D(x_i)) / sigma_i * dt.

        ``model_output`` is the raw UNet output; with v-prediction EDM
        parameterisation the denoised estimate is
        ``D = c_out * model_output + c_skip * x`` with
        ``c_out = -sigma/sqrt(sigma^2+1)`` and ``c_skip = 1/(sigma^2+1)``.
        """
        sigmas = jnp.asarray(self.sigmas, dtype=jnp.float32)
        sigma = sigmas[step_index]
        sigma_next = sigmas[step_index + 1]

        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        denoised = out * (-sigma / jnp.sqrt(sigma * sigma + 1.0)) + x / (
            sigma * sigma + 1.0
        )
        derivative = (x - denoised) / sigma
        prev = x + derivative * (sigma_next - sigma)
        return prev.astype(sample.dtype)


def karras_sigmas(
    num_steps: int,
    sigma_min: float = SVD_SIGMA_MIN,
    sigma_max: float = SVD_SIGMA_MAX,
    rho: float = SVD_RHO,
) -> np.ndarray:
    """Karras et al. (2022) eq. 5 sigma ramp, descending from sigma_max."""
    ramp = np.linspace(0.0, 1.0, num_steps, dtype=np.float64)
    min_inv_rho = sigma_min ** (1.0 / rho)
    max_inv_rho = sigma_max ** (1.0 / rho)
    return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho


def make_svd_schedule(num_steps: int = 25) -> EulerDiscreteSchedule:
    """Build the SVD inference schedule for ``num_steps`` denoising steps."""
    sig = karras_sigmas(num_steps)
    timesteps = 0.25 * np.log(sig)
    sigmas = np.concatenate([sig, [0.0]]).astype(np.float32)
    # timestep_spacing "leading" (not linspace/trailing) -> sqrt(max^2 + 1).
    init_noise_sigma = float(np.sqrt(np.max(sigmas) ** 2 + 1.0))
    return EulerDiscreteSchedule(
        sigmas=sigmas,
        timesteps=timesteps.astype(np.float32),
        init_noise_sigma=init_noise_sigma,
        num_steps=num_steps,
    )
