"""EDM training-time transforms (sigma sampling, preconditioning, loss weight).

Numerics match the reference VL/VGL trainers (reference:
train_code/train_svd.py:235-238 ``rand_log_normal``, :732-737 noising +
``c_in``, :791 continuous timestep, :805-818 EDM reconstruction + loss):

    sigma  ~ exp(Normal(loc, scale))           loc=0.5  scale=1.4 (configs)
    noisy  = latents + eps * sigma
    input  = noisy / sqrt(sigma^2 + 1)                       (c_in)
    t      = 0.25 * ln(sigma)
    D      = pred * c_out + c_skip * noisy
             c_out  = -sigma / sqrt(sigma^2+1)
             c_skip = 1 / (sigma^2+1)
    loss   = mean_b[ mean_pix( w * (D - latents)^2 ) ],  w = (1+sigma^2)/sigma^2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_sigmas(
    key: jax.Array, batch: int, loc: float = 0.5, scale: float = 1.4
) -> jnp.ndarray:
    """Log-normal sigma draw; one sigma per batch element, float32 ``[B]``.

    The reference draws u ~ U(eps, 1-eps) and maps through the normal inverse
    CDF (train_svd.py:235-238); sampling the normal directly is the same
    distribution.
    """
    return jnp.exp(loc + scale * jax.random.normal(key, (batch,), jnp.float32))


def edm_precondition(latents: jnp.ndarray, noise: jnp.ndarray, sigmas: jnp.ndarray):
    """Returns (noisy_latents, scaled_input, timesteps).

    ``latents``/``noise``: ``[B, F, H, W, C]`` (or any rank with leading B).
    ``sigmas``: ``[B]``.
    """
    s = sigmas.reshape(sigmas.shape[0], *([1] * (latents.ndim - 1)))
    noisy = latents + noise * s
    inp = noisy / jnp.sqrt(s * s + 1.0)
    timesteps = 0.25 * jnp.log(sigmas)
    return noisy, inp, timesteps


def edm_loss(
    model_pred: jnp.ndarray,
    noisy_latents: jnp.ndarray,
    target_latents: jnp.ndarray,
    sigmas: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted EDM reconstruction MSE (scalar, float32)."""
    s = sigmas.reshape(sigmas.shape[0], *([1] * (model_pred.ndim - 1)))
    s = s.astype(jnp.float32)
    pred = model_pred.astype(jnp.float32)
    noisy = noisy_latents.astype(jnp.float32)
    target = target_latents.astype(jnp.float32)

    c_out = -s / jnp.sqrt(s * s + 1.0)
    c_skip = 1.0 / (s * s + 1.0)
    denoised = pred * c_out + c_skip * noisy
    weight = (1.0 + s * s) / (s * s)
    per_sample = jnp.mean(
        (weight * (denoised - target) ** 2).reshape(target.shape[0], -1), axis=1
    )
    return jnp.mean(per_sample)


def conditioning_dropout(
    key: jax.Array,
    encoder_hidden_states: jnp.ndarray,
    conditional_latents: jnp.ndarray,
    prob: float,
):
    """InstructPix2Pix-style conditioning dropout (train_svd.py:744-762).

    One uniform draw ``p`` per batch element drives both masks:
      * text/CLIP states zeroed when ``p < 2*prob``
      * image latents zeroed when NOT (``prob <= p < 3*prob``) is false, i.e.
        kept iff ``p < prob`` or ``p >= 3*prob``.
    """
    b = encoder_hidden_states.shape[0]
    p = jax.random.uniform(key, (b,))
    prompt_mask = (p < 2.0 * prob).reshape(b, 1, 1)
    states = jnp.where(prompt_mask, jnp.zeros_like(encoder_hidden_states), encoder_hidden_states)
    image_keep = 1.0 - ((p >= prob) & (p < 3.0 * prob)).astype(conditional_latents.dtype)
    image_keep = image_keep.reshape(b, *([1] * (conditional_latents.ndim - 1)))
    return states, conditional_latents * image_keep
