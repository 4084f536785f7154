"""Shared closed-form log-codebook int8 quantiser element math.

Single source of truth for the dynamic (bitsandbytes-style) 8-bit moment
quantisation used by BOTH the jnp optimizer path
(``training/optimizers.py``) and the fused Pallas kernel
(``ops/adam8bit_pallas.py``).  The two paths are contract-bound to be
bit-identical (tests/test_optimizers.py equivalence tests); keeping the
codebook constants and the encode/decode closed forms here means a future
codebook tweak cannot silently break that equivalence.

Codebook layout (magnitudes ``10**linspace(-DECADES, 0, n_mags)``):
  * signed   (mu, n_mags=127): [0..126] = -mags reversed, [127] = 0,
    [128..254] = +mags
  * unsigned (nu, n_mags=255): [0] = 0, [1..255] = mags

Everything is pure jnp arithmetic (no gathers, no searchsorted): a
256-entry table gather costs ~90x the whole Adam update on TPU and
``jnp.searchsorted`` faulted the TPU worker inside the full train step
(PERF.md round-2 bisect).  All math in log2 because Mosaic lowers ``exp2``
/ ``log2`` natively.
"""

from __future__ import annotations

import jax.numpy as jnp

BLOCK = 256  # quantisation block (per-block fp32 absmax scale)
DECADES = 7.0  # relative dynamic range 1e-7 .. 1 (bitsandbytes-like)
LOG2_10 = 3.321928094887362


def log_index(a: jnp.ndarray, n_mags: int):
    """Nearest-magnitude codebook index of ``a`` (non-negative, <= 1).

    Magnitudes have constant ratio ``r = 10**(DECADES/(n-1))``; the linear
    midpoint between entries j and j+1 is ``mags[j]*(1+r)/2``, so the count
    of midpoints below ``a`` — the nearest index — is closed-form.  Returns
    (float index in [0, n_mags-1], is_zero mask for the below-smallest-
    midpoint bucket)."""
    step = DECADES / (n_mags - 1)
    mid = (1.0 + 10.0 ** step) / 2.0
    lo = 10.0 ** (-DECADES)
    j = jnp.floor(jnp.log2(jnp.maximum(a, lo * 1e-6) / (mid * lo))
                  / (step * LOG2_10)) + 1.0
    return jnp.clip(j, 0.0, n_mags - 1.0), a < lo / 2.0


def encode(v: jnp.ndarray, signed: bool, n_mags: int) -> jnp.ndarray:
    """Normalised values (|v| <= 1) -> float codebook indices (cast to uint8
    by the caller)."""
    j, zero = log_index(jnp.abs(v), n_mags)
    if signed:
        return jnp.where(zero, 127.0, jnp.where(v >= 0.0, 128.0 + j, 126.0 - j))
    return jnp.where(zero, 0.0, 1.0 + j)


def decode(qf: jnp.ndarray, signed: bool, n_mags: int) -> jnp.ndarray:
    """Float codebook indices -> signed magnitudes (unscaled): one exp2 per
    element on the VPU, never a table gather."""
    step = DECADES / (n_mags - 1)
    if signed:
        j = jnp.where(qf >= 128.0, qf - 128.0, 126.0 - qf)
        sign = jnp.where(qf == 127.0, 0.0, jnp.where(qf >= 128.0, 1.0, -1.0))
    else:
        j = qf - 1.0
        sign = jnp.where(qf == 0.0, 0.0, 1.0)
    return sign * jnp.exp2((j * step - DECADES) * LOG2_10)
