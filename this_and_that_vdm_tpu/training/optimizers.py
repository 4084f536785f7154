"""Block-quantised 8-bit AdamW — the bitsandbytes-parity optimizer.

The reference trains with bitsandbytes' CUDA 8-bit Adam to halve optimizer
memory (train_code/train_svd.py:495-506, SURVEY §2.9 item 3).  TPU-native
equivalent: both Adam moments live as int8 codebook indices with per-block
absmax scales (block = 256 elements along the flattened tensor),
dequantised/requantised inside the (jitted) update — 4x less optimizer HBM
than fp32 Adam, all vectorised, no Python per-tensor loops.

Quantisation is **dynamic** (log-spaced codebook), like bitsandbytes'
dynamic-tree maps, NOT linear absmax: the second moment spans many decades
within one 256-element block, and under linear int8 every entry below
absmax/254 rounds to zero, collapsing ``sqrt(nhat)+eps`` to ``eps`` and
exploding the step (measured: a 2-layer MLP diverges within 60 steps —
cli/adam8bit_ab.py found this in round 2).  The log codebook gives ~7
decades of relative resolution:

  * mu  (signed):  127 magnitudes ``10**linspace(-7, 0, 127)`` x sign + 0
  * nu  (unsigned, non-negative): 255 magnitudes + 0

Quantise = nearest codebook entry of x/absmax, computed in **closed form**:
the codebook is exactly log-spaced (constant ratio r between entries), so the
nearest-by-midpoint index is ``floor(log10(|v| / (mid * 1e-7)) / step) + 1``
with ``mid = (1+r)/2`` — one log and a handful of VPU ops per element.
Dequantise = one 256-entry gather.  (Round 2 note: the original
``jnp.searchsorted`` formulation, while numerically identical and fine in
isolation, reproducibly faulted the TPU worker when fused into the full
VGL train step — bisected to this file; the closed form avoids the op
entirely and is cheaper anyway.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.quant8 import (  # single source of the closed forms (see quant8)
    BLOCK, DECADES as _DECADES, decode as _q8_decode, encode as _q8_encode,
    log_index as _q8_log_index,
)


def _make_codebook(signed: bool) -> np.ndarray:
    mags = 10.0 ** np.linspace(-_DECADES, 0.0, 127 if signed else 255)
    if signed:
        cb = np.concatenate([-mags[::-1], [0.0], mags])  # 255 entries
    else:
        cb = np.concatenate([[0.0], mags])  # 256 entries
    return cb.astype(np.float32)


_CODEBOOKS = {True: _make_codebook(True), False: _make_codebook(False)}
_N_MAGS = {True: 127, False: 255}


class _Q(NamedTuple):
    q: jnp.ndarray  # uint8 codebook indices, padded flat [n_blocks * BLOCK]
    scale: jnp.ndarray  # float32 per-block absmax [n_blocks]


def _log_index(a: jnp.ndarray, n_mags: int):
    """Nearest-magnitude codebook index of ``a`` (non-negative, <= 1); the
    closed form lives in ``ops.quant8.log_index`` (shared with the fused
    Pallas kernel so the two paths stay bit-identical).  Returns (int32
    index in [0, n_mags-1], is_zero mask)."""
    j, zero = _q8_log_index(a, n_mags)
    return j.astype(jnp.int32), zero


def _quantize(x: jnp.ndarray, signed: bool = True) -> _Q:
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % BLOCK
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1)
    safe = jnp.where(scale > 0, scale, 1.0)
    q = _q8_encode(blocks / safe[:, None], signed, _N_MAGS[signed])
    return _Q(q.astype(jnp.uint8).reshape(-1), scale)


def _dequantize(qv: _Q, shape, signed: bool = True) -> jnp.ndarray:
    """Closed-form dequantise (shared form in ``ops.quant8.decode``): one
    exp2 per element on the VPU.  A 256-entry table *gather* here costs
    ~90x the whole update on TPU (measured: 9.7 s vs 0.11 s for a
    0.58B-param tree), so the table (kept in ``_CODEBOOKS`` for tests) is
    never gathered."""
    q = qv.q.reshape(-1, BLOCK)
    blocks = _q8_decode(q.astype(jnp.float32), signed, _N_MAGS[signed])
    blocks = blocks * qv.scale[:, None]
    n = 1
    for s in shape:
        n *= s
    return blocks.reshape(-1)[:n].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Params  # pytree of _Q (signed codebook)
    nu: optax.Params  # pytree of _Q (unsigned codebook)


_KERNEL_MIN_BLOCKS = 32  # leaves below 32 blocks (8K params) stay on jnp


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                      sequential: bool = True,
                      kernel: str | bool = False):
    """``sequential=True`` chains the per-tensor updates with
    ``lax.optimization_barrier`` so XLA schedules them one after another:
    otherwise every leaf's fp32 dequantise/requantise temporaries (up to
    ~2x leaf size each) are live at once, which costs gigabytes of HBM peak
    on a 1.5B-param tree and OOMs a 16G chip. Numerically identical.

    ``kernel="auto"`` uses the fused single-pass Pallas update
    (ops/adam8bit_pallas.py) for every leaf of >=32 blocks on TPU — one
    kernel launch per leaf instead of ~6-8 XLA fusions; the launch-overhead
    fix for the ~500-leaf trees (PERF.md "8-bit Adam kernel study").
    ``True`` forces it (interpret mode off-TPU, tests only), ``False``
    disables it.  The trainer defaults to "auto" since the real-chip A/B
    measured +10.4% full-VGL-step throughput (2.303 vs 2.087 steps/s,
    perf_r3/train_vgl_adamkernel.json); this low-level default stays False
    so direct callers opt in explicitly."""

    def init(params):
        zeros = jax.tree.map(
            lambda p: _quantize(jnp.zeros_like(p, jnp.float32), True), params)
        zeros2 = jax.tree.map(
            lambda p: _quantize(jnp.zeros_like(p, jnp.float32), False), params)
        return Adam8bitState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=zeros2)

    def update(grads, state, params=None):
        count = state.count + 1

        def _use_kernel(n_blocks: int) -> bool:
            if kernel is False or n_blocks < _KERNEL_MIN_BLOCKS:
                return False
            if kernel is True:
                return True
            from ..ops import adam8bit_pallas

            return adam8bit_pallas.supported()

        cf = count.astype(jnp.float32)
        bc = jnp.stack([1 - b1 ** cf, 1 - b2 ** cf]).reshape(1, 2)

        def upd(g, mq, nq):
            g = g.astype(jnp.float32)
            nb = mq.scale.shape[0]
            if _use_kernel(nb):
                from ..ops.adam8bit_pallas import adam8bit_leaf_update

                gf = g.reshape(-1)
                pad = nb * BLOCK - gf.size
                if pad:
                    gf = jnp.pad(gf, (0, pad))
                step2d, mq2, ms2, nq2, ns2 = adam8bit_leaf_update(
                    gf.reshape(nb, BLOCK),
                    mq.q.reshape(nb, BLOCK), mq.scale.reshape(nb, 1),
                    nq.q.reshape(nb, BLOCK), nq.scale.reshape(nb, 1), bc,
                    b1=b1, b2=b2, eps=eps, interpret=kernel is True and
                    jax.default_backend() != "tpu")
                step = step2d.reshape(-1)[:g.size].reshape(g.shape)
                return (step, _Q(mq2.reshape(-1), ms2.reshape(-1)),
                        _Q(nq2.reshape(-1), ns2.reshape(-1)))
            m = b1 * _dequantize(mq, g.shape, True) + (1 - b1) * g
            n = b2 * _dequantize(nq, g.shape, False) + (1 - b2) * g * g
            mhat = m / bc[0, 0]
            nhat = n / bc[0, 1]
            step = mhat / (jnp.sqrt(nhat) + eps)
            return step, _quantize(m, True), _quantize(n, False)

        flat_g, treedef = jax.tree.flatten(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_n = treedef.flatten_up_to(state.nu)
        out = []
        token = count
        for g, m, n in zip(flat_g, flat_m, flat_n):
            if sequential:
                # all-inputs-before-any-output: leaf i cannot start until
                # leaf i-1's requantised scale (the token) is computed.
                g, m, n, token = jax.lax.optimization_barrier((g, m, n, token))
            step, mq, nq = upd(g, m, n)
            token = mq.scale[0]
            out.append((step, mq, nq))
        steps = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return steps, Adam8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def adamw8bit(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2,
              kernel: str | bool = False):
    return optax.chain(
        scale_by_adam8bit(b1, b2, eps, kernel=kernel),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
