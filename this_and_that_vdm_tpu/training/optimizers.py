"""Block-quantised 8-bit AdamW — the bitsandbytes-parity optimizer.

The reference trains with bitsandbytes' CUDA 8-bit Adam to halve optimizer
memory (train_code/train_svd.py:495-506, SURVEY §2.9 item 3).  TPU-native
equivalent: both Adam moments live as int8 with per-block absmax scales
(block = 256 elements along the flattened tensor), dequantised/requantised
inside the (jitted) update — 4x less optimizer HBM than fp32 Adam, all
vectorised, no Python per-tensor loops.

Linear symmetric quantisation is used for both moments (bitsandbytes uses
dynamic-tree quantisation; linear-absmax is a close, simpler cousin — the
training-quality impact is comparable and it maps cleanly onto the VPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


class _Q(NamedTuple):
    q: jnp.ndarray  # int8 payload, padded flat [n_blocks * BLOCK]
    scale: jnp.ndarray  # float32 [n_blocks]


def _quantize(x: jnp.ndarray) -> _Q:
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % BLOCK
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(blocks / safe[:, None]), -127, 127).astype(jnp.int8)
    return _Q(q.reshape(-1), scale)


def _dequantize(qv: _Q, shape) -> jnp.ndarray:
    blocks = qv.q.reshape(-1, BLOCK).astype(jnp.float32) * qv.scale[:, None]
    n = 1
    for s in shape:
        n *= s
    return blocks.reshape(-1)[:n].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Params  # pytree of _Q
    nu: optax.Params  # pytree of _Q


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                      sequential: bool = True):
    """``sequential=True`` chains the per-tensor updates with
    ``lax.optimization_barrier`` so XLA schedules them one after another:
    otherwise every leaf's fp32 dequantise/requantise temporaries (up to
    ~2x leaf size each) are live at once, which costs gigabytes of HBM peak
    on a 1.5B-param tree and OOMs a 16G chip. Numerically identical."""

    def init(params):
        zeros = jax.tree.map(lambda p: _quantize(jnp.zeros_like(p, jnp.float32)), params)
        zeros2 = jax.tree.map(lambda p: _quantize(jnp.zeros_like(p, jnp.float32)), params)
        return Adam8bitState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=zeros2)

    def update(grads, state, params=None):
        count = state.count + 1

        def upd(g, mq, nq):
            g = g.astype(jnp.float32)
            m = b1 * _dequantize(mq, g.shape) + (1 - b1) * g
            n = b2 * _dequantize(nq, g.shape) + (1 - b2) * g * g
            mhat = m / (1 - b1 ** count.astype(jnp.float32))
            nhat = n / (1 - b2 ** count.astype(jnp.float32))
            step = mhat / (jnp.sqrt(nhat) + eps)
            return step, _quantize(m), _quantize(n)

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


def adamw8bit(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2):
    return optax.chain(
        scale_by_adam8bit(b1, b2, eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
