"""8-bit AdamW: int8 state, close tracking of exact AdamW on a quadratic."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from this_and_that_vdm_tpu.training.optimizers import adamw8bit, _quantize, _dequantize


def test_quantize_roundtrip_error_bounded():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1000) * 3.0, jnp.float32)
    q = _quantize(x)
    assert q.q.dtype == jnp.int8
    back = _dequantize(q, x.shape)
    # absmax linear int8: error <= scale/2 per block
    per_block_max = np.abs(np.asarray(x)).reshape(-1)  # loose bound below
    assert float(jnp.abs(back - x).max()) <= float(jnp.abs(x).max()) / 127.0 + 1e-6


def test_adamw8bit_tracks_exact_adamw():
    def loss(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    params0 = {"w": jnp.zeros((300,)), "b": jnp.zeros((7,))}

    def run(tx):
        params = jax.tree.map(jnp.copy, params0)
        state = tx.init(params)
        for _ in range(60):
            g = jax.grad(loss)(params)
            upd, state = tx.update(g, state, params)
            params = optax.apply_updates(params, upd)
        return params

    exact = run(optax.adamw(1e-1, weight_decay=1e-2))
    quant = run(adamw8bit(1e-1, weight_decay=1e-2))
    d_exact = float(loss(exact))
    d_quant = float(loss(quant))
    # both should be converging toward the minimum at a similar rate
    assert d_quant < float(loss(params0)) * 0.05
    assert abs(d_quant - d_exact) < 0.5 * max(d_exact, 1e-3) + 0.5


def test_state_memory_is_int8():
    tx = adamw8bit(1e-3)
    params = {"w": jnp.zeros((1024, 16))}
    state = tx.init(params)
    mu = state[0].mu["w"]
    assert mu.q.dtype == jnp.int8
    assert mu.q.size == 1024 * 16
    assert mu.scale.size == 1024 * 16 // 256
