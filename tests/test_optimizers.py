"""8-bit AdamW: int8 state, close tracking of exact AdamW on a quadratic."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from this_and_that_vdm_tpu.training.optimizers import adamw8bit, _quantize, _dequantize


def test_quantize_roundtrip_error_bounded():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1000) * 3.0, jnp.float32)
    q = _quantize(x, signed=True)
    assert q.q.dtype == jnp.uint8
    back = _dequantize(q, x.shape, signed=True)
    # log codebook: ~7% relative error on representable magnitudes
    xx, bb = np.asarray(x), np.asarray(back)
    rel = np.abs(bb - xx) / np.maximum(np.abs(xx), 1e-12)
    big = np.abs(xx) > 1e-6 * np.abs(xx).max()
    assert float(rel[big].max()) < 0.08
    assert np.all(np.sign(bb[big]) == np.sign(xx[big]))


def test_quantize_second_moment_wide_dynamic_range():
    """The failure mode cli/adam8bit_ab.py caught: a block holding values
    spanning many decades must NOT collapse small entries to zero (linear
    absmax int8 rounds everything below max/254 to 0, blowing up
    mhat/(sqrt(nhat)+eps))."""
    x = jnp.asarray(10.0 ** np.linspace(-6, 0, 256), jnp.float32)
    back = np.asarray(_dequantize(_quantize(x, signed=False), x.shape, signed=False))
    rel = np.abs(back - np.asarray(x)) / np.asarray(x)
    assert float(rel.max()) < 0.08  # every decade survives quantisation


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
    assert mu.q.dtype == jnp.uint8
    assert mu.q.size == 1024 * 16
    assert mu.scale.size == 1024 * 16 // 256


def test_adamw8bit_converges_on_mlp_ab():
    """Regression for the round-2 A/B finding: 300-step synthetic MLP —
    the quantised optimizer must land within 3x of fp32 AdamW's loss and,
    above all, must not diverge."""
    from this_and_that_vdm_tpu.cli.adam8bit_ab import run_ab

    curves = run_ab(steps=300)
    fp32 = curves["fp32"][-1][1]
    q8 = curves["adamw8bit"][-1][1]
    assert np.isfinite(q8)
    assert q8 < curves["adamw8bit"][0][1] * 0.1, "q8 failed to converge"
    assert q8 < fp32 * 3 + 1e-3, (q8, fp32)
