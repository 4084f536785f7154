"""8-bit AdamW: int8 state, close tracking of exact AdamW on a quadratic."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
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


def test_closed_form_index_matches_searchsorted():
    """The closed-form log-index quantiser (round-2 fix: jnp.searchsorted
    inside the fused VGL train step faulted the TPU worker) must agree with
    the reference searchsorted-over-midpoints formulation, modulo off-by-one
    at exact float midpoint boundaries."""
    from this_and_that_vdm_tpu.training.optimizers import (
        _CODEBOOKS, _N_MAGS, _log_index)

    rng = np.random.RandomState(7)
    for signed in (True, False):
        cb = _CODEBOOKS[signed]
        bounds = (cb[:-1] + cb[1:]) / 2.0
        v = np.concatenate([
            rng.randn(20000) * 10.0 ** rng.uniform(-9, 0, 20000),
            [0.0, 1.0, -1.0, 1e-7, -1e-7, 5e-8, 4.9e-8, 1e-30], cb,
        ]).astype(np.float32)
        v = np.clip(v, -1, 1)
        if not signed:
            v = np.abs(v)
        ref = np.searchsorted(bounds, v)
        j, zero = _log_index(jnp.abs(jnp.asarray(v)), _N_MAGS[signed])
        j, zero = np.asarray(j), np.asarray(zero)
        if signed:
            got = np.where(zero, 127, np.where(v >= 0, 128 + j, 126 - j))
        else:
            got = np.where(zero, 0, 1 + j)
        assert np.abs(got - ref).max() <= 1
        # mismatches only at midpoints: either neighbour is equally good
        mism = got != ref
        assert mism.mean() < 0.005


def test_closed_form_dequant_matches_codebook_table():
    """Dequantise must reproduce the codebook table (gather-free closed form
    — round-2 perf fix: the 256-entry gather cost ~90x the whole update)."""
    from this_and_that_vdm_tpu.training.optimizers import (
        _CODEBOOKS, _Q, _dequantize, BLOCK)

    for signed in (True, False):
        cb = _CODEBOOKS[signed]
        idx = np.arange(256, dtype=np.uint8)  # 255 is out-of-codebook for signed
        if signed:
            idx = idx[:255]
        q = np.tile(idx, (BLOCK // idx.size + 2))[:BLOCK]
        qv = _Q(q=jnp.asarray(q), scale=jnp.ones((1,), jnp.float32))
        got = np.asarray(_dequantize(qv, (BLOCK,), signed))
        want = cb[q]
        # fp32 exp2 vs the float64-built table: <=5e-6 relative — noise
        # against the ~13% spacing between adjacent codebook entries
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=0)


def test_fused_pallas_kernel_matches_jnp_path():
    """The single-pass Pallas update (ops/adam8bit_pallas.py, interpret mode
    on CPU) must match the jnp path bit-for-bit-ish: both compute identical
    closed forms (log2 index, exp2 dequant), so the only residual is fp32
    op-ordering noise far below one quantisation bucket."""
    from this_and_that_vdm_tpu.training.optimizers import adamw8bit

    # leaf mix: 256-divisible, ragged (513), and a sub-threshold leaf that
    # must take the jnp fallback inside the kernel build
    params = {"a": jnp.ones((64, 300)), "b": {"c": jnp.ones((513,))},
              "d": jnp.ones((40, 256)), "tiny": jnp.ones((7,))}
    grads = jax.tree.map(
        lambda p: jr.normal(jr.PRNGKey(1), p.shape) * 1e-2, params)
    tx_ref = adamw8bit(1e-3, kernel=False)
    tx_ker = adamw8bit(1e-3, kernel=True)  # interpret=True off-TPU
    s_ref, s_ker = tx_ref.init(params), tx_ker.init(params)
    for _ in range(6):
        u_ref, s_ref = tx_ref.update(grads, s_ref, params)
        u_ker, s_ker = tx_ker.update(grads, s_ker, params)
    for lr, lk in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u_ker)):
        np.testing.assert_allclose(np.asarray(lk), np.asarray(lr),
                                   rtol=0, atol=1e-7)


def test_adam_kernel_partitioning_rule_inside_sharded_program(monkeypatch):
    """The fused Adam kernel must live inside a pjit'd program whose leaves
    are fsdp-sharded (ZeRO shards exactly the optimizer state) — same
    Mosaic-can't-auto-partition failure mode as flash attention.  The Mosaic
    body can't run on CPU, so it is swapped for the module's own jnp tile
    math: this validates the Shardy rule, the partition fn and per-shard
    result assembly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from this_and_that_vdm_tpu.ops import adam8bit_pallas as ap

    def ref_call(bc, g2d, mq2d, ms2d, nq2d, ns2d,
                 b1=0.9, b2=0.999, eps=1e-8, interpret=False):
        m = b1 * ap._dequant_tile(mq2d, ms2d, True, 127) + (1 - b1) * g2d
        n = b2 * ap._dequant_tile(nq2d, ns2d, False, 255) + (1 - b2) * g2d * g2d
        step = (m / bc[0, 0]) / (jnp.sqrt(n / bc[0, 1]) + eps)
        mq2, ms2 = ap._quant_tile(m, True, 127)
        nq2, ns2 = ap._quant_tile(n, False, 255)
        return step, mq2, ms2, nq2, ns2

    monkeypatch.setattr(ap, "_leaf_call", ref_call)
    ap._make_partitioned.cache_clear()

    rng = np.random.RandomState(0)
    nb = 64
    mesh = Mesh(np.array(jax.devices()[:8]), ("fsdp",))
    row = NamedSharding(mesh, P("fsdp", None))
    g = jax.device_put(jnp.asarray(rng.randn(nb, 256), jnp.float32), row)
    mq = jax.device_put(jnp.asarray(rng.randint(0, 256, (nb, 256)), np.uint8), row)
    ms = jax.device_put(jnp.asarray(rng.rand(nb, 1), jnp.float32), row)
    nq = jax.device_put(jnp.asarray(rng.randint(0, 256, (nb, 256)), np.uint8), row)
    ns = jax.device_put(jnp.asarray(rng.rand(nb, 1), jnp.float32), row)
    bc = jnp.asarray([[0.1, 0.001]], jnp.float32)

    fn = jax.jit(lambda *a: ap.adam8bit_leaf_update(*a))
    got = fn(g, mq, ms, nq, ns, bc)
    ap._make_partitioned.cache_clear()
    want = ref_call(bc, g, mq, ms, nq, ns)
    for x, y in zip(got, want):
        x, y = np.asarray(x), np.asarray(y)
        if x.dtype == np.uint8:
            # sharded-vs-unsharded fp32 op ordering can flip codes at exact
            # quantisation midpoints — allow off-by-one on <0.1% of entries
            d = np.abs(x.astype(np.int16) - y.astype(np.int16))
            assert d.max() <= 1 and (d > 0).mean() < 1e-3
        else:
            np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-4)
