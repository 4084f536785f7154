"""XMem parity vs the torch oracle + memory-system behavior.

Covers reference track_anything_code/tracker/ (SURVEY §2.7): network
numerics (encode_key/encode_value/segment/read_memory), the top-k memory
attention math, and the working/long-term memory manager scheduling."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from this_and_that_vdm_tpu.models.xmem import (
    XMem, aggregate, key_similarity, topk_softmax)
from this_and_that_vdm_tpu.weights.convert import xmem_state_dict_to_flax
from this_and_that_vdm_tpu.curation.xmem_tracker import (
    DEFAULT_CONFIG, KeyValueMemoryStore, MaskMapper, MemoryManager,
    XMemInferenceCore, pad_divide_by, unpad, xmem_propagator)

from xmem_oracle import (
    XMemOracle, randomize_bn_stats, similarity_o, topk_softmax_o)

H, W = 64, 48


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(7)
    oracle = XMemOracle().eval()
    randomize_bn_stats(oracle, seed=3)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = xmem_state_dict_to_flax(sd)
    params = jax.tree.map(jnp.asarray, params)
    return oracle, params


def _np(t):
    return t.detach().numpy()


def test_encode_key_parity(oracle_and_params):
    oracle, params = oracle_and_params
    rng = np.random.default_rng(0)
    frame = rng.standard_normal((1, 3, H, W), np.float32)

    with torch.no_grad():
        key_t, sh_t, sel_t, f16_t, f8_t, f4_t = oracle.encode_key(
            torch.from_numpy(frame))

    m = XMem()
    key, sh, sel, f16, f8, f4 = m.apply(
        params, jnp.asarray(frame.transpose(0, 2, 3, 1)), method=m.encode_key)

    for ours, ref in [(key, key_t), (sh, sh_t), (sel, sel_t),
                      (f16, f16_t), (f8, f8_t), (f4, f4_t)]:
        got = np.asarray(ours).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, _np(ref), atol=7e-4, rtol=1e-3)


def test_encode_value_and_segment_parity(oracle_and_params):
    oracle, params = oracle_and_params
    rng = np.random.default_rng(1)
    frame = rng.standard_normal((1, 3, H, W), np.float32)
    masks = (rng.random((1, 2, H, W)) > 0.7).astype(np.float32)
    h16 = rng.standard_normal((1, 2, 64, H // 16, W // 16), np.float32) * 0.3

    with torch.no_grad():
        _, _, _, f16_t, f8_t, f4_t = oracle.encode_key(torch.from_numpy(frame))
        v_t, h_t = oracle.encode_value(
            torch.from_numpy(frame), f16_t, torch.from_numpy(h16),
            torch.from_numpy(masks))

    m = XMem()
    to_nhwc = lambda a: jnp.asarray(np.moveaxis(a, -3, -1))
    f16 = to_nhwc(_np(f16_t))
    v, h = m.apply(params, jnp.asarray(frame.transpose(0, 2, 3, 1)), f16,
                   to_nhwc(h16), jnp.asarray(masks), method=m.encode_value)
    np.testing.assert_allclose(np.moveaxis(np.asarray(v), -1, -3), _np(v_t),
                               atol=7e-4, rtol=1e-3)
    np.testing.assert_allclose(np.moveaxis(np.asarray(h), -1, -3), _np(h_t),
                               atol=7e-4, rtol=1e-3)

    # segment on a synthetic readout
    readout = rng.standard_normal((1, 2, H // 16, W // 16, 512), np.float32) * 0.2
    with torch.no_grad():
        hid_t, logits_t, prob_t = oracle.segment(
            f16_t, f8_t, f4_t,
            torch.from_numpy(np.moveaxis(np.asarray(readout), -1, -3)),
            torch.from_numpy(h16))
    hid, logits, prob = m.apply(
        params, f16, to_nhwc(_np(f8_t)), to_nhwc(_np(f4_t)), readout,
        to_nhwc(h16), True, False, method=m.segment)
    np.testing.assert_allclose(np.moveaxis(np.asarray(hid), -1, -3), _np(hid_t),
                               atol=7e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(prob), _np(prob_t), atol=7e-4)


def test_memory_attention_math_parity():
    """Token-major key_similarity/topk_softmax vs the channel-major oracle."""
    rng = np.random.default_rng(2)
    B, CK, N, P, CV = 1, 16, 40, 12, 8
    mk = rng.standard_normal((B, N, CK), np.float32)
    ms = rng.random((B, N)).astype(np.float32) + 1.0
    qk = rng.standard_normal((B, P, CK), np.float32)
    qe = rng.random((B, P, CK)).astype(np.float32)

    sim = key_similarity(jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(qk),
                         jnp.asarray(qe))
    sim_t = similarity_o(
        torch.from_numpy(mk.transpose(0, 2, 1)),
        torch.from_numpy(ms[:, None]),
        torch.from_numpy(qk.transpose(0, 2, 1)),
        torch.from_numpy(qe.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(sim).transpose(0, 2, 1), _np(sim_t),
                               atol=1e-4, rtol=1e-4)

    for top_k in (None, 5):
        aff = topk_softmax(sim, top_k)
        aff_t = topk_softmax_o(sim_t, top_k)
        np.testing.assert_allclose(np.asarray(aff).transpose(0, 2, 1),
                                   _np(aff_t), atol=1e-5)

    # selection-free variant
    sim2 = key_similarity(jnp.asarray(mk), None, jnp.asarray(qk), None)
    sim2_t = similarity_o(torch.from_numpy(mk.transpose(0, 2, 1)), None,
                          torch.from_numpy(qk.transpose(0, 2, 1)), None)
    np.testing.assert_allclose(np.asarray(sim2).transpose(0, 2, 1),
                               _np(sim2_t), atol=1e-4, rtol=1e-4)


def test_aggregate_matches_reference_formula():
    rng = np.random.default_rng(3)
    prob = rng.random((1, 3, 8, 8)).astype(np.float32)
    out = np.asarray(aggregate(jnp.asarray(prob), axis=1))
    bg = np.prod(1 - prob, axis=1, keepdims=True)
    stacked = np.clip(np.concatenate([bg, prob], 1), 1e-7, 1 - 1e-7)
    logits = np.log(stacked / (1 - stacked))
    expected = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    np.testing.assert_allclose(out, expected, atol=1e-6)
    np.testing.assert_allclose(out.sum(1), 1.0, atol=1e-5)


def test_pad_divide_by_and_unpad():
    img = np.arange(50 * 30 * 3, dtype=np.float32).reshape(50, 30, 3)
    padded, pad = pad_divide_by(img, 16)
    assert padded.shape[0] % 16 == 0 and padded.shape[1] % 16 == 0
    back = unpad(padded, pad, 0, 1)
    np.testing.assert_array_equal(back, img)

    masks = np.ones((2, 50, 30), np.float32)
    pm, pad2 = pad_divide_by(masks, 16)
    assert pm.shape == (2, 64, 32)
    np.testing.assert_array_equal(unpad(pm, pad2, 1, 2), masks)


def test_mask_mapper_remap():
    mm = MaskMapper()
    mask = np.zeros((8, 8), np.uint8)
    mask[:2] = 3
    mask[4:] = 7  # non-contiguous labels -> remapped to 1, 2
    onehot, mapped = mm.convert_mask(mask)
    assert onehot.shape == (2, 8, 8) and mapped == [1, 2]
    idx = np.zeros((8, 8), np.uint8)
    idx[:2] = 1
    idx[4:] = 2
    restored = mm.remap_index_mask(idx)
    assert set(np.unique(restored)) == {0, 3, 7}


def test_kv_store_groups_and_sieve():
    store = KeyValueMemoryStore(count_usage=True)
    ck, cv, hw = 4, 6, 10
    rng = np.random.default_rng(4)

    def chunk(n_obj):
        return (rng.standard_normal((1, hw, ck), np.float32),
                rng.standard_normal((n_obj, hw, cv), np.float32),
                rng.random((1, hw)).astype(np.float32) + 1)

    k, v, s = chunk(1)
    store.add(k, v, s, None, objects=[1])
    assert store.size == hw and store.num_groups == 1
    # second insert introduces object 2 -> new group
    k2, v2, s2 = chunk(2)
    store.add(k2, v2, s2, None, objects=[1, 2])
    assert store.size == 2 * hw
    assert store.get_v_size(0) == 2 * hw and store.get_v_size(1) == hw

    store.update_usage(np.ones(store.size, np.float32))
    usage = store.get_usage()
    assert usage.shape == (2 * hw,) and np.all(usage > 0)

    # sieve out the first hw slots; group 1 (size hw < min_size) is kept
    store.sieve_by_range(0, hw, min_size=hw + 1)
    assert store.size == hw
    assert store.get_v_size(0) == hw and store.get_v_size(1) == hw


def test_memory_manager_readout_matches_direct_math():
    cfg = dict(DEFAULT_CONFIG, enable_long_term=False, top_k=5)
    mgr = MemoryManager(cfg)
    rng = np.random.default_rng(5)
    h16, w16, ck, cv = 3, 4, 8, 6
    key = rng.standard_normal((1, h16, w16, ck), np.float32)
    shrink = rng.random((1, h16, w16, 1)).astype(np.float32) + 1
    value = rng.standard_normal((1, 1, h16, w16, cv), np.float32)
    for _ in range(3):
        mgr.add_memory(key, shrink, value, objects=[1])
    qk = rng.standard_normal((1, h16, w16, ck), np.float32)
    out = mgr.match_memory(qk, None)
    assert out.shape == (1, 1, h16, w16, cv)

    # direct: torch-math affinity over the concatenated memory
    n = 3 * h16 * w16
    mk = np.tile(key.reshape(1, -1, ck), (1, 3, 1))
    ms = np.tile(shrink.reshape(1, -1), (1, 3))
    sim_t = similarity_o(torch.from_numpy(mk.transpose(0, 2, 1)),
                         torch.from_numpy(ms[:, None]),
                         torch.from_numpy(qk.reshape(1, -1, ck).transpose(0, 2, 1)),
                         None)
    aff_t = topk_softmax_o(sim_t, 5)
    mv = np.tile(value.reshape(1, -1, cv), (1, 3, 1))
    expected = np.einsum("bnp,bnc->bpc", _np(aff_t), mv)
    np.testing.assert_allclose(out.reshape(1, -1, cv), expected, atol=1e-5)


def test_inference_core_end_to_end_with_consolidation():
    """Tiny synthetic video with random weights: scheduling, memory growth,
    long-term consolidation, and valid probability outputs."""
    m = XMem()
    frame0 = jnp.zeros((1, H, W, 3))
    params = m.init(jax.random.PRNGKey(0), frame0, method=m.encode_key)
    import flax
    params = flax.core.unfreeze(params)
    masks0 = jnp.zeros((1, 1, H, W))
    h0 = jnp.zeros((1, 1, H // 16, W // 16, 64))
    p2 = m.init(jax.random.PRNGKey(1), frame0,
                jnp.zeros((1, H // 16, W // 16, 1024)), h0, masks0,
                method=m.encode_value)
    params["params"].update(flax.core.unfreeze(p2)["params"])
    p3 = m.init(jax.random.PRNGKey(2), jnp.zeros((1, H // 16, W // 16, 1024)),
                jnp.zeros((1, H // 8, W // 8, 512)),
                jnp.zeros((1, H // 4, W // 4, 256)),
                jnp.zeros((1, 1, H // 16, W // 16, 512)), h0, method=m.segment)
    params["params"].update(flax.core.unfreeze(p3)["params"])

    hw16 = (H // 16) * (W // 16)
    cfg = dict(DEFAULT_CONFIG, mem_every=1, max_mid_term_frames=3,
               min_mid_term_frames=2, num_prototypes=4,
               max_long_term_elements=hw16 * 5, top_k=5)
    core = XMemInferenceCore(m, params, cfg)
    core.set_all_labels([1])

    rng = np.random.default_rng(6)
    n_frames = 8
    for ti in range(n_frames):
        img = rng.random((H, W, 3)).astype(np.float32)
        if ti == 0:
            mask = np.zeros((1, H, W), np.float32)
            mask[0, 10:30, 10:25] = 1.0
            prob = core.step(img, mask=mask)
        else:
            prob = core.step(img)
        assert prob.shape == (2, H, W)
        np.testing.assert_allclose(prob.sum(0), 1.0, atol=1e-4)

    assert core.memory.work_mem.size <= 3 * hw16
    assert core.memory.long_mem.engaged()  # consolidation happened


def test_xmem_propagator_facade():
    m = XMem()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                    method=m.encode_key)
    import flax
    params = flax.core.unfreeze(params)
    p2 = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                jnp.zeros((1, 2, 2, 1024)), jnp.zeros((1, 1, 2, 2, 64)),
                jnp.zeros((1, 1, 32, 32)), method=m.encode_value)
    params["params"].update(flax.core.unfreeze(p2)["params"])
    p3 = m.init(jax.random.PRNGKey(2), jnp.zeros((1, 2, 2, 1024)),
                jnp.zeros((1, 4, 4, 512)), jnp.zeros((1, 8, 8, 256)),
                jnp.zeros((1, 1, 2, 2, 512)), jnp.zeros((1, 1, 2, 2, 64)),
                method=m.segment)
    params["params"].update(flax.core.unfreeze(p3)["params"])

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 255, (32, 32, 3), np.uint8) for _ in range(4)]
    first = np.zeros((32, 32), bool)
    first[8:20, 8:20] = True
    masks = xmem_propagator(params)(frames, first)
    assert len(masks) == 4
    assert all(mk.shape == (32, 32) and mk.dtype == bool for mk in masks)
    np.testing.assert_array_equal(masks[0], first)


def test_tracking_anything_facade():
    """BaseTracker + TrackingAnything (reference model.py / base_tracker.py)."""
    import flax

    from this_and_that_vdm_tpu.curation.tracking import TrackingAnything

    m = XMem()
    params = flax.core.unfreeze(
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
               method=m.encode_key))
    params["params"].update(flax.core.unfreeze(
        m.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
               jnp.zeros((1, 2, 2, 1024)), jnp.zeros((1, 1, 2, 2, 64)),
               jnp.zeros((1, 1, 32, 32)), method=m.encode_value))["params"])
    params["params"].update(flax.core.unfreeze(
        m.init(jax.random.PRNGKey(2), jnp.zeros((1, 2, 2, 1024)),
               jnp.zeros((1, 4, 4, 512)), jnp.zeros((1, 8, 8, 256)),
               jnp.zeros((1, 1, 2, 2, 512)), jnp.zeros((1, 1, 2, 2, 64)),
               method=m.segment))["params"])

    class FakeSeg:
        def predict_mask(self, image_bgr, points_xy, box_xyxy=None):
            mk = np.zeros(image_bgr.shape[:2], bool)
            mk[10:22, 10:22] = True
            return mk

    ta = TrackingAnything(FakeSeg(), params)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    mask, _, painted = ta.first_frame_click(img, np.array([[16, 16]]))
    assert mask.shape == (32, 32) and painted.shape == img.shape

    # indexed template mask with a non-contiguous label (7)
    template = np.zeros((32, 32), np.uint8)
    template[mask] = 7
    frames = [img, rng.integers(0, 255, (32, 32, 3), np.uint8)]
    masks, logits, painted_seq = ta.generator(frames, template)
    assert len(masks) == 2 and masks[0].dtype == np.uint8
    assert set(np.unique(masks[0])) <= {0, 7}  # remapped back to caller label
    assert painted_seq[0].shape == img.shape


def test_kv_store_long_term_eviction_exact_alignment():
    """Long-term path: a group's prototype values cover a usage-ordered
    (NON-suffix) subset of the appended keys, and a group can be skipped for
    whole rounds (candidate_value None).  Eviction must remap by the exact
    per-value key index (v_idx); suffix slicing silently pairs values with
    the wrong keys (round-2 review finding)."""
    store = KeyValueMemoryStore(count_usage=True)
    ck, cv = 4, 3
    rng = np.random.default_rng(5)

    # round 1: 5 prototype keys; group 0 covers all, group 1 skipped (None)
    k1 = rng.standard_normal((1, 5, ck), np.float32)
    v1_0 = rng.standard_normal((1, 5, cv), np.float32)
    s1 = rng.random((1, 5)).astype(np.float32) + 1
    store.add(k1, [v1_0, None], s1, None, objects=None)
    assert store.num_groups == 1  # no placeholder created for the skip

    # round 2: 4 keys; group 0 covers all, group 1 valid only at local {0, 2}
    k2 = rng.standard_normal((1, 4, ck), np.float32)
    v2_0 = rng.standard_normal((1, 4, cv), np.float32)
    v2_1 = rng.standard_normal((1, 2, cv), np.float32)
    s2 = rng.random((1, 4)).astype(np.float32) + 1
    store.add(k2, [v2_0, v2_1], s2, None, objects=None,
              value_key_idx=[None, np.array([0, 2])])
    assert store.num_groups == 2
    np.testing.assert_array_equal(store.v_idx[1], [5, 7])  # global key slots

    # evict the 2 lowest-usage slots: key 0 (group-0 only) and key 5
    # (group 1's FIRST value — under suffix slicing its other value would
    # be paired with the wrong key)
    usage = np.array([0, 9, 9, 9, 9, 1, 9, 9, 9], np.float32)
    store.update_usage(usage)
    store.remove_obsolete_features(max_size=7)

    assert store.size == 7
    # group 0: values for surviving keys [1,2,3,4] + [6,7,8] (old numbering)
    expect_g0 = np.concatenate([v1_0[:, 1:], v2_0[:, 1:]], 1)
    np.testing.assert_array_equal(store.v[0], expect_g0)
    np.testing.assert_array_equal(store.v_idx[0], np.arange(7))
    # group 1: only the value of surviving key 7 remains, remapped to slot 5
    np.testing.assert_array_equal(store.v[1], v2_1[:, 1:])
    np.testing.assert_array_equal(store.v_idx[1], [5])
    np.testing.assert_array_equal(store.k[0, 5], k2[0, 2])  # key<->value pair


def test_kv_store_multi_group_eviction_remaps_values():
    """remove_obsolete_features with >1 object group (the reference raises
    NotImplementedError here, kv_memory_store.py:146-151); working-store
    path, where the suffix-alignment invariant is exact."""
    store = KeyValueMemoryStore(count_usage=True)
    ck, cv, hw = 4, 6, 10
    rng = np.random.default_rng(11)

    def chunk(n_obj):
        return (rng.standard_normal((1, hw, ck), np.float32),
                rng.standard_normal((n_obj, hw, cv), np.float32),
                rng.random((1, hw)).astype(np.float32) + 1)

    k1, v1, s1 = chunk(1)
    store.add(k1, v1, s1, None, objects=[1])
    k2, v2, s2 = chunk(2)
    store.add(k2, v2, s2, None, objects=[1, 2])  # object 2 appears late
    assert store.num_groups == 2 and store.size == 2 * hw

    # make the first hw slots (where group 1 has no values) the least used
    usage = np.concatenate([np.zeros(hw), np.ones(hw)]).astype(np.float32)
    store.update_usage(usage)
    store.remove_obsolete_features(max_size=hw)

    assert store.size == hw
    # group 0 keeps its values for the surviving (second-chunk) keys
    np.testing.assert_array_equal(store.v[0], v2[[0]])
    # group 1's values covered exactly the surviving suffix — untouched
    np.testing.assert_array_equal(store.v[1], v2[[1]])
    assert store.get_v_size(0) == hw and store.get_v_size(1) == hw
    np.testing.assert_array_equal(store.k, k2)

    # mixed survival inside the suffix: evict half of what's left
    store.update_usage(np.arange(hw, dtype=np.float32))
    store.remove_obsolete_features(max_size=hw // 2)
    assert store.size == hw // 2
    assert store.get_v_size(0) == hw // 2 and store.get_v_size(1) == hw // 2
    np.testing.assert_array_equal(store.v[0], v2[[0]][:, -(hw // 2):])
    np.testing.assert_array_equal(store.v[1], v2[[1]][:, -(hw // 2):])


def test_match_memory_multi_group_long_term_readout_invariants():
    """Multi-object long-term memory end to end at the MemoryManager level:
    consolidation with a late-appearing second object produces None-skips and
    non-suffix validity subsets; match_memory must gather each group's
    long-term columns by exact key index (v_idx) and stay finite through
    eviction (round-2 exact-alignment rework)."""
    hw, h, w, CK, CV = 16, 4, 4, 4, 6
    cfg = dict(DEFAULT_CONFIG, max_mid_term_frames=3, min_mid_term_frames=2,
               num_prototypes=4, max_long_term_elements=hw * 2, top_k=5,
               hidden_dim=8)
    mm = MemoryManager(cfg)
    rng = np.random.default_rng(3)

    def add(objects):
        k = rng.standard_normal((1, h, w, CK)).astype(np.float32)
        s = rng.random((1, h, w)).astype(np.float32) + 1.0
        v = rng.standard_normal((1, len(objects), h, w, CV)).astype(np.float32)
        mm.add_memory(k, s, v, objects)

    add([1])
    add([1])  # object 2 appears from the 3rd frame on
    evicted = False
    for i in range(12):
        qk = rng.standard_normal((1, h, w, CK)).astype(np.float32)
        out = mm.match_memory(qk, None)
        assert out.shape == (1, 2 if i else 1, h, w, CV)
        assert np.isfinite(out).all()
        before = mm.long_mem.size if mm.long_mem.engaged() else 0
        add([1, 2])
        if mm.long_mem.engaged() and mm.long_mem.size < before:
            evicted = True
        # v_idx invariants after every round
        if mm.long_mem.engaged():
            n = mm.long_mem.size
            for gi in range(mm.long_mem.num_groups):
                vi, gv = mm.long_mem.v_idx[gi], mm.long_mem.v[gi]
                if gv is None:
                    continue
                assert len(vi) == gv.shape[1]
                assert (np.diff(vi) > 0).all() and vi[0] >= 0 and vi[-1] < n
            np.testing.assert_array_equal(mm.long_mem.v_idx[0], np.arange(n))

    assert mm.long_mem.engaged() and mm.long_mem.num_groups == 2
    assert mm.long_mem.v[1] is not None  # group 1 reached long-term memory
