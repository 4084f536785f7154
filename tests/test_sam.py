"""Parity: models/sam.py (flax) vs tests/sam_oracle.py (torch, official
``sam_vit_*.pth`` state-dict layout) through
weights/convert.py::sam_state_dict_to_flax — validating wiring and the
converter in one shot, same scheme as test_unet_parity/test_xmem."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from this_and_that_vdm_tpu.models.sam import (
    Deconv2x, Sam, SamConfig, postprocess_masks_np, preprocess_np,
    transform_coords_np,
)
from this_and_that_vdm_tpu.weights.convert import sam_state_dict_to_flax
import sam_oracle


class _OCfg:
    """Oracle-side view of SamConfig (plain attributes)."""

    def __init__(self, cfg: SamConfig):
        for k in ("img_size", "patch_size", "encoder_embed_dim",
                  "encoder_depth", "encoder_num_heads",
                  "encoder_global_attn_indexes", "window_size", "mlp_ratio",
                  "prompt_embed_dim", "mask_in_chans", "decoder_depth",
                  "decoder_num_heads", "decoder_mlp_dim",
                  "num_multimask_outputs", "iou_head_depth",
                  "iou_head_hidden_dim"):
            setattr(self, k, getattr(cfg, k))


def _rand_init(module: torch.nn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.08
    module.load_state_dict(sd)
    return module


@pytest.fixture(scope="module")
def sam_pair():
    cfg = SamConfig.tiny()
    oracle = _rand_init(sam_oracle.Sam(_OCfg(cfg))).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = sam_state_dict_to_flax(sd)
    model = Sam(cfg)
    return cfg, oracle, model, params


def test_sam_full_parity(sam_pair):
    cfg, oracle, model, params = sam_pair
    rng = np.random.RandomState(0)
    img = rng.randn(1, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    # prompt set 0: positive + negative + padding; set 1: box corners + pad
    points = np.array(
        [[[10.5, 20.5], [40.5, 5.5], [0.0, 0.0]],
         [[8.5, 8.5], [50.5, 40.5], [0.0, 0.0]]], np.float32)
    labels = np.array([[1, 0, -1], [2, 3, -1]], np.int32)

    masks_t, iou_t = oracle(
        torch.from_numpy(img.transpose(0, 3, 1, 2)),
        torch.from_numpy(points), torch.from_numpy(labels))

    masks_j, iou_j = model.apply(
        params, jnp.asarray(img), jnp.asarray(points), jnp.asarray(labels))

    np.testing.assert_allclose(
        np.asarray(masks_j), masks_t.numpy(), atol=2e-4, rtol=0)
    np.testing.assert_allclose(
        np.asarray(iou_j), iou_t.numpy(), atol=2e-4, rtol=0)


def test_sam_mask_prompt_parity(sam_pair):
    cfg, oracle, model, params = sam_pair
    rng = np.random.RandomState(1)
    g4 = 4 * cfg.grid_size
    mask = rng.randn(2, g4, g4, 1).astype(np.float32)
    points = np.array([[[5.5, 6.5]], [[30.5, 30.5]]], np.float32)
    labels = np.array([[1], [1]], np.int32)

    with torch.no_grad():
        sparse_t, dense_t = oracle.prompt_encoder(
            torch.from_numpy(points), torch.from_numpy(labels),
            torch.from_numpy(mask.transpose(0, 3, 1, 2)))

    sparse_j, dense_j = model.apply(
        params, jnp.asarray(points), jnp.asarray(labels), jnp.asarray(mask),
        method=lambda m, p, l, mk: m.prompt_encoder(p, l, mk))

    np.testing.assert_allclose(
        np.asarray(sparse_j), sparse_t.numpy(), atol=1e-5, rtol=0)
    np.testing.assert_allclose(
        np.asarray(dense_j), dense_t.numpy().transpose(0, 2, 3, 1),
        atol=1e-5, rtol=0)


def test_deconv2x_matches_convtranspose():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 7, 6).astype(np.float32)
    ct = torch.nn.ConvTranspose2d(6, 3, 2, 2)
    _rand_init(ct, seed=3)
    with torch.no_grad():
        y_t = ct(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    mod = Deconv2x(3)
    params = {"params": {
        "kernel": ct.weight.detach().numpy().transpose(2, 3, 0, 1),
        "bias": ct.bias.detach().numpy(),
    }}
    y_j = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y_j), y_t.numpy().transpose(0, 2, 3, 1), atol=1e-5, rtol=0)


def test_preprocess_and_coords_roundtrip():
    rng = np.random.RandomState(3)
    img = (rng.rand(30, 50, 3) * 255).astype(np.uint8)
    x, (nh, nw) = preprocess_np(img, 64)
    assert x.shape == (1, 64, 64, 3)
    assert (nh, nw) == (38, 64) or nw == 64  # longest side maps to 64
    # padding region is exactly zero
    assert np.all(x[0, nh:] == 0) and np.all(x[0, :, nw:] == 0)

    coords = transform_coords_np(np.array([[10.0, 20.0]]), (30, 50), 64)
    # x scales by 64/50 (rounded new w 64), y by round(30*64/50)/30
    np.testing.assert_allclose(coords[0, 0], 10.0 * (64 / 50) + 0.5, atol=1e-5)
    np.testing.assert_allclose(coords[0, 1], 20.0 * (nh / 30) + 0.5, atol=1e-5)


def test_postprocess_masks_shapes():
    low = np.random.RandomState(4).randn(2, 4, 16, 16).astype(np.float32)
    out = postprocess_masks_np(low, (38, 64), (30, 50), 64)
    assert out.shape == (2, 4, 30, 50)


def test_native_segmenter_end_to_end_and_cache():
    from this_and_that_vdm_tpu.curation.detectors import NativeSAMSegmenter

    cfg = SamConfig.tiny()
    model = Sam(cfg)
    rng = np.random.RandomState(5)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
        jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32))
    seg = NativeSAMSegmenter(params=params, model_type="tiny")

    img = (rng.rand(30, 50, 3) * 255).astype(np.uint8)
    calls = {"n": 0}
    orig_encode = seg._encode

    def counting_encode(p, x):
        calls["n"] += 1
        return orig_encode(p, x)

    seg._encode = counting_encode
    m1 = seg.predict_mask(img, np.array([[10.0, 15.0]]),
                          box_xyxy=np.array([5.0, 5.0, 40.0, 25.0]))
    assert m1.shape == (30, 50) and m1.dtype == bool
    # same frame content (predict_mask flipped BGR->RGB; pass that view
    # directly) -> embedding served from the content-hash cache
    m2 = seg.predict_mask_labeled(img[..., ::-1].copy(),
                                  np.array([[10.0, 15.0], [30.0, 20.0]]),
                                  np.array([1, 0]))
    assert m2.shape == (30, 50)
    assert calls["n"] == 1
    # genuinely different content embeds again
    other = (img.astype(np.int32) + 7 % 255).astype(np.uint8)
    seg.predict_mask_labeled(other, np.array([[10.0, 15.0]]), np.array([1]))
    assert calls["n"] == 2

    # prompt counts beyond max_points bucket up instead of raising — the
    # trajectory SAM stage sends 20 labelled points (pick_start_point_sam)
    rng20 = np.random.RandomState(6)
    pts20 = rng20.rand(20, 2) * [50, 30]
    m20 = seg.predict_mask_labeled(img, pts20, np.ones(20))
    assert m20.shape == (30, 50)
