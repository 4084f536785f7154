"""Parity: models/raft.py (flax) vs tests/raft_oracle.py (torch, official
princeton-vl RAFT state-dict layout) through
weights/convert.py::raft_state_dict_to_flax — validating the architecture,
the correlation-pyramid lookup, the scan-driven update loop, convex
upsampling and the converter in one shot; same scheme as
test_sam/test_yolo/test_xmem."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

import raft_oracle
from this_and_that_vdm_tpu.curation.detectors import NativeRAFTFlow
from this_and_that_vdm_tpu.models.raft import (
    RAFT, RAFTConfig, pad_to_multiple, raft_forward,
)
from this_and_that_vdm_tpu.weights.convert import raft_state_dict_to_flax


def _rand_init(module: torch.nn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    for name, p in module.named_parameters():
        p.data.copy_(torch.randn(p.shape, generator=g) * 0.1)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
    return module


@pytest.fixture(scope="module")
def raft_pair():
    cfg = RAFTConfig.tiny()
    oracle = _rand_init(raft_oracle.RAFT(cfg)).eval()
    sd = {f"module.{k}": v.numpy() for k, v in oracle.state_dict().items()}
    params = raft_state_dict_to_flax(sd)
    return cfg, oracle, RAFT(cfg), params


def _images(cfg, h=32, w=48, b=1, seed=0):
    # every pyramid level must keep dims >= 2: torch grid_sample's
    # align_corners normalisation divides by (dim-1), so a 1-px level NaNs
    # the official model (same constraint upstream)
    rng = np.random.RandomState(seed)
    i1 = rng.randint(0, 256, (b, h, w, 3)).astype(np.float32)
    i2 = rng.randint(0, 256, (b, h, w, 3)).astype(np.float32)
    return i1, i2


def test_raft_full_parity(raft_pair):
    cfg, oracle, model, params = raft_pair
    i1, i2 = _images(cfg)
    with torch.no_grad():
        o_low, o_up = oracle(torch.from_numpy(i1).permute(0, 3, 1, 2),
                             torch.from_numpy(i2).permute(0, 3, 1, 2),
                             iters=cfg.iters)
    f_low, f_up = raft_forward(model, params, jnp.asarray(i1),
                               jnp.asarray(i2), iters=cfg.iters)
    np.testing.assert_allclose(
        np.asarray(f_low), o_low.permute(0, 2, 3, 1).numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(f_up), o_up.permute(0, 2, 3, 1).numpy(), atol=2e-4)


def test_config_inference_from_state_dict(raft_pair):
    cfg, oracle, _model, _params = raft_pair
    import dataclasses

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    got = RAFTConfig.from_state_dict(sd, corr_levels=cfg.corr_levels)
    # iters is a runtime knob, not a weight property
    assert dataclasses.replace(got, iters=cfg.iters) == cfg


def test_native_flow_wrapper_pads_and_unpads(raft_pair):
    """Non-/8 frames: the wrapper must reproduce the oracle run on
    sintel-style replicate-padded inputs, cropped back."""
    cfg, oracle, _model, params = raft_pair
    rng = np.random.RandomState(1)
    f1 = rng.randint(0, 256, (27, 38, 3), np.uint8)
    f2 = rng.randint(0, 256, (27, 38, 3), np.uint8)
    flow = NativeRAFTFlow(params=params, cfg=cfg, iters=cfg.iters)(f1, f2)
    assert flow.shape == (27, 38, 2)

    p1, (top, left, h, w) = pad_to_multiple(f1)
    p2, _ = pad_to_multiple(f2)
    with torch.no_grad():
        _lo, o_up = oracle(
            torch.from_numpy(p1.astype(np.float32)).permute(2, 0, 1)[None],
            torch.from_numpy(p2.astype(np.float32)).permute(2, 0, 1)[None],
            iters=cfg.iters)
    expect = o_up[0].permute(1, 2, 0).numpy()[top:top + h, left:left + w]
    np.testing.assert_allclose(flow, expect, atol=2e-4)


def test_trajectory_integration_smoke(raft_pair):
    """NativeRAFTFlow satisfies the FlowFn contract end to end."""
    from this_and_that_vdm_tpu.curation.trajectory import (
        compute_flows, per_video_motion,
    )

    cfg, _oracle, _model, params = raft_pair
    flow_fn = NativeRAFTFlow(params=params, cfg=cfg, iters=2)
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, (3, 16, 24, 3), np.uint8)
    flows = compute_flows(frames, flow_fn)
    assert flows.shape == (2, 16, 24, 2)
    assert np.isfinite(per_video_motion(frames, flow_fn))
