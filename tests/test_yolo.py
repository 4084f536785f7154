"""Parity: models/yolov8.py (flax) vs tests/yolo_oracle.py (torch,
ultralytics ``DetectionModel`` state-dict layout) through
weights/convert.py::yolo_state_dict_to_flax, plus the shell-unpickler
checkpoint loader and the host-side letterbox/NMS path."""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from this_and_that_vdm_tpu.models.yolov8 import (
    YOLOv8, YOLOv8Config, letterbox_np, nms_np, scale_boxes_np,
)
from this_and_that_vdm_tpu.weights.convert import (
    load_ultralytics_state_dict, yolo_state_dict_to_flax,
)
import yolo_oracle


def _rand_init(module: torch.nn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point and ".dfl." not in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        if k.endswith("running_var"):
            sd[k] = sd[k].abs() + 0.5
    module.load_state_dict(sd)
    return module


@pytest.fixture(scope="module")
def yolo_pair():
    cfg = YOLOv8Config.tiny(nc=2)
    oracle = _rand_init(yolo_oracle.DetectionModel(cfg)).eval()
    params = yolo_state_dict_to_flax(
        {k: v.numpy() for k, v in oracle.state_dict().items()})
    return cfg, oracle, YOLOv8(cfg), params


def test_yolo_full_parity(yolo_pair):
    cfg, oracle, model, params = yolo_pair
    rng = np.random.RandomState(0)
    img = rng.rand(1, 64, 96, 3).astype(np.float32)
    pred_t = oracle(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    pred_j = model.apply(params, jnp.asarray(img))
    # torch layout [B, 4+nc, N] vs flax [B, N, 4+nc]
    np.testing.assert_allclose(
        np.asarray(pred_j), pred_t.numpy().transpose(0, 2, 1),
        atol=5e-4, rtol=0)


def test_config_from_state_dict_roundtrip(yolo_pair):
    cfg, oracle, _, _ = yolo_pair
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    got = YOLOv8Config.from_state_dict(sd)
    assert got.nc == cfg.nc and got.reg_max == cfg.reg_max
    # the derived multipliers must reproduce every channel/repeat count
    for base in (64, 128, 256, 512, 1024):
        assert got.ch(base) == cfg.ch(base)
    for base in (3, 6):
        assert got.n(base) == cfg.n(base)


def test_shell_unpickler_loads_without_ultralytics(tmp_path, yolo_pair):
    cfg, oracle, _, _ = yolo_pair
    # fabricate a checkpoint whose top object claims an ultralytics class
    # path (the package is NOT installed — the shell-unpickler must cope)
    fake = type("DetectionModel", (yolo_oracle.DetectionModel,), {})
    fake.__module__ = "ultralytics.nn.tasks"
    for name in ("ultralytics", "ultralytics.nn", "ultralytics.nn.tasks"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["ultralytics.nn.tasks"].DetectionModel = fake
    obj = fake(cfg)
    obj.load_state_dict(oracle.state_dict())
    path = str(tmp_path / "fake_gripper.pt")
    try:
        torch.save({"model": obj, "train_args": {"data": "x"}}, path)
    finally:
        for name in ("ultralytics.nn.tasks", "ultralytics.nn", "ultralytics"):
            sys.modules.pop(name, None)

    sd = load_ultralytics_state_dict(path)
    ref = {k: v.numpy() for k, v in oracle.state_dict().items()}
    assert set(sd) == set(ref)
    for k in ref:
        np.testing.assert_allclose(sd[k], ref[k], atol=0, rtol=0)


def test_native_detector_end_to_end(yolo_pair):
    from this_and_that_vdm_tpu.curation.detectors import NativeGripperDetector

    cfg, _, _, params = yolo_pair
    det = NativeGripperDetector(params=params, cfg=cfg, imgsz=96)
    img = (np.random.RandomState(1).rand(50, 70, 3) * 255).astype(np.uint8)
    boxes = det.boxes_xywh(img)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert boxes.dtype == np.float32
    if len(boxes):  # centers clipped into the original image
        assert (boxes[:, 0] <= 70).all() and (boxes[:, 1] <= 50).all()


def test_letterbox_geometry():
    img = (np.random.RandomState(2).rand(50, 70, 3) * 255).astype(np.uint8)
    out, r, (dl, dt) = letterbox_np(img, 96, 32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert abs(r - 96 / 70) < 1e-9  # longest side fits 96
    nh = round(50 * r)
    assert out.shape == ((nh + 31) // 32 * 32, 96, 3)
    # original content occupies [dt:dt+nh, dl:dl+96)
    assert dt >= 0 and dl == 0


def test_nms_suppresses_overlaps():
    boxes = np.array([
        [50, 50, 20, 20],
        [52, 51, 20, 20],   # heavy overlap with the first
        [120, 50, 20, 20],  # separate
    ], np.float32)
    scores = np.array([[0.9], [0.8], [0.7]], np.float32)
    kept, conf, cls = nms_np(boxes, scores, conf_thres=0.25, iou_thres=0.5)
    assert len(kept) == 2
    np.testing.assert_allclose(conf, [0.9, 0.7])
    # class-aware: same geometry, different classes -> both kept
    scores2 = np.array([[0.9, 0.0], [0.0, 0.8], [0.7, 0.0]], np.float32)
    kept2, _, cls2 = nms_np(boxes, scores2, 0.25, 0.5)
    assert len(kept2) == 3 and set(cls2) == {0, 1}


def test_scale_boxes_roundtrip():
    b = np.array([[48.0, 32.0, 10.0, 8.0]], np.float32)
    out = scale_boxes_np(b, ratio=2.0, pad_lt=(8, 4), orig_hw=(50, 70))
    np.testing.assert_allclose(out[0], [20.0, 14.0, 5.0, 4.0])
