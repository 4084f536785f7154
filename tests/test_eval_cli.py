"""Acceptance-driver tests: cli/eval.py (the BASELINE PSNR>=35 gate)."""

import json
import os

import cv2
import numpy as np
import pytest

from this_and_that_vdm_tpu.cli import eval as eval_cli


def _write_instance(root, name, frames):
    d = os.path.join(root, name) if name != "." else root
    os.makedirs(d, exist_ok=True)
    for i, f in enumerate(frames):
        cv2.imwrite(os.path.join(d, f"{i}.png"), f)
    return d


def _frames(seed, n=3, h=24, w=32):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), np.uint8) for _ in range(n)]


def test_identical_trees_pass_gate(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for name, seed in [("inst0", 0), ("inst1", 1)]:
        fr = _frames(seed)
        _write_instance(a, name, fr)
        _write_instance(b, name, fr)
    rep = eval_cli.evaluate_trees(a, b, psnr_gate=35.0)
    assert rep["n_instances"] == 2 and rep["gate_pass"]
    assert rep["psnr_min"] == 99.0  # inf capped for strict JSON
    json.dumps(rep)  # must be strict-JSON serialisable
    for row in rep["instances"].values():
        assert row["ssim_mean"] == pytest.approx(1.0)


def test_noisy_instance_fails_gate_and_exit_code(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    fr = _frames(2)
    _write_instance(a, "inst", fr)
    noisy = [np.clip(f.astype(np.int16) +
                     np.random.RandomState(9).randint(-60, 60, f.shape),
                     0, 255).astype(np.uint8) for f in fr]
    _write_instance(b, "inst", noisy)
    rep = eval_cli.evaluate_trees(a, b, psnr_gate=35.0)
    assert not rep["gate_pass"]
    assert rep["instances"]["inst"]["psnr_min"] < 35.0
    out = str(tmp_path / "m.json")
    rc = eval_cli.main([a, b, "--psnr-gate", "35", "--out", out])
    assert rc == 1 and json.load(open(out))["psnr_gate"] == 35.0
    # without a gate the exit code is 0 regardless of quality
    assert eval_cli.main([a, b]) == 0


def test_missing_instance_or_frame_mismatch_fails_gate(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    fr = _frames(3)
    _write_instance(a, "shared", fr)
    _write_instance(b, "shared", fr)
    _write_instance(a, "extra", fr)  # render missing on the reference side
    rep = eval_cli.evaluate_trees(a, b, psnr_gate=35.0)
    assert rep["only_a"] == ["extra"] and not rep["gate_pass"]

    c = str(tmp_path / "c")
    _write_instance(c, "shared", fr[:2])  # dropped final frame
    rep2 = eval_cli.evaluate_trees(a, c, psnr_gate=35.0)
    row = rep2["instances"]["shared"]
    assert row["frames_a"] == 3 and row["frames_b"] == 2
    assert not rep2["gate_pass"]


def test_single_instance_roots(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    fr = _frames(4)
    _write_instance(a, ".", fr)
    _write_instance(b, ".", fr)
    rep = eval_cli.evaluate_trees(a, b, psnr_gate=35.0)
    assert rep["n_instances"] == 1 and rep["gate_pass"]
