"""Curation pipeline: auto-labeler with a fake detector, flatteners,
flow trajectories with the built-in Farneback backend."""

import os
import pickle

import numpy as np
import cv2
import pytest

from this_and_that_vdm_tpu.curation import select_frames, prepare_bridge, trajectory


class FakeDetector:
    """xywh boxes per image index, keyed by file content marker pixel."""

    def __init__(self, mapping):
        self.mapping = mapping  # marker value -> boxes

    def boxes_xywh(self, image_bgr):
        marker = int(round(float(image_bgr[:8, :8, 0].mean()) / 5.0))
        return np.asarray(self.mapping.get(marker, []), np.float32)


def _make_traj(tmp_path, n_frames=30, marker_boxes=None):
    d = tmp_path / "traj"
    os.makedirs(d)
    for i in range(n_frames):
        img = np.full((120, 160, 3), i * 5, np.uint8)  # uniform marker, JPEG-safe
        cv2.imwrite(str(d / f"im_{i}.jpg"), img, [cv2.IMWRITE_JPEG_QUALITY, 100])
    # actions: open (1.0) until 5, closed (0.0) 5..20, open from 20
    policy = []
    for i in range(n_frames):
        a = 0.0 if 5 <= i < 20 else 1.0
        policy.append({"actions": np.array([0, 0, 0, 0, 0, 0, a])})
    with open(d / "policy_out.pkl", "wb") as f:
        pickle.dump(policy, f)
    (d / "lang.txt").write_text("pick up the fork\n")
    return str(d)


def test_parse_action_range(tmp_path):
    d = _make_traj(tmp_path)
    rng = select_frames.parse_action_range(os.path.join(d, "policy_out.pkl"))
    assert rng == (5, 20)


def test_process_instance_with_fake_detector(tmp_path):
    d = _make_traj(tmp_path)
    # frames 5..7 (voting) and 20 (end) get detections; distances differ so
    # voting picks the closest pair (frame 6, distance 20)
    det = FakeDetector({
        5: [[50, 50, 20, 20], [90, 50, 20, 20]],   # dist 40
        6: [[50, 50, 20, 20], [70, 50, 20, 20]],   # dist 20  <- winner
        7: [[50, 50, 20, 20], [95, 50, 20, 20]],   # dist 45
        20: [[120, 90, 20, 20]],
    })
    store = str(tmp_path / "out")
    ok, msg = select_frames.process_instance(d, store, det)
    assert ok, msg
    assert sorted(f for f in os.listdir(store) if f.startswith("im_")) \
        == [f"im_{i}.jpg" for i in sorted(range(14), key=str)]
    lines = open(os.path.join(store, "data.txt")).read().strip().splitlines()
    assert len(lines) == 2  # two points (far apart, no merge)
    i0, x0, y0 = lines[0].split()
    assert float(x0) == 60.0 and float(y0) == 50.0  # midpoint of winning pair
    assert open(os.path.join(store, "lang.txt")).read().startswith("pick up")


def test_process_instance_merges_close_points(tmp_path):
    d = _make_traj(tmp_path)
    det = FakeDetector({
        5: [[50, 50, 20, 20]],
        20: [[60, 55, 20, 20]],  # within 30px of first -> merged
    })
    ok, msg = select_frames.process_instance(d, str(tmp_path / "o2"), det)
    assert ok
    lines = open(tmp_path / "o2" / "data.txt").read().strip().splitlines()
    assert len(lines) == 1


def test_flatten_bridge_v2(tmp_path):
    raw = tmp_path / "raw"
    traj = raw / "scene" / "task" / "order" / "clock" / "raw" / "traj_group0" / "traj0"
    imgs = traj / "images0"
    os.makedirs(imgs)
    for i in range(3):
        cv2.imwrite(str(imgs / f"im_{i}.jpg"), np.zeros((8, 8, 3), np.uint8))
    (traj / "policy_out.pkl").write_bytes(pickle.dumps([]))
    (traj / "lang.txt").write_text("x\n")
    # lmdb dir must be skipped
    os.makedirs(raw / "scene" / "task" / "order" / "lmdb")
    n = prepare_bridge.flatten_bridge(str(raw), str(tmp_path / "flat"), version=2)
    assert n == 1
    out = tmp_path / "flat" / "0"
    assert {"im_0.jpg", "im_1.jpg", "im_2.jpg", "policy_out.pkl", "lang.txt"} <= set(os.listdir(out))


def test_export_csv_and_jsonl_indices(tmp_path):
    """prepare_bridge_csv.py / prepare_bridge_jsonl.py equivalents: CSV rows
    count only the sequential im_* prefix; JSONL lists valid raw trajs."""
    import csv, json

    # raw tree (for jsonl) -> flatten (for csv)
    raw = tmp_path / "raw"
    traj = raw / "s" / "t" / "o" / "c" / "raw" / "traj_group0" / "traj0"
    imgs = traj / "images0"
    os.makedirs(imgs)
    for i in [0, 1, 2, 4]:  # gap at 3: csv must count 3, not 4
        cv2.imwrite(str(imgs / f"im_{i}.jpg"), np.zeros((8, 8, 3), np.uint8))
    (traj / "policy_out.pkl").write_bytes(pickle.dumps([]))
    (traj / "lang.txt").write_text("put the cup there\n")

    n = prepare_bridge.export_jsonl([str(raw)], str(tmp_path / "idx.jsonl"), [2])
    assert n == 1
    rec = json.loads(open(tmp_path / "idx.jsonl").read().strip())
    assert rec["file_path"].endswith("traj0")

    prepare_bridge.flatten_bridge(str(raw), str(tmp_path / "flat"), version=2)
    n = prepare_bridge.export_csv([str(tmp_path / "flat")], str(tmp_path / "idx.csv"))
    assert n == 1
    rows = list(csv.reader(open(tmp_path / "idx.csv")))
    assert rows[0] == ["path", "text", "num_frames", "height", "width"]
    assert rows[1][1].startswith("put the cup") and rows[1][2] == "3"


def test_trajectory_on_synthetic_motion():
    # a bright square moving right by 4px/frame on a dark background
    frames = []
    for t in range(6):
        img = np.zeros((64, 96, 3), np.uint8)
        img[28:36, 20 + 4 * t : 28 + 4 * t] = 255
        frames.append(img)
    frames = np.stack(frames)
    flows = trajectory.compute_flows(frames)
    start = trajectory.pick_start_point(flows[0])
    assert start is not None
    traj = trajectory.chain_trajectory(flows, start)
    assert len(traj) == 6
    # net horizontal displacement ~ 4px/frame rightwards
    dx = traj[-1][1] - traj[0][1]
    assert dx > 10, traj
    motion = trajectory.per_video_motion(frames)
    assert motion > 0


def test_filter_uv_thresholding():
    flow = np.zeros((4, 4, 2), np.float32)
    flow[0, 0] = (10.0, 0.0)
    flow[1, 1] = (1.0, 0.0)
    out = trajectory.filter_uv(flow, 0.2)
    assert out[0, 0, 0] == 10.0 and out[1, 1, 0] == 0.0


class FakeSegmenter:
    """Returns a square mask around the mean positive point; records prompts."""

    def __init__(self, half=25):
        self.half = half
        self.calls = []

    def predict_mask_labeled(self, image_rgb, coords, labels):
        self.calls.append((np.asarray(coords), np.asarray(labels)))
        pos = np.asarray(coords)[np.asarray(labels) == 1]
        cx, cy = pos.mean(axis=0)
        mask = np.zeros(image_rgb.shape[:2], bool)
        r0, r1 = int(cy) - self.half, int(cy) + self.half
        c0, c1 = int(cx) - self.half, int(cx) + self.half
        mask[max(r0, 0):r1, max(c0, 0):c1] = True
        return mask


def _moving_square_frames(n=14, h=96, w=128, size=16, step=3, step_y=1,
                          textured=True):
    # textured + diagonal: a FLAT square moving on one axis gives Farneback
    # flow only at edges with v ~= 0, and the reference's `u==0 or v==0`
    # skip quirk then marks nearly every frame hard-to-track (such clips
    # are DISCARDED by the reference's 1/3 rule — regression test below)
    tex = np.random.RandomState(7).randint(64, 255, (size, size, 3)).astype(np.uint8)
    frames = []
    for i in range(n):
        img = np.zeros((h, w, 3), np.uint8)
        x = 30 + step * i
        y = 40 + step_y * i
        img[y:y + size, x:x + size] = tex if textured else 255
        frames.append(img)
    return frames


def test_sam_start_point_and_ref_chaining(tmp_path):
    frames = _moving_square_frames()
    flows = trajectory.compute_flows(np.stack(frames))
    seg = FakeSegmenter(half=8)  # tight mask: start lands on the square
    rng = np.random.RandomState(0)
    start = trajectory.pick_start_point_sam(frames[0], flows[0], seg, rng,
                                            interior=5)
    assert start is not None
    # prompts: 20 positive xy points, all on moving pixels
    coords, labels = seg.calls[0]
    assert coords.shape == (20, 2) and (labels == 1).all()
    f0 = trajectory.filter_uv(flows[0])
    for x, y in coords.astype(int):
        assert f0[y, x, 0] != 0 or f0[y, x, 1] != 0
    # start point lies inside the fake mask
    mask = seg.predict_mask_labeled(frames[0], coords, labels)
    assert mask[start[0], start[1]]

    traj = trajectory.chain_trajectory_ref(flows, start)
    assert traj is not None and len(traj) == len(flows) + 1
    # the square moves right ~3px/frame (and down ~1px): column increases
    assert traj[-1][1] > traj[0][1] + 15
    assert abs(traj[-1][0] - traj[0][0]) < 25


def test_chain_trajectory_ref_discards_hard_to_track_clip():
    """>=1/3 hard-to-track frames -> discard (reference generate_traj.py
    :372-373, :427-432): frames whose +-5 window is empty (motion exists
    only far away) count as hard; past 1/3 the clip is rejected even though
    every frame eventually finds SOME flow."""
    h = w = 64
    flows = np.zeros((6, h, w, 2), np.float32)
    start = (20, 20)
    # frames 0-1: flow right at the tracked point (easy); frames 2-5: the
    # only motion is a distant blob -> expanded search -> hard
    flows[:2, 15:26, 15:26] = (2.0, 1.0)
    flows[2:, 40:48, 40:48] = (2.0, 1.0)  # reachable before the half-height give-up
    assert trajectory.chain_trajectory_ref(flows, start) is None
    # same clip with hard frames below the 1/3 threshold survives
    flows2 = flows.copy()
    flows2[2:5, 15:36, 15:36] = (2.0, 1.0)  # only frame 5 stays hard
    assert trajectory.chain_trajectory_ref(flows2, start) is not None


def test_chain_trajectory_ref_discards_when_untrackable():
    flows = np.zeros((3, 40, 40, 2), np.float32)
    assert trajectory.chain_trajectory_ref(flows, (20, 20)) is None


def test_sample_sam_points_negative_labels():
    flow = np.zeros((50, 60, 2), np.float32)
    flow[10:20, 10:20] = 1.5
    coords, labels = trajectory.sample_sam_points(
        flow, n_pos=20, n_neg=10, rng=np.random.RandomState(1))
    pos, neg = coords[labels == 1].astype(int), coords[labels == 0].astype(int)
    assert len(pos) == 20 and len(neg) > 0
    for x, y in pos:
        assert flow[y, x].any()
    for x, y in neg:
        assert not flow[y, x].any()


def test_trajectory_batch_driver(tmp_path):
    for name, moving in [("000000", True), ("000001", False)]:
        d = tmp_path / name
        os.makedirs(d)
        frames = (_moving_square_frames() if moving
                  else [np.zeros((96, 128, 3), np.uint8)] * 14)
        for i, f in enumerate(frames):
            cv2.imwrite(str(d / f"im_{i}.jpg"), f, [cv2.IMWRITE_JPEG_QUALITY, 100])
    messages = trajectory.process_dataset_traj(str(tmp_path), num_workers=2)
    assert messages.get("Success!") == 1
    assert sum(messages.values()) == 2
    assert os.path.exists(tmp_path / "000000" / "traj_data.txt")
    assert not os.path.exists(tmp_path / "000001" / "traj_data.txt")


def test_select_frames_cli_driver(tmp_path, monkeypatch):
    """The -m select_frames batch CLI runs over a root with injected fakes."""
    d = _make_traj(tmp_path / "in")
    det = FakeDetector({
        5: [[50, 50, 20, 20], [90, 50, 20, 20]],
        6: [[50, 50, 20, 20], [70, 50, 20, 20]],
        7: [[50, 50, 20, 20], [95, 50, 20, 20]],
        20: [[120, 90, 20, 20]],
    })
    out = str(tmp_path / "out")
    messages = select_frames.process_dataset(str(tmp_path / "in"), out, det)
    assert messages.get("Success!") == 1
    assert os.path.exists(os.path.join(out, "traj", "data.txt"))


def test_flowformer_adapter_with_fake_vendored_module(tmp_path, monkeypatch):
    """detectors.FlowFormerFlow loads a user-vendored ``flowformer_code``
    package (reference generate_traj.py:20-26) and replicates the untiled
    compute_flow path (:85-100): sintel InputPadder pad-to-/8 (replicate,
    left/right + top-heavy split), one forward, unpad.  Faked here with a
    torch module returning a coordinate grid so the unpad crop offsets are
    observable."""
    import sys
    import types

    import torch

    class FakeFlowFormer(torch.nn.Module):
        def __init__(self, cfg):
            super().__init__()
            self.scale = torch.nn.Parameter(torch.ones(()))

        def forward(self, im1, im2):
            b, _, h, w = im1.shape
            ys = torch.arange(h, dtype=torch.float32)[None, None, :, None]
            xs = torch.arange(w, dtype=torch.float32)[None, None, None, :]
            flow = torch.cat([xs.expand(b, 1, h, w), ys.expand(b, 1, h, w)], 1)
            return flow * self.scale, None

    mod = types.ModuleType("flowformer_code.FlowFormer")
    mod.build_flowformer = lambda cfg: FakeFlowFormer(cfg)
    pkg = types.ModuleType("flowformer_code")
    pkg.FlowFormer = mod
    monkeypatch.setitem(sys.modules, "flowformer_code", pkg)
    monkeypatch.setitem(sys.modules, "flowformer_code.FlowFormer", mod)

    ckpt = tmp_path / "sintel.pth"
    torch.save(torch.nn.DataParallel(FakeFlowFormer(None)).state_dict(), ckpt)

    from this_and_that_vdm_tpu.curation.detectors import FlowFormerFlow

    ff = FlowFormerFlow(str(ckpt), flow_cfg={})
    h, w = 30, 45  # pads to 32x48: pad_w=3 -> (1,2), pad_h=2 -> (1,1)
    flow = ff(np.zeros((h, w, 3), np.uint8), np.zeros((h, w, 3), np.uint8))
    assert flow.shape == (h, w, 2)
    # the coordinate grid must be cropped at the padder's left/top offsets
    np.testing.assert_allclose(flow[0, 0], [1.0, 1.0])
    np.testing.assert_allclose(flow[h - 1, w - 1], [w, h])
