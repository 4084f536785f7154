"""Optical-flow trajectories + motion statistics.

Replicates reference scripts/generate_traj.py (flow -> moving-point mask ->
centered start point -> chained local-mean trajectory with expanding search
-> ``traj_data.txt``) and scripts/motion_stats.py (per-video mean flow
magnitude -> the N(35.3, 18.5)/N(25, 10) constants in the training YAMLs).

The flow backend is injectable: FlowFormer (vendored, as the reference
expects its user to do) or the built-in cv2 Farneback fallback
(detectors.farneback_flow) so everything runs without extra checkpoints.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import cv2
import numpy as np

from .detectors import farneback_flow

FlowFn = Callable[[np.ndarray, np.ndarray], np.ndarray]  # (H,W,3)x2 -> (H,W,2)


def filter_uv(flow: np.ndarray, threshold_factor: float = 0.2) -> np.ndarray:
    """Zero out flow below threshold_factor * max magnitude
    (reference generate_traj.py:171-182)."""
    mag = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    thr = threshold_factor * mag.max() if mag.max() > 0 else 0.0
    out = flow.copy()
    out[mag < thr] = 0.0
    return out


def compute_flows(frames_rgb: np.ndarray, flow_fn: FlowFn = farneback_flow):
    """Consecutive-frame flows: [F-1, H, W, 2]."""
    return np.stack(
        [flow_fn(frames_rgb[i], frames_rgb[i + 1]) for i in range(len(frames_rgb) - 1)]
    )


def pick_start_point(flow: np.ndarray, threshold_factor: float = 0.2):
    """Most-centered moving point of the first flow field (:311-347)."""
    f = filter_uv(flow, threshold_factor)
    moving = np.argwhere((f[..., 0] != 0) | (f[..., 1] != 0))  # (row, col)
    if len(moving) == 0:
        return None
    center = np.array([flow.shape[0] / 2, flow.shape[1] / 2])
    return tuple(moving[np.argmin(np.linalg.norm(moving - center, axis=1))])


def chain_trajectory(
    flows: np.ndarray,
    start_rc: Tuple[int, int],
    threshold_factor: float = 0.2,
    base_radius: int = 5,
    max_radius: int = 60,
) -> List[Tuple[float, float]]:
    """Chain mean local flow into a per-frame trajectory with an expanding
    search window when no moving pixels are nearby (:357-397)."""
    h, w = flows.shape[1:3]
    traj = [(float(start_rc[0]), float(start_rc[1]))]
    r, c = float(start_rc[0]), float(start_rc[1])
    for f in flows:
        f = filter_uv(f, threshold_factor)
        radius = base_radius
        move = None
        while radius <= max_radius:
            r0, r1 = max(int(r) - radius, 0), min(int(r) + radius + 1, h)
            c0, c1 = max(int(c) - radius, 0), min(int(c) + radius + 1, w)
            patch = f[r0:r1, c0:c1]
            mask = (patch[..., 0] != 0) | (patch[..., 1] != 0)
            if mask.any():
                move = patch[mask].mean(axis=0)  # (u, v) = (dx, dy)
                break
            radius *= 2
        if move is None:
            move = np.zeros(2)
        c = float(np.clip(c + move[0], 0, w - 1))
        r = float(np.clip(r + move[1], 0, h - 1))
        traj.append((r, c))
    return traj


def write_traj(path: str, traj: List[Tuple[float, float]]) -> None:
    with open(os.path.join(path, "traj_data.txt"), "w") as f:
        for i, (r, c) in enumerate(traj):
            f.write(f"{i} {c} {r}\n")  # frame x y (same order as data.txt)


def per_video_motion(frames_rgb: np.ndarray, flow_fn: FlowFn = farneback_flow) -> float:
    """Mean flow magnitude across the clip (motion_stats.py:62-66)."""
    flows = compute_flows(frames_rgb, flow_fn)
    return float(np.mean(np.sqrt(flows[..., 0] ** 2 + flows[..., 1] ** 2)))


def dataset_motion_stats(videos: List[np.ndarray], flow_fn: FlowFn = farneback_flow):
    vals = np.array([per_video_motion(v, flow_fn) for v in videos])
    return {"mean": float(vals.mean()), "std": float(vals.std()),
            "values": vals.tolist()}
