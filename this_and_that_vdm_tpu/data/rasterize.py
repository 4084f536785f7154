"""Gesture-point rasterisation ("this"/"that" conditioning frames).

Replicates reference data_loader/video_this_that_dataset.py:28-130
(``get_thisthat_sam``) and utils/optical_flow_utils.py:154-219
(``bivariate_Gaussian``): for each gesture point, paint a 21x21 square on a
white canvas at the ORIGINAL image resolution (point 0 red ``[0,0,255]`` BGR,
point 1 green ``[0,255,0]``), convolve with a 99x99 isotropic Gaussian
(sigma 10, reflect-101 border), bicubic-resize to model resolution, optional
horizontal flip, scale to [0,1], and place at ``frame_idx`` of an otherwise
zero ``[F, H, W, 3]`` tensor.

CPU-side (numpy/cv2) — this is dataset preprocessing, exactly like the
reference; channel order stays BGR end-to-end to preserve numerics (the
trained GestureNet consumed cv2 BGR canvases).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import cv2
import numpy as np


def bivariate_gaussian(kernel_size: int, sigma: float) -> np.ndarray:
    """Isotropic 2-D Gaussian kernel on the reference's centered mesh grid."""
    # note: ``-k // 2`` is floor division of the negated size (reference
    # mesh_grid), so for k=99 the grid runs -49..49 with the peak at index 49
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    kernel = np.exp(-0.5 * (xx**2 + yy**2) / sigma**2)
    return kernel / kernel.sum()


_BLUR_KERNEL = bivariate_gaussian(99, 10.0)

POINT_COLORS_BGR = ((0, 0, 255), (0, 255, 0))  # first red, second green
DOT_RANGE = 10  # half-width of the painted square


def rasterize_gesture_points(
    points: Sequence[Tuple[int, float, float]],  # (frame_idx, x, y) original-res
    original_hw: Tuple[int, int],
    target_hw: Tuple[int, int],
    num_frames: int = 14,
    flip: bool = False,
    dilate: bool = True,
) -> np.ndarray:
    """Returns ``[F, H, W, 3]`` float32 in [0,1] (zeros except gesture frames)."""
    oh, ow = original_hw
    th, tw = target_hw
    condition = np.zeros((num_frames, th, tw, 3), np.float32)
    for idx, (frame_idx, x, y) in enumerate(points):
        col, row = int(float(x)), int(float(y))
        canvas = np.full((oh, ow, 3), 255.0, np.float32)
        r0, r1 = max(row - DOT_RANGE, 0), min(row + DOT_RANGE + 1, oh)
        c0, c1 = max(col - DOT_RANGE, 0), min(col + DOT_RANGE + 1, ow)
        canvas[r0:r1, c0:c1] = POINT_COLORS_BGR[min(idx, 1)]
        if dilate:
            canvas = cv2.filter2D(canvas, -1, _BLUR_KERNEL)
        canvas = cv2.resize(canvas, (tw, th), interpolation=cv2.INTER_CUBIC)
        if flip:
            canvas = np.fliplr(canvas)
        condition[int(frame_idx)] = canvas / 255.0
    return condition


def read_gesture_file(path: str) -> List[Tuple[int, float, float]]:
    """Parse ``data.txt`` lines ``frame_idx x y`` (reference column order:
    frame_idx, horizontal, vertical)."""
    points = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            frame_idx, x, y = line.split(" ")
            points.append((int(frame_idx), float(x), float(y)))
    return points


def load_condition(
    instance_dir: str,
    target_hw: Tuple[int, int],
    num_frames: int = 14,
    flip: bool = False,
    dilate: bool = True,
):
    """File-based variant mirroring ``get_thisthat_sam``'s return signature:
    (condition [F,H,W,3] in [0,1], motion_bucket_id, frame indices, coords)."""
    points = read_gesture_file(os.path.join(instance_dir, "data.txt"))
    sample = cv2.imread(os.path.join(instance_dir, "im_0.jpg"))
    oh, ow = sample.shape[:2]
    cond = rasterize_gesture_points(points, (oh, ow), target_hw, num_frames, flip, dilate)
    indices = [p[0] for p in points]
    coords = [(p[2], p[1]) for p in points]  # (vertical, horizontal)
    return cond, 200, indices, coords
