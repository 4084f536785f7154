"""Keypoint/video-object tracking facade (SAM + XMem).

Covers the reference's vendored Track-Anything stack (track_anything_code/,
SURVEY §2.7) and curation_pipeline/tracking_by_keypoint.py: click-point ->
SAM mask on the first frame -> video-object-segmentation propagation ->
per-frame ``mask*.png``.

SAM loads lazily behind the ``PointSegmenter`` protocol (detectors.py); the
propagator is injectable.  A dependency-free template-matching propagator
keeps the tool runnable without any checkpoint; with an ``XMem-s012.pth``
checkpoint, ``XMemPropagator`` runs the native flax XMem memory tracker
(models/xmem.py — every-5-frames memory insert, top-k readout, long-term
prototype consolidation: the reference's inference_core configuration).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import cv2
import numpy as np

from .detectors import PointSegmenter


def template_mask_propagator(frames_rgb: Sequence[np.ndarray], first_mask: np.ndarray):
    """Fallback propagation: normalised cross-correlation template tracking of
    the mask's bbox, carrying the mask shape along (approximate,
    dependency-free — the XMem propagator is the full-quality path)."""
    ys, xs = np.nonzero(first_mask)
    if len(xs) == 0:
        return [first_mask.astype(bool) for _ in frames_rgb]
    x0, y0 = int(xs.min()), int(ys.min())
    w, h = int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)
    template = frames_rgb[0][y0 : y0 + h, x0 : x0 + w]
    tmask = first_mask[y0 : y0 + h, x0 : x0 + w]
    masks = [first_mask.astype(bool)]
    for fr in frames_rgb[1:]:
        # TM_SQDIFF stays well-defined for low-variance templates (a uniform
        # object patch zero-centres to nothing under CCOEFF)
        res = cv2.matchTemplate(fr, template, cv2.TM_SQDIFF)
        _, _, (bx, by), _ = cv2.minMaxLoc(res)
        m = np.zeros(first_mask.shape, bool)
        m[by : by + h, bx : bx + w] = tmask[: m.shape[0] - by, : m.shape[1] - bx]
        masks.append(m)
        template = fr[by : by + h, bx : bx + w]  # drift-tolerant update
    return masks


csrt_mask_propagator = template_mask_propagator  # legacy alias


class XMemPropagator:
    """Full-quality VOS propagation with the native flax XMem
    (models/xmem.py + curation/xmem_tracker.py).  Loads the published
    ``XMem-s012.pth`` checkpoint through the torch->flax converter; torch is
    only used to deserialize the .pth file."""

    def __init__(self, checkpoint: str):
        import torch

        from ..models.xmem import XMem  # noqa: F401 (re-export context)
        from ..weights.convert import xmem_state_dict_to_flax
        from .xmem_tracker import xmem_propagator

        state = torch.load(checkpoint, map_location="cpu")
        state = {k: v.numpy() for k, v in state.items()}
        params = xmem_state_dict_to_flax(state)
        self._propagate = xmem_propagator(params)

    def __call__(self, frames_rgb, first_mask):
        return self._propagate(frames_rgb, first_mask)


def track_by_keypoint(
    instance_dir: str,
    segmenter: PointSegmenter,
    propagator: Optional[Callable] = None,
    store_dir: Optional[str] = None,
) -> List[np.ndarray]:
    """data.txt point -> SAM first-frame mask -> propagate -> mask*.png
    (reference tracking_by_keypoint.py:103-133)."""
    from ..data.rasterize import read_gesture_file

    propagator = propagator or template_mask_propagator
    points = read_gesture_file(os.path.join(instance_dir, "data.txt"))
    frames = []
    i = 0
    while os.path.exists(os.path.join(instance_dir, f"im_{i}.jpg")):
        frames.append(cv2.cvtColor(cv2.imread(os.path.join(instance_dir, f"im_{i}.jpg")),
                                   cv2.COLOR_BGR2RGB))
        i += 1
    _, x, y = points[0]
    first_mask = segmenter.predict_mask(
        cv2.cvtColor(frames[0], cv2.COLOR_RGB2BGR), np.array([[int(x), int(y)]])
    )
    masks = propagator(frames, np.asarray(first_mask))
    if store_dir:
        os.makedirs(store_dir, exist_ok=True)
        for i, m in enumerate(masks):
            cv2.imwrite(os.path.join(store_dir, f"mask_{i}.png"),
                        m.astype(np.uint8) * 255)
    return masks
