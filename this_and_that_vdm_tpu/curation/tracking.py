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


class BaseTracker:
    """Per-frame XMem tracking over indexed masks
    (reference track_anything_code/tracker/base_tracker.py:30-108): maps
    arbitrary object labels to contiguous ids, steps the memory tracker,
    argmaxes to an indexed mask, and paints the overlay."""

    def __init__(self, params, config=None):
        from ..models.xmem import XMem
        from .xmem_tracker import DEFAULT_CONFIG, MaskMapper, XMemInferenceCore

        self.core = XMemInferenceCore(XMem(), params, config or DEFAULT_CONFIG)
        self.mapper = MaskMapper()

    def clear_memory(self):
        from .xmem_tracker import MaskMapper

        self.core.clear_memory()
        self.mapper = MaskMapper()

    def track(self, frame_rgb: np.ndarray, first_frame_annotation=None):
        """frame_rgb uint8 [H,W,3]; annotation: indexed mask [H,W] or None.
        Returns (indexed_mask, indexed_mask, painted_image) — the reference
        returns the mask twice in place of a logit map."""
        from .painters import mask_painter

        if first_frame_annotation is not None:
            onehot, _labels = self.mapper.convert_mask(
                np.asarray(first_frame_annotation))
            self.core.set_all_labels(list(self.mapper.remappings.values()))
            mask = onehot
        else:
            mask = None
        prob = self.core.step(frame_rgb.astype(np.float32) / 255.0, mask)
        out = np.argmax(prob, axis=0).astype(np.uint8)
        final = np.zeros_like(out)
        for k, v in self.mapper.remappings.items():
            final[out == v] = k
        painted = frame_rgb
        for obj in range(1, int(final.max()) + 1):
            if np.any(final == obj):
                painted = mask_painter(painted, final == obj,
                                       mask_color=obj + 1)
        return final, final, painted


class TrackingAnything:
    """SAM + XMem facade (reference track_anything_code/model.py:14-45):
    ``first_frame_click`` segments the clicked object, ``generator``
    propagates a template mask over a clip."""

    def __init__(self, segmenter: PointSegmenter, xmem_params, config=None):
        self.segmenter = segmenter
        self.tracker = BaseTracker(xmem_params, config)

    def first_frame_click(self, image_rgb: np.ndarray, points_xy: np.ndarray,
                          labels=None):
        from .painters import mask_painter, point_painter

        mask = self.segmenter.predict_mask(image_rgb[:, :, ::-1],
                                           np.asarray(points_xy))
        painted = mask_painter(image_rgb, mask)
        painted = point_painter(painted, [tuple(p) for p in points_xy],
                                point_radius=8)
        return mask, mask, painted

    def generator(self, images: Sequence[np.ndarray],
                  template_mask: np.ndarray):
        masks, logits, painted = [], [], []
        for i, img in enumerate(images):
            m, l, p = self.tracker.track(
                img, template_mask if i == 0 else None)
            masks.append(m)
            logits.append(l)
            painted.append(p)
        return masks, logits, painted


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
