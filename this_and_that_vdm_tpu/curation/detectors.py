"""Perception-model interfaces for the offline curation pipeline.

The reference hard-wires ultralytics YOLO (gripper weights), SAM and XMem
(curation_pipeline/select_frame_with_this_that.py:384-390,
track_anything_code/).  Those are *offline tooling*, so we keep them on
CPU/CPython behind small protocols; the real-model wrappers load lazily and
only when the optional dependency + checkpoint are present, and everything
algorithmic is testable with fakes.
"""

from __future__ import annotations

from typing import List, Optional, Protocol, Tuple

import numpy as np


class BoxDetector(Protocol):
    """Returns [N, 4] xywh (center x, center y, width, height) boxes."""

    def boxes_xywh(self, image_bgr: np.ndarray) -> np.ndarray: ...


class PointSegmenter(Protocol):
    """SAM-like: mask from positive points (+ optional xyxy box prompt)."""

    def predict_mask(
        self,
        image_bgr: np.ndarray,
        points_xy: np.ndarray,
        box_xyxy: Optional[np.ndarray] = None,
    ) -> np.ndarray: ...


class UltralyticsGripperDetector:
    """YOLOv8 gripper detector (reference :384-385); needs ultralytics + weights."""

    def __init__(self, weight_path: str):
        from ultralytics import YOLO  # optional dep

        self.model = YOLO(weight_path)

    def boxes_xywh(self, image_bgr: np.ndarray) -> np.ndarray:
        pred = self.model.predict(source=image_bgr[:, :, ::-1], save=False)[0]
        if not hasattr(pred, "boxes"):
            return np.zeros((0, 4), np.float32)
        return np.asarray(pred.boxes.xywh.detach().cpu().numpy(), np.float32)


class SAMSegmenter:
    """segment-anything point/box segmenter (reference :387-390)."""

    def __init__(self, checkpoint: str, model_type: str = "vit_h", device: str = "cpu"):
        from segment_anything import SamPredictor, sam_model_registry  # optional dep

        sam = sam_model_registry[model_type](checkpoint=checkpoint).to(device)
        self.predictor = SamPredictor(sam)

    def predict_mask(self, image_bgr, points_xy, box_xyxy=None) -> np.ndarray:
        self.predictor.set_image(np.uint8(image_bgr))
        masks, _scores, _ = self.predictor.predict(
            point_coords=np.asarray(points_xy),
            point_labels=np.ones(len(points_xy)),
            box=None if box_xyxy is None else np.asarray(box_xyxy)[None, :],
            multimask_output=False,
        )
        return masks[0]


def farneback_flow(prev_rgb: np.ndarray, next_rgb: np.ndarray) -> np.ndarray:
    """Dense optical flow fallback (cv2 Farneback) — stands in for FlowFormer
    (reference scripts/generate_traj.py:23-26 vendors FlowFormer, which the
    user must supply; this keeps the trajectory/motion-stats tooling runnable
    out of the box)."""
    import cv2

    g1 = cv2.cvtColor(prev_rgb, cv2.COLOR_RGB2GRAY)
    g2 = cv2.cvtColor(next_rgb, cv2.COLOR_RGB2GRAY)
    return cv2.calcOpticalFlowFarneback(g1, g2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
