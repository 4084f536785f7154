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


class LabeledPointSegmenter(Protocol):
    """SAM-like with positive/negative point labels (generate_traj.py:300-304)."""

    def predict_mask_labeled(
        self,
        image_rgb: np.ndarray,
        points_xy: np.ndarray,
        labels: np.ndarray,
    ) -> np.ndarray: ...


class UltralyticsGripperDetector:
    """YOLOv8 gripper detector (reference :384-385); needs ultralytics + weights."""

    def __init__(self, weight_path: str):
        from ultralytics import YOLO  # optional dep

        self.model = YOLO(weight_path)

    def boxes_xywh(self, image_bgr: np.ndarray) -> np.ndarray:
        # ultralytics treats numpy sources as BGR and flips internally
        # (its preprocess does im[..., ::-1]); pre-flipping here handed the
        # net channel-swapped images (round-2 review)
        pred = self.model.predict(source=image_bgr, save=False)[0]
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
        # SamPredictor.set_image defaults to image_format="RGB"; declare the
        # BGR input so the ViT sees correct channels (round-2 review)
        self.predictor.set_image(np.uint8(image_bgr), image_format="BGR")
        masks, _scores, _ = self.predictor.predict(
            point_coords=np.asarray(points_xy),
            point_labels=np.ones(len(points_xy)),
            box=None if box_xyxy is None else np.asarray(box_xyxy)[None, :],
            multimask_output=False,
        )
        return masks[0]

    def predict_mask_labeled(self, image_rgb, points_xy, labels) -> np.ndarray:
        """Positive+negative point prompt (generate_traj.py:291-304)."""
        self.predictor.set_image(np.uint8(image_rgb))
        masks, _scores, _ = self.predictor.predict(
            point_coords=np.asarray(points_xy),
            point_labels=np.asarray(labels),
            multimask_output=False,
        )
        return masks[0]


class FlowFormerFlow:
    """Adapter for a user-vendored FlowFormer (reference scripts/
    generate_traj.py:20-26 imports ``flowformer_code`` which is NOT in the
    repo — the user supplies it; same contract here).  Implements the
    untiled ``compute_flow`` path (:85-100): pad both frames to a multiple
    of 8 (sintel-style InputPadder), one forward, unpad.

    ``flow_cfg`` defaults to the reference's yacs config
    (config/flowformer_config.get_cfg) if importable."""

    def __init__(self, checkpoint: str, device: str = "cpu", flow_cfg=None):
        import torch  # optional heavy dep, load lazily
        from flowformer_code.FlowFormer import build_flowformer  # vendored

        if flow_cfg is None:
            from config.flowformer_config import get_cfg

            flow_cfg = get_cfg()
        self.torch = torch
        self.device = device
        model = torch.nn.DataParallel(build_flowformer(flow_cfg))
        model.load_state_dict(torch.load(checkpoint, map_location="cpu"))
        self.model = model.module.to(device).eval()

    def __call__(self, prev_rgb: np.ndarray, next_rgb: np.ndarray) -> np.ndarray:
        torch = self.torch
        im1 = torch.from_numpy(prev_rgb).permute(2, 0, 1).float()[None]
        im2 = torch.from_numpy(next_rgb).permute(2, 0, 1).float()[None]
        h, w = im1.shape[-2:]
        pad_h, pad_w = (-h) % 8, (-w) % 8
        # sintel-mode InputPadder: split left/right, top-heavy vertical
        pad = [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2]
        im1 = torch.nn.functional.pad(im1, pad, mode="replicate").to(self.device)
        im2 = torch.nn.functional.pad(im2, pad, mode="replicate").to(self.device)
        with torch.no_grad():
            flow_pre, _ = self.model(im1, im2)
        flow = flow_pre[0, :, pad[2]:pad[2] + h, pad[0]:pad[0] + w]
        return flow.permute(1, 2, 0).cpu().numpy()


def farneback_flow(prev_rgb: np.ndarray, next_rgb: np.ndarray) -> np.ndarray:
    """Dense optical flow fallback (cv2 Farneback) — stands in for FlowFormer
    (reference scripts/generate_traj.py:23-26 vendors FlowFormer, which the
    user must supply; this keeps the trajectory/motion-stats tooling runnable
    out of the box)."""
    import cv2

    g1 = cv2.cvtColor(prev_rgb, cv2.COLOR_RGB2GRAY)
    g2 = cv2.cvtColor(next_rgb, cv2.COLOR_RGB2GRAY)
    return cv2.calcOpticalFlowFarneback(g1, g2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
