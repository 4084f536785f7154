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


class NativeGripperDetector:
    """TPU-native YOLOv8 gripper detector (models/yolov8.py) with the
    ultralytics predict contract (reference
    curation_pipeline/select_frame_with_this_that.py:384-385): BGR numpy in,
    [N, 4] xywh center boxes out.

    Loads ultralytics ``.pt`` checkpoints via the shell-unpickler
    (``weights/convert.load_ultralytics_state_dict``) — no ultralytics
    package needed; the architecture scale (n/s/m, class count, DFL bins)
    is inferred from the weights."""

    def __init__(self, weight_path: Optional[str] = None, params=None,
                 cfg=None, imgsz: int = 640, conf: float = 0.25,
                 iou: float = 0.7):
        import jax
        import jax.numpy as jnp

        from ..models.yolov8 import YOLOv8, YOLOv8Config

        if params is None:
            from ..weights.convert import (
                load_ultralytics_state_dict, yolo_state_dict_to_flax,
            )

            sd = load_ultralytics_state_dict(weight_path)
            cfg = YOLOv8Config.from_state_dict(sd)
            params = yolo_state_dict_to_flax(sd)
        assert cfg is not None, "pass cfg with params"
        self.cfg = cfg
        self.model = YOLOv8(cfg)
        self.params = params
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.jnp = jnp
        self._fwd = jax.jit(lambda p, x: self.model.apply(p, x))

    def boxes_xywh(self, image_bgr: np.ndarray) -> np.ndarray:
        from ..models.yolov8 import letterbox_np, nms_np, scale_boxes_np

        img = np.asarray(image_bgr)
        padded, ratio, pad = letterbox_np(img, self.imgsz)
        x = padded[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB, [0,1]
        pred = np.asarray(
            self._fwd(self.params, self.jnp.asarray(x[None])), np.float32)[0]
        boxes, _conf, _cls = nms_np(
            pred[:, :4], pred[:, 4:], self.conf, self.iou)
        return scale_boxes_np(boxes, ratio, pad, img.shape[:2])


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


class NativeSAMSegmenter:
    """TPU-native SAM (models/sam.py) with the SamPredictor contract —
    embed-once per frame, predict per prompt (reference
    track_anything_code/tools/base_segmenter.py:25-56).

    Loads the published ``sam_vit_{b,l,h}*.pth`` checkpoints through
    ``weights/convert.sam_state_dict_to_flax`` (torch used only to unpickle
    the file).  Prompts are padded to ``max_points`` static slots with
    "not a point" labels so every predict hits one compiled executable.
    Boxes ride the same path as two corner points with labels 2/3 (the
    architecture's own box encoding)."""

    def __init__(self, checkpoint: Optional[str] = None,
                 model_type: str = "vit_h", params=None, dtype=None,
                 max_points: int = 8):
        import jax
        import jax.numpy as jnp

        from ..models import sam as sam_mod

        cfg = getattr(sam_mod.SamConfig, model_type)()
        self.cfg = cfg
        self.model = sam_mod.Sam(cfg)
        self.max_points = max_points
        self.jnp = jnp
        if params is None:
            import torch

            from ..weights.convert import sam_state_dict_to_flax

            state = torch.load(checkpoint, map_location="cpu",
                               weights_only=True)
            params = sam_state_dict_to_flax(
                {k: v.numpy() for k, v in state.items()})
        if dtype is not None:
            params = jax.tree.map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
                params)
        self.params = params
        self._encode = jax.jit(
            lambda p, x: self.model.apply(p, x, method=sam_mod.Sam.encode_image))
        self._predict = jax.jit(
            lambda p, emb, pts, lbl: self.model.apply(
                p, emb, pts, lbl, method=sam_mod.Sam.predict))
        self._cache_key = None
        self._cache = None

    # -- embed-once ---------------------------------------------------------
    def _set_image(self, image_rgb_uint8: np.ndarray):
        import hashlib

        img = np.ascontiguousarray(np.uint8(image_rgb_uint8))
        key = (img.shape, hashlib.sha1(img.tobytes()).hexdigest())
        if key == self._cache_key:
            return self._cache
        from ..models.sam import preprocess_np

        x, input_hw = preprocess_np(img, self.cfg.img_size)
        emb = self._encode(self.params, self.jnp.asarray(x))
        self._cache_key = key
        self._cache = (emb, input_hw, img.shape[:2])
        return self._cache

    def _run(self, image_rgb, coords_xy, labels):
        from ..models.sam import (
            MASK_THRESHOLD, postprocess_masks_np, transform_coords_np,
        )

        emb, input_hw, orig_hw = self._set_image(image_rgb)
        n = len(coords_xy)
        # static-shape slot buckets (multiples of max_points) so arbitrary
        # prompt counts — e.g. the trajectory SAM stage's 20 sampled points
        # (curation/trajectory.py::pick_start_point_sam) — compile at most a
        # handful of predict variants
        slots = max(self.max_points,
                    -(-n // self.max_points) * self.max_points)
        pts = np.zeros((1, slots, 2), np.float32)
        lbl = np.full((1, slots), -1, np.int32)
        pts[0, :n] = transform_coords_np(
            np.asarray(coords_xy, np.float32), orig_hw, self.cfg.img_size)
        lbl[0, :n] = np.asarray(labels, np.int32)
        low_res, _iou = self._predict(
            self.params, emb, self.jnp.asarray(pts), self.jnp.asarray(lbl))
        # multimask_output=False -> mask token 0 (official predict path)
        masks = postprocess_masks_np(
            np.asarray(low_res[:, :1], np.float32), input_hw, orig_hw,
            self.cfg.img_size)
        return masks[0, 0] > MASK_THRESHOLD

    # -- reference-facing protocols ----------------------------------------
    def predict_mask(self, image_bgr, points_xy, box_xyxy=None) -> np.ndarray:
        coords = list(np.asarray(points_xy, np.float32))
        labels = [1] * len(coords)
        if box_xyxy is not None:
            b = np.asarray(box_xyxy, np.float32).reshape(4)
            coords += [b[:2], b[2:]]
            labels += [2, 3]
        return self._run(np.asarray(image_bgr)[..., ::-1], coords, labels)

    def predict_mask_labeled(self, image_rgb, points_xy, labels) -> np.ndarray:
        return self._run(np.asarray(image_rgb),
                         np.asarray(points_xy, np.float32),
                         np.asarray(labels))


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


class NativeRAFTFlow:
    """TPU-native RAFT optical flow (models/raft.py) with the FlowFn
    contract: (prev_rgb, next_rgb) uint8 -> [H, W, 2] float flow.

    Stands in for the reference's user-vendored FlowFormer
    (scripts/generate_traj.py:20-26) with a flow network the framework owns:
    official ``raft-things.pth``/``raft-sintel.pth`` checkpoints load
    through ``weights/convert.raft_state_dict_to_flax`` (torch used only to
    unpickle).  Frames are sintel-style replicate-padded to a multiple of 8
    (matching FlowFormerFlow's InputPadder), run through one jitted forward
    per shape, and unpadded."""

    def __init__(self, checkpoint: Optional[str] = None, params=None,
                 cfg=None, iters: int = 20):
        import jax

        from ..models import raft as raft_mod

        if params is None:
            import torch

            from ..weights.convert import raft_state_dict_to_flax

            state = torch.load(checkpoint, map_location="cpu",
                               weights_only=True)
            state = {k: v.numpy() for k, v in state.items()}
            cfg = raft_mod.RAFTConfig.from_state_dict(
                {k.removeprefix("module."): v for k, v in state.items()})
            params = raft_state_dict_to_flax(state)
        assert cfg is not None, "pass cfg with params"
        self.cfg = cfg
        self.model = raft_mod.RAFT(cfg)
        self.params = params
        self.iters = iters
        self._fwd = jax.jit(
            lambda p, i1, i2: raft_mod.raft_forward(
                self.model, p, i1, i2, iters=self.iters)[1])

    def __call__(self, prev_rgb: np.ndarray, next_rgb: np.ndarray) -> np.ndarray:
        from ..models.raft import pad_to_multiple

        p1, (top, left, h, w) = pad_to_multiple(np.asarray(prev_rgb))
        p2, _ = pad_to_multiple(np.asarray(next_rgb))
        x1 = p1.astype(np.float32)[None]
        x2 = p2.astype(np.float32)[None]
        flow = np.asarray(self._fwd(self.params, x1, x2), np.float32)
        return flow[0, top:top + h, left:left + w]


class NativeFlowFormerFlow:
    """TPU-native FlowFormer (models/flowformer.py) with the FlowFn
    contract: (prev_rgb, next_rgb) uint8 -> [H, W, 2] float flow.

    The fourth flow backend: the FlowFormer ARCHITECTURE itself
    (config/flowformer_config.py's percostformer3 fields), natively in
    flax.  Published torch checkpoints have no in-env source to convert
    from (the reference repo ships none; zero egress) — params come from
    ``flowformer_params_save``-format .npz (in-framework finetunes) or are
    passed directly; for original published weights keep using the
    ``FlowFormerFlow`` torch adapter above, exactly as the reference
    expects of its users."""

    def __init__(self, checkpoint: Optional[str] = None, params=None,
                 cfg=None, iters: int = 0):
        import jax

        from ..models import flowformer as ff_mod

        if cfg is None and checkpoint is not None:
            # self-describing archives carry their config (tiny finetunes
            # from the functional-check harness load without flags)
            cfg = ff_mod.flowformer_config_from_archive(checkpoint)
        cfg = cfg or ff_mod.FlowFormerConfig.sintel()
        if params is None:
            params = ff_mod.flowformer_params_load(checkpoint, cfg)
        self.cfg = cfg
        self.model = ff_mod.FlowFormer(cfg)
        self.params = params
        self.iters = iters or cfg.decoder_depth
        self._fwd = jax.jit(
            lambda p, i1, i2: ff_mod.flowformer_forward(
                self.model, p, i1, i2, iters=self.iters)[1])

    def __call__(self, prev_rgb: np.ndarray, next_rgb: np.ndarray) -> np.ndarray:
        from ..models.flowformer import pad_to_multiple

        p1, (top, left, h, w) = pad_to_multiple(np.asarray(prev_rgb))
        p2, _ = pad_to_multiple(np.asarray(next_rgb))
        x1 = p1.astype(np.float32)[None]
        x2 = p2.astype(np.float32)[None]
        flow = np.asarray(self._fwd(self.params, x1, x2), np.float32)
        return flow[0, top:top + h, left:left + w]


def farneback_flow(prev_rgb: np.ndarray, next_rgb: np.ndarray) -> np.ndarray:
    """Dense optical flow fallback (cv2 Farneback) — stands in for FlowFormer
    (reference scripts/generate_traj.py:23-26 vendors FlowFormer, which the
    user must supply; this keeps the trajectory/motion-stats tooling runnable
    out of the box)."""
    import cv2

    g1 = cv2.cvtColor(prev_rgb, cv2.COLOR_RGB2GRAY)
    g2 = cv2.cvtColor(next_rgb, cv2.COLOR_RGB2GRAY)
    return cv2.calcOpticalFlowFarneback(g1, g2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
