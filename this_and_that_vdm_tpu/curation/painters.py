"""Mask / point / contour overlay painters for curation visualisation.

Covers the reference's vendored painters
(track_anything_code/tools/painter.py:106-160, tools/mask_painter.py:105-230,
SURVEY §2.7) and the SAM-visualisation scripts
(scripts/generate_sam.py, generate_sam_this_that.py, add_point2img.py):
alpha-blend a colored mask into the image, draw its contour, and paint
gesture/click points.  Pure numpy + cv2, CPU-side tooling.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import cv2
import numpy as np

# Detectron-style color list (fractions of 255), indexable by object id
# (reference tools/painter.py colormap()).
_COLORS = np.array([
    [0.000, 0.000, 0.000], [1.000, 1.000, 1.000], [1.000, 0.498, 0.313],
    [0.392, 0.581, 0.929], [0.000, 0.447, 0.741], [0.850, 0.325, 0.098],
    [0.929, 0.694, 0.125], [0.494, 0.184, 0.556], [0.466, 0.674, 0.188],
    [0.301, 0.745, 0.933], [0.635, 0.078, 0.184], [0.300, 0.300, 0.300],
    [0.600, 0.600, 0.600], [1.000, 0.000, 0.000], [1.000, 0.500, 0.000],
    [0.749, 0.749, 0.000], [0.000, 1.000, 0.000], [0.000, 0.000, 1.000],
    [0.667, 0.000, 1.000],
], np.float32)


def colormap(index: int) -> Tuple[int, int, int]:
    """RGB color for an object index."""
    c = _COLORS[index % len(_COLORS)]
    return tuple(int(round(v * 255)) for v in c)


def vis_add_mask(image_rgb: np.ndarray, mask: np.ndarray, color_index: int,
                 alpha: float) -> np.ndarray:
    """Alpha-blend ``color`` into ``image`` where ``mask`` is set
    (reference tools/painter.py:106-110)."""
    color = np.asarray(colormap(color_index), np.float32)
    img = image_rgb.astype(np.float32)
    m = mask.astype(bool)
    img[m] = img[m] * (1.0 - alpha) + color * alpha
    return img.clip(0, 255).astype(np.uint8)


def mask_contour(mask: np.ndarray, width: int = 3) -> np.ndarray:
    """Boolean contour band of a binary mask."""
    m = (mask.astype(np.uint8) * 255)
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    band = np.zeros_like(m)
    cv2.drawContours(band, contours, -1, 255, width)
    return band > 0


def mask_painter(image_rgb: np.ndarray, mask: np.ndarray, mask_color: int = 5,
                 mask_alpha: float = 0.7, contour_color: int = 1,
                 contour_width: int = 3) -> np.ndarray:
    """Paint a mask overlay plus its contour
    (reference tools/painter.py:137-160)."""
    out = vis_add_mask(image_rgb, mask, mask_color, mask_alpha)
    band = mask_contour(mask, contour_width)
    return vis_add_mask(out, band, contour_color, 1.0)


def point_painter(image_rgb: np.ndarray,
                  points_xy: Sequence[Tuple[float, float]],
                  point_color: int = 5, point_alpha: float = 0.9,
                  point_radius: int = 15) -> np.ndarray:
    """Paint click/gesture points as filled discs
    (reference tools/painter.py:112-134)."""
    h, w = image_rgb.shape[:2]
    disc = np.zeros((h, w), np.uint8)
    for x, y in points_xy:
        cv2.circle(disc, (int(x), int(y)), point_radius, 255, -1)
    return vis_add_mask(image_rgb, disc > 0, point_color, point_alpha)


def multi_mask_painter(image_rgb: np.ndarray, index_mask: np.ndarray,
                       mask_alpha: float = 0.7) -> np.ndarray:
    """Paint every object of an indexed mask in its own color
    (reference track_anything_module.py overlays tracked objects)."""
    out = image_rgb
    for label in np.unique(index_mask):
        if label == 0:
            continue
        out = mask_painter(out, index_mask == label,
                           mask_color=int(label) + 2, mask_alpha=mask_alpha)
    return out


def sam_visualization(image_rgb: np.ndarray, mask: np.ndarray,
                      points_xy: Optional[Sequence[Tuple[float, float]]] = None
                      ) -> np.ndarray:
    """SAM mask + prompt-point overlay (scripts/generate_sam*.py)."""
    out = mask_painter(image_rgb, mask)
    if points_xy:
        out = point_painter(out, points_xy, point_radius=8)
    return out


def make_colorwheel() -> np.ndarray:
    """Baker et al. (2007) optical-flow color wheel: 55 RGB entries over the
    RY/YG/GC/CB/BM/MR sectors (reference utils/optical_flow_utils.py:4-51)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    wheel = np.zeros((RY + YG + GC + CB + BM + MR, 3), np.float32)
    col = 0
    for n, (a, b, ramp_up) in (
        (RY, (0, 1, True)), (YG, (0, 1, False)), (GC, (1, 2, True)),
        (CB, (1, 2, False)), (BM, (2, 0, True)), (MR, (2, 0, False)),
    ):
        ramp = np.arange(n, dtype=np.float32) / n
        wheel[col : col + n, a] = 255 if ramp_up else 255 * (1 - ramp)
        wheel[col : col + n, b] = 255 * ramp if ramp_up else 255
        col += n
    return wheel


def flow_to_image(flow_uv: np.ndarray, clip_flow: Optional[float] = None,
                  convert_to_bgr: bool = False) -> np.ndarray:
    """[H, W, 2] flow -> uint8 color image: hue = direction on the wheel,
    saturation = magnitude normalised by the frame max (reference
    utils/optical_flow_utils.py:54-121)."""
    flow = np.clip(flow_uv, 0, clip_flow) if clip_flow is not None else flow_uv
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u * u + v * v)
    rad_max = max(rad.max(), 1e-5)
    u, v = u / rad_max, v / rad_max
    rad = np.sqrt(u * u + v * v)

    wheel = make_colorwheel()
    ncols = wheel.shape[0]
    a = np.arctan2(-v, -u) / np.pi          # [-1, 1]
    fk = (a + 1) / 2 * (ncols - 1)          # fractional wheel index
    k0 = np.floor(fk).astype(np.int32)
    k1 = (k0 + 1) % ncols
    f = fk - k0

    img = np.zeros(u.shape + (3,), np.uint8)
    for i in range(3):
        c = ((1 - f) * wheel[k0, i] + f * wheel[k1, i]) / 255.0
        small = rad <= 1
        c = np.where(small, 1 - rad * (1 - c), c * 0.75)  # saturate in-range,
        img[..., 2 - i if convert_to_bgr else i] = np.floor(255 * c)  # dim outliers
    return img
