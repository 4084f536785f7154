"""Video/result export + eval utilities.

Covers the reference's ``scripts/`` export/eval toolbox (SURVEY.md §2.6):
``combine_results.py`` (side-by-side gif grids for human eval),
``train_test_split.py``, ``interpolate_by_repeat.py``, ``crop/resize``
helpers, gif/mp4 export — plus PSNR/SSIM metrics (the reference lists lpips/
pyiqa in requirements with no driver; PSNR/SSIM are what BASELINE.json's
acceptance uses).
"""

from __future__ import annotations

import os
import random
import shutil
from typing import List, Sequence

import cv2
import numpy as np


def export_gif(frames_uint8: Sequence[np.ndarray], path: str, fps: int = 4) -> str:
    import imageio

    imageio.mimsave(path, list(frames_uint8), fps=fps)
    return path


def export_mp4(frames_uint8: Sequence[np.ndarray], path: str, fps: int = 4) -> str:
    """Write an mp4 via imageio; falls back to cv2's bundled encoder and then
    to GIF when no ffmpeg/pyav imageio backend is installed (the sandbox
    ships neither — 'stub or gate' rule)."""
    frames = [np.asarray(f) for f in frames_uint8]
    try:
        import imageio

        imageio.mimsave(path, frames, fps=fps)
        return path
    except Exception:
        if os.path.exists(path):  # don't leave a partial file behind
            os.remove(path)
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if writer.isOpened():
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
        # cv2 can report "opened" yet encode nothing (per-frame write failures
        # are silent) — only trust a non-trivial output file.
        if os.path.exists(path) and os.path.getsize(path) > 256:
            return path
        if os.path.exists(path):
            os.remove(path)
    else:
        writer.release()
    try:
        gif = os.path.splitext(path)[0] + ".gif"
        export_gif(frames, gif, fps=fps)
        return gif
    except Exception:
        # last resort: a directory of numbered PNGs (cv2 is always present)
        frame_dir = os.path.splitext(path)[0] + "_frames"
        os.makedirs(frame_dir, exist_ok=True)
        for i, f in enumerate(frames):
            cv2.imwrite(os.path.join(frame_dir, f"{i}.png"),
                        cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        return frame_dir


def load_frames_dir(path: str, ext: str = ".png") -> List[np.ndarray]:
    """Read ``0.png .. N.png`` (an inference output folder) as RGB."""
    out = []
    i = 0
    while os.path.exists(os.path.join(path, f"{i}{ext}")):
        out.append(cv2.cvtColor(cv2.imread(os.path.join(path, f"{i}{ext}")),
                                cv2.COLOR_BGR2RGB))
        i += 1
    return out


def combine_results_grid(result_dirs: Sequence[str], out_path: str,
                         labels: Sequence[str] = None, fps: int = 4) -> str:
    """Side-by-side gif of several methods' outputs on the same instance
    (reference scripts/combine_results.py:16-27 human-eval grids)."""
    seqs = [load_frames_dir(d) for d in result_dirs]
    n = min(len(s) for s in seqs)
    h = min(s[0].shape[0] for s in seqs)
    rows = []
    for t in range(n):
        row = []
        for si, s in enumerate(seqs):
            fr = s[t]
            if fr.shape[0] != h:
                fr = cv2.resize(fr, (int(fr.shape[1] * h / fr.shape[0]), h))
            if labels:
                fr = fr.copy()
                cv2.putText(fr, labels[si], (4, 16), cv2.FONT_HERSHEY_SIMPLEX,
                            0.5, (255, 255, 0), 1)
            row.append(fr)
        rows.append(np.concatenate(row, axis=1))
    return export_gif(rows, out_path, fps)


def interpolate_by_repeat(frames: Sequence[np.ndarray], factor: int = 2):
    """Frame-repeat temporal upsampling (scripts/interpolate_by_repeat.py)."""
    out = []
    for f in frames:
        out.extend([f] * factor)
    return out


def repeat_to_length(frames: Sequence[np.ndarray], target: int):
    """Repeat frames to exactly ``target`` outputs, distributing the
    remainder alternately front/back (reference
    scripts/interpolate_by_repeat.py:30-41 gap algorithm; the reference
    drops one remainder slot — "-1 for adaptation" — and so emits target-1
    frames, an off-by-one we do not reproduce)."""
    n = len(frames)
    assert 1 <= n <= target
    gaps = [target // n] * n
    remain = target % n
    for idx in range(remain):
        if idx % 2 == 0:
            gaps[idx // 2] += 1
        else:
            gaps[-(1 + idx // 2)] += 1
    out = []
    for f, g in zip(frames, gaps):
        out.extend([f] * g)
    return out


def train_test_split(instance_root: str, test_fraction: float = 0.1,
                     seed: int = 42):
    """Split flat instance folders into (train_paths, test_paths)."""
    names = sorted(
        d for d in os.listdir(instance_root)
        if os.path.isdir(os.path.join(instance_root, d))
    )
    rng = random.Random(seed)
    rng.shuffle(names)
    k = int(len(names) * test_fraction)
    test = sorted(names[:k])
    train = sorted(names[k:])
    return ([os.path.join(instance_root, n) for n in train],
            [os.path.join(instance_root, n) for n in test])


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Single-scale SSIM (11x11 gaussian window, standard constants)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if a.ndim == 3:
        return float(np.mean([ssim(a[..., c], b[..., c], data_range)
                              for c in range(a.shape[-1])]))
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    win = kernel @ kernel.T
    mu_a = cv2.filter2D(a, -1, win)[5:-5, 5:-5]
    mu_b = cv2.filter2D(b, -1, win)[5:-5, 5:-5]
    s_aa = cv2.filter2D(a * a, -1, win)[5:-5, 5:-5] - mu_a**2
    s_bb = cv2.filter2D(b * b, -1, win)[5:-5, 5:-5] - mu_b**2
    s_ab = cv2.filter2D(a * b, -1, win)[5:-5, 5:-5] - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * s_ab + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (s_aa + s_bb + c2)
    return float(np.mean(num / den))


def per_frame_metrics(frames_a, frames_b, data_range: float = 255.0) -> dict:
    """PSNR/SSIM per frame + means (the BASELINE acceptance: PSNR >= 35)."""
    ps = [psnr(a, b, data_range) for a, b in zip(frames_a, frames_b)]
    ss = [ssim(a, b, data_range) for a, b in zip(frames_a, frames_b)]
    return {"psnr": ps, "ssim": ss,
            "psnr_mean": float(np.mean(ps)), "ssim_mean": float(np.mean(ss))}
