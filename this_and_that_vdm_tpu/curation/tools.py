"""Misc curation/eval utilities (reference scripts/ + curation_pipeline/).

* ``match_instance`` — locate a flat instance back in a raw tree by exact-MSE
  image comparison with multi-frame confirmation (match_dataset_v{1,2}.py).
* ``visualize_points`` — draw gesture points on a frame
  (visualize_thisthat_point.py / add_point2img.py).
* ``collect_lang`` / ``ingest_llama_decomposition`` — gather prompts and
  write ``processed_text.txt`` (action/this/that) for ambiguous-prompt
  training (scripts/collect_lang.py, process_llama.py, add_lang_info.py).
* ``length_stats`` / ``clean_dataset`` — dataset hygiene
  (length_stats.py, clean_bridge_dataset.py, check_video.py).
* ``active_learning_select`` — copy curation-failure samples for relabeling
  (active_learning_select.py).
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np


def _mse(a: np.ndarray, b: np.ndarray) -> float:
    if a.shape != b.shape:
        return float("inf")
    return float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))


def match_instance(
    instance_dir: str, candidate_dirs: Sequence[str], confirm_frames: int = 10
) -> Optional[str]:
    """Find the raw trajectory whose frames exactly match a flat instance."""
    probe = cv2.imread(os.path.join(instance_dir, "im_0.jpg"))
    for cand in candidate_dirs:
        c0 = os.path.join(cand, "im_0.jpg")
        if not os.path.exists(c0):
            continue
        if _mse(probe, cv2.imread(c0)) != 0.0:
            continue
        ok = True
        for i in range(1, confirm_frames):
            a = os.path.join(instance_dir, f"im_{i}.jpg")
            b = os.path.join(cand, f"im_{i}.jpg")
            if not (os.path.exists(a) and os.path.exists(b)):
                break
            if _mse(cv2.imread(a), cv2.imread(b)) != 0.0:
                ok = False
                break
        if ok:
            return cand
    return None


def visualize_points(image_rgb: np.ndarray, points_xy: Sequence[Tuple[float, float]],
                     radius: int = 8) -> np.ndarray:
    colors = [(255, 0, 0), (0, 255, 0)]
    out = image_rgb.copy()
    for i, (x, y) in enumerate(points_xy):
        cv2.circle(out, (int(x), int(y)), radius, colors[min(i, 1)], -1)
    return out


def collect_lang(instance_root: str) -> Dict[str, str]:
    out = {}
    for name in sorted(os.listdir(instance_root)):
        p = os.path.join(instance_root, name, "lang.txt")
        if os.path.exists(p):
            out[name] = open(p).readlines()[0].strip()
    return out


def ingest_llama_decomposition(instance_dir: str, action: str, this: str,
                               there: str) -> str:
    """Write processed_text.txt (the mix_ambiguous source)."""
    path = os.path.join(instance_dir, "processed_text.txt")
    with open(path, "w") as f:
        f.write(f"{action}\n{this}\n{there}\n")
    return path


def length_stats(instance_root: str) -> Dict[str, float]:
    lengths = []
    for name in sorted(os.listdir(instance_root)):
        d = os.path.join(instance_root, name)
        if os.path.isdir(d):
            lengths.append(sum(1 for f in os.listdir(d) if f.startswith("im_")))
    arr = np.asarray(lengths, np.float64)
    return {"count": len(arr), "mean": float(arr.mean()) if len(arr) else 0.0,
            "min": float(arr.min()) if len(arr) else 0.0,
            "max": float(arr.max()) if len(arr) else 0.0}


def clean_dataset(instance_root: str, min_frames: int = 14,
                  require: Sequence[str] = ("lang.txt",)) -> List[str]:
    """Remove invalid instances; returns removed paths."""
    removed = []
    for name in sorted(os.listdir(instance_root)):
        d = os.path.join(instance_root, name)
        if not os.path.isdir(d):
            continue
        files = set(os.listdir(d))
        n = sum(1 for f in files if f.startswith("im_"))
        bad = n < min_frames or any(r not in files for r in require) or any(
            f"im_{i}.jpg" not in files for i in range(n)
        )
        if bad:
            shutil.rmtree(d)
            removed.append(d)
    return removed


def active_learning_select(failure_dir: str, dest_dir: str,
                           max_samples: int = 100) -> int:
    """Copy curation-failure frames for human relabeling."""
    os.makedirs(dest_dir, exist_ok=True)
    names = sorted(os.listdir(failure_dir))[:max_samples]
    for n in names:
        shutil.copyfile(os.path.join(failure_dir, n), os.path.join(dest_dir, n))
    return len(names)
