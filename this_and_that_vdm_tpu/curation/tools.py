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
* ``process_sim_dataset`` — flatten an IsaacGym pick-place export into
  training instances (scripts/process_sim.py).
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


def resize_video_seq(input_dir: str, store_dir: str,
                     target_hw: Tuple[int, int] = (256, 384)) -> int:
    """Resize every frame image of every video folder
    (reference scripts/resize_video_seq.py, resize_img.py).  Returns the
    number of images written."""
    os.makedirs(store_dir, exist_ok=True)
    n = 0
    for video in sorted(os.listdir(input_dir)):
        src = os.path.join(input_dir, video)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(store_dir, video)
        os.makedirs(dst, exist_ok=True)
        for name in sorted(os.listdir(src)):
            if not name.endswith((".jpg", ".png")):
                continue
            img = cv2.imread(os.path.join(src, name))
            img = cv2.resize(img, (target_hw[1], target_hw[0]),
                             interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(os.path.join(dst, name), img)
            n += 1
    return n


def truncate_video_frames(folder: str, needed_frames: int = 14,
                          ext: str = ".png") -> int:
    """Delete frames with index >= needed_frames in every video subfolder
    (reference scripts/crop_video_frames.py).  Returns frames removed."""
    removed = 0
    for video in sorted(os.listdir(folder)):
        sub = os.path.join(folder, video)
        if not os.path.isdir(sub):
            continue
        for idx in range(len(os.listdir(sub))):
            if idx >= needed_frames:
                p = os.path.join(sub, f"{idx}{ext}")
                if os.path.exists(p):
                    os.remove(p)
                    removed += 1
    return removed


def extract_test_paths(match_info_txt: str, store_txt: str,
                       strip_prefix: str = "") -> int:
    """Second column of a match-info file -> relative test-instance paths
    (reference scripts/extract_test_dataset.py)."""
    n = 0
    with open(match_info_txt) as rf, open(store_txt, "w") as wf:
        for line in rf:
            parts = line.split(" ")
            if len(parts) < 2:
                continue
            p = parts[1]
            if strip_prefix and p.startswith(strip_prefix):
                p = p[len(strip_prefix):]
            wf.write(p if p.endswith("\n") else p + "\n")
            n += 1
    return n


def generate_noise_images(store_dir: str, count: int = 4,
                          hw: Tuple[int, int] = (256, 256),
                          seed: int = 0) -> List[str]:
    """Uniform-noise control images for ablations
    (reference scripts/generate_noise.py)."""
    os.makedirs(store_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for idx in range(count):
        noise = (rng.random((hw[0], hw[1], 3)) * 255).astype(np.uint8)
        p = os.path.join(store_dir, f"noise{idx}.png")
        cv2.imwrite(p, noise)
        paths.append(p)
    return paths


def check_videos(video_dir: str, delete_abnormal: bool = False) -> List[str]:
    """Find (optionally delete) unreadable video files
    (reference scripts/check_video.py; cv2 replaces moviepy)."""
    bad = []
    for name in sorted(os.listdir(video_dir)):
        path = os.path.join(video_dir, name)
        cap = cv2.VideoCapture(path)
        ok, _ = cap.read()
        cap.release()
        if not ok:
            bad.append(path)
            if delete_abnormal:
                os.remove(path)
    return bad


def active_learning_select(failure_dir: str, dest_dir: str,
                           max_samples: int = 100) -> int:
    """Copy curation-failure frames for human relabeling."""
    os.makedirs(dest_dir, exist_ok=True)
    names = sorted(os.listdir(failure_dir))[:max_samples]
    for n in names:
        shutil.copyfile(os.path.join(failure_dir, n), os.path.join(dest_dir, n))
    return len(names)


def process_sim_dataset(
    sim_root: str,
    store_root: str,
    prompts_per_scene: int = 10,
    most_descriptive_prompt_idx: int = 6,
) -> int:
    """Flatten an IsaacGym pick-place export into training instances.

    Reference scripts/process_sim.py:22-58: the simulator writes groups of
    ``prompts_per_scene`` sibling ``run_<N>`` folders that share one scene but
    carry different prompt phrasings in ``lang.txt``.  Scene ``idx`` copies
    every non-lang file from ``run_<prompts_per_scene*idx>`` into
    ``store_root/<idx>/`` and writes a combined ``lang.txt`` with the most
    descriptive phrasing first, then the remaining variants in run order.
    Returns the number of scenes exported.

    Two reference quirks replicated deliberately: the scene count derives
    from ``len(os.listdir)//prompts_per_scene`` (:19), so missing run dirs
    or stray files shrink the range; and prompts are compacted over missing
    ``lang.txt`` files (:33-39), so ``most_descriptive_prompt_idx`` indexes
    the compacted list, not the run number.  We additionally skip a scene
    (instead of crashing) when fewer prompts than the index survive.
    """
    os.makedirs(store_root, exist_ok=True)
    n_scenes = len(os.listdir(sim_root)) // prompts_per_scene
    exported = 0
    for idx in range(n_scenes):
        base = os.path.join(sim_root, f"run_{prompts_per_scene * idx}")
        if not os.path.isdir(base):
            continue
        prompts = []
        for j in range(prompts_per_scene):
            lang = os.path.join(sim_root, f"run_{prompts_per_scene * idx + j}", "lang.txt")
            if os.path.exists(lang):
                with open(lang) as f:
                    prompts.append(f.readline().rstrip("\n"))
        if len(prompts) <= most_descriptive_prompt_idx:
            continue
        dest = os.path.join(store_root, str(idx))
        os.makedirs(dest, exist_ok=True)
        for name in os.listdir(base):
            if name == "lang.txt":
                continue
            shutil.copyfile(os.path.join(base, name), os.path.join(dest, name))
        ordered = [prompts[most_descriptive_prompt_idx]] + [
            p for j, p in enumerate(prompts) if j != most_descriptive_prompt_idx
        ]
        with open(os.path.join(dest, "lang.txt"), "w") as f:
            f.write("\n".join(ordered) + "\n")
        exported += 1
    return exported
