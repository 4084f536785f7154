"""Validation-in-training: render held-out instances through the real
inference pipeline every N steps (reference ``log_validation``,
train_code/train_svd.py:85-201 / train_csvd.py:93-219): builds a pipeline
from the *live* training params and writes PNG frames + gif per instance to
``<output>/validation_results/step_<N>/<instance>/``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import cv2


def render_validation(
    step: int,
    output_dir: str,
    pipeline,
    instances_dir: str,
    tokenize,
    mode: str = "vl",
    num_frames: int = 14,
    height: int = 256,
    width: int = 384,
    num_inference_steps: int = 25,
    motion_bucket_id: int = 200,
    max_instances: Optional[int] = None,
    seed: int = 42,
) -> list:
    import imageio
    import jax.random as jr

    from ..data.rasterize import load_condition

    out_root = os.path.join(output_dir, f"step_{step}")
    written = []
    names = sorted(
        d for d in os.listdir(instances_dir)
        if os.path.isdir(os.path.join(instances_dir, d))
    )[: max_instances or None]
    for name in names:
        inst = os.path.join(instances_dir, name)
        img_path = os.path.join(inst, "im_0.jpg")
        if not os.path.exists(img_path):
            continue
        img = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (width, height), interpolation=cv2.INTER_CUBIC)
        img = img.astype(np.float32) / 127.5 - 1.0

        prompt = ""
        lang = os.path.join(inst, "lang.txt")
        if os.path.exists(lang):
            # empty/odd lang.txt must not kill the training run at a
            # validation step (round-2 review)
            with open(lang) as f:
                prompt = f.readline().strip()
        call = dict(
            prompt_ids=tokenize(prompt), num_frames=num_frames,
            num_inference_steps=num_inference_steps,
            motion_bucket_id=motion_bucket_id, noise_aug_strength=0.1,
            decode_chunk_size=8, key=jr.PRNGKey(seed), output_type="uint8",
        )
        if mode == "vgl":
            if not os.path.exists(os.path.join(inst, "data.txt")):
                continue
            cond, _, _, _ = load_condition(inst, (height, width), num_frames)
            frames = pipeline(img[None], cond, **call)
        else:
            frames = pipeline(img[None], **call)

        out_dir = os.path.join(out_root, name)
        os.makedirs(out_dir, exist_ok=True)
        for i, fr in enumerate(frames[0]):
            cv2.imwrite(os.path.join(out_dir, f"{i}.png"),
                        cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
        imageio.mimsave(os.path.join(out_dir, "combined.gif"), list(frames[0]), fps=4)
        written.append(out_dir)
    return written
