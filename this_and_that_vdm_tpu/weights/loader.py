"""Load HF-layout pretrained weight folders into flax params.

Mirrors the reference's weight contract (test_code/inference.py:296-381):
a root directory with diffusers/transformers subfolders::

    <root>/unet/diffusion_pytorch_model.safetensors        (This&That VL UNet)
    <root>/gesturenet/diffusion_pytorch_model.safetensors  (GestureNet)
    <root>/vae/…                                           (SVD temporal VAE)
    <root>/image_encoder/model.safetensors                 (CLIP ViT-H)
    <root>/text_encoder/model.safetensors                  (SD2.1 CLIP text)

Published checkpoints: HF ``HikariDawn/This-and-That-1.{0,1}`` (+ the SVD
base repo for the frozen parts). This module is offline: point it at a local
download.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from .convert import (
    clip_state_dict_to_flax,
    load_safetensors,
    torch_state_dict_to_flax,
)


def _load_dir(path: str) -> dict:
    # recursive=True: without it '**' degrades to '*' and shards nested
    # more than one level deep are silently missed (round-2 review)
    files = sorted(set(
        glob.glob(os.path.join(path, "*.safetensors"))
        + glob.glob(os.path.join(path, "**", "*.safetensors"), recursive=True)
    ))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    state = {}
    for f in files:
        state.update(load_safetensors(f))
    # fp16 is a storage format (published repos ship variant="fp16") — params
    # are fp32 in this framework; modules cast to their compute dtype (bf16)
    # at apply time.  Without the upcast, fp16 params + bf16 compute promote
    # to fp32 mid-graph and change the serving numerics/dtype layout.
    return {k: (v.astype(np.float32) if v.dtype == np.float16 else v)
            for k, v in state.items()}


def load_unet_params(root: str, subfolder: str = "unet"):
    return torch_state_dict_to_flax(_load_dir(os.path.join(root, subfolder)))


def load_gesturenet_params(root: str, subfolder: str = "gesturenet"):
    return torch_state_dict_to_flax(_load_dir(os.path.join(root, subfolder)))


def load_vae_params(root: str, subfolder: str = "vae"):
    return torch_state_dict_to_flax(_load_dir(os.path.join(root, subfolder)))


def load_clip_params(root: str, subfolder: str):
    return clip_state_dict_to_flax(_load_dir(os.path.join(root, subfolder)))


def load_pretrained(root: str, unet, controlnet, modules, mode: str = "vl"):
    """Returns (frozen_params_dict, unet_params, controlnet_params_or_None)."""
    frozen = dict(
        vae=load_vae_params(root),
        image_encoder=load_clip_params(root, "image_encoder"),
        text_encoder=load_clip_params(root, "text_encoder"),
    )
    unet_params = load_unet_params(root)
    cn_params = None
    if mode == "vgl" and controlnet is not None:
        cn_params = load_gesturenet_params(root)
    return frozen, unet_params, cn_params
