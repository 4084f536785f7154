"""Flax params -> HF (diffusers-layout) safetensors export.

The inverse of convert.py: lets GestureNet/UNet weights finetuned in this
framework be published in the reference's checkpoint format (diffusers
``save_pretrained`` layout, reference train_svd.py:445-470 save hooks), so
reference users can load them unchanged.  Round-trip (torch -> flax -> torch)
is bit-exact (tests/test_export.py).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


_GEGLU_SCOPES = ("ff", "ff_in")


def _leaf_to_torch(path, leaf_name, arr, shapes_hint=None):
    """Returns (torch_key_suffix, tensor) for one flax leaf."""
    arr = np.asarray(arr)
    if leaf_name == "scale":
        return "weight", arr
    if leaf_name == "mix_factor":
        return "mix_factor", arr.reshape(1)
    if leaf_name == "bias":
        return "bias", arr
    if leaf_name == "kernel":
        if arr.ndim == 2:
            return "weight", arr.transpose(1, 0)
        if arr.ndim == 4:
            return "weight", arr.transpose(3, 2, 0, 1)
        if arr.ndim == 3:  # temporal (3,1,1) conv stored (3, I, O)
            return "weight", arr.transpose(2, 1, 0)[:, :, :, None, None]
    if leaf_name == "embedding":
        return "weight", arr
    raise ValueError(f"cannot export leaf {leaf_name} at {path} shape {arr.shape}")


def flax_to_torch_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Nested flax params -> flat diffusers-named state dict."""
    tree = params.get("params", params)
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + [k])
            else:
                key_parts = []
                for i, p in enumerate(path + [None]):
                    if p is None:
                        break
                    # fold name_N back into name.N for known list scopes
                    base, _, idx = p.rpartition("_")
                    if idx.isdigit() and base in (
                        "down_blocks", "up_blocks", "resnets", "attentions",
                        "transformer_blocks", "temporal_transformer_blocks",
                        "downsamplers", "upsamplers", "controlnet_down_blocks",
                        "layers",
                    ):
                        key_parts.extend([base, idx])
                    else:
                        key_parts.append(p)
                leaf_name, arr = _leaf_to_torch(path, k, v)
                # scope-specific renames (inverse of convert.py)
                if key_parts and key_parts[-1] == "to_out":
                    key_parts.extend(["0"])
                if len(key_parts) >= 2 and key_parts[-2] in _GEGLU_SCOPES:
                    if key_parts[-1] == "proj":
                        key_parts = key_parts[:-1] + ["net", "0", "proj"]
                    elif key_parts[-1] == "proj_out":
                        key_parts = key_parts[:-1] + ["net", "2"]
                elif key_parts and key_parts[-1] in _GEGLU_SCOPES:
                    pass
                # mlp_fcN -> mlp.fcN (CLIP)
                key_parts = [
                    p.replace("mlp_fc", "mlp.fc") if p.startswith("mlp_fc") else p
                    for p in key_parts
                ]
                out[".".join(key_parts + [leaf_name])] = arr

    walk(tree, [])
    return out


def save_hf_layout(params: Dict, out_dir: str, subfolder: str = "unet",
                   variant: str = "") -> str:
    """Write ``<out_dir>/<subfolder>/diffusion_pytorch_model[.variant].safetensors``.

    ``variant="fp16"`` reproduces the published checkpoints' half-precision
    file naming (reference test_code/inference.py loads variant="fp16") and
    stores tensors as fp16."""
    import safetensors.numpy as stnp

    d = os.path.join(out_dir, subfolder)
    os.makedirs(d, exist_ok=True)
    stem = ("diffusion_pytorch_model" + (f".{variant}" if variant else "")
            + ".safetensors")
    path = os.path.join(d, stem)
    state = flax_to_torch_state_dict(params)
    if variant == "fp16":
        state = {k: (v.astype(np.float16)
                     if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
                 for k, v in state.items()}
    stnp.save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, path)
    return path


def clip_flax_to_torch_state_dict(params: Dict, kind: str) -> Dict[str, np.ndarray]:
    """models/clip.py flax params -> transformers CLIP state-dict names
    (inverse of convert.clip_state_dict_to_flax).

    ``kind``: "text" (CLIPTextModel) or "vision" (CLIPVisionModelWithProjection).
    Embedding scopes fold back under ``<prefix>embeddings.``; the visual
    projection stays at the top level, as transformers lays it out."""
    assert kind in ("text", "vision"), kind
    prefix = "text_model." if kind == "text" else "vision_model."
    embed_scopes = ("token_embedding", "position_embedding",
                    "patch_embedding", "class_embedding")
    tree = params.get("params", params)
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + [k])
                continue
            arr = np.asarray(v)
            if k == "class_embedding" and not path:
                out[prefix + "embeddings.class_embedding"] = arr
                continue
            leaf_name, t = _leaf_to_torch(path, k, arr)
            parts = []
            for p in path:
                base, _, idx = p.rpartition("_")
                if idx.isdigit() and base == "layers":
                    parts.extend([base, idx])
                elif p.startswith("mlp_fc"):
                    parts.extend(["mlp", p[len("mlp_"):]])
                else:
                    parts.append(p)
            key = ".".join(parts + [leaf_name])
            if path and path[0] in embed_scopes:
                key = "embeddings." + key
            if path and path[0] in ("visual_projection", "text_projection"):
                out[key] = t  # top-level in transformers
            else:
                out[prefix + key] = t

    walk(tree, [])
    return out


def save_clip_hf_layout(params: Dict, out_dir: str, subfolder: str,
                        kind: str, variant: str = "") -> str:
    """Write ``<out_dir>/<subfolder>/model[.variant].safetensors`` in
    transformers naming (the image_encoder/text_encoder subfolders of the
    published weight repos, weights/loader.py docstring)."""
    import safetensors.numpy as stnp

    d = os.path.join(out_dir, subfolder)
    os.makedirs(d, exist_ok=True)
    stem = "model" + (f".{variant}" if variant else "") + ".safetensors"
    path = os.path.join(d, stem)
    state = clip_flax_to_torch_state_dict(params, kind)
    if variant == "fp16":
        state = {k: (v.astype(np.float16)
                     if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
                 for k, v in state.items()}
    stnp.save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, path)
    return path
