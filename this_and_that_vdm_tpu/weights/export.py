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


def save_hf_layout(params: Dict, out_dir: str, subfolder: str = "unet") -> str:
    """Write ``<out_dir>/<subfolder>/diffusion_pytorch_model.safetensors``."""
    import safetensors.numpy as stnp

    d = os.path.join(out_dir, subfolder)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "diffusion_pytorch_model.safetensors")
    state = flax_to_torch_state_dict(params)
    stnp.save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, path)
    return path
