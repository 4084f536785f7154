"""HF (diffusers/transformers) checkpoint -> JAX pytree converters.

The flax modules in ``models/`` name their submodules so that the HF
state-dict key of every tensor maps mechanically onto the flax param path:

    torch ``down_blocks.0.resnets.1.spatial_res_block.conv1.weight``
    ->  flax ``down_blocks_0 / resnets_1 / spatial_res_block / conv1 / kernel``

Transforms by tensor rank:
  * rank-1 ``weight``  -> norm ``scale`` (GroupNorm/LayerNorm)
  * rank-2 ``weight``  -> linear ``kernel``  (transpose (1,0))
  * rank-4 ``weight``  -> conv2d ``kernel``  (transpose (2,3,1,0) OIHW->HWIO)
  * rank-5 ``weight``  -> temporal (3,1,1) conv -> ``kernel`` shape (3,I,O)
                          (1,1,1) conv (temporal shortcut) -> dense (I,O)
  * ``bias``           -> ``bias`` unchanged

Special names: ``to_out.0`` -> ``to_out`` (diffusers wraps out-proj in a
ModuleList with dropout); ``ff.net.0.proj`` -> ``ff/proj``; ``ff.net.2`` ->
``ff/proj_out``; list indices fold into the parent name (``resnets.1`` ->
``resnets_1``).

The published weight repos this consumes (reference: test_code/inference.py
:296-381): ``HikariDawn/This-and-That-1.{0,1}`` subfolders ``unet/`` and
``gesturenet/``, plus the frozen SVD ``vae/``, ``image_encoder/`` and
SD2.1 ``text_encoder/``.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def _is_int(s: str) -> bool:
    return bool(re.fullmatch(r"\d+", s))


def torch_key_to_flax_path(key: str) -> tuple:
    """Map a diffusers state-dict key to the flax param path (sans leaf)."""
    parts = key.split(".")
    leaf = parts[-1]
    parts = parts[:-1]

    # ff.net.0.proj -> ff/proj ; ff.net.2 -> ff/proj_out ; to_out.0 -> to_out
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "net" and i + 1 < len(parts) and _is_int(parts[i + 1]):
            idx = parts[i + 1]
            if idx == "0":
                # GEGLU wrapper: "net.0.proj" -> keep the "ff"/"ff_in"
                # prefix already emitted and append "proj"
                i += 2
                if i < len(parts) and parts[i] == "proj":
                    out.append("proj")
                    i += 1
                continue
            elif idx == "2":
                out.append("proj_out")
                i += 2
                continue
            else:  # net.1 = dropout, no params
                i += 2
                continue
        if p == "to_out" and i + 1 < len(parts) and parts[i + 1] == "0":
            out.append("to_out")
            i += 2
            continue
        if _is_int(p) and out:
            out[-1] = f"{out[-1]}_{p}"
            i += 1
            continue
        out.append(p)
        i += 1
    return tuple(out), leaf


def convert_tensor(leaf: str, arr: np.ndarray):
    """Returns (flax_leaf_name, converted_array)."""
    if leaf == "bias":
        return "bias", arr
    if leaf == "mix_factor":
        return "mix_factor", arr.reshape(1)
    if leaf != "weight":
        return leaf, arr
    if arr.ndim == 1:
        return "scale", arr
    if arr.ndim == 2:
        return "kernel", arr.transpose(1, 0)
    if arr.ndim == 4:
        return "kernel", arr.transpose(2, 3, 1, 0)
    if arr.ndim == 5:
        o, i_, kt, kh, kw = arr.shape
        assert (kh, kw) == (1, 1), f"unexpected 5D conv kernel {arr.shape}"
        if kt == 1:  # temporal 1x1x1 shortcut -> dense
            return "kernel", arr.reshape(o, i_).transpose(1, 0)
        return "kernel", arr.reshape(o, i_, kt).transpose(2, 1, 0)
    raise ValueError(f"cannot convert {leaf} with shape {arr.shape}")


def torch_state_dict_to_flax(state: Mapping[str, "np.ndarray"]) -> Dict:
    """Convert a flat torch state dict (numpy-valued) to nested flax params."""
    params: Dict = {}
    for key, value in state.items():
        arr = np.asarray(value)
        path, leaf = torch_key_to_flax_path(key)
        leaf_name, conv = convert_tensor(leaf, arr)
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = conv
    return {"params": params}


def clip_state_dict_to_flax(state: Mapping[str, "np.ndarray"]) -> Dict:
    """Convert a transformers CLIP state dict (text or vision-with-projection)
    to the flax params of models/clip.py.

    Differences from the diffusers mapping: ``text_model.``/``vision_model.``
    and ``embeddings.`` scopes are flattened away, token/position embedding
    matrices keep their orientation (leaf ``embedding``), ``mlp.fc1`` ->
    ``mlp_fc1``, and the bare ``class_embedding`` parameter passes through.
    """
    params: Dict = {}
    for key, value in state.items():
        if key.endswith("position_ids"):
            continue
        arr = np.asarray(value)
        k = key
        for prefix in ("text_model.", "vision_model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        k = k.replace("embeddings.", "").replace("mlp.fc", "mlp_fc")
        parts = k.split(".")
        leaf = parts[-1]
        path = []
        for p in parts[:-1]:
            if _is_int(p) and path:
                path[-1] = f"{path[-1]}_{p}"
            else:
                path.append(p)
        if leaf == "weight" and (
            path and path[-1] in ("token_embedding", "position_embedding")
        ):
            leaf_name, conv = "embedding", arr
        elif leaf == "class_embedding":
            leaf_name, conv = "class_embedding", arr
        else:
            leaf_name, conv = convert_tensor(leaf, arr)
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = conv
    return {"params": params}


def xmem_state_dict_to_flax(state: Mapping[str, "np.ndarray"]) -> Dict:
    """Convert an XMem checkpoint (``XMem-s012.pth`` layout, reference
    track_anything_code/tracker/model/network.py:134-198) to the flax params
    of models/xmem.py.

    Extra rules on top of the generic mapping: eval-mode BatchNorm buffers
    ``running_mean``/``running_var`` -> ``mean``/``var`` (``num_batches_tracked``
    dropped), CBAM's ``SpatialGate.spatial.conv`` collapses to
    ``spatial_conv``, and a single-object ``value_encoder.conv1`` (4 input
    channels) is zero-padded to the multi-object 5-channel layout
    (network.py:184-198 ``init_as_zero_if_needed``)."""
    params: Dict = {}
    for key, value in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(value)
        if key == "value_encoder.conv1.weight" and arr.shape[1] == 4:
            arr = np.concatenate(
                [arr, np.zeros((arr.shape[0], 1) + arr.shape[2:], arr.dtype)], 1)
        k = key.replace("spatial.conv", "spatial_conv")
        path, leaf = torch_key_to_flax_path(k)
        if leaf == "running_mean":
            leaf_name, conv = "mean", arr
        elif leaf == "running_var":
            leaf_name, conv = "var", arr
        else:
            leaf_name, conv = convert_tensor(leaf, arr)
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = conv
    return {"params": params}


def sam_state_dict_to_flax(state: Mapping[str, "np.ndarray"]) -> Dict:
    """Convert an official Segment Anything checkpoint (``sam_vit_h_4b8939
    .pth`` et al. — the plain ``Sam.state_dict()`` layout of
    facebookresearch/segment-anything, which the reference loads at
    curation_pipeline/select_frame_with_this_that.py:387-390) to the flax
    params of models/sam.py.

    Mapping rules on top of the generic tensor transforms:
      * ``patch_embed.proj`` collapses to ``patch_embed`` (the flax conv);
      * ``pe_layer.positional_encoding_gaussian_matrix`` -> ``pe_layer/
        gaussian`` (buffer held as a param, no transform);
      * ``point_embeddings.{0..3}.weight`` (1, C) -> flat (C,) leaves
        ``point_embed_neg/point_embed_pos/box_embed_1/box_embed_2``;
        ``not_a_point_embed``/``no_mask_embed`` likewise;
      * ``mask_downscaling.{0,1,3,4,6}`` -> ``mask_conv1/mask_ln1/mask_conv2/
        mask_ln2/mask_conv3``; ``neck.{0..3}`` -> ``neck_conv1/neck_ln1/
        neck_conv2/neck_ln2``; ``output_upscaling.{0,1,3}`` ->
        ``upscale_conv1/upscale_ln/upscale_conv2``;
      * transposed-conv weights (Cin, Cout, 2, 2) -> the einsum kernel
        (2, 2, Cin, Cout) of ``models/sam.Deconv2x``;
      * ``iou_token``/``mask_tokens`` embedding matrices keep their shape;
        ``rel_pos_h``/``rel_pos_w`` tables pass through;
      * ``output_hypernetworks_mlps`` -> ``hyper_mlps``,
        ``iou_prediction_head`` -> ``iou_head``.
    """
    point_names = {"0": "point_embed_neg", "1": "point_embed_pos",
                   "2": "box_embed_1", "3": "box_embed_2"}
    seq_renames = {
        ("image_encoder", "neck"): {"0": "neck_conv1", "1": "neck_ln1",
                                    "2": "neck_conv2", "3": "neck_ln2"},
        ("prompt_encoder", "mask_downscaling"): {
            "0": "mask_conv1", "1": "mask_ln1", "3": "mask_conv2",
            "4": "mask_ln2", "6": "mask_conv3"},
        ("mask_decoder", "output_upscaling"): {
            "0": "upscale_conv1", "1": "upscale_ln", "3": "upscale_conv2"},
    }
    params: Dict = {}

    def put(path, leaf, arr):
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = arr

    for key, value in state.items():
        if key in ("pixel_mean", "pixel_std"):
            continue  # non-persistent normalisation buffers (host-side here)
        arr = np.asarray(value)
        k = key.replace("patch_embed.proj", "patch_embed")
        k = k.replace("pe_layer.positional_encoding_gaussian_matrix",
                      "pe_layer.gaussian")
        k = k.replace("output_hypernetworks_mlps", "hyper_mlps")
        k = k.replace("iou_prediction_head", "iou_head")
        parts = k.split(".")

        if parts[-1] == "gaussian":
            put(tuple(parts[:-1]), "gaussian", arr)
            continue
        if len(parts) >= 3 and parts[1] == "point_embeddings":
            put((parts[0],), point_names[parts[2]], arr.reshape(-1))
            continue
        if len(parts) >= 2 and parts[1] in ("not_a_point_embed", "no_mask_embed"):
            put((parts[0],), parts[1].replace("_embed", ""), arr.reshape(-1))
            continue
        if len(parts) >= 2 and parts[1] in ("iou_token", "mask_tokens"):
            put((parts[0],), parts[1], arr)
            continue
        if parts[-1] in ("rel_pos_h", "rel_pos_w"):
            path, leaf = torch_key_to_flax_path(k)  # leaf = rel_pos_{h,w}
            put(path, leaf, arr)
            continue

        rename = seq_renames.get(tuple(parts[:2]))
        if rename is not None:
            name = rename[parts[2]]
            leaf = parts[3]
            if leaf == "weight" and name.startswith("upscale_conv"):
                # ConvTranspose2d (Cin, Cout, 2, 2) -> (2, 2, Cin, Cout)
                put((parts[0], name), "kernel", arr.transpose(2, 3, 0, 1))
                continue
            leaf_name, conv = convert_tensor(leaf, arr)
            put((parts[0], name), leaf_name, conv)
            continue

        path, leaf = torch_key_to_flax_path(k)
        if leaf == "pos_embed":
            put(path, "pos_embed", arr)
            continue
        leaf_name, conv = convert_tensor(leaf, arr)
        put(path, leaf_name, conv)
    return {"params": params}


def load_ultralytics_state_dict(path: str) -> Dict[str, "np.ndarray"]:
    """Flat numpy state dict from an ultralytics ``.pt`` checkpoint WITHOUT
    the ultralytics package installed.

    Ultralytics pickles the whole ``DetectionModel`` nn.Module (not a plain
    state dict), so normal ``torch.load`` needs its class definitions.  We
    unpickle with shell classes instead: every ``ultralytics.*`` class
    resolves to an empty stand-in whose ``__setstate__`` just stores the
    instance ``__dict__``; tensors are restored by torch's own persistent
    loader.  The module tree is then walked through ``_parameters`` /
    ``_buffers`` / ``_modules`` to rebuild the dotted state-dict names
    (fp16 leaves are upcast to fp32, the serving precision of the eval-mode
    detector)."""
    import pickle
    import types

    import torch

    class _Shell:
        def __init__(self, *args, **kwargs):
            pass

        def __setstate__(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)
            elif isinstance(state, tuple):
                for part in state:
                    if isinstance(part, dict):
                        self.__dict__.update(part)

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.split(".")[0] == "ultralytics":
                return type(name, (_Shell,), {})
            return super().find_class(module, name)

    shim = types.ModuleType("ultralytics_shim")
    shim.Unpickler = _Unpickler
    shim.load = lambda f, **kw: _Unpickler(f, **kw).load()
    ckpt = torch.load(path, map_location="cpu", pickle_module=shim,
                      weights_only=False)
    model = ckpt.get("ema") or ckpt["model"]  # attempt_load_one_weight rule

    out: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        d = getattr(node, "__dict__", {})
        for k, v in (d.get("_parameters") or {}).items():
            if v is not None:
                out[prefix + k] = v.detach().float().numpy()
        for k, v in (d.get("_buffers") or {}).items():
            if v is not None:
                out[prefix + k] = v.float().numpy()
        for k, v in (d.get("_modules") or {}).items():
            if v is not None:
                walk(v, f"{prefix}{k}.")

    walk(model, "")
    return out


def yolo_state_dict_to_flax(state: Mapping[str, "np.ndarray"]) -> Dict:
    """Convert a YOLOv8 state dict (ultralytics ``DetectionModel`` layout,
    e.g. from ``load_ultralytics_state_dict``) to the flax params of
    models/yolov8.py.

    Generic mapping (ints fold into the parent name, so
    ``model.22.cv2.0.0.conv.weight`` -> ``model_22/cv2_0_0/conv/kernel``)
    plus: eval-mode BN buffers ``running_mean/var`` -> ``mean/var``;
    ``num_batches_tracked`` and the fixed-arange ``dfl.conv`` weight are
    dropped (the DFL expectation is computed in closed form)."""
    params: Dict = {}
    for key, value in state.items():
        if key.endswith("num_batches_tracked") or ".dfl." in key:
            continue
        arr = np.asarray(value)
        path, leaf = torch_key_to_flax_path(key)
        if leaf == "running_mean":
            leaf_name, conv = "mean", arr
        elif leaf == "running_var":
            leaf_name, conv = "var", arr
        else:
            leaf_name, conv = convert_tensor(leaf, arr)
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = conv
    return {"params": params}


def controlnet_params_from_unet(unet_params: Dict, controlnet_params: Dict) -> Dict:
    """Seed a fresh ControlNet's params from a trained UNet (reference:
    svd/temporal_controlnet.py:331-337 ``from_unet``): copy time_embedding
    (time_proj's sinusoid has no params), down_blocks and mid_block; keep
    the zero-initialised conv_in_concat and zero convs, and — matching the
    reference exactly — leave add_embedding at its FRESH init (from_unet
    does not copy it)."""
    import copy

    src = unet_params["params"]
    dst = copy.deepcopy(controlnet_params)
    d = dst["params"]
    for name in list(d.keys()):
        if (
            name in ("time_embedding", "mid_block")
            or name.startswith("down_blocks_")
        ):
            d[name] = copy.deepcopy(src[name])
    return dst


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Flat numpy state dict from a .safetensors file (no torch needed)."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def raft_state_dict_to_flax(state: Mapping[str, "np.ndarray"]) -> Dict:
    """Convert an official RAFT checkpoint (princeton-vl layout — e.g. the
    published ``raft-things.pth``/``raft-sintel.pth``, whose keys carry a
    DataParallel ``module.`` prefix) to models/raft.py flax params.

    Mapping: int path segments fold into the parent (``layer1.0.conv1`` ->
    ``layer1_0/conv1``, ``mask.0`` -> ``mask_0``); ``flow_head.convN`` ->
    ``flow_head_convN``; eval-mode BN buffers ``running_mean/var`` ->
    FrozenBatchNorm ``mean/var``.  ``norm3.*`` entries are dropped — the
    official ResidualBlock registers that module a second time inside the
    downsample Sequential, so the same tensors also appear as
    ``downsample.1.*`` (the name this module uses).  fnet's instance norms
    have no parameters on either side."""
    params: Dict = {}
    for key, value in state.items():
        if key.startswith("module."):
            key = key[len("module."):]
        parts = key.split(".")
        leaf = parts.pop()
        if leaf == "num_batches_tracked" or "norm3" in parts:
            continue
        path = []
        for p in parts:
            if p.isdigit():
                path[-1] = f"{path[-1]}_{p}"
            elif path and path[-1] == "flow_head":
                path[-1] = f"flow_head_{p}"
            else:
                path.append(p)
        arr = np.asarray(value)
        if leaf == "running_mean":
            leaf_name, conv = "mean", arr
        elif leaf == "running_var":
            leaf_name, conv = "var", arr
        else:
            leaf_name, conv = convert_tensor(leaf, arr)
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = conv
    return {"params": params}
