"""Round-trip: torch state dict -> flax -> torch must be bit-exact."""

import numpy as np
import torch
import pytest

from this_and_that_vdm_tpu.weights.convert import torch_state_dict_to_flax
from this_and_that_vdm_tpu.weights.export import flax_to_torch_state_dict
from torch_oracle import UNetOracle, ControlNetOracle, VAEOracle


@pytest.mark.parametrize("mk", [UNetOracle, ControlNetOracle, VAEOracle])
def test_roundtrip_bit_exact(mk):
    torch.manual_seed(0)
    model = mk()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    flax_params = torch_state_dict_to_flax(state)
    back = flax_to_torch_state_dict(flax_params)
    assert set(back) == set(state), (
        sorted(set(state) - set(back))[:5], sorted(set(back) - set(state))[:5])
    for k in state:
        assert back[k].shape == state[k].shape, k
        assert np.array_equal(back[k], state[k]), k


def test_save_hf_layout(tmp_path):
    import safetensors.numpy as stnp
    torch.manual_seed(1)
    model = UNetOracle()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    flax_params = torch_state_dict_to_flax(state)

    from this_and_that_vdm_tpu.weights.export import save_hf_layout
    path = save_hf_layout(flax_params, str(tmp_path), "unet")
    loaded = stnp.load_file(path)
    assert set(loaded) == set(state)
    k = "down_blocks.0.resnets.0.spatial_res_block.conv1.weight"
    assert np.array_equal(loaded[k], state[k])


def test_save_then_load_roundtrip(tmp_path):
    """HF-layout save -> weights.loader load must reproduce the flax tree
    (the CLI --pretrained path)."""
    import jax
    import jax.numpy as jnp
    from this_and_that_vdm_tpu.weights import loader
    from this_and_that_vdm_tpu.weights.export import save_hf_layout

    torch.manual_seed(2)
    model = ControlNetOracle()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    flax_params = torch_state_dict_to_flax(state)
    save_hf_layout(flax_params, str(tmp_path), "gesturenet")

    loaded = loader.load_gesturenet_params(str(tmp_path))
    flat_a = jax.tree_util.tree_leaves_with_path(flax_params)
    flat_b = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(loaded)
    )
    assert len(flat_a) == len(flat_b)
    for p, v in flat_a:
        got = flat_b[jax.tree_util.keystr(p)]
        assert np.array_equal(np.asarray(got), np.asarray(v)), p


def _tiny_hf_clip(kind):
    import transformers

    if kind == "vision":
        cfg = transformers.CLIPVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, patch_size=56, image_size=224,
            projection_dim=48)
        return transformers.CLIPVisionModelWithProjection(cfg)
    cfg = transformers.CLIPTextConfig(
        vocab_size=64, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16)
    return transformers.CLIPTextModel(cfg)


@pytest.mark.parametrize("kind", ["vision", "text"])
def test_clip_roundtrip_bit_exact_vs_transformers(kind):
    """Round-3 (weights rehearsal): the CLIP exporter must emit the REAL
    transformers state-dict names — validated against an actual transformers
    model, torch -> flax -> torch bit-exact."""
    from this_and_that_vdm_tpu.weights.convert import clip_state_dict_to_flax
    from this_and_that_vdm_tpu.weights.export import clip_flax_to_torch_state_dict

    torch.manual_seed(2)
    model = _tiny_hf_clip(kind)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()
             if not k.endswith("position_ids")}
    flax_params = clip_state_dict_to_flax(state)
    back = clip_flax_to_torch_state_dict(flax_params, kind)
    assert set(back) == set(state), (
        sorted(set(state) - set(back))[:5], sorted(set(back) - set(state))[:5])
    for k in state:
        assert back[k].shape == state[k].shape, k
        assert np.array_equal(back[k], state[k]), k
