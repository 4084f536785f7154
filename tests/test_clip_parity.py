"""CLIP text/vision parity vs transformers torch models (random init)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import transformers

from this_and_that_vdm_tpu.models.clip import (
    CLIPTextModel,
    CLIPTextConfig,
    CLIPVisionModelWithProjection,
    CLIPVisionConfig,
)
from this_and_that_vdm_tpu.weights.convert import clip_state_dict_to_flax


def _np_state(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_text_encoder_parity():
    cfg = CLIPTextConfig.tiny()
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_positions,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    oracle = transformers.CLIPTextModel(hf_cfg).eval()
    params = clip_state_dict_to_flax(_np_state(oracle))

    ids = np.array([[3, 7, 1, 0, 5, 9, 2, 4, 8, 6, 1, 1, 1, 1, 1, 1]], np.int64)
    with torch.no_grad():
        expected = oracle(torch.tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(CLIPTextModel(cfg).apply(params, jnp.asarray(ids)))
    assert np.allclose(got, expected, atol=2e-5), np.abs(got - expected).max()


def test_vision_encoder_parity():
    cfg = CLIPVisionConfig.tiny()
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        patch_size=cfg.patch_size,
        image_size=cfg.image_size,
        projection_dim=cfg.projection_dim,
        hidden_act="gelu",
    )
    torch.manual_seed(1)
    oracle = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    params = clip_state_dict_to_flax(_np_state(oracle))

    rng = np.random.RandomState(0)
    px = rng.randn(2, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    with torch.no_grad():
        expected = oracle(torch.tensor(px)).image_embeds.numpy()
    got = np.asarray(
        CLIPVisionModelWithProjection(cfg).apply(params, jnp.asarray(px.transpose(0, 2, 3, 1)))
    )
    assert np.allclose(got, expected, atol=2e-5), np.abs(got - expected).max()
