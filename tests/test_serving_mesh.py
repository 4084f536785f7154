"""Serving-mesh parity: generation sharded over a ('clip','cfg') mesh must
match single-device generation exactly (batch-axis sharding splits no
reductions).  Runs on the virtual 8-device CPU mesh (conftest)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from this_and_that_vdm_tpu.models.unet import UNetSpatioTemporalConditionModel, UNetConfig
from this_and_that_vdm_tpu.models.controlnet import ControlNetModel, ControlNetConfig
from this_and_that_vdm_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
from this_and_that_vdm_tpu.models.clip import (
    CLIPTextModel, CLIPTextConfig, CLIPVisionModelWithProjection, CLIPVisionConfig,
)
from this_and_that_vdm_tpu.pipelines import (
    StableVideoDiffusionPipeline, StableVideoDiffusionControlNetPipeline,
)
from this_and_that_vdm_tpu.parallel import make_serving_mesh

B, FR, H, W = 2, 3, 64, 128
CTX = 48
STEPS = 2


@pytest.fixture(scope="module")
def pipe():
    key = jr.PRNGKey(0)
    ks = jr.split(key, 5)
    unet = UNetSpatioTemporalConditionModel(UNetConfig.tiny())
    cn = ControlNetModel(ControlNetConfig.tiny())
    vae = AutoencoderKLTemporalDecoder(VAEConfig.tiny())
    vis = CLIPVisionModelWithProjection(
        CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=4,
                         intermediate_size=64, patch_size=56, image_size=224,
                         projection_dim=CTX))
    txt = CLIPTextModel(
        CLIPTextConfig(vocab_size=64, hidden_size=CTX, num_layers=1, num_heads=4,
                       intermediate_size=64, max_positions=16))
    x = jnp.zeros((B, FR, H // 8, W // 8, 8))
    st = jnp.zeros((B, 5, CTX))
    ai = jnp.zeros((B, 3))
    return StableVideoDiffusionControlNetPipeline(
        unet=unet, vae=vae, image_encoder=vis, text_encoder=txt,
        unet_params=unet.init(ks[0], x, jnp.array(0.0), st, ai),
        vae_params=vae.init(ks[1], jnp.zeros((1, H, W, 3)),
                            jnp.zeros((1, 1, H // 8, W // 8, 4))),
        image_encoder_params=vis.init(ks[2], jnp.zeros((1, 224, 224, 3))),
        text_encoder_params=txt.init(ks[3], jnp.zeros((1, 16), jnp.int32)),
        controlnet=cn,
        controlnet_params=cn.init(ks[4], x, jnp.array(0.0), st, ai,
                                  jnp.zeros((B, FR, H // 8, W // 8, 4))),
    )


def _inputs():
    rng = np.random.RandomState(0)
    image = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    ids = rng.randint(0, 63, (B, 16))
    cond = rng.uniform(0, 1, (FR, H, W, 3)).astype(np.float32)
    latents = jnp.asarray(rng.randn(B, FR, H // 8, W // 8, 4), jnp.float32)
    return image, ids, cond, latents


def _call_kwargs(latents):
    return dict(prompt_ids=_inputs()[1], num_frames=FR, num_inference_steps=STEPS,
                noise_aug_strength=0.0, latents=latents, key=jr.PRNGKey(1),
                decode_chunk_size=2)


def test_vl_cfg_mesh_matches_single_device(pipe):
    image, ids, cond, latents = _inputs()
    base = StableVideoDiffusionPipeline(
        unet=pipe.unet, vae=pipe.vae, image_encoder=pipe.image_encoder,
        text_encoder=pipe.text_encoder, unet_params=pipe.unet_params,
        vae_params=pipe.vae_params, image_encoder_params=pipe.image_encoder_params,
        text_encoder_params=pipe.text_encoder_params)
    ref = base(image, **_call_kwargs(latents))

    sharded = dataclasses.replace(base).place_on_mesh(
        make_serving_mesh(jax.devices()[:4], cfg=2))  # clip=2 x cfg=2
    got = sharded(image, **_call_kwargs(latents))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_vgl_cfg_mesh_matches_single_device(pipe):
    image, ids, cond, latents = _inputs()
    ref = pipe(image, cond, **_call_kwargs(latents))

    sharded = dataclasses.replace(pipe).place_on_mesh(
        make_serving_mesh(jax.devices()[:2], cfg=2))  # clip=1 x cfg=2
    got = sharded(image, cond, **_call_kwargs(latents))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_serving_mesh_shapes():
    m = make_serving_mesh(jax.devices()[:8], cfg=2)
    assert dict(m.shape) == {"clip": 4, "cfg": 2}
    with pytest.raises(AssertionError):
        make_serving_mesh(jax.devices()[:8], cfg=3)


def test_bake_params_matches_default(pipe):
    image, ids, cond, latents = _inputs()
    ref = pipe(image, cond, **_call_kwargs(latents))
    baked = dataclasses.replace(pipe, bake_params=True)
    got = baked(image, cond, **_call_kwargs(latents))
    np.testing.assert_allclose(got, ref, atol=1e-4)
