"""Frame-count flexibility: SVD-XT's 25 frames through the same stack.

The reference UNet config defaults to ``num_frames=25``
(svd/unet_spatio_temporal_condition.py:100 — SVD-XT) even though This&That
trains/serves 14 (train_image2video.yaml:16).  Nothing in the TPU build may
bake F=14 in: temporal attention, frame-position embeddings, AlphaBlender
folding, per-frame guidance and the chunked temporal-VAE decode must all be
shape-polymorphic in F (recompile per F is fine — Python loops per frame
are not).
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from this_and_that_vdm_tpu.models.unet import (
    UNetConfig, UNetSpatioTemporalConditionModel)
from this_and_that_vdm_tpu.models.vae import (
    AutoencoderKLTemporalDecoder, VAEConfig)
from this_and_that_vdm_tpu.models.clip import (
    CLIPVisionConfig, CLIPVisionModelWithProjection)
from this_and_that_vdm_tpu.pipelines.svd import StableVideoDiffusionPipeline

F = 25
H, W = 64, 128  # divisible through every downsample level (as the reference requires)


def test_unet_forward_at_25_frames():
    cfg = UNetConfig.tiny()
    model = UNetSpatioTemporalConditionModel(cfg)
    x = jnp.zeros((2, F, H // 8, W // 8, 8))
    st = jnp.zeros((2, 2, cfg.cross_attention_dim))
    ai = jnp.zeros((2, 3))
    params = model.init(jr.PRNGKey(0), x, jnp.array(0.0), st, ai)
    out = jax.jit(model.apply)(params, x, jnp.array(1.6), st, ai)
    assert out.shape == (2, F, H // 8, W // 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_vl_pipeline_at_25_frames_with_ragged_decode_chunk():
    """Full pipeline at F=25 with decode_chunk_size=8 (25 = 3x8 + 1: the
    ragged-last-chunk path the 14-frame default never exercises)."""
    ucfg = UNetConfig.tiny()
    unet = UNetSpatioTemporalConditionModel(ucfg)
    vae = AutoencoderKLTemporalDecoder(VAEConfig.tiny())
    vis = CLIPVisionModelWithProjection(
        CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=4,
                         intermediate_size=64, patch_size=56, image_size=224,
                         projection_dim=ucfg.cross_attention_dim))
    k = jr.split(jr.PRNGKey(0), 3)
    pipe = StableVideoDiffusionPipeline(
        unet=unet, vae=vae, image_encoder=vis,
        unet_params=unet.init(
            k[0], jnp.zeros((2, 2, H // 8, W // 8, 8)), jnp.array(0.0),
            jnp.zeros((2, 1, ucfg.cross_attention_dim)), jnp.zeros((2, 3))),
        vae_params=vae.init(k[1], jnp.zeros((1, H, W, 3)),
                            jnp.zeros((1, 1, H // 8, W // 8, 4))),
        image_encoder_params=vis.init(k[2], jnp.zeros((1, 224, 224, 3))),
    )
    image = np.random.default_rng(0).uniform(-1, 1, (1, H, W, 3)).astype(np.float32)
    out = pipe(image, num_frames=F, num_inference_steps=2,
               decode_chunk_size=8, noise_aug_strength=0.0,
               key=jr.PRNGKey(7), output_type="np")
    assert out.shape == (1, F, H, W, 3)
    assert np.isfinite(out).all()
