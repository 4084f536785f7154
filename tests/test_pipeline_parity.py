"""End-to-end VL/VGL pipeline parity vs a torch re-derivation of the
reference __call__ (svd/pipeline_stable_video_diffusion{,_controlnet}.py):
conditioning construction (incl. the joint (78,D) layer norm), CFG batching
order, channel-concat order, Euler/Karras loop, chunked temporal decode.

Tiny models, 3 steps, deterministic (noise_aug=0, fixed latents).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F
import transformers

from this_and_that_vdm_tpu.models.unet import UNetSpatioTemporalConditionModel, UNetConfig
from this_and_that_vdm_tpu.models.controlnet import ControlNetModel, ControlNetConfig
from this_and_that_vdm_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
from this_and_that_vdm_tpu.models.clip import (
    CLIPTextModel, CLIPTextConfig, CLIPVisionModelWithProjection, CLIPVisionConfig,
)
from this_and_that_vdm_tpu.pipelines import (
    StableVideoDiffusionPipeline, StableVideoDiffusionControlNetPipeline,
)
from this_and_that_vdm_tpu.weights.convert import (
    torch_state_dict_to_flax, clip_state_dict_to_flax,
)
from torch_oracle import UNetOracle, ControlNetOracle, VAEOracle

import test_resize  # torch antialias-resize oracle

B, FR, H, W = 1, 3, 64, 128  # latent grid 8x16: divisible by 8 like the real model
CTX = 48
STEPS = 3
CHUNK = 2

CLIP_MEAN = torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1)
CLIP_STD = torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)


def _np_state(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _karras(n):
    ramp = np.linspace(0, 1, n)
    mn, mx, rho = 0.002, 700.0, 7.0
    sig = (mx ** (1 / rho) + ramp * (mn ** (1 / rho) - mx ** (1 / rho))) ** rho
    return np.concatenate([sig, [0.0]]).astype(np.float32)


@pytest.fixture(scope="module")
def stack():
    torch.manual_seed(0)
    t_unet = UNetOracle().eval()
    t_cn = ControlNetOracle().eval()
    t_vae = VAEOracle().eval()
    t_text = transformers.CLIPTextModel(
        transformers.CLIPTextConfig(
            vocab_size=64, hidden_size=CTX, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, max_position_embeddings=16, hidden_act="gelu",
        )
    ).eval()
    t_vis = transformers.CLIPVisionModelWithProjection(
        transformers.CLIPVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, patch_size=56, image_size=224, projection_dim=CTX,
            hidden_act="gelu",
        )
    ).eval()

    pipe = StableVideoDiffusionControlNetPipeline(
        unet=UNetSpatioTemporalConditionModel(UNetConfig.tiny()),
        vae=AutoencoderKLTemporalDecoder(VAEConfig.tiny()),
        image_encoder=CLIPVisionModelWithProjection(
            CLIPVisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                             intermediate_size=64, patch_size=56, image_size=224,
                             projection_dim=CTX)
        ),
        text_encoder=CLIPTextModel(
            CLIPTextConfig(vocab_size=64, hidden_size=CTX, num_layers=2, num_heads=4,
                           intermediate_size=64, max_positions=16)
        ),
        unet_params=torch_state_dict_to_flax(_np_state(t_unet)),
        vae_params=torch_state_dict_to_flax(_np_state(t_vae)),
        image_encoder_params=clip_state_dict_to_flax(_np_state(t_vis)),
        text_encoder_params=clip_state_dict_to_flax(_np_state(t_text)),
        controlnet=ControlNetModel(ControlNetConfig.tiny()),
        controlnet_params=torch_state_dict_to_flax(_np_state(t_cn)),
    )
    return pipe, t_unet, t_cn, t_vae, t_text, t_vis


def _torch_conditioning(t_vis, t_text, t_vae, image_m11, ids):
    px = test_resize._torch_resize_antialias(image_m11, (224, 224))
    px = (px + 1) / 2
    px = (px - CLIP_MEAN) / CLIP_STD
    img_emb = t_vis(px).image_embeds.unsqueeze(1)
    txt = t_text(ids).last_hidden_state
    states = torch.cat([txt, img_emb], dim=1)
    states = F.layer_norm(states, states.shape[-2:])  # joint (S, D) norm
    states_cfg = torch.cat([torch.zeros_like(states), states])
    lat = t_vae.encode_mode(image_m11)
    lat_cfg = torch.cat([torch.zeros_like(lat), lat])
    return states_cfg, lat_cfg


def _torch_denoise(t_unet, states_cfg, lat_cfg, noise, t_cn=None, cond_lat=None, scale=1.0):
    sig = _karras(STEPS)
    add = torch.tensor([[6.0, 200.0, 0.0]]).repeat(2 * B, 1)
    g = torch.linspace(1.0, 3.0, FR).view(1, FR, 1, 1, 1)
    img_lat = lat_cfg.unsqueeze(1).repeat(1, FR, 1, 1, 1)
    x = noise * float(np.sqrt(sig[0] ** 2 + 1))
    for i in range(STEPS):
        s = float(sig[i])
        inp = torch.cat([x, x]) / float(np.sqrt(s**2 + 1))
        inp = torch.cat([inp, img_lat], dim=2)
        t = torch.tensor(0.25 * np.log(s), dtype=torch.float32)
        extra = {}
        if t_cn is not None:
            cn_cond = cond_lat.unsqueeze(0).repeat(2 * B, 1, 1, 1, 1)
            res, mid = t_cn(inp, t, states_cfg, add, cn_cond, scale=scale)
            extra = dict(down_extra=res, mid_extra=mid)
        pred = t_unet(inp, t, states_cfg, add, **extra)
        un, co = pred.chunk(2)
        pred = un + g * (co - un)
        denoised = pred * (-s / np.sqrt(s**2 + 1)) + x / (s**2 + 1)
        x = x + (x - denoised) / s * (float(sig[i + 1]) - s)
    return x


def _torch_decode(t_vae, latents):
    z = latents.flatten(0, 1) / 0.18215
    outs = []
    for i in range(0, z.shape[0], CHUNK):
        c = z[i : i + CHUNK]
        outs.append(t_vae.decoder(c, num_frames=c.shape[0]))
    frames = torch.cat(outs)
    return (frames / 2 + 0.5).clamp(0, 1)


def test_vl_pipeline_matches_torch(stack):
    pipe, t_unet, t_cn, t_vae, t_text, t_vis = stack
    rng = np.random.RandomState(0)
    image = np.clip(rng.randn(B, H, W, 3) * 0.3, -1, 1).astype(np.float32)
    ids = np.array([[1, 5, 9, 3, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    noise = rng.randn(B, FR, H // 8, W // 8, 4).astype(np.float32)

    got = pipe.__class__.__mro__[1].__call__(  # base VL pipeline path
        pipe, image, prompt_ids=ids, num_frames=FR, num_inference_steps=STEPS,
        fps=7, motion_bucket_id=200, noise_aug_strength=0.0,
        decode_chunk_size=CHUNK, latents=jnp.asarray(noise),
    )

    image_t = torch.tensor(image.transpose(0, 3, 1, 2))
    with torch.no_grad():
        states_cfg, lat_cfg = _torch_conditioning(t_vis, t_text, t_vae, image_t, torch.tensor(ids))
        lat = _torch_denoise(
            t_unet, states_cfg, lat_cfg, torch.tensor(noise.transpose(0, 1, 4, 2, 3))
        )
        frames = _torch_decode(t_vae, lat).numpy()
    expected = frames.reshape(B, FR, 3, H, W)
    got_t = got.transpose(0, 1, 4, 2, 3)
    assert got_t.shape == expected.shape
    assert np.allclose(got_t, expected, atol=2e-4), np.abs(got_t - expected).max()


def test_vgl_pipeline_matches_torch(stack):
    pipe, t_unet, t_cn, t_vae, t_text, t_vis = stack
    rng = np.random.RandomState(1)
    image = np.clip(rng.randn(B, H, W, 3) * 0.3, -1, 1).astype(np.float32)
    cond_img = rng.rand(FR, H, W, 3).astype(np.float32)
    ids = np.array([[2, 6, 1, 3, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    noise = rng.randn(B, FR, H // 8, W // 8, 4).astype(np.float32)

    got = pipe(
        image, cond_img, prompt_ids=ids, num_frames=FR, num_inference_steps=STEPS,
        fps=7, motion_bucket_id=200, noise_aug_strength=0.0,
        decode_chunk_size=CHUNK, latents=jnp.asarray(noise),
        controlnet_conditioning_scale=0.8,
    )

    image_t = torch.tensor(image.transpose(0, 3, 1, 2))
    with torch.no_grad():
        states_cfg, lat_cfg = _torch_conditioning(t_vis, t_text, t_vae, image_t, torch.tensor(ids))
        cond_lat = t_vae.encode_mode(torch.tensor(cond_img.transpose(0, 3, 1, 2)))
        lat = _torch_denoise(
            t_unet, states_cfg, lat_cfg, torch.tensor(noise.transpose(0, 1, 4, 2, 3)),
            t_cn=t_cn, cond_lat=cond_lat, scale=0.8,
        )
        frames = _torch_decode(t_vae, lat).numpy()
    expected = frames.reshape(B, FR, 3, H, W)
    got_t = got.transpose(0, 1, 4, 2, 3)
    assert np.allclose(got_t, expected, atol=2e-4), np.abs(got_t - expected).max()


def test_decode_chunking_is_per_clip():
    """decode_latents_chunked must never let a temporal chunk span two
    clips (round-2 review): with B>1 and chunk not dividing F, flat B*F
    chunking fed the temporal decoder frames of two unrelated clips.  Fake
    decoder couples all frames within a call (cumsum over the frame axis),
    so any cross-clip chunk changes the result."""
    from this_and_that_vdm_tpu.pipelines.common import decode_latents_chunked

    rng = np.random.RandomState(0)
    lat = jnp.asarray(rng.randn(2, 5, 2, 2, 4).astype(np.float32))  # B=2,F=5

    def fake_vae(z):  # [B, F, h, w, 4] -> frame-coupled output
        return jnp.cumsum(z, axis=1)

    batched = decode_latents_chunked(fake_vae, lat, 1.0, decode_chunk_size=2)
    for i in range(2):
        solo = decode_latents_chunked(fake_vae, lat[i:i + 1], 1.0,
                                      decode_chunk_size=2)
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(solo[0]))
    # chunk boundaries themselves are part of the numerics contract:
    # chunk=2 on F=5 -> cumsum resets at frames 0, 2, 4
    got = np.asarray(decode_latents_chunked(fake_vae, lat, 1.0, 2))
    want = np.concatenate([np.cumsum(np.asarray(lat[:, i:i + 2]), axis=1)
                           for i in range(0, 5, 2)], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_transformer_two_layers_shares_time_mixer():
    """transformer_layers_per_block=2 must init (one shared AlphaBlender,
    like diffusers' single self.time_mixer) — constructing it per layer
    collided on the flax module name (round-2 review)."""
    import jax.random as jr

    from this_and_that_vdm_tpu.models.transformer import (
        TransformerSpatioTemporalModel)

    m = TransformerSpatioTemporalModel(heads=2, dim_head=16, num_layers=2,
                                       cross_attention_dim=32)
    x = jnp.zeros((1, 2, 4, 4, 32))
    ctx = jnp.zeros((2, 3, 32))
    params = m.init(jr.PRNGKey(0), x, ctx, jnp.zeros((1, 2)))
    p = params["params"]
    assert "time_mixer" in p and "transformer_blocks_1" in p
    out = m.apply(params, x, ctx, jnp.zeros((1, 2)))
    assert out.shape == x.shape
