"""Freeze torch-oracle outputs as golden .npz fixtures (PARITY.md).

Run from the repo root:  python tests/make_goldens.py

Fixed torch seeds + fixed inputs -> bit-reproducible oracle outputs. The
goldens serve two purposes (tests/test_goldens.py):
  (a) oracle-drift tripwire — any edit to tests/torch_oracle.py that changes
      numerics fails against the pinned outputs;
  (b) flax parity without torch in the loop — the flax models must match the
      pinned outputs through weights/convert.py.
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from torch_oracle import UNetOracle, ControlNetOracle, VAEOracle  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

B, F, H, W = 2, 3, 16, 24


def _np_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _unet_inputs(seed=0):
    rng = np.random.RandomState(seed)
    sample = rng.randn(B, F, 8, H, W).astype(np.float32)
    ctx = rng.randn(B, 5, 48).astype(np.float32)
    add_ids = np.array([[6.0, 200.0, 0.1], [6.0, 180.0, 0.05]], np.float32)
    t = np.float32(1.637)
    return sample, ctx, add_ids, t


def make_unet():
    torch.manual_seed(0)
    oracle = UNetOracle().eval()
    sample, ctx, add_ids, t = _unet_inputs(0)
    with torch.no_grad():
        out = oracle(torch.tensor(sample), torch.tensor(t), torch.tensor(ctx),
                     torch.tensor(add_ids)).numpy()
    state = _np_state(oracle)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "unet_tiny.npz"),
        sample=sample, ctx=ctx, add_ids=add_ids, t=t, out=out,
        **{"sd." + k: v for k, v in state.items()},
    )
    return out


def make_controlnet():
    torch.manual_seed(1)
    oracle = ControlNetOracle().eval()
    sample, ctx, add_ids, t = _unet_inputs(1)
    cond = np.random.RandomState(2).randn(B, F, 4, H, W).astype(np.float32)
    with torch.no_grad():
        res, mid = oracle(torch.tensor(sample), torch.tensor(t), torch.tensor(ctx),
                          torch.tensor(add_ids), torch.tensor(cond), scale=0.7)
    state = _np_state(oracle)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "controlnet_tiny.npz"),
        sample=sample, ctx=ctx, add_ids=add_ids, t=t, cond=cond,
        mid=mid.numpy(),
        **{f"res.{i}": r.numpy() for i, r in enumerate(res)},
        **{"sd." + k: v for k, v in state.items()},
    )


def make_vae():
    torch.manual_seed(0)
    oracle = VAEOracle().eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 48).astype(np.float32)
    z = np.random.RandomState(1).randn(3, 4, 4, 6).astype(np.float32)
    with torch.no_grad():
        lat = oracle.encode_mode(torch.tensor(x)).numpy()
        dec = oracle.decoder(torch.tensor(z), num_frames=3).numpy()
    state = _np_state(oracle)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "vae_tiny.npz"),
        x=x, z=z, lat=lat, dec=dec,
        **{"sd." + k: v for k, v in state.items()},
    )


def make_pipeline_self():
    """Pin the FLAX pipeline's own end-to-end latents (self-golden).

    Not an oracle fixture: the module-level goldens above anchor parity; this
    pins the full VL generation (conditioning encode -> 2-step EDM scan with
    CFG -> latents) so regressions in the scheduler/CFG/glue code trip a test
    without torch in the loop.  Weights come from the pinned unet/vae state
    dicts; the CLIP vision tower is flax-initialised at a fixed PRNGKey
    (jax's threefry PRNG is stable across releases)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import jax.random as jr

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from this_and_that_vdm_tpu.models.unet import (
        UNetSpatioTemporalConditionModel, UNetConfig)
    from this_and_that_vdm_tpu.models.vae import (
        AutoencoderKLTemporalDecoder, VAEConfig)
    from this_and_that_vdm_tpu.models.clip import (
        CLIPVisionConfig, CLIPVisionModelWithProjection)
    from this_and_that_vdm_tpu.pipelines.svd import StableVideoDiffusionPipeline
    from this_and_that_vdm_tpu.weights.convert import torch_state_dict_to_flax

    gu = np.load(os.path.join(GOLDEN_DIR, "unet_tiny.npz"))
    gv = np.load(os.path.join(GOLDEN_DIR, "vae_tiny.npz"))
    state = lambda g: {k[3:]: g[k] for k in g.files if k.startswith("sd.")}

    unet = UNetSpatioTemporalConditionModel(UNetConfig.tiny())
    vae = AutoencoderKLTemporalDecoder(VAEConfig.tiny())
    vis = CLIPVisionModelWithProjection(
        CLIPVisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                         intermediate_size=64, patch_size=56, image_size=224,
                         projection_dim=48))
    Hp, Wp, Fp = 64, 128, 3
    pipe = StableVideoDiffusionPipeline(
        unet=unet, vae=vae, image_encoder=vis,
        unet_params=torch_state_dict_to_flax(state(gu)),
        vae_params=torch_state_dict_to_flax(state(gv)),
        image_encoder_params=vis.init(jr.PRNGKey(3),
                                      jnp.zeros((1, 224, 224, 3))),
    )
    rng = np.random.RandomState(11)
    image = rng.uniform(-1, 1, (1, Hp, Wp, 3)).astype(np.float32)
    latents = rng.randn(1, Fp, Hp // 8, Wp // 8, 4).astype(np.float32)
    image_noise = rng.randn(1, Hp, Wp, 3).astype(np.float32)
    out = pipe(image, num_frames=Fp, num_inference_steps=2,
               noise_aug_strength=0.05, latents=jnp.asarray(latents),
               image_noise=image_noise, key=jr.PRNGKey(0),
               output_type="latent")
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "pipeline_self.npz"),
        image=image, latents=latents, image_noise=image_noise,
        out=np.asarray(out))


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    make_unet()
    make_controlnet()
    make_vae()
    make_pipeline_self()
    sizes = {f: os.path.getsize(os.path.join(GOLDEN_DIR, f)) // 1024
             for f in sorted(os.listdir(GOLDEN_DIR))}
    print("goldens written:", sizes, "KiB")
