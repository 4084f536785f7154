"""Golden-fixture tests (PARITY.md 'Golden fixtures').

(a) oracle drift: re-running the torch oracle at the pinned seeds must
    reproduce the pinned outputs bit-for-bit;
(b) flax parity vs goldens: the flax models fed the PINNED state dict via
    weights/convert.py must match the pinned outputs — torch never runs in
    this path, so parity holds even if torch is absent/changed.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from this_and_that_vdm_tpu.models.unet import UNetSpatioTemporalConditionModel, UNetConfig
from this_and_that_vdm_tpu.models.controlnet import ControlNetModel, ControlNetConfig
from this_and_that_vdm_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
from this_and_that_vdm_tpu.weights.convert import torch_state_dict_to_flax

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _load(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated (python tests/make_goldens.py)")
    return np.load(path)


def _state(g):
    return {k[3:]: g[k] for k in g.files if k.startswith("sd.")}


# ------------------------------------------------------------- oracle drift

def test_oracle_reproduces_unet_golden():
    import torch
    from torch_oracle import UNetOracle

    g = _load("unet_tiny.npz")
    torch.manual_seed(0)
    oracle = UNetOracle().eval()
    # seeding must reproduce the pinned weights exactly (same torch build)
    for k, v in oracle.state_dict().items():
        np.testing.assert_array_equal(v.numpy(), g["sd." + k], err_msg=k)
    with torch.no_grad():
        out = oracle(torch.tensor(g["sample"]), torch.tensor(g["t"]),
                     torch.tensor(g["ctx"]), torch.tensor(g["add_ids"])).numpy()
    np.testing.assert_allclose(out, g["out"], atol=1e-6)


# --------------------------------------------------- flax parity vs goldens

def test_flax_unet_matches_golden():
    g = _load("unet_tiny.npz")
    params = torch_state_dict_to_flax(_state(g))
    model = UNetSpatioTemporalConditionModel(UNetConfig.tiny())
    got = model.apply(
        params,
        jnp.asarray(g["sample"].transpose(0, 1, 3, 4, 2)),
        jnp.asarray(g["t"]),
        jnp.asarray(g["ctx"]),
        jnp.asarray(g["add_ids"]),
    )
    got = np.asarray(got).transpose(0, 1, 4, 2, 3)
    assert np.allclose(got, g["out"], atol=5e-5), np.abs(got - g["out"]).max()


def test_flax_controlnet_matches_golden():
    g = _load("controlnet_tiny.npz")
    params = torch_state_dict_to_flax(_state(g))
    cn = ControlNetModel(ControlNetConfig.tiny())
    res, mid = cn.apply(
        params,
        jnp.asarray(g["sample"].transpose(0, 1, 3, 4, 2)),
        jnp.asarray(g["t"]),
        jnp.asarray(g["ctx"]),
        jnp.asarray(g["add_ids"]),
        jnp.asarray(g["cond"].transpose(0, 1, 3, 4, 2)),
        conditioning_scale=0.7,
    )

    def _flat(x):
        a = np.asarray(x).transpose(0, 1, 4, 2, 3)
        return a.reshape(-1, *a.shape[2:])

    for i, r in enumerate(res):
        want = g[f"res.{i}"]
        assert np.allclose(_flat(r), want, atol=5e-5), i
    assert np.allclose(_flat(mid), g["mid"], atol=5e-5)


def test_flax_vae_matches_golden():
    g = _load("vae_tiny.npz")
    params = torch_state_dict_to_flax(_state(g))
    vae = AutoencoderKLTemporalDecoder(VAEConfig.tiny())
    lat = vae.apply(params, jnp.asarray(g["x"].transpose(0, 2, 3, 1)),
                    method="encode_mode")
    assert np.allclose(np.asarray(lat).transpose(0, 3, 1, 2), g["lat"], atol=5e-5)
    zj = jnp.asarray(g["z"].transpose(0, 2, 3, 1).reshape(1, 3, 4, 6, 4))
    dec = vae.apply(params, zj, method="decode")
    dec = np.asarray(dec).reshape(3, 32, 48, 3).transpose(0, 3, 1, 2)
    assert np.allclose(dec, g["dec"], atol=5e-5), np.abs(dec - g["dec"]).max()


# -------------------------------------------- perception goldens (round 3)
# VERDICT r2 next #5: the SAM/YOLO/RAFT/XMem/CLIP oracles get the same
# golden treatment as the SVD trio — (a) oracle code-drift tripwire from
# pinned weights, (b) torch-free flax parity through weights/convert.py.
# XMem is the exception (62M-param fixed-size oracle, state dict too large
# to pin): its golden pins seeds + a state-dict checksum + IO, so it is a
# drift tripwire only; flax parity stays in test_xmem.py (torch in loop).


def test_oracle_reproduces_sam_golden():
    import torch
    import sam_oracle
    from make_goldens import sam_oracle_cfg

    g = _load("sam_tiny.npz")
    oracle = sam_oracle.Sam(sam_oracle_cfg()).eval()
    oracle.load_state_dict({k[3:]: torch.from_numpy(g[k])
                            for k in g.files if k.startswith("sd.")})
    with torch.no_grad():
        masks, iou = oracle(
            torch.from_numpy(g["img"].transpose(0, 3, 1, 2)),
            torch.from_numpy(g["points"]), torch.from_numpy(g["labels"]))
    np.testing.assert_allclose(masks.numpy(), g["masks"], atol=1e-6)
    np.testing.assert_allclose(iou.numpy(), g["iou"], atol=1e-6)


def test_flax_sam_matches_golden():
    from this_and_that_vdm_tpu.models.sam import Sam, SamConfig
    from this_and_that_vdm_tpu.weights.convert import sam_state_dict_to_flax

    g = _load("sam_tiny.npz")
    params = sam_state_dict_to_flax(_state(g))
    masks, iou = Sam(SamConfig.tiny()).apply(
        params, jnp.asarray(g["img"]), jnp.asarray(g["points"]),
        jnp.asarray(g["labels"]))
    np.testing.assert_allclose(np.asarray(masks), g["masks"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(iou), g["iou"], atol=2e-4)


def test_oracle_reproduces_yolo_golden():
    import torch
    import yolo_oracle
    from this_and_that_vdm_tpu.models.yolov8 import YOLOv8Config

    g = _load("yolo_tiny.npz")
    oracle = yolo_oracle.DetectionModel(YOLOv8Config.tiny(nc=2)).eval()
    oracle.load_state_dict({k[3:]: torch.from_numpy(g[k])
                            for k in g.files if k.startswith("sd.")})
    with torch.no_grad():
        pred = oracle(torch.from_numpy(g["img"].transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(pred.numpy(), g["pred"], atol=1e-6)


def test_flax_yolo_matches_golden():
    from this_and_that_vdm_tpu.models.yolov8 import YOLOv8, YOLOv8Config
    from this_and_that_vdm_tpu.weights.convert import yolo_state_dict_to_flax

    g = _load("yolo_tiny.npz")
    params = yolo_state_dict_to_flax(_state(g))
    pred = YOLOv8(YOLOv8Config.tiny(nc=2)).apply(params, jnp.asarray(g["img"]))
    np.testing.assert_allclose(
        np.asarray(pred), g["pred"].transpose(0, 2, 1), atol=5e-4)


def test_oracle_reproduces_raft_golden():
    import torch
    import raft_oracle
    from this_and_that_vdm_tpu.models.raft import RAFTConfig

    g = _load("raft_tiny.npz")
    oracle = raft_oracle.RAFT(RAFTConfig.tiny()).eval()
    oracle.load_state_dict({k[3:]: torch.from_numpy(g[k])
                            for k in g.files if k.startswith("sd.")})
    with torch.no_grad():
        f_low, f_up = oracle(
            torch.from_numpy(g["i1"]).permute(0, 3, 1, 2),
            torch.from_numpy(g["i2"]).permute(0, 3, 1, 2),
            iters=int(g["iters"]))
    np.testing.assert_allclose(f_low.numpy(), g["flow_low"], atol=1e-6)
    np.testing.assert_allclose(f_up.numpy(), g["flow_up"], atol=1e-6)


def test_flax_raft_matches_golden():
    from this_and_that_vdm_tpu.models.raft import RAFT, RAFTConfig, raft_forward
    from this_and_that_vdm_tpu.weights.convert import raft_state_dict_to_flax

    g = _load("raft_tiny.npz")
    params = raft_state_dict_to_flax(
        {"module." + k: v for k, v in _state(g).items()})
    f_low, f_up = raft_forward(RAFT(RAFTConfig.tiny()), params,
                               jnp.asarray(g["i1"]), jnp.asarray(g["i2"]),
                               iters=int(g["iters"]))
    np.testing.assert_allclose(
        np.asarray(f_low), g["flow_low"].transpose(0, 2, 3, 1), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(f_up), g["flow_up"].transpose(0, 2, 3, 1), atol=2e-4)


def test_oracle_reproduces_xmem_io_golden():
    """XMem drift tripwire: the seed-derived oracle (weights too large to
    pin) must still produce the pinned checksum AND the pinned outputs."""
    import torch
    from make_goldens import build_xmem_oracle, xmem_sd_checksum

    g = _load("xmem_io.npz")
    oracle = build_xmem_oracle()
    np.testing.assert_allclose(xmem_sd_checksum(oracle), g["sd_checksum"],
                               rtol=1e-12)
    with torch.no_grad():
        key, sh, sel, f16, f8, f4 = oracle.encode_key(
            torch.from_numpy(g["frame0"]))
        k1 = oracle.encode_key(torch.from_numpy(g["frame1"]))
        v, h = oracle.encode_value(
            torch.from_numpy(g["frame1"]), k1[3],
            torch.from_numpy(g["h16"]), torch.from_numpy(g["masks"]))
        hid, _logits, prob = oracle.segment(
            k1[3], k1[4], k1[5],
            torch.from_numpy(np.moveaxis(g["readout"], -1, -3)),
            torch.from_numpy(g["h16"]))
    for got, name in [(key, "key"), (sh, "shrinkage"), (sel, "selection"),
                      (f16, "f16"), (f8, "f8"), (f4, "f4"), (v, "value"),
                      (h, "hidden"), (hid, "seg_hidden"), (prob, "seg_prob")]:
        np.testing.assert_allclose(got.numpy(), g[name], atol=1e-5,
                                   err_msg=name)


def test_oracle_reproduces_clip_golden():
    import torch
    from make_goldens import clip_oracles

    g = _load("clip_tiny.npz")
    text, vision = clip_oracles()
    # seeding must reproduce the pinned weights exactly (same torch build)
    for prefix, m in (("text.", text), ("vision.", vision)):
        for k, v in m.state_dict().items():
            if not k.endswith("position_ids"):
                np.testing.assert_array_equal(
                    v.numpy(), g["sd." + prefix + k], err_msg=k)
    with torch.no_grad():
        t_out = text(torch.tensor(g["ids"])).last_hidden_state.numpy()
        v_out = vision(torch.tensor(g["px"])).image_embeds.numpy()
    np.testing.assert_allclose(t_out, g["text_out"], atol=1e-6)
    np.testing.assert_allclose(v_out, g["vision_out"], atol=1e-6)


def test_flax_clip_matches_golden():
    from this_and_that_vdm_tpu.models.clip import (
        CLIPTextModel, CLIPTextConfig, CLIPVisionModelWithProjection,
        CLIPVisionConfig)
    from this_and_that_vdm_tpu.weights.convert import clip_state_dict_to_flax

    g = _load("clip_tiny.npz")
    sd = _state(g)
    t_sd = {k[len("text."):]: v for k, v in sd.items() if k.startswith("text.")}
    v_sd = {k[len("vision."):]: v for k, v in sd.items()
            if k.startswith("vision.")}
    t_out = CLIPTextModel(CLIPTextConfig.tiny()).apply(
        clip_state_dict_to_flax(t_sd), jnp.asarray(g["ids"]))
    v_out = CLIPVisionModelWithProjection(CLIPVisionConfig.tiny()).apply(
        clip_state_dict_to_flax(v_sd),
        jnp.asarray(g["px"].transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(t_out), g["text_out"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_out), g["vision_out"], atol=2e-5)


def test_flax_pipeline_matches_self_golden():
    """End-to-end VL generation pinned against the repo's OWN output
    (self-golden, not oracle parity — the module goldens above anchor
    parity): regressions in the scheduler, CFG combine, conditioning glue
    or decode chunking trip here without torch in the loop."""
    import jax.numpy as jnp
    import jax.random as jr

    from this_and_that_vdm_tpu.models.clip import (
        CLIPVisionConfig, CLIPVisionModelWithProjection)
    from this_and_that_vdm_tpu.pipelines.svd import StableVideoDiffusionPipeline

    g = _load("pipeline_self.npz")
    gu, gv = _load("unet_tiny.npz"), _load("vae_tiny.npz")
    unet = UNetSpatioTemporalConditionModel(UNetConfig.tiny())
    vae = AutoencoderKLTemporalDecoder(VAEConfig.tiny())
    vis = CLIPVisionModelWithProjection(
        CLIPVisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                         intermediate_size=64, patch_size=56, image_size=224,
                         projection_dim=48))
    pipe = StableVideoDiffusionPipeline(
        unet=unet, vae=vae, image_encoder=vis,
        unet_params=torch_state_dict_to_flax(_state(gu)),
        vae_params=torch_state_dict_to_flax(_state(gv)),
        image_encoder_params=vis.init(jr.PRNGKey(3),
                                      jnp.zeros((1, 224, 224, 3))),
    )
    out = pipe(g["image"], num_frames=int(g["latents"].shape[1]),
               num_inference_steps=2, noise_aug_strength=0.05,
               latents=jnp.asarray(g["latents"]), image_noise=g["image_noise"],
               key=jr.PRNGKey(0), output_type="latent")
    # 5e-4: the golden was generated without the test env's virtual
    # 8-device flag, which changes XLA:CPU fusion order (~2e-4 noise);
    # real regressions (scheduler/CFG/glue) move latents by >>1e-3
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=5e-4)
