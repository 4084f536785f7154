"""Batch inference CLI — the reference's ``test_code/inference.py`` (:287-465)
re-done TPU-native.

Walks every instance folder (``im_0.jpg`` + ``lang.txt`` [+ ``data.txt``])
under ``--validation-path``, runs the VL (``--model-type UNet``) or VGL
(``--model-type GestureNet``) pipeline, and writes ``0..13.png`` +
``combined.gif`` + ``lang_cond.txt`` per instance.

Weights come from a local HF-layout directory (``--pretrained``, see
weights/loader.py).  ``--random-weights`` runs the full path with tiny
randomly-initialised models — smoke/e2e mode for environments without the
published checkpoints.

``--use-ambiguous-prompt`` rewrites the prompt to "<verb> this to there"
(reference :100-102).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np
import cv2


def _load_instance_image(path: str, height: int, width: int) -> np.ndarray:
    img = cv2.imread(os.path.join(path, "im_0.jpg"))
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (width, height), interpolation=cv2.INTER_CUBIC)
    return img.astype(np.float32) / 127.5 - 1.0


def _ambiguous_prompt(prompt: str) -> str:
    from ..data.bridge import ambiguous_prompt

    return ambiguous_prompt(prompt)


def build_pipeline(args):
    import jax.numpy as jnp
    import jax.random as jr

    from ..models.unet import UNetSpatioTemporalConditionModel, UNetConfig
    from ..models.controlnet import ControlNetModel, ControlNetConfig
    from ..models.vae import AutoencoderKLTemporalDecoder, VAEConfig
    from ..models.clip import (
        CLIPTextModel, CLIPTextConfig,
        CLIPVisionModelWithProjection, CLIPVisionConfig,
    )
    from ..pipelines import (
        StableVideoDiffusionPipeline, StableVideoDiffusionControlNetPipeline,
    )

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    is_gesture = args.model_type == "GestureNet"

    # --model-scale decouples architecture size from weight source so a
    # synthesized tiny HF-layout tree can drive the EXACT --pretrained code
    # path (the weights-rehearsal chain, cli/rehearsal.py); --random-weights
    # implies tiny for backward compat.
    # None = flag not given: --random-weights then implies tiny (back compat);
    # an EXPLICIT --model-scale full --random-weights stays full-architecture
    scale = getattr(args, "model_scale", None)
    if scale is None:
        scale = "tiny" if args.random_weights else "full"
    if scale == "tiny":
        ucfg, ccfg, vcfg = UNetConfig.tiny(), ControlNetConfig.tiny(), VAEConfig.tiny()
        ctx = ucfg.cross_attention_dim
        viscfg = CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=4,
                                  intermediate_size=64, patch_size=56,
                                  image_size=224, projection_dim=ctx)
        txtcfg = CLIPTextConfig(vocab_size=49408, hidden_size=ctx, num_layers=1,
                                num_heads=4, intermediate_size=64, max_positions=77)
    else:
        ucfg, ccfg, vcfg = UNetConfig(), ControlNetConfig(), VAEConfig()
        viscfg, txtcfg = CLIPVisionConfig(), CLIPTextConfig()

    unet = UNetSpatioTemporalConditionModel(ucfg, dtype=dtype)
    vae = AutoencoderKLTemporalDecoder(vcfg, dtype=dtype)
    vis = CLIPVisionModelWithProjection(viscfg, dtype=dtype)
    txt = CLIPTextModel(txtcfg, dtype=dtype)
    cn = ControlNetModel(ccfg, dtype=dtype) if is_gesture else None

    F, H, W = args.num_frames, args.height, args.width
    ctx = ucfg.cross_attention_dim
    if args.random_weights:
        import jax

        k = jr.PRNGKey(0)
        uparams = unet.init(k, jnp.zeros((2, F, H // 8, W // 8, 8)), jnp.array(0.0),
                            jnp.zeros((2, 78, ctx)), jnp.zeros((2, 3)))
        vparams = vae.init(k, jnp.zeros((1, H, W, 3)),
                           jnp.zeros((1, 1, H // 8, W // 8, 4)))
        visparams = vis.init(k, jnp.zeros((1, 224, 224, 3)))
        txtparams = txt.init(k, jnp.zeros((1, 77), jnp.int32))
        cnparams = None
        if cn is not None:
            cnparams = cn.init(k, jnp.zeros((2, F, H // 8, W // 8, 8)), jnp.array(0.0),
                               jnp.zeros((2, 78, ctx)), jnp.zeros((2, 3)),
                               jnp.zeros((2, F, H // 8, W // 8, 4)))
    else:
        from ..weights import loader as wl

        uparams = wl.load_unet_params(args.pretrained)
        vparams = wl.load_vae_params(args.pretrained)
        visparams = wl.load_clip_params(args.pretrained, "image_encoder")
        txtparams = wl.load_clip_params(args.pretrained, "text_encoder")
        cnparams = wl.load_gesturenet_params(args.pretrained) if is_gesture else None

    kwargs = dict(
        unet=unet, vae=vae, image_encoder=vis, text_encoder=txt,
        unet_params=uparams, vae_params=vparams,
        image_encoder_params=visparams, text_encoder_params=txtparams,
        # weights fixed for the whole run: serve baked (--no-bake keeps them
        # as arguments, e.g. the rehearsal's weight-swap negative control)
        bake_params=not getattr(args, "no_bake", False),
    )
    if is_gesture:
        return StableVideoDiffusionControlNetPipeline(
            controlnet=cn, controlnet_params=cnparams, **kwargs
        )
    return StableVideoDiffusionPipeline(**kwargs)


def _tokenizer(args):
    if args.random_weights:
        import hashlib

        def _tok_id(w: str) -> int:
            # deterministic digest: builtin hash() is PYTHONHASHSEED-salted
            # per process, which broke cross-run output comparisons in the
            # --random-weights smoke mode (round-2 review)
            return int.from_bytes(hashlib.md5(w.encode()).digest()[:4],
                                  "little") % 49000

        return lambda s: np.asarray(
            [_tok_id(w) for w in s.split()][:77] + [0] * max(0, 77 - len(s.split())),
            np.int32,
        )[None]
    from transformers import CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(args.pretrained, subfolder="tokenizer")
    return lambda s: tok([s], max_length=tok.model_max_length, padding="max_length",
                         truncation=True, return_tensors="np").input_ids


def execute_inference(args) -> list:
    import imageio
    import jax.random as jr

    from ..data.rasterize import load_condition

    pipe = build_pipeline(args)
    tokenize = _tokenizer(args)
    is_gesture = args.model_type == "GestureNet"
    os.makedirs(args.store_dir, exist_ok=True)

    outputs = []
    instances = sorted(
        d for d in os.listdir(args.validation_path)
        if os.path.isdir(os.path.join(args.validation_path, d))
    )
    for name in instances:
        inst = os.path.join(args.validation_path, name)
        if not os.path.exists(os.path.join(inst, "im_0.jpg")):
            continue
        if is_gesture and not os.path.exists(os.path.join(inst, "data.txt")):
            print(f"skip {name}: no data.txt")
            continue

        image = _load_instance_image(inst, args.height, args.width)[None]
        prompt = ""
        lang = os.path.join(inst, "lang.txt")
        if os.path.exists(lang):
            prompt = open(lang).readlines()[0].strip()
        if args.use_ambiguous_prompt:
            prompt = _ambiguous_prompt(prompt)
        ids = tokenize(prompt)

        call = dict(
            prompt_ids=ids, num_frames=args.num_frames,
            num_inference_steps=args.num_inference_steps,
            max_guidance_scale=args.max_guidance_scale,
            fps=7, motion_bucket_id=args.motion_bucket_id,
            noise_aug_strength=args.noise_aug_strength,
            decode_chunk_size=args.decode_chunk_size,
            key=jr.PRNGKey(args.seed), output_type="uint8",
        )
        if is_gesture:
            cond, motion, _, _ = load_condition(
                inst, (args.height, args.width), args.num_frames
            )
            frames = pipe(image, cond, controlnet_conditioning_scale=1.0, **call)
        else:
            frames = pipe(image, **call)

        out_dir = os.path.join(args.store_dir, name)
        os.makedirs(out_dir, exist_ok=True)
        for i, fr in enumerate(frames[0]):
            cv2.imwrite(os.path.join(out_dir, f"{i}.png"),
                        cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
        imageio.mimsave(os.path.join(out_dir, "combined.gif"), list(frames[0]), fps=4)
        with open(os.path.join(out_dir, "lang_cond.txt"), "w") as f:
            f.write(prompt + "\n")
        print(f"{name}: wrote {len(frames[0])} frames -> {out_dir}")
        outputs.append(out_dir)
    return outputs


def configure_jax_runtime():
    """Honor JAX_PLATFORMS (the sandbox sitecustomize clobbers it) and turn
    on the persistent compile cache — remote TPU compiles take minutes."""
    import jax

    try:
        if os.environ.get("JAX_PLATFORMS"):
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass  # backend already initialized
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/ttv_jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    configure_jax_runtime()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-type", "--model_type", dest="model_type",
                   choices=["UNet", "GestureNet"], default="GestureNet")
    p.add_argument("--pretrained", default=None,
                   help="local dir with HF-layout subfolders (see weights/loader.py)")
    p.add_argument("--random-weights", action="store_true",
                   help="tiny random models (no checkpoint needed; smoke mode)")
    p.add_argument("--validation-path", "--validation_path", dest="validation_path",
                   default="/root/reference/__assets__/Bridge_example")
    p.add_argument("--store-dir", "--parent_store_folder", dest="store_dir",
                   default="inference_results")
    p.add_argument("--use-ambiguous-prompt", "--use_ambiguous_prompt",
                   dest="use_ambiguous_prompt", action="store_true")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--num-frames", type=int, default=14)
    p.add_argument("--num-inference-steps", type=int, default=25)
    p.add_argument("--max-guidance-scale", type=float, default=3.0)
    p.add_argument("--motion-bucket-id", type=int, default=200)
    p.add_argument("--noise-aug-strength", type=float, default=0.1)
    p.add_argument("--decode-chunk-size", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--model-scale", choices=["full", "tiny"], default=None,
                   help="architecture size (default: full; tiny when "
                        "--random-weights). 'tiny' lets --pretrained load a "
                        "synthesized tiny HF tree (weights rehearsal)")
    p.add_argument("--no-bake", action="store_true",
                   help="keep weights as executable arguments (no constant "
                        "folding); re-renders with swapped weights reuse the "
                        "compiled program")
    args = p.parse_args(argv)
    if not args.random_weights and not args.pretrained:
        p.error("either --pretrained <dir> or --random-weights is required")
    return execute_inference(args)


if __name__ == "__main__":
    main()
