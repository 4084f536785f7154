"""Sampler/CFG sweep + batch eval harness (BASELINE.json configs 3-4).

Runs the VL or VGL pipeline across a grid of guidance scales, step counts,
noise-aug strengths and fps/motion conditioning; records wall-clock per
setting and (optionally) PSNR/SSIM against a reference output directory
(e.g. frames produced by the CUDA reference or another checkpoint — the
v1.0-vs-v1.1 comparison).

    python -m this_and_that_vdm_tpu.cli.sweep --random-weights \
        --steps 15 25 50 --guidance 2.0 3.0 --out sweep.json
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import time

import numpy as np
import cv2


def main(argv=None):
    from .inference import configure_jax_runtime

    configure_jax_runtime()
    p = argparse.ArgumentParser()
    p.add_argument("--model-type", choices=["UNet", "GestureNet"], default="UNet")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--instance",
                   default="/root/reference/__assets__/Bridge_example/Task1_v1_511")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--num-frames", type=int, default=14)
    p.add_argument("--steps", type=int, nargs="+", default=[15, 25, 50])
    p.add_argument("--guidance", type=float, nargs="+", default=[1.5, 3.0])
    p.add_argument("--noise-aug", type=float, nargs="+", default=[0.1])
    p.add_argument("--motion-bucket", type=int, nargs="+", default=[200])
    p.add_argument("--fps", type=int, nargs="+", default=[7])
    p.add_argument("--batch", type=int, default=1, help="clips per call")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--reference-dir", default=None,
                   help="dir of 0..N.png to score PSNR/SSIM against")
    p.add_argument("--out", default="sweep_results.json")
    p.add_argument("--save-frames", default=None)
    args = p.parse_args(argv)

    import jax.random as jr

    from .inference import build_pipeline, _tokenizer
    from ..data.rasterize import load_condition
    from ..utils import video_io

    pipe = build_pipeline(args)
    tokenize = _tokenizer(args)
    is_gesture = args.model_type == "GestureNet"

    img = cv2.cvtColor(cv2.imread(os.path.join(args.instance, "im_0.jpg")),
                       cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (args.width, args.height), interpolation=cv2.INTER_CUBIC)
    img = (img.astype(np.float32) / 127.5 - 1.0)[None]
    img = np.repeat(img, args.batch, axis=0)
    lang = os.path.join(args.instance, "lang.txt")
    prompt = open(lang).readlines()[0].strip() if os.path.exists(lang) else ""
    ids = np.repeat(tokenize(prompt), args.batch, axis=0)
    cond = None
    if is_gesture:
        cond, _, _, _ = load_condition(
            args.instance, (args.height, args.width), args.num_frames
        )

    ref_frames = None
    if args.reference_dir:
        ref_frames = video_io.load_frames_dir(args.reference_dir)

    results = []
    grid = list(itertools.product(args.steps, args.guidance, args.noise_aug,
                                  args.motion_bucket, args.fps))
    for steps, g, aug, motion, fps in grid:
        call = dict(
            prompt_ids=ids, num_frames=args.num_frames, num_inference_steps=steps,
            max_guidance_scale=g, fps=fps, motion_bucket_id=motion,
            noise_aug_strength=aug, decode_chunk_size=8,
            key=jr.PRNGKey(args.seed), output_type="uint8",
        )
        run = (lambda: pipe(img, cond, **call)) if is_gesture else (lambda: pipe(img, **call))
        frames = run()  # compile + generate
        t0 = time.perf_counter()
        frames = run()
        dt = time.perf_counter() - t0
        rec = dict(steps=steps, guidance=g, noise_aug=aug, motion=motion, fps=fps,
                   batch=args.batch, sec_per_call=round(dt, 3),
                   sec_per_clip=round(dt / args.batch, 3))
        if ref_frames is not None:
            m = video_io.per_frame_metrics(list(frames[0]), ref_frames)
            rec.update(psnr_mean=round(m["psnr_mean"], 3),
                       ssim_mean=round(m["ssim_mean"], 4))
        if args.save_frames:
            d = os.path.join(args.save_frames,
                             f"s{steps}_g{g}_a{aug}_m{motion}_f{fps}")
            os.makedirs(d, exist_ok=True)
            for i, fr in enumerate(frames[0]):
                cv2.imwrite(os.path.join(d, f"{i}.png"),
                            cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
        print(rec)
        results.append(rec)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out} ({len(results)} settings)")
    return results


if __name__ == "__main__":
    main()
