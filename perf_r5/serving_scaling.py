"""Serving-mesh scaling table on the virtual CPU mesh (VERDICT r4 item 6).

PERF.md's v5e-8 serving projection ("~2.6 s/clip on (clip=4,cfg=2)") was an
estimate; this measures the ('clip','cfg') mesh's SCALING behaviour the same
way the round-2 VGL dp-scaling table did: tiny GestureNet serving program on
a virtual 8-CPU mesh (1 physical core time-sliced, so absolute time grows
~linearly with devices — the signal is that total clip-steps/s does NOT
degrade, i.e. the per-step CFG-combine all-gather and the clip-axis sharding
add no superlinear collective overhead).

Rows: (clip, cfg) mesh shapes; each runs the identical tiny pipeline
(pipelines/svd_controlnet.py denoise scan) at batch = clip-axis size,
4 denoise steps, latent output (no decode), timed over repeats after a
warm-up call that compiles/caches the executable.

    python perf_r5/serving_scaling.py > perf_r5/serving_scaling.json
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/ttv_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import jax.random as jr

import __graft_entry__ as g
from this_and_that_vdm_tpu.models.controlnet import ControlNetConfig
from this_and_that_vdm_tpu.pipelines import StableVideoDiffusionControlNetPipeline
from this_and_that_vdm_tpu.parallel import make_serving_mesh

F, H, W = g._F, g._H, g._W
STEPS = 4
REPEATS = 2


def build_pipe():
    unet, uparams = g._tiny_unet(jr.PRNGKey(0))
    cn, cparams = g._controlnet(jr.PRNGKey(3), ControlNetConfig.tiny(),
                                g._CTX_TINY)
    modules, frozen = g._frozen_towers(jr.PRNGKey(1), g._CTX_TINY)
    return StableVideoDiffusionControlNetPipeline(
        unet=unet, vae=modules["vae"], image_encoder=modules["image_encoder"],
        text_encoder=modules["text_encoder"],
        unet_params=uparams, vae_params=frozen["vae"],
        image_encoder_params=frozen["image_encoder"],
        text_encoder_params=frozen["text_encoder"],
        controlnet=cn, controlnet_params=cparams,
    )


def run_row(pipe, clip, cfg):
    n = clip * cfg
    mesh = make_serving_mesh(jax.devices()[:n], cfg=cfg)
    pipe.place_on_mesh(mesh)
    rng = np.random.RandomState(0)
    b = clip
    image = rng.uniform(-1, 1, (b, H, W, 3)).astype(np.float32)
    ids = rng.randint(0, 63, (b, 16))
    cond = rng.uniform(0, 1, (F, H, W, 3)).astype(np.float32)
    latents = jnp.asarray(rng.randn(b, F, H // 8, W // 8, 4), jnp.float32)

    def call():
        out = pipe(image, cond, prompt_ids=ids, num_frames=F,
                   num_inference_steps=STEPS, noise_aug_strength=0.0,
                   latents=latents, key=jr.PRNGKey(1), output_type="latent")
        jax.block_until_ready(out)
        return out

    t0 = time.monotonic()
    call()  # compile + warm caches
    compile_s = time.monotonic() - t0
    times = []
    for _ in range(REPEATS):
        t0 = time.monotonic()
        call()
        times.append(time.monotonic() - t0)
    wall = float(np.median(times))
    return dict(
        clip=clip, cfg=cfg, devices=n, clips_per_call=b,
        wall_s=round(wall, 3), compile_s=round(compile_s, 1),
        s_per_clip=round(wall / b, 3),
        clip_steps_per_s=round(b * STEPS / wall, 3),
    )


def main():
    pipe = build_pipe()
    rows = []
    for clip, cfg in [(1, 1), (1, 2), (4, 2)]:
        r = run_row(pipe, clip, cfg)
        rows.append(r)
        print(f"  clip={clip} cfg={cfg}: {r['wall_s']}s/call, "
              f"{r['clip_steps_per_s']} clip-steps/s", file=sys.stderr)

    base = rows[0]["clip_steps_per_s"]
    out = dict(
        program=f"tiny GestureNet serving denoise, {STEPS} steps, "
                f"{F}f {H}x{W}, latent output",
        host="1 physical core, 8 virtual CPU devices (time-sliced: absolute "
             "time scales with device count; signal = clip-steps/s vs the "
             "1-device row)",
        rows=rows,
        cfg2_overhead_vs_1dev=round(
            rows[1]["wall_s"] / rows[0]["wall_s"], 3),
        throughput_ratio_8dev_vs_1dev=round(
            rows[-1]["clip_steps_per_s"] / base, 3),
        note="ratios ~>=1 mean the CFG-combine all-gather and clip sharding "
             "add no superlinear collective overhead; real-chip latency "
             "projections live in PERF.md (TPU-scheduled AOT artifacts)",
    )
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
