"""Benchmark: sec per 14-frame 256x384 VGL clip at 25 denoise steps.

Runs the full VGL generation path (CLIP+VAE conditioning encode, 25-step
jitted lax.scan with GestureNet + UNet at CFG batch 2, chunked temporal-VAE
decode) with the real model configuration (random weights — numerics are
weight-independent for timing) in bfloat16 on the default device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` = (north-star 10 s on v5e-8, from BASELINE.json) / measured —
>1.0 means faster than the target. The reference repo publishes no numbers
(BASELINE.md), so the driver's north-star is the comparison point.

Env knobs: BENCH_STEPS (default 25), BENCH_MODE=vgl|vl|unet|train|train_vgl|
sam|yolo|raft|serving (default vgl), BENCH_DTYPE=bf16|f32, BENCH_BAKE=1|0 (serving
weight baking), BENCH_CURVE=N (train modes: N extra fixed-batch steps with random
init, per-step loss readback — the on-chip learning-sanity artifact).

``serving``: the resident VideoGenServer micro-batcher over the baked VGL
pipeline on the real chip — single-request latency + 4-concurrent
throughput (VERDICT r2 weak #7: the serving layer had never touched
hardware; the reference's analog rebuilds models per request, app.py).

``train`` / ``train_vgl``: full-size EDM train step (frozen VAE+CLIP encodes,
noising + conditioning dropout, fwd+bwd with per-block remat, 8-bit Adam
update) at the reference's per-device batch of 1 (train_image2video.yaml:41,
accelerate_config.json num_processes=4), 14 frames 256x384 — steps/s/chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import jax.random as jr

from this_and_that_vdm_tpu.cli.inference import configure_jax_runtime

# Honor JAX_PLATFORMS (sandbox sitecustomize clobbers it) + persist compiled
# executables across bench invocations (first TPU run pays the multi-minute
# remote compile, subsequent runs start hot).
configure_jax_runtime()


def _probe_backend(timeout_s: float = 600.0):
    """Fail fast (one diagnostic JSON line, rc=3) when the remote-TPU tunnel
    is down: jax.devices() then hangs indefinitely (observed 2026-08-17),
    which would wedge the whole bench run instead of reporting."""
    import threading

    got = []
    t = threading.Thread(target=lambda: got.append(jax.devices()), daemon=True)
    t.start()
    t.join(timeout_s)
    if not got:
        print(json.dumps({
            "metric": "unavailable", "value": None, "unit": None,
            "vs_baseline": None,
            "error": f"backend init (jax.devices) hung >{timeout_s:.0f}s — "
                     "axon TPU tunnel down; re-run when the tunnel is back",
        }))
        os._exit(3)
    return got[0]


def _zeros_like_tree(tree, dtype=jnp.bfloat16):
    """Zero params; float leaves stored in bf16 (inference precision — the
    reference serves fp16; full-precision trees don't fit one chip's HBM
    alongside activations)."""
    def mk(s):
        dt = dtype if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype
        return jnp.zeros(s.shape, dt)

    return jax.tree.map(mk, tree)


def _rand_like_tree(tree, dtype=jnp.bfloat16, seed=0, scale=1.0):
    """Host-side fan-in-scaled random init (BENCH_CURVE mode: zero weights
    would make the EDM loss identically ~0 — targets come from the zeroed
    VAE — so learning-sanity curves need a live network; device-side
    model.init would pay a second multi-minute tunnel compile)."""
    import numpy as np

    rng = np.random.RandomState(seed)

    def mk(s):
        if not jnp.issubdtype(s.dtype, jnp.floating):
            return jnp.zeros(s.shape, s.dtype)
        fan_in = 1
        for d in s.shape[:-1]:
            fan_in *= d
        std = scale / max(1.0, float(fan_in)) ** 0.5
        return jnp.asarray(
            rng.standard_normal(s.shape).astype(np.float32) * std, dtype)

    return jax.tree.map(mk, tree)


def bench_train(mode, H, W, F):
    """Full-size EDM train step throughput at the reference's per-device
    batch of 1 (VL: trainable UNet fp32 + remat; VGL: trainable GestureNet,
    frozen UNet bf16), frozen towers bf16, 8-bit Adam (bitsandbytes parity)."""
    import numpy as np

    from this_and_that_vdm_tpu.models.unet import (
        UNetSpatioTemporalConditionModel, UNetConfig,
    )
    from this_and_that_vdm_tpu.models.controlnet import ControlNetModel, ControlNetConfig
    from this_and_that_vdm_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
    from this_and_that_vdm_tpu.models.clip import (
        CLIPTextModel, CLIPTextConfig, CLIPVisionModelWithProjection, CLIPVisionConfig,
    )
    from this_and_that_vdm_tpu.training import trainer

    key = jr.PRNGKey(0)
    B = int(os.environ.get("BENCH_BATCH", 1))
    vgl = mode == "train_vgl"

    # remat stays on in VGL too: the UNet is frozen but in the grad path
    # (loss -> UNet -> ControlNet residuals), so without checkpointing every
    # UNet activation is saved for backward.
    unet = UNetSpatioTemporalConditionModel(
        UNetConfig(remat=True), dtype=jnp.bfloat16
    )
    modules = dict(
        vae=AutoencoderKLTemporalDecoder(VAEConfig(), dtype=jnp.bfloat16),
        image_encoder=CLIPVisionModelWithProjection(CLIPVisionConfig(), dtype=jnp.bfloat16),
        text_encoder=CLIPTextModel(CLIPTextConfig(), dtype=jnp.bfloat16),
    )
    usample = jnp.zeros((2, F, H // 8, W // 8, 8), jnp.bfloat16)
    ust = jnp.zeros((2, 78, 1024), jnp.bfloat16)
    uai = jnp.zeros((2, 3))
    uparams = jax.eval_shape(lambda: unet.init(key, usample, jnp.float32(1.6), ust, uai))
    frozen_shapes = dict(
        vae=jax.eval_shape(lambda: modules["vae"].init(
            key, jnp.zeros((1, H, W, 3), jnp.bfloat16),
            jnp.zeros((1, 1, H // 8, W // 8, 4), jnp.bfloat16))),
        image_encoder=jax.eval_shape(lambda: modules["image_encoder"].init(
            key, jnp.zeros((1, 224, 224, 3), jnp.bfloat16))),
        text_encoder=jax.eval_shape(lambda: modules["text_encoder"].init(
            key, jnp.zeros((1, 77), jnp.int32))),
    )
    curve_n = int(os.environ.get("BENCH_CURVE", 0))
    mk_tree = _rand_like_tree if curve_n else _zeros_like_tree
    frozen = mk_tree(frozen_shapes)  # frozen towers served in bf16

    cfg = trainer.TrainConfig(
        lr_warmup_steps=0, use_8bit_adam=True,
        max_grad_norm=1.0 if vgl else None,
    )
    tx = trainer.make_optimizer(cfg)

    if vgl:
        cn = ControlNetModel(ControlNetConfig(remat=True), dtype=jnp.bfloat16)
        cn_shapes = jax.eval_shape(lambda: cn.init(
            key, usample, jnp.float32(1.6), ust, uai,
            jnp.zeros((2, F, H // 8, W // 8, 4), jnp.bfloat16)))
        train_params = mk_tree(cn_shapes, jnp.float32)
        frozen["unet"] = mk_tree(uparams)  # frozen UNet in bf16
        step = trainer.make_vgl_train_step(unet, cn, modules, tx, cfg)
    else:
        train_params = mk_tree(uparams, jnp.float32)  # fp32 trainables
        step = trainer.make_vl_train_step(unet, modules, tx, cfg)

    state = trainer.init_train_state(train_params, tx)
    rng = np.random.RandomState(0)
    batch = dict(
        video_frames=jnp.asarray(rng.randn(B, F, H, W, 3).astype(np.float32) * 0.2),
        prompt_ids=jnp.zeros((B, 77), jnp.int32),
        motion_bucket_id=jnp.full((B,), 200.0),
    )
    if vgl:
        batch["condition"] = jnp.asarray(
            rng.rand(B, F, H, W, 3).astype(np.float32))

    state, metrics = step(state, frozen, batch, jr.PRNGKey(1))  # compile + warm
    float(metrics["loss"])  # host readback: block_until_ready on the
    n = 10                  # tunnelled device can return before execution
    t0 = time.perf_counter()
    for i in range(2, n + 2):  # donated state chains the steps on-device
        state, metrics = step(state, frozen, batch, jr.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))  # forces the whole chain
    dt = (time.perf_counter() - t0) / n
    name = "VGL (GestureNet)" if vgl else "VL (UNet fp32+remat)"
    record = {
        "metric": f"{name} EDM train steps/sec/chip (batch {B}, 14f 256x384, 8-bit Adam)",
        "value": round(1.0 / dt, 3), "unit": "steps/s",
        "vs_baseline": 1.0,  # reference publishes no training throughput
        "basis": "1 real chip; no reference training-throughput baseline",
    }
    if curve_n:
        # learning-sanity artifact: keep stepping on the SAME batch with the
        # SAME noise draw (fixed rng key) — the full-size step must drive its
        # own EDM loss down (overfit one example). Per-step host readback.
        losses = []
        for i in range(curve_n):
            state, metrics = step(state, frozen, batch, jr.PRNGKey(777))
            losses.append(round(float(metrics["loss"]), 5))
        record["loss_curve_fixed_batch"] = losses
    print(json.dumps(record))


def bench_perception(mode: str):
    """Curation perception models on-chip: SAM ViT-H embed+predict at the
    official 1024 input, YOLOv8n detect at 640, RAFT-large flow at Bridge
    resolution (reference runs all three on GPU via external packages /
    user-vendored FlowFormer; here they are native flax)."""
    import numpy as np

    if mode == "raft":
        from this_and_that_vdm_tpu.models.raft import (
            RAFT, RAFTConfig, raft_forward,
        )

        cfg = RAFTConfig.large()
        model = RAFT(cfg)
        H, W = 256, 384  # Bridge frame size the trajectory generator sees
        i1 = jnp.zeros((1, H, W, 3), jnp.float32)
        params = _zeros_like_tree(jax.eval_shape(
            lambda: model.init(jr.PRNGKey(0), i1, i1)), jnp.float32)
        iters = int(os.environ.get("BENCH_RAFT_ITERS", 12))
        fwd = jax.jit(lambda p, a, b: (
            lambda fl: (fl, a + jnp.mean(fl).astype(a.dtype) * 1e-12))(
            raft_forward(model, p, a, b, iters=iters)[1]))
        flow, cx = fwd(params, i1, i1)
        float(jnp.sum(flow))  # warm + readback
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            flow, cx = fwd(params, cx, i1)  # chained: no dispatch overlap
        float(jnp.sum(flow))
        dt = (time.perf_counter() - t0) / n
        print(json.dumps({
            "metric": f"RAFT-large flow ms (256x384 pair, {iters} iters, fp32, 1 chip)",
            "value": round(dt * 1e3, 2), "unit": "ms",
            "vs_baseline": 1.0,
            "basis": "no reference number (user-vendored FlowFormer on GPU)",
        }))
        return

    if mode == "sam":
        from this_and_that_vdm_tpu.models.sam import Sam, SamConfig

        cfg = SamConfig.vit_h()
        model = Sam(cfg)
        key = jr.PRNGKey(0)
        px = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.bfloat16)
        pts = jnp.zeros((1, 8, 2))
        lbl = jnp.zeros((1, 8), jnp.int32)
        params = _zeros_like_tree(jax.eval_shape(
            lambda: model.init(key, px.astype(jnp.float32), pts, lbl)))
        # chained reps: each call's input depends on the previous output so
        # dispatches cannot overlap in the async queue (PERF.md discipline)
        enc = jax.jit(lambda p, x: (
            lambda e: (e, x + jnp.mean(e.astype(jnp.float32)).astype(x.dtype)))(
            model.apply(p, x, method=Sam.encode_image)))
        pred = jax.jit(lambda p, e, pt, lb: (
            lambda m: (m[0], pt + jnp.mean(m[0]).astype(pt.dtype) * 1e-12))(
            model.apply(p, e, pt, lb, method=Sam.predict)))
        emb, cx = enc(params, px)
        float(jnp.sum(emb.astype(jnp.float32)))  # warm + readback
        masks, cp = pred(params, emb, pts, lbl)
        float(jnp.sum(masks))
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            emb, cx = enc(params, cx)
        float(jnp.sum(emb.astype(jnp.float32)))
        dt_enc = (time.perf_counter() - t0) / n
        t0 = time.perf_counter()
        for _ in range(n):
            masks, cp = pred(params, emb, cp, lbl)
        float(jnp.sum(masks))
        dt_pred = (time.perf_counter() - t0) / n
        print(json.dumps({
            "metric": "SAM ViT-H image embed ms (1024x1024, bf16, 1 chip)",
            "value": round(dt_enc * 1e3, 2), "unit": "ms",
            "vs_baseline": 1.0,
            "basis": f"no reference number; predict={dt_pred*1e3:.2f} ms "
                     "(8-slot prompt, 4-token mask decode)",
        }))
        return

    from this_and_that_vdm_tpu.models.yolov8 import YOLOv8, YOLOv8Config

    cfg = YOLOv8Config.n_scale()
    model = YOLOv8(cfg)
    x = jnp.zeros((1, 640, 640, 3), jnp.float32)
    params = _zeros_like_tree(
        jax.eval_shape(lambda: model.init(jr.PRNGKey(0), x)), jnp.float32)
    fwd = jax.jit(lambda p, a: (
        lambda o: (o, a + jnp.mean(o).astype(a.dtype) * 1e-12))(
        model.apply(p, a)))
    out, cx = fwd(params, x)
    float(jnp.sum(out))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out, cx = fwd(params, cx)  # chained: no dispatch overlap
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "YOLOv8n detect ms (640x640, fp32, 1 chip, incl. DFL decode)",
        "value": round(dt * 1e3, 2), "unit": "ms",
        "vs_baseline": 1.0,
        "basis": "no reference number (ultralytics GPU path)",
    }))


def bench_serving(pipe, F, H, W, steps):
    """VideoGenServer on the real chip (VERDICT r2 weak #7): single-request
    latency and 4-concurrent throughput through the resident micro-batcher
    over the baked VGL pipeline.  The 4-concurrent case forms ONE batch-4
    pipeline invocation (same bucket), so the number measures how much of
    the per-clip cost is batch-amortisable on one chip — the measurable
    half of PERF.md's "N clip-chips serve N requests" model.  Reference
    analog: app.py:188-271 rebuilds every model per request."""
    import numpy as np

    from this_and_that_vdm_tpu.serving import VideoGenServer

    rng = np.random.RandomState(0)
    image = (rng.rand(H, W, 3) * 2 - 1).astype(np.float32)
    cond = rng.rand(F, H, W, 3).astype(np.float32)
    ids = np.zeros((77,), np.int64)

    server = VideoGenServer(
        pipe, max_batch=4,
        num_frames=F, num_inference_steps=steps, motion_bucket_id=200,
        noise_aug_strength=0.0, decode_chunk_size=8, output_type="uint8")

    def one(seed):
        return server.submit(image, condition=cond, prompt_ids=ids, seed=seed)

    # warm/compile both programs (clip-batch 1 and 4)
    assert one(0).result().shape == (F, H, W, 3)
    for f in [one(i) for i in range(1, 5)]:
        f.result()

    n = int(os.environ.get("BENCH_REPEATS", 5))
    lat, thr = [], []
    for i in range(n):
        t0 = time.perf_counter()
        one(100 + i).result()  # .result() returns host numpy: sound wall
        lat.append(time.perf_counter() - t0)
    for i in range(n):
        t0 = time.perf_counter()
        futs = [one(200 + 4 * i + j) for j in range(4)]
        for f in futs:
            f.result()
        thr.append((time.perf_counter() - t0) / 4)
    server.close()

    def med(v):
        v = sorted(v)
        m = len(v) // 2
        return v[m] if len(v) % 2 else (v[m - 1] + v[m]) / 2

    print(json.dumps({
        "metric": f"VideoGenServer single-request latency, VGL {F}f {H}x{W} "
                  f"@{steps} steps (1 chip, bf16, baked)",
        "value": round(med(lat), 3), "unit": "s/request",
        "vs_baseline": round(10.0 / med(lat), 3),
        "basis": "1 chip measured vs v5e-8 north-star (<10 s/clip); "
                 "includes the micro-batcher's max_delay_s=0.05 wait",
        "repeats": n,
        "latency_s": [round(x, 3) for x in lat],
        "concurrent4_s_per_clip": [round(x, 3) for x in thr],
        "concurrent4_median_s_per_clip": round(med(thr), 3),
        "batch_amortisation": round(med(lat) / med(thr), 3),
    }))


def main():
    from this_and_that_vdm_tpu.models.unet import (
        UNetSpatioTemporalConditionModel, UNetConfig,
    )
    from this_and_that_vdm_tpu.models.controlnet import ControlNetModel, ControlNetConfig
    from this_and_that_vdm_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
    from this_and_that_vdm_tpu.models.clip import (
        CLIPTextModel, CLIPTextConfig, CLIPVisionModelWithProjection, CLIPVisionConfig,
    )
    from this_and_that_vdm_tpu.pipelines import StableVideoDiffusionControlNetPipeline
    from this_and_that_vdm_tpu.pipelines.svd import StableVideoDiffusionPipeline

    _probe_backend()
    steps = int(os.environ.get("BENCH_STEPS", 25))
    mode = os.environ.get("BENCH_MODE", "vgl")
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    H, W, F = 256, 384, 14
    key = jr.PRNGKey(0)

    if mode in ("train", "train_vgl"):
        # train modes have fixed precision (bf16 compute towers, fp32
        # trainables — the reference's mixed-precision recipe); BENCH_DTYPE
        # only affects the inference modes.
        return bench_train(mode, H, W, F)
    if mode in ("sam", "yolo", "raft"):
        return bench_perception(mode)

    unet = UNetSpatioTemporalConditionModel(UNetConfig(), dtype=dtype)
    uparams = _zeros_like_tree(jax.eval_shape(
        lambda: unet.init(key, jnp.zeros((2, F, H // 8, W // 8, 8), dtype),
                          jnp.float32(1.6), jnp.zeros((2, 78, 1024), dtype),
                          jnp.zeros((2, 3)))))

    if mode == "unet":
        # Raw denoiser throughput: steps/sec/chip at CFG batch 2.  Measured as
        # one jitted lax.scan of `steps` data-dependent forwards — individual
        # jit calls timed in a Python loop overlap in the async dispatch queue
        # and can read 100x too fast (the remote-device buffer future resolves
        # before execution), so only a chained on-device loop is trustworthy.
        s = jnp.zeros((2, 78, 1024), dtype)
        a = jnp.asarray([[6.0, 200.0, 0.1]] * 2)

        @jax.jit
        def fn(p, x0):
            def body(c, _):
                out = unet.apply(p, c, jnp.float32(1.6), s, a)
                return jnp.concatenate([out, out], axis=-1).astype(dtype), ()

            return jax.lax.scan(body, x0, None, length=steps)[0]

        x = jnp.zeros((2, F, H // 8, W // 8, 8), dtype)
        # scalar host readback per rep: block_until_ready through the
        # remote-device tunnel can return before execution finishes.
        float(jnp.sum(fn(uparams, x)))
        dts = []
        for _ in range(int(os.environ.get("BENCH_REPEATS", 5))):
            t0 = time.perf_counter()
            float(jnp.sum(fn(uparams, x)))
            dts.append((time.perf_counter() - t0) / steps)
        dt = min(dts)
        print(json.dumps({
            "metric": "UNet denoise steps/sec/chip (CFG batch 2, 14f 256x384, bf16)",
            "value": round(1.0 / dt, 3), "unit": "steps/s",
            "vs_baseline": round((10.0 / steps) / dt, 3),
            # VERDICT r1 weak#5: the ratio is cross-basis by necessity —
            # numerator is the v5e-8 north star, denominator one chip
            "basis": "1 chip measured vs v5e-8 north-star (<10 s/clip)",
            "repeats": len(dts),
            "steps_per_s_samples": [round(1.0 / d, 3) for d in dts],
        }))
        return

    vae = AutoencoderKLTemporalDecoder(VAEConfig(), dtype=dtype)
    vparams = _zeros_like_tree(jax.eval_shape(
        lambda: vae.init(key, jnp.zeros((1, H, W, 3), dtype),
                         jnp.zeros((1, 1, H // 8, W // 8, 4), dtype))))
    vis = CLIPVisionModelWithProjection(CLIPVisionConfig(), dtype=dtype)
    visparams = _zeros_like_tree(jax.eval_shape(
        lambda: vis.init(key, jnp.zeros((1, 224, 224, 3), dtype))))
    txt = CLIPTextModel(CLIPTextConfig(), dtype=dtype)
    txtparams = _zeros_like_tree(jax.eval_shape(
        lambda: txt.init(key, jnp.zeros((1, 77), jnp.int32))))

    kwargs = dict(
        unet=unet, vae=vae, image_encoder=vis, text_encoder=txt,
        unet_params=uparams, vae_params=vparams,
        image_encoder_params=visparams, text_encoder_params=txtparams,
        # serving mode: denoiser weights compiled in as constants (~11%
        # faster steps; weights never change at inference). BENCH_BAKE=0 to
        # measure the weights-as-arguments path.
        bake_params=os.environ.get("BENCH_BAKE", "1") == "1",
    )
    B = int(os.environ.get("BENCH_BATCH", 1))  # clips per call (throughput)
    image = jnp.zeros((B, H, W, 3), jnp.float32)
    ids = jnp.zeros((B, 77), jnp.int32)
    call_kwargs = dict(
        prompt_ids=ids, num_frames=F, num_inference_steps=steps,
        motion_bucket_id=200, noise_aug_strength=0.1, decode_chunk_size=8,
        key=jr.PRNGKey(1), output_type="uint8",  # device-side cast: 4x less
    )                                            # device->host traffic

    if mode == "vl":
        pipe = StableVideoDiffusionPipeline(**kwargs)
        run = lambda: pipe(image, **call_kwargs)
    else:
        cn = ControlNetModel(ControlNetConfig(), dtype=dtype)
        cnparams = _zeros_like_tree(jax.eval_shape(
            lambda: cn.init(key, jnp.zeros((2, F, H // 8, W // 8, 8), dtype),
                            jnp.float32(1.6), jnp.zeros((2, 78, 1024), dtype),
                            jnp.zeros((2, 3)),
                            jnp.zeros((2, F, H // 8, W // 8, 4), dtype))))
        pipe = StableVideoDiffusionControlNetPipeline(
            controlnet=cn, controlnet_params=cnparams, **kwargs
        )
        if mode == "serving":
            return bench_serving(pipe, F, H, W, steps)
        cond = jnp.ones((F, H, W, 3), jnp.float32)
        run = lambda: pipe(image, cond, **call_kwargs)

    run()  # compile + warm
    # N individually-timed repeats (each run() ends in a host numpy readback,
    # so per-rep walls are sound); median + spread so tunnel noise and real
    # regressions are distinguishable (VERDICT r2 weak #2: the 4.61->4.81
    # drift was unreadable from single-sample records).
    n = int(os.environ.get("BENCH_REPEATS", 5))
    reps = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = run()
        reps.append((time.perf_counter() - t0) / B)
    reps_s = sorted(reps)
    dt = reps_s[len(reps_s) // 2] if n % 2 else (
        reps_s[n // 2 - 1] + reps_s[n // 2]) / 2
    batch_note = f", batch {B}" if B > 1 else ""
    record = {
        "metric": f"sec per 14-frame 256x384 {mode.upper()} clip @{steps} steps (1 chip, bf16{batch_note})",
        "value": round(dt, 3), "unit": "s/clip",
        "vs_baseline": round(10.0 / dt, 3),
        "basis": "1 chip measured vs v5e-8 north-star (<10 s/clip)",
        "repeats": n, "median": round(dt, 3),
        "min": round(reps_s[0], 3), "max": round(reps_s[-1], 3),
        "samples": [round(r, 3) for r in reps],
    }
    # Regression guard (VERDICT r3 #9): the headline config has a measured
    # band of 4.64-4.75 s/clip over rounds 2-3; a median past REGRESSION_MAX
    # is a real loss, not tunnel noise — flag it and exit nonzero so the
    # driver/CI can't silently record a slower round.
    REGRESSION_MAX = 5.2
    is_headline = mode == "vgl" and steps == 25 and B == 1 \
        and os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
    if is_headline:
        record["regression"] = bool(dt > REGRESSION_MAX)
        record["regression_threshold_s"] = REGRESSION_MAX
    print(json.dumps(record))
    if record.get("regression"):
        sys.exit(2)


if __name__ == "__main__":
    # BENCH_PROFILE=<logdir>: wrap the whole run in a jax.profiler trace
    # (TensorBoard-viewable xplane; utils/profiling.py) — how the PERF.md
    # per-category step breakdowns were captured.
    _logdir = os.environ.get("BENCH_PROFILE")
    if _logdir:
        from this_and_that_vdm_tpu.utils.profiling import trace

        with trace(_logdir):
            main()
    else:
        main()
