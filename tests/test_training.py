"""Train-step smoke + multi-device sharding tests (virtual 8-CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from this_and_that_vdm_tpu.models.unet import UNetSpatioTemporalConditionModel, UNetConfig
from this_and_that_vdm_tpu.models.controlnet import ControlNetModel, ControlNetConfig
from this_and_that_vdm_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
from this_and_that_vdm_tpu.models.clip import (
    CLIPTextModel, CLIPTextConfig, CLIPVisionModelWithProjection, CLIPVisionConfig,
)
from this_and_that_vdm_tpu.training import trainer
from this_and_that_vdm_tpu.parallel import make_mesh, shard_params, shard_batch, replicate

B, F, H, W = 2, 3, 64, 128
CTX = 48


def _modules_and_frozen(key):
    vis_cfg = CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=4,
                               intermediate_size=64, patch_size=56, image_size=224,
                               projection_dim=CTX)
    txt_cfg = CLIPTextConfig(vocab_size=64, hidden_size=CTX, num_layers=1,
                             num_heads=4, intermediate_size=64, max_positions=16)
    modules = dict(
        vae=AutoencoderKLTemporalDecoder(VAEConfig.tiny()),
        image_encoder=CLIPVisionModelWithProjection(vis_cfg),
        text_encoder=CLIPTextModel(txt_cfg),
    )
    ks = jr.split(key, 3)
    frozen = dict(
        vae=modules["vae"].init(ks[0], jnp.zeros((1, H, W, 3)), jnp.zeros((1, 1, 8, 16, 4))),
        image_encoder=modules["image_encoder"].init(ks[1], jnp.zeros((1, 224, 224, 3))),
        text_encoder=modules["text_encoder"].init(ks[2], jnp.zeros((1, 16), jnp.int32)),
    )
    return modules, frozen


def _batch(rng):
    return dict(
        video_frames=jnp.asarray(rng.randn(B, F, H, W, 3).astype(np.float32) * 0.2),
        prompt_ids=jnp.asarray(rng.randint(0, 63, (B, 16))),
        motion_bucket_id=jnp.full((B,), 200.0),
    )


def test_vl_train_step_decreases_on_repeat():
    key = jr.PRNGKey(0)
    unet = UNetSpatioTemporalConditionModel(UNetConfig.nano())
    params = unet.init(key, jnp.zeros((B, F, H // 8, W // 8, 8)), jnp.array(0.0),
                       jnp.zeros((B, 5, CTX)), jnp.zeros((B, 3)))
    modules, frozen = _modules_and_frozen(jr.PRNGKey(1))
    cfg = trainer.TrainConfig(learning_rate=1e-3, lr_warmup_steps=0)
    tx = trainer.make_optimizer(cfg)
    state = trainer.init_train_state(params, tx)
    step = trainer.make_vl_train_step(unet, modules, tx, cfg)

    batch = _batch(np.random.RandomState(0))
    losses = []
    for i in range(3):
        state, metrics = step(state, frozen, batch, jr.PRNGKey(7))  # same noise
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[2] < losses[0], losses  # same-batch same-noise overfit
    assert int(state.step) == 3


def test_vgl_train_step_runs_and_unet_frozen():
    key = jr.PRNGKey(0)
    unet = UNetSpatioTemporalConditionModel(UNetConfig.nano())
    cn = ControlNetModel(ControlNetConfig.nano())
    uparams = unet.init(key, jnp.zeros((B, F, H // 8, W // 8, 8)), jnp.array(0.0),
                        jnp.zeros((B, 5, CTX)), jnp.zeros((B, 3)))
    cparams = cn.init(key, jnp.zeros((B, F, H // 8, W // 8, 8)), jnp.array(0.0),
                      jnp.zeros((B, 5, CTX)), jnp.zeros((B, 3)),
                      jnp.zeros((B, F, H // 8, W // 8, 4)))
    modules, frozen = _modules_and_frozen(jr.PRNGKey(1))
    frozen = dict(frozen, unet=uparams)
    cfg = trainer.TrainConfig(learning_rate=5e-4, lr_warmup_steps=0, max_grad_norm=1.0)
    tx = trainer.make_optimizer(cfg)
    state = trainer.init_train_state(cparams, tx)
    step = trainer.make_vgl_train_step(unet, cn, modules, tx, cfg)

    rng = np.random.RandomState(1)
    batch = dict(_batch(rng), condition=jnp.asarray(rng.rand(B, F, H, W, 3).astype(np.float32)))
    state, metrics = step(state, frozen, batch, jr.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    # zero-conv outputs => first-step grads flow; unet params untouched by design
    state, m2 = step(state, frozen, batch, jr.PRNGKey(3))
    assert np.isfinite(float(m2["loss"]))


def test_vl_train_step_on_mesh_dp_fsdp():
    """(dp,fsdp) sharded VL step — nano model + 4 devices: the GSPMD
    semantics (batch sharding, ZeRO param sharding, grad psum) are identical
    at any size and compile far faster on the 1-core CPU host."""
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh(jax.devices()[:4], dp=2, fsdp=2)
    key = jr.PRNGKey(0)
    unet = UNetSpatioTemporalConditionModel(UNetConfig.nano())
    b = 4
    params = unet.init(key, jnp.zeros((b, F, H // 8, W // 8, 8)), jnp.array(0.0),
                       jnp.zeros((b, 5, CTX)), jnp.zeros((b, 3)))
    modules, frozen = _modules_and_frozen(jr.PRNGKey(1))
    cfg = trainer.TrainConfig(learning_rate=1e-4, lr_warmup_steps=0)
    tx = trainer.make_optimizer(cfg)
    state = trainer.init_train_state(params, tx)

    # min_size=1: nano tensors are all below the production 2**16
    # replication threshold; the test is about the ZeRO sharding rule
    state = jax.device_put(state, shard_params(state, mesh, min_size=1))
    frozen = jax.device_put(frozen, replicate(frozen, mesh))
    rng = np.random.RandomState(0)
    batch = dict(
        video_frames=jnp.asarray(rng.randn(b, F, H, W, 3).astype(np.float32) * 0.2),
        prompt_ids=jnp.asarray(rng.randint(0, 63, (b, 16))),
        motion_bucket_id=jnp.full((b,), 200.0),
    )
    batch = jax.device_put(batch, shard_batch(batch, mesh))

    step = trainer.make_vl_train_step(unet, modules, tx, cfg)
    with mesh:
        state2, metrics = step(state, frozen, batch, jr.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # params stayed sharded across the step
    specs = jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding, state2.params)
    )
    assert any("fsdp" in str(s.spec) for s in specs)


def test_vl_train_step_frozen_sharded_matches_replicated():
    """`frozen_sharding: fsdp` (train_loop) splits the frozen towers over
    the fsdp axis like ZeRO-3 weights — pure layout change, so the sharded
    step must reproduce the replicated-frozen loss AND global grad-norm.
    This is the correctness oracle for the fsdp2 HBM-recovery lever
    (PERF.md: ~1.07 GiB/chip reclaimed on the full-size program)."""
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh(jax.devices()[:4], dp=2, fsdp=2)
    key = jr.PRNGKey(0)
    unet = UNetSpatioTemporalConditionModel(UNetConfig.nano())
    b = 4
    params = unet.init(key, jnp.zeros((b, F, H // 8, W // 8, 8)), jnp.array(0.0),
                       jnp.zeros((b, 5, CTX)), jnp.zeros((b, 3)))
    modules, frozen = _modules_and_frozen(jr.PRNGKey(1))
    cfg = trainer.TrainConfig(learning_rate=1e-4, lr_warmup_steps=0)
    tx = trainer.make_optimizer(cfg)
    state = trainer.init_train_state(params, tx)
    step = trainer.make_vl_train_step(unet, modules, tx, cfg)

    rng = np.random.RandomState(0)
    batch = dict(
        video_frames=jnp.asarray(rng.randn(b, F, H, W, 3).astype(np.float32) * 0.2),
        prompt_ids=jnp.asarray(rng.randint(0, 63, (b, 16))),
        motion_bucket_id=jnp.full((b,), 200.0),
    )
    state_h = jax.tree.map(np.asarray, jax.device_get(state))
    frozen_h = jax.tree.map(np.asarray, jax.device_get(frozen))

    def run(frozen_rule):
        # fresh device_put per run: the step donates its state buffers
        s = jax.device_put(state_h, shard_params(state_h, mesh, min_size=1))
        f = jax.device_put(frozen_h, frozen_rule(frozen_h, mesh))
        bt = jax.device_put(batch, shard_batch(batch, mesh))
        with mesh:
            _, metrics = step(s, f, bt, jr.PRNGKey(2))
        return float(metrics["loss"]), float(metrics["grad_norm"])

    loss_r, gnorm_r = run(replicate)
    loss_s, gnorm_s = run(lambda f, m: shard_params(f, m, min_size=1))
    assert np.isfinite([loss_r, gnorm_r, loss_s, gnorm_s]).all()
    np.testing.assert_allclose(loss_s, loss_r, rtol=1e-4)
    np.testing.assert_allclose(gnorm_s, gnorm_r, rtol=1e-4)


def test_vgl_masked_conditioning_and_8bit_adam():
    key = jr.PRNGKey(0)
    unet = UNetSpatioTemporalConditionModel(UNetConfig.nano())
    cn = ControlNetModel(ControlNetConfig.nano())
    uparams = unet.init(key, jnp.zeros((B, F, H // 8, W // 8, 8)), jnp.array(0.0),
                        jnp.zeros((B, 5, CTX)), jnp.zeros((B, 3)))
    cparams = cn.init(key, jnp.zeros((B, F, H // 8, W // 8, 8)), jnp.array(0.0),
                      jnp.zeros((B, 5, CTX)), jnp.zeros((B, 3)),
                      jnp.zeros((B, F, H // 8, W // 8, 4)))
    modules, frozen = _modules_and_frozen(jr.PRNGKey(1))
    frozen = dict(frozen, unet=uparams)
    cfg = trainer.TrainConfig(
        learning_rate=5e-4, lr_warmup_steps=0, max_grad_norm=1.0,
        mask_unet_vae=True, mask_controlnet_vae=True, mask_proportion=0.3,
        use_8bit_adam=True,
    )
    tx = trainer.make_optimizer(cfg)
    state = trainer.init_train_state(cparams, tx)
    step = trainer.make_vgl_train_step(unet, cn, modules, tx, cfg)
    rng = np.random.RandomState(2)
    batch = dict(_batch(rng), condition=jnp.asarray(rng.rand(B, F, H, W, 3).astype(np.float32)))
    state, metrics = step(state, frozen, batch, jr.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))


def test_vl_pipeline_data_parallel_inference_on_mesh():
    """place_on_mesh: batch-of-clips sharded over an 8-device mesh matches
    the unsharded result (params replicated, GSPMD partitions the stages)."""
    import jax.random as jr

    from this_and_that_vdm_tpu.models.clip import (
        CLIPTextConfig, CLIPTextModel, CLIPVisionConfig,
        CLIPVisionModelWithProjection)
    from this_and_that_vdm_tpu.models.unet import (
        UNetConfig, UNetSpatioTemporalConditionModel)
    from this_and_that_vdm_tpu.models.vae import (
        AutoencoderKLTemporalDecoder, VAEConfig)
    from this_and_that_vdm_tpu.parallel.mesh import make_mesh
    from this_and_that_vdm_tpu.pipelines.svd import StableVideoDiffusionPipeline

    ucfg = UNetConfig.nano()
    unet = UNetSpatioTemporalConditionModel(ucfg)
    vae = AutoencoderKLTemporalDecoder(VAEConfig.tiny())
    vis = CLIPVisionModelWithProjection(
        CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=4,
                         intermediate_size=64, patch_size=56, image_size=224,
                         projection_dim=ucfg.cross_attention_dim))

    H, W, F, B = 64, 128, 2, 8  # latent 8x16
    up = jax.jit(unet.init)(jr.PRNGKey(0), jnp.zeros((2, F, H // 8, W // 8, 8)),
                            jnp.array(0.0),
                            jnp.zeros((2, 1, ucfg.cross_attention_dim)),
                            jnp.zeros((2, 3)))
    vp = jax.jit(vae.init)(jr.PRNGKey(1), jnp.zeros((1, H, W, 3)),
                           jnp.zeros((1, 1, H // 8, W // 8, 4)))
    ip = jax.jit(vis.init)(jr.PRNGKey(2), jnp.zeros((1, 224, 224, 3)))

    def build():
        return StableVideoDiffusionPipeline(
            unet=unet, vae=vae, image_encoder=vis,
            unet_params=up, vae_params=vp, image_encoder_params=ip)

    rng = np.random.default_rng(0)
    image = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    kwargs = dict(num_frames=F, num_inference_steps=2, noise_aug_strength=0.0,
                  key=jr.PRNGKey(7), output_type="np")

    ref = build()(image, **kwargs)
    sharded = build().place_on_mesh(make_mesh())(image, **kwargs)
    assert sharded.shape == (B, F, H, W, 3)
    np.testing.assert_allclose(sharded, ref, atol=2e-4)


def test_add_time_ids_are_per_sample():
    cfg = trainer.TrainConfig(process_fps=7, train_noise_aug_strength=0.1)
    motion = jnp.asarray([120.0, 200.0, 55.0])
    ids = trainer.make_add_time_ids(cfg, motion)
    assert ids.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(ids[:, 1]), [120.0, 200.0, 55.0])
    np.testing.assert_allclose(np.asarray(ids[:, 0]), 7.0)
    np.testing.assert_allclose(np.asarray(ids[:, 2]), 0.1, rtol=1e-6)
