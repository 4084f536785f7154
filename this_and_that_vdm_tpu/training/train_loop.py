"""End-to-end training drivers for VL (UNet) and VGL (GestureNet).

The TPU-native counterpart of ``accelerate launch train_code/train_svd.py``
/ ``train_csvd.py`` (reference :271-904 / :272-1004): YAML config in, mesh
out of ``jax.devices()``, jitted sharded train step, orbax checkpoints with
rotation + latest-resume, JSONL/TensorBoard metrics, periodic validation
rendering through the real inference pipeline (reference ``log_validation``,
train_svd.py:85-201).

Usage:
    python -m this_and_that_vdm_tpu.training.train_loop \
        --config config/train_image2video.yaml [--mode vl|vgl] [--synthetic N]
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import yaml

from ..models.unet import UNetSpatioTemporalConditionModel, UNetConfig
from ..models.controlnet import ControlNetModel, ControlNetConfig
from ..models.vae import AutoencoderKLTemporalDecoder, VAEConfig
from ..models.clip import (
    CLIPTextModel,
    CLIPTextConfig,
    CLIPVisionModelWithProjection,
    CLIPVisionConfig,
)
from ..data import bridge
from ..parallel import (
    distributed_init,
    global_batch,
    host_replicated,
    is_main_process,
    make_mesh,
    replicate,
    shard_params,
)
from ..weights import loader as weight_loader
from . import checkpoint as ckpt
from . import trainer
from .metrics import MetricLogger


def _motion_or_default(cfg: dict) -> int:
    """motion_bucket_id: None/absent -> 200; an explicit 0 is a VALID SVD
    bucket and must not be swallowed by a falsy `or` (round-2 review)."""
    v = cfg.get("motion_bucket_id")
    return 200 if v is None else int(v)


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def train_config_from_yaml(cfg: dict, mode: str) -> trainer.TrainConfig:
    return trainer.TrainConfig(
        learning_rate=float(cfg.get("learning_rate", 1e-5)),
        lr_warmup_steps=int(cfg.get("lr_warmup_steps", 500)),
        adam_beta1=float(cfg.get("adam_beta1", 0.9)),
        adam_beta2=float(cfg.get("adam_beta2", 0.999)),
        adam_weight_decay=float(cfg.get("adam_weight_decay", 1e-2)),
        adam_epsilon=float(cfg.get("adam_epsilon", 1e-8)),
        noise_mean=float(cfg.get("noise_mean", 0.5)),
        noise_std=float(cfg.get("noise_std", 1.4)),
        conditioning_dropout_prob=float(cfg.get("conditioning_dropout_prob", 0.1)),
        train_noise_aug_strength=float(cfg.get("train_noise_aug_strength", 0.1)),
        process_fps=int(cfg.get("process_fps", 7)),
        motion_bucket_id=_motion_or_default(cfg),
        max_grad_norm=1.0 if mode == "vgl" else None,
        partial_finetune=bool(cfg.get("partial_finetune", False)),
        use_text=bool(cfg.get("use_text", True)),
        gradient_accumulation_steps=int(cfg.get("gradient_accumulation_steps", 1)),
        # reference pins this True in both YAMLs ("Need this to save more
        # memory", config/train_image2video.yaml:67) — the fsdp memory story
        # (PERF.md) is measured against this, the shipped layout
        use_8bit_adam=bool(cfg.get("use_8bit_adam", False)),
    )


def frozen_dtype_from_yaml(cfg: dict):
    """``mixed_precision`` -> frozen-tower dtype (train_svd.py:428-440).

    The reference casts every FROZEN module to fp16 (vae/image_encoder/
    text_encoder; train_csvd additionally the frozen UNet:448) while the
    trainable model stays fp32.  TPU-native mapping: fp16 -> bf16 (same
    byte width, no loss-scaler needed on TPU)."""
    mp = str(cfg.get("mixed_precision", "no")).lower()
    if mp in ("fp16", "float16", "bf16", "bfloat16"):
        return jnp.bfloat16
    return jnp.float32


def data_config_from_yaml(cfg: dict) -> bridge.DataConfig:
    return bridge.DataConfig(
        dataset_path=cfg.get("dataset_path", []),
        video_seq_length=int(cfg.get("video_seq_length", 14)),
        height=int(cfg.get("height", 256)),
        width=int(cfg.get("width", 384)),
        flip_aug_prob=float(cfg.get("flip_aug_prob", 0.45)),
        acceleration_tolerance=int(cfg.get("acceleration_tolerance", 4)),
        use_text=bool(cfg.get("use_text", True)),
        mix_ambiguous=bool(cfg.get("mix_ambiguous", False)),
        empty_prompts_proportion=float(cfg.get("empty_prompts_proportion", 0.0)),
        motion_bucket_id=cfg.get("motion_bucket_id", 200),
        dataset_motion_mean=float(cfg.get("dataset_motion_mean", 35.3)),
        dataset_motion_std=float(cfg.get("dataset_motion_std", 18.5)),
        svd_motion_mean=float(cfg.get("svd_motion_mean", 165)),
        svd_motion_std=float(cfg.get("svd_motion_std", 22.5)),
    )


class SyntheticDataset:
    """Random batches with the dataset contract — smoke/bench mode."""

    def __init__(self, dcfg: bridge.DataConfig, n: int = 64, gesture: bool = False):
        self.dcfg, self.n, self.gesture = dcfg, n, gesture

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        d = self.dcfg
        item = dict(
            video_frames=rng.randn(d.video_seq_length, d.height, d.width, 3)
            .astype(np.float32)
            .clip(-1, 1),
            prompt_ids=rng.randint(0, 1000, (77,)).astype(np.int32),
            motion_bucket_id=np.float32(200),
        )
        if self.gesture:
            item["condition"] = rng.rand(
                d.video_seq_length, d.height, d.width, 3
            ).astype(np.float32)
        return item


def build_models(cfg: dict, mode: str, dtype=jnp.float32, tiny: bool = False,
                 nano: bool = False, frozen_dtype=None):
    """``frozen_dtype``: compute/weight dtype for the FROZEN modules only —
    vae/image_encoder/text_encoder, plus the UNet in VGL mode where it is
    frozen too (reference mixed_precision, train_svd.py:436-440 /
    train_csvd.py:447-449).  The trainable model always stays ``dtype``."""
    frozen_dtype = dtype if frozen_dtype is None else frozen_dtype
    if tiny or nano:
        if nano:  # 2-block topology: fastest CPU compile for smoke tests
            unet_cfg, cn_cfg = UNetConfig.nano(), ControlNetConfig.nano()
            vae_cfg = VAEConfig.tiny()
        else:
            unet_cfg, cn_cfg, vae_cfg = (
                UNetConfig.tiny(), ControlNetConfig.tiny(), VAEConfig.tiny())
        vis_cfg = CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=4,
                                   intermediate_size=64, patch_size=56, image_size=224,
                                   projection_dim=unet_cfg.cross_attention_dim)
        txt_cfg = CLIPTextConfig(vocab_size=1024, hidden_size=unet_cfg.cross_attention_dim,
                                 num_layers=1, num_heads=4, intermediate_size=64,
                                 max_positions=77)
    else:
        remat = bool(cfg.get("gradient_checkpointing", 1))
        # the UNet needs remat in VGL too: it is frozen but IN the grad path
        # (loss -> UNet -> ControlNet residuals), so without checkpointing
        # every UNet activation is retained for backward (reference
        # gradient-checkpoints the UNet in train_csvd as well); bench.py's
        # train_vgl mode does the same
        unet_cfg = UNetConfig(remat=remat)
        cn_cfg = ControlNetConfig(remat=remat and mode == "vgl")
        vae_cfg, vis_cfg, txt_cfg = VAEConfig(), CLIPVisionConfig(), CLIPTextConfig()

    modules = dict(
        vae=AutoencoderKLTemporalDecoder(vae_cfg, dtype=frozen_dtype),
        image_encoder=CLIPVisionModelWithProjection(vis_cfg, dtype=frozen_dtype),
        text_encoder=CLIPTextModel(txt_cfg, dtype=frozen_dtype),
    )
    unet = UNetSpatioTemporalConditionModel(
        unet_cfg, dtype=frozen_dtype if mode == "vgl" else dtype)
    controlnet = ControlNetModel(cn_cfg, dtype=dtype) if mode == "vgl" else None
    return unet, controlnet, modules


def _init_params(module, *shapes, key):
    args = [jnp.zeros(s[0], s[1]) if isinstance(s, tuple) else s for s in shapes]
    # jit the whole init: one XLA program (persistently cacheable) instead of
    # thousands of eager op dispatches — matters a lot on few-core hosts.
    return jax.jit(module.init)(key, *args)


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--mode", choices=["vl", "vgl"], default="vl")
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic instances instead of dataset_path")
    p.add_argument("--tiny", action="store_true", help="tiny model configs (smoke)")
    p.add_argument("--nano", action="store_true",
                   help="2-block nano configs (fastest smoke compile)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--pretrained", default=None,
                   help="dir with HF-layout subfolders (unet/, vae/, ...)")
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--dcn", type=int, default=0,
                   help="outer DCN data axis size for multi-slice meshes; "
                        "0 = auto (process_count when multihost, else 1)")
    p.add_argument("--multihost", action="store_true",
                   help="force jax.distributed.initialize() (also triggered "
                        "by JAX_COORDINATOR_ADDRESS / TTV_MULTIHOST=1)")
    p.add_argument("--devices", type=int, default=None,
                   help="cap the mesh at the first N devices (smoke tests)")
    args = p.parse_args(argv)

    # Honor JAX_PLATFORMS + persistent compile cache (the sandbox
    # sitecustomize clobbers the env var); must run before any
    # backend-initialising call.
    from ..cli.inference import configure_jax_runtime

    configure_jax_runtime()

    # multi-host entry (accelerate-launcher equivalent): must run before the
    # first backend-initialising call so every process sees the global mesh
    if args.multihost:
        os.environ.setdefault("TTV_MULTIHOST", "1")
    multihost = distributed_init()
    is_main = is_main_process()

    cfg = load_config(args.config)
    tcfg = train_config_from_yaml(cfg, args.mode)
    dcfg = data_config_from_yaml(cfg)
    output_dir = cfg.get("output_dir", "checkpoints/run")
    os.makedirs(output_dir, exist_ok=True)
    seed = int(cfg.get("seed", 42))
    key = jr.PRNGKey(seed)

    devices = jax.devices()[: args.devices] if args.devices else None
    dcn = args.dcn or (jax.process_count() if multihost else 1)
    mesh = make_mesh(devices=devices, fsdp=args.fsdp, dcn=dcn)
    # the loader is per-process: it yields the LOCAL shard of the global
    # batch (reference: accelerate's sharded DataLoader, train_svd.py:480);
    # global_batch() assembles the cross-process array at feed time
    global_bs = int(cfg.get("train_batch_size", 1)) * mesh.devices.size
    if global_bs % jax.process_count():
        # not an assert: under `python -O` that would silently floor-divide
        raise ValueError(
            f"global batch {global_bs} not divisible by "
            f"{jax.process_count()} processes")
    batch_size = global_bs // jax.process_count()
    num_iters = args.max_steps or int(cfg.get("num_train_iters", 100_000))

    fdtype = frozen_dtype_from_yaml(cfg)
    unet, controlnet, modules = build_models(
        cfg, args.mode, tiny=args.tiny, nano=args.nano, frozen_dtype=fdtype)
    F, H, W = dcfg.video_seq_length, dcfg.height, dcfg.width
    ctx_dim = unet.config.cross_attention_dim
    seq = 78 if tcfg.use_text else 1

    k1, k2, k3, k4, k5 = jr.split(key, 5)
    if args.pretrained:
        frozen, unet_params, cn_params = weight_loader.load_pretrained(
            args.pretrained, unet, controlnet, modules, mode=args.mode
        )
    else:
        frozen = dict(
            vae=_init_params(modules["vae"], ((1, H, W, 3), jnp.float32),
                             ((1, 1, H // 8, W // 8, 4), jnp.float32), key=k1),
            image_encoder=_init_params(modules["image_encoder"],
                                       ((1, 224, 224, 3), jnp.float32), key=k2),
            text_encoder=_init_params(
                modules["text_encoder"],
                ((1, modules["text_encoder"].config.max_positions), jnp.int32), key=k3),
        )
        unet_params = jax.jit(unet.init)(
            k4, jnp.zeros((1, F, H // 8, W // 8, 8)), jnp.array(0.0),
            jnp.zeros((1, seq, ctx_dim)), jnp.zeros((1, 3)))
        cn_params = None
        if controlnet is not None:
            cn_params = jax.jit(controlnet.init)(
                k5, jnp.zeros((1, F, H // 8, W // 8, 8)), jnp.array(0.0),
                jnp.zeros((1, seq, ctx_dim)), jnp.zeros((1, 3)),
                jnp.zeros((1, F, H // 8, W // 8, 4)))

    tx = trainer.make_optimizer(tcfg)
    if args.mode == "vl":
        state = trainer.init_train_state(unet_params, tx)
        step_fn = trainer.make_vl_train_step(unet, modules, tx, tcfg)
    else:
        frozen = dict(frozen, unet=unet_params)
        state = trainer.init_train_state(cn_params, tx)
        step_fn = trainer.make_vgl_train_step(unet, controlnet, modules, tx, tcfg)

    # resume
    start_step = 0
    if cfg.get("resume_from_checkpoint") == "latest":
        latest = ckpt.latest_checkpoint(output_dir)
        if latest:
            state = ckpt.restore_checkpoint(latest, jax.device_get(state))
            start_step = ckpt.checkpoint_step(latest)
            print(f"resumed from {latest} at step {start_step}")

    # data
    if args.synthetic:
        dataset = SyntheticDataset(dcfg, args.synthetic, gesture=args.mode == "vgl")
    else:
        from transformers import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained(
            cfg.get("pretrained_tokenizer_name_or_path"), subfolder="tokenizer"
        )
        tokenize = lambda s: tok(
            [s], max_length=tok.model_max_length, padding="max_length",
            truncation=True, return_tensors="np",
        ).input_ids[0]
        ds_cls = bridge.VideoThisThatDataset if args.mode == "vgl" else bridge.VideoDataset
        dataset = ds_cls(dcfg, tokenize, seed=seed)
    loader = bridge.PrefetchLoader(
        dataset, batch_size,
        num_workers=int(cfg.get("dataloader_num_workers", 4)), seed=seed,
        shard=(jax.process_index(), jax.process_count()),
    )

    # frozen weights at the mixed_precision dtype (reference .to(fp16),
    # train_svd.py:436-440; in VGL this includes the frozen UNet, :448) —
    # halves the replicated frozen-tower HBM; the trainable state stays fp32
    if fdtype != jnp.float32:
        frozen = jax.tree.map(
            lambda x: x.astype(fdtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            frozen)

    # shard
    state = jax.device_put(state, shard_params(state, mesh))
    # Frozen towers: replicated by default; ``frozen_sharding: fsdp`` splits
    # them over the fsdp axis like ZeRO-3 weights (XLA all-gathers each
    # tensor at its use site). On the full-size VL program the bf16 frozen
    # towers are ~2.1 GiB replicated, so fsdp=2 reclaims ~1.07 GiB/chip —
    # the difference between OOM and fitting a 16 GiB chip (PERF.md, fsdp2
    # row). The reference has no analog: its frozen towers are replicated
    # per GPU (train_svd.py:436-440).
    if str(cfg.get("frozen_sharding", "replicated")) == "fsdp":
        frozen = jax.device_put(frozen, shard_params(frozen, mesh))
    else:
        frozen = jax.device_put(frozen, replicate(frozen, mesh))

    # rank-0 gating for IO (reference: accelerator.is_main_process at
    # train_svd.py:843,879); every process still executes the sharded step
    logger = MetricLogger(
        os.path.join(output_dir, cfg.get("logging_name", "logging"))
    ) if is_main else None
    ckpt_every = int(cfg.get("checkpointing_steps", 3000))
    total_limit = int(cfg.get("checkpoints_total_limit", 15))
    val_every = int(cfg.get("validation_step", 0) or 0)
    val_folder = cfg.get("validation_img_folder")

    def run_validation(step_now, train_params, frozen_host):
        """log_validation equivalent: render val instances from live params.

        ``train_params``/``frozen_host`` must be process-local (host numpy
        under multihost, via ``host_replicated``) — rank 0 renders alone, so
        it must not compute on arrays spanning non-addressable devices."""
        from ..pipelines import (
            StableVideoDiffusionPipeline, StableVideoDiffusionControlNetPipeline,
        )
        from .validation import render_validation

        common_kwargs = dict(
            unet=unet, vae=modules["vae"], image_encoder=modules["image_encoder"],
            text_encoder=modules["text_encoder"],
            vae_params=frozen_host["vae"],
            image_encoder_params=frozen_host["image_encoder"],
            text_encoder_params=frozen_host["text_encoder"],
        )
        if args.mode == "vl":
            pipe = StableVideoDiffusionPipeline(unet_params=train_params, **common_kwargs)
        else:
            pipe = StableVideoDiffusionControlNetPipeline(
                unet_params=frozen_host["unet"], controlnet=controlnet,
                controlnet_params=train_params, **common_kwargs,
            )
        tok = dataset.tokenize if hasattr(dataset, "tokenize") else (
            lambda s: np.zeros((1, 77), np.int32))
        tok2 = lambda s: np.asarray(tok(s)).reshape(1, -1)
        out = render_validation(
            step_now, os.path.join(output_dir, cfg.get("validation_store_folder",
                                                       "validation_results")),
            pipe, val_folder, tok2, mode=args.mode,
            num_frames=dcfg.video_seq_length, height=dcfg.height, width=dcfg.width,
            num_inference_steps=int(cfg.get("num_inference_steps", 25)),
            motion_bucket_id=_motion_or_default(cfg),
        )
        print(f"step {step_now}: rendered {len(out)} validation instances")

    step = start_step
    nonfinite_reads = 0
    t0 = time.perf_counter()
    print(f"training {args.mode} on mesh {dict(mesh.shape)}, "
          f"global batch {global_bs} ({batch_size}/process)")
    with mesh:
        while step < num_iters:
            for batch in loader:
                if step >= num_iters:
                    break
                # single-host: plain sharded device_put; multihost: assemble
                # the global array from every process's local shard (feeding
                # the LOCAL batch through shard_batch was the round-2
                # multi-host bug — replicated spec, rank 0's data only)
                batch = global_batch(batch, mesh)
                state, m = step_fn(state, frozen, batch, jr.fold_in(key, step))
                step += 1
                if step % 10 == 0 or step == 1:
                    loss = float(m["loss"])
                    if logger is not None:
                        logger.log(step, loss=loss,
                                   grad_norm=float(m["grad_norm"]))
                    # failure detection (beyond the reference, SURVEY §5):
                    # a diverged run burns accelerator-hours silently — abort
                    # once loss stays non-finite.  The loss is replicated, so
                    # every rank takes the same branch (no multihost hang).
                    if not np.isfinite(loss):
                        nonfinite_reads += 1
                        if nonfinite_reads >= 3:
                            raise RuntimeError(
                                f"loss non-finite for {nonfinite_reads} "
                                f"consecutive reads (step {step}); aborting. "
                                f"Resume from the last checkpoint with a "
                                f"lower learning rate or grad clip.")
                    else:
                        nonfinite_reads = 0
                # host_replicated and save_checkpoint are collectives under
                # multihost: ALL ranks reach them (a rank-0-only device_get
                # of fsdp-sharded state raises on non-addressable shards;
                # rank-0-only orbax saves / jits deadlock on their internal
                # barriers).  Only rendering + prints are rank-0 gated.
                if step % ckpt_every == 0:
                    host_state = host_replicated(state)
                    path = ckpt.save_checkpoint(
                        output_dir, step, host_state, total_limit)
                    if is_main:
                        print(f"step {step}: saved {path} "
                              f"({time.perf_counter() - t0:.1f}s elapsed)")
                if val_every and val_folder and step % val_every == 0:
                    host_tp, host_frozen = host_replicated((state.params, frozen))
                    if is_main:
                        run_validation(step, host_tp, host_frozen)
    host_state = host_replicated(state)
    path = ckpt.save_checkpoint(output_dir, step, host_state, total_limit)
    if is_main:
        print(f"done at step {step}; final checkpoint {path}")
    if logger is not None:
        logger.close()


if __name__ == "__main__":
    main()
