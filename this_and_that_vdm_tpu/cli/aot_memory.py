"""AOT memory analysis of the FULL-SIZE sharded VL train step (VERDICT #1b).

Lowers and compiles the real-config (320-1280ch, 1.5B-param) VL training
step over a virtual n-device CPU mesh with abstract (ShapeDtypeStruct)
inputs — no 6 GB arrays are ever materialised — and reports the compiled
executable's per-device memory analysis for each fsdp degree.  This turns
PERF.md's "VL full-finetune needs fsdp>=2 on 16 GB chips" from a claim into
a reproducible artifact:

    python -m this_and_that_vdm_tpu.cli.aot_memory --fsdp 2,4,8

Reference analog: the 4-GPU DDP footprint of train_code/train_svd.py
(params+grads+Adam moments replicated per rank; OOM-avoided there only by
8-bit Adam + fp16 frozen towers).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _abstract_like(tree, shardings):
    import jax

    return jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        tree, shardings,
    )


def vl_step_memory_analysis(fsdp: int, n_devices: int = 8,
                            batch_per_device: int = 1,
                            frames: int = 14, height: int = 256, width: int = 384,
                            tiny: bool = False, topology: str = "") -> dict:
    """Compile (AOT, abstract inputs) the sharded VL step; return memory stats.

    ``topology`` (e.g. ``"v5e:2x4"``): compile against a real TPU topology
    description (jax.experimental.topologies) — per-chip numbers with the
    actual TPU backend's scheduling/rematerialisation, no chips needed.
    Empty: virtual CPU devices (must then run in a fresh process before any
    backend init; CPU scheduling over-reports temps, see PERF.md).
    """
    import jax

    if not topology:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", n_devices)
        except RuntimeError:
            pass
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ttv_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if not topology and jax.device_count() < n_devices:
        raise RuntimeError("backend initialised before the CPU override; "
                           "run in a fresh process")

    import jax.numpy as jnp
    import jax.random as jr

    if topology:
        # Topology-AOT (no live backend) cannot emit the flash-attention
        # custom call's partitioner ("Custom emitter for
        # CustomSPMDPartitioning not found"); use the XLA einsum path.
        # Memory-representative: flash saves VMEM (scores never hit HBM),
        # so the XLA path's HBM numbers upper-bound the flash build.
        from ..ops import attention as _attention

        _attention.set_backend("xla")

    from ..models.unet import UNetSpatioTemporalConditionModel, UNetConfig
    from ..models.vae import AutoencoderKLTemporalDecoder, VAEConfig
    from ..models.clip import (
        CLIPTextModel, CLIPTextConfig, CLIPVisionModelWithProjection,
        CLIPVisionConfig,
    )
    from ..training import trainer
    from ..parallel import make_mesh, shard_params, shard_batch, replicate

    B = n_devices * batch_per_device
    F, H, W = frames, height, width
    if tiny:
        ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        vis_cfg = CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=4,
                                   intermediate_size=64, patch_size=56,
                                   image_size=224, projection_dim=48)
        txt_cfg = CLIPTextConfig(vocab_size=64, hidden_size=48, num_layers=1,
                                 num_heads=4, intermediate_size=64,
                                 max_positions=16)
        seq = 16
    else:
        ucfg, vcfg = UNetConfig(remat=True), VAEConfig()
        # frozen towers at their real sizes (CLIP ViT-H/14 vision, 1024-d text)
        vis_cfg = CLIPVisionConfig()
        txt_cfg = CLIPTextConfig()
        seq = txt_cfg.max_positions

    unet = UNetSpatioTemporalConditionModel(ucfg)
    modules = dict(
        vae=AutoencoderKLTemporalDecoder(vcfg),
        image_encoder=CLIPVisionModelWithProjection(vis_cfg),
        text_encoder=CLIPTextModel(txt_cfg),
    )

    if topology:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu", topology_name=topology)
        topo_devices = list(topo.devices)
        if len(topo_devices) < n_devices:
            raise RuntimeError(f"topology {topology} has {len(topo_devices)} devices")
        mesh = make_mesh(topo_devices[:n_devices], dp=n_devices // fsdp, fsdp=fsdp)
    else:
        mesh = make_mesh(jax.devices()[:n_devices], dp=n_devices // fsdp, fsdp=fsdp)
    cfg = trainer.TrainConfig(learning_rate=1e-5, lr_warmup_steps=0)
    tx = trainer.make_optimizer(cfg)

    lat_h, lat_w = H // 8, W // 8
    params_abs = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((B, F, lat_h, lat_w, 8)),
                            jnp.zeros(()), jnp.zeros((B, 78, ucfg.cross_attention_dim)),
                            jnp.zeros((B, 3))),
        jr.PRNGKey(0),
    )
    state_abs = jax.eval_shape(lambda p: trainer.init_train_state(p, tx), params_abs)
    frozen_abs = jax.eval_shape(
        lambda k: dict(
            vae=modules["vae"].init(k, jnp.zeros((1, H, W, 3)),
                                    jnp.zeros((1, 1, lat_h, lat_w, 4))),
            image_encoder=modules["image_encoder"].init(
                k, jnp.zeros((1, 224, 224, 3))),
            text_encoder=modules["text_encoder"].init(
                k, jnp.zeros((1, seq), jnp.int32)),
        ),
        jr.PRNGKey(1),
    )
    batch_abs = dict(
        video_frames=jax.ShapeDtypeStruct((B, F, H, W, 3), jnp.float32),
        prompt_ids=jax.ShapeDtypeStruct((B, seq), jnp.int32),
        motion_bucket_id=jax.ShapeDtypeStruct((B,), jnp.float32),
    )

    state_abs = _abstract_like(state_abs, shard_params(state_abs, mesh))
    frozen_abs = _abstract_like(frozen_abs, replicate(frozen_abs, mesh))
    batch_abs = _abstract_like(batch_abs, shard_batch(batch_abs, mesh))
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)

    step = trainer.make_vl_train_step(unet, modules, tx, cfg)
    with mesh:
        lowered = step.lower(state_abs, frozen_abs, batch_abs, key_abs)
        compiled = lowered.compile()
    mem = compiled.memory_analysis()

    n_params = sum(
        int(__import__("numpy").prod(l.shape))
        for l in jax.tree.leaves(params_abs)
    )
    gib = 1024**3
    out = dict(
        backend=topology or "cpu-virtual",
        fsdp=fsdp, dp=n_devices // fsdp, n_devices=n_devices,
        batch=B, frames=F, resolution=f"{H}x{W}",
        unet_params=n_params,
        argument_gib=round(mem.argument_size_in_bytes / gib, 3),
        output_gib=round(mem.output_size_in_bytes / gib, 3),
        temp_gib=round(mem.temp_size_in_bytes / gib, 3),
        alias_gib=round(mem.alias_size_in_bytes / gib, 3),
        # donated state aliases outputs, so live peak ~ args + temps
        peak_est_gib=round(
            (mem.argument_size_in_bytes + mem.temp_size_in_bytes) / gib, 3),
    )
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fsdp", default="2,4,8")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--frames", type=int, default=14)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--topology", default="",
                   help="TPU topology description, e.g. v5e:2x4 (per-chip "
                        "numbers with real TPU scheduling; no chips needed)")
    args = p.parse_args(argv)

    results = []
    for fsdp in [int(x) for x in args.fsdp.split(",")]:
        # each degree in a fresh subprocess: the device count is fixed at
        # backend init, and compiles are independent anyway
        if len(args.fsdp.split(",")) > 1:
            import subprocess

            cmd = [sys.executable, "-m", "this_and_that_vdm_tpu.cli.aot_memory",
                   "--fsdp", str(fsdp), "--devices", str(args.devices),
                   "--frames", str(args.frames), "--height", str(args.height),
                   "--width", str(args.width)] + (["--tiny"] if args.tiny else []) \
                  + (["--topology", args.topology] if args.topology else [])
            out = subprocess.run(cmd, capture_output=True, text=True)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
                raise RuntimeError(f"fsdp={fsdp} failed")
            results.append(json.loads(line[-1]))
            print(line[-1])
        else:
            r = vl_step_memory_analysis(
                fsdp, args.devices, tiny=args.tiny, frames=args.frames,
                height=args.height, width=args.width, topology=args.topology)
            results.append(r)
            print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()
