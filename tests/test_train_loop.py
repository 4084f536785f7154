"""End-to-end train-loop smoke (tiny models, synthetic data) + checkpoint
rotation/resume + safetensors round-trip."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from this_and_that_vdm_tpu.training import checkpoint as ckpt
from this_and_that_vdm_tpu.training import train_loop, trainer


def _write_cfg(tmp_path, **over):
    cfg = dict(
        video_seq_length=3, height=64, width=128, train_batch_size=1,
        num_train_iters=3, checkpointing_steps=2, checkpoints_total_limit=2,
        learning_rate=1e-4, lr_warmup_steps=0, seed=42,
        output_dir=str(tmp_path / "out"), use_text=True, motion_bucket_id=200,
    )
    cfg.update(over)
    p = tmp_path / "cfg.yaml"
    import yaml

    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_vl_train_loop_smoke_and_resume(tmp_path):
    cfgp = _write_cfg(tmp_path)
    train_loop.main(["--config", cfgp, "--mode", "vl", "--nano", "--synthetic", "4", "--devices", "1"])
    out = str(tmp_path / "out")
    # 3 steps, ckpt at 2 and final at 3; limit 2
    names = sorted(os.listdir(out))
    assert "checkpoint-2" in names and "checkpoint-3" in names
    metrics = [
        json.loads(l)
        for l in open(os.path.join(out, "logging", "metrics.jsonl"))
    ]
    assert any(np.isfinite(m["loss"]) for m in metrics)

    # resume: bump iters, latest picked up
    cfgp2 = _write_cfg(tmp_path, num_train_iters=4, resume_from_checkpoint="latest")
    train_loop.main(["--config", cfgp2, "--mode", "vl", "--nano", "--synthetic", "4", "--devices", "1"])
    assert "checkpoint-4" in os.listdir(out)


def test_vgl_train_loop_smoke(tmp_path):
    cfgp = _write_cfg(tmp_path, num_train_iters=1, checkpointing_steps=10)
    train_loop.main(["--config", cfgp, "--mode", "vgl", "--nano", "--synthetic", "2", "--devices", "1"])
    assert "checkpoint-1" in os.listdir(str(tmp_path / "out"))


def test_checkpoint_rotation(tmp_path):
    state = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    for step in [1, 2, 3]:
        ckpt.save_checkpoint(str(tmp_path), step, state, total_limit=2)
    names = sorted(os.listdir(tmp_path))
    assert names == ["checkpoint-2", "checkpoint-3"]
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest.endswith("checkpoint-3")
    restored = ckpt.restore_checkpoint(latest, jax.device_get(state))
    assert np.allclose(restored["b"]["c"], 1.0)


def test_safetensors_roundtrip(tmp_path):
    import safetensors.numpy as stnp
    from this_and_that_vdm_tpu.weights.convert import (
        load_safetensors, torch_state_dict_to_flax,
    )

    state = {
        "down_blocks.0.resnets.1.spatial_res_block.conv1.weight":
            np.random.randn(8, 4, 3, 3).astype(np.float32),
        "mid_block.attentions.0.transformer_blocks.0.attn1.to_out.0.bias":
            np.random.randn(8).astype(np.float32),
        "down_blocks.0.resnets.0.time_mixer.mix_factor": np.array([0.5], np.float32),
    }
    f = str(tmp_path / "model.safetensors")
    stnp.save_file(state, f)
    loaded = load_safetensors(f)
    assert set(loaded) == set(state)
    tree = torch_state_dict_to_flax(loaded)
    p = tree["params"]
    assert p["down_blocks_0"]["resnets_1"]["spatial_res_block"]["conv1"]["kernel"].shape == (3, 3, 4, 8)
    assert p["mid_block"]["attentions_0"]["transformer_blocks_0"]["attn1"]["to_out"]["bias"].shape == (8,)
    assert p["down_blocks_0"]["resnets_0"]["time_mixer"]["mix_factor"].shape == (1,)
