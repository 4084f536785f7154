"""Orbax checkpoint/resume with rotation.

TPU-native equivalent of the reference's ``accelerator.save_state`` +
diffusers-subfolder hooks (train_code/train_svd.py:445-470, :599-627):
checkpoints live under ``<output_dir>/checkpoint-<step>/`` holding the
trainable params, optimizer state and step; ``resume latest`` picks the
newest step; ``checkpoints_total_limit`` rotates old ones away.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dirs(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    out = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(output_dir, name)))
    return sorted(out)


def save_checkpoint(
    output_dir: str, step: int, state: Any, total_limit: Optional[int] = 15
) -> str:
    """Write ``checkpoint-<step>``.  Multihost: orbax's checkpointer is
    itself collective (it runs sync_global_devices barriers), so EVERY
    process must call this — rank-0-only calls deadlock.  Only the
    filesystem rotation is rank-0 gated."""
    path = os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if total_limit and jax.process_index() == 0:
        existing = _ckpt_dirs(output_dir)
        while len(existing) > total_limit:
            _, oldest = existing.pop(0)
            shutil.rmtree(oldest, ignore_errors=True)
    return path


def latest_checkpoint(output_dir: str) -> Optional[str]:
    dirs = _ckpt_dirs(output_dir)
    return dirs[-1][1] if dirs else None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure/shardings of ``target`` (an abstract or
    concrete TrainState pytree)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def checkpoint_step(path: str) -> int:
    m = re.search(r"checkpoint-(\d+)", path)
    return int(m.group(1)) if m else 0
