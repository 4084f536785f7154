"""Freeze torch-oracle outputs as golden .npz fixtures (PARITY.md).

Run from the repo root:  python tests/make_goldens.py

Fixed torch seeds + fixed inputs -> bit-reproducible oracle outputs. The
goldens serve two purposes (tests/test_goldens.py):
  (a) oracle-drift tripwire — any edit to tests/torch_oracle.py that changes
      numerics fails against the pinned outputs;
  (b) flax parity without torch in the loop — the flax models must match the
      pinned outputs through weights/convert.py.
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from torch_oracle import UNetOracle, ControlNetOracle, VAEOracle  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

B, F, H, W = 2, 3, 16, 24


def _np_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _unet_inputs(seed=0):
    rng = np.random.RandomState(seed)
    sample = rng.randn(B, F, 8, H, W).astype(np.float32)
    ctx = rng.randn(B, 5, 48).astype(np.float32)
    add_ids = np.array([[6.0, 200.0, 0.1], [6.0, 180.0, 0.05]], np.float32)
    t = np.float32(1.637)
    return sample, ctx, add_ids, t


def make_unet():
    torch.manual_seed(0)
    oracle = UNetOracle().eval()
    sample, ctx, add_ids, t = _unet_inputs(0)
    with torch.no_grad():
        out = oracle(torch.tensor(sample), torch.tensor(t), torch.tensor(ctx),
                     torch.tensor(add_ids)).numpy()
    state = _np_state(oracle)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "unet_tiny.npz"),
        sample=sample, ctx=ctx, add_ids=add_ids, t=t, out=out,
        **{"sd." + k: v for k, v in state.items()},
    )
    return out


def make_controlnet():
    torch.manual_seed(1)
    oracle = ControlNetOracle().eval()
    sample, ctx, add_ids, t = _unet_inputs(1)
    cond = np.random.RandomState(2).randn(B, F, 4, H, W).astype(np.float32)
    with torch.no_grad():
        res, mid = oracle(torch.tensor(sample), torch.tensor(t), torch.tensor(ctx),
                          torch.tensor(add_ids), torch.tensor(cond), scale=0.7)
    state = _np_state(oracle)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "controlnet_tiny.npz"),
        sample=sample, ctx=ctx, add_ids=add_ids, t=t, cond=cond,
        mid=mid.numpy(),
        **{f"res.{i}": r.numpy() for i, r in enumerate(res)},
        **{"sd." + k: v for k, v in state.items()},
    )


def make_vae():
    torch.manual_seed(0)
    oracle = VAEOracle().eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 48).astype(np.float32)
    z = np.random.RandomState(1).randn(3, 4, 4, 6).astype(np.float32)
    with torch.no_grad():
        lat = oracle.encode_mode(torch.tensor(x)).numpy()
        dec = oracle.decoder(torch.tensor(z), num_frames=3).numpy()
    state = _np_state(oracle)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "vae_tiny.npz"),
        x=x, z=z, lat=lat, dec=dec,
        **{"sd." + k: v for k, v in state.items()},
    )


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    make_unet()
    make_controlnet()
    make_vae()
    sizes = {f: os.path.getsize(os.path.join(GOLDEN_DIR, f)) // 1024
             for f in sorted(os.listdir(GOLDEN_DIR))}
    print("goldens written:", sizes, "KiB")
