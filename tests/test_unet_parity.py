"""UNet/GestureNet parity: flax models + weight converter vs torch oracle.

Randomly initialise the torch oracle (exact HF state-dict naming), convert
through weights/convert.py, and require the flax forward to match on
batch=2 (exercising the CFG-pair hw-major time-context quirk).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from this_and_that_vdm_tpu.models.unet import UNetSpatioTemporalConditionModel, UNetConfig
from this_and_that_vdm_tpu.models.controlnet import ControlNetModel, ControlNetConfig
from this_and_that_vdm_tpu.weights.convert import (
    torch_state_dict_to_flax,
    controlnet_params_from_unet,
)
from torch_oracle import UNetOracle, ControlNetOracle

B, F, H, W = 2, 3, 16, 24


def _np_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _tree_paths(v, prefix + (k,))
        else:
            out.add(prefix + (k, v.shape))
    return out


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(0)
    oracle = UNetOracle().eval()
    params = torch_state_dict_to_flax(_np_state(oracle))
    return oracle, params


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    sample = rng.randn(B, F, 8, H, W).astype(np.float32)
    ctx = rng.randn(B, 5, 48).astype(np.float32)
    add_ids = np.array([[6.0, 200.0, 0.1], [6.0, 180.0, 0.05]], np.float32)
    t = np.float32(1.637)
    return sample, ctx, add_ids, t


def test_converted_tree_matches_init_tree(oracle_and_params):
    _, params = oracle_and_params
    model = UNetSpatioTemporalConditionModel(UNetConfig.tiny())
    sample, ctx, add_ids, t = _inputs()
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sample.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(t),
        jnp.asarray(ctx),
        jnp.asarray(add_ids),
    )
    a, b = _tree_paths(init["params"]), _tree_paths(params["params"])
    assert a == b, f"only-in-init: {sorted(a - b)[:5]}  only-in-converted: {sorted(b - a)[:5]}"


def test_unet_forward_parity(oracle_and_params):
    oracle, params = oracle_and_params
    sample, ctx, add_ids, t = _inputs()
    with torch.no_grad():
        expected = oracle(
            torch.tensor(sample), torch.tensor(t), torch.tensor(ctx), torch.tensor(add_ids)
        ).numpy()

    model = UNetSpatioTemporalConditionModel(UNetConfig.tiny())
    got = model.apply(
        params,
        jnp.asarray(sample.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(t),
        jnp.asarray(ctx),
        jnp.asarray(add_ids),
    )
    got = np.asarray(got).transpose(0, 1, 4, 2, 3)
    assert np.allclose(got, expected, atol=5e-5), np.abs(got - expected).max()


def test_controlnet_forward_parity_and_residual_injection(oracle_and_params):
    unet_oracle, unet_params = oracle_and_params
    torch.manual_seed(1)
    cn_oracle = ControlNetOracle().eval()
    cn_params = torch_state_dict_to_flax(_np_state(cn_oracle))

    sample, ctx, add_ids, t = _inputs(1)
    rng = np.random.RandomState(2)
    cond = rng.randn(B, F, 4, H, W).astype(np.float32)

    with torch.no_grad():
        res_t, mid_t = cn_oracle(
            torch.tensor(sample), torch.tensor(t), torch.tensor(ctx),
            torch.tensor(add_ids), torch.tensor(cond), scale=0.7,
        )
        out_t = unet_oracle(
            torch.tensor(sample), torch.tensor(t), torch.tensor(ctx), torch.tensor(add_ids),
            down_extra=res_t, mid_extra=mid_t,
        ).numpy()

    cn = ControlNetModel(ControlNetConfig.tiny())
    res_j, mid_j = cn.apply(
        cn_params,
        jnp.asarray(sample.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(t),
        jnp.asarray(ctx),
        jnp.asarray(add_ids),
        jnp.asarray(cond.transpose(0, 1, 3, 4, 2)),
        conditioning_scale=0.7,
    )
    def _flat(x):  # [B,F,H,W,C] -> [B*F,C,H,W] (oracle keeps frames flattened)
        a = np.asarray(x).transpose(0, 1, 4, 2, 3)
        return a.reshape(-1, *a.shape[2:])

    assert len(res_j) == len(res_t)
    for rj, rt in zip(res_j, res_t):
        assert np.allclose(_flat(rj), rt.numpy(), atol=5e-5)
    assert np.allclose(_flat(mid_j), mid_t.numpy(), atol=5e-5)

    model = UNetSpatioTemporalConditionModel(UNetConfig.tiny())
    out_j = model.apply(
        unet_params,
        jnp.asarray(sample.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(t),
        jnp.asarray(ctx),
        jnp.asarray(add_ids),
        down_block_additional_residuals=res_j,
        mid_block_additional_residual=mid_j,
    )
    out_j = np.asarray(out_j).transpose(0, 1, 4, 2, 3)
    assert np.allclose(out_j, out_t, atol=1e-4), np.abs(out_j - out_t).max()


def test_controlnet_from_unet_seeding(oracle_and_params):
    _, unet_params = oracle_and_params
    cn = ControlNetModel(ControlNetConfig.tiny())
    sample, ctx, add_ids, t = _inputs()
    cond = np.zeros((B, F, 4, H, W), np.float32)
    init = cn.init(
        jax.random.PRNGKey(3),
        jnp.asarray(sample.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(t),
        jnp.asarray(ctx),
        jnp.asarray(add_ids),
        jnp.asarray(cond.transpose(0, 1, 3, 4, 2)),
    )
    seeded = controlnet_params_from_unet(unet_params, init)
    # down/mid/time embeddings copied from unet; zero convs untouched (zero)
    chex_equal = jax.tree_util.tree_all(
        jax.tree.map(
            lambda a, b: bool(np.array_equal(a, b)),
            seeded["params"]["mid_block"],
            unet_params["params"]["mid_block"],
        )
    )
    assert chex_equal
    assert np.array_equal(
        seeded["params"]["time_embedding"]["linear_1"]["kernel"],
        unet_params["params"]["time_embedding"]["linear_1"]["kernel"],
    )
    assert (seeded["params"]["controlnet_mid_block"]["kernel"] == 0).all()
    # add_embedding stays at its FRESH init: the reference from_unet
    # (temporal_controlnet.py:331-337) does NOT copy it (round-2 review)
    assert not np.array_equal(
        seeded["params"]["add_embedding"]["linear_1"]["kernel"],
        unet_params["params"]["add_embedding"]["linear_1"]["kernel"],
    )
    assert np.array_equal(
        seeded["params"]["add_embedding"]["linear_1"]["kernel"],
        init["params"]["add_embedding"]["linear_1"]["kernel"],
    )
