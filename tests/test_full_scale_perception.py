"""Full-scale WIRING parity for the native perception models (slow).

test_full_scale.py proves numerics at the real SVD configs; these tests
prove the perception models (SAM vit_b/l/h, YOLOv8 n/s/m) at their real
scales without allocating gigabytes: the torch oracle is built on the
``meta`` device (shapes only), its state dict flows through the converter
as zero-stride broadcast views (transposes of views are views — no
copies), and the resulting pytree must match the flax model's
``jax.eval_shape`` param tree leaf-for-leaf.  Catches channel-math,
depth, head-width and converter-coverage errors at full scale — the class
of bug tiny-config numerics cannot see (VERDICT r1 #1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from this_and_that_vdm_tpu.models.sam import Sam, SamConfig
from this_and_that_vdm_tpu.models.yolov8 import YOLOv8, YOLOv8Config
from this_and_that_vdm_tpu.weights.convert import (
    sam_state_dict_to_flax, yolo_state_dict_to_flax,
)
import sam_oracle
import yolo_oracle
from test_sam import _OCfg

pytestmark = pytest.mark.slow


def _shape_state(module):
    """state_dict -> {key: zero-stride numpy view of the right shape}."""
    out = {}
    for k, v in module.state_dict().items():
        out[k] = np.broadcast_to(np.float32(0.0), tuple(v.shape))
    return out


def _leaf_shapes(tree, prefix=()):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _leaf_shapes(tree[k], prefix + (k,))
    else:
        yield prefix, tuple(np.shape(tree))


def _assert_same_tree(converted, flax_shapes):
    got = dict(_leaf_shapes(converted))
    want = dict(_leaf_shapes(flax_shapes))
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"converter missing {len(missing)}: {missing[:5]}"
    assert not extra, f"converter extra {len(extra)}: {extra[:5]}"
    bad = [(p, got[p], want[p]) for p in want if got[p] != want[p]]
    assert not bad, f"shape mismatches: {bad[:5]}"


@pytest.mark.parametrize("variant", ["vit_b", "vit_l", "vit_h"])
def test_sam_full_scale_wiring(variant):
    cfg = getattr(SamConfig, variant)()
    with torch.device("meta"):
        oracle = sam_oracle.Sam(_OCfg(cfg))
    converted = sam_state_dict_to_flax(_shape_state(oracle))

    model = Sam(cfg)
    g = cfg.grid_size

    # init through a mask-prompted predict so the (lazily created)
    # mask-downscaling branch materialises in the tree too
    def init_all(key, pixels, pts, lbl, mask):
        def run(m):
            emb = m.encode_image(pixels)
            return m.predict(emb, pts, lbl, mask_input=mask)

        return model.init(key, method=run)

    shapes = jax.eval_shape(
        init_all, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
        jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32),
        jnp.zeros((1, 4 * g, 4 * g, 1)))
    _assert_same_tree(converted, shapes)


@pytest.mark.parametrize("scale", ["n_scale", "s_scale", "m_scale"])
def test_yolo_full_scale_wiring(scale):
    cfg = getattr(YOLOv8Config, scale)(nc=1)
    with torch.device("meta"):
        oracle = yolo_oracle.DetectionModel(cfg)
    sd = _shape_state(oracle)
    converted = yolo_state_dict_to_flax(sd)

    # the weight-shape config sniffer must reconstruct the scale exactly
    got = YOLOv8Config.from_state_dict(sd)
    for base in (64, 128, 256, 512, 1024):
        assert got.ch(base) == cfg.ch(base), (scale, base)
    for base in (3, 6):
        assert got.n(base) == cfg.n(base)

    model = YOLOv8(cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)))
    _assert_same_tree(converted, shapes)


def test_raft_full_scale_wiring():
    from this_and_that_vdm_tpu.models.raft import RAFT, RAFTConfig
    from this_and_that_vdm_tpu.weights.convert import raft_state_dict_to_flax
    import raft_oracle

    cfg = RAFTConfig.large()
    with torch.device("meta"):
        oracle = raft_oracle.RAFT(cfg)
    sd = _shape_state(oracle)
    converted = raft_state_dict_to_flax(sd)

    # the shape sniffer must reconstruct the checkpoint config exactly
    assert RAFTConfig.from_state_dict(sd) == cfg

    model = RAFT(cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 96, 3)), jnp.zeros((1, 64, 96, 3)))
    _assert_same_tree(converted, shapes)
