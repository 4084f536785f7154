"""Data pipeline tests against the reference's fixture instances and a
synthetic Bridge-layout directory."""

import os
import shutil

import numpy as np
import cv2
import pytest

from this_and_that_vdm_tpu.data import bridge, rasterize

FIXTURES = "/root/reference/__assets__/Bridge_example"


def test_subsample_indices_matches_reference_gap_algorithm():
    # N=30, F=14: division=2, remain=1 -> gaps [3,2,...,2], last index 27
    idx = bridge.subsample_indices(30, 14)
    assert len(idx) == 14 and idx[0] == 0
    assert idx == [0, 3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23, 25, 27]
    # N=56 (4x tolerance): division=4, remain=-1 -> uniform gaps of 4
    idx = bridge.subsample_indices(56, 14)
    assert idx == list(range(0, 53, 4))
    # N=14: identity
    assert bridge.subsample_indices(14, 14) == list(range(14))


def test_bivariate_gaussian_normalised_and_centered():
    k = rasterize.bivariate_gaussian(99, 10.0)
    assert k.shape == (99, 99)
    assert np.isclose(k.sum(), 1.0)
    assert k[49, 49] == k.max()  # centered at index 49 for the reference grid


@pytest.mark.parametrize("task", ["Task1_v1_511", "Task2_v2_164"])
def test_rasterize_fixture_instances(task):
    cond, motion, idxs, coords = rasterize.load_condition(
        os.path.join(FIXTURES, task), (256, 384), 14
    )
    assert cond.shape == (14, 256, 384, 3)
    assert motion == 200
    assert 1 <= len(idxs) <= 2
    # gesture frames: blurred white canvas ~1 away from the blob, with a
    # clear colored dip at the point; non-gesture frames all-zero
    for i in range(14):
        if i in idxs:
            assert cond[i].max() > 0.9
            assert cond[i].min() < 0.9  # colored blob present
        else:
            assert cond[i].max() == 0.0


def test_video_dataset_on_synthetic_instances(tmp_path):
    root = tmp_path / "bridge"
    for vid in range(3):
        d = root / f"{vid:06d}"
        os.makedirs(d)
        n = 14 + vid * 7
        for i in range(n):
            img = np.full((48, 64, 3), (vid * 30 + i) % 255, np.uint8)
            cv2.imwrite(str(d / f"im_{i}.jpg"), img)
        (d / "lang.txt").write_text("put the spoon on the towel\n")
        (d / "data.txt").write_text("0 20 12\n7 40 30\n")

    cfg = bridge.DataConfig(
        dataset_path=[str(root)], height=32, width=48, video_seq_length=14
    )
    tokenize = lambda s: np.full((16,), len(s) % 7, np.int32)
    ds = bridge.VideoDataset(cfg, tokenize)
    assert len(ds) == 3
    item = ds[0]
    assert item["video_frames"].shape == (14, 32, 48, 3)
    assert item["video_frames"].min() >= -1.0 and item["video_frames"].max() <= 1.0
    assert item["motion_bucket_id"] == 200

    tt = bridge.VideoThisThatDataset(cfg, tokenize)
    item = tt[1]
    assert item["condition"].shape == (14, 32, 48, 3)
    assert set(item["controlnet_image_index"].tolist()) == {0, 7}

    loader = bridge.PrefetchLoader(tt, batch_size=2, num_workers=2)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["video_frames"].shape == (2, 14, 32, 48, 3)
    assert batches[0]["condition"].shape == (2, 14, 32, 48, 3)


def test_flip_suppressed_for_directional_prompts(tmp_path):
    d = tmp_path / "v" / "000000"
    os.makedirs(d)
    for i in range(14):
        cv2.imwrite(str(d / f"im_{i}.jpg"), np.zeros((8, 8, 3), np.uint8))
    (d / "lang.txt").write_text("move the cup to the left\n")
    cfg = bridge.DataConfig(
        dataset_path=[str(tmp_path / "v")], height=8, width=8, flip_aug_prob=1.0
    )
    ds = bridge.VideoDataset(cfg, lambda s: np.zeros((4,), np.int32))
    import random as _random
    assert ds._flip("move the cup to the left", _random.Random(0)) is False
    assert ds._flip("move the cup onto the towel", _random.Random(0)) is True


class _IndexDataset:
    """Minimal dataset: item carries its own index, for order tests."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray([i], np.int64)}


def _batch_order(loader):
    return [tuple(int(x) for x in b["idx"][:, 0]) for b in loader]


def test_prefetch_loader_reshuffles_per_epoch_and_is_deterministic():
    ds = _IndexDataset(32)
    loader = bridge.PrefetchLoader(ds, batch_size=4, num_workers=3, seed=7)
    epoch0 = _batch_order(loader)
    epoch1 = _batch_order(loader)
    assert len(epoch0) == len(epoch1) == 8
    # per-epoch reshuffle (the reference torch DataLoader reshuffles each
    # epoch; round-1 bug: identical permutation every epoch)
    assert epoch0 != epoch1
    # same seed => identical sequence run-to-run, independent of worker
    # thread scheduling (reorder buffer yields in permutation order)
    loader2 = bridge.PrefetchLoader(ds, batch_size=4, num_workers=3, seed=7)
    assert _batch_order(loader2) == epoch0
    loader1w = bridge.PrefetchLoader(ds, batch_size=4, num_workers=1, seed=7)
    assert _batch_order(loader1w) == epoch0


def test_prefetch_loader_raises_when_ranks_starve():
    """Regression (ADVICE r3): fewer full batches than world ranks would
    leave every rank zero batches and spin train_loop's epoch-for forever;
    must raise instead."""
    ds = _IndexDataset(3)
    loader = bridge.PrefetchLoader(ds, batch_size=2, num_workers=1,
                                   seed=0, shard=(0, 4))
    with pytest.raises(ValueError, match="zero batches"):
        next(iter(loader))


def _mk_instances(root, n_inst=6, asym=True):
    for k in range(n_inst):
        d = root / f"{k:06d}"
        os.makedirs(d)
        for i in range(14):
            img = np.zeros((8, 8, 3), np.uint8)
            if asym:
                img[:, :4] = 30 + 10 * k  # left/right asymmetric: flips visible
            cv2.imwrite(str(d / f"im_{i}.jpg"), img)
        (d / "lang.txt").write_text(f"move object {k}\n")


def test_multiworker_augmentation_deterministic(tmp_path):
    """Augmentation draws are (seed, epoch, index)-pure: two runs with the
    same seeds produce identical batch CONTENTS (incl. flips) regardless of
    worker-thread scheduling (round-2 review: a shared RNG stream made
    flips scheduling-dependent)."""
    _mk_instances(tmp_path / "v")
    cfg = bridge.DataConfig(dataset_path=[str(tmp_path / "v")], height=8,
                            width=8, flip_aug_prob=0.5)

    def run():
        ds = bridge.VideoDataset(cfg, lambda s: np.zeros((4,), np.int32), seed=3)
        loader = bridge.PrefetchLoader(ds, batch_size=2, num_workers=4, seed=5)
        return [np.asarray(b["video_frames"]) for b in loader]

    a, b = run(), run()
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_worker_error_propagates_not_hangs(tmp_path):
    """A failing dataset item must raise in the consumer (the torch
    DataLoader contract), not leave the loader blocked forever on a dead
    worker (round-2 review)."""
    _mk_instances(tmp_path / "v", n_inst=4, asym=False)
    cfg = bridge.DataConfig(dataset_path=[str(tmp_path / "v")], height=8, width=8)
    ds = bridge.VideoDataset(cfg, lambda s: np.zeros((4,), np.int32))
    # corrupt one image AFTER the validity scan
    (tmp_path / "v" / "000002" / "im_3.jpg").write_bytes(b"not a jpeg")
    loader = bridge.PrefetchLoader(ds, batch_size=1, num_workers=2, seed=0)
    with pytest.raises(RuntimeError, match="worker failed"):
        for _ in loader:
            pass


def test_loader_early_break_releases_workers(tmp_path):
    """Abandoning the iterator mid-epoch unwinds the worker threads (no
    decoded batches pinned for the process lifetime)."""
    import threading

    _mk_instances(tmp_path / "v", n_inst=6, asym=False)
    cfg = bridge.DataConfig(dataset_path=[str(tmp_path / "v")], height=8, width=8)
    ds = bridge.VideoDataset(cfg, lambda s: np.zeros((4,), np.int32))
    before = threading.active_count()
    loader = bridge.PrefetchLoader(ds, batch_size=1, num_workers=3, seed=0)
    for _ in loader:
        break  # abandon mid-epoch; generator GC runs the finally cleanup
    import gc
    gc.collect()
    deadline = 10.0
    import time
    t0 = time.monotonic()
    while threading.active_count() > before and time.monotonic() - t0 < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
