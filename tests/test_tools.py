"""Curation tools, tracking fallback, and video/eval utilities."""

import os

import numpy as np
import cv2
import pytest

from this_and_that_vdm_tpu.curation import tools, tracking
from this_and_that_vdm_tpu.utils import video_io


def test_match_instance_exact_mse(tmp_path):
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(3)]
    for name, mutate in [("flat", False), ("cand_good", False), ("cand_bad", True)]:
        d = tmp_path / name
        os.makedirs(d)
        for i, im in enumerate(imgs):
            im2 = im.copy()
            if mutate:
                im2[0, 0] = 255 - im2[0, 0]
            cv2.imwrite(str(d / f"im_{i}.png"), im2)  # png = lossless
            os.rename(d / f"im_{i}.png", d / f"im_{i}.jpg")  # extension contract
    # note: files are PNG bytes with .jpg name; cv2 sniffs content — lossless
    got = tools.match_instance(
        str(tmp_path / "flat"),
        [str(tmp_path / "cand_bad"), str(tmp_path / "cand_good")],
        confirm_frames=3,
    )
    assert got and got.endswith("cand_good")


def test_llama_ingest_and_collect(tmp_path):
    d = tmp_path / "000001"
    os.makedirs(d)
    (d / "lang.txt").write_text("put the fork on the plate\n")
    tools.ingest_llama_decomposition(str(d), "put", "the fork", "the plate")
    lines = open(d / "processed_text.txt").read().splitlines()
    assert lines == ["put", "the fork", "the plate"]
    assert tools.collect_lang(str(tmp_path)) == {"000001": "put the fork on the plate"}


def test_clean_dataset_and_length_stats(tmp_path):
    for name, n, lang in [("a", 14, True), ("b", 5, True), ("c", 14, False)]:
        d = tmp_path / name
        os.makedirs(d)
        for i in range(n):
            cv2.imwrite(str(d / f"im_{i}.jpg"), np.zeros((4, 4, 3), np.uint8))
        if lang:
            (d / "lang.txt").write_text("x\n")
    removed = tools.clean_dataset(str(tmp_path))
    assert len(removed) == 2  # b (too short), c (no lang)
    stats = tools.length_stats(str(tmp_path))
    assert stats["count"] == 1 and stats["mean"] == 14


def test_csrt_propagator_tracks_moving_square():
    frames, mask = [], np.zeros((64, 96), bool)
    mask[24:40, 16:32] = True
    for t in range(5):
        img = np.zeros((64, 96, 3), np.uint8)
        img[24:40, 16 + 6 * t : 32 + 6 * t] = 255
        frames.append(img)
    masks = tracking.csrt_mask_propagator(frames, mask)
    assert len(masks) == 5
    # final mask's centroid moved right
    ys0, xs0 = np.nonzero(masks[0])
    ys4, xs4 = np.nonzero(masks[4])
    assert len(xs4) > 0 and xs4.mean() > xs0.mean() + 10


def test_psnr_ssim_and_grid(tmp_path):
    rng = np.random.RandomState(0)
    a = rng.randint(0, 255, (32, 32, 3), np.uint8)
    assert video_io.psnr(a, a) == float("inf")
    assert video_io.ssim(a.astype(float), a.astype(float)) > 0.999
    noisy = np.clip(a.astype(int) + rng.randint(-5, 5, a.shape), 0, 255).astype(np.uint8)
    p = video_io.psnr(a, noisy)
    assert 30 < p < 50

    # result-grid combination from two fake method dirs
    for m in ["m1", "m2"]:
        d = tmp_path / m
        os.makedirs(d)
        for i in range(3):
            cv2.imwrite(str(d / f"{i}.png"), rng.randint(0, 255, (16, 24, 3), np.uint8))
    out = video_io.combine_results_grid(
        [str(tmp_path / "m1"), str(tmp_path / "m2")],
        str(tmp_path / "grid.gif"), labels=["a", "b"],
    )
    assert os.path.exists(out)


def test_train_test_split(tmp_path):
    for i in range(10):
        os.makedirs(tmp_path / f"{i:06d}")
    train, test = video_io.train_test_split(str(tmp_path), 0.2)
    assert len(train) == 8 and len(test) == 2
    assert not set(train) & set(test)


def test_interpolate_by_repeat():
    frames = [np.full((2, 2, 3), i, np.uint8) for i in range(3)]
    out = video_io.interpolate_by_repeat(frames, 2)
    assert len(out) == 6 and (out[0] == out[1]).all()


def test_repeat_to_length_gap_distribution():
    from this_and_that_vdm_tpu.utils.video_io import repeat_to_length

    frames = [np.full((2, 2, 3), i, np.uint8) for i in range(5)]
    out = repeat_to_length(frames, 14)
    assert len(out) == 14
    counts = [sum(int(f[0, 0, 0]) == i for f in out) for i in range(5)]
    assert sum(counts) == 14 and min(counts) >= 14 // 5
    # alternating front/back remainder: first and last get the extras first
    assert counts[0] >= counts[2] and counts[-1] >= counts[2]
    # order preserved
    vals = [int(f[0, 0, 0]) for f in out]
    assert vals == sorted(vals)


def test_resize_truncate_noise_and_extract(tmp_path):
    from this_and_that_vdm_tpu.curation.tools import (
        extract_test_paths, generate_noise_images, resize_video_seq,
        truncate_video_frames)

    src = tmp_path / "src" / "vid0"
    src.mkdir(parents=True)
    for i in range(3):
        cv2.imwrite(str(src / f"{i}.png"), np.zeros((10, 20, 3), np.uint8))
    n = resize_video_seq(str(tmp_path / "src"), str(tmp_path / "dst"),
                         target_hw=(5, 8))
    assert n == 3
    img = cv2.imread(str(tmp_path / "dst" / "vid0" / "0.png"))
    assert img.shape == (5, 8, 3)

    removed = truncate_video_frames(str(tmp_path / "src"), needed_frames=2)
    assert removed == 1
    assert not (src / "2.png").exists()

    paths = generate_noise_images(str(tmp_path / "noise"), count=2, hw=(4, 4))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)

    match = tmp_path / "match.txt"
    match.write_text("000001 /raw/bridge/a/b/c\n000002 /raw/bridge/d/e/f\n")
    out = tmp_path / "test_paths.txt"
    k = extract_test_paths(str(match), str(out), strip_prefix="/raw/bridge/")
    assert k == 2
    assert out.read_text().splitlines() == ["a/b/c", "d/e/f"]


def test_painters_overlay():
    from this_and_that_vdm_tpu.curation.painters import (
        colormap, mask_painter, multi_mask_painter, point_painter,
        sam_visualization)

    img = np.full((32, 32, 3), 128, np.uint8)
    mask = np.zeros((32, 32), bool)
    mask[8:20, 8:20] = True
    out = mask_painter(img, mask)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out[10, 10], img[10, 10])  # painted
    assert np.array_equal(out[2, 2], img[2, 2])          # untouched outside

    pts = point_painter(img, [(5.0, 5.0)], point_radius=2)
    assert not np.array_equal(pts[5, 5], img[5, 5])

    idx_mask = np.zeros((32, 32), np.uint8)
    idx_mask[:8, :8] = 1
    idx_mask[20:, 20:] = 2
    multi = multi_mask_painter(img, idx_mask)
    assert not np.array_equal(multi[2, 2], multi[26, 26])  # distinct colors

    sam = sam_visualization(img, mask, [(10.0, 10.0)])
    assert sam.shape == img.shape
    assert isinstance(colormap(3), tuple) and len(colormap(3)) == 3


def test_postprocess_frames_uint8_matches_host_path():
    from this_and_that_vdm_tpu.pipelines import common as pcommon
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    frames = rng.uniform(-1.3, 1.3, (2, 3, 8, 8, 3)).astype(np.float32)
    dev = np.asarray(pcommon.postprocess_frames_uint8(jnp.asarray(frames)))
    host = pcommon.frames_to_uint8(pcommon.postprocess_frames(jnp.asarray(frames)))
    np.testing.assert_array_equal(dev, host)


def test_process_sim_dataset(tmp_path):
    sim = tmp_path / "sim"
    # two scenes x 3 prompts/scene; scene 1 missing its base run -> skipped
    for run in range(6):
        d = sim / f"run_{run}"
        if run == 3:
            continue
        os.makedirs(d)
        (d / "lang.txt").write_text(f"prompt run{run}\nsecond line ignored\n")
        if run % 3 == 0:  # base runs carry the frames
            (d / "im_0.jpg").write_bytes(b"jpegbytes")
            (d / "data.txt").write_text("0 1 2\n")
    out = tmp_path / "flat"
    n = tools.process_sim_dataset(str(sim), str(out), prompts_per_scene=3,
                                  most_descriptive_prompt_idx=1)
    assert n == 1  # scene 1's base run_3 is absent
    lines = (out / "0" / "lang.txt").read_text().splitlines()
    assert lines == ["prompt run1", "prompt run0", "prompt run2"]  # idx 1 first
    assert (out / "0" / "im_0.jpg").read_bytes() == b"jpegbytes"
    assert (out / "0" / "data.txt").exists()


def test_flow_colorwheel_and_image():
    from this_and_that_vdm_tpu.curation.painters import make_colorwheel, flow_to_image

    w = make_colorwheel()
    assert w.shape == (55, 3)
    # sector boundary colors of the Baker et al. wheel
    np.testing.assert_array_equal(w[0], [255, 0, 0])        # red
    np.testing.assert_array_equal(w[15], [255, 255, 0])     # yellow
    np.testing.assert_array_equal(w[21], [0, 255, 0])       # green
    np.testing.assert_array_equal(w[25], [0, 255, 255])     # cyan
    np.testing.assert_array_equal(w[36], [0, 0, 255])       # blue
    np.testing.assert_array_equal(w[49], [255, 0, 255])     # magenta

    flow = np.stack(np.meshgrid(np.linspace(-3, 3, 33), np.linspace(-3, 3, 25)), -1)
    img = flow_to_image(flow.astype(np.float32))
    assert img.shape == (25, 33, 3) and img.dtype == np.uint8
    # zero flow (exact center of the odd grid) renders white
    np.testing.assert_array_equal(img[12, 16], [255, 255, 255])
    bgr = flow_to_image(flow.astype(np.float32), convert_to_bgr=True)
    np.testing.assert_array_equal(bgr[..., ::-1], img)
