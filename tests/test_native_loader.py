"""Native C++ loader vs the Python cv2 path.

Tolerance is one uint8 step (1/127.5): the pip cv2 wheel bundles its own
libjpeg-turbo while the native lib links the system libjpeg, so JPEG decode
may differ by +-1 on a fraction of pixels. Resize/flip/normalise are exact.
"""

import os
import numpy as np
import cv2
import pytest

from this_and_that_vdm_tpu.data import native_loader

FIX = "/root/reference/__assets__/Bridge_example/Task1_v1_511/im_0.jpg"


@pytest.mark.skipif(not native_loader.available(), reason="libttv_loader not built")
def test_native_matches_cv2_python_path():
    paths = [FIX] * 5
    got = native_loader.load_frames_native(paths, (256, 384), flip=False)
    img = cv2.imread(FIX)[:, :, ::-1]
    img = cv2.resize(img, (384, 256), interpolation=cv2.INTER_CUBIC)
    expected = img.astype(np.float32) / 127.5 - 1.0
    assert got.shape == (5, 256, 384, 3)
    assert np.abs(got[0] - expected).max() <= 1.01 / 127.5  # jpeg lib delta
    assert np.array_equal(got[0], got[4])


@pytest.mark.skipif(not native_loader.available(), reason="libttv_loader not built")
def test_native_flip_matches_fliplr():
    got = native_loader.load_frames_native([FIX], (64, 96), flip=True)
    img = cv2.imread(FIX)[:, :, ::-1]
    img = cv2.resize(img, (96, 64), interpolation=cv2.INTER_CUBIC)
    expected = np.fliplr(img).astype(np.float32) / 127.5 - 1.0
    assert np.abs(got[0] - expected).max() <= 1.01 / 127.5


@pytest.mark.skipif(not native_loader.available(), reason="libttv_loader not built")
def test_native_decode_failure_raises():
    """Decode failures must RAISE with the failing path (round-2 review:
    silent zero-fill meant training on mid-gray frames with no trace)."""
    import pytest

    with pytest.raises(RuntimeError, match="nonexistent"):
        native_loader.load_frames_native(["/nonexistent.jpg"], (8, 8))
