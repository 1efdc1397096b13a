"""Native C++ thinning vs the python fallback."""

import numpy as np
import pytest

from patchperpix_tpu.native import skeletonize_3d_native
from patchperpix_tpu.utils.skeleton import skeletonize


def test_native_builds_and_runs():
    vol = np.zeros((5, 5, 20), dtype=np.uint8)
    vol[1:4, 1:4, 2:18] = 1
    out = skeletonize_3d_native(vol)
    assert out is not None, "native thinning failed to build"
    assert 0 < out.sum() < vol.sum()
    # connected and spans the tube
    from scipy import ndimage

    lab, n = ndimage.label(out, structure=np.ones((3, 3, 3)))
    assert n == 1
    xs = np.where(out)[2]
    assert xs.max() - xs.min() >= 12


def test_native_matches_python_on_tube():
    vol = np.zeros((6, 6, 24), dtype=np.uint8)
    vol[2:5, 2:5, 2:22] = 1
    nat = skeletonize_3d_native(vol)
    py = skeletonize(vol, native=False)
    # same algorithm, same candidate order: identical results
    np.testing.assert_array_equal(nat, py)


def test_native_matches_python_on_random_blobs():
    rng = np.random.RandomState(0)
    from scipy import ndimage

    vol = (rng.rand(14, 14, 14) > 0.7)
    vol = ndimage.binary_dilation(vol, iterations=1).astype(np.uint8)
    nat = skeletonize_3d_native(vol)
    py = skeletonize(vol, native=False)
    np.testing.assert_array_equal(nat, py)


def test_native_used_by_default_for_3d():
    vol = np.zeros((5, 5, 20), dtype=np.uint8)
    vol[1:4, 1:4, 2:18] = 1
    out = skeletonize(vol)       # dispatches to native
    assert out.shape == vol.shape
    assert 0 < out.sum() < vol.sum()


def test_native_speed_on_flylight_scale():
    """The native path must handle a 50^3 volume quickly."""
    import time

    rng = np.random.RandomState(1)
    from scipy import ndimage

    vol = np.zeros((50, 50, 50), dtype=np.uint8)
    pts = rng.randint(5, 45, size=(40, 3))
    vol[tuple(pts.T)] = 1
    vol = ndimage.binary_dilation(vol, iterations=4).astype(np.uint8)
    t0 = time.perf_counter()
    out = skeletonize_3d_native(vol)
    dt = time.perf_counter() - t0
    assert out is not None
    assert dt < 10.0, f"native thinning too slow: {dt:.1f}s"


def test_native_2d_matches_python():
    """2D native thinning (ppp_skeletonize_2d) is bit-identical to the
    python 8/4-connectivity fallback."""
    from patchperpix_tpu.native import skeletonize_2d_native

    rng = np.random.RandomState(3)
    from scipy import ndimage

    for seed in (0, 1):
        img = (np.random.RandomState(seed).rand(40, 50) > 0.72)
        img = ndimage.binary_dilation(img, iterations=1).astype(np.uint8)
        nat = skeletonize_2d_native(img)
        assert nat is not None
        py = skeletonize(img, native=False)
        np.testing.assert_array_equal(nat, py)

    # worm-like elongated shape stays connected
    img = np.zeros((60, 120), np.uint8)
    xs = np.arange(10, 110)
    ys = (30 + 8 * np.sin(xs / 9.0)).astype(int)
    for dx, x in enumerate(xs):
        img[ys[dx] - 2:ys[dx] + 3, x] = 1
    nat = skeletonize_2d_native(img)
    py = skeletonize(img, native=False)
    np.testing.assert_array_equal(nat, py)
    lab, n = ndimage.label(nat, structure=np.ones((3, 3)))
    assert n == 1


def test_native_2d_used_by_default():
    img = np.zeros((20, 40), np.uint8)
    img[8:13, 4:36] = 1
    out = skeletonize(img)
    assert out.shape == img.shape
    assert 0 < out.sum() < img.sum()
