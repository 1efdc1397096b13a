"""ISBI hacks: patch sparsification + boundary filtering."""

import numpy as np

from patchperpix_tpu.assembly.isbi_hacks import (
    filter_instance_boundaries_from_fg, sparsify_patches)
from patchperpix_tpu.ops import synthetic


def test_sparsify():
    pts = [(0, 0, i) for i in range(100)]
    out = sparsify_patches(pts, stride=20)
    assert len(out) == 5
    assert out[0] == (0, 0, 0) and out[1] == (0, 0, 20)


def test_boundary_filter_removes_boundary_pixels():
    ps = np.array([1, 5, 5])
    # two touching instances: boundary pixels see disagreeing patches
    labels = np.zeros((1, 16, 16), dtype=np.int32)
    labels[0, 3:13, 3:8] = 1
    labels[0, 3:13, 8:13] = 2
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[12] > 0.5
    all_patches = [tuple(c) for c in np.argwhere(fg)]
    out = filter_instance_boundaries_from_fg(
        affs, fg, all_patches, ps, fg, boundary_threshold=0.3)
    # pixels at the instance interface (x in {7, 8}) get filtered
    assert not out[0, 8, 7] or not out[0, 8, 8]
    # interior pixels survive
    assert out[0, 8, 4]
    assert out.sum() < fg.sum()
