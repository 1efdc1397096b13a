"""ISBI hacks: patch sparsification + boundary filtering."""

import numpy as np

from patchperpix_tpu.assembly.isbi_hacks import (
    filter_instance_boundaries_from_fg, sparsify_patches)
from patchperpix_tpu.ops import synthetic


def test_sparsify():
    # reference semantics: coordinate grid p % stride == 1 on EVERY axis
    # (isbi_hacks.py:10-14), not every Nth list element
    pts = [(1, 1, i) for i in range(100)] + [(0, 1, 21), (1, 2, 21)]
    out = sparsify_patches(pts, stride=20)
    assert out == [(1, 1, 1), (1, 1, 21), (1, 1, 41), (1, 1, 61),
                   (1, 1, 81)]


def test_boundary_filter_removes_boundary_pixels():
    ps = np.array([1, 5, 5])
    # two touching instances: interface pixels fall into the dilation
    # rings of the other instance's patches
    labels = np.zeros((1, 16, 16), dtype=np.int32)
    labels[0, 3:13, 3:8] = 1
    labels[0, 3:13, 8:13] = 2
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[12] > 0.5
    all_patches = [tuple(c) for c in np.argwhere(fg)]
    out = filter_instance_boundaries_from_fg(
        affs, fg, all_patches, ps, fg)
    # pixels at the instance interface (x in {7, 8}) get filtered
    assert not out[0, 8, 7] or not out[0, 8, 8]
    # interior pixels survive
    assert out[0, 8, 4]
    assert out.sum() < fg.sum()


def _boundary_filter_oracle(pred_affs, foreground, all_patches, ps,
                            mask_to_cover, pthresh=0.5):
    """Direct transcription of the reference loop: get_boundary_set
    (get_patch_sets.py:6-30) + boundary_count thresholding
    (isbi_hacks.py:40-48)."""
    from scipy.ndimage import binary_dilation

    from patchperpix_tpu.assembly.isbi_hacks import _ball

    ps = np.asarray(ps)
    rad = ps // 2
    count = np.zeros(foreground.shape, dtype=np.int64)
    for idx in all_patches:
        idx = np.asarray(idx)
        start, stop = idx - rad, idx + rad + 1
        if np.any(start < 0) or np.any(stop > foreground.shape):
            continue
        patch = pred_affs[(slice(None),) + tuple(idx)].reshape(tuple(ps))
        patch = patch > pthresh
        ring = binary_dilation(patch, structure=_ball(2)) & ~patch
        for rel in np.argwhere(ring):
            count[tuple(start + rel)] += 1
    return np.logical_and(mask_to_cover, count < 0.33 * np.prod(ps[1:]))


def test_boundary_filter_matches_reference_oracle():
    """Vectorized ring counting == the reference's per-patch set loop."""
    ps = np.array([1, 5, 5])
    rng = np.random.RandomState(3)
    labels = np.zeros((1, 20, 20), np.int32)
    labels[0, 2:18, 2:10] = 1
    labels[0, 2:18, 10:18] = 2
    labels[0, 5:8, 14:17] = 0  # a hole -> irregular rings
    affs = synthetic.labels_to_affinities(labels, ps)
    # noise so patches disagree near the interface like a real model
    affs = np.clip(affs + rng.uniform(-0.3, 0.3, affs.shape), 0, 1)
    fg = labels[0] > 0
    fg = fg[None]
    all_patches = [tuple(c) for c in np.argwhere(fg)]
    got = filter_instance_boundaries_from_fg(
        affs, fg, all_patches, ps, fg)
    want = _boundary_filter_oracle(affs, fg, all_patches, ps, fg)
    assert got.dtype == bool
    assert np.array_equal(got, want)


def test_isbi_hack_wired_into_pipeline():
    """to_instance_seg honors isbi_hack: candidates restricted to the
    sparse grid (centers % stride == 1)."""
    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg

    # multi-slice stack like the real ISBI data: the one-slice hack keeps
    # z=1, which is exactly the slice the % stride == 1 grid passes
    ps = np.array([1, 5, 5])
    labels = np.zeros((3, 44, 44), np.int32)
    labels[:, 2:42, 2:20] = 1
    labels[:, 2:42, 24:42] = 2
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[12] > 0.5
    params = VoteInstancesParams(
        patchshape=(1, 5, 5), engine="numpy", isbi_hack=True,
        isbi_sparsify_stride=4, removeIntersection=False,
        select_patches_for_sparse_data=False, includeSinglePatchCCS=True)
    inst, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                              params)
    # one-slice hack: only z=1 is labeled
    assert inst[0].sum() == 0 and inst[2].sum() == 0
    inst[~fg] = 0
    ids = np.unique(inst[inst > 0])
    assert len(ids) == 2
    for gt in (1, 2):
        pred = np.unique(inst[1][labels[1] == gt])
        assert len(pred[pred > 0]) == 1


def test_keep_single_slice():
    from patchperpix_tpu.assembly.isbi_hacks import keep_single_slice

    fg = np.ones((4, 5, 5), bool)
    out = keep_single_slice(fg)
    assert out[1].all() and not out[0].any() and not out[2:].any()
    assert fg.all()  # input untouched
