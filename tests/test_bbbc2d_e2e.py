"""BBBC010-style 2D assembly e2e: 25x25 patches on elongated instances.

The reference's 2D worm configs use patchshape 25x25 (README.md:96-107);
round-1 testing only exercised 5x5 2D patches.  Ideal affinities on
synthetic elongated (worm-like) instances must reconstruct the labels
exactly through the full consensus -> rank -> cover -> graph -> labeling
pipeline.
"""

import numpy as np
import pytest

from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
from patchperpix_tpu.ops.synthetic import labels_to_affinities


def _worm_labels(h=80, w=80):
    """Three elongated instances: two near-parallel sinusoid strips that
    approach within a few pixels (the BBBC010 failure mode) + one blob."""
    labels = np.zeros((1, h, w), np.int32)
    xs = np.arange(10, w - 10)
    for i, (y0, amp, lab) in enumerate([(25, 6, 1), (40, 6, 2)]):
        ys = (y0 + amp * np.sin(xs / 9.0)).astype(int)
        for dx, x in enumerate(xs):
            labels[0, ys[dx] - 2:ys[dx] + 3, x] = lab
    labels[0, 60:72, 15:35] = 3
    return labels


@pytest.mark.parametrize("mws", [True])  # cc labeling covered by 5x5 2D tests
def test_bbbc2d_25x25_ideal_affinities(mws):
    ps = np.array([1, 25, 25])
    labels = _worm_labels()
    affs = labels_to_affinities(labels, ps)
    fg = labels > 0
    params = VoteInstancesParams(
        patchshape=(1, 25, 25), engine="jax", patch_threshold=0.5,
        fc_threshold=0.5, mws=mws, select_patches_for_sparse_data=False)
    inst, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                              params)
    inst = np.asarray(inst)
    inst[~fg] = 0

    ids = np.unique(inst[inst > 0])
    assert len(ids) == 3
    # each GT instance maps to exactly one predicted id and vice versa
    for g in (1, 2, 3):
        vals = np.unique(inst[labels == g])
        vals = vals[vals > 0]
        assert len(vals) == 1, f"gt {g} split into {vals}"
    # the two worms must not merge
    a = np.unique(inst[labels == 1])[-1]
    b = np.unique(inst[labels == 2])[-1]
    assert a != b
