"""ISBI-protocol e2e: dense 2D tessellation through the full pipeline.

The ISBI 2012 benchmark is dense EM foreground — every pixel belongs to
a region, separated by thin membranes — assembled with the isbi hacks
(sparsified candidate grid + boundary-ring fg filter,
isbi_hacks.py:10-49) and scored with rand_fscore (rRAND).  Ideal
affinities on a synthetic Voronoi tessellation must reconstruct the
regions with near-perfect Rand score through consensus -> rank -> cover
-> graph -> labeling, proving the dense-data protocol end-to-end
(vote_instances.py:216-218/298-301 wiring).
"""

import numpy as np

from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
from patchperpix_tpu.evaluate.instance_metrics import evaluate_labels
from patchperpix_tpu.ops.synthetic import labels_to_affinities


def _voronoi_labels(size=96, n_cells=9, seed=5):
    """Dense 2D region labels with 1px membrane gaps (labels 0)."""
    rng = np.random.RandomState(seed)
    seeds = np.stack([rng.randint(8, size - 8, n_cells),
                      rng.randint(8, size - 8, n_cells)], axis=1)
    yy, xx = np.mgrid[0:size, 0:size]
    d = (yy[None] - seeds[:, 0, None, None]) ** 2 \
        + (xx[None] - seeds[:, 1, None, None]) ** 2
    label = np.argmin(d, axis=0).astype(np.int32) + 1
    bound = np.zeros((size, size), bool)
    bound[:-1] |= label[:-1] != label[1:]
    bound[:, :-1] |= label[:, :-1] != label[:, 1:]
    gt = label.copy()
    gt[bound] = 0
    return gt[None]


def test_isbi_dense_e2e_rand_score():
    gt = _voronoi_labels()
    ps = np.array([1, 9, 9])
    affs = labels_to_affinities(gt, ps)
    fg = gt > 0
    params = VoteInstancesParams(
        patchshape=(1, 9, 9), engine="jax", patch_threshold=0.5,
        fc_threshold=0.5, mws=True, isbi_hack=True,
        isbi_sparsify_stride=6, select_patches_for_sparse_data=False,
        removeIntersection=True)
    inst, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                              params)
    inst = np.asarray(inst)
    inst[~fg] = 0

    res = evaluate_labels(
        inst, gt, localization_criterion="iou",
        assignment_strategy="hungarian",
        add_general_metrics=("rand_fscore", "adapted_rand_error", "voi"))
    g = res["general"]
    # ideal affinities on a dense tessellation: near-perfect Rand
    assert g["rand_fscore"] > 0.9, g
    assert g["adapted_rand_error"] < 0.1, g
    # no catastrophic merges: at least as many predicted regions as GT-1
    n_pred = np.unique(inst[inst > 0]).size
    n_gt = np.unique(gt[gt > 0]).size
    assert n_pred >= n_gt - 1, (n_pred, n_gt)
