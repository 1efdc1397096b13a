"""Unit tests for the numpy golden reference of the assembly math."""

import numpy as np
import pytest

from patchperpix_tpu.ops import np_reference as ref
from patchperpix_tpu.ops import synthetic


def test_patch_offsets_linear_order():
    offs = ref.patch_offsets([1, 3, 3])
    assert offs.shape == (9, 3)
    # C-order: last axis fastest
    assert (offs[0] == [0, 0, 0]).all()
    assert (offs[1] == [0, 0, 1]).all()
    assert (offs[3] == [0, 1, 0]).all()


def test_bg_threshold_variants():
    assert ref.bg_threshold(0.7, "inv") == pytest.approx(0.3)
    assert ref.bg_threshold(0.3, "inv") == pytest.approx(0.3)
    assert ref.bg_threshold(0.6, "half") == pytest.approx(0.3)
    assert ref.bg_threshold(0.6, "less") == pytest.approx(0.6)


def _tiny_case():
    """3-pixel 1D-ish foreground line in a 2D volume, 1x3x3 patches."""
    ps = np.array([1, 3, 3])
    labels = np.zeros((1, 5, 7), dtype=np.int32)
    labels[0, 2, 1:6] = 1
    affs = synthetic.labels_to_affinities(labels, ps, hi=0.9, lo=0.1)
    return ps, labels, affs


def test_consensus_positive_votes_hand_checked():
    ps, labels, affs = _tiny_case()
    cons, cnt = ref.consensus_reference(
        affs, ps, th=0.5, weight_mode="count", norm_aff=False)
    # neigh extents: (1, 5, 5)
    assert cons.shape == (1, 5, 5, 1, 5, 7)
    # no negative votes: every in-patch fg pair agrees
    assert cons.min() >= 0
    # offset (0, 0, +1) at pixel (0,2,2): the pair (x=2, x=3) is voted by
    # every fg center whose patch reaches both: |2-cx|<=1 and |3-cx|<=1
    # -> cx in {2, 3}, cy = 2 (only fg row). So 2 votes.
    d_idx = (0, 2, 3)  # d = (0,0,1) + ps-1 = (0,2,3)
    assert cons[d_idx + (0, 2, 2)] == 2


def test_consensus_sum_invariant_weight_count():
    """Total positive votes == sum over centers of (#hi pairs); negative
    analogously (fillConsensusArray.cu:3-4 'total sum identical')."""
    ps = np.array([1, 3, 3])
    rng = np.random.RandomState(42)
    affs = rng.rand(9, 1, 8, 8).astype(np.float32)
    cons, cnt = ref.consensus_reference(
        affs, ps, th=0.5, weight_mode="count", norm_aff=False)

    # independent recount: per interior fg center, hi/lo pair counts
    mid = 4
    fg = affs[mid] > 0.5
    total = 0.0
    for c in np.argwhere(fg):
        if np.any(c[1:] < 1) or c[1] >= 7 or c[2] >= 7:
            continue
        v = affs[:, c[0], c[1], c[2]]
        offs = ref.patch_offsets(ps)
        tgt = c[None, :] + offs - np.array([0, 1, 1])
        tgt_fg = fg[tuple(tgt.T)]
        hi = (v > 0.5) & tgt_fg
        lo = (v < 0.5) & tgt_fg
        nh, nl = hi.sum(), lo.sum()
        total += nh * (nh - 1) / 2 - nh * nl
    assert cons.sum() == pytest.approx(total)


def test_consensus_norm_bounded():
    ps, labels, affs = _tiny_case()
    cons, cnt = ref.consensus_reference(
        affs, ps, th=0.5, weight_mode="norm_prob_product", norm_aff=True)
    # normalized prob-product weights lie in (-1, 1] after count-normalization
    assert cons.max() <= 1.0 + 1e-6
    assert cons.min() >= -1.0 - 1e-6


def test_rank_scores_ideal_affinities():
    ps, labels, affs = _tiny_case()
    cons, _ = ref.consensus_reference(affs, ps, th=0.5)
    scores = ref.rank_patches_reference(affs, cons, ps, th=0.5)
    fg = affs[int(np.prod(ps)) // 2] > 0.5
    # interior fg scores positive (perfect agreement), border sentinel -1
    interior = np.zeros_like(fg)
    interior[:, 1:-1, 1:-1] = True
    assert (scores[fg & interior] > 0).all()
    assert (scores[~(fg & interior)] == -1).all()


def test_full_pipeline_two_instances_2d():
    ps = np.array([1, 5, 5])
    labels = synthetic.two_blob_labels_2d()
    affs = synthetic.labels_to_affinities(labels, ps)
    mid = int(np.prod(ps)) // 2
    fg = affs[mid] > 0.5

    cons, _ = ref.consensus_reference(affs, ps, th=0.5)
    scores = ref.rank_patches_reference(affs, cons, ps, th=0.5)

    rad = ps // 2
    interior = np.zeros_like(fg)
    interior[:, rad[1]:-rad[1], rad[2]:-rad[2]] = True
    all_patches = [tuple(c) for c in np.argwhere(fg & interior)]
    ranked = ref.rank_patch_list(all_patches, scores)

    mask = fg.copy()
    selected, _ = ref.foreground_cover_reference(
        affs, mask, ranked, ps, fc_threshold=0.5, sparse_data=True)
    assert len(selected) > 0
    thinned = ref.thin_out_cover_reference(affs, mask, selected, ps)
    assert 0 < len(thinned) <= len(selected)

    pairs, _ = ref.patch_pairs_reference(thinned, ps)
    weights = ref.patch_graph_reference(affs, cons, pairs, ps, th=0.5)
    comps = ref.graph_components(pairs, weights, mws=False)
    assert len(comps) == 2

    inst = ref.components_to_instances(comps, affs, ps, labels.shape,
                                       patch_threshold=0.5)
    inst[~fg] = 0
    # each gt instance is covered by exactly one predicted id and vice versa
    for gt_id in (1, 2):
        pred_ids = np.unique(inst[labels == gt_id])
        pred_ids = pred_ids[pred_ids > 0]
        assert len(pred_ids) == 1
    assert len(np.unique(inst[inst > 0])) == 2
    # labels match foreground closely
    iou = np.logical_and(inst > 0, labels > 0).sum() / \
        np.logical_or(inst > 0, labels > 0).sum()
    assert iou > 0.9


def test_full_pipeline_two_instances_3d_mws():
    ps = np.array([3, 3, 3])
    labels = synthetic.two_blob_labels_3d()
    affs = synthetic.labels_to_affinities(labels, ps)
    mid = int(np.prod(ps)) // 2
    fg = affs[mid] > 0.5

    cons, _ = ref.consensus_reference(affs, ps, th=0.5)
    scores = ref.rank_patches_reference(affs, cons, ps, th=0.5)
    rad = ps // 2
    interior = np.zeros_like(fg)
    interior[rad[0]:-rad[0], rad[1]:-rad[1], rad[2]:-rad[2]] = True
    all_patches = [tuple(c) for c in np.argwhere(fg & interior)]
    ranked = ref.rank_patch_list(all_patches, scores)
    selected, _ = ref.foreground_cover_reference(
        affs, fg, ranked, ps, sparse_data=True)
    thinned = ref.thin_out_cover_reference(affs, fg, selected, ps)
    pairs, _ = ref.patch_pairs_reference(thinned, ps)
    weights = ref.patch_graph_reference(affs, cons, pairs, ps)
    comps = ref.graph_components(pairs, weights, mws=True)
    assert len(comps) == 2
    inst = ref.components_to_instances(comps, affs, ps, labels.shape)
    inst[~fg] = 0
    assert len(np.unique(inst[inst > 0])) == 2


def test_mws_respects_mutex():
    # two clusters joined by a weak positive edge but separated by a strong
    # negative edge -> must not merge
    pairs = np.array([
        [0, 0, 0, 0, 0, 2],    # a-b positive strong
        [0, 0, 5, 0, 0, 7],    # c-d positive strong
        [0, 0, 2, 0, 0, 5],    # b-c negative strong (mutex)
        [0, 0, 0, 0, 0, 7],    # a-d positive weak
    ], dtype=np.uint32)
    weights = np.array([5.0, 5.0, -4.0, 1.0], dtype=np.float32)
    comps = ref.graph_components(pairs, weights, mws=True)
    assert len(comps) == 2
    comps_nomws = ref.graph_components(pairs, weights, mws=False)
    assert len(comps_nomws) == 1
