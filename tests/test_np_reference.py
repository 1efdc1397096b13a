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


def test_components_to_instances_sparse_dict_matches_dense():
    """sparse_labels mode (graph_to_labeling.py:65-67): dict of patch
    columns produces the same painting as the dense array."""
    import numpy as np

    from patchperpix_tpu.ops import np_reference as ref, synthetic

    ps = np.array([3, 3, 3])
    labels = synthetic.two_blob_labels_3d()
    affs = synthetic.labels_to_affinities(labels, ps)
    comps = [[(4, 4, 4), (5, 5, 5)], [(9, 9, 9)]]
    dense = ref.components_to_instances(comps, affs, ps, labels.shape[-3:])
    patch_dict = {c: affs[(slice(None),) + c]
                  for comp in comps for c in comp}
    sparse = ref.components_to_instances(comps, patch_dict, ps,
                                         labels.shape[-3:])
    np.testing.assert_array_equal(dense, sparse)


def test_components_to_instances_no_overlap_per_channel():
    """no_overlap_per_channel packing (graph_to_labeling.py:96-113):
    big disjoint instances share a channel; big overlapping ones get a new
    channel; small ones go to channel 0."""
    import numpy as np

    from patchperpix_tpu.ops import np_reference as ref

    vol = (1, 30, 30)
    ps = np.array([1, 5, 5])
    P = int(ps.prod())

    def full_patch():
        return np.ones(P, np.float32)

    # comp1: big blob left; comp2: big blob right (disjoint from comp1);
    # comp3: big blob overlapping comp1; comp4: tiny (1 patch, 25 px < thresh)
    grid = [(0, y, x) for y in range(2, 28, 2) for x in range(2, 13, 2)]
    comp1 = grid
    comp2 = [(0, y, x) for y in range(2, 28, 2) for x in range(17, 28, 2)]
    comp3 = [(0, y, x) for y in range(2, 28, 2) for x in range(4, 14, 2)]
    comp4 = [(0, 15, 15)]
    patch_dict = {c: full_patch() for c in comp1 + comp2 + comp3 + comp4}
    out = ref.components_to_instances(
        [comp1, comp2, comp3, comp4], patch_dict, ps, vol,
        no_overlap_per_channel=True, min_pack_size=100)
    assert out.ndim == 4
    # comp1 ch0 value1, comp2 packs into ch0 value2, comp3 opens ch1
    # value 3, comp4 small -> ch0 value 4
    assert out.shape[0] == 2
    assert (out[0] == 1).any() and (out[0] == 2).any()
    assert (out[1] == 3).any() and not (out[0] == 3).any()
    assert (out[0] == 4).any()


def test_cover_overlap_neighborhood_pass():
    """select_patches_overlap_neighborhood (foreground_cover.py:53-85): the
    second pass picks extra patches in the dilation ring around overlap
    regions that the main cascade skipped."""
    import numpy as np

    from patchperpix_tpu.ops import np_reference as ref, synthetic

    ps = np.array([1, 5, 5])
    labels = np.zeros((2, 1, 24, 24), np.int32)
    labels[0, 0, 4:16, 4:16] = 1
    labels[1, 0, 10:20, 10:20] = 2
    affs = synthetic.labels_to_affinities_multi(labels, ps)
    fg = np.sum(labels > 0, axis=0) > 0
    overlap = np.sum(labels > 0, axis=0) > 1
    mask = fg & ~overlap

    all_p = [tuple(c) for c in np.argwhere(fg)]
    scores = np.random.RandomState(0).rand(*fg.shape).astype(np.float32)
    ranked = ref.rank_patch_list(all_p, scores)

    base, _ = ref.foreground_cover_reference(
        affs, mask, ranked, ps, overlap=overlap.astype(np.uint8),
        sparse_data=True)
    withov, _ = ref.foreground_cover_reference(
        affs, mask, ranked, ps, overlap=overlap.astype(np.uint8),
        sparse_data=True, overlap_neighborhood=True)
    assert len(withov) >= len(base)
    # output is coordinate-ordered (argwhere rebuild)
    coords = [tuple(np.asarray(c)) for c, _ in withov]
    assert coords == sorted(coords)


def test_cover_mark_close_neighborhood():
    """mark_close_neighboorhood skips candidates within the in-plane
    radius-3 box of an already-selected center."""
    import numpy as np

    from patchperpix_tpu.ops import np_reference as ref, synthetic

    ps = np.array([1, 5, 5])
    lab = np.zeros((1, 20, 20), np.int32)
    lab[0, 2:18, 2:18] = 1
    affs = synthetic.labels_to_affinities(lab, ps)
    fg = affs[12] > 0.5
    all_p = [tuple(c) for c in np.argwhere(fg)]
    scores = np.ones(fg.shape, np.float32)
    ranked = ref.rank_patch_list(all_p, scores)
    plain, _ = ref.foreground_cover_reference(affs, fg.copy(), ranked, ps,
                                              sparse_data=True)
    marked, _ = ref.foreground_cover_reference(affs, fg.copy(), ranked, ps,
                                               sparse_data=True,
                                               mark_close=True)
    sel = np.array([np.asarray(c) for c, _ in marked])
    # no two selected centers within the 3-box (except across z)
    for i in range(len(sel)):
        d = np.abs(sel - sel[i])
        close = np.logical_and(d[:, 1] <= 3, d[:, 2] <= 3)
        assert close.sum() == 1  # only itself


def test_mws_fast_matches_naive():
    """The union-find mutex-watershed must reproduce the naive re-scan
    loop exactly (ids, membership, order) on random signed graphs."""
    rng = np.random.RandomState(5)
    for trial in range(20):
        n = rng.randint(4, 40)
        n_e = rng.randint(3, 160)
        edges = []
        seen = set()
        for _ in range(n_e):
            a, b = rng.randint(0, n, 2)
            if a == b or (a, b) in seen or (b, a) in seen:
                continue
            seen.add((a, b))
            w = float(np.round(rng.randn(), 3))
            if w == 0:
                continue
            edges.append(((a,), (b,), w))
        fast = ref._mws(edges)
        naive = ref._mws_naive(edges)
        assert fast == naive, (trial, fast, naive)
