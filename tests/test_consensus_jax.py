"""Parity tests: XLA consensus/rank/patch-graph vs the numpy golden reference.

The reference CUDA kernels note that CPU/GPU results agree exactly up to
accumulation order (fillConsensusArray.cu:3-4); here both implementations use
the same canonical pair orientation so we check elementwise closeness.
"""

import numpy as np
import pytest

from patchperpix_tpu.ops import np_reference as ref
from patchperpix_tpu.ops import synthetic
from patchperpix_tpu.ops.consensus_jax import (
    ConsensusConfig, consensus_array, patch_graph_weights, rank_scores,
    symmetrize_consensus)


def _random_affs(shape, P, seed=0, sharp=True):
    rng = np.random.RandomState(seed)
    affs = rng.rand(P, *shape).astype(np.float32)
    if sharp:
        # push away from the threshold to avoid FP-boundary disagreements
        affs = np.where(affs > 0.5, 0.6 + 0.4 * affs, 0.4 * affs)
    return affs.astype(np.float32)


CASES = [
    # (patchshape, vol_shape, kwargs)
    ([1, 3, 3], (1, 8, 9), {}),
    ([1, 3, 3], (1, 8, 9), {"weight_mode": "count", "norm_aff": False}),
    ([1, 3, 3], (1, 8, 9), {"weight_mode": "prob_product"}),
    ([1, 3, 3], (1, 8, 9), {"bg_mode": "half"}),
    ([3, 3, 3], (6, 7, 8), {}),
    ([1, 5, 5], (1, 12, 12), {}),
]


@pytest.mark.parametrize("ps,shape,kwargs", CASES)
def test_consensus_parity(ps, shape, kwargs):
    ps = np.array(ps)
    affs = _random_affs(shape, int(np.prod(ps)), seed=1)
    cons_np, cnt_np = ref.consensus_reference(affs, ps, th=0.5, **kwargs)

    cfg = ConsensusConfig(patchshape=tuple(int(p) for p in ps),
                          patch_threshold=0.5,
                          bg_mode=kwargs.get("bg_mode", "less"),
                          weight_mode=kwargs.get("weight_mode",
                                                 "norm_prob_product"),
                          norm_aff=kwargs.get("norm_aff", True))
    cons_j, cnt_j = consensus_array(affs, cfg, with_counts=True)
    np.testing.assert_allclose(np.asarray(cnt_j), cnt_np, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cons_j), cons_np,
                               atol=1e-4, rtol=1e-4)


def test_consensus_overlap_mask_parity():
    ps = np.array([1, 3, 3])
    affs = _random_affs((1, 8, 9), 9, seed=3)
    overlap = np.zeros((1, 8, 9), dtype=bool)
    overlap[0, 3:5, 4:6] = True
    cons_np, _ = ref.consensus_reference(affs, ps, th=0.5, overlap=overlap)
    cfg = ConsensusConfig(patchshape=(1, 3, 3), overlapping_inst=True)
    cons_j = consensus_array(affs, cfg, overlap=overlap)
    np.testing.assert_allclose(np.asarray(cons_j), cons_np,
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("norm_rank,int_counter", [
    (True, False), (False, False), (True, True)])
def test_rank_parity(norm_rank, int_counter):
    ps = np.array([1, 3, 3])
    affs = _random_affs((1, 9, 10), 9, seed=2)
    cons_np, _ = ref.consensus_reference(affs, ps, th=0.5)
    scores_np = ref.rank_patches_reference(
        affs, cons_np, ps, th=0.5,
        norm_rank=norm_rank, int_counter=int_counter)

    cfg = ConsensusConfig(patchshape=(1, 3, 3), norm_rank=norm_rank,
                          rank_int_counter=int_counter)
    cons_j = consensus_array(affs, cfg)
    scores_j = rank_scores(affs, cons_j, cfg)
    np.testing.assert_allclose(np.asarray(scores_j), scores_np,
                               atol=1e-4, rtol=1e-4)


def test_rank_parity_3d():
    ps = np.array([3, 3, 3])
    affs = _random_affs((6, 7, 8), 27, seed=5)
    cons_np, _ = ref.consensus_reference(affs, ps, th=0.5)
    scores_np = ref.rank_patches_reference(affs, cons_np, ps, th=0.5)
    cfg = ConsensusConfig(patchshape=(3, 3, 3))
    cons_j = consensus_array(affs, cfg)
    scores_j = rank_scores(affs, cons_j, cfg)
    np.testing.assert_allclose(np.asarray(scores_j), scores_np,
                               atol=1e-4, rtol=1e-4)


def test_symmetrize():
    ps = np.array([1, 3, 3])
    cfg = ConsensusConfig(patchshape=(1, 3, 3))
    affs = _random_affs((1, 8, 9), 9, seed=4)
    cons = consensus_array(affs, cfg)
    sym = np.asarray(symmetrize_consensus(cons, cfg))
    cons = np.asarray(cons)
    # S[d][x] == S[-d][x+d] for interior x
    d = np.array([0, 1, -1])
    di = tuple(d + np.array([0, 2, 2]))
    ri = tuple(-d + np.array([0, 2, 2]))
    for z in range(1):
        for y in range(1, 7):
            for x in range(1, 8):
                v_fwd = sym[di + (z, y, x)]
                v_bwd = sym[ri + (z, y + 1, x - 1)]
                assert v_fwd == pytest.approx(v_bwd, abs=1e-6)
    # lexpos half unchanged
    assert np.allclose(sym[0, 2, 3], cons[0, 2, 3])


def test_patch_graph_parity_no_lcg():
    """With intersection dropping disabled both impls are deterministic."""
    ps = np.array([1, 3, 3])
    labels = synthetic.two_blob_labels_2d(16, 16)
    affs = synthetic.labels_to_affinities(labels, ps)
    cfg = ConsensusConfig(patchshape=(1, 3, 3))
    cons_np, _ = ref.consensus_reference(affs, ps, th=0.5)

    centers = [(np.array([0, 5, 6]), 1.0), (np.array([0, 5, 9]), 1.0),
               (np.array([0, 13, 6]), 1.0), (np.array([0, 13, 9]), 1.0)]
    pairs, _ = ref.patch_pairs_reference(centers, ps, include_singleton=True)
    w_np = ref.patch_graph_reference(affs, cons_np, pairs, ps, th=0.5,
                                     intersection_lcg=False)

    cons_j = consensus_array(affs, cfg)
    sym = symmetrize_consensus(cons_j, cfg)
    w_j = patch_graph_weights(affs, sym, pairs, cfg, drop_intersection=False)
    np.testing.assert_allclose(np.asarray(w_j), w_np, atol=1e-4, rtol=1e-4)


def test_patch_graph_parity_random_affs():
    ps = np.array([1, 3, 3])
    affs = _random_affs((1, 14, 14), 9, seed=7)
    cfg = ConsensusConfig(patchshape=(1, 3, 3))
    cons_np, _ = ref.consensus_reference(affs, ps, th=0.5)
    centers = [(np.array([0, y, x]), 1.0)
               for y in (4, 9) for x in (4, 7, 10)]
    pairs, _ = ref.patch_pairs_reference(centers, ps, include_singleton=True)
    w_np = ref.patch_graph_reference(affs, cons_np, pairs, ps, th=0.5,
                                     intersection_lcg=False)
    cons_j = consensus_array(affs, cfg)
    sym = symmetrize_consensus(cons_j, cfg)
    w_j = patch_graph_weights(affs, sym, pairs, cfg, drop_intersection=False)
    np.testing.assert_allclose(np.asarray(w_j), w_np, atol=1e-4, rtol=1e-4)


def test_patch_graph_parity_random_affs_3d():
    """True-3D parity: exercises the z-axis skew + negative center deltas
    (the 2D tests have ps_z == 1 and uint centers hid a dc-wraparound bug)."""
    ps = np.array([3, 3, 3])
    affs = _random_affs((12, 12, 12), 27, seed=3)
    cfg = ConsensusConfig(patchshape=(3, 3, 3))
    cons_np, _ = ref.consensus_reference(affs, ps, th=0.5)
    centers = [(np.array([z, y, x]), 1.0)
               for z in (4, 7) for y in (4, 7) for x in (4, 7)]
    pairs, _ = ref.patch_pairs_reference(centers, ps, include_singleton=True)
    assert pairs.dtype == np.uint32  # the wraparound regression trigger
    w_np = ref.patch_graph_reference(affs, cons_np, pairs, ps, th=0.5,
                                     intersection_lcg=False)
    cons_j = consensus_array(affs, cfg)
    sym = symmetrize_consensus(cons_j, cfg)
    w_j = patch_graph_weights(affs, sym, pairs, cfg, drop_intersection=False)
    np.testing.assert_allclose(np.asarray(w_j), w_np, atol=1e-4, rtol=1e-4)


def test_jax_pipeline_end_to_end_labels():
    """Full pipeline with JAX kernels on ideal affinities -> exact labels."""
    ps = np.array([1, 5, 5])
    labels = synthetic.two_blob_labels_2d()
    affs = synthetic.labels_to_affinities(labels, ps)
    cfg = ConsensusConfig(patchshape=(1, 5, 5))
    mid = int(np.prod(ps)) // 2
    fg = affs[mid] > 0.5

    cons = consensus_array(affs, cfg)
    scores = np.asarray(rank_scores(affs, cons, cfg))
    rad = ps // 2
    interior = np.zeros_like(fg)
    interior[:, rad[1]:-rad[1], rad[2]:-rad[2]] = True
    all_patches = [tuple(c) for c in np.argwhere(fg & interior)]
    ranked = ref.rank_patch_list(all_patches, scores)
    selected, _ = ref.foreground_cover_reference(
        affs, fg, ranked, ps, sparse_data=True)
    thinned = ref.thin_out_cover_reference(affs, fg, selected, ps)
    pairs, _ = ref.patch_pairs_reference(thinned, ps)
    sym = symmetrize_consensus(cons, cfg)
    weights = np.asarray(patch_graph_weights(affs, sym, pairs, cfg))
    comps = ref.graph_components(pairs, weights)
    assert len(comps) == 2
    inst = ref.components_to_instances(comps, affs, ps, labels.shape)
    inst[~fg] = 0
    assert len(np.unique(inst[inst > 0])) == 2


def test_graph_components_device_matches_union_find():
    """Device label-propagation CC == host union-find, including the
    deterministic component/member enumeration order."""
    import numpy as np

    from patchperpix_tpu.ops import np_reference as ref
    from patchperpix_tpu.ops.graph_device import graph_components_device

    rng = np.random.RandomState(0)
    for trial in range(5):
        n = rng.randint(5, 40)
        pts = rng.randint(0, 30, size=(n, 3))
        # random edges among points (with duplicates + self pairs)
        m = rng.randint(4, 60)
        ii = rng.randint(0, n, size=m)
        jj = rng.randint(0, n, size=m)
        pairs = np.concatenate([pts[ii], pts[jj]], axis=1)
        weights = rng.randn(m).astype(np.float32)
        host = ref.graph_components(pairs, weights, mws=False)
        dev = graph_components_device(pairs, weights)
        assert [list(map(tuple, c)) for c in host] == \
            [list(map(tuple, c)) for c in dev], f"trial {trial}"


def test_graph_components_device_empty():
    import numpy as np

    from patchperpix_tpu.ops.graph_device import graph_components_device

    pairs = np.zeros((3, 6), np.int64)
    weights = np.array([-1.0, 0.0, -0.5], np.float32)
    assert graph_components_device(pairs, weights) == []


def test_consensus_bf16_storage_close():
    """cons_bf16 halves consensus HBM; values stay within bf16 tolerance
    and downstream ranking is unaffected at test scale."""
    import numpy as np

    from patchperpix_tpu.ops.consensus_jax import (ConsensusConfig,
                                                   consensus_array,
                                                   rank_scores)

    rng = np.random.RandomState(0)
    affs = rng.rand(27, 6, 8, 8).astype(np.float32)
    cfg32 = ConsensusConfig(patchshape=(3, 3, 3))
    cfg16 = ConsensusConfig(patchshape=(3, 3, 3), cons_bf16=True)
    c32 = np.asarray(consensus_array(affs, cfg32))
    c16 = np.asarray(consensus_array(affs, cfg16)).astype(np.float32)
    assert np.abs(c32 - c16).max() < 0.01
    s32 = np.asarray(rank_scores(affs, c32, cfg32))
    s16 = np.asarray(rank_scores(affs, c16, cfg16))
    assert np.abs(s32 - s16).max() < 0.02


def test_patch_graph_chunked_equals_sequential():
    """The chunked segment loop (PPP_GRAPH_CHUNK batching of the graph
    einsums) must reproduce the sequential per-segment loop exactly —
    many centers so n_seg spans several chunks, intersection correction
    ON (the panel/corr matmuls are the batched ops)."""
    ps = np.array([3, 3, 3])
    affs = _random_affs((14, 14, 14), 27, seed=11)
    cfg = ConsensusConfig(patchshape=(3, 3, 3))
    centers = [(np.array([z, y, x]), 1.0)
               for z in (3, 6, 9) for y in (3, 6, 9) for x in (3, 6, 9)]
    pairs, _ = ref.patch_pairs_reference(centers, ps,
                                         include_singleton=True)
    cons_j = consensus_array(affs, cfg)
    sym = symmetrize_consensus(cons_j, cfg)
    w_seq = np.asarray(patch_graph_weights(affs, sym, pairs, cfg,
                                           chunk=1))
    w_chk = np.asarray(patch_graph_weights(affs, sym, pairs, cfg,
                                           chunk=4))
    np.testing.assert_allclose(w_chk, w_seq, atol=1e-5, rtol=1e-5)
    assert np.any(w_seq != 0)
