"""Sharded consensus/rank vs single-device: bit-identical results.

Runs on an 8-virtual-CPU-device mesh (the TPU analog of multi-node tests
without a cluster, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchperpix_tpu.ops.consensus_jax import (ConsensusConfig,
                                               consensus_array, rank_scores)
from patchperpix_tpu.parallel import (make_spatial_mesh,
                                      sharded_consensus_and_rank)


def _cpu_mesh(n):
    devices = jax.local_devices(backend="cpu")
    if len(devices) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devices)}")
    return make_spatial_mesh(n, backend="cpu")


def _random_affs(shape, P, seed=0):
    rng = np.random.RandomState(seed)
    affs = rng.rand(P, *shape).astype(np.float32)
    return np.where(affs > 0.5, 0.6 + 0.4 * affs, 0.4 * affs).astype(
        np.float32)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_matches_single_device(n_dev):
    mesh = _cpu_mesh(n_dev)
    cfg = ConsensusConfig(patchshape=(3, 3, 3))
    # local slab must cover the 3*rad halo: 8 devices need Z >= 24
    affs = _random_affs((24, 7, 8), 27, seed=3)

    cpu0 = jax.local_devices(backend="cpu")[0]
    affs_d = jax.device_put(jnp.asarray(affs), cpu0)
    cons_ref = np.asarray(consensus_array(affs_d, cfg))
    scores_ref = np.asarray(rank_scores(affs_d, jnp.asarray(cons_ref), cfg))

    cons_sh, scores_sh = sharded_consensus_and_rank(
        jnp.asarray(affs), cfg, mesh)
    np.testing.assert_allclose(np.asarray(cons_sh), cons_ref,
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scores_sh), scores_ref,
                               atol=1e-4, rtol=1e-4)


def test_sharded_with_overlap_mask():
    mesh = _cpu_mesh(4)
    cfg = ConsensusConfig(patchshape=(3, 3, 3), overlapping_inst=True)
    affs = _random_affs((12, 6, 7), 27, seed=5)
    overlap = np.zeros((12, 6, 7), dtype=bool)
    overlap[3:7, 2:4, 2:5] = True

    cpu0 = jax.local_devices(backend="cpu")[0]
    cons_ref = np.asarray(consensus_array(
        jax.device_put(jnp.asarray(affs), cpu0), cfg,
        overlap=jax.device_put(jnp.asarray(overlap), cpu0)))

    cons_sh, _ = sharded_consensus_and_rank(
        jnp.asarray(affs), cfg, mesh, overlap=jnp.asarray(overlap))
    np.testing.assert_allclose(np.asarray(cons_sh), cons_ref,
                               atol=1e-5, rtol=1e-5)


def test_to_instance_seg_sharded_param_matches_single_device():
    """The wired params.sharded_devices path through the full pipeline."""
    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
    from patchperpix_tpu.ops import synthetic

    if len(jax.local_devices(backend="cpu")) < 4:
        pytest.skip("needs 4 cpu devices")

    labels = synthetic.two_blob_labels_3d()
    ps = np.array([3, 3, 3])
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[int(np.prod(ps)) // 2] > 0.5
    numinst = fg.astype(np.uint8)

    base = dict(patchshape=(3, 3, 3), engine="jax", patch_threshold=0.5,
                fc_threshold=0.5, mws=False)
    inst0, _ = to_instance_seg(affs, fg, fg.copy(), numinst,
                               VoteInstancesParams(**base))
    inst_sh, _ = to_instance_seg(affs, fg, fg.copy(), numinst,
                                 VoteInstancesParams(sharded_devices=4,
                                                     **base))
    inst0 = np.asarray(inst0)
    inst_sh = np.asarray(inst_sh)
    # identical up to label permutation
    assert ((inst0 > 0) == (inst_sh > 0)).all()
    for i in np.unique(inst0[inst0 > 0]):
        vals = np.unique(inst_sh[inst0 == i])
        assert len(vals) == 1


def test_sharded_mesh_size_constraints():
    from patchperpix_tpu.assembly.vote_instances import (
        VoteInstancesParams, _sharded_mesh_size)

    ccfg = ConsensusConfig(patchshape=(3, 3, 3))
    p = VoteInstancesParams(sharded_devices=8)
    # Z=24: 8 shards of 3 == halo 3 -> ok
    assert _sharded_mesh_size(p, (24, 7, 8), ccfg) in (1, 2, 4, 8)
    # Z=10 cannot split into >=3-slice equal shards of 8; falls back
    assert _sharded_mesh_size(p, (10, 7, 8), ccfg) <= 2
    # off
    assert _sharded_mesh_size(VoteInstancesParams(), (24, 7, 8), ccfg) == 1


def test_sharded_center_valid_composes():
    """An external center_valid gate (the blockwise global-interior mask)
    halo-exchanges like the affinities and composes with the shard gate:
    result matches the single-device run with the same mask."""
    mesh = _cpu_mesh(4)
    cfg = ConsensusConfig(patchshape=(3, 3, 3))
    affs = _random_affs((16, 6, 7), 27, seed=7)
    cv = np.zeros((16, 6, 7), dtype=bool)
    cv[2:13, 1:5, 1:6] = True
    cv[5:8, :, :] = False           # a hole crossing a shard boundary

    cpu0 = jax.local_devices(backend="cpu")[0]
    affs_d = jax.device_put(jnp.asarray(affs), cpu0)
    cv_d = jax.device_put(jnp.asarray(cv), cpu0)
    cons_ref = np.asarray(consensus_array(affs_d, cfg, center_valid=cv_d))
    scores_ref = np.asarray(rank_scores(affs_d, jnp.asarray(cons_ref), cfg,
                                        center_valid=cv_d))

    cons_sh, scores_sh = sharded_consensus_and_rank(
        jnp.asarray(affs), cfg, mesh, center_valid=jnp.asarray(cv))
    np.testing.assert_allclose(np.asarray(cons_sh), cons_ref,
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scores_sh), scores_ref,
                               atol=1e-4, rtol=1e-4)


def test_blockwise_composes_with_sharded_devices():
    """Blockwise assembly with per-block z-sharding over the mesh (the
    VERDICT §9 composition): every block window runs sharded (its
    global-interior center_valid gate rides the halo exchange) and the
    stitched output matches the unsharded blockwise run."""
    from patchperpix_tpu.assembly import VoteInstancesParams
    from patchperpix_tpu.assembly.blockwise import blockwise_vote_instances
    from patchperpix_tpu.ops import synthetic

    if len(jax.local_devices(backend="cpu")) < 4:
        pytest.skip("needs 4 cpu devices")

    labels = np.zeros((20, 16, 16), dtype=np.int32)
    labels[2:9, 2:9, 2:9] = 1
    labels[11:18, 8:15, 8:15] = 2
    ps = np.array([3, 3, 3])
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[13] > 0.5
    base = dict(patchshape=(3, 3, 3), engine="jax",
                removeIntersection=False)
    ref_out, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8), VoteInstancesParams(**base),
        chunksize=(10, 16, 16))
    out, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8),
        VoteInstancesParams(sharded_devices=4, **base),
        chunksize=(10, 16, 16))
    ref_out[~fg] = 0
    out[~fg] = 0
    assert ((ref_out > 0) == (out > 0)).all()
    for i in np.unique(ref_out[ref_out > 0]):
        vals = np.unique(out[ref_out == i])
        assert len(vals) == 1


def test_sharded_patch_graph_weights_match():
    """Segment-sharded graph weights (mesh=) == single-device weights."""
    from patchperpix_tpu.ops import np_reference as ref
    from patchperpix_tpu.ops import synthetic
    from patchperpix_tpu.ops.consensus_jax import (patch_graph_weights,
                                                   symmetrize_consensus)

    mesh = _cpu_mesh(4)
    cfg = ConsensusConfig(patchshape=(3, 3, 3))
    labels = synthetic.two_blob_labels_3d()
    affs = synthetic.labels_to_affinities(labels, np.array([3, 3, 3]))
    cpu0 = jax.local_devices(backend="cpu")[0]
    affs_d = jax.device_put(jnp.asarray(affs), cpu0)
    cons = consensus_array(affs_d, cfg)
    sym = symmetrize_consensus(cons, cfg)

    fg = affs[13] > 0.5
    centers = np.argwhere(fg)[::3]
    pairs, _ = ref.patch_pairs_reference(
        [(tuple(c), 0.0) for c in centers], np.array([3, 3, 3]))
    assert len(pairs) > 8

    w0 = np.asarray(patch_graph_weights(affs_d, sym, pairs, cfg))
    w_sh = np.asarray(patch_graph_weights(affs_d, sym, pairs, cfg,
                                          mesh=mesh))
    np.testing.assert_allclose(w_sh, w0, atol=1e-5, rtol=1e-5)


def test_sharded_cover_min_scatter_matches():
    """z-sharded min-rank cover == single-device closed form (bit-exact
    selected set + running volume), including overlap-gated rows."""
    from patchperpix_tpu.ops import synthetic
    from patchperpix_tpu.ops.cover import greedy_cover_device

    mesh = _cpu_mesh(4)
    labels = np.zeros((16, 10, 12), dtype=np.int32)
    labels[1:8, 1:8, 1:9] = 1
    labels[9:15, 3:9, 4:11] = 2
    ps = np.array([3, 3, 3])
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[13] > 0.5
    interior = np.zeros_like(fg)
    interior[1:-1, 1:-1, 1:-1] = True
    centers = np.argwhere(fg & interior)
    rng = np.random.RandomState(0)
    order = rng.permutation(len(centers))
    ranked = [(tuple(centers[i]), float(len(centers) - k))
              for k, i in enumerate(order)]
    overlap = np.zeros_like(fg)
    overlap[7:9, 4:7, 4:7] = True

    cpu0 = jax.local_devices(backend="cpu")[0]
    affs_d = jax.device_put(jnp.asarray(affs), cpu0)
    sel0, run0 = greedy_cover_device(
        affs_d, fg.astype(np.float32), ranked, ps, sparse_data=True,
        overlap=overlap)
    sel1, run1 = greedy_cover_device(
        jnp.asarray(affs), fg.astype(np.float32), ranked, ps,
        sparse_data=True, overlap=overlap, mesh=mesh)
    assert [tuple(map(int, c)) for c, _ in sel0] \
        == [tuple(map(int, c)) for c, _ in sel1]
    np.testing.assert_array_equal(np.asarray(run0), np.asarray(run1))
