"""Pallas consensus kernel vs the XLA scan formulation (real Mosaic)."""

import numpy as np
import pytest

from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
from patchperpix_tpu.ops import synthetic
from patchperpix_tpu.ops.consensus_jax import (ConsensusConfig,
                                               consensus_array,
                                               symmetrize_consensus,
                                               symmetrize_half)
from patchperpix_tpu.ops.pallas_consensus import consensus_array_pallas
from patchperpix_tpu.utils.postprocess import relabel

pytestmark = pytest.mark.tpu


def _random_affs(shape, P, seed=0):
    rng = np.random.RandomState(seed)
    affs = rng.rand(P, *shape).astype(np.float32)
    return np.where(affs > 0.5, 0.6 + 0.4 * affs, 0.4 * affs).astype(
        np.float32)


@pytest.mark.parametrize("kwargs", [
    {},
    {"weight_mode": "count", "norm_aff": False},
    {"weight_mode": "prob_product"},
])
def test_pallas_equals_canonical_xla(kwargs):
    affs = _random_affs((8, 9, 10), 27, seed=1)
    cfg = ConsensusConfig(patchshape=(3, 3, 3), **kwargs)
    psz = int(cfg.ps[0])
    canon = np.asarray(consensus_array(affs, cfg))
    half = consensus_array_pallas(affs, cfg)
    np.testing.assert_allclose(np.asarray(half), canon[psz - 1:],
                               atol=1e-4, rtol=1e-4)
    sym = np.asarray(symmetrize_consensus(canon, cfg))
    np.testing.assert_allclose(np.asarray(symmetrize_half(half, cfg)),
                               sym, atol=1e-4, rtol=1e-4)


def test_pallas_overlap_variant():
    affs = _random_affs((8, 9, 10), 27, seed=2)
    ov = np.zeros((8, 9, 10), bool)
    ov[3:5, 3:6, 2:5] = True
    cfg = ConsensusConfig(patchshape=(3, 3, 3), overlapping_inst=True)
    psz = int(cfg.ps[0])
    canon = np.asarray(consensus_array(affs, cfg, overlap=ov))
    out = np.asarray(consensus_array_pallas(affs, cfg, overlap=ov))
    np.testing.assert_allclose(out, canon[psz - 1:], atol=1e-4, rtol=1e-4)


def test_pipeline_pallas_engine_matches_jax():
    labels = synthetic.two_blob_labels_3d()
    ps = (3, 3, 3)
    affs = synthetic.labels_to_affinities(labels, np.array(ps))
    fg = affs[13] > 0.5
    res = {}
    for engine in ("jax", "pallas"):
        params = VoteInstancesParams(patchshape=ps, engine=engine,
                                     removeIntersection=False)
        inst, _ = to_instance_seg(affs, fg, fg.copy(),
                                  fg.astype(np.uint8), params)
        res[engine] = relabel(inst)
    np.testing.assert_array_equal(res["jax"], res["pallas"])


def test_pallas_rank_equals_xla_on_tpu():
    """Real Mosaic compile of the rank kernel (7^3 included: the shipped
    flagship patchshape)."""
    from patchperpix_tpu.ops.consensus_jax import rank_scores
    from patchperpix_tpu.ops.pallas_consensus import rank_scores_pallas

    for ps, shape, P in (((3, 3, 3), (8, 9, 10), 27),
                         ((7, 7, 7), (14, 15, 16), 343)):
        affs = _random_affs(shape, P, seed=6)
        cfg = ConsensusConfig(patchshape=ps)
        cons = consensus_array(affs, cfg)
        want = np.asarray(rank_scores(affs, cons, cfg))
        half = consensus_array_pallas(affs, cfg)
        got = np.asarray(rank_scores_pallas(affs, half, cfg))
        np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-3)


def test_fold2x_matches_unfolded_on_tpu():
    """Real Mosaic compile of the 2x z->x folded consensus+rank at the
    flagship 7^3 patchshape (folded row must fit the 128-lane tile)."""
    from patchperpix_tpu.ops.consensus_jax import rank_scores
    from patchperpix_tpu.ops.pallas_consensus import (
        consensus_and_rank_pallas_fold2x, fold2x_geometry)

    for ps, shape, P in (((3, 3, 3), (13, 8, 10), 27),
                         ((7, 7, 7), (38, 20, 22), 343)):
        affs = _random_affs(shape, P, seed=8)
        cfg = ConsensusConfig(patchshape=ps)
        geom = fold2x_geometry(cfg, shape)
        assert geom is not None
        want_cons = np.asarray(consensus_array_pallas(affs, cfg))
        cons_j = consensus_array(affs, cfg)
        want_scores = np.asarray(rank_scores(affs, cons_j, cfg))
        cons, scores = consensus_and_rank_pallas_fold2x(affs, cfg, geom)
        np.testing.assert_allclose(np.asarray(cons), want_cons,
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(scores), want_scores,
                                   atol=1e-2, rtol=1e-3)
