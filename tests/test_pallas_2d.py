"""2D row-folded Pallas consensus + rank vs the XLA scan reference.

Default tier runs the kernels through the Pallas interpreter on CPU;
tpu-marked tests exercise the real Mosaic compile (the whole point of
the fold design: single-z grids miscompile, so 2D rides a (slab, V=8)
row fold instead — see ops/pallas_consensus_2d.py).
"""

import numpy as np
import pytest

from patchperpix_tpu.ops.consensus_jax import (ConsensusConfig,
                                               consensus_array,
                                               rank_scores,
                                               symmetrize_consensus)
from patchperpix_tpu.ops.pallas_consensus_2d import (
    consensus_fold_pallas_2d, pallas2d_supported, rank_and_unfold_pallas_2d,
    rank_scores_fold_pallas_2d, unfold_consensus)


def _random_affs(shape, P, seed=0):
    rng = np.random.RandomState(seed)
    affs = rng.rand(P, *shape).astype(np.float32)
    return np.where(affs > 0.5, 0.6 + 0.4 * affs, 0.4 * affs).astype(
        np.float32)


def _check(p, shape, seed, interpret, ckw=None, overlap=None,
           center_valid=None):
    cfg = ConsensusConfig(patchshape=(1, p, p), **(ckw or {}))
    assert pallas2d_supported(cfg, shape)
    affs = _random_affs(shape, p * p, seed=seed)
    cons = consensus_array(affs, cfg, overlap=overlap,
                           center_valid=center_valid)
    sym = np.asarray(symmetrize_consensus(cons, cfg))
    Sf = consensus_fold_pallas_2d(affs, cfg, overlap=overlap,
                                  center_valid=center_valid,
                                  interpret=interpret)
    got = np.asarray(unfold_consensus(Sf, cfg, shape))
    np.testing.assert_allclose(got, sym, atol=1e-4, rtol=1e-4)
    want_r = np.asarray(rank_scores(affs, cons, cfg, overlap=overlap,
                                    center_valid=center_valid))
    got_r = np.asarray(rank_scores_fold_pallas_2d(
        affs, Sf, cfg, overlap=overlap, center_valid=center_valid,
        interpret=interpret))
    np.testing.assert_allclose(got_r, want_r, atol=1e-3, rtol=1e-4)
    # fused rank + unfold (the production wiring; donates the fold array)
    fs, fc = rank_and_unfold_pallas_2d(
        affs, Sf, cfg, overlap=overlap, center_valid=center_valid,
        interpret=interpret)
    np.testing.assert_allclose(np.asarray(fs), want_r, atol=1e-3,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fc), sym, atol=1e-4, rtol=1e-4)


def test_supported_predicate():
    cfg2d = ConsensusConfig(patchshape=(1, 5, 5))
    assert pallas2d_supported(cfg2d, (1, 30, 40))
    assert not pallas2d_supported(cfg2d, (4, 30, 40))
    assert not pallas2d_supported(ConsensusConfig(patchshape=(3, 3, 3)),
                                  (8, 9, 10))
    assert not pallas2d_supported(ConsensusConfig(patchshape=(1, 4, 4)),
                                  (1, 30, 40))
    assert not pallas2d_supported(ConsensusConfig(patchshape=(1, 5, 3)),
                                  (1, 30, 40))


def test_interpret_parity_p5():
    # H not a multiple of 8 exercises the bottom slab padding (small
    # geometry: the interpreter is python-per-grid-step on one CPU core)
    _check(5, (1, 11, 15), seed=1, interpret=True)


@pytest.mark.slow
def test_interpret_parity_p7():
    _check(7, (1, 26, 17), seed=2, interpret=True)


def test_interpret_overlap_variant():
    shape = (1, 13, 12)
    ov = np.zeros(shape, bool)
    ov[0, 5:9, 3:7] = True
    _check(5, shape, seed=3, interpret=True,
           ckw={"overlapping_inst": True}, overlap=ov)


@pytest.mark.slow
@pytest.mark.parametrize("ckw", [
    {"weight_mode": "prob_product"},
    {"weight_mode": "count", "norm_aff": False},
    {"rank_int_counter": True},
])
def test_interpret_weight_modes(ckw):
    _check(5, (1, 21, 18), seed=4, interpret=True, ckw=ckw)


def test_interpret_bf16_fold():
    """bf16 fold storage (the 2D default at dataset scale): parity within
    bf16 tolerance, fold/unfold dtypes preserved."""
    import jax.numpy as jnp

    p, shape = 5, (1, 11, 15)
    cfg = ConsensusConfig(patchshape=(1, p, p), cons_bf16=True)
    affs = _random_affs(shape, p * p, seed=7)
    cfg32 = ConsensusConfig(patchshape=(1, p, p))
    want = np.asarray(symmetrize_consensus(
        consensus_array(affs, cfg32), cfg32))
    Sf = consensus_fold_pallas_2d(affs, cfg, interpret=True)
    assert Sf.dtype == jnp.bfloat16
    got = unfold_consensus(Sf, cfg, shape)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=5e-3, rtol=2e-2)
    want_r = np.asarray(rank_scores(affs, consensus_array(affs, cfg32),
                                    cfg32))
    got_r = np.asarray(rank_scores_fold_pallas_2d(affs, Sf, cfg,
                                                  interpret=True))
    # norm_rank sentinel is exactly -1.0 on both sides
    np.testing.assert_allclose(got_r, want_r, atol=5e-2, rtol=2e-2)


@pytest.mark.tpu
def test_pipeline_2d_pallas_matches_scan():
    """Full to_instance_seg on a 2D volume: the pallas2d wiring
    (fold consensus -> fused rank+unfold -> graph) must produce the
    same instance map as the XLA-scan path (PPP_DISABLE_PALLAS2D)."""
    import os

    from patchperpix_tpu.assembly import (VoteInstancesParams,
                                          to_instance_seg)
    from patchperpix_tpu.ops.synthetic import labels_to_affinities
    from patchperpix_tpu.utils.postprocess import relabel

    labels = np.zeros((1, 40, 46), np.int32)
    labels[0, 6:12, 5:30] = 1          # two elongated blobs + one square
    labels[0, 20:26, 12:40] = 2
    labels[0, 30:38, 4:12] = 3
    ps = (1, 5, 5)
    affs = labels_to_affinities(labels, np.array(ps))
    fg = labels > 0
    params = VoteInstancesParams(patchshape=ps, engine="jax",
                                 mws=True,
                                 select_patches_for_sparse_data=True)
    res = {}
    for mode in ("pallas2d", "scan"):
        if mode == "scan":
            os.environ["PPP_DISABLE_PALLAS2D"] = "1"
        try:
            inst, _ = to_instance_seg(affs, fg, fg.copy(),
                                      fg.astype(np.uint8), params)
        finally:
            os.environ.pop("PPP_DISABLE_PALLAS2D", None)
        res[mode] = relabel(np.asarray(inst))
    np.testing.assert_array_equal(res["pallas2d"], res["scan"])
    assert len(np.unique(res["scan"][res["scan"] > 0])) == 3


@pytest.mark.tpu
def test_mosaic_parity_p7():
    """Real Mosaic compile: the fold must dodge the single-z miscompile."""
    _check(7, (1, 40, 50), seed=11, interpret=False)


@pytest.mark.tpu
def test_mosaic_parity_p5_overlap():
    shape = (1, 33, 29)
    ov = np.zeros(shape, bool)
    ov[0, 10:20, 8:16] = True
    _check(5, shape, seed=12, interpret=False,
           ckw={"overlapping_inst": True}, overlap=ov)
