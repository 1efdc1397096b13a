"""Pallas consensus kernel logic vs XLA scan, in interpret mode (no TPU).

The tpu-marked tests in test_pallas_consensus.py exercise the real Mosaic
compile; this file runs the same parity checks through the Pallas
interpreter so the kernel's loop/band/self-pair logic is covered in the
default CPU tier.

Contract under test: ``consensus_array_pallas`` emits the CANONICAL HALF
(dz >= 0 planes; equals ``consensus_array(...)[psz-1:]``), ``symmetrize_half``
of it equals the symmetrized XLA consensus, and ``rank_scores_pallas``
consumes the half directly.
"""

import numpy as np
import pytest

from patchperpix_tpu.ops.consensus_jax import (ConsensusConfig,
                                               consensus_array,
                                               symmetrize_consensus,
                                               symmetrize_half)
from patchperpix_tpu.ops.pallas_consensus import consensus_array_pallas


def _random_affs(shape, P, seed=0):
    rng = np.random.RandomState(seed)
    affs = rng.rand(P, *shape).astype(np.float32)
    return np.where(affs > 0.5, 0.6 + 0.4 * affs, 0.4 * affs).astype(
        np.float32)


def _check_half_and_sym(affs, cfg, overlap=None):
    psz = int(cfg.ps[0])
    canon = np.asarray(consensus_array(affs, cfg, overlap=overlap))
    half = consensus_array_pallas(affs, cfg, overlap=overlap,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(half), canon[psz - 1:],
                               atol=1e-4, rtol=1e-4)
    sym = np.asarray(symmetrize_consensus(canon, cfg))
    got_sym = np.asarray(symmetrize_half(half, cfg))
    np.testing.assert_allclose(got_sym, sym, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("kwargs", [
    {},
    pytest.param({"weight_mode": "count", "norm_aff": False},
                 marks=pytest.mark.slow),
    pytest.param({"weight_mode": "prob_product"},
                 marks=pytest.mark.slow),
])
def test_pallas_interpret_equals_canonical_xla(kwargs):
    affs = _random_affs((8, 9, 10), 27, seed=1)
    cfg = ConsensusConfig(patchshape=(3, 3, 3), **kwargs)
    _check_half_and_sym(affs, cfg)


def test_pallas_interpret_overlap_variant():
    affs = _random_affs((8, 9, 10), 27, seed=2)
    ov = np.zeros((8, 9, 10), bool)
    ov[3:5, 3:6, 2:5] = True
    cfg = ConsensusConfig(patchshape=(3, 3, 3), overlapping_inst=True)
    _check_half_and_sym(affs, cfg, overlap=ov)


def test_pallas_interpret_anisotropic_patch():
    """ps_y != ps_x exercises asymmetric band bounds (psz == 1 exercises
    the degenerate canonical dz axis)."""
    affs = _random_affs((7, 11, 9), 15, seed=3)
    cfg = ConsensusConfig(patchshape=(1, 5, 3))
    _check_half_and_sym(affs, cfg)


def test_pallas_rank_interpret_equals_xla():
    """Pallas rank (canonical-half sum) vs XLA-scan rank_scores."""
    from patchperpix_tpu.ops.consensus_jax import rank_scores
    from patchperpix_tpu.ops.pallas_consensus import rank_scores_pallas

    affs = _random_affs((8, 9, 10), 27, seed=4)
    cfg = ConsensusConfig(patchshape=(3, 3, 3))
    cons = consensus_array(affs, cfg)
    want = np.asarray(rank_scores(affs, cons, cfg))
    half = consensus_array_pallas(affs, cfg, interpret=True)
    got = np.asarray(rank_scores_pallas(affs, half, cfg, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_pallas_rank_interpret_overlap_and_int_counter():
    from patchperpix_tpu.ops.consensus_jax import rank_scores
    from patchperpix_tpu.ops.pallas_consensus import rank_scores_pallas

    affs = _random_affs((8, 9, 10), 27, seed=5)
    ov = np.zeros((8, 9, 10), bool)
    ov[3:5, 3:6, 2:5] = True
    cfg = ConsensusConfig(patchshape=(3, 3, 3), overlapping_inst=True,
                          rank_int_counter=True)
    cons = consensus_array(affs, cfg, overlap=ov)
    want = np.asarray(rank_scores(affs, cons, cfg, overlap=ov))
    half = consensus_array_pallas(affs, cfg, overlap=ov, interpret=True)
    got = np.asarray(rank_scores_pallas(affs, half, cfg, overlap=ov,
                                        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_fold2x_interpret_matches_unfolded():
    """2x z->x lane folding == unfolded consensus + rank (interpret)."""
    from patchperpix_tpu.ops.consensus_jax import rank_scores
    from patchperpix_tpu.ops.pallas_consensus import (
        consensus_and_rank_pallas_fold2x, fold2x_geometry)

    affs = _random_affs((13, 8, 10), 27, seed=6)
    cfg = ConsensusConfig(patchshape=(3, 3, 3))
    geom = fold2x_geometry(cfg, (13, 8, 10))
    assert geom is not None
    want_cons = np.asarray(consensus_array_pallas(affs, cfg,
                                                  interpret=True))
    want_scores = np.asarray(rank_scores(
        affs, consensus_array(affs, cfg), cfg))
    cons, scores = consensus_and_rank_pallas_fold2x(
        affs, cfg, geom, interpret=True)
    np.testing.assert_allclose(np.asarray(cons), want_cons,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), want_scores,
                               atol=1e-3, rtol=1e-4)


@pytest.mark.slow
def test_fold2x_interpret_overlap_variant():
    from patchperpix_tpu.ops.consensus_jax import rank_scores
    from patchperpix_tpu.ops.pallas_consensus import (
        consensus_and_rank_pallas_fold2x, fold2x_geometry)

    affs = _random_affs((14, 8, 10), 27, seed=7)
    ov = np.zeros((14, 8, 10), bool)
    ov[5:9, 3:6, 2:5] = True
    cfg = ConsensusConfig(patchshape=(3, 3, 3), overlapping_inst=True)
    geom = fold2x_geometry(cfg, (14, 8, 10))
    assert geom is not None
    want_cons = np.asarray(consensus_array_pallas(affs, cfg, overlap=ov,
                                                  interpret=True))
    want_scores = np.asarray(rank_scores(
        affs, consensus_array(affs, cfg, overlap=ov), cfg, overlap=ov))
    cons, scores = consensus_and_rank_pallas_fold2x(
        affs, cfg, geom, overlap=ov, interpret=True)
    np.testing.assert_allclose(np.asarray(cons), want_cons,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), want_scores,
                               atol=1e-3, rtol=1e-4)


def test_fold2x_interpret_overlap_small():
    """Default-tier fold2x + overlapping_inst coverage (ADVICE r3): the
    full-size variant above is slow-tier; this shrunken volume keeps the
    3D fold kernel's overlap path exercised in every run."""
    from patchperpix_tpu.ops.consensus_jax import rank_scores
    from patchperpix_tpu.ops.pallas_consensus import (
        consensus_and_rank_pallas_fold2x, fold2x_geometry)

    affs = _random_affs((12, 6, 8), 27, seed=11)
    ov = np.zeros((12, 6, 8), bool)
    ov[3:6, 2:4, 2:5] = True
    cfg = ConsensusConfig(patchshape=(3, 3, 3), overlapping_inst=True)
    geom = fold2x_geometry(cfg, (12, 6, 8))
    assert geom is not None
    want_cons = np.asarray(consensus_array_pallas(affs, cfg, overlap=ov,
                                                  interpret=True))
    want_scores = np.asarray(rank_scores(
        affs, consensus_array(affs, cfg, overlap=ov), cfg, overlap=ov))
    cons, scores = consensus_and_rank_pallas_fold2x(
        affs, cfg, geom, overlap=ov, interpret=True)
    np.testing.assert_allclose(np.asarray(cons), want_cons,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), want_scores,
                               atol=1e-3, rtol=1e-4)
