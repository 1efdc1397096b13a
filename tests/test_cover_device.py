"""Device cover stages vs the host golden reference."""

import numpy as np
import pytest

from patchperpix_tpu.ops import np_reference as ref
from patchperpix_tpu.ops import synthetic
from patchperpix_tpu.ops.cover import (greedy_cover_device,
                                       thin_out_cover_device)


def _case(seed=0, ps=(1, 5, 5)):
    labels = synthetic.two_blob_labels_2d()
    affs = synthetic.labels_to_affinities(labels, np.array(ps))
    mid = int(np.prod(ps)) // 2
    fg = affs[mid] > 0.5
    return labels, affs, fg


def _ranked(affs, fg, ps):
    from patchperpix_tpu.ops.consensus_jax import (ConsensusConfig,
                                                   consensus_array,
                                                   rank_scores)

    cfg = ConsensusConfig(patchshape=tuple(int(p) for p in ps))
    cons = consensus_array(affs, cfg)
    scores = np.asarray(rank_scores(affs, cons, cfg))
    rad = np.asarray(ps) // 2
    interior = np.zeros_like(fg)
    interior[tuple(slice(int(r), int(s - r))
                   for r, s in zip(rad, fg.shape))] = True
    allp = [tuple(c) for c in np.argwhere(fg & interior)]
    return ref.rank_patch_list(allp, scores)


@pytest.mark.parametrize("sparse", [True, False])
def test_greedy_cover_parity(sparse):
    ps = np.array([1, 5, 5])
    labels, affs, fg = _case()
    ranked = _ranked(affs, fg, ps)
    sel_host, run_host = ref.foreground_cover_reference(
        affs, fg, ranked, ps, sparse_data=sparse)
    sel_dev, run_dev = greedy_cover_device(
        affs, fg, ranked, ps, sparse_data=sparse)
    host_centers = [tuple(rp[0]) for rp in sel_host]
    dev_centers = [tuple(rp[0]) for rp in sel_dev]
    assert host_centers == dev_centers
    np.testing.assert_array_equal(run_host, run_dev)


def test_thin_cover_parity():
    ps = np.array([1, 5, 5])
    labels, affs, fg = _case()
    ranked = _ranked(affs, fg, ps)
    selected, _ = ref.foreground_cover_reference(
        affs, fg, ranked, ps, sparse_data=True)
    thin_host = ref.thin_out_cover_reference(affs, fg, selected, ps)
    thin_dev = thin_out_cover_device(affs, fg, selected, ps)
    assert [tuple(rp[0]) for rp in thin_host] == \
        [tuple(rp[0]) for rp in thin_dev]


def test_thin_cover_parity_3d():
    ps = np.array([3, 3, 3])
    labels = synthetic.two_blob_labels_3d()
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[13] > 0.5
    ranked = _ranked(affs, fg, ps)
    selected, _ = ref.foreground_cover_reference(
        affs, fg, ranked, ps, sparse_data=True)
    thin_host = ref.thin_out_cover_reference(affs, fg, selected, ps)
    thin_dev = thin_out_cover_device(affs, fg, selected, ps)
    assert [tuple(rp[0]) for rp in thin_host] == \
        [tuple(rp[0]) for rp in thin_dev]


def test_thin_cover_selects_final_zero_gain_patch():
    """The reference marks selected[best] BEFORE its zero-size loop break,
    so when uncovered fg remains that no patch can cover, one zero-gain
    patch is still selected - the device loops must match."""
    ps = np.array([1, 3, 3])
    vol = (1, 12, 12)
    P = 9
    affs = np.zeros((P,) + vol, np.float32)
    # one patch at (0,5,5) covering only its center
    affs[P // 2, 0, 5, 5] = 1.0
    mask = np.zeros(vol, bool)
    mask[0, 5, 5] = True
    mask[0, 8, 8] = True  # uncoverable fg pixel keeps the loop alive
    patches = [((0, 5, 5), 1.0), ((0, 2, 2), 0.5)]
    host = ref.thin_out_cover_reference(affs, mask.copy(), patches, ps)
    dev = thin_out_cover_device(affs, mask.copy(), patches, ps)
    assert [tuple(p[0]) for p in host] == [tuple(p[0]) for p in dev]
