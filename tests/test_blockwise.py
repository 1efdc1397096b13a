"""Blockwise assembly: whole-vs-blockwise label equivalence (SURVEY.md §4:
'run blockwise on a small volume and assert label-equivalence (up to
relabeling) against the whole-volume path')."""

import numpy as np
import pytest

from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
from patchperpix_tpu.assembly.blockwise import (blockwise_vote_instances,
                                                get_offsets)
from patchperpix_tpu.ops import synthetic
from patchperpix_tpu.utils.postprocess import relabel


def test_get_offsets_grid():
    offs = get_offsets((10, 20, 5), (8, 8, 8))
    offs = np.array(offs)
    assert offs.shape == (2 * 3 * 1, 3)
    assert (offs[0] == [0, 0, 0]).all()
    assert offs.max(axis=0).tolist() == [8, 16, 0]


def _case_3d():
    labels = np.zeros((20, 28, 28), dtype=np.int32)
    labels[4:10, 4:12, 4:12] = 1
    labels[10:16, 14:24, 14:24] = 2
    labels[4:9, 16:24, 4:10] = 3
    ps = np.array([3, 3, 3])
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[13] > 0.5
    return labels, affs, fg


def test_blockwise_matches_whole_volume():
    labels, affs, fg = _case_3d()
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False)
    whole, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                               params)
    whole[~fg] = 0

    block, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8), params, chunksize=(14, 14, 14))
    block[~fg] = 0

    assert len(np.unique(whole[whole > 0])) == 3
    assert len(np.unique(block[block > 0])) == 3
    # label equivalence up to relabeling: matching partition of fg voxels
    wl, bl = relabel(whole), relabel(block)
    pairs = set(zip(wl[fg].tolist(), bl[fg].tolist()))
    assert len(pairs) == 3  # bijection between label sets


def test_blockwise_single_block_equals_whole():
    labels, affs, fg = _case_3d()
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False)
    whole, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                               params)
    block, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8), params, chunksize=(64, 64, 64))
    whole[~fg] = 0
    block[~fg] = 0
    pairs = set(zip(relabel(whole)[fg].tolist(), relabel(block)[fg].tolist()))
    assert len(pairs) == len(np.unique(whole[whole > 0]))


def test_blockwise_resume_dict():
    labels, affs, fg = _case_3d()
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False)
    cache: dict = {}
    b1, _ = blockwise_vote_instances(affs, fg, fg.astype(np.uint8), params,
                                     chunksize=(14, 14, 14),
                                     block_results=cache)
    assert len(cache) > 0
    # resume with the filled cache: no recompute, same result
    b2, _ = blockwise_vote_instances(affs, fg, fg.astype(np.uint8), params,
                                     chunksize=(14, 14, 14),
                                     block_results=dict(cache))
    np.testing.assert_array_equal(b1, b2)


def test_blockwise_empty_volume():
    affs = np.full((27, 10, 10, 10), 0.05, dtype=np.float32)
    fg = np.zeros((10, 10, 10), dtype=bool)
    params = VoteInstancesParams(patchshape=(3, 3, 3))
    inst, _ = blockwise_vote_instances(affs, fg, fg.astype(np.uint8),
                                       params, chunksize=(8, 8, 8))
    assert inst.sum() == 0
