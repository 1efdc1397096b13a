"""Flip test-time averaging: the unflip + channel-permutation identity.

The load-bearing claim of ``infer/tta.py`` is that a patch-affinity
volume predicted on a FLIPPED input maps back to the canonical
orientation via a spatial unflip plus the mirrored patch-channel
permutation.  GT affinities are flip-covariant by construction, so the
identity is testable exactly: affinities computed on flipped labels,
mapped back, must equal affinities computed on the original labels.
"""

import numpy as np
import pytest

from patchperpix_tpu.infer.tta import (all_flips, average_affs,
                                       flip_channel_perm, unflip_affs,
                                       unflip_volume)
from patchperpix_tpu.ops.synthetic import labels_to_affinities_multi


def _labels_3d():
    rng = np.random.default_rng(7)
    labels = np.zeros((2, 12, 13, 14), dtype=np.int32)
    labels[0, 2:7, 3:9, 4:11] = 1
    labels[1, 5:11, 1:6, 2:8] = 2
    # poke holes so flips are not accidentally symmetric
    mask = rng.random(labels.shape[1:]) < 0.2
    labels[:, mask] = 0
    return labels


def test_flip_channel_perm_involution():
    ps = (7, 7, 7)
    for axes in all_flips(3):
        perm = flip_channel_perm(ps, axes)
        assert np.array_equal(perm[perm], np.arange(343))


@pytest.mark.parametrize("axes", all_flips(3)[1:])
def test_unflip_matches_canonical_gt_affs(axes):
    ps = (5, 5, 5)
    labels = _labels_3d()
    affs = labels_to_affinities_multi(labels, ps)
    labels_f = np.flip(labels, tuple(a + 1 for a in axes))
    affs_f = labels_to_affinities_multi(labels_f, ps)
    back = unflip_affs(affs_f, axes, ps)
    assert np.array_equal(back, affs)


def test_unflip_matches_canonical_gt_affs_2d():
    ps = (9, 9)
    labels = _labels_3d()[:, 0]  # (C, 13, 14)
    affs = labels_to_affinities_multi(labels, ps)
    for axes in all_flips(2)[1:]:
        labels_f = np.flip(labels, tuple(a + 1 for a in axes))
        affs_f = labels_to_affinities_multi(labels_f, ps)
        assert np.array_equal(unflip_affs(affs_f, axes, ps), affs)


def test_average_affs_of_covariant_predictions_is_identity():
    """If every flip predicts the (flipped) GT exactly, the TTA average
    equals the GT — averaging must not smear anything."""
    ps = (5, 5, 5)
    labels = _labels_3d()
    affs = labels_to_affinities_multi(labels, ps)
    heads = []
    for axes in all_flips(3):
        labels_f = np.flip(labels, tuple(a + 1 for a in axes))
        heads.append((axes, labels_to_affinities_multi(labels_f, ps)))
    mean = average_affs(heads, ps)
    assert np.allclose(np.asarray(mean), affs)


def test_unflip_volume_no_channel_perm():
    vol = np.arange(3 * 4 * 5 * 6, dtype=np.float32).reshape(3, 4, 5, 6)
    for axes in all_flips(3):
        back = unflip_volume(unflip_volume(vol, axes), axes)
        assert np.array_equal(np.asarray(back), vol)
