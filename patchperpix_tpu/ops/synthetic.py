"""Synthetic affinity generation for tests and oracles.

Given a label volume, produce the ideal dense patch-affinity prediction the
network is trained to emit: channel p at voxel c is 1 iff c is foreground and
voxel ``c + unravel(p) - rad`` carries the same label (util/train_util.py
seg_to_affgraph_* semantics, single-channel case).
"""

from __future__ import annotations

import numpy as np

from .np_reference import patch_offsets


def labels_to_affinities(labels: np.ndarray, patchshape,
                         hi: float = 0.95, lo: float = 0.05) -> np.ndarray:
    """(P, *vol) float32 ideal affinities from an integer label volume.

    Out-of-bounds neighbors and background centers get ``lo``; ``hi``/``lo``
    default slightly inside (0,1) so thresholding at 0.5 behaves like the
    sigmoid outputs the kernels see.
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    offs = patch_offsets(ps)
    vol_shape = np.array(labels.shape)
    P = len(offs)
    affs = np.full((P,) + tuple(vol_shape), lo, dtype=np.float32)

    coords = np.argwhere(labels > 0)
    if len(coords) == 0:
        return affs
    lab = labels[tuple(coords.T)]
    for p in range(P):
        tgt = coords + offs[p] - rad
        ok = np.all((tgt >= 0) & (tgt < vol_shape), axis=1)
        same = np.zeros(len(coords), dtype=bool)
        if ok.any():
            same[ok] = labels[tuple(tgt[ok].T)] == lab[ok]
        sel = coords[same]
        if len(sel):
            affs[(p,) + tuple(sel.T)] = hi
    return affs


def labels_to_affinities_multi(labels: np.ndarray, patchshape,
                               hi: float = 0.95,
                               lo: float = 0.05) -> np.ndarray:
    """Multi-channel GT (one instance per channel, overlapping) to ideal
    dense affinities, vectorized with shifted slices.

    labels: (C, *vol) int.  Affinity p at voxel x is ``hi`` iff some channel
    carries the same non-zero label at x and x + off(p) - rad, gated on both
    voxels being foreground in any channel (train_util.py multi semantics).
    Out-of-bounds neighbors and background centers get ``lo``.
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    offs = patch_offsets(ps)
    vol_shape = np.array(labels.shape[1:])
    ndim = len(vol_shape)
    P = len(offs)
    fg = np.any(labels > 0, axis=0)
    affs = np.full((P,) + tuple(vol_shape), lo, dtype=np.float32)

    for p in range(P):
        d = offs[p] - rad
        src = tuple(slice(max(0, -dd), min(s, s - dd))
                    for dd, s in zip(d, vol_shape))
        dst = tuple(slice(max(0, dd), min(s, s + dd))
                    for dd, s in zip(d, vol_shape))
        center = labels[(slice(None),) + src]
        other = labels[(slice(None),) + dst]
        same = np.any((center == other) & (center != 0), axis=0)
        same &= fg[src] & fg[dst]
        affs[(p,) + src][same] = hi
    return affs


def two_blob_labels_2d(h: int = 20, w: int = 20) -> np.ndarray:
    """Two rectangular instances with a 1px gap, as (1, h, w) labels."""
    labels = np.zeros((1, h, w), dtype=np.int32)
    labels[0, 3:9, 3:15] = 1
    labels[0, 11:17, 4:16] = 2
    return labels


def two_blob_labels_3d(s: int = 14) -> np.ndarray:
    labels = np.zeros((s, s, s), dtype=np.int32)
    labels[3:7, 3:11, 3:11] = 1
    labels[8:12, 3:11, 3:11] = 2
    return labels
