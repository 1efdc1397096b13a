"""ISBI2012-specific assembly tweaks.

Reference: PatchPerPix/vote_instances/isbi_hacks.py:10-49 — for the dense
EM-neurite benchmark the patch grid is sparsified (every Nth foreground
pixel becomes a candidate patch) and pixels on instance boundaries are
removed from the fg-to-cover mask based on how many of their patch
neighbors disagree with them.
"""

from __future__ import annotations

import numpy as np

from ..ops.np_reference import patch_offsets


def sparsify_patches(all_patches, stride: int = 20):
    """Keep patches on the sparse coordinate grid ``coord % stride == 1``
    (every axis), matching isbi_hacks.py:10-14 (``np.all(p % 20 == 1)``) —
    a fixed grid over the volume, NOT every Nth list element."""
    return [p for p in all_patches
            if np.all(np.asarray(p) % stride == 1)]


def keep_single_slice(foreground: np.ndarray) -> np.ndarray:
    """ISBI one-slice hack: keep only z-slice 1 as foreground
    (vote_instances.py:215-218)."""
    out = foreground.copy()
    out[0] = 0
    out[2:] = 0
    return out


def filter_instance_boundaries_from_fg(
    pred_affs: np.ndarray,
    foreground: np.ndarray,
    all_patches,
    patchshape,
    mask_to_cover: np.ndarray,
    boundary_threshold: float = 0.5,
    patch_threshold: float = 0.5,
) -> np.ndarray:
    """Remove likely instance-boundary pixels from the cover mask.

    A fg pixel whose patch predicts background for more than
    ``boundary_threshold`` of its in-bounds fg neighbors is treated as a
    boundary pixel (isbi_hacks.py:19-49 semantics).
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    offs = patch_offsets(ps)
    vol_shape = np.array(foreground.shape)
    out = mask_to_cover.astype(bool).copy()

    for idx in all_patches:
        idx = np.asarray(idx)
        if np.any(idx < rad) or np.any(idx >= vol_shape - rad):
            continue
        patch = pred_affs[(slice(None),) + tuple(idx)]
        tgt = idx[None, :] + offs - rad[None, :]
        nb_fg = foreground[tuple(tgt.T)]
        n_fg = int(nb_fg.sum())
        if n_fg == 0:
            continue
        disagree = int(np.logical_and(nb_fg,
                                      patch < patch_threshold).sum())
        if disagree / n_fg > boundary_threshold:
            out[tuple(idx)] = False
    return out
