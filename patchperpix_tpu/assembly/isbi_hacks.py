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


def sparsify_patches(all_patches, stride: int = 20, vol_shape=None):
    """Keep patches on the sparse coordinate grid ``coord % stride == 1``
    (every axis), matching isbi_hacks.py:10-14 (``np.all(p % 20 == 1)``) —
    a fixed grid over the volume, NOT every Nth list element.

    Flat axes (volume extent 1) always pass: the reference's ISBI stack
    keeps slice z=1 (``keep_single_slice``), whose coordinate passes
    ``1 % 20 == 1`` by construction; a flat single-slice volume has only
    z=0, which must not empty the candidate grid.
    """
    if not all_patches:
        return all_patches
    pts = np.asarray(list(all_patches), dtype=np.int64)
    on_grid = pts % stride == 1
    if vol_shape is not None:
        flat = np.asarray(vol_shape, dtype=np.int64) == 1
        on_grid |= flat[None, :]
    keep = np.all(on_grid, axis=1)
    return [tuple(p) for p in pts[keep]]


def keep_single_slice(foreground: np.ndarray) -> np.ndarray:
    """ISBI one-slice hack: keep only z-slice 1 as foreground
    (vote_instances.py:215-218)."""
    out = foreground.copy()
    out[0] = 0
    out[2:] = 0
    return out


def _ball(radius: int) -> np.ndarray:
    """3D ball structuring element (skimage.morphology.ball semantics:
    z^2+y^2+x^2 <= r^2)."""
    zz, yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1,
                          -radius:radius + 1]
    return (zz * zz + yy * yy + xx * xx) <= radius * radius


def filter_instance_boundaries_from_fg(
    pred_affs: np.ndarray,
    foreground: np.ndarray,
    all_patches,
    patchshape,
    mask_to_cover: np.ndarray,
    boundary_count_factor: float = 0.33,
    patch_threshold: float = 0.5,
) -> np.ndarray:
    """Remove likely instance-boundary pixels from the cover mask.

    Exact reference semantics (isbi_hacks.py:34-48 ``boundary_count``
    via get_patch_sets.py ``get_boundary_set``): per in-bounds patch,
    threshold the patch at ``patch_threshold``, grow it by a radius-2
    ball dilation, and take the dilation RING (grown minus patch) as
    that patch's boundary set.  A pixel is dropped from the cover mask
    when it lies in the ring of at least
    ``boundary_count_factor * prod(patchshape[1:])`` patches.
    """
    from scipy.ndimage import binary_dilation

    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    offs = patch_offsets(ps)
    vol_shape = np.array(foreground.shape)
    centers = np.asarray(list(all_patches), dtype=np.int64).reshape(
        -1, len(vol_shape))
    if centers.size:
        ok = np.all(centers >= rad, axis=1) & np.all(
            centers + rad + 1 <= vol_shape, axis=1)
        centers = centers[ok]
    if not centers.size:
        return mask_to_cover.astype(bool).copy()

    # all patch windows at once: (N, prod(ps)) -> (N, *ps) binary
    patches = pred_affs[(slice(None),) + tuple(centers.T)].T
    patches = (patches > patch_threshold).reshape(
        (len(centers),) + tuple(ps))
    # one 4D dilation, no connectivity across the patch axis (the
    # reference's per-patch skimage binary_dilation with border value 0)
    struct = _ball(2)[None]
    grown = binary_dilation(patches, structure=struct)
    ring = grown & ~patches  # patch_grow - patch

    # boundary_count[pixel] += 1 per patch whose ring contains it
    # (the reference additionally ANDs with an all-ones foreground,
    # get_boundary_set's ``foreground`` argument — a no-op)
    tgt = (centers[:, None, :] + offs[None] - rad[None, None]).reshape(
        -1, len(vol_shape))
    boundary_count = np.zeros(foreground.shape, dtype=np.int64)
    np.add.at(boundary_count, tuple(tgt.T), ring.reshape(-1))

    # foreground_to_cover &= count < 0.33 * prod(ps[1:])
    # (isbi_hacks.py:45-48)
    return np.logical_and(
        mask_to_cover.astype(bool),
        boundary_count < boundary_count_factor * np.prod(ps[1:]))
