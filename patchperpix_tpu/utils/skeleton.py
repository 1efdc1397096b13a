"""Topology-preserving skeletonization (2D / 3D) by iterative thinning.

Replaces skimage.morphology.skeletonize_3d used by the reference for
foreground thinning (vote_instances.py:221-224) and skeleton-coverage
metrics (clDice localization).  Not a port: border-directional
subiterations delete *simple points* (deletion preserves both the
foreground 26-component and background 6-component counts in the local
neighborhood, the Bertrand-Malandain characterization Lee et al.'s Euler
LUT encodes), keeping curve endpoints.  Simple-point decisions depend only
on the 26-bit (8-bit in 2D) neighbor configuration and are memoized.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


_SIMPLE_CACHE_3D: dict[int, bool] = {}
_SIMPLE_CACHE_2D: dict[int, bool] = {}

_STRUCT26 = np.ones((3, 3, 3), dtype=bool)
_STRUCT6 = ndimage.generate_binary_structure(3, 1)
_STRUCT8 = np.ones((3, 3), dtype=bool)
_STRUCT4 = ndimage.generate_binary_structure(2, 1)

# 18-neighborhood mask (6-connectivity background test domain, Lee94)
_N18 = ndimage.generate_binary_structure(3, 2)


def _is_simple_3d(nbhd: np.ndarray) -> bool:
    """nbhd: 3x3x3 bool with the center set; True if center is simple."""
    bits = 0
    flat = nbhd.flatten()
    for i in range(27):
        if i == 13:
            continue
        if flat[i]:
            bits |= 1 << (i if i < 13 else i - 1)
    cached = _SIMPLE_CACHE_3D.get(bits)
    if cached is not None:
        return cached

    fg = nbhd.copy()
    fg[1, 1, 1] = False
    # exactly one 26-component of fg that touches the center's 26-neighbors
    lab, n = ndimage.label(fg, structure=_STRUCT26)
    touching = np.unique(lab[fg])
    ok = len(touching) == 1
    if ok:
        # exactly one 6-component of background within the 18-neighborhood
        # that is 6-adjacent to the center
        bg = ~nbhd & _N18
        lab_b, _ = ndimage.label(bg, structure=_STRUCT6)
        adj = {lab_b[0, 1, 1], lab_b[2, 1, 1], lab_b[1, 0, 1],
               lab_b[1, 2, 1], lab_b[1, 1, 0], lab_b[1, 1, 2]}
        adj.discard(0)
        ok = len(adj) == 1
    _SIMPLE_CACHE_3D[bits] = ok
    return ok


def _is_simple_2d(nbhd: np.ndarray) -> bool:
    bits = 0
    flat = nbhd.flatten()
    for i in range(9):
        if i == 4:
            continue
        if flat[i]:
            bits |= 1 << (i if i < 4 else i - 1)
    cached = _SIMPLE_CACHE_2D.get(bits)
    if cached is not None:
        return cached
    fg = nbhd.copy()
    fg[1, 1] = False
    lab, _ = ndimage.label(fg, structure=_STRUCT8)
    ok = len(np.unique(lab[fg])) == 1
    if ok:
        bg = ~nbhd
        lab_b, _ = ndimage.label(bg, structure=_STRUCT4)
        adj = {lab_b[0, 1], lab_b[2, 1], lab_b[1, 0], lab_b[1, 2]}
        adj.discard(0)
        ok = len(adj) == 1
    _SIMPLE_CACHE_2D[bits] = ok
    return ok


def skeletonize(volume: np.ndarray, native: bool = True) -> np.ndarray:
    """Binary medial skeleton; accepts 2D or 3D (leading size-1 axes ok).

    3D volumes go through the C++ thinning (native/thinning.cpp) when
    available; 2D always uses the python 8/4-connectivity test."""
    vol = np.asarray(volume) > 0
    squeeze_axes = tuple(i for i, s in enumerate(vol.shape)
                         if s == 1 and vol.ndim > 2)
    work = np.squeeze(vol, axis=squeeze_axes) if squeeze_axes else vol
    if work.ndim == 2:
        if native:
            from ..native import skeletonize_2d_native

            nat = skeletonize_2d_native(work)
            if nat is not None:
                return nat.reshape(vol.shape).astype(np.uint8)
        out = _thin(work, _is_simple_2d, _neighbor_count_2d, _borders_2d)
    elif work.ndim == 3:
        if native:
            from ..native import skeletonize_3d_native

            nat = skeletonize_3d_native(work)
            if nat is not None:
                return nat.reshape(vol.shape).astype(np.uint8)
        out = _thin(work, _is_simple_3d, _neighbor_count_3d, _borders_3d)
    else:
        raise ValueError(f"need 2D or 3D volume, got shape {vol.shape}")
    return out.reshape(vol.shape).astype(np.uint8)


def _neighbor_count_3d(img):
    k = np.ones((3, 3, 3))
    k[1, 1, 1] = 0
    return ndimage.convolve(img.astype(np.uint8), k, mode="constant")


def _neighbor_count_2d(img):
    k = np.ones((3, 3))
    k[1, 1] = 0
    return ndimage.convolve(img.astype(np.uint8), k, mode="constant")


def _borders_3d(img):
    """Per-direction border masks (U, D, N, S, E, W)."""
    out = []
    for ax in range(3):
        for sh in (1, -1):
            shifted = np.roll(img, sh, axis=ax)
            sl = [slice(None)] * 3
            sl[ax] = 0 if sh == 1 else -1
            shifted[tuple(sl)] = False
            out.append(img & ~shifted)
    return out


def _borders_2d(img):
    out = []
    for ax in range(2):
        for sh in (1, -1):
            shifted = np.roll(img, sh, axis=ax)
            sl = [slice(None)] * 2
            sl[ax] = 0 if sh == 1 else -1
            shifted[tuple(sl)] = False
            out.append(img & ~shifted)
    return out


def _thin(img, is_simple, neighbor_count, borders):
    img = np.pad(img, 1, mode="constant")
    ndim = img.ndim
    n_dirs = len(borders(img))
    while True:
        changed = False
        for di in range(n_dirs):
            # recompute this direction's border from the current state
            # (per-subiteration border, as in Lee et al.)
            border = borders(img)[di]
            ncnt = neighbor_count(img)
            # candidates: on this border, not curve endpoints
            cand = border & (ncnt > 1)
            coords = np.argwhere(cand)
            for c in coords:
                sl = tuple(slice(int(x) - 1, int(x) + 2) for x in c)
                nb = img[sl]
                if not nb[(1,) * ndim]:
                    continue  # might have been deleted this sweep
                if nb.sum() - 1 <= 1:
                    continue  # became an endpoint during the sweep
                if is_simple(nb):
                    img[tuple(c)] = False
                    changed = True
        if not changed:
            break
    sl = tuple(slice(1, -1) for _ in range(ndim))
    return img[sl]
