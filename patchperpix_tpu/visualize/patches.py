"""Patch-prediction mosaics.

Reference: PatchPerPix/visualize/patches.py:12-203 — reshape the
(prod(ps), *vol) affinities into a tiled mosaic where each volume pixel
becomes a ps x ps tile of its predicted patch; 3D volumes are rendered as a
z max-intensity projection; grid lines separate tiles; selected patch
centers can be highlighted.
"""

from __future__ import annotations

import numpy as np


def patch_mosaic(affs: np.ndarray, patchshape, z: int | None = None,
                 selected=None, grid_value: float = 0.5) -> np.ndarray:
    """(P, *vol) -> (H*psy, W*psx) float mosaic.

    3D input is max-projected over z unless a single ``z`` is given.
    ``selected``: iterable of centers whose tiles get value 1 borders.
    """
    ps = np.asarray(patchshape)
    vol_shape = affs.shape[1:]
    a = affs.reshape(tuple(ps) + tuple(vol_shape))
    if len(vol_shape) == 3:
        if z is not None:
            a = a[:, :, :, z]          # (psz, psy, psx, H, W)
        a = a.max(axis=0)              # project patch z
        if z is None:
            a = a.max(axis=2)          # project volume z
        psy, psx = int(ps[1]), int(ps[2])
        H, W = a.shape[2], a.shape[3]
    else:
        psy, psx = int(ps[-2]), int(ps[-1])
        H, W = vol_shape[-2], vol_shape[-1]
        a = a.reshape(psy, psx, H, W)

    mosaic = np.transpose(a, (2, 0, 3, 1)).reshape(H * psy, W * psx)
    mosaic = mosaic.copy()
    mosaic[::psy, :] = grid_value
    mosaic[:, ::psx] = grid_value

    if selected is not None:
        for c in selected:
            y, x = int(c[-2]), int(c[-1])
            mosaic[y * psy, x * psx:(x + 1) * psx] = 1.0
            mosaic[y * psy:(y + 1) * psy, x * psx] = 1.0
    return mosaic


def visualize_patches(affs: np.ndarray, patchshape, out_file: str,
                      z: int | None = None, selected=None) -> str:
    """Write the mosaic as a PNG, or float32 TIF when ``out_file`` ends
    in .tif (reference visualize/patches.py:190-198)."""
    mosaic = patch_mosaic(np.asarray(affs, dtype=np.float32), patchshape,
                          z=z, selected=selected)
    if out_file.endswith(".tif"):
        from ..utils.io import save_tif

        save_tif(out_file, mosaic.astype(np.float32))
        return out_file
    from PIL import Image

    img = (np.clip(mosaic, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(img).save(out_file)
    return out_file
