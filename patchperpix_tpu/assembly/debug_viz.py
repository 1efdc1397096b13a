"""Debug-volume renderings of the assembly internals.

Reference seams (SURVEY §4 oracle/test seams):
- ``vote_debug``: every voxel's predicted patch tiled at its position in a
  (ps*vol) canvas with grid lines (vote_instances.py:270-274, 341-360)
- ``vote_debug2``: selected patch-graph edges drawn as weight-valued lines
  between tile centers (graph_to_labeling.py:118-137)

TPU-era adaptation: the reference materializes the full (ps*Z, ps*Y, ps*X)
float canvas, which at FlyLight scale (7^3 * 50^3) would be 171 GB.  Here
2D data renders the full canvas; 3D data renders one z-plane per call
(``z=`` selects it, default the volume middle), each a (ps_y*Y, ps_x*X)
image of that plane's patch predictions — the same information the
reference's debug volume exposes per z slab.
"""

from __future__ import annotations

import numpy as np


def _line(r0, c0, r1, c1):
    """Integer pixel coordinates of the segment (skimage.draw.line
    equivalent; skimage is not installed here)."""
    n = int(max(abs(r1 - r0), abs(c1 - c0))) + 1
    rr = np.linspace(r0, r1, n).round().astype(np.int64)
    cc = np.linspace(c0, c1, n).round().astype(np.int64)
    return rr, cc


def render_patch_tiles(affs: np.ndarray, foreground: np.ndarray,
                       patchshape, z: int | None = None,
                       grid_value: float = 2.0) -> np.ndarray:
    """Tiled patch canvas (vote_instances.py:341-360).

    affs: (P, Z, Y, X); foreground: (Z, Y, X).  Returns
    (ps_y*Y, ps_x*X) for 3D input (plane ``z``, patch z-center channel
    plane) or (ps_y*H, ps_x*W) for 2D-lifted input (Z == 1).
    """
    ps = np.asarray(patchshape)
    affs = np.asarray(affs, np.float32)
    fg = np.asarray(foreground) > 0
    Z, Y, X = fg.shape
    psz, psy, psx = int(ps[0]), int(ps[1]), int(ps[2])
    if z is None:
        z = 0 if Z == 1 else Z // 2

    # patch channel layout: flat index (pz, py, px); take the pz center
    # plane so the rendered tile is the patch's own-z prediction
    patches = affs.reshape((psz, psy, psx, Z, Y, X))[psz // 2]
    canvas = np.zeros((psy * Y, psx * X), np.float32)
    ys, xs = np.nonzero(fg[z])
    for y, x in zip(ys, xs):
        canvas[y * psy:(y + 1) * psy, x * psx:(x + 1) * psx] = \
            patches[:, :, z, y, x]
    # grid lines (graph_to_labeling.py:119-126 paints instance_value+2)
    canvas[::psy, :] = grid_value
    canvas[:, ::psx] = grid_value
    return canvas


def render_graph_edges(pairs: np.ndarray, weights: np.ndarray,
                       vol_shape, patchshape,
                       z: int | None = None) -> np.ndarray:
    """Edge-weight line canvas (graph_to_labeling.py:128-137).

    pairs: (E, 2*d) global voxel coordinates of the two patch centers per
    edge; weights: (E,).  Edges are projected along z (the reference draws
    on debug_output2[0]); returns (ps_y*Y, ps_x*X) float32 where each
    drawn pixel holds the max edge weight crossing it.
    """
    ps = np.asarray(patchshape)
    Z, Y, X = vol_shape
    psy, psx = int(ps[1]), int(ps[2])
    canvas = np.zeros((psy * Y, psx * X), np.float32)
    pairs = np.asarray(pairs)
    weights = np.asarray(weights, np.float32)
    if len(pairs) == 0:
        return canvas
    d = pairs.shape[1] // 2
    for (p, w) in zip(pairs, weights):
        c1 = p[:d][-2:]  # (y, x)
        c2 = p[d:][-2:]
        r0 = int(c1[0]) * psy + psy // 2
        c0 = int(c1[1]) * psx + psx // 2
        r1 = int(c2[0]) * psy + psy // 2
        c1x = int(c2[1]) * psx + psx // 2
        rr, cc = _line(r0, c0, r1, c1x)
        keep = (rr >= 0) & (rr < canvas.shape[0]) & \
            (cc >= 0) & (cc < canvas.shape[1])
        rr, cc = rr[keep], cc[keep]
        canvas[rr, cc] = np.maximum(canvas[rr, cc], float(w))
    return canvas
