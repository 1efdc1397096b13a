"""Instance label renderings.

Reference: PatchPerPix/visualize/instances.py:17-79 — colored label PNG
(random color table), channel max-projection for 3D, optional outline
overlay on raw.
"""

from __future__ import annotations

import numpy as np

from ..utils.postprocess import color_labels


def render_instances(labels: np.ndarray, raw: np.ndarray | None = None,
                     outline: bool = False, seed: int = 0) -> np.ndarray:
    """(...,)-label volume -> (H, W, 3) uint8 image (z-MIP for 3D)."""
    lab = np.asarray(labels)
    if lab.ndim == 3:
        lab = lab.max(axis=0)
    rgb = color_labels(lab, seed=seed)

    if raw is not None:
        r = np.asarray(raw, dtype=np.float32)
        while r.ndim > 2:
            r = r.max(axis=0)
        r = (np.clip(r / max(r.max(), 1e-6), 0, 1) * 255).astype(np.uint8)
        base = np.stack([r] * 3, axis=-1)
        if outline:
            from scipy import ndimage

            edges = np.zeros_like(lab, dtype=bool)
            for ax in range(lab.ndim):
                d = np.diff(lab, axis=ax) != 0
                sl = [slice(None)] * lab.ndim
                sl[ax] = slice(0, -1)
                edges[tuple(sl)] |= d
            edges = ndimage.binary_dilation(edges)
            out = base.copy()
            out[edges] = rgb[edges]
            return out
        mask = lab > 0
        out = base.copy()
        out[mask] = (0.5 * base[mask] + 0.5 * rgb[mask]).astype(np.uint8)
        return out
    return rgb


def visualize_instances(labels, out_file: str, raw=None,
                        outline: bool = False, seed: int = 0) -> str:
    from PIL import Image

    img = render_instances(labels, raw=raw, outline=outline, seed=seed)
    Image.fromarray(img).save(out_file)
    return out_file


def save_mip(volume: np.ndarray, out_file: str) -> str:
    """Max-intensity-projection PNG (stitch_patch_graph.py:824-829)."""
    from PIL import Image

    v = np.asarray(volume, dtype=np.float32)
    while v.ndim > 2:
        v = v.max(axis=0)
    v = (np.clip(v / max(v.max(), 1e-6), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(v).save(out_file)
    return out_file
