"""Sliding-window prediction.

Reference: experiments/.../predict_no_gp.py:26-301 — pad the volume to the
output-shape grid with valid-conv context margins, enumerate shifts at
output-shape stride, run batched forwards, write the valid crop of each tile
into chunked float16 zarr outputs.
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ppp import PPPConfig, PPPModel, apply_activations
from ..utils import io as vio

logger = logging.getLogger(__name__)


def enumerate_shifts(shape_padded, input_shape, stride):
    """Grid of window origins (predict_no_gp.py:260-301), snapped so the
    last window ends exactly at the padded boundary."""
    max_shift = [max(0, s - i) for s, i in zip(shape_padded, input_shape)]
    axes = []
    for ms, st in zip(max_shift, stride):
        vals = list(range(0, ms + 1, st))
        if vals[-1] != ms:
            vals.append(ms)
        axes.append(vals)
    shifts = [[]]
    for vals in reversed(axes):
        shifts = [[v] + s for v in vals for s in shifts]
    return [tuple(s) for s in shifts]


def pad_to_grid(raw: np.ndarray, spatial, input_shape, output_shape):
    """Padded-volume geometry shared by the staged and fused predict paths
    (the tile-coverage contract both must agree on): context margins +
    snap to the output-shape grid.  Returns (raw_padded, shape_padded,
    context)."""
    context = (input_shape - output_shape) // 2
    shape_padded = np.array(
        [(int(s) // int(o) + 1) * int(o) + 2 * int(c)
         for s, o, c in zip(spatial, output_shape, context)])
    raw_padded = np.pad(
        raw, [(0, 0)] + [(int(c), int(sp - s - c))
                         for c, s, sp in zip(context, spatial,
                                             shape_padded)],
        mode="constant")
    return raw_padded, shape_padded, context


@functools.partial(jax.jit, static_argnames=("model", "mcfg"))
def _fwd_batch(model, mcfg, params, batch):
    # module-level jit: one compile per (model, shapes), not per call
    h1, h2 = model.apply(params, batch)
    return apply_activations(mcfg, h1, h2)


def predict_volume(model: PPPModel, params, raw: np.ndarray,
                   mcfg: PPPConfig, input_shape, output_shape,
                   batch_size: int = 2, out_dtype=np.float16):
    """Full-volume sliding-window prediction.

    raw: (C, *spatial) float32.  Returns (head1 (C1, *spatial),
    head2 (C2, *spatial)) in ``out_dtype``.
    """
    spatial = np.array(raw.shape[1:])
    input_shape = np.array(input_shape)
    output_shape = np.array(output_shape)
    raw_padded, shape_padded, context = pad_to_grid(
        raw, spatial, input_shape, output_shape)

    shifts = enumerate_shifts(shape_padded, input_shape, output_shape)
    logger.info("predicting %d tiles (padded %s)", len(shifts),
                tuple(shape_padded))

    out1 = np.zeros((mcfg.out_channels_head1,) + tuple(spatial),
                    dtype=out_dtype)
    out2 = np.zeros((mcfg.out_channels_head2,) + tuple(spatial),
                    dtype=out_dtype)

    def fwd(batch):
        return _fwd_batch(model, mcfg, params, batch)

    for i in range(0, len(shifts), batch_size):
        group = shifts[i:i + batch_size]
        tiles = []
        for sh in group:
            sl = (slice(None),) + tuple(
                slice(int(s), int(s + n))
                for s, n in zip(sh, input_shape))
            tiles.append(raw_padded[sl])
        while len(tiles) < batch_size:   # pad the last batch (static shape)
            tiles.append(np.zeros_like(tiles[0]))
        h1, h2 = fwd(jnp.asarray(np.stack(tiles)))
        h1 = np.asarray(h1)
        h2 = np.asarray(h2)
        for b, sh in enumerate(group):
            # valid output region of this tile, in unpadded coordinates
            g_start = np.array(sh)
            g_stop = np.minimum(g_start + output_shape, spatial)
            ln = g_stop - g_start
            if np.any(ln <= 0):
                continue
            dst = (slice(None),) + tuple(
                slice(int(s), int(e)) for s, e in zip(g_start, g_stop))
            src = (slice(None),) + tuple(slice(0, int(n)) for n in ln)
            out1[dst] = h1[b][src].astype(out_dtype)
            out2[dst] = h2[b][src].astype(out_dtype)
    return out1, out2


def predict_sample_to_zarr(model: PPPModel, params, raw: np.ndarray,
                           mcfg: PPPConfig, input_shape, output_shape,
                           out_path: str, batch_size: int = 2,
                           aff_or_code_key: str | None = None,
                           fgbg_numinst_key: str | None = None):
    """Predict one sample and persist both heads as chunked float16 zarr
    (predict_no_gp.py:243-257)."""
    if aff_or_code_key is None:
        aff_or_code_key = ("volumes/pred_code" if mcfg.train_code
                           else "volumes/pred_affs")
    if fgbg_numinst_key is None:
        fgbg_numinst_key = ("volumes/pred_numinst" if mcfg.overlapping_inst
                            else "volumes/pred_fgbg")
    h1, h2 = predict_volume(model, params, raw, mcfg, input_shape,
                            output_shape, batch_size)
    spatial = raw.shape[1:]
    chunk_sp = [max(1, int(o) // 2) for o in output_shape]
    ndim_sp = len(spatial)
    io = vio.IoZarr(out_path, mode="w")
    for key, arr in ((aff_or_code_key, h1), (fgbg_numinst_key, h2)):
        io.create(key, arr.shape, np.float16,
                  chunks=[arr.shape[0]] + chunk_sp)
        io.write(arr.astype(np.float16), key=key)
        io.set_attrs(key, {"offset": [0] * ndim_sp,
                           "resolution": [1] * ndim_sp})
    io.close()
    return out_path
