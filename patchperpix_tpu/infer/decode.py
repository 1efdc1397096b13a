"""Code -> dense patch-affinity decoding (ppp+dec).

Reference: experiments/.../decode.py:16-130 — derive the fg mask from
numinst (background prob < 0.1) or a fg threshold, run fg-pixel codes
through the decoder in fixed-size batches, scatter the decoded patches into
a dense (prod(patchshape), *vol) volume.

The decode itself is one jitted batched forward; batches are padded to the
static ``decode_batch_size`` so there is exactly one compilation.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ppp import PPPConfig, PPPModel
from ..utils import io as vio

logger = logging.getLogger(__name__)


def derive_fg_mask(numinst_or_fg: np.ndarray, overlapping_inst: bool,
                   fg_thresh: float = 0.5) -> np.ndarray:
    """decode.py:33-37: numinst path uses P(background) < 0.1."""
    if overlapping_inst:
        return numinst_or_fg[0] < 0.1
    return numinst_or_fg[0] >= fg_thresh


def decode_volume(model: PPPModel, params, code: np.ndarray,
                  fg_mask: np.ndarray, mcfg: PPPConfig,
                  batch_size: int = 1024,
                  out_dtype=np.float32) -> np.ndarray:
    """code (code_units, *vol) + fg mask -> dense affs (P, *vol)."""
    ps = mcfg.patchshape_squeezed
    P = mcfg.patchsize
    vol_shape = code.shape[1:]
    coords = np.argwhere(fg_mask)
    out = np.zeros((P,) + tuple(vol_shape), dtype=out_dtype)
    if len(coords) == 0:
        return out

    @jax.jit
    def dec(codes):
        logits = model.apply(params, codes, method=PPPModel.decode)
        return jax.nn.sigmoid(logits)

    flat_code = code.reshape(code.shape[0], -1).T.astype(np.float32)
    flat_idx = np.ravel_multi_index(coords.T, vol_shape)
    for i in range(0, len(coords), batch_size):
        chunk = flat_idx[i:i + batch_size]
        n = len(chunk)
        batch = flat_code[chunk]
        if n < batch_size:
            batch = np.pad(batch, [(0, batch_size - n), (0, 0)])
        patches = np.asarray(dec(jnp.asarray(batch)))[:n]
        out.reshape(P, -1)[:, chunk] = patches.reshape(n, P).T
    return out


def decode_sample(model: PPPModel, params, pred_path: str, mcfg: PPPConfig,
                  fg_thresh: float = 0.5, batch_size: int = 1024,
                  code_key: str = "volumes/pred_code",
                  numinst_key: str | None = None,
                  fg_key: str | None = None,
                  aff_key: str = "volumes/pred_affs") -> str:
    """Read codes from a prediction zarr, write dense pred_affs back."""
    if numinst_key is None and fg_key is None:
        numinst_key = ("volumes/pred_numinst" if mcfg.overlapping_inst
                       else None)
        fg_key = None if mcfg.overlapping_inst else "volumes/pred_fgbg"
    io = vio.IoZarr(pred_path, mode="r+")
    code = io.read(key=code_key).astype(np.float32)
    mask_src = io.read(key=numinst_key or fg_key).astype(np.float32)
    fg_mask = derive_fg_mask(mask_src, mcfg.overlapping_inst, fg_thresh)
    logger.info("decoding %d fg voxels", int(fg_mask.sum()))

    affs = decode_volume(model, params, code, fg_mask, mcfg, batch_size)
    io.create(aff_key, affs.shape, np.float16,
              chunks=[affs.shape[0]] + [max(1, s // 2)
                                        for s in affs.shape[1:]])
    io.write(affs.astype(np.float16), key=aff_key)
    io.set_attrs(aff_key, {"offset": [0, 0, 0], "resolution": [1, 1, 1]})
    io.close()
    return pred_path
