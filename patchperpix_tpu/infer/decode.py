"""Code -> patch-affinity decoding (ppp+dec), out-of-core.

Reference: experiments/.../decode.py:16-130 — derive the fg mask from
numinst (background prob < 0.1) or a fg threshold, run fg-pixel codes
through the decoder in fixed-size batches, scatter the decoded patches
into a dense (prod(patchshape), *vol) volume.

The reference materializes that dense volume in host RAM (decode.py:43);
at FlyLight full-volume scale that is 50-100 GB.  Here decoding streams:

- ``decode_sample`` decodes in z-slabs sized to a host-RAM budget and
  writes each slab into the chunk-aligned output zarr, so peak host
  memory is O(P * slab), never O(P * vol)  (SURVEY §3.3).
- ``CodeAffReader`` decodes code windows on demand for the blockwise
  assembly path, so ``label --blockwise`` on a ppp+dec prediction never
  needs a dense affinity store at all.

The decode itself is one jitted batched forward; batches are padded to
the static ``decode_batch_size`` so there is exactly one compilation.
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


class CodeDecoder:
    """Reusable decode handle: (N, code_units) -> (N, P) probabilities.

    One jitted program at the fixed ``batch_size``; short tails are
    zero-padded (padding rows are dropped before scatter, so the pad
    content never reaches an output).
    """

    def __init__(self, model: PPPModel, params, mcfg: PPPConfig,
                 batch_size: int = 1024):
        self.model = model
        self.params = params
        self.mcfg = mcfg
        self.P = mcfg.patchsize
        self.batch_size = int(batch_size)

        @jax.jit
        def dec(codes):
            logits = model.apply(params, codes, method=PPPModel.decode)
            return jax.nn.sigmoid(logits)

        self._dec = dec

    def decode_flat(self, codes: np.ndarray) -> np.ndarray:
        """codes (N, code_units) float -> (N, P) float32 probabilities."""
        n = len(codes)
        out = np.empty((n, self.P), dtype=np.float32)
        B = self.batch_size
        for i in range(0, n, B):
            batch = np.asarray(codes[i:i + B], dtype=np.float32)
            m = len(batch)
            if m < B:
                batch = np.pad(batch, [(0, B - m), (0, 0)])
            out[i:i + m] = np.asarray(
                self._dec(jnp.asarray(batch))).reshape(B, self.P)[:m]
        return out

    def decode_into(self, code: np.ndarray, fg_mask: np.ndarray,
                    out_dtype=np.float32) -> np.ndarray:
        """code (code_units, *sp) + fg mask (*sp) -> dense (P, *sp)."""
        sp = code.shape[1:]
        out = np.zeros((self.P,) + tuple(sp), dtype=out_dtype)
        coords = np.argwhere(fg_mask)
        if len(coords) == 0:
            return out
        flat_idx = np.ravel_multi_index(coords.T, sp)
        flat_code = code.reshape(code.shape[0], -1)
        patches = self.decode_flat(flat_code[:, flat_idx].T)
        out.reshape(self.P, -1)[:, flat_idx] = patches.T.astype(out_dtype)
        return out


def decode_volume(model: PPPModel, params, code: np.ndarray,
                  fg_mask: np.ndarray, mcfg: PPPConfig,
                  batch_size: int = 1024,
                  out_dtype=np.float32) -> np.ndarray:
    """code (code_units, *vol) + fg mask -> dense affs (P, *vol).

    In-memory convenience wrapper (tests / small volumes); large volumes
    go through ``decode_sample``'s slab streaming instead.
    """
    dec = CodeDecoder(model, params, mcfg, batch_size)
    return dec.decode_into(code.astype(np.float32), fg_mask, out_dtype)


def _slab_height(vol_shape, P: int, code_units: int,
                 max_ram_mb: float) -> int:
    """z-slab height fitting the host budget: per-z cost = the f32 decode
    slab + the f16 write copy + the f32 code slab."""
    per_z = float(np.prod(vol_shape[1:])) * (P * 4 + P * 2 + code_units * 4)
    sz = int(max(1, (max_ram_mb * 2 ** 20) // max(per_z, 1)))
    return min(sz, int(vol_shape[0]))


def decode_sample(model: PPPModel, params, pred_path: str, mcfg: PPPConfig,
                  fg_thresh: float = 0.5, batch_size: int = 1024,
                  code_key: str = "volumes/pred_code",
                  numinst_key: str | None = None,
                  fg_key: str | None = None,
                  aff_key: str = "volumes/pred_affs",
                  max_ram_mb: float = 2048.0) -> str:
    """Stream codes from a prediction zarr -> write dense pred_affs back.

    Decodes in z-slabs sized to ``max_ram_mb`` so the dense (P, *vol)
    stack never materializes in host RAM (the reference's memory cliff,
    decode.py:43; SURVEY §3.3 demands this stays out-of-core).
    """
    if numinst_key is None and fg_key is None:
        numinst_key = ("volumes/pred_numinst" if mcfg.overlapping_inst
                       else None)
        fg_key = None if mcfg.overlapping_inst else "volumes/pred_fgbg"
    mask_key = numinst_key or fg_key
    io = vio.IoZarr(pred_path, mode="r+")
    P = mcfg.patchsize
    code_shape = io.shape(code_key)
    vol_shape = tuple(int(s) for s in code_shape[1:])

    sz = _slab_height(vol_shape, P, int(code_shape[0]), max_ram_mb)
    out_shape = (P,) + vol_shape
    # chunk z = slab height so every slab write is chunk-aligned (no
    # read-modify-write of neighbor slabs inside tensorstore)
    chunks = [P, sz] + [max(1, s // 2) for s in vol_shape[1:]]
    io.create(aff_key, out_shape, np.float16, chunks=chunks)

    dec = CodeDecoder(model, params, mcfg, batch_size)
    n_fg = 0
    for z0 in range(0, vol_shape[0], sz):
        z1 = min(z0 + sz, vol_shape[0])
        zsl = slice(z0, z1)
        code = io.read(bb=(slice(None), zsl), key=code_key) \
            .astype(np.float32)
        mask_src = io.read(bb=(slice(None), zsl), key=mask_key) \
            .astype(np.float32)
        fg_mask = derive_fg_mask(mask_src, mcfg.overlapping_inst, fg_thresh)
        n_fg += int(fg_mask.sum())
        affs = dec.decode_into(code, fg_mask, out_dtype=np.float16)
        io.write(affs, bb=(slice(None), zsl), key=aff_key)
    logger.info("decoded %d fg voxels in %d z-slabs of %d",
                n_fg, -(-vol_shape[0] // sz), sz)
    io.set_attrs(aff_key, {"offset": [0, 0, 0], "resolution": [1, 1, 1]})
    io.close()
    return pred_path


class CodeAffReader:
    """Blockwise affinity reader that decodes codes on demand.

    Drop-in for ``assembly.blockwise.ZarrAffReader``: ``read_window`` /
    ``read_columns`` / ``read_channel`` over a ppp+dec prediction store
    holding ``pred_code`` (+ numinst/fg) but NO dense ``pred_affs`` —
    the dense store is never produced (SURVEY §3.3 "decode lazily inside
    consensus or stream blockwise").

    Decoded probabilities round-trip through float16 so results are
    bit-identical to the staged decode-to-zarr-then-assemble path (which
    stores pred_affs as f16).
    """

    def __init__(self, path: str, decoder: CodeDecoder,
                 code_key: str = "volumes/pred_code",
                 numinst_key: str | None = None,
                 fg_key: str | None = None,
                 fg_thresh: float = 0.5,
                 quantize_f16: bool = True):
        self.io = vio.open_volume(path, mode="r")
        self.decoder = decoder
        self.code_key = code_key
        self.P = decoder.P
        self.quantize = quantize_f16
        shape = self.io.shape(code_key)
        sp = tuple(int(s) for s in shape[1:])
        self.lift_2d = len(sp) == 2
        self.spatial_shape = (1,) + sp if self.lift_2d else sp

        mcfg = decoder.mcfg
        if numinst_key is None and fg_key is None:
            numinst_key = ("volumes/pred_numinst" if mcfg.overlapping_inst
                           else None)
            fg_key = None if mcfg.overlapping_inst else "volumes/pred_fgbg"
        mask_key = numinst_key or fg_key
        if mask_key is None:
            raise ValueError(
                "CodeAffReader needs a numinst or fg key to bound decoding")
        # decode-gating mask, derived slab-wise (1 byte/voxel resident)
        self.fg_mask = np.zeros(sp, dtype=bool)
        sz = max(1, int(2 ** 27 // max(np.prod(sp[1:]), 1)))
        for z0 in range(0, sp[0], sz):
            zsl = slice(z0, min(z0 + sz, sp[0]))
            src = self.io.read(bb=(slice(None), zsl), key=mask_key) \
                .astype(np.float32)
            self.fg_mask[zsl] = derive_fg_mask(
                src, mcfg.overlapping_inst, fg_thresh)

    def _maybe_quantize(self, arr: np.ndarray) -> np.ndarray:
        if self.quantize:
            return arr.astype(np.float16).astype(np.float32)
        return arr.astype(np.float32)

    def read_window(self, start, stop) -> np.ndarray:
        """(P, *(stop-start)) decoded window in GLOBAL (possibly
        2D-lifted) coords, zero-padded outside the volume."""
        start = np.asarray(start)
        stop = np.asarray(stop)
        if self.lift_2d:
            start2, stop2 = start[1:], stop[1:]
        else:
            start2, stop2 = start, stop
        sp = np.array(self.io.shape(self.code_key)[1:])
        rs = np.maximum(start2, 0)
        re = np.minimum(stop2, sp)
        bb = (slice(None),) + tuple(slice(int(a), int(b))
                                    for a, b in zip(rs, re))
        code = self.io.read(bb=bb, key=self.code_key).astype(np.float32)
        mask = self.fg_mask[tuple(slice(int(a), int(b))
                                  for a, b in zip(rs, re))]
        data = self.decoder.decode_into(code, mask)
        data = self._maybe_quantize(data)
        pad = [(0, 0)] + [(int(a - b), int(c - d))
                          for a, b, c, d in zip(rs, start2, stop2, re)]
        if any(p != (0, 0) for p in pad):
            data = np.pad(data, pad, mode="constant")
        if self.lift_2d:
            data = data[:, None]
            zpad = [(0, 0), (int(0 - start[0]), int(stop[0] - 1))]
            zpad += [(0, 0)] * (data.ndim - 2)
            if any(p != (0, 0) for p in zpad):
                data = np.pad(data, zpad, mode="constant")
        return data

    def read_columns(self, coords) -> dict:
        """Decoded patch columns at the given centers — only the codes at
        the centers are read and decoded, never a dense window."""
        coords = [tuple(int(x) for x in c) for c in coords]
        if not coords:
            return {}
        pts = np.array(coords, dtype=np.int64)
        upts = pts[:, 1:] if self.lift_2d else pts
        codes = np.stack([
            self.io.read(bb=(slice(None),) + tuple(
                slice(int(x), int(x) + 1) for x in p),
                key=self.code_key).reshape(-1)
            for p in upts]).astype(np.float32)
        cols = self._maybe_quantize(self.decoder.decode_flat(codes))
        gated = np.array([self.fg_mask[tuple(p)] for p in upts])
        cols[~gated] = 0.0
        return {c: cols[i] for i, c in enumerate(coords)}

    def read_channel(self, chan: int) -> np.ndarray:
        """One decoded affinity channel over the full volume, streamed in
        z-slabs (used only for center-channel fg derivation fallback)."""
        sp = tuple(int(s) for s in self.io.shape(self.code_key)[1:])
        out = np.zeros(sp, dtype=np.float32)
        sz = max(1, int(2 ** 26 // max(np.prod(sp[1:]) * self.P, 1)))
        for z0 in range(0, sp[0], sz):
            zsl = slice(z0, min(z0 + sz, sp[0]))
            code = self.io.read(bb=(slice(None), zsl),
                                key=self.code_key).astype(np.float32)
            slab = self.decoder.decode_into(code, self.fg_mask[zsl])
            out[zsl] = self._maybe_quantize(slab[chan])
        if self.lift_2d:
            out = out[None]
        return out

    def close(self):
        self.io.close()
