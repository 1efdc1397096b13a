"""Flip test-time averaging (TTA) for ppp / ppp+dec prediction.

The reference predicts a single orientation per sample
(``predict_no_gp.py:26-240``); this module adds a TPU-cheap accuracy
feature on top: the ``2^d`` spatial flips of the input are each predicted
with the SAME compiled program (identical shapes — one XLA executable
serves all flips), and the resulting patch-affinity volumes are mapped
back to the canonical orientation before averaging.

Mapping a flipped prediction back needs two moves, not one:

* a spatial unflip of the volume axes, and
* a permutation of the patch-affinity channels — channel ``p`` encodes
  the relative offset ``off(p) - rad`` inside the local patch, and that
  offset's flipped-axis coordinates mirror together with the volume
  (``o_a -> ps_a - 1 - o_a``; patchshapes are odd so the center is
  fixed).

``numinst``/fg heads carry per-class channels that do NOT permute — they
only unflip spatially.

For ppp+dec the *codes* are not flip-equivariant, so flips cannot be
averaged in code space: ``decode_tta`` decodes each flip's codes at the
flipped foreground mask and averages the decoded patch probabilities.
"""

from __future__ import annotations

import itertools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "flip_channel_perm",
    "unflip_affs",
    "predict_tta",
    "decode_tta",
    "all_flips",
]


def all_flips(ndim: int):
    """All 2^ndim spatial-axis subsets, identity first."""
    out = []
    for bits in itertools.product((False, True), repeat=ndim):
        out.append(tuple(i for i, b in enumerate(bits) if b))
    return out


def flip_channel_perm(patchshape, axes) -> np.ndarray:
    """Channel permutation matching a spatial flip of ``axes``.

    ``perm`` is an involution: ``canonical_affs = unflipped_affs[perm]``
    where channel ``p``'s patch-offset coordinates are mirrored along
    each flipped axis (``o_a -> ps_a - 1 - o_a``).
    """
    ps = tuple(int(p) for p in patchshape)
    idx = np.arange(int(np.prod(ps)), dtype=np.int32).reshape(ps)
    for a in axes:
        idx = np.flip(idx, axis=a)
    return np.ascontiguousarray(idx).reshape(-1)


def unflip_affs(affs, axes, patchshape):
    """Map a flipped-orientation affinity volume (P, *vol) back to the
    canonical orientation: spatial unflip + patch-channel permutation."""
    if not axes:
        return affs
    spatial_axes = tuple(a + 1 for a in axes)
    perm = flip_channel_perm(patchshape, axes)
    if isinstance(affs, np.ndarray):
        return np.flip(affs, spatial_axes)[perm]
    return jnp.flip(affs, spatial_axes)[jnp.asarray(perm)]


def unflip_volume(vol, axes):
    """Spatially unflip a (C, *vol) head (no channel permutation)."""
    if not axes:
        return vol
    spatial_axes = tuple(a + 1 for a in axes)
    if isinstance(vol, np.ndarray):
        return np.flip(vol, spatial_axes)
    return jnp.flip(vol, spatial_axes)


def predict_tta(model, params, raw: np.ndarray, mcfg, input_shape,
                output_shape, flips=None):
    """Predict all requested flips of ``raw``.

    Returns ``(heads1, prob_mean)``:

    * ``heads1`` — list of ``(axes, h1_device)`` pairs in FLIPPED
      orientation (direct-affinity models can be averaged immediately
      via :func:`average_affs`; ppp+dec keeps per-flip codes for
      :func:`decode_tta`).
    * ``prob_mean`` — flip-averaged head-2 probabilities (numinst / fg)
      in canonical orientation, a device array.
    """
    from .fused import predict_volume_device

    ndim = raw.ndim - 1
    if flips is None:
        flips = all_flips(ndim)

    heads1 = []
    prob_sum = None
    for axes in flips:
        raw_f = np.flip(raw, tuple(a + 1 for a in axes)) if axes else raw
        h1, h2 = predict_volume_device(model, params,
                                       np.ascontiguousarray(raw_f),
                                       mcfg, input_shape, output_shape)
        heads1.append((axes, h1))
        h2c = unflip_volume(h2, axes)
        prob_sum = h2c if prob_sum is None else prob_sum + h2c
    prob_mean = prob_sum / float(len(flips))
    return heads1, prob_mean


def average_affs(heads1, patchshape):
    """Average direct-affinity heads (ppp, no decoder) over flips."""
    acc = None
    for axes, h1 in heads1:
        a = unflip_affs(h1, axes, patchshape)
        acc = a if acc is None else acc + a
    return acc / float(len(heads1))


def decode_tta(model, params, heads1, fg_mask: np.ndarray, mcfg,
               batch_size: int = 4096):
    """ppp+dec: decode each flip's codes at the flipped fg, unflip the
    decoded patch probabilities, and average.

    ``fg_mask`` is the CANONICAL-orientation foreground (derived from the
    flip-averaged numinst/fg head); per flip it is flipped to match that
    flip's code volume so every flip decodes exactly the same voxel set.
    """
    from .fused import decode_volume_device

    ps = tuple(int(p) for p in mcfg.patchshape)
    acc = None
    for axes, code in heads1:
        fg_f = np.flip(fg_mask, axes) if axes else fg_mask
        affs_f = decode_volume_device(model, params, code,
                                      np.ascontiguousarray(fg_f), mcfg,
                                      batch_size=batch_size)
        a = unflip_affs(affs_f, axes, ps)
        acc = a if acc is None else acc + a
    return acc / float(len(heads1))
