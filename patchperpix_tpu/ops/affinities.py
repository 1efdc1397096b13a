"""GT patch-affinity generation on device.

Replaces the reference's 10 seg_to_affgraph_* python-loop variants
(PatchPerPix/util/train_util.py:349-775) with two vmapped JAX functions:

- ``gt_affinities_sampled``: per sampled window corner, gather the GT label
  window with one dynamic_slice and compare channels against the center
  (the ppp+dec training path, seg_to_affgraph_3d_multi_torch_code).
- ``gt_affinities_dense``: all pixels at once via shifted slices
  (the direct-affinity path, seg_to_affgraph_3d_multi_torch).

Multi-channel GT encodes overlapping instances one-per-channel; affinity is
1 iff some channel carries the same non-zero label at the center and the
offset pixel, gated on both pixels being foreground in any channel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .np_reference import patch_offsets


@functools.partial(jax.jit, static_argnames=("patchshape",))
def gt_affinities_sampled(labels: jnp.ndarray, corners: jnp.ndarray,
                          patchshape: tuple) -> jnp.ndarray:
    """labels (B, C, *S) int; corners (N, 1+ndim) window top-left (batch idx
    first).  Returns (N, P) float32 affinities.

    The window center is at corner + ps//2 (train_util.py:457-478: the
    sampled fg location is the *corner* into the context-padded GT volume).
    """
    ps = tuple(int(p) for p in patchshape)
    ndim = len(ps)
    mid = tuple(p // 2 for p in ps)

    def one(corner):
        b = corner[0]
        start = (b,) + (0,) + tuple(corner[1 + i] for i in range(ndim))
        win = jax.lax.dynamic_slice(
            labels, start, (1, labels.shape[1]) + ps)[0]      # (C, *ps)
        center = win[(slice(None),) + mid]                    # (C,)
        same = (win == center[(slice(None),) + (None,) * ndim]) \
            & (center[(slice(None),) + (None,) * ndim] != 0)
        partial_same = jnp.any(same, axis=0)
        fg = jnp.any(win != 0, axis=0)
        fg_center = fg[mid]
        aff = partial_same & fg_center & fg
        return aff.reshape(-1).astype(jnp.float32)

    return jax.vmap(one)(corners.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("patchshape",))
def gt_affinities_dense(labels: jnp.ndarray,
                        patchshape: tuple) -> jnp.ndarray:
    """labels (B, C, *S) -> (B, P, *(S - 2*(ps//2))) float32.

    Affinity channel p at interior pixel x compares x against
    x + offset(p) - rad; output covers only pixels where the whole patch
    window is in bounds (the reference computes full-size then crops by the
    patch radius, torch_model.py:431-441).
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    ndim = len(ps)
    rad = ps // 2
    offs = patch_offsets(ps)
    spatial = np.array(labels.shape[2:])
    out_sp = tuple(int(s - 2 * r) for s, r in zip(spatial, rad))
    B, C = labels.shape[:2]

    fg = jnp.any(labels != 0, axis=1)  # (B, *S)
    center_sl = (slice(None), slice(None)) + tuple(
        slice(int(r), int(r + o)) for r, o in zip(rad, out_sp))
    center = labels[center_sl]                       # (B, C, *out)
    fg_center = fg[(slice(None),) + center_sl[2:]]   # (B, *out)

    starts = jnp.asarray(offs, jnp.int32)            # window start = offs

    def one(start):
        other = jax.lax.dynamic_slice(
            labels, (0, 0) + tuple(start[i] for i in range(ndim)),
            (B, C) + out_sp)
        fg_other = jax.lax.dynamic_slice(
            fg, (0,) + tuple(start[i] for i in range(ndim)), (B,) + out_sp)
        same = jnp.any((center == other) & (center != 0), axis=1)
        return (same & fg_center & (fg_other != 0)).astype(jnp.float32)

    out = jax.lax.map(one, starts, batch_size=32)    # (P, B, *out)
    return jnp.moveaxis(out, 0, 1)


def sample_fg_corners(rng: jax.Array, gt_fg: jnp.ndarray,
                      sample_cnt: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``sample_cnt`` fg locations per batch item, with replacement.

    gt_fg: (B, *S) bool.  Returns (corners (B*sample_cnt, 1+ndim) int32,
    valid (B*sample_cnt,) bool).  Batch items with no fg yield valid=False
    rows (the reference skips them, torch_model.py:344-346); static shapes
    keep this jittable.
    """
    B = gt_fg.shape[0]
    spatial = gt_fg.shape[1:]
    ndim = len(spatial)
    flat = gt_fg.reshape(B, -1).astype(jnp.float32)
    has_fg = jnp.sum(flat, axis=1) > 0
    logits = jnp.where(flat > 0, 0.0, -1e30)

    keys = jax.random.split(rng, B)

    def one(key, lg):
        return jax.random.categorical(key, lg, shape=(sample_cnt,))

    idx = jax.vmap(one)(keys, logits)                 # (B, N)
    coords = jnp.stack(jnp.unravel_index(idx, spatial), axis=-1)  # (B, N, nd)
    b_col = jnp.arange(B, dtype=jnp.int32)[:, None, None].repeat(
        sample_cnt, axis=1)
    corners = jnp.concatenate([b_col, coords.astype(jnp.int32)], axis=-1)
    valid = has_fg[:, None].repeat(sample_cnt, axis=1)
    return corners.reshape(-1, 1 + ndim), valid.reshape(-1)


def gather_at(volume: jnp.ndarray, corners: jnp.ndarray) -> jnp.ndarray:
    """Gather feature vectors at (batch, *coords) locations.

    volume: (B, *S, F); corners: (N, 1+ndim).  Returns (N, F).
    (gather_nd_torch_no_batch equivalent, train_util.py:305-345.)
    """
    idx = tuple(corners[:, i] for i in range(corners.shape[1]))
    return volume[idx]
