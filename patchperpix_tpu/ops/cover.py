"""Foreground cover stages as device programs.

The reference's thin-out set cover (foreground_cover.py:183-256) repeatedly
picks the patch with the largest remaining foreground set and removes its
pixels from all other sets.  Observing that
``|set_i - union(picked)| == |M_i & running|`` for the 0/1 incidence matrix
M (patch x fg-pixel), each greedy step is one matrix-vector product plus an
argmax - an MXU-friendly ``lax.while_loop`` instead of Python set algebra.

Tie-breaking matches the reference exactly: argmax takes the first maximal
row, and rows are ordered like the selected-patches list.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .np_reference import patch_offsets


def build_cover_matrix(affs: np.ndarray, centers: np.ndarray,
                       mask: np.ndarray, patchshape,
                       fc_threshold: float = 0.5):
    """Incidence matrix M (n_patches, n_maskpx) uint8 + the compact pixel
    index map.

    M[i, j] == 1 iff patch i claims mask pixel j (patch prob > fc_threshold
    within its window, get_patch_sets.py:32-54 semantics).
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    offs = patch_offsets(ps)
    mask = np.asarray(mask).astype(bool)
    vol_shape = np.array(mask.shape)

    mask_coords = np.argwhere(mask)
    n_px = len(mask_coords)
    compact = -np.ones(tuple(vol_shape), dtype=np.int64)
    compact[tuple(mask_coords.T)] = np.arange(n_px)

    centers = np.asarray(centers, dtype=np.int64)
    n = len(centers)
    M = np.zeros((n, n_px), dtype=np.uint8)
    if n == 0 or n_px == 0:
        return M, compact

    # vectorized over patches: window pixel coords + in-mask + prob test
    tgt = centers[:, None, :] + offs[None, :, :] - rad[None, None, :]
    ok = np.all((tgt >= 0) & (tgt < vol_shape), axis=-1)
    # patch windows of interior centers are always in bounds; clamp for safety
    tgtc = np.clip(tgt, 0, vol_shape - 1)
    cidx = compact[tuple(tgtc.reshape(-1, len(vol_shape)).T)].reshape(n, -1)
    probs = affs[(slice(None),) + tuple(centers.T)].T  # (n, P)
    claim = ok & (cidx >= 0) & (probs > fc_threshold)
    rows = np.repeat(np.arange(n), claim.sum(axis=1))
    cols = cidx[claim]
    M[rows, cols] = 1
    return M, compact


@functools.partial(jax.jit, static_argnames=("max_picks",))
def _thin_cover_device(M: jnp.ndarray, interior: jnp.ndarray,
                       max_picks: int):
    """Greedy set cover loop on device.

    M: (n, m) float; interior: (m,) float termination weights.
    Returns (selected (n,) bool, n_picks).
    """
    n, m = M.shape

    def cond(state):
        running, selected, picks, last_size = state
        return (jnp.sum(running * interior) > 0) & (last_size > 0) \
            & (picks < max_picks)

    def body(state):
        running, selected, picks, _ = state
        sizes = M @ running                       # (n,)
        best = jnp.argmax(sizes)
        best_size = sizes[best]

        def take(args):
            running, selected = args
            running = running * (1.0 - M[best])
            selected = selected.at[best].set(True)
            return running, selected

        running, selected = jax.lax.cond(
            best_size > 0, take, lambda a: a, (running, selected))
        return running, selected, picks + 1, best_size

    running0 = jnp.ones((m,), jnp.float32)
    selected0 = jnp.zeros((n,), bool)
    state = jax.lax.while_loop(cond, body,
                               (running0, selected0, jnp.int32(0),
                                jnp.float32(1.0)))
    return state[1], state[2]


def thin_out_cover_device(affs: np.ndarray, mask_to_cover: np.ndarray,
                          selected_patches: list, patchshape,
                          fc_threshold: float = 0.5) -> list:
    """Drop-in replacement for thin_out_cover_reference via the MXU loop."""
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    if not selected_patches:
        return []
    centers = np.array([rp[0] for rp in selected_patches], dtype=np.int64)
    M, compact = build_cover_matrix(affs, centers, mask_to_cover, ps,
                                    fc_threshold)
    n, m = M.shape
    if m == 0:
        return []
    vol_shape = np.array(mask_to_cover.shape)
    interior_mask = np.zeros(tuple(vol_shape), dtype=bool)
    interior_sl = tuple(slice(int(r), int(s - r))
                        for r, s in zip(rad, vol_shape))
    interior_mask[interior_sl] = True
    interior = interior_mask[np.asarray(mask_to_cover, dtype=bool)]

    selected, _ = _thin_cover_device(
        jnp.asarray(M, jnp.float32), jnp.asarray(interior, jnp.float32),
        max_picks=n)
    selected = np.asarray(selected)
    return [rp for i, rp in enumerate(selected_patches) if selected[i]]


@functools.partial(jax.jit, static_argnames=("max_steps", "pix_ths"))
def _greedy_cover_device(M: jnp.ndarray, scores_order: jnp.ndarray,
                         overlap_rows: jnp.ndarray, interior: jnp.ndarray,
                         pix_ths: tuple, max_steps: int):
    """Ranked-list greedy cover (foreground_cover.py:111-180) on device.

    Walks the ranked rows per pixel threshold, selecting a row when it
    covers more than pix_th uncovered pixels.  M rows are in RANKED order.
    """
    n, m = M.shape

    def run_threshold(carry, pix_th):
        running, selected = carry

        def body(i, state):
            running, selected = state
            covered = jnp.sum(M[i] * running)
            take = ((~selected[i]) & (~overlap_rows[i])
                    & (covered > pix_th)
                    & (jnp.sum(running * interior) > 0))
            running = jnp.where(take, running * (1.0 - M[i]), running)
            selected = selected.at[i].set(selected[i] | take)
            return running, selected

        running, selected = jax.lax.fori_loop(0, n, body,
                                              (running, selected))
        return (running, selected), None

    running0 = jnp.ones((m,), jnp.float32)
    selected0 = jnp.zeros((n,), bool)
    (running, selected), _ = jax.lax.scan(
        run_threshold, (running0, selected0),
        jnp.asarray(pix_ths, jnp.float32))
    return selected, running


def greedy_cover_device(affs: np.ndarray, mask_to_cover: np.ndarray,
                        ranked_patches: list, patchshape,
                        fc_threshold: float = 0.5,
                        overlap: np.ndarray | None = None,
                        sparse_data: bool = False):
    """Device-side greedy foreground cover over the ranked patch list.

    Note one semantic deviation from the reference loop: the reference
    re-checks global coverage before every candidate and stops mid-list;
    here the coverage check gates each take (identical selections because a
    fully-covered mask makes every ``covered`` count 0).
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    if not ranked_patches:
        return [], mask_to_cover.astype(bool).copy()
    centers = np.array([rp[0] for rp in ranked_patches], dtype=np.int64)
    M, compact = build_cover_matrix(affs, centers, mask_to_cover, ps,
                                    fc_threshold)
    n, m = M.shape
    if m == 0:
        return [], mask_to_cover.astype(bool).copy()
    vol_shape = np.array(mask_to_cover.shape)
    interior_mask = np.zeros(tuple(vol_shape), dtype=bool)
    interior_sl = tuple(slice(int(r), int(s - r))
                        for r, s in zip(rad, vol_shape))
    interior_mask[interior_sl] = True
    mask_b = np.asarray(mask_to_cover, dtype=bool)
    interior = interior_mask[mask_b]

    if overlap is not None:
        overlap_rows = np.asarray(overlap)[tuple(centers.T)] > 0
    else:
        overlap_rows = np.zeros(n, dtype=bool)

    mid = int(np.prod(ps) // 2)
    pix_ths = (0,) if sparse_data else tuple(
        t for t in (500, 100, 50, 10, 0) if t < mid)

    selected, running = _greedy_cover_device(
        jnp.asarray(M, jnp.float32),
        jnp.arange(n),
        jnp.asarray(overlap_rows),
        jnp.asarray(interior, jnp.float32),
        pix_ths, max_steps=n)
    selected = np.asarray(selected)
    running = np.asarray(running) > 0.5

    running_vol = np.zeros(tuple(vol_shape), dtype=bool)
    running_vol[mask_b] = running
    out = [rp for i, rp in enumerate(ranked_patches) if selected[i]]
    return out, running_vol
