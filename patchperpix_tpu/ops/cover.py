"""Foreground cover stages as device programs.

Greedy ranked-list cover and thin-out set cover
(foreground_cover.py:15-256) as single jitted loops over a *running
coverage volume*: each candidate visit is one dynamic window slice of the
running mask plus one gather of the patch's affinity column - no incidence
matrix is materialized and nothing large crosses the host boundary (the
affinity stack is already on device).

Tie-breaking matches the reference exactly: candidates are visited in
ranked order; the thin-cover argmax takes the first maximal patch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .np_reference import patch_offsets


def _pad_vol(vol, rad):
    return jnp.pad(vol, [(int(r), int(r)) for r in rad])


@functools.partial(jax.jit, static_argnames=("ps", "pix_ths", "fc_threshold"))
def _greedy_cover_volume(affs, centers, overlap_rows, mask, interior,
                         ps: tuple, pix_ths: tuple, fc_threshold: float):
    """Ranked-order greedy cover.

    affs: (P, *vol); centers: (n, ndim) int32 in RANKED order; mask /
    interior: (*vol) float32.  Returns (selected (n,) bool, running (*vol)).
    """
    ndim = len(ps)
    rad = tuple(p // 2 for p in ps)
    n = centers.shape[0]

    running0 = _pad_vol(mask, rad)
    interior_pad = _pad_vol(interior, rad)
    # exact integer remaining-pixel count: a float32 running sum loses
    # integer exactness past 2^24 interior pixels (>=350^3 volumes) and
    # could end the cover early/late vs the reference's exact count
    rem0 = jnp.sum((running0 * interior_pad) > 0.5, dtype=jnp.int32)

    def run_threshold(carry, pix_th):
        def body(i, st):
            running, selected, rem = st
            c = centers[i]
            col = affs[(slice(None),) + tuple(c[k] for k in range(ndim))]
            pmask = (col > fc_threshold).astype(jnp.float32).reshape(ps)
            start = tuple(c[k] for k in range(ndim))
            win = jax.lax.dynamic_slice(running, start, ps)
            covered = jnp.sum(pmask * win)
            take = ((~selected[i]) & (~overlap_rows[i])
                    & (covered > pix_th) & (rem > 0))

            def do(st):
                running, selected, rem = st
                newly = pmask * win
                iwin = jax.lax.dynamic_slice(interior_pad, start, ps)
                rem = rem - jnp.sum((newly * iwin) > 0.5,
                                    dtype=jnp.int32)
                running = jax.lax.dynamic_update_slice(
                    running, win - newly, start)
                return running, selected.at[i].set(True), rem

            return jax.lax.cond(take, do, lambda s: s,
                                (running, selected, rem))

        return jax.lax.fori_loop(0, n, body, carry), None

    selected0 = jnp.zeros((n,), bool)
    (running, selected, _), _ = jax.lax.scan(
        run_threshold, (running0, selected0, rem0),
        jnp.asarray(pix_ths, jnp.float32))
    crop = tuple(slice(int(r), running.shape[k] - int(r))
                 for k, r in enumerate(rad))
    return selected, running[crop]


@functools.partial(jax.jit, static_argnames=("ps", "fc_threshold"))
def _greedy_cover_min_scatter(affs, centers, overlap_rows, mask, interior,
                              ps: tuple, fc_threshold: float):
    """Exact pix_th == 0 greedy cover, vectorized (no sequential walk).

    For the sparse-data threshold (select a ranked candidate iff it
    covers >= 1 uncovered pixel, foreground_cover.py:35-39 cascade
    collapsed to [0]), the sequential walk has a closed form.  Define
    m(x) = min rank over candidates whose fg-window contains pixel x.
    By induction over rank, candidate m(x) is always selected (x is
    uncovered when it is visited), so x is covered exactly at rank
    m(x), and a candidate is selected iff it owns some pixel's minimum:

        selected = { c : exists x with m(x) == rank(c) }

    The reference's rem > 0 gate (stop selecting once all INTERIOR
    to-cover pixels are covered) adds a rank cutoff r* = max over
    interior to-cover pixels of m(x) (+inf while any interior pixel is
    uncoverable): candidates ranked past r* are visited with rem == 0
    and rejected.  m is one min-reduction over P shifted rank-index
    volumes — O(P) wide vector ops instead of O(n) scalar loop steps.
    """
    ndim = len(ps)
    n = centers.shape[0]
    rad = np.asarray(ps) // 2
    vol_shape = mask.shape
    INF = jnp.int32(2 ** 30)

    ranks = jnp.where(overlap_rows, INF, jnp.arange(n, dtype=jnp.int32))
    rankvol = jnp.full(vol_shape, INF, jnp.int32).at[
        tuple(centers[:, k] for k in range(ndim))].set(ranks)

    offs = patch_offsets(np.asarray(ps))
    shifts = jnp.asarray(offs - rad[None, :], jnp.int32)
    from .consensus_jax import _shift_nd

    def m_q(q, s):
        gated = jnp.where(affs[q] > fc_threshold, rankvol, INF)
        # _shift_nd zero-fills; shift the complement so out-of-range
        # reads INF instead of rank 0
        return INF - _shift_nd(INF - gated, s, tuple(range(ndim)))

    m_all = jnp.min(jax.vmap(m_q)(jnp.arange(affs.shape[0]), shifts),
                    axis=0)
    m_all = jnp.where(mask > 0.5, m_all, INF)

    int_mask = (interior > 0.5) & (mask > 0.5)
    r_star = jnp.max(jnp.where(int_mask, m_all, -1),
                     initial=jnp.int32(-1))
    # m == INF pixels have no coverer at all (they keep r_star at INF,
    # i.e. no rank cutoff, but are never themselves covered)
    covered = (m_all <= r_star) & (m_all < INF)
    running = jnp.where(covered, 0.0, mask)

    idx = jnp.where(covered, m_all, n)           # trash slot n
    selected = jnp.zeros((n + 1,), bool).at[idx.reshape(-1)].set(True)
    return selected[:n], running


@functools.partial(jax.jit, static_argnames=("ps", "fc_threshold"))
def _thin_cover_volume_lazy(affs, centers, mask, interior,
                            ps: tuple, fc_threshold: float):
    """Exact lazy-greedy set cover.

    Candidate gains only DECREASE as the running mask shrinks, so a stale
    upper bound can stand in for the true size until the argmax lands on
    it (classic lazy evaluation; provably picks the same first-maximal
    candidate as the full recompute, including ties, because recomputing
    only ever lowers values).  A pick invalidates just the candidates
    whose windows overlap the picked window (|dc| < ps per axis); the
    full recompute scanned all n windows per pick.

    Returns (selected, picks, capped): ``capped`` True if the iteration
    safety cap was hit (caller must fall back to the exact full loop).
    """
    ndim = len(ps)
    rad = tuple(p // 2 for p in ps)
    n = centers.shape[0]

    running0 = _pad_vol(mask, rad)
    interior_pad = _pad_vol(interior, rad)

    pmasks = (affs[(slice(None),) + tuple(
        centers[:, k] for k in range(ndim))].T
        > fc_threshold).astype(jnp.float32)           # (n, P)

    def count_one(i, running):
        start = tuple(centers[i][k] for k in range(ndim))
        win = jax.lax.dynamic_slice(running, start, ps)
        return jnp.sum(pmasks[i].reshape(ps) * win)

    sizes0 = jax.vmap(lambda i: count_one(i, running0))(jnp.arange(n))
    rem0 = jnp.sum(running0 * interior_pad)
    max_it = 64 * n + 1024
    ps_j = jnp.asarray(ps, jnp.int32)

    def cond(st):
        running, selected, sizes, stale, picks, done, rem, it = st
        return (~done) & (picks < n) & (rem > 0) & (it < max_it)

    def body(st):
        running, selected, sizes, stale, picks, done, rem, it = st
        best = jnp.argmax(sizes)

        def refresh(st):
            running, selected, sizes, stale, picks, done, rem, it = st
            sizes = sizes.at[best].set(count_one(best, running))
            stale = stale.at[best].set(False)
            return running, selected, sizes, stale, picks, done, rem, it

        def pick(st):
            running, selected, sizes, stale, picks, done, rem, it = st
            best_size = sizes[best]
            # the reference marks selected[best] BEFORE its zero-size
            # break (np_reference.py:417-425), so the final zero-gain
            # patch is still selected
            selected = selected.at[best].set(True)

            def do(args):
                running, sizes, stale, rem = args
                start = tuple(centers[best][k] for k in range(ndim))
                win = jax.lax.dynamic_slice(running, start, ps)
                newly = pmasks[best].reshape(ps) * win
                iwin = jax.lax.dynamic_slice(interior_pad, start, ps)
                rem = rem - jnp.sum(newly * iwin)
                running = jax.lax.dynamic_update_slice(
                    running, win - newly, start)
                near = jnp.all(
                    jnp.abs(centers - centers[best][None, :]) < ps_j,
                    axis=1)
                stale = (stale | near).at[best].set(False)
                sizes = sizes.at[best].set(0.0)
                return running, sizes, stale, rem

            running, sizes, stale, rem = jax.lax.cond(
                best_size > 0, do, lambda a: a,
                (running, sizes, stale, rem))
            return (running, selected, sizes, stale,
                    picks + 1, best_size <= 0, rem, it)

        st = jax.lax.cond(stale[best], refresh, pick,
                          (running, selected, sizes, stale, picks, done,
                           rem, it + 1))
        return st

    st = jax.lax.while_loop(
        cond, body,
        (running0, jnp.zeros((n,), bool), sizes0,
         jnp.zeros((n,), bool), jnp.int32(0), jnp.bool_(False),
         rem0, jnp.int32(0)))
    return st[1], st[4], st[7] >= max_it


@functools.partial(jax.jit, static_argnames=("ps", "fc_threshold"))
def _thin_cover_volume(affs, centers, mask, interior,
                       ps: tuple, fc_threshold: float):
    """Greedy set cover: repeatedly take the patch covering the most
    still-uncovered pixels (first maximal index on ties, like np.argmax)."""
    ndim = len(ps)
    rad = tuple(p // 2 for p in ps)
    n = centers.shape[0]

    running0 = _pad_vol(mask, rad)
    interior_pad = _pad_vol(interior, rad)

    pmasks = (affs[(slice(None),) + tuple(
        centers[:, k] for k in range(ndim))].T
        > fc_threshold).astype(jnp.float32)           # (n, P)

    def count_one(i, running):
        start = tuple(centers[i][k] for k in range(ndim))
        win = jax.lax.dynamic_slice(running, start, ps)
        return jnp.sum(pmasks[i].reshape(ps) * win)

    def cond(state):
        running, selected, picks, last = state
        return (jnp.sum(running * interior_pad) > 0) & (last > 0) \
            & (picks < n)

    def body(state):
        running, selected, picks, _ = state
        sizes = jax.vmap(lambda i: count_one(i, running))(jnp.arange(n))
        best = jnp.argmax(sizes)
        best_size = sizes[best]
        # reference selects before its zero-size break
        selected = selected.at[best].set(True)

        def do(running):
            start = tuple(centers[best][k] for k in range(ndim))
            win = jax.lax.dynamic_slice(running, start, ps)
            newly = pmasks[best].reshape(ps) * win
            return jax.lax.dynamic_update_slice(running, win - newly,
                                                start)

        running = jax.lax.cond(best_size > 0, do, lambda r: r, running)
        return running, selected, picks + 1, best_size

    state = jax.lax.while_loop(
        cond, body, (running0, jnp.zeros((n,), bool), jnp.int32(0),
                     jnp.float32(1.0)))
    return state[1], state[2]


def greedy_cover_device(affs: np.ndarray, mask_to_cover: np.ndarray,
                        ranked_patches: list, patchshape,
                        fc_threshold: float = 0.5,
                        overlap: np.ndarray | None = None,
                        sparse_data: bool = False,
                        want_running: bool = True,
                        mesh=None):
    """Device-side greedy foreground cover over the ranked patch list.

    ``want_running=False`` skips the D2H readback of the running
    (still-uncovered) volume — the assembly driver discards it.
    ``mesh``: a spatial device mesh — the min-scatter closed form
    (sparse-data single-threshold cover) is z-sharded over it with a
    rad-slice halo exchange (parallel/sharded.py); the dense cascade
    walk is inherently sequential and stays single-device."""
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    if not ranked_patches:
        return [], mask_to_cover.astype(bool).copy()
    centers = np.array([rp[0] for rp in ranked_patches], dtype=np.int32)
    n = len(centers)
    vol_shape = np.array(mask_to_cover.shape)
    interior = np.zeros(tuple(vol_shape), dtype=np.float32)
    interior[tuple(slice(int(r), int(s - r))
                   for r, s in zip(rad, vol_shape))] = 1.0
    if overlap is not None:
        overlap_rows = np.asarray(overlap)[tuple(centers.T)] > 0
    else:
        overlap_rows = np.zeros(n, dtype=bool)

    mid = int(np.prod(ps) // 2)
    pix_ths = (0,) if sparse_data else tuple(
        t for t in (500, 100, 50, 10, 0) if t < mid)

    import os
    if pix_ths == (0,) and not os.environ.get("PPP_DISABLE_MINSCATTER"):
        # single-threshold cover has an exact closed form (min-rank
        # fields); the cascade (dense data) stays on the ranked walk
        ps_t = tuple(int(p) for p in ps)
        use_mesh = (mesh is not None and len(mesh.devices.flat) > 1
                    and mask_to_cover.shape[0] % len(mesh.devices.flat)
                    == 0
                    and (mask_to_cover.shape[0]
                         // len(mesh.devices.flat)) >= int(rad[0]))
        if use_mesh:
            from ..parallel.sharded import sharded_cover_min_scatter

            INF = np.int32(2 ** 30)
            ranks = np.where(overlap_rows, INF,
                             np.arange(n, dtype=np.int32))
            rankvol = np.full(mask_to_cover.shape, INF, np.int32)
            rankvol[tuple(centers.T)] = ranks
            selected, running = sharded_cover_min_scatter(
                jnp.asarray(affs), jnp.asarray(rankvol),
                jnp.asarray(mask_to_cover, jnp.float32),
                jnp.asarray(interior), n, ps_t, float(fc_threshold),
                mesh)
        else:
            selected, running = _greedy_cover_min_scatter(
                jnp.asarray(affs), jnp.asarray(centers),
                jnp.asarray(overlap_rows),
                jnp.asarray(mask_to_cover, jnp.float32),
                jnp.asarray(interior),
                ps_t, float(fc_threshold))
    else:
        selected, running = _greedy_cover_volume(
            jnp.asarray(affs), jnp.asarray(centers),
            jnp.asarray(overlap_rows),
            jnp.asarray(mask_to_cover, jnp.float32),
            jnp.asarray(interior),
            tuple(int(p) for p in ps), pix_ths, float(fc_threshold))
    selected = np.asarray(selected)
    running_vol = (np.asarray(running) > 0.5) if want_running else None
    out = [rp for i, rp in enumerate(ranked_patches) if selected[i]]
    return out, running_vol


def thin_out_cover_device(affs: np.ndarray, mask_to_cover: np.ndarray,
                          selected_patches: list, patchshape,
                          fc_threshold: float = 0.5) -> list:
    """Drop-in replacement for thin_out_cover_reference."""
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    if not selected_patches:
        return []
    centers = np.array([rp[0] for rp in selected_patches], dtype=np.int32)
    vol_shape = np.array(mask_to_cover.shape)
    interior = np.zeros(tuple(vol_shape), dtype=np.float32)
    interior[tuple(slice(int(r), int(s - r))
                   for r, s in zip(rad, vol_shape))] = 1.0

    selected, _, capped = _thin_cover_volume_lazy(
        jnp.asarray(affs), jnp.asarray(centers),
        jnp.asarray(mask_to_cover, jnp.float32),
        jnp.asarray(interior),
        tuple(int(p) for p in ps), float(fc_threshold))
    if bool(capped):  # safety: exact-but-slow full-recompute loop
        selected, _ = _thin_cover_volume(
            jnp.asarray(affs), jnp.asarray(centers),
            jnp.asarray(mask_to_cover, jnp.float32),
            jnp.asarray(interior),
            tuple(int(p) for p in ps), float(fc_threshold))
    selected = np.asarray(selected)
    return [rp for i, rp in enumerate(selected_patches) if selected[i]]
