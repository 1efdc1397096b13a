"""Numpy golden-reference implementations of the vote-instances assembly math.

These follow the *semantics* of the reference CUDA kernels
(PatchPerPix/vote_instances/cuda/fillConsensusArray.cu, rankPatches.cu,
computePatchGraph.cu, normConsensusArray.cu) and the python greedy stages
(foreground_cover.py, aff_patch_graph.py, graph_to_labeling.py, graph_mws.py)
exactly, but are written directly from the math: per-center loops with
vectorized patch-pair inner computation.  They are the oracle the XLA/Pallas
implementations are tested against, and the exact-parity host path for small
volumes.

Conventions
-----------
- ``affs``: float array ``(P, *vol)`` with ``P = prod(patchshape)``; channel
  ``p`` at voxel ``c`` is the predicted probability that voxel
  ``c + unravel(p) - rad`` belongs to the same instance as ``c``.
- ``patchshape``: per-axis patch extents; entries may be 1 (2D case uses
  ``(1, py, px)``).
- consensus array: ``(*(2*ps-1 per axis, or 1 where ps==1), *vol)`` float32.
  Offset index of the spatial delta ``d = p2 - p1`` is ``d + ps - 1``.
  (The reference CUDA allocates ``2*ps`` per axis, the last slot of which is
  never written; we store the tight ``2*ps-1``.)
- Foreground is *derived* from the center channel: ``affs[mid] > th``
  (fillConsensusArray.cu:32).
"""

from __future__ import annotations

import numpy as np


def neigh_extent(patchshape: np.ndarray) -> np.ndarray:
    """Consensus offset-axis extents: 2*ps-1 where ps>1, else 1."""
    ps = np.asarray(patchshape)
    return np.where(ps > 1, 2 * ps - 1, 1)


def patch_offsets(patchshape: np.ndarray) -> np.ndarray:
    """(P, ndim) integer patch coordinates in C order (linear index order)."""
    ps = tuple(int(p) for p in patchshape)
    grid = np.stack(np.meshgrid(*[np.arange(p) for p in ps], indexing="ij"),
                    axis=-1)
    return grid.reshape(-1, len(ps))


def bg_threshold(th: float, bg_mode: str) -> float:
    """Background-vote threshold variant (utilVoteInstances.py:389-406).

    ``inv``  : v2 < 1-th (falls back to "less" when th < 0.5)
    ``half`` : v2 < th/2
    ``less`` : v2 < th     (flylight default: vi_bg_use_less_than_th)
    """
    if bg_mode == "inv":
        return (1.0 - th) if th >= 0.5 else th
    if bg_mode == "half":
        return th / 2.0
    if bg_mode == "less":
        return th
    raise ValueError(f"unknown bg_mode {bg_mode}")


def _pair_weights(v_hi, v_other, th: float, weight_mode: str, positive: bool):
    """Vote weight v3 (fillConsensusArray.cu:104-133).

    positive: both high -> v1*v2 based; negative: high/low -> v1*(1-v2) based.
    """
    v2 = v_other if positive else (1.0 - v_other)
    if weight_mode == "norm_prob_product":
        return (v_hi * v2 - th * th) / (1.0 - th * th)
    if weight_mode == "prob_product":
        return v_hi * v2
    if weight_mode == "count":
        return np.ones_like(np.broadcast_arrays(v_hi, v2)[1], dtype=np.float64)
    raise ValueError(f"unknown weight_mode {weight_mode}")


def _center_iter(affs, patchshape, th):
    """Yield (center, v, tgt_coords) for interior fg centers.

    v: (P,) affinities at the center.  tgt_coords: (P, ndim) absolute
    coordinates of each patch pixel.
    """
    ps = np.asarray(patchshape)
    rad = ps // 2
    vol_shape = np.array(affs.shape[1:])
    mid = int(np.prod(ps) // 2)
    offs = patch_offsets(ps)
    fg = affs[mid] > th
    for c in np.argwhere(fg):
        if np.any(c < rad) or np.any(c >= vol_shape - rad):
            continue
        v = affs[(slice(None),) + tuple(c)]
        tgt = c[None, :] + offs - rad[None, :]
        yield c, v, tgt


def consensus_reference(
    affs: np.ndarray,
    patchshape,
    th: float = 0.5,
    bg_mode: str = "less",
    weight_mode: str = "norm_prob_product",
    norm_aff: bool = True,
    overlap: np.ndarray | None = None,
):
    """Consensus vote array (fillConsensusArray.cu:5-175 + normConsensusArray.cu).

    Returns (consensus, counts) both ``(*neigh, *vol)`` float32; consensus is
    count-normalized if ``norm_aff``.
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    neigh = neigh_extent(ps)
    vol_shape = affs.shape[1:]
    P = int(np.prod(ps))
    mid = P // 2
    offs = patch_offsets(ps)
    fg = affs[mid] > th
    bg_th = bg_threshold(th, bg_mode)

    cons = np.zeros(tuple(neigh) + tuple(vol_shape), dtype=np.float64)
    cnt = np.zeros_like(cons)

    lin = np.arange(P)
    # pair orientation: base is the pixel with the smaller linear patch index
    # (== lexicographically smaller spatial offset)
    for c, v, tgt in _center_iter(affs, ps, th):
        tgt_ok = fg[tuple(tgt.T)]
        if overlap is not None:
            tgt_ok &= ~overlap[tuple(tgt.T)].astype(bool)
        hi = (v > th) & tgt_ok
        lo = (v < bg_th) & tgt_ok

        hi_idx = lin[hi]
        lo_idx = lin[lo]

        # positive votes: unordered hi-hi pairs, base = smaller linear index
        for ai, a in enumerate(hi_idx):
            bs = hi_idx[ai + 1:]
            if len(bs) == 0:
                continue
            d = offs[bs] - offs[a] + ps - 1
            base = tgt[a]
            w = _pair_weights(v[a], v[bs], th, weight_mode, positive=True)
            np.add.at(cons, tuple(d.T) + tuple(base), w)
            np.add.at(cnt, tuple(d.T) + tuple(base), 1.0)

        # negative votes: hi at a, lo at b; base = smaller linear index,
        # offset points from base to the other pixel
        for a in hi_idx:
            bs = lo_idx[lo_idx != a]
            if len(bs) == 0:
                continue
            w = _pair_weights(v[a], v[bs], th, weight_mode, positive=False)
            fwd = bs > a
            if np.any(fwd):
                d = offs[bs[fwd]] - offs[a] + ps - 1
                np.add.at(cons, tuple(d.T) + tuple(tgt[a]), -w[fwd])
                np.add.at(cnt, tuple(d.T) + tuple(tgt[a]), 1.0)
            if np.any(~fwd):
                bk = bs[~fwd]
                d = offs[a] - offs[bk] + ps - 1
                base = tgt[bk]
                np.add.at(cons, tuple(d.T) + tuple(base.T), -w[~fwd])
                np.add.at(cnt, tuple(d.T) + tuple(base.T), 1.0)

    if norm_aff:
        # normConsensusArray.cu:16-23 gates on fg centers, but cnt is only
        # ever non-zero at fg voxels, so plain where() is equivalent.
        cons = np.where(cnt != 0, cons / np.maximum(cnt, 1e-30), cons)
    return cons.astype(np.float32), cnt.astype(np.float32)


def rank_patches_reference(
    affs: np.ndarray,
    cons: np.ndarray,
    patchshape,
    th: float = 0.5,
    bg_mode: str = "less",
    norm_rank: bool = True,
    int_counter: bool = False,
    overlap: np.ndarray | None = None,
):
    """Per-voxel patch score (rankPatches.cu:1-161).

    Border / background voxels get the sentinel (-1 if norm_rank else
    -9999999).  Returns float32 volume.
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    P = int(np.prod(ps))
    mid = P // 2
    offs = patch_offsets(ps)
    fg = affs[mid] > th
    bg_th = bg_threshold(th, bg_mode)

    sentinel = -1.0 if norm_rank else -9999999.0
    score = np.full(affs.shape[1:], sentinel, dtype=np.float64)

    lin = np.arange(P)
    for c, v, tgt in _center_iter(affs, ps, th):
        tgt_ok = fg[tuple(tgt.T)]
        if overlap is not None:
            tgt_ok &= ~overlap[tuple(tgt.T)].astype(bool)
        hi = (v > th) & tgt_ok
        lo = (v < bg_th) & tgt_ok

        acc = 0.0
        hi_idx = lin[hi]
        lo_idx = lin[lo]
        # fgCnt (rankPatches.cu:139): every ordered pair (po1 hi, po2 target-
        # eligible, po1 != po2) EXCEPT hi-hi pairs with po2 <= po1.
        n_tgt = int(np.sum(tgt_ok))
        n_hi = len(hi_idx)
        fg_cnt = n_hi * (n_tgt - 1) - (n_hi * (n_hi - 1)) // 2

        def consensus_vals(a_arr, b_arr):
            """cons at base=min(a,b), offset toward max(a,b), vectorized."""
            base_i = np.minimum(a_arr, b_arr)
            other_i = np.maximum(a_arr, b_arr)
            d = offs[other_i] - offs[base_i] + ps - 1
            base = tgt[base_i]
            return cons[tuple(d.T) + tuple(base.T)]

        if n_hi > 1:
            ai, bi = np.triu_indices(n_hi, k=1)
            v3 = consensus_vals(hi_idx[ai], hi_idx[bi])
            if int_counter:
                acc += np.where(v3 != 0, np.sign(v3), -1.0).sum()
            else:
                acc += v3.sum()
        if n_hi > 0 and len(lo_idx) > 0:
            aa, bb = np.meshgrid(hi_idx, lo_idx, indexing="ij")
            sel = aa != bb
            aa, bb = aa[sel], bb[sel]
            if len(aa):
                v3 = consensus_vals(aa, bb)
                if int_counter:
                    acc -= np.where(v3 != 0, np.sign(v3), 1.0).sum()
                else:
                    acc -= v3.sum()

        score[tuple(c)] = acc / max(1, fg_cnt) if norm_rank else acc
    return score.astype(np.float32)


def rank_patch_list(all_patches, scores):
    """Sort patch centers by score, descending (ranked_patches.py:21-30).

    Python's sort is stable, so ties keep the (scan-order) center order.
    Returns list of (center ndarray, score).
    """
    ranked = [(np.asarray(idx), float(scores[tuple(idx)]))
              for idx in all_patches]
    ranked.sort(key=lambda t: t[1], reverse=True)
    return ranked


def _cover_loop(affs, running, radslice, ranked_patches, overlap, selected,
                ps, rad, pix_th, fc_threshold, score_threshold, marked,
                mark_close):
    """One ranked-list scan of the greedy cover
    (foreground_cover.py:111-180)."""
    for r, (idx, sc) in enumerate(ranked_patches):
        if not running[radslice].any():
            break
        if selected[r]:
            continue
        if score_threshold is not None and sc < score_threshold:
            break
        idx = np.asarray(idx)
        if mark_close and marked[tuple(idx)]:
            continue
        if overlap is not None and overlap[tuple(idx)] > 0:
            continue
        patch = affs[(slice(None),) + tuple(idx)].reshape(tuple(ps))
        window = tuple(slice(int(i - rr), int(i + rr + 1))
                       for i, rr in zip(idx, rad))
        pmask = patch > fc_threshold
        covered = int(np.count_nonzero(running[window][pmask]))
        if covered > pix_th:
            selected[r] = True
            if mark_close:
                # radius (0,3,3) neighborhood (foreground_cover.py:162-168)
                m_rad = np.zeros(len(ps), dtype=np.int64)
                m_rad[-2:] = 3
                m_sl = tuple(slice(max(int(i - mr), 0), int(i + mr + 1))
                             for i, mr in zip(idx, m_rad))
                marked[m_sl] = True
            sub = running[window]
            sub[pmask] = False
            running[window] = sub


def foreground_cover_reference(
    affs: np.ndarray,
    mask_to_cover: np.ndarray,
    ranked_patches: list,
    patchshape,
    fc_threshold: float = 0.5,
    overlap: np.ndarray | None = None,
    sparse_data: bool = False,
    score_threshold: float | None = None,
    overlap_neighborhood: bool = False,
    mark_close: bool = False,
):
    """Greedy foreground cover (foreground_cover.py:15-180).

    Walks the ranked list; selects a patch when it covers more than ``pixTh``
    still-uncovered fg pixels; covered pixels are removed.  The pixel
    threshold cascades 500/100/50/10/0 for dense data ([0] for sparse), each
    pass rescanning from the start of the list.

    ``overlap_neighborhood`` adds the second pass around overlap regions
    (select_patches_overlap_neighborhood, foreground_cover.py:53-85): extra
    patches are selected from the 2..5-dilation ring of the overlap mask and
    the result is returned in coordinate order with scores looked up per
    center (matching the reference's argwhere-based rebuild).
    ``mark_close`` reproduces mark_close_neighboorhood (skip candidates
    within an in-plane radius-3 box of an already selected center).
    Returns (selected list of (center, score), running-mask-after).
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    vol_shape = np.array(mask_to_cover.shape)
    radslice = tuple(slice(int(r), int(s - r))
                     for r, s in zip(rad, vol_shape))

    running = mask_to_cover.astype(bool).copy()
    selected = np.zeros(len(ranked_patches), dtype=bool)
    marked = np.zeros_like(running)

    mid = int(np.prod(ps) // 2)
    pix_ths = [0] if sparse_data else [t for t in (500, 100, 50, 10, 0)
                                       if t < mid]
    for pix_th in pix_ths:
        _cover_loop(affs, running, radslice, ranked_patches, overlap,
                    selected, ps, rad, pix_th, fc_threshold,
                    score_threshold, marked, mark_close)
        if not running[radslice].any():
            break

    if overlap_neighborhood and overlap is not None:
        import scipy.ndimage

        sel_vol = np.zeros(tuple(vol_shape), dtype=bool)
        for i, (idx, _) in enumerate(ranked_patches):
            if selected[i]:
                sel_vol[tuple(np.asarray(idx))] = True

        ov = overlap.astype(bool)
        ov_t = scipy.ndimage.binary_dilation(ov, iterations=2)
        ov_dil = scipy.ndimage.binary_dilation(ov, iterations=5)
        dil_mask = np.logical_and(~ov_t, ov_dil)
        fg_dil = np.logical_and(dil_mask, mask_to_cover.astype(bool))

        rp_list = [rp for rp in ranked_patches
                   if not sel_vol[tuple(np.asarray(rp[0]))]
                   and fg_dil[tuple(np.asarray(rp[0]))]]
        sel2 = np.zeros(len(rp_list), dtype=bool)
        fg_dil_running = fg_dil.copy()
        _cover_loop(affs, fg_dil_running, radslice, rp_list, overlap, sel2,
                    ps, rad, pix_ths[-1], fc_threshold, score_threshold,
                    marked, mark_close)
        for i, (idx, _) in enumerate(rp_list):
            if sel2[i]:
                sel_vol[tuple(np.asarray(idx))] = True
        # rebuild in coordinate order with per-center score lookup
        score_of = {tuple(np.asarray(idx)): sc
                    for idx, sc in ranked_patches}
        out = [(c, score_of.get(tuple(c), 0.0))
               for c in np.argwhere(sel_vol)]
        return out, running

    out = [rp for i, rp in enumerate(ranked_patches) if selected[i]]
    return out, running


def patch_fg_set(idx, affs, mask, patchshape, fc_threshold):
    """Set of absolute fg coords a patch claims (get_patch_sets.py:32-54)."""
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    idx = np.asarray(idx)
    start = idx - rad
    stop = idx + rad + 1
    if np.any(start < 0) or np.any(stop > np.array(mask.shape)):
        return set()
    patch = affs[(slice(None),) + tuple(idx)].reshape(tuple(ps))
    window = tuple(slice(int(s), int(e)) for s, e in zip(start, stop))
    sel = np.logical_and(patch > fc_threshold, mask[window])
    return set(map(tuple, (start + np.argwhere(sel)).tolist()))


def thin_out_cover_reference(
    affs: np.ndarray,
    mask_to_cover: np.ndarray,
    selected_patches: list,
    patchshape,
    fc_threshold: float = 0.5,
):
    """Greedy set cover thinning (foreground_cover.py:183-256).

    Repeatedly picks the patch with the largest remaining fg set, removes its
    pixels from the running mask and from all other sets.
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    vol_shape = np.array(mask_to_cover.shape)
    radslice = tuple(slice(int(r), int(s - r))
                     for r, s in zip(rad, vol_shape))
    running = mask_to_cover.astype(bool).copy()
    fgs = [patch_fg_set(rp[0], affs, mask_to_cover, ps, fc_threshold)
           for rp in selected_patches]
    selected = np.zeros(len(selected_patches), dtype=bool)

    while running[radslice].any():
        sizes = [len(s) for s in fgs]
        best = int(np.argmax(sizes))
        selected[best] = True
        best_fg = patch_fg_set(selected_patches[best][0], affs, running,
                               ps, fc_threshold)
        if best_fg:
            coords = tuple(np.array(sorted(best_fg)).T)
            running[coords] = False
        fgs = [s - best_fg for s in fgs]
        if sizes[best] == 0 and not best_fg:
            # no patch can cover anything anymore; avoid infinite loop
            break

    return [rp for i, rp in enumerate(selected_patches) if selected[i]]


def patch_pairs_reference(
    selected_patches: list,
    patchshape,
    max_ps_dist: float = 2.0,
    include_singleton: bool = True,
):
    """Candidate patch pairs (aff_patch_graph.py:43-110).

    Sorts centers by last coordinate (stable), finds all pairs within L1
    distance 2*sum(ps), drops pairs with any per-axis distance >
    max_ps_dist*ps, optionally appends self-pairs.  Returns (pairs array
    (N, 2*ndim) uint32, sorted points (M, ndim) uint32) or (None, pts).
    """
    from scipy.spatial import cKDTree

    ps = np.asarray(patchshape, dtype=np.float32)
    ndim = len(ps)
    patches = sorted(selected_patches, key=lambda p: p[0][ndim - 1])
    pts = np.array([p[0] for p in patches], dtype=np.uint32).reshape(-1, ndim)
    if len(pts) == 0:
        return None, pts
    tree = cKDTree(pts, leafsize=4)
    pairs = tree.query_pairs(2 * float(np.sum(ps)), output_type="ndarray",
                             p=1)
    # sort lexicographically (matches sorted(set-of-tuples))
    order = np.lexsort((pairs[:, 1], pairs[:, 0]))
    pairs = pairs[order]
    d = np.abs(pts[pairs[:, 0]].astype(np.float32)
               - pts[pairs[:, 1]].astype(np.float32))
    kept = pairs[~(d > max_ps_dist * ps).any(axis=1)]
    n = len(kept) + (len(pts) if include_singleton else 0)
    if n == 0:
        return None, pts
    arr = np.zeros((n, 2 * ndim), dtype=np.uint32)
    arr[:len(kept), :ndim] = pts[kept[:, 0]]
    arr[:len(kept), ndim:] = pts[kept[:, 1]]
    if include_singleton:
        arr[len(kept):, :ndim] = pts
        arr[len(kept):, ndim:] = pts
    return arr, pts


def patch_graph_reference(
    affs: np.ndarray,
    cons: np.ndarray,
    pairs: np.ndarray,
    patchshape,
    th: float = 0.5,
    norm_graph: bool = True,
    intersection_lcg: bool = True,
):
    """Patch-pair affinity weights (computePatchGraph.cu:3-136).

    For each pair, sums consensus over cross-patch fg-pixel pairs within
    reach.  Pixels in the patch intersection are dropped with ~80%
    probability via the kernel's deterministic LCG when
    ``intersection_lcg``.  Returns float32 (num_pairs,) weights.
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    ndim = len(ps)
    rad = ps // 2
    P = int(np.prod(ps))
    mid = P // 2
    offs = patch_offsets(ps)
    fg = affs[mid] > th
    vol_shape = np.array(affs.shape[1:])
    strides = np.array([int(np.prod(vol_shape[i + 1:])) for i in range(ndim)])

    weights = np.zeros(len(pairs), dtype=np.float64)
    for pi, pair in enumerate(pairs):
        c1 = pair[:ndim].astype(np.int64)
        c2 = pair[ndim:].astype(np.int64)
        seed = 1
        for coord in np.concatenate([c1, c2]):
            seed = (seed * int(coord)) & 0xFFFFFFFF

        v1 = affs[(slice(None),) + tuple(c1)]
        v2 = affs[(slice(None),) + tuple(c2)]
        x1_all = c1[None] + offs - rad        # (P, ndim)
        x2_all = c2[None] + offs - rad
        ok1 = np.all((x1_all >= 0) & (x1_all < vol_shape), axis=1)
        ok1[ok1] &= fg[tuple(x1_all[ok1].T)]
        ok1 &= v1 > th
        ok2 = np.all((x2_all >= 0) & (x2_all < vol_shape), axis=1)
        ok2[ok2] &= fg[tuple(x2_all[ok2].T)]
        ok2 &= v2 > th
        idx1 = np.where(ok1)[0]
        idx2 = np.where(ok2)[0]
        if len(idx1) == 0 or len(idx2) == 0:
            weights[pi] = 0.0
            continue

        # all eligible (p1, p2) combos in kernel loop order (p1-major)
        a = np.repeat(idx1, len(idx2))
        b = np.tile(idx2, len(idx1))
        x1 = x1_all[a]
        x2 = x2_all[b]

        inter = (np.all(np.abs(x1 - c2[None]) <= rad, axis=1)
                 & np.all(np.abs(x2 - c1[None]) <= rad, axis=1))
        keep = np.ones(len(a), dtype=bool)
        if intersection_lcg and inter.any():
            # the CUDA kernel advances rnd = rnd*M per intersection pair in
            # loop order; the k-th such pair sees seed*M^k mod 2^32, which
            # is exactly reproducible in closed form (uint64 cumprod wraps
            # mod 2^64 and 2^32 divides 2^64)
            n_i = int(inter.sum())
            m_pow = np.cumprod(
                np.full(n_i, 1103515245, dtype=np.uint64))
            rnd = (np.uint64(seed) * m_pow) & np.uint64(0xFFFFFFFF)
            keep[inter] = rnd.astype(np.float64) / 4294967296.0 <= 0.2

        g1 = x1 @ strides
        g2 = x2 @ strides
        fwd = (g1 <= g2)[:, None]
        d = np.where(fwd, x2 - x1, x1 - x2)
        base = np.where(fwd, x1, x2)
        # CUDA bound check allows d == ps (reads an always-zero slot)
        in_cnt = np.all((d >= -(ps - 1)) & (d <= ps), axis=1)
        in_read = in_cnt & np.all(d <= ps - 1, axis=1)

        sel = keep & in_read
        acc = float(cons[tuple((d[sel] + ps - 1).T)
                         + tuple(base[sel].T)].sum()) if sel.any() else 0.0
        fg_cnt = int((keep & in_cnt).sum())
        weights[pi] = acc / max(1, fg_cnt) if norm_graph else acc
    return weights.astype(np.float32)


def graph_components(pairs: np.ndarray, weights: np.ndarray, mws: bool = False):
    """Connected components over positive edges, or mutex watershed.

    graph_to_labeling.py:46-54 / graph_mws.py:7-85.  Nodes are patch-center
    tuples.  Returns a list of lists of node tuples (deterministic order).
    """
    ndim = pairs.shape[1] // 2
    edges = []
    for (pr, w) in zip(pairs, weights):
        if w == 0:
            continue
        a = tuple(int(x) for x in pr[:ndim])
        b = tuple(int(x) for x in pr[ndim:])
        edges.append((a, b, float(w)))

    if mws:
        return _mws(edges)

    # union-find over positive edges, insertion-ordered
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    order = []
    for a, b, w in edges:
        if w <= 0:
            continue
        for n in (a, b):
            if n not in parent:
                parent[n] = n
                order.append(n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    comps: dict = {}
    for n in order:
        comps.setdefault(find(n), []).append(n)
    return list(comps.values())


def _mws(edges):
    """Mutex watershed on the patch graph (graph_mws.py:7-85 semantics).

    Kruskal over |aff|-sorted edges; positive edges merge unless a mutex
    (negative edge seen earlier at higher |aff|) separates the two
    clusters.  Union-find with per-cluster mutex sets that merge (and
    re-point) on union — the naive formulation (``_mws_naive``, kept as
    the oracle for test_mws_fast_matches_naive) re-scans the whole mutex
    list per attractive edge, O(E*M) python at bench scale (~68k edges).
    Output-identical: same cluster ids (created on first merge, min id
    kept), same membership, same order.
    """
    nodes = []
    node_ids = {}
    for a, b, w in edges:
        for n in (a, b):
            if n not in node_ids:
                node_ids[n] = len(nodes)
                nodes.append(n)
    typed = [(node_ids[a], node_ids[b], abs(w), 1 if w > 0 else -1)
             for a, b, w in edges]
    typed.sort(key=lambda x: x[2], reverse=True)

    N = len(nodes)
    parent = list(range(N))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    cid = [0] * N            # naive loop's cluster id; 0 = singleton pool
    members = {}             # root -> member node ids (only once merged)
    mutex_sets = {}          # root -> set of mutexed roots
    next_cc = 1
    for e0, e1, a, attractive in typed:
        r0, r1 = find(e0), find(e1)
        if attractive == 1:
            if r0 == r1:
                continue
            ms0 = mutex_sets.get(r0)
            if ms0 is not None and r1 in ms0:
                continue
            c0, c1 = cid[r0], cid[r1]
            if c0 and c1:
                new_id = min(c0, c1)
            elif c0 or c1:
                new_id = max(c0, c1)
            else:
                new_id = next_cc
                next_cc += 1
            m0 = members.get(r0) or [r0]
            m1 = members.get(r1) or [r1]
            if len(m0) < len(m1):         # union by size
                r0, r1 = r1, r0
                m0, m1 = m1, m0
            parent[r1] = r0
            m0.extend(m1)
            members[r0] = m0
            members.pop(r1, None)
            cid[r0] = new_id
            ms1 = mutex_sets.pop(r1, None)
            if ms1:
                ms0 = mutex_sets.setdefault(r0, set())
                for m in ms1:
                    mutex_sets[m].discard(r1)
                    mutex_sets[m].add(r0)
                    ms0.add(m)
        elif r0 != r1:
            mutex_sets.setdefault(r0, set()).add(r1)
            mutex_sets.setdefault(r1, set()).add(r0)

    by_id = {}
    for r, m in members.items():
        by_id[cid[r]] = m
    return [[nodes[i] for i in sorted(by_id[c])] for c in sorted(by_id)]


def _mws_naive(edges):
    """The literal re-scan formulation of ``_mws`` (oracle for the
    equivalence test; see _mws docstring)."""
    nodes = []
    node_ids = {}
    for a, b, w in edges:
        for n in (a, b):
            if n not in node_ids:
                node_ids[n] = len(nodes)
                nodes.append(n)
    typed = [(node_ids[a], node_ids[b], abs(w), 1 if w > 0 else -1)
             for a, b, w in edges]
    typed.sort(key=lambda x: x[2], reverse=True)

    cc_of = {i: 0 for i in range(len(nodes))}
    ccs = {0: set(range(len(nodes)))}
    mutex = set()
    next_cc = 1
    for e0, e1, a, attractive in typed:
        if attractive == 1 and (e0, e1) not in mutex:
            c0, c1 = cc_of[e0], cc_of[e1]
            if c0 == 0 and c1 == 0:
                ccs[next_cc] = {e0, e1}
                ccs[0] -= {e0, e1}
                cc_of[e0] = cc_of[e1] = next_cc
                next_cc += 1
            elif c0 == 0 or c1 == 0:
                cc = max(c0, c1)
                lone = e0 if c0 == 0 else e1
                has_mutex = any((cc_of[e] == cc and f == lone)
                                or (cc_of[f] == cc and e == lone)
                                for (e, f) in mutex)
                if not has_mutex:
                    ccs[cc] |= {e0, e1}
                    ccs[0] -= {e0, e1}
                    cc_of[e0] = cc_of[e1] = cc
            elif c0 != c1:
                has_mutex = any((cc_of[e] == c0 and cc_of[f] == c1)
                                or (cc_of[f] == c0 and cc_of[e] == c1)
                                for (e, f) in mutex)
                if not has_mutex:
                    keep, drop = min(c0, c1), max(c0, c1)
                    ccs[keep] |= ccs[drop]
                    for e in ccs[drop]:
                        cc_of[e] = keep
                    ccs[drop] = set()
        else:
            mutex.add((e0, e1))

    out = []
    for cc_id in sorted(ccs.keys()):
        if cc_id > 0 and ccs[cc_id]:
            out.append([nodes[i] for i in sorted(ccs[cc_id])])
    return out


def components_to_instances(
    components,
    affs,
    patchshape,
    vol_shape,
    patch_threshold: float = 0.5,
    one_instance_per_channel: bool = False,
    no_overlap_per_channel: bool = False,
    min_pack_size: int = 2000,
):
    """Paint components into an instance label volume
    (graph_to_labeling.py:56-115).

    ``affs`` is the dense (P, *vol) affinity array, or a dict mapping patch
    center tuples to (P,) patch vectors — the reference's ``sparse_labels``
    mode (graph_to_labeling.py:65-67) used by blockwise stitching so the
    dense volume never needs to be in memory.

    ``no_overlap_per_channel`` packs instances into as few channels as
    possible: instances > ``min_pack_size`` px claim a free (non-overlapping)
    channel or open a new one; smaller ones go into channel 0
    (graph_to_labeling.py:96-113).
    """
    ps = np.asarray(patchshape, dtype=np.int64)
    rad = ps // 2
    vol_shape = tuple(int(s) for s in vol_shape)
    sparse = isinstance(affs, dict)
    instances = np.zeros(vol_shape, dtype=np.uint16)
    per_channel = []
    multi = one_instance_per_channel or no_overlap_per_channel
    for value, comp in enumerate(components, start=1):
        if multi:
            cur = np.zeros(vol_shape, dtype=np.uint16)
        for idx in comp:
            idx = np.asarray(idx)
            if sparse:
                patch = np.asarray(
                    affs[tuple(int(i) for i in idx)]).reshape(tuple(ps))
            else:
                patch = affs[(slice(None),) + tuple(idx)].reshape(tuple(ps))
            start = np.maximum(0, idx - rad)
            stop = np.minimum(idx + rad + 1, vol_shape)
            window = tuple(slice(int(s), int(e))
                           for s, e in zip(start, stop))
            psl = tuple(slice(int(s - (i - r)), int(ps_ - ((i + r + 1) - e)))
                        for s, e, i, r, ps_ in
                        zip(start, stop, idx, rad, ps))
            pmask = patch[psl] > patch_threshold
            tgt = cur if multi else instances
            sub = tgt[window]
            sub[pmask] = value
            tgt[window] = sub
        if one_instance_per_channel:
            per_channel.append(cur)
        elif no_overlap_per_channel:
            mask = cur > 0
            if not per_channel:
                per_channel.append(cur)
            elif int(mask.sum()) > min_pack_size:
                for chan in per_channel:
                    if np.all(chan[mask] == 0):
                        chan[mask] = value
                        break
                else:
                    per_channel.append(cur)
            else:
                per_channel[0][mask] = value
    if multi:
        return (np.stack(per_channel, axis=0) if per_channel
                else np.zeros((0,) + vol_shape, dtype=np.uint16))
    return instances
