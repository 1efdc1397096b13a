"""Blockwise vote-instances with cross-block stitching.

Reference: PatchPerPix/vote_instances/stitch_patch_graph.py — large volumes
are split into a grid of blocks (plus a patch-radius halo); each block
independently computes its selected patch pairs and affinity-graph weights
(``to_instance_seg(return_intermediates=True)``); a global graph is
assembled from all blocks, cross-block edges are re-computed on the overlap
windows with injected patch pairs, and the final labeling paints connected
components with each patch read from the full affinity volume.

Differences from the reference: coordinates are kept global throughout
(no zarr mailbox files; block results live in memory or an optional resume
dict), and per-block work runs through the JAX engine.
"""

from __future__ import annotations

import logging

import numpy as np

from ..ops import np_reference as ref
from ..utils.postprocess import clean_mask
from ..utils.skeleton import skeletonize
from .vote_instances import VoteInstancesParams, to_instance_seg

logger = logging.getLogger(__name__)


def get_offsets(shape, chunksize) -> list[np.ndarray]:
    """Grid of block offsets covering ``shape``
    (stitch_patch_graph.py:425-440)."""
    shape = np.asarray(shape)
    chunksize = np.asarray(chunksize)
    ranges = [np.arange(0, s, c) for s, c in zip(shape, chunksize)]
    grids = np.meshgrid(*ranges, indexing="ij")
    return [np.array(o) for o in zip(*[g.ravel() for g in grids])]


def _crop(arr, start, stop, channel_dim=False, pad_value=0):
    """Window copy with constant padding outside the volume."""
    spatial = np.array(arr.shape[1:] if channel_dim else arr.shape)
    start = np.asarray(start)
    stop = np.asarray(stop)
    rs = np.maximum(start, 0)
    re = np.minimum(stop, spatial)
    sl = tuple(slice(int(a), int(b)) for a, b in zip(rs, re))
    if channel_dim:
        sl = (slice(None),) + sl
    out = arr[sl]
    pad = [(int(a - b), int(c - d))
           for a, b, c, d in zip(rs, start, stop, re)]
    if channel_dim:
        pad = [(0, 0)] + pad
    if any(p != (0, 0) for p in pad):
        out = np.pad(out, pad, mode="constant", constant_values=pad_value)
    return out


def blockwise_vote_instances(
    pred_affs: np.ndarray,
    foreground: np.ndarray,
    numinst: np.ndarray,
    params: VoteInstancesParams,
    chunksize=(92, 92, 92),
    block_results: dict | None = None,
):
    """Full blockwise assembly.  Returns (instances uint16, fg uint8).

    ``block_results`` may be passed in (partially filled) to resume; it maps
    block offset tuples to (pairs_global, weights) or None.
    """
    ps = np.asarray(params.patchshape, dtype=np.int64)
    rad = ps // 2
    vol_shape = np.array(foreground.shape)
    chunksize = np.asarray(chunksize)

    fg = foreground.astype(bool)
    if params.ignore_small_comps > 0:
        fg = clean_mask(fg, params.ignore_small_comps)
    mask_to_cover = fg.copy()
    if params.skeletonize_foreground:
        mask_to_cover = skeletonize(mask_to_cover) > 0
    overlap = numinst > 1
    mask_to_cover[overlap] = False

    # foreground bounding box (only_bb, stitch_patch_graph.py:745-771)
    if not fg.any():
        return (np.zeros(tuple(vol_shape), np.uint16),
                fg.astype(np.uint8))
    nz = np.argwhere(fg)
    bb_start = np.maximum(nz.min(axis=0) - rad, 0)
    bb_stop = np.minimum(nz.max(axis=0) + rad + 1, vol_shape)

    offsets = get_offsets(bb_stop - bb_start, chunksize)
    block_results = {} if block_results is None else block_results

    block_params = VoteInstancesParams(
        **{**params.__dict__,
           "blockwise": True, "return_intermediates": True,
           "skeletonize_foreground": False})

    for off in offsets:
        key = tuple(int(o) for o in off)
        if key in block_results:
            continue
        g_start = bb_start + off
        g_stop = np.minimum(g_start + chunksize, bb_stop)
        if not fg[tuple(slice(int(a), int(b))
                        for a, b in zip(g_start, g_stop))].any():
            block_results[key] = None
            continue
        # halo = patch radius so border patches see their full context
        w_start = g_start - rad
        w_stop = g_stop + rad
        affs_b = _crop(pred_affs, w_start, w_stop, channel_dim=True)
        fg_b = _crop(fg, w_start, w_stop)
        mask_b = _crop(mask_to_cover, w_start, w_stop)
        ni_b = _crop(numinst, w_start, w_stop)
        # restrict covering to the core region (halo handled by neighbors)
        core = np.zeros_like(mask_b)
        core_sl = tuple(slice(int(r), int(r + (b - a)))
                        for r, a, b in zip(rad, g_start, g_stop))
        core[core_sl] = True
        mask_b = np.logical_and(mask_b, core)

        res = to_instance_seg(affs_b, fg_b, mask_b, ni_b, block_params)
        if res[0] is None:
            block_results[key] = None
            continue
        pairs_local, weights = res
        ndim = len(rad)
        pairs_global = pairs_local.astype(np.int64).copy()
        pairs_global[:, :ndim] += w_start[None, :]
        pairs_global[:, ndim:] += w_start[None, :]
        block_results[key] = (pairs_global, np.asarray(weights), key)

    instances = stitch_blocks(pred_affs, fg, numinst, block_results,
                              params)
    return instances, fg.astype(np.uint8)


def stitch_blocks(pred_affs, fg, numinst, block_results,
                  params: VoteInstancesParams):
    """Global graph from block results + cross-block edge computation
    (stitch_patch_graph.py:110-399)."""
    from scipy.spatial import cKDTree

    ps = np.asarray(params.patchshape, dtype=np.int64)
    rad = ps // 2
    ndim = len(ps)
    vol_shape = np.array(fg.shape)

    edges_pairs = []
    edges_weights = []
    node_block = {}
    for key, res in block_results.items():
        if res is None:
            continue
        pairs, weights, bkey = res
        edges_pairs.append(pairs)
        edges_weights.append(weights)
        for row in pairs:
            node_block[tuple(int(x) for x in row[:ndim])] = bkey
            node_block[tuple(int(x) for x in row[ndim:])] = bkey

    if not edges_pairs:
        return np.zeros(tuple(vol_shape), np.uint16)

    all_pairs = np.concatenate(edges_pairs, axis=0)
    all_weights = np.concatenate(edges_weights, axis=0)

    # cross-block candidate pairs between selected patches of different
    # blocks within patch reach
    nodes = sorted(node_block.keys())
    pts = np.array(nodes, dtype=np.int64)
    cross_pairs = []
    if len(pts) > 1:
        tree = cKDTree(pts, leafsize=4)
        cand = tree.query_pairs(2 * float(np.sum(ps)), p=1)
        max_d = params.max_total_patch_distance_in_ps_multiples * ps
        for a, b in sorted(cand):
            na, nb = nodes[a], nodes[b]
            if node_block[na] == node_block[nb]:
                continue
            if np.any(np.abs(pts[a] - pts[b]) > max_d):
                continue
            cross_pairs.append((na, nb))

    if cross_pairs:
        # group by block pair, one consensus window per group
        groups: dict = {}
        for na, nb in cross_pairs:
            gkey = tuple(sorted((node_block[na], node_block[nb])))
            groups.setdefault(gkey, []).append((na, nb))
        for gkey, prs in groups.items():
            coords = np.array([c for pr in prs for c in pr], dtype=np.int64)
            w_start = np.maximum(coords.min(axis=0) - 2 * ps, 0)
            w_stop = np.minimum(coords.max(axis=0) + 2 * ps + 1, vol_shape)
            affs_w = _crop(pred_affs, w_start, w_stop, channel_dim=True)
            fg_w = _crop(fg, w_start, w_stop)
            ni_w = _crop(numinst, w_start, w_stop)
            local_pairs = np.array(
                [np.concatenate([np.array(na) - w_start,
                                 np.array(nb) - w_start])
                 for na, nb in prs], dtype=np.uint32)
            wparams = VoteInstancesParams(
                **{**params.__dict__,
                   "blockwise": True, "return_intermediates": True,
                   "skipRanking": True, "skeletonize_foreground": False,
                   "selected_patch_pairs": local_pairs,
                   "selected_patches": None})
            res = to_instance_seg(affs_w, fg_w, fg_w.copy(), ni_w, wparams)
            if res[0] is None:
                continue
            _, cw = res
            glob = np.array([np.concatenate([na, nb]) for na, nb in prs],
                            dtype=np.int64)
            all_pairs = np.concatenate([all_pairs, glob], axis=0)
            all_weights = np.concatenate([all_weights, np.asarray(cw)])

    comps = ref.graph_components(all_pairs, all_weights, mws=params.mws)
    instances = ref.components_to_instances(
        comps, pred_affs, ps, tuple(vol_shape),
        patch_threshold=params.patch_threshold,
        one_instance_per_channel=params.one_instance_per_channel)
    return instances
