"""Blockwise vote-instances with cross-block stitching.

Reference: PatchPerPix/vote_instances/stitch_patch_graph.py — large volumes
are split into a grid of blocks (plus a patch-radius halo); each block
independently computes its selected patch pairs and affinity-graph weights
(``to_instance_seg(return_intermediates=True)``); a global graph is
assembled from all blocks, cross-block edges are re-computed on the overlap
windows with injected patch pairs, and the final labeling paints connected
components with each patch read from the full affinity volume.

TPU-native design points (vs the reference's zarr-mailbox + GPU-mutex
orchestration):

- Blocks stream from the prediction store through an ``AffReader`` so the
  dense ``(P, *vol)`` affinity volume never fully materializes in host RAM
  (out-of-core; ref load_input, stitch_patch_graph.py:443-513).
- Per-block (pairs, weights) persist as ``.npz`` next to the result with
  restart-resume (ref per-block zarr datasets + skip, :584-587, 649-669).
- ``num_parallel_blocks`` runs blocks on a thread pool: host-side window
  reads/crops overlap with the device (JAX) stages of other blocks; no
  kernel mutex is needed since the runtime serializes device dispatch.
- Final labeling uses the sparse patch-dict mode (ref sparse_labels,
  graph_to_labeling.py:65-67), reading only the component nodes' affinity
  columns from the store.
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..ops import np_reference as ref
from ..utils import io as vio
from ..utils.postprocess import clean_mask
from ..utils.skeleton import skeletonize
from .vote_instances import VoteInstancesParams, to_instance_seg

logger = logging.getLogger(__name__)


def _global_center_valid(w_start, w_shape, vol_shape, rad):
    """Bool mask gating patch centers to the GLOBAL volume interior, or
    None when the window lies fully inside it (all centers valid).  Border
    windows otherwise treat zero-padded out-of-volume context as interior
    and select/vote centers the whole-volume path excludes."""
    w_start = np.asarray(w_start)
    w_shape = np.asarray(w_shape)
    vol_shape = np.asarray(vol_shape)
    rad = np.asarray(rad)
    if np.all(w_start >= rad) and np.all(
            w_start + w_shape <= vol_shape - rad):
        return None
    axes = []
    for ax in range(len(w_shape)):
        g = w_start[ax] + np.arange(w_shape[ax])
        axes.append((g >= rad[ax]) & (g < vol_shape[ax] - rad[ax]))
    out = axes[0]
    for a in axes[1:]:
        out = out[..., None] & a
    return out


def get_offsets(shape, chunksize) -> list[np.ndarray]:
    """Grid of block offsets covering ``shape``
    (stitch_patch_graph.py:425-440)."""
    shape = np.asarray(shape)
    chunksize = np.asarray(chunksize)
    ranges = [np.arange(0, s, c) for s, c in zip(shape, chunksize)]
    grids = np.meshgrid(*ranges, indexing="ij")
    return [np.array(o) for o in zip(*[g.ravel() for g in grids])]


def get_chessboard_offsets(shape, chunksize) -> list[np.ndarray]:
    """Block offsets with a leading phase index — 8-color 3D / 4-color 2D
    chessboard (stitch_patch_graph.py:404-422): blocks of equal phase are
    never grid neighbors, so concurrently-running same-phase blocks touch
    disjoint halo regions."""
    chunksize = np.asarray(chunksize)
    out = []
    for off in get_offsets(shape, chunksize):
        mods = (np.asarray(off) // chunksize) % 2
        phase = 0
        for m in mods:
            phase = 2 * phase + int(m)
        out.append(np.concatenate([[phase], off]))
    return out


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


class ArrayAffReader:
    """In-memory affinity reader (small volumes / tests)."""

    def __init__(self, pred_affs: np.ndarray):
        self.pred_affs = np.asarray(pred_affs, dtype=np.float32)
        self.spatial_shape = self.pred_affs.shape[1:]

    def read_window(self, start, stop) -> np.ndarray:
        return _crop(self.pred_affs, start, stop, channel_dim=True)

    def read_columns(self, coords) -> dict:
        return {tuple(int(x) for x in c):
                self.pred_affs[(slice(None),) + tuple(c)] for c in coords}

    def read_channel(self, chan: int) -> np.ndarray:
        return self.pred_affs[chan]


class ZarrAffReader:
    """Out-of-core affinity reader over a prediction zarr/hdf store.

    Applies the same input conventions as ``load_affinities``
    (utilVoteInstances.py:136-322): channels-last rotation, 2D -> (P,1,H,W)
    lift, logits -> sigmoid (probed on a sample window).
    """

    def __init__(self, path: str, aff_key: str, patchsize: int):
        self.io = vio.open_volume(path, mode="r")
        self.key = aff_key
        self.P = int(patchsize)
        shape = self.io.shape(aff_key)
        self.channels_last = (shape[-1] == self.P and shape[0] != self.P)
        sp = shape[:-1] if self.channels_last else shape[1:]
        sp = tuple(int(s) for s in sp)
        self.lift_2d = len(sp) == 2
        self.spatial_shape = (1,) + sp if self.lift_2d else sp
        # logits detection with the same min<0 AND max>1 rule as
        # load_affinities, probed over the center + first + last channels
        # (the whole (P, vol) stack stays out of core; center-only probing
        # could miss a logits store whose center never exceeds +1)
        self.is_logits = False  # read_channel must not sigmoid the probe
        lo, hi = np.inf, -np.inf
        for chan in {0, self.P // 2, self.P - 1}:
            c = self.read_channel(chan)
            lo = min(lo, float(c.min()))
            hi = max(hi, float(c.max()))
        # same OR rule as load_affinities (either bound violation proves
        # the store holds logits, eps for f16 round-off)
        self.is_logits = bool(lo < -1e-3 or hi > 1 + 1e-3)

    def _read_raw(self, start, stop) -> np.ndarray:
        bb = tuple(slice(int(a), int(b)) for a, b in zip(start, stop))
        if self.channels_last:
            data = self.io.read(bb=bb + (slice(None),), key=self.key)
            data = np.ascontiguousarray(np.moveaxis(data, -1, 0))
        else:
            data = self.io.read(bb=(slice(None),) + bb, key=self.key)
        return data.astype(np.float32)

    def read_window(self, start, stop) -> np.ndarray:
        """(P, *(stop-start)) window in GLOBAL (possibly 2D-lifted) coords,
        zero-padded outside the volume."""
        start = np.asarray(start)
        stop = np.asarray(stop)
        if self.lift_2d:
            start2, stop2 = start[1:], stop[1:]
        else:
            start2, stop2 = start, stop
        sp = np.array(self.io.shape(self.key)[:-1] if self.channels_last
                      else self.io.shape(self.key)[1:])
        rs = np.maximum(start2, 0)
        re = np.minimum(stop2, sp)
        data = self._read_raw(rs, re)
        if self.is_logits:
            from scipy.special import expit

            data = expit(data)
        pad = [(0, 0)] + [(int(a - b), int(c - d))
                          for a, b, c, d in zip(rs, start2, stop2, re)]
        if any(p != (0, 0) for p in pad):
            data = np.pad(data, pad, mode="constant")
        if self.lift_2d:
            data = data[:, None]
            zpad = [(0, 0), (int(0 - start[0]),
                             int(stop[0] - 1))]
            zpad += [(0, 0)] * (data.ndim - 2)
            if any(p != (0, 0) for p in zpad):
                data = np.pad(data, zpad, mode="constant")
        return data

    def read_columns(self, coords) -> dict:
        """Affinity columns for the given centers, read via one bounding
        window per spatial cluster (<= 64^d) to bound IO."""
        out: dict = {}
        coords = [tuple(int(x) for x in c) for c in coords]
        if not coords:
            return out
        pts = np.array(coords, dtype=np.int64)
        # greedy clustering into bounding boxes of edge <= 64
        order = np.lexsort(pts.T[::-1])
        cluster: list = []
        cmin = cmax = None
        for i in order:
            p = pts[i]
            if cmin is None:
                cmin, cmax = p.copy(), p.copy()
                cluster = [i]
                continue
            nmin = np.minimum(cmin, p)
            nmax = np.maximum(cmax, p)
            if np.all(nmax - nmin < 64):
                cmin, cmax = nmin, nmax
                cluster.append(i)
            else:
                self._fill_columns(out, pts[cluster], cmin, cmax)
                cmin, cmax = p.copy(), p.copy()
                cluster = [i]
        if cluster:
            self._fill_columns(out, pts[cluster], cmin, cmax)
        return out

    def _fill_columns(self, out, pts, cmin, cmax):
        win = self.read_window(cmin, cmax + 1)
        for p in pts:
            rel = p - cmin
            out[tuple(int(x) for x in p)] = win[(slice(None),) + tuple(rel)]

    def read_channel(self, chan: int) -> np.ndarray:
        if self.channels_last:
            data = self.io.read(bb=(Ellipsis, slice(chan, chan + 1)),
                                key=self.key)[..., 0]
        else:
            data = self.io.read(bb=(slice(chan, chan + 1),),
                                key=self.key)[0]
        data = data.astype(np.float32)
        if self.is_logits:
            from scipy.special import expit

            data = expit(data)
        if self.lift_2d:
            data = data[None]
        return data

    def close(self):
        self.io.close()


def _params_fingerprint(params: VoteInstancesParams, chunksize) -> str:
    """Short hash of every param that changes per-block RESULTS, so a
    restart-resume store is never reused across incompatible configs."""
    import hashlib

    keys = ("patchshape", "patch_threshold", "fc_threshold", "bg_mode",
            "weight_mode", "consensus_norm_aff", "patch_graph_norm_aff",
            "rank_norm_patch_score", "rank_int_counter", "engine",
            "overlapping_inst", "select_patches_for_sparse_data",
            "removeIntersection", "skipThinCover", "sample", "seed",
            "max_total_patch_distance_in_ps_multiples", "score_threshold")
    sig = repr([(k, getattr(params, k, None)) for k in keys]
               + [tuple(int(c) for c in np.asarray(chunksize)),
                  "window_v2"])  # canonical fixed-shape block windows
    return hashlib.sha1(sig.encode()).hexdigest()[:10]


def _block_store_path(result_folder: str, base: str,
                      params: VoteInstancesParams = None,
                      chunksize=None) -> str:
    suffix = ""
    if params is not None:
        suffix = "_" + _params_fingerprint(params, chunksize)
    return os.path.join(result_folder, base + "_blocks" + suffix)


def _save_block(store: str | None, key, pairs, weights):
    if store is None:
        return
    os.makedirs(store, exist_ok=True)
    name = os.path.join(store, "block_" + "_".join(str(k) for k in key))
    tmp = name + ".tmp.npz"
    if pairs is None:
        np.savez(tmp, empty=np.array([1]))
    else:
        np.savez(tmp, pairs=pairs, weights=weights)
    os.replace(tmp, name + ".npz")


def _load_block(store: str | None, key):
    """Returns (found, result) where result is None (empty block) or
    (pairs, weights, key)."""
    if store is None:
        return False, None
    name = os.path.join(store, "block_" + "_".join(str(k) for k in key)
                        + ".npz")
    if not os.path.exists(name):
        return False, None
    try:
        with np.load(name) as z:
            if "empty" in z:
                return True, None
            return True, (z["pairs"], z["weights"], key)
    except Exception:
        os.remove(name)
        return False, None


def compute_blocks(
    reader,
    fg: np.ndarray,
    mask_to_cover: np.ndarray,
    numinst: np.ndarray,
    params: VoteInstancesParams,
    chunksize,
    block_results: dict | None = None,
    store: str | None = None,
    num_parallel_blocks: int = 1,
    block_devices: int = 0,
) -> dict:
    """Per-block intermediates: {offset key: (pairs_global, weights, key)
    or None}.  Resumes from ``block_results`` and/or the on-disk ``store``.

    ``block_devices`` distributes blocks over the device mesh (0/1 = single
    device, -1 = all available): worker thread i pins its blocks to device
    i via ``jax.default_device``, so the per-block consensus/rank/cover/
    graph programs of different blocks execute CONCURRENTLY on different
    chips — the multi-chip composition of the blockwise path (SURVEY §2.6
    spatial-block row; the reference serializes per-block CUDA runs with an
    mp.Lock, stitch_patch_graph.py:553-669)."""
    ps = np.asarray(params.patchshape, dtype=np.int64)
    rad = ps // 2
    vol_shape = np.array(fg.shape)
    chunksize = np.asarray(chunksize)

    nz = np.argwhere(fg)
    bb_start = np.maximum(nz.min(axis=0) - rad, 0)
    bb_stop = np.minimum(nz.max(axis=0) + rad + 1, vol_shape)
    offsets = get_offsets(bb_stop - bb_start, chunksize)
    block_results = {} if block_results is None else block_results

    use_jax_engine = params.engine in ("jax", "pallas", "xla")
    # block-device distribution must not recurse into a block; z-sharding
    # COMPOSES with blockwise (sharded.py halo-exchanges the blockwise
    # center_valid gate) but is mutually exclusive with per-block device
    # round-robin — one block per device wins when both are requested
    block_sharded = (0 if (params.block_devices
                           and params.block_devices != 1)
                     else params.sharded_devices)
    block_params = VoteInstancesParams(
        **{**params.__dict__,
           "blockwise": True, "return_intermediates": True,
           "skeletonize_foreground": False,
           "sharded_devices": block_sharded, "block_devices": 0})

    def run_block(off):
        key = tuple(int(o) for o in off)
        if key in block_results:
            return key, block_results[key]
        found, res = _load_block(store, key)
        if found:
            return key, res
        g_start = bb_start + off
        g_stop = np.minimum(g_start + chunksize, bb_stop)
        if not fg[tuple(slice(int(a), int(b))
                        for a, b in zip(g_start, g_stop))].any():
            _save_block(store, key, None, None)
            return key, None
        # halo = patch radius so border patches see their full context.
        # The window is ALWAYS chunksize + 2*rad — ragged last blocks pad
        # with real volume data (or the readers' zero-pad past the edge)
        # instead of shrinking, so every block compiles ONE program per
        # stage (each distinct shape costs a full jit of the consensus/
        # rank/graph kernels; data-dependent shapes compiled per block)
        w_start = g_start - rad
        w_stop = g_start + chunksize + rad
        affs_b = reader.read_window(w_start, w_stop)
        fg_b = _crop(fg, w_start, w_stop)
        mask_b = _crop(mask_to_cover, w_start, w_stop)
        ni_b = _crop(numinst, w_start, w_stop)
        # restrict covering to the core region (halo handled by neighbors)
        core = np.zeros_like(mask_b)
        core_sl = tuple(slice(int(r), int(r + (b - a)))
                        for r, a, b in zip(rad, g_start, g_stop))
        core[core_sl] = True
        mask_b = np.logical_and(mask_b, core)

        cv = _global_center_valid(w_start, fg_b.shape, fg.shape, rad)
        if cv is not None and not use_jax_engine:
            # host engines have no center_valid gating; border blocks
            # fall back to window-interior semantics (documented delta
            # vs the whole-volume path for the numpy golden engine)
            cv = None
        bparams = block_params if cv is None else VoteInstancesParams(
            **{**block_params.__dict__, "center_valid": cv})
        res = to_instance_seg(affs_b, fg_b, mask_b, ni_b, bparams)
        if res[0] is None:
            _save_block(store, key, None, None)
            return key, None
        pairs_local, weights = res
        ndim = len(rad)
        pairs_global = pairs_local.astype(np.int64).copy()
        pairs_global[:, :ndim] += w_start[None, :]
        pairs_global[:, ndim:] += w_start[None, :]
        weights = np.asarray(weights)
        _save_block(store, key, pairs_global, weights)
        return key, (pairs_global, weights, key)

    todo = [off for off in offsets
            if tuple(int(o) for o in off) not in block_results]

    if getattr(params, "chessboard", False) and len(todo) > 1:
        # phase-ordered scheduling (stitch_patch_graph.py:404-422): sort
        # blocks by chessboard color so concurrent workers (threads /
        # devices) drain same-phase — never grid-adjacent — blocks first
        cs = np.asarray(chunksize)

        def _phase(off):
            mods = (np.asarray(off) // cs) % 2
            p = 0
            for m in mods:
                p = 2 * p + int(m)
            return p

        todo = sorted(todo, key=lambda o: (_phase(o),)
                      + tuple(int(x) for x in o))

    devices = None
    if block_devices and block_devices != 1:
        import jax

        devices = jax.devices()
        if block_devices > 0:
            devices = devices[:block_devices]
        if len(devices) > 1:
            num_parallel_blocks = max(num_parallel_blocks, len(devices))
        else:
            devices = None

    if devices is not None and len(todo) > 1:
        # round-robin blocks over devices; each worker thread enters a
        # thread-local jax.default_device scope so its block's programs
        # compile for and run on its own chip
        import threading

        import jax

        lock = threading.Lock()
        dev_iter = iter(range(len(todo)))

        def run_on_device(off):
            with lock:
                i = next(dev_iter)
            dev = devices[i % len(devices)]
            with jax.default_device(dev):
                return run_block(off)

        with ThreadPoolExecutor(max_workers=num_parallel_blocks) as ex:
            for key, res in ex.map(run_on_device, todo):
                block_results[key] = res
    elif num_parallel_blocks > 1 and len(todo) > 1:
        with ThreadPoolExecutor(max_workers=num_parallel_blocks) as ex:
            for key, res in ex.map(run_block, todo):
                block_results[key] = res
    else:
        for off in todo:
            key, res = run_block(off)
            block_results[key] = res
    return block_results


def blockwise_vote_instances(
    pred_affs: np.ndarray,
    foreground: np.ndarray,
    numinst: np.ndarray,
    params: VoteInstancesParams,
    chunksize=(92, 92, 92),
    block_results: dict | None = None,
    store: str | None = None,
):
    """Full blockwise assembly on in-memory arrays.  Returns
    (instances uint16, fg uint8).

    ``block_results`` may be passed in (partially filled) to resume; with a
    ``store`` directory, per-block results persist to disk and restart-resume
    happens automatically.
    """
    fg = foreground.astype(bool)
    if params.ignore_small_comps > 0:
        fg = clean_mask(fg, params.ignore_small_comps)
    mask_to_cover = fg.copy()
    if params.skeletonize_foreground:
        mask_to_cover = skeletonize(mask_to_cover) > 0
    overlap = numinst > 1
    mask_to_cover[overlap] = False

    if not fg.any():
        return (np.zeros(fg.shape, np.uint16), fg.astype(np.uint8))

    reader = ArrayAffReader(pred_affs)
    block_results = compute_blocks(
        reader, fg, mask_to_cover, numinst, params, chunksize,
        block_results=block_results, store=store,
        num_parallel_blocks=params.num_parallel_blocks,
        block_devices=params.block_devices)
    instances = stitch_blocks(reader, fg, numinst, block_results, params)
    return instances, fg.astype(np.uint8)


def blockwise_vote_instances_zarr(
    aff_file: str,
    params: VoteInstancesParams,
    chunksize=(92, 92, 92),
    result_folder: str | None = None,
    decoder=None,
):
    """Out-of-core blockwise assembly streaming from the prediction store
    (the CLI `label --blockwise` path; ref stitch_patch_graph.main,
    :672-898).  Only fg/numinst masks (1 byte/voxel) and per-window affinity
    slabs are ever resident; per-block intermediates persist to
    ``<result_folder>/<base>_blocks/`` for restart-resume.

    With ``decoder`` (an ``infer.decode.CodeDecoder``), the store holds
    latent codes instead of dense affinities: windows decode on demand via
    ``CodeAffReader``, so the dense (P, *vol) stack — the reference's
    host-RAM cliff (decode.py:43) — is never produced at all."""
    from .vote_instances import _derive_fg_numinst

    base = os.path.splitext(os.path.basename(aff_file))[0]
    store = (_block_store_path(result_folder, base, params, chunksize)
             if result_folder else None)

    P = int(np.prod(params.patchshape))
    if decoder is not None and not vio.check_file(aff_file,
                                                  keys=[params.aff_key]):
        from ..infer.decode import CodeAffReader

        reader = CodeAffReader(
            aff_file, decoder, code_key=params.code_key,
            numinst_key=params.numinst_key, fg_key=params.fg_key,
            fg_thresh=(params.fg_thresh_vi if params.fg_thresh_vi > 0
                       else 0.5))
    else:
        reader = ZarrAffReader(aff_file, params.aff_key, P)
    try:
        numinst, fg = _derive_fg_numinst(
            vio.open_volume(aff_file, mode="r"), params,
            center_channel_reader=lambda: reader.read_channel(P // 2))

        fg = fg.astype(bool)
        if params.ignore_small_comps > 0:
            fg = clean_mask(fg, params.ignore_small_comps)
        mask_to_cover = fg.copy()
        if params.skeletonize_foreground:
            mask_to_cover = skeletonize(mask_to_cover) > 0
        mask_to_cover[numinst > 1] = False

        if not fg.any():
            return (np.zeros(fg.shape, np.uint16), fg.astype(np.uint8))

        block_results = compute_blocks(
            reader, fg, mask_to_cover, numinst, params, chunksize,
            store=store, num_parallel_blocks=params.num_parallel_blocks,
            block_devices=params.block_devices)
        instances = stitch_blocks(reader, fg, numinst, block_results,
                                  params)
    finally:
        reader.close()
    return instances, fg.astype(np.uint8)


def stitch_blocks(reader, fg, numinst, block_results,
                  params: VoteInstancesParams):
    """Global graph from block results + cross-block edge computation
    (stitch_patch_graph.py:110-399)."""
    from scipy.spatial import cKDTree

    ps = np.asarray(params.patchshape, dtype=np.int64)
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
        # group by block pair AND a 48^3 spatial cell of the pair midpoint:
        # one consensus window per group.  The spatial split bounds each
        # stitch window to ~(4ps + 48) per axis, keeping device memory
        # flat no matter how large the volume (an unsplit block-face group
        # spans the whole face - at 128^2 faces the kernel operand stacks
        # alone exceed HBM)
        cell = 48
        groups: dict = {}
        for na, nb in cross_pairs:
            gkey = tuple(sorted((node_block[na], node_block[nb])))
            mid = tuple(((np.asarray(na) + np.asarray(nb)) // 2)
                        // cell)
            groups.setdefault(gkey + mid, []).append((na, nb))
        # ONE canonical window shape for ALL groups (each distinct shape
        # jit-compiles the consensus kernels, ~50s for pallas 7^3; the
        # former data-dependent extents compiled per block-pair group):
        # the per-axis max over the groups' needs, quantized to 16.  The
        # need is geometry-bounded by cell + max_d + 4*ps + 1 (a pair's
        # midpoint lies in its 48-cell, per-axis pair reach is max_d, the
        # consensus margin is 2*ps each side), so at production scale the
        # shape saturates at one constant and stays warm across samples.
        # Readers zero-pad past the volume, which is vote-inert.  Flat
        # axes (2D-lifted z) keep extent 1.
        bounds = {}
        for gkey, prs in groups.items():
            coords = np.array([c for pr in prs for c in pr], dtype=np.int64)
            lo = coords.min(axis=0) - 2 * ps
            hi = coords.max(axis=0) + 2 * ps + 1
            bounds[gkey] = (lo, hi)
        need = np.max(np.array([h - l for l, h in bounds.values()]), axis=0)
        ext = -(-need // 16) * 16
        ext = np.where(vol_shape == 1, 1, ext)
        for gkey, prs in groups.items():
            lo, hi = bounds[gkey]
            # center the canonical window on the group's bounding box
            w_start = lo - (ext - (hi - lo)) // 2
            w_stop = w_start + ext
            affs_w = reader.read_window(w_start, w_stop)
            fg_w = _crop(fg, w_start, w_stop)
            ni_w = _crop(numinst, w_start, w_stop)
            local_pairs = np.array(
                [np.concatenate([np.array(na) - w_start,
                                 np.array(nb) - w_start])
                 for na, nb in prs], dtype=np.uint32)
            cv = _global_center_valid(w_start, fg_w.shape, fg.shape,
                                      np.asarray([p // 2 for p in ps]))
            wparams = VoteInstancesParams(
                **{**params.__dict__,
                   "blockwise": True, "return_intermediates": True,
                   "skipRanking": True, "skeletonize_foreground": False,
                   "selected_patch_pairs": local_pairs,
                   "selected_patches": None, "center_valid": cv})
            res = to_instance_seg(affs_w, fg_w, fg_w.copy(), ni_w, wparams)
            if res[0] is None:
                continue
            _, cw = res
            glob = np.array([np.concatenate([na, nb]) for na, nb in prs],
                            dtype=np.int64)
            all_pairs = np.concatenate([all_pairs, glob], axis=0)
            all_weights = np.concatenate([all_weights, np.asarray(cw)])

    comps = ref.graph_components(all_pairs, all_weights, mws=params.mws)
    # sparse_labels mode: fetch only the component nodes' patch columns
    node_coords = [idx for comp in comps for idx in comp]
    patch_dict = reader.read_columns(node_coords)
    instances = ref.components_to_instances(
        comps, patch_dict, ps, tuple(vol_shape),
        patch_threshold=params.patch_threshold,
        one_instance_per_channel=params.one_instance_per_channel,
        no_overlap_per_channel=params.no_overlap_per_channel)
    return instances
