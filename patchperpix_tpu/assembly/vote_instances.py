"""Vote-instances pipeline driver.

End-to-end instance assembly from dense patch-affinity predictions,
mirroring the reference pipeline (PatchPerPix/vote_instances/vote_instances.
py:150-604): consensus voting -> patch ranking -> greedy foreground cover ->
thin-out set cover -> patch pairs -> patch-affinity graph -> connected
components / mutex watershed -> instance painting.

Two engines:
- ``jax`` (default): consensus / ranking / patch graph on device via
  ops.consensus_jax; greedy cover and graph labeling on host (they are
  inherently sequential and cheap).
- ``numpy``: the golden reference path for exact-parity runs and tests.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field, fields

import numpy as np

import time

from ..ops import np_reference as ref
from ..ops.consensus_jax import (ConsensusConfig, consensus_array,
                                 patch_graph_weights, rank_scores,
                                 symmetrize_consensus)
from ..ops.pallas_consensus import (consensus_array_pallas,
                                    pallas_supported)
from ..ops.cover import greedy_cover_device, thin_out_cover_device
from ..utils import io as vio
from ..utils.postprocess import remove_small_components
from ..utils.skeleton import skeletonize

logger = logging.getLogger(__name__)


def _stage_trace(name: str):
    """jax.profiler annotation per assembly stage (visible in the trace
    viewer alongside the device ops; SURVEY §5 tracing parity)."""
    try:
        import jax.profiler

        return jax.profiler.TraceAnnotation(f"vote_instances/{name}")
    except Exception:  # pragma: no cover
        import contextlib

        return contextlib.nullcontext()


def _sharded_mesh_size(params, vol_shape, ccfg) -> int:
    """Usable mesh size for z-sharded consensus+rank, or 1 (single device).

    Constraints from parallel/sharded.py: Z divisible by the mesh size and
    each local slab at least 3*rad z-slices (the halo width).
    """
    want = int(getattr(params, "sharded_devices", 0) or 0)
    if want in (0, 1):
        return 1
    import jax

    avail = jax.device_count()
    want = avail if want < 0 else min(want, avail)
    if want <= 1 or len(vol_shape) != 3:
        return 1
    Z = int(vol_shape[0])
    halo = 3 * int(ccfg.rad[0])
    for n in range(want, 1, -1):
        if Z % n == 0 and Z // n >= max(halo, 1):
            return n
    return 1


@dataclass
class VoteInstancesParams:
    """Typed view of the [vote_instances] TOML section (default.toml:114-169)."""
    patchshape: tuple = (7, 7, 7)
    patch_threshold: float = 0.5
    fc_threshold: float = 0.5
    fg_thresh_vi: float = -1.0
    engine: str = "jax"                    # replaces the 'cuda' toggle
    blockwise: bool = False
    skeletonize_foreground: bool = False
    select_patches_for_sparse_data: bool = True
    skipThinCover: bool = False
    skipConsensus: bool = False
    skipRanking: bool = False
    skipSelection: bool = False
    mws: bool = False
    includeSinglePatchCCS: bool = True
    removeIntersection: bool = True
    one_instance_per_channel: bool = False
    no_overlap_per_channel: bool = False
    isbi_hack: bool = False
    isbi_sparsify_stride: int = 20
    select_patches_overlap_neighborhood: bool = False
    mark_close_neighboorhood: bool = False  # reference spelling
    overlapping_inst: bool = False
    pad_with_ps: bool = False
    consensus_norm_prob_product: bool = True
    consensus_prob_product: bool = True
    consensus_norm_aff: bool = True
    vi_bg_use_inv_th: bool = False
    vi_bg_use_half_th: bool = False
    vi_bg_use_less_than_th: bool = True
    rank_norm_patch_score: bool = True
    rank_int_counter: bool = False
    consensus_bf16: bool = False   # bf16 consensus storage (halves HBM)
    patch_graph_norm_aff: bool = True
    max_total_patch_distance_in_ps_multiples: float = 2.0
    score_threshold: float | None = None
    remove_small_comps: int = 0
    ignore_small_comps: int = 0
    chunksize: tuple = (92, 92, 92)
    only_bb: bool = True
    num_parallel_blocks: int = 1
    num_parallel_samples: int = 1
    sample: float = 1.0        # <1: random patch-pixel subsampling in the
                               # cover stages + random patch-list
                               # subsampling in the isbi hack
                               # (get_patch_sets.py:32-54,
                               # isbi_hacks.py:25-28)
    vote_debug: bool = False   # write tiled patch canvas + graph-edge
                               # canvas to the result hdf (reference
                               # debug volumes, vote_instances.py:270-274,
                               # graph_to_labeling.py:118-137)
    block_devices: int = 0     # >1 (or -1 = all): distribute blockwise
                               # blocks over the device mesh round-robin
                               # (blockwise.compute_blocks) so per-block
                               # assembly runs concurrently across chips
    sharded_devices: int = 0   # >1 (or -1 = all): z-shard consensus+rank
                               # over a device mesh with ICI halo exchange
                               # (parallel/sharded.py); bit-identical to
                               # the whole-volume result
    crop_to_foreground: bool = True
    aff_key: str = "volumes/pred_affs"
    code_key: str = "volumes/pred_code"  # ppp+dec blockwise (code_decoder)
    fg_key: str | None = None
    numinst_key: str | None = None
    numinst_threshs: tuple = (0.9, 0.1)
    res_key: str = "vote_instances"
    result_folder: str = "."
    profile_dir: str | None = None   # jax.profiler trace output for do_all
    store_scores: bool = False  # write the rank-score volume back into the
                                # prediction file under
                                # volumes/<patch_threshold>/scores with
                                # candidate centers marked +100
                                # (ranked_patches.py:147-181)
    shuffle_patches: bool = False  # diagnostic: random-shuffle the ranked
                                   # patch list after scoring
                                   # (ranked_patches.py:199-210)
    save_mip: bool = False  # colored max-projection PNG(s) of the result
                            # next to the hdf (stitch_patch_graph.py:823-845)
    save_tif: bool = False  # cleaned uint16 label volume as <base>.tif
                            # next to the hdf (stitch_patch_graph.py:
                            # 836-841 writes it whenever
                            # remove_small_comps > 0)
    dilate_instances: bool = False  # write 1-iteration binary-dilated
                                    # variants <res_key>_dil_1 /
                                    # _masked_dil_1 (stitch_patch_graph.py:
                                    # 871-895)
    chessboard: bool = False  # blockwise: phase-ordered block scheduling
                              # (8-color 3D / 4-color 2D chessboard) so no
                              # two concurrently-running blocks are grid
                              # neighbors (stitch_patch_graph.py:404-422)
    aff_file: str | None = None  # prediction path, set by do_all (needed
                                 # by store_scores write-back)
    use_score_oracle: bool = False   # rank by GT patch IoU instead of the
                                     # consensus score (ranked_patches.py:
                                     # 120-136; decouples assembly quality
                                     # from model quality)
    score_oracle_key: str = "volumes/patch_iou"
    return_intermediates: bool = False
    store_intermediates: bool = False  # persist pairs/graph .npy next to
                                       # the result for 2-phase resume
                                       # (aff_patch_graph.py:96-110)
    selected_patches: list | None = None
    selected_patch_pairs: np.ndarray | None = None
    aff_graph: np.ndarray | None = None  # precomputed edge weights: with
                                         # selected_patch_pairs, skips all
                                         # compute and goes straight to
                                         # labeling (affGraphToInstancesT)
    oracle_scores: np.ndarray | None = None   # per-pixel IoU volume
    center_valid: np.ndarray | None = None   # blockwise: gate patch centers
                                             # to GLOBAL-volume interior so
                                             # border blocks match the
                                             # whole-volume result (jax
                                             # engines only)
    code_decoder: object | None = None  # infer.decode.CodeDecoder: blockwise
                                        # assembly decodes pred_code windows
                                        # on demand instead of reading a
                                        # dense pred_affs store (out-of-core
                                        # ppp+dec; SURVEY §3.3)
    seed: int = 0

    @classmethod
    def from_config(cls, cfg: dict, **overrides) -> "VoteInstancesParams":
        known = {f.name for f in fields(cls)}
        kwargs = {k: v for k, v in cfg.items() if k in known}
        kwargs.update(overrides)
        if "patchshape" in kwargs:
            kwargs["patchshape"] = tuple(int(p) for p in kwargs["patchshape"])
        return cls(**kwargs)

    @property
    def bg_mode(self) -> str:
        if self.vi_bg_use_less_than_th:
            return "less"
        if self.vi_bg_use_half_th:
            return "half"
        return "inv"

    @property
    def weight_mode(self) -> str:
        if self.consensus_norm_prob_product:
            return "norm_prob_product"
        if self.consensus_prob_product:
            return "prob_product"
        return "count"

    def consensus_config(self) -> ConsensusConfig:
        return ConsensusConfig(
            patchshape=tuple(int(p) for p in self.patchshape),
            patch_threshold=self.patch_threshold,
            bg_mode=self.bg_mode,
            weight_mode=self.weight_mode,
            norm_aff=self.consensus_norm_aff,
            norm_rank=self.rank_norm_patch_score,
            rank_int_counter=self.rank_int_counter,
            norm_graph=self.patch_graph_norm_aff,
            overlapping_inst=self.overlapping_inst,
            cons_bf16=self.consensus_bf16,
        )


def _pad_all(arrays, rad):
    pads = [(int(r), int(r)) for r in rad]
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
        elif a.ndim == len(rad) + 1:
            out.append(np.pad(a, [(0, 0)] + pads, mode="constant"))
        else:
            out.append(np.pad(a, pads, mode="constant"))
    return out


def _device_paint_src(affs_dev, comps, patch_threshold: float) -> dict:
    """One batched device gather of the component nodes' patch columns ->
    sparse-dict painting source.

    The painter (np_reference.components_to_instances) only consumes
    ``patch > patch_threshold``, so the columns are thresholded ON DEVICE
    and cross the ~3 MB/s D2H relay BIT-PACKED: K*P/8 bytes instead of
    K*P f32 (~32x less — at bench scale the f32 gather alone was ~0.5 s
    of the labeling wall).  The returned uint8 0/1 vectors behave
    identically under the painter's own > threshold test."""
    import jax.numpy as jnp

    nodes = [idx for comp in comps for idx in comp]
    if not nodes:
        return {}
    pts = np.asarray(nodes, dtype=np.int64)
    P = int(affs_dev.shape[0])
    packed = jnp.packbits(
        (affs_dev[(slice(None),) + tuple(pts.T)]
         > patch_threshold).astype(jnp.uint8), axis=0)
    cols = np.unpackbits(np.asarray(packed), axis=0, count=P)
    return {tuple(int(x) for x in c): cols[:, i]
            for i, c in enumerate(pts)}


def to_instance_seg(
    pred_affs: np.ndarray,
    foreground: np.ndarray,
    mask_to_cover: np.ndarray,
    numinst: np.ndarray,
    params: VoteInstancesParams,
):
    """Full assembly (vote_instances.py:150-452).

    Returns (instances uint16, foreground uint8), or (pairs, weights) when
    ``params.return_intermediates`` (the blockwise contract).
    """
    ps = np.asarray(params.patchshape, dtype=np.int64)
    rad = ps // 2
    # device-resident input (fused predict->decode->assemble): keep the
    # dense stack on the accelerator; only small gathers come to host
    # (the dev tunnel moves D2H at ~3 MB/s - a full (P, *vol) readback
    # would dominate the pipeline)
    affs_on_device = (params.engine in ("jax", "pallas")
                      and not isinstance(pred_affs, np.ndarray))
    if not affs_on_device:
        pred_affs = np.asarray(pred_affs, dtype=np.float32)

    if params.pad_with_ps:
        assert not params.blockwise, "can only pad whole volumes"
        pred_affs, foreground, mask_to_cover, numinst = _pad_all(
            [pred_affs, foreground, mask_to_cover, numinst], rad)
        # _pad_all's np.pad pulls a device stack to host: recompute the
        # residency flag or every jitted stage would re-upload the full
        # (P, *vol) array per call
        affs_on_device = (params.engine in ("jax", "pallas")
                          and not isinstance(pred_affs, np.ndarray))

    foreground = foreground.astype(bool)
    vol_shape = foreground.shape
    radslice = tuple(slice(int(r), int(s - r))
                     for r, s in zip(rad, vol_shape))

    overlap_mask = (numinst > 1).astype(np.uint8)
    mask_to_cover = mask_to_cover.astype(bool).copy()

    # ISBI one-slice hack (vote_instances.py:215-218)
    if params.isbi_hack and vol_shape[0] > 1:
        from .isbi_hacks import keep_single_slice

        foreground = keep_single_slice(foreground)
        mask_to_cover = keep_single_slice(mask_to_cover)

    if not params.blockwise and params.skeletonize_foreground:
        mask_to_cover = skeletonize(mask_to_cover) > 0
    mask_to_cover[overlap_mask > 0] = False

    # empty-result template matches the output layout: multi-channel modes
    # return (C, *vol) stacks (components_to_instances), and
    # finalize_and_write's channel-indexed fg crop would crash on a 3D
    # zeros volume
    multi_out = (params.one_instance_per_channel
                 or params.no_overlap_per_channel)
    instances = np.zeros(((1,) + tuple(vol_shape)) if multi_out
                         else vol_shape, dtype=np.uint16)
    if np.count_nonzero(mask_to_cover[radslice]) == 0:
        logger.info("no fg found, returning")
        if params.return_intermediates:
            return None, None
        return _maybe_unpad(instances, foreground, rad, params)

    # precomputed-graph shortcut (affGraphToInstancesT,
    # graph_to_labeling.py:16-31): skip all compute, label directly
    if params.aff_graph is not None \
            and params.selected_patch_pairs is not None:
        pairs = np.asarray(params.selected_patch_pairs)
        weights = np.asarray(params.aff_graph, dtype=np.float32)
        if params.return_intermediates:
            # caller wants the (pairs, weights) contract, not labels
            # (e.g. store_intermediates after a vote_debug injection)
            return pairs, weights
        comps = ref.graph_components(pairs, weights, mws=params.mws)
        paint_src = (_device_paint_src(pred_affs, comps,
                                       params.patch_threshold)
                     if affs_on_device else pred_affs)
        instances = ref.components_to_instances(
            comps, paint_src, ps, vol_shape,
            patch_threshold=params.patch_threshold,
            one_instance_per_channel=params.one_instance_per_channel,
            no_overlap_per_channel=params.no_overlap_per_channel)
        return _maybe_unpad(instances, foreground, rad, params)

    if params.skipConsensus:
        # reference semantics (vote_instances.py:305-314): consensus=None
        # is only viable when nothing downstream consumes it — i.e. when
        # both the pair list AND the graph weights are injected, which the
        # precomputed-graph shortcut above already handles.  Reaching this
        # point with the flag set is a config error; fail loudly instead
        # of silently computing the consensus anyway.
        raise ValueError(
            "skipConsensus=true requires precomputed selected_patch_pairs "
            "+ aff_graph (ranking and graph weights both consume the "
            "consensus array)")

    ccfg = params.consensus_config()
    use_jax = params.engine in ("jax", "pallas", "xla")
    if params.engine == "pallas":
        use_pallas = pallas_supported(ccfg, vol_shape)
    elif params.engine == "jax":
        # auto: the Pallas kernel is ~3x the XLA scan on TPU; plain XLA
        # elsewhere (CPU) and for unsupported patchshapes/volumes
        import jax as _jax

        use_pallas = (pallas_supported(ccfg, vol_shape)
                      and _jax.default_backend() == "tpu")
    else:
        use_pallas = False
    # 2D volumes (Z == 1) are excluded from the 3D kernel by the Mosaic
    # single-z miscompile; the row-folded 2D kernels cover them (BBBC010
    # scale: the XLA scan is O(ps^2) sequential steps there)
    use_pallas2d = False
    S_fold2d = None
    if (use_jax and not use_pallas
            and params.engine in ("jax", "pallas")
            and not os.environ.get("PPP_DISABLE_PALLAS2D")):
        import jax as _jax

        from ..ops.pallas_consensus_2d import pallas2d_supported

        use_pallas2d = (pallas2d_supported(ccfg, vol_shape)
                        and _jax.default_backend() == "tpu")
        if use_pallas2d and not ccfg.cons_bf16 \
                and not os.environ.get("PPP_PALLAS2D_F32"):
            # at dataset scale the f32 fold layout (plus the rank
            # operand stacks and the unfold) exceeds a 16 GB chip;
            # bf16 storage is the 2D default above ~1.5 GB (the 3D
            # path's cons_bf16 semantics: ~0.4% noise in rank/graph)
            from ..ops.pallas_consensus_2d import fold_bytes_f32
            fb = fold_bytes_f32(ccfg, vol_shape)
            if fb > 1.5e9:
                import dataclasses as _dc
                ccfg = _dc.replace(ccfg, cons_bf16=True)
                logger.info("2D pallas: bf16 consensus fold "
                            "(f32 fold would be %.1f GB)", fb / 1e9)
    _t_stage = time.perf_counter()

    # (1) consensus (bool mask: integer masks defeat XLA mask fusion).
    # Upload the affinity stack ONCE; all device stages share it (repeated
    # numpy->jit calls re-transfer it every time).
    overlap_arg = (overlap_mask > 0) if params.overlapping_inst else None
    cv_arg = None
    if params.center_valid is not None:
        assert use_jax, "center_valid requires a jax engine"
        cv_arg = np.asarray(params.center_valid, dtype=bool)
        assert cv_arg.shape == tuple(vol_shape)
    sharded_scores = None
    sharded_mesh = None
    folded_scores = None
    scores_dev = None
    if use_jax:
        import jax

        pred_affs_dev = (pred_affs if affs_on_device
                         else jax.device_put(pred_affs))
        if overlap_arg is not None:
            overlap_arg = jax.device_put(overlap_arg)
        if cv_arg is not None:
            cv_arg = jax.device_put(cv_arg)
        n_sh = _sharded_mesh_size(params, vol_shape, ccfg)
        # 2x z->x lane folding: when the row extent underuses the 128
        # VPU lanes, run consensus+rank on two haloed z-slabs placed
        # side by side (whole-volume-exact; see fold2x_geometry).  Only
        # when the rank stage actually runs (it shares the folded
        # arrays); oracle/injected-selection runs skip it.
        fold_geom = None
        if (use_pallas and n_sh <= 1
                and not os.environ.get("PPP_DISABLE_FOLD2X")
                and not (params.use_score_oracle
                         and params.oracle_scores is not None)
                and not (params.skipRanking
                         and (params.selected_patches is not None
                              or params.selected_patch_pairs is not None))
                and not os.environ.get("PPP_DISABLE_PALLAS_RANK")):
            from ..ops.pallas_consensus import fold2x_geometry

            fold_geom = fold2x_geometry(ccfg, vol_shape)
        with _stage_trace("consensus"):
            if n_sh > 1:
                # multi-device: z-shard consensus + rank over the mesh
                # with ICI halo exchange (whole-volume-exact); the
                # XLA-scan consensus runs per shard (the pallas kernel
                # is single-core)
                from ..parallel import (make_spatial_mesh,
                                        sharded_consensus_and_rank)

                use_pallas = False
                sharded_mesh = make_spatial_mesh(n_sh)
                cons, sharded_scores = sharded_consensus_and_rank(
                    pred_affs_dev, ccfg, sharded_mesh,
                    overlap=overlap_arg, center_valid=cv_arg)
            elif use_pallas and fold_geom is not None:
                from ..ops.pallas_consensus import (
                    consensus_and_rank_pallas_fold2x)

                cons, folded_scores = consensus_and_rank_pallas_fold2x(
                    pred_affs_dev, ccfg, fold_geom, overlap=overlap_arg,
                    center_valid=cv_arg)
            elif use_pallas:
                # the pallas kernel emits the CANONICAL HALF (dz >= 0
                # planes only — half the pair-loop work); the rank kernel
                # consumes it directly, the graph stage symmetrizes it
                cons = consensus_array_pallas(pred_affs_dev, ccfg,
                                              overlap=overlap_arg,
                                              center_valid=cv_arg)
            elif use_pallas2d:
                # row-folded 2D kernel; keep the fold layout for the
                # rank kernel.  The symmetrized unfold for the graph
                # stage is DEFERRED until after rank so the fold array,
                # the unfolded array and the rank operand stacks never
                # coexist in HBM (at BBBC010 scale each is 3.5-4.6 GB).
                from ..ops.pallas_consensus_2d import (
                    consensus_fold_pallas_2d)

                S_fold2d = consensus_fold_pallas_2d(
                    pred_affs_dev, ccfg, overlap=overlap_arg,
                    center_valid=cv_arg)
                cons = None
            else:
                cons = consensus_array(pred_affs_dev, ccfg,
                                       overlap=overlap_arg,
                                       center_valid=cv_arg)
        cons_np = None
    else:
        cons_np, _ = ref.consensus_reference(
            pred_affs, ps, th=params.patch_threshold,
            bg_mode=params.bg_mode, weight_mode=params.weight_mode,
            norm_aff=params.consensus_norm_aff, overlap=overlap_arg)
        cons = cons_np

    logger.info("stage consensus: %.2fs", time.perf_counter() - _t_stage)
    _t_stage = time.perf_counter()

    # (2) patch ranking (skippable when selected patches are injected,
    # e.g. by blockwise stitching)
    if params.use_score_oracle and params.oracle_scores is not None:
        # oracle mode: rank by precomputed GT patch IoU
        scores = np.asarray(params.oracle_scores, dtype=np.float32)
        assert scores.shape == tuple(vol_shape), \
            f"oracle scores shape {scores.shape} != volume {vol_shape}"
    elif params.skipRanking and (params.selected_patches is not None
                                 or params.selected_patch_pairs is not None):
        scores = np.zeros(vol_shape, dtype=np.float32)
    elif sharded_scores is not None:
        with _stage_trace("rank"):
            scores = np.asarray(sharded_scores)
    elif folded_scores is not None:
        # computed alongside the folded consensus (shared folded inputs);
        # readback deferred to a candidate-only gather (see below)
        scores, scores_dev = None, folded_scores
    elif use_pallas and not os.environ.get("PPP_DISABLE_PALLAS_RANK"):
        # pallas rank consumes the canonical-half consensus the pallas
        # consensus kernel emitted (same grid/banded streaming; replaces
        # the P sequential XLA-scan steps).  PPP_DISABLE_PALLAS_RANK=1
        # falls back to the XLA-scan rank (the half is embedded into the
        # canonical full-extent layout the scan rank reads).
        from ..ops.pallas_consensus import rank_scores_pallas

        scores, scores_dev = None, rank_scores_pallas(
            pred_affs_dev, cons, ccfg, overlap=overlap_arg,
            center_valid=cv_arg)
    elif (use_pallas2d and S_fold2d is not None
          and not os.environ.get("PPP_DISABLE_PALLAS_RANK")):
        # fused rank + unfold with the ~4.6 GB fold buffer donated
        from ..ops.pallas_consensus_2d import rank_and_unfold_pallas_2d

        scores_dev, cons = rank_and_unfold_pallas_2d(
            pred_affs_dev, S_fold2d, ccfg, overlap=overlap_arg,
            center_valid=cv_arg)
        scores, S_fold2d = None, None
    elif use_jax:
        if use_pallas2d and cons is None:
            # XLA-scan rank fallback needs the unfolded consensus now
            from ..ops.pallas_consensus_2d import unfold_consensus

            cons = unfold_consensus(S_fold2d, ccfg, vol_shape)
            S_fold2d = None
        if use_pallas and cons.shape[0] != int(ccfg.neigh[0]):
            # pallas consensus emitted the canonical half; the XLA-scan
            # rank reads the full-extent canonical layout
            from ..ops.consensus_jax import embed_half

            cons = embed_half(cons, ccfg)
        scores, scores_dev = None, rank_scores(pred_affs_dev, cons, ccfg,
                                               overlap=overlap_arg,
                                               center_valid=cv_arg)
    else:
        scores = ref.rank_patches_reference(
            pred_affs, cons_np, ps, th=params.patch_threshold,
            bg_mode=params.bg_mode, norm_rank=params.rank_norm_patch_score,
            int_counter=params.rank_int_counter, overlap=overlap_arg)

    if use_pallas2d and cons is None:
        # deferred unfold: the fold array is no longer needed once the
        # rank kernel (or the oracle/skip branch) has run
        from ..ops.pallas_consensus_2d import unfold_consensus

        cons = unfold_consensus(S_fold2d, ccfg, vol_shape)
        S_fold2d = None

    logger.info("stage rank: %.2fs", time.perf_counter() - _t_stage)
    interior = np.zeros(vol_shape, dtype=bool)
    interior[radslice] = True
    if params.center_valid is not None:
        # blockwise: candidate patches must be interior in the GLOBAL
        # volume, not just this block's window
        interior &= np.asarray(params.center_valid, dtype=bool)
    all_patches = [tuple(c) for c in np.argwhere(foreground & interior)]
    if params.isbi_hack:
        from .isbi_hacks import (filter_instance_boundaries_from_fg,
                                 sparsify_patches)

        if affs_on_device:
            pred_affs = np.asarray(pred_affs, dtype=np.float32)
        all_patches = sparsify_patches(all_patches,
                                       params.isbi_sparsify_stride,
                                       vol_shape=vol_shape)
        if params.sample < 1.0 and len(all_patches) > 0:
            # random patch-list subsample (isbi_hacks.py:25-28)
            rng_s = np.random.RandomState(params.seed)
            n_keep = max(1, int(params.sample * len(all_patches)))
            sel = rng_s.choice(len(all_patches), n_keep, replace=False)
            all_patches = [all_patches[i] for i in sorted(sel)]
        if vol_shape[0] > 1:
            mask_to_cover = filter_instance_boundaries_from_fg(
                pred_affs, foreground, all_patches, ps, mask_to_cover,
                patch_threshold=params.patch_threshold)
    if len(all_patches) == 0:
        logger.info("no interior patches, returning")
        if params.return_intermediates:
            return None, None
        return _maybe_unpad(instances, foreground, rad, params)
    if scores is None:
        # device scores: read back ONLY the candidate centers' values (a
        # device gather + tiny D2H instead of the full volume over the
        # slow relay), then sort exactly like rank_patch_list (stable
        # descending, ties keep scan order).
        import jax.numpy as _jnp

        with _stage_trace("rank"):
            cand = np.asarray(all_patches, dtype=np.int64)
            flat = np.ravel_multi_index(
                tuple(cand.T), tuple(int(v) for v in vol_shape))
            svals = np.asarray(_jnp.take(
                scores_dev.reshape(-1), _jnp.asarray(flat, _jnp.int32)),
                dtype=np.float32)
        order = np.argsort(-svals, kind="stable")
        ranked = [(cand[i], float(svals[i])) for i in order]
    else:
        ranked = ref.rank_patch_list(all_patches, scores)

    if params.store_scores and params.aff_file:
        # score-volume write-back (ranked_patches.py:147-181): full score
        # volume with candidate centers marked +100, under a threshold-
        # derived key; debug readback is worth the one full D2H here
        full_scores = (np.asarray(scores_dev, dtype=np.float32)
                       if scores is None
                       else np.asarray(scores, dtype=np.float32))
        _write_scores_volume(params, full_scores, all_patches, rad)
    if params.shuffle_patches:
        # diagnostic mode (ranked_patches.py:199-210): destroy the rank
        # order to measure how much the consensus ranking buys
        rng_sh = np.random.RandomState(params.seed)
        ranked = [ranked[i] for i in rng_sh.permutation(len(ranked))]

    _t_stage = time.perf_counter()

    # patch-pixel subsampling (get_patch_sets.py:32-54 ``sample < 1``):
    # each patch's above-threshold pixel set is randomly thinned before
    # the cover stages.  Bernoulli(sample) per (pixel, patch) entry is the
    # order-free parallel analog of the reference's random.sample (exact
    # sequential sampling is order-dependent, like the LCG note below).
    def _thin_host(a):
        keep = np.random.RandomState(params.seed).rand(
            *np.shape(a)) < params.sample
        return np.where(keep, np.asarray(a, np.float32), 0.0)

    cover_affs_dev = pred_affs_dev if use_jax else None
    if params.sample < 1.0 and use_jax:
        import jax as _jax
        import jax.numpy as _jnp

        keep = _jax.random.bernoulli(
            _jax.random.PRNGKey(params.seed), params.sample,
            pred_affs_dev.shape)
        cover_affs_dev = _jnp.where(keep, pred_affs_dev, 0.0)

    # (3) greedy foreground cover  (4) thin-out set cover
    if params.selected_patches is not None:
        selected = [(np.asarray(c), 1.0) for c in params.selected_patches]
    elif params.selected_patch_pairs is not None or params.skipSelection:
        # injected pair list (blockwise stitching): the cover stages would
        # only feed pair generation, which is skipped
        selected = ranked
    else:
        cover_host_only = (params.score_threshold is not None
                           or params.select_patches_overlap_neighborhood
                           or params.mark_close_neighboorhood)
        if cover_host_only and affs_on_device:
            pred_affs = np.asarray(pred_affs, dtype=np.float32)
        if use_jax and not cover_host_only:
            with _stage_trace("cover"):
                selected, _ = greedy_cover_device(
                    cover_affs_dev, mask_to_cover, ranked, ps,
                    fc_threshold=params.fc_threshold,
                    overlap=overlap_mask,
                    sparse_data=params.select_patches_for_sparse_data,
                    want_running=False, mesh=sharded_mesh)
        else:
            host_cover_affs = (_thin_host(pred_affs)
                               if params.sample < 1.0 else pred_affs)
            selected, _ = ref.foreground_cover_reference(
                host_cover_affs, mask_to_cover, ranked, ps,
                fc_threshold=params.fc_threshold,
                overlap=overlap_mask,
                sparse_data=params.select_patches_for_sparse_data,
                score_threshold=params.score_threshold,
                overlap_neighborhood=(
                    params.select_patches_overlap_neighborhood),
                mark_close=params.mark_close_neighboorhood)
        logger.info("stage cover: %.2fs (%d selected)",
                    time.perf_counter() - _t_stage, len(selected))
        _t_stage = time.perf_counter()
        if not params.skipThinCover and len(selected) > 0:
            if use_jax:
                with _stage_trace("thin_cover"):
                    selected = thin_out_cover_device(
                        cover_affs_dev, mask_to_cover, selected, ps,
                        fc_threshold=params.fc_threshold)
            else:
                selected = ref.thin_out_cover_reference(
                    _thin_host(pred_affs) if params.sample < 1.0
                    else pred_affs,
                    mask_to_cover, selected, ps,
                    fc_threshold=params.fc_threshold)
            logger.info("stage thin-cover: %.2fs (%d kept)",
                        time.perf_counter() - _t_stage, len(selected))
    _t_stage = time.perf_counter()

    # (5) patch pairs + patch graph
    if params.selected_patch_pairs is not None:
        pairs = np.asarray(params.selected_patch_pairs, dtype=np.uint32)
    else:
        pairs, _ = ref.patch_pairs_reference(
            selected, ps,
            max_ps_dist=params.max_total_patch_distance_in_ps_multiples,
            include_singleton=params.includeSinglePatchCCS)
    logger.info("stage pairs: %.2fs (%s pairs)", time.perf_counter() - _t_stage,
                0 if pairs is None else len(pairs))
    _t_stage = time.perf_counter()
    if pairs is None or len(pairs) == 0:
        logger.info("no patch pairs, returning")
        if params.return_intermediates:
            return None, None
        return _maybe_unpad(instances, foreground, rad, params)

    if use_jax:
        with _stage_trace("patch_graph"):
            if use_pallas2d:
                sym = cons          # 2D path already emits the full sym
            elif cons.shape[0] != int(ccfg.neigh[0]):
                # pallas canonical half -> full symmetric (cheap shifts)
                from ..ops.consensus_jax import symmetrize_half

                sym = symmetrize_half(cons, ccfg)
            else:
                sym = symmetrize_consensus(cons, ccfg)
            weights = np.asarray(patch_graph_weights(
                pred_affs_dev, sym, pairs, ccfg, seed=params.seed,
                drop_intersection=params.removeIntersection,
                mesh=sharded_mesh))
    else:
        weights = ref.patch_graph_reference(
            pred_affs, cons_np, pairs, ps, th=params.patch_threshold,
            norm_graph=params.patch_graph_norm_aff,
            intersection_lcg=params.removeIntersection)

    logger.info("stage graph-weights: %.2fs", time.perf_counter() - _t_stage)
    _t_stage = time.perf_counter()
    if params.return_intermediates:
        return pairs, weights

    # (6) components -> instance painting (device label propagation for
    # the jax engine; host union-find otherwise / for mws)
    if use_jax and not params.mws:
        from ..ops.graph_device import graph_components_device

        comps = graph_components_device(pairs, weights)
    else:
        comps = ref.graph_components(pairs, weights, mws=params.mws)
    paint_src = (_device_paint_src(pred_affs_dev, comps,
                                   params.patch_threshold)
                 if affs_on_device else pred_affs)
    instances = ref.components_to_instances(
        comps, paint_src, ps, vol_shape,
        patch_threshold=params.patch_threshold,
        one_instance_per_channel=params.one_instance_per_channel,
        no_overlap_per_channel=params.no_overlap_per_channel)
    logger.info("stage labeling: %.2fs (%d components)",
                time.perf_counter() - _t_stage, len(comps))
    return _maybe_unpad(instances, foreground, rad, params)


def _write_scores_volume(params: VoteInstancesParams, scores: np.ndarray,
                         all_patches, rad):
    """Rank-score write-back into the prediction store
    (ranked_patches.py:147-181): candidate centers marked +100, key
    ``volumes/<patch_threshold>/scores`` (dots -> underscores), cropped by
    the patch radius when the volume was pad_with_ps-padded."""
    marked = np.array(scores, dtype=np.float32, copy=True)
    for c in all_patches:
        marked[tuple(int(x) for x in c)] += 100.0
    if params.pad_with_ps:
        sl = tuple(slice(int(r), int(s - r))
                   for r, s in zip(rad, marked.shape))
        marked = marked[sl]
    thresh_key = str(round(float(params.patch_threshold), 2)) \
        .replace(".", "_")
    key = f"volumes/{thresh_key}/scores"
    out = vio.open_volume(params.aff_file, mode="r+")
    marked = np.squeeze(marked)
    out.create(key, marked.shape, np.float32,
               chunks=[max(1, s // 2) for s in marked.shape])
    out.write(marked, key=key)
    out.close()
    logger.info("stored scores volume at %s:%s", params.aff_file, key)


def _maybe_unpad(instances, foreground, rad, params):
    if params.pad_with_ps:
        sl = tuple(slice(int(r), int(s - r))
                   for r, s in zip(rad, foreground.shape))
        foreground = foreground[sl]
        multi = (params.one_instance_per_channel
                 or params.no_overlap_per_channel)
        instances = instances[(Ellipsis,) + sl] if multi else instances[sl]
    return instances.astype(np.uint16), foreground.astype(np.uint8)


def numinst_from_probs(prob: np.ndarray,
                       params: VoteInstancesParams) -> np.ndarray:
    """Per-voxel instance count from class probabilities
    (utilVoteInstances.py:260-272): per-class thresholds when configured,
    else argmax."""
    prob = np.asarray(prob, dtype=np.float32)
    if params.numinst_threshs:
        numinst = np.zeros(prob.shape[1:], dtype=np.uint8)
        for i, t in enumerate(params.numinst_threshs):
            numinst[prob[i + 1] > t] = i + 1
        return numinst
    return np.argmax(prob, axis=0).astype(np.uint8)


def _derive_fg_numinst(io, params: VoteInstancesParams,
                       center_channel_reader=None):
    """Derive (numinst, foreground) masks from the prediction store
    (utilVoteInstances.py:260-322) WITHOUT reading the dense affinities:
    numinst argmax / per-class thresholds, fg_key threshold, or the center
    affinity channel supplied by ``center_channel_reader``.  Closes ``io``.
    """
    fg_thresh = params.fg_thresh_vi if params.fg_thresh_vi > 0 \
        else params.patch_threshold

    numinst = None
    if params.numinst_key:
        prob = np.squeeze(io.read(key=params.numinst_key)).astype(np.float32)
        if prob.ndim == 3:
            prob = prob[:, None]
        numinst = numinst_from_probs(prob, params)
        foreground = numinst > 0
    elif params.fg_key:
        fg_prob = np.squeeze(io.read(key=params.fg_key))
        if fg_prob.ndim == 2:
            fg_prob = fg_prob[None]
        foreground = fg_prob > fg_thresh
    else:
        assert center_channel_reader is not None
        foreground = center_channel_reader() > fg_thresh

    io.close()
    if numinst is None:
        numinst = foreground.astype(np.uint8)
    return numinst, foreground.astype(bool)


def load_affinities(aff_file: str, params: VoteInstancesParams):
    """Load predictions and derive fg / numinst
    (utilVoteInstances.py:136-322).

    Handles channels-last rotation, logits -> sigmoid, fg from fg_key /
    numinst argmax (or per-class thresholds) / center channel.
    """
    from scipy.special import expit

    ps = np.asarray(params.patchshape)
    io = vio.open_volume(aff_file, mode="r")
    affs = io.read(key=params.aff_key).astype(np.float32)

    P = int(np.prod(ps))
    if affs.ndim >= 2 and affs.shape[-1] == P and affs.shape[0] != P:
        affs = np.ascontiguousarray(np.moveaxis(affs, -1, 0))
    affs = np.squeeze(affs)
    if affs.ndim == 3:  # 2D data -> (P, 1, H, W)
        affs = affs[:, None]
    # probabilities live in [0, 1]: EITHER bound violation proves logits
    # (AND missed one-sided logit volumes, e.g. all-background blocks with
    # only negative logits); epsilon tolerates f16 storage round-off
    if affs.min() < -1e-3 or affs.max() > 1 + 1e-3:
        affs = expit(affs)

    numinst, foreground = _derive_fg_numinst(
        io, params, center_channel_reader=lambda: affs[P // 2])
    return affs, numinst, foreground


def do_all(aff_file: str, params: VoteInstancesParams,
           result_folder: str | None = None) -> str:
    """Process one prediction file into an instance hdf
    (vote_instances.py:486-554)."""
    result_folder = result_folder or params.result_folder
    os.makedirs(result_folder, exist_ok=True)

    if params.profile_dir:
        import jax.profiler

        jax.profiler.start_trace(params.profile_dir)
    try:
        return _do_all_inner(aff_file, params, result_folder)
    finally:
        if params.profile_dir:
            import jax.profiler

            jax.profiler.stop_trace()


def _do_all_inner(aff_file: str, params: VoteInstancesParams,
                  result_folder: str) -> str:
    if params.aff_file != aff_file:
        from dataclasses import replace

        params = replace(params, aff_file=aff_file)

    if params.use_score_oracle and params.oracle_scores is None:
        # load the GT patch-IoU volume written by evaluate_prediction
        # (run_ppp.py:1347-1364)
        from dataclasses import replace

        oio = vio.open_volume(aff_file, mode="r")
        oracle = np.squeeze(oio.read(key=params.score_oracle_key)) \
            .astype(np.float32)
        oio.close()
        if oracle.ndim == 2:
            oracle = oracle[None]
        params = replace(params, oracle_scores=oracle)

    debug_canvases = None
    if params.blockwise:
        # blockwise + stitching path (stitch_patch_graph.py:553-669):
        # streams blocks from the prediction file (out-of-core) and
        # persists per-block intermediates next to the result for resume
        from .blockwise import blockwise_vote_instances_zarr

        instances, fg_out = blockwise_vote_instances_zarr(
            aff_file, params, chunksize=params.chunksize,
            result_folder=result_folder, decoder=params.code_decoder)
    else:
        affs, numinst, foreground = load_affinities(aff_file, params)
        mask = foreground.copy()
        if params.vote_debug:
            # compute pairs/weights once, render the reference's debug
            # volumes, then label from the precomputed intermediates
            from dataclasses import replace

            from .debug_viz import render_graph_edges, render_patch_tiles

            pairs, weights = to_instance_seg(
                affs, foreground, mask.copy(), numinst,
                replace(params, return_intermediates=True))
            tiles = render_patch_tiles(np.asarray(affs), foreground,
                                       params.patchshape)
            if pairs is not None:
                edges = render_graph_edges(pairs, np.asarray(weights),
                                           foreground.shape,
                                           params.patchshape)
                params = replace(params, selected_patch_pairs=pairs,
                                 aff_graph=np.asarray(weights))
            else:
                edges = np.zeros_like(tiles)
            debug_canvases = {"vote_debug": tiles, "vote_debug2": edges}
        if params.store_intermediates:
            # 2-phase with .npy persistence + resume
            # (aff_patch_graph.py:96-110): pairs/graph computed once,
            # labeling re-runs from the stored arrays
            from dataclasses import replace

            base0 = os.path.splitext(os.path.basename(aff_file))[0]
            pp_path = os.path.join(result_folder,
                                   base0 + "_selected_patch_pairs.npy")
            ag_path = os.path.join(result_folder, base0 + "_aff_graph.npy")
            if not (os.path.exists(pp_path) and os.path.exists(ag_path)):
                pairs, weights = to_instance_seg(
                    affs, foreground, mask.copy(), numinst,
                    replace(params, return_intermediates=True))
                if pairs is not None:
                    np.save(pp_path, pairs)
                    np.save(ag_path, np.asarray(weights))
            if os.path.exists(pp_path):
                params = replace(params,
                                 selected_patch_pairs=np.load(pp_path),
                                 aff_graph=np.load(ag_path))
        instances, fg_out = to_instance_seg(affs, foreground, mask,
                                            numinst, params)
    base = os.path.splitext(os.path.basename(aff_file))[0]
    return finalize_and_write(instances, fg_out, params, base,
                              result_folder, extra_keys=debug_canvases)


def finalize_and_write(instances, fg_out, params: VoteInstancesParams,
                       base: str, result_folder: str,
                       extra_keys: dict | None = None) -> str:
    """Small-component removal, fg crop, and hdf output
    (vote_instances.py:521-554 + the stitch post outputs,
    stitch_patch_graph.py:823-895); shared by do_all and the fused CLI
    path."""
    instances = np.asarray(instances)
    fg_out = np.asarray(fg_out)
    if params.save_mip:
        # pre-cleanup MIP (stitch_patch_graph.py:823-829)
        _save_label_mip(instances,
                        os.path.join(result_folder, base + ".png"))
    if params.remove_small_comps > 0:
        instances = remove_small_components(instances,
                                            params.remove_small_comps)
        if params.save_tif:
            # relabeled uint16 tif of the cleaned volume
            # (stitch_patch_graph.py:835-841)
            from ..utils.io import save_tif
            from ..utils.postprocess import relabel

            save_tif(os.path.join(result_folder, base + ".tif"),
                     relabel(instances).astype(np.uint16))
        if params.save_mip:
            # post-cleanup MIP (stitch_patch_graph.py:839-845)
            _save_label_mip(instances, os.path.join(
                result_folder, base + "_cleaned.png"))
    if params.crop_to_foreground:
        if params.one_instance_per_channel or params.no_overlap_per_channel:
            instances[:, fg_out == 0] = 0
        else:
            instances[fg_out == 0] = 0

    # append mode: validate_checkpoints writes each param set's labels
    # under a distinct res_key in the SAME file (per-param result keys,
    # run_ppp.py:969-988), so earlier param sets' outputs survive
    out_path = os.path.join(result_folder, base + ".hdf")
    out = vio.IoHDF5(out_path, mode="a")
    out.write(instances, key=params.res_key,
              attrs={"offset": (0, 0, 0), "resolution": (1, 1, 1)})
    out.write(fg_out.astype(np.uint8), key="vote_foreground",
              attrs={"offset": (0, 0, 0), "resolution": (1, 1, 1)})
    # fg-masked copy (stitch_patch_graph.py:860-866); identical to res_key
    # when crop_to_foreground already zeroed outside fg
    masked = instances.copy()
    if params.one_instance_per_channel or params.no_overlap_per_channel:
        masked[:, fg_out == 0] = 0
    else:
        masked[fg_out == 0] = 0
    out.write(masked, key="vote_instances_masked")
    if params.dilate_instances:
        # per-label 1-iteration binary dilation (stitch_patch_graph.py:
        # 871-895); later (higher) labels win contested dilated voxels,
        # matching the reference's ascending-label overwrite loop
        from scipy import ndimage

        instdil = instances.copy()
        for lbl in np.unique(instances):
            if lbl == 0:
                continue
            grown = ndimage.binary_dilation(instdil == lbl, iterations=1)
            instdil[grown] = lbl
        out.write(instdil, key=params.res_key + "_dil_1")
        mdil = instdil.copy()
        if params.one_instance_per_channel or params.no_overlap_per_channel:
            mdil[:, fg_out == 0] = 0
        else:
            mdil[fg_out == 0] = 0
        out.write(mdil, key=params.res_key + "_masked_dil_1")
    for k, v in (extra_keys or {}).items():
        out.write(np.asarray(v), key=k)
    out.close()
    return out_path


def _save_label_mip(instances: np.ndarray, out_file: str):
    """Colored label MIP PNG (stitch_patch_graph.py:824-829 ``color(
    np.max(instances, axis=0))``)."""
    from PIL import Image

    from ..utils.postprocess import color_labels

    mip = np.asarray(instances)
    while mip.ndim > 2:
        mip = mip.max(axis=0)
    Image.fromarray(color_labels(mip.astype(np.int64))).save(out_file)
