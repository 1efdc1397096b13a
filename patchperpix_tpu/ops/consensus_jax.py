"""XLA implementations of the consensus / ranking / patch-graph math.

TPU-native reformulation of the reference CUDA kernels
(cuda/fillConsensusArray.cu, rankPatches.cu, computePatchGraph.cu):

Instead of one thread per voxel looping over all patch-pixel pairs with
atomics, the consensus array is built as a *scan over base patch offsets q*:
for each q, the votes of ALL (q, r) channel pairs at ALL centers are one
dense elementwise tensor op, and their scatter into the 6-D consensus array
is a single contiguous block update (the r -> r-q+ps-1 offset remap is a
shift of the whole patch box, and the center -> base-pixel shift is the same
spatial translation for every r).  No atomics, no gathers; everything is
static-shaped and fuses on the VPU.

Patch ranking reads the consensus with the same block-slice pattern
(one dynamic_slice per q instead of one update), so consensus construction
and ranking share their masks and can run back to back on-device.

The patch graph gathers, per candidate patch pair, one consensus sub-block
around the center offset and contracts it against the two patches' fg masks
with a static gather table; pairs are processed vmapped in chunks.

Conventions match ops/np_reference.py: affs is (P, *vol) float32,
consensus is (*neigh, *vol) with neigh = 2*ps-1 (or 1 where ps == 1), and the
offset index of delta d = p2 - p1 is d + ps - 1.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .np_reference import bg_threshold, neigh_extent, patch_offsets


@dataclass(frozen=True)
class ConsensusConfig:
    """Static configuration for the consensus/rank/graph kernels.

    Field defaults follow the flylight reference config
    (experiments/flylight/setups/setup01/default.toml:[vote_instances]).
    """
    patchshape: tuple
    patch_threshold: float = 0.5
    bg_mode: str = "less"                   # vi_bg_use_less_than_th
    weight_mode: str = "norm_prob_product"  # consensus_norm_prob_product
    norm_aff: bool = True                   # consensus_norm_aff
    norm_rank: bool = True                  # rank_norm_patch_score
    rank_int_counter: bool = False          # rank_int_counter
    norm_graph: bool = True                 # patch_graph_norm_aff
    overlapping_inst: bool = False
    cons_bf16: bool = False                 # store the consensus in
                                            # bfloat16 (halves the
                                            # (2ps-1)^d x vol HBM cost for
                                            # large blocks; ~0.4% noise in
                                            # rank/graph sums)

    @property
    def ps(self) -> np.ndarray:
        return np.asarray(self.patchshape, dtype=np.int64)

    @property
    def rad(self) -> np.ndarray:
        return self.ps // 2

    @property
    def neigh(self) -> np.ndarray:
        return neigh_extent(self.ps)

    @property
    def P(self) -> int:
        return int(np.prod(self.ps))

    @property
    def mid(self) -> int:
        return self.P // 2

    @property
    def bg_th(self) -> float:
        return bg_threshold(self.patch_threshold, self.bg_mode)


def _lexpos_table(ps: np.ndarray) -> np.ndarray:
    """(P, P) bool: lexpos[q, r] == True iff patch offset r > q (linear order).

    Linear patch index order == lexicographic order of the spatial offsets,
    which is how the CUDA kernels orient pairs (po2 > po1)."""
    P = int(np.prod(ps))
    q = np.arange(P)
    return q[None, :] > q[:, None]


def _shift_nd(vol: jnp.ndarray, shift, axes) -> jnp.ndarray:
    """Translate ``vol`` by ``shift`` (traced per-axis ints), zero fill.

    out[x] = vol[x - shift] where in bounds, else 0.
    """
    out = vol
    for s, ax in zip(shift, axes):
        out = jnp.roll(out, s, axis=ax)
        size = out.shape[ax]
        idx = jax.lax.broadcasted_iota(
            jnp.int32, out.shape, ax)
        # after roll by s: invalid region is [0, s) for s>0, [size+s, size) for s<0
        mask = jnp.where(s >= 0, idx >= s, idx < size + s)
        out = out * mask.astype(out.dtype)
    return out


def _masks(affs: jnp.ndarray, cfg: ConsensusConfig,
           overlap: jnp.ndarray | None,
           center_valid: jnp.ndarray | None = None):
    """(hi, lo, tgt) eligibility masks, each (P, *vol) float32.

    hi[p, c]: center c interior+fg, patch value > th, target pixel fg (and
    not overlap) -- fillConsensusArray.cu:25-60.  lo likewise with the
    bg-threshold.  tgt: target-eligible regardless of patch value (used for
    the rank fgCnt).
    """
    ps, rad = cfg.ps, cfg.rad
    ndim = len(ps)
    vol_shape = affs.shape[1:]
    th = cfg.patch_threshold

    fg = affs[cfg.mid] > th
    interior = jnp.ones(vol_shape, dtype=bool)
    for ax in range(ndim):
        if rad[ax] == 0:
            continue
        idx = jax.lax.broadcasted_iota(jnp.int32, vol_shape, ax)
        interior &= (idx >= int(rad[ax])) & (idx < vol_shape[ax] - int(rad[ax]))
    center_ok = fg & interior
    if center_valid is not None:
        # extra gate for sharded execution: a halo center is only valid if
        # it is interior in the GLOBAL volume, not just in this block
        center_ok = center_ok & center_valid

    tgt_ok = fg
    if cfg.overlapping_inst and overlap is not None:
        tgt_ok = tgt_ok & jnp.logical_not(overlap.astype(bool))

    offs = patch_offsets(ps)
    # tgt[p][c] = tgt_ok[c + offs[p] - rad]: same translation as _shift_nd
    # with shift = -(offs[p] - rad); stack via vmap over p.
    shifts = jnp.asarray(-(offs - rad[None, :]), dtype=jnp.int32)
    axes = tuple(range(ndim))

    def tgt_at(s):
        return _shift_nd(tgt_ok.astype(jnp.float32), s, axes)

    tgt = jax.vmap(tgt_at)(shifts)          # (P, *vol)
    base = center_ok.astype(jnp.float32)[None] * tgt
    hi = base * (affs > th)
    lo = base * (affs < cfg.bg_th)
    tgt = center_ok.astype(jnp.float32)[None] * tgt
    return hi, lo, tgt


def _pos_weight(vq, vr, cfg: ConsensusConfig):
    th = cfg.patch_threshold
    if cfg.weight_mode == "norm_prob_product":
        return (vq * vr - th * th) / (1.0 - th * th)
    if cfg.weight_mode == "prob_product":
        return vq * vr
    return jnp.ones_like(vq * vr)


def _neg_weight(v_hi, v_lo, cfg: ConsensusConfig):
    th = cfg.patch_threshold
    if cfg.weight_mode == "norm_prob_product":
        return (v_hi * (1.0 - v_lo) - th * th) / (1.0 - th * th)
    if cfg.weight_mode == "prob_product":
        return v_hi * (1.0 - v_lo)
    return jnp.ones_like(v_hi * v_lo)


@functools.partial(jax.jit, static_argnames=("cfg", "with_counts"))
def consensus_array(affs: jnp.ndarray, cfg: ConsensusConfig,
                    overlap: jnp.ndarray | None = None,
                    with_counts: bool = False,
                    center_valid: jnp.ndarray | None = None):
    """Consensus vote array, count-normalized if cfg.norm_aff.

    Returns (*neigh, *vol) float32 (and the raw counts if ``with_counts``).
    """
    ps, rad, neigh = cfg.ps, cfg.rad, cfg.neigh
    ndim = len(ps)
    P = cfg.P
    vol_shape = affs.shape[1:]

    hi, lo, _ = _masks(affs, cfg, overlap, center_valid)
    lexpos = jnp.asarray(_lexpos_table(ps), dtype=jnp.float32)
    offs = jnp.asarray(patch_offsets(ps), dtype=jnp.int32)
    rad_j = jnp.asarray(rad, dtype=jnp.int32)
    psm1 = jnp.asarray(ps - 1, dtype=jnp.int32)

    # consensus is built SPATIALLY PADDED by rad: the per-step offset-block
    # placement (d = r-q+ps-1) and the center->base translation
    # (x = c + q - rad) combine into ONE dynamic slice/update offset, so the
    # scan body is a single read-modify-write with a fused elementwise
    # producer - no rolls, no masks.  Out-of-volume votes land in the pad
    # margin and are cropped at the end.
    pad_shape = tuple(int(s + 2 * r) for s, r in zip(vol_shape, rad))
    cons = jnp.zeros(tuple(neigh) + pad_shape, dtype=jnp.float32)
    cnt = jnp.zeros_like(cons)

    def body(carry, q):
        cons, cnt = carry
        v_q = affs[q]
        hi_q, lo_q = hi[q], lo[q]
        w_pos = _pos_weight(v_q[None], affs, cfg)
        w_nqr = _neg_weight(v_q[None], affs, cfg)
        w_nrq = _neg_weight(affs, v_q[None], cfg)
        mask = lexpos[q].reshape((P,) + (1,) * ndim)

        contrib = mask * (hi_q[None] * hi * w_pos
                          - hi_q[None] * lo * w_nqr
                          - lo_q[None] * hi * w_nrq)
        contrib_cnt = mask * (hi_q[None] * hi + hi_q[None] * lo
                              + lo_q[None] * hi)

        block_shape = tuple(int(p) for p in ps) + tuple(vol_shape)
        contrib = contrib.reshape(block_shape)
        contrib_cnt = contrib_cnt.reshape(block_shape)
        # d-block at ps-1-q; spatial at pad + (q - rad) = q
        start = tuple(psm1 - offs[q]) + tuple(offs[q])
        cur = jax.lax.dynamic_slice(cons, start, block_shape)
        cons = jax.lax.dynamic_update_slice(cons, cur + contrib, start)
        cur = jax.lax.dynamic_slice(cnt, start, block_shape)
        cnt = jax.lax.dynamic_update_slice(cnt, cur + contrib_cnt, start)
        return (cons, cnt), None

    (cons, cnt), _ = jax.lax.scan(body, (cons, cnt), jnp.arange(P))

    crop = tuple([slice(None)] * ndim
                 + [slice(int(r), int(r + s))
                    for r, s in zip(rad, vol_shape)])
    cons = cons[crop]
    cnt = cnt[crop]

    if cfg.norm_aff:
        cons = jnp.where(cnt != 0, cons / jnp.maximum(cnt, 1e-30), cons)
    if cfg.cons_bf16:
        cons = cons.astype(jnp.bfloat16)
    if with_counts:
        return cons, cnt
    return cons


@functools.partial(jax.jit, static_argnames=("cfg",))
def rank_scores(affs: jnp.ndarray, cons: jnp.ndarray, cfg: ConsensusConfig,
                overlap: jnp.ndarray | None = None,
                center_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-voxel patch agreement score (rankPatches.cu semantics).

    Border / background voxels get the sentinel (-1 if norm_rank else
    -9999999).
    """
    ps, rad, neigh = cfg.ps, cfg.rad, cfg.neigh
    ndim = len(ps)
    P = cfg.P
    vol_shape = affs.shape[1:]

    hi, lo, tgt = _masks(affs, cfg, overlap, center_valid)
    lexpos = jnp.asarray(_lexpos_table(ps), dtype=jnp.float32)
    offs = jnp.asarray(patch_offsets(ps), dtype=jnp.int32)
    rad_j = jnp.asarray(rad, dtype=jnp.int32)
    psm1 = jnp.asarray(ps - 1, dtype=jnp.int32)
    spatial_axes = tuple(range(ndim))

    # spatially pad cons by rad so the per-step d-block selection and the
    # center->base translation combine into one dynamic-slice offset
    # (mirrors the consensus scatter; pad reads are zero)
    pad = [(0, 0)] * ndim + [(int(r), int(r)) for r in rad]
    cons_pad = jnp.pad(cons, pad)

    def body(acc, q):
        hi_q, lo_q = hi[q], lo[q]
        mask = lexpos[q].reshape((P,) + (1,) * ndim)
        block_shape = tuple(int(p) for p in ps) + tuple(vol_shape)
        # block[r][c] = cons[r - q + ps-1][c + q - rad]
        start = tuple(psm1 - offs[q]) + tuple(offs[q])
        block = jax.lax.dynamic_slice(cons_pad, start, block_shape)
        block = block.reshape((P,) + tuple(vol_shape))

        w_hh = mask * hi_q[None] * hi
        w_hl = mask * (hi_q[None] * lo + lo_q[None] * hi)
        if cfg.rank_int_counter:
            pos_v = jnp.where(block != 0, jnp.sign(block), -1.0)
            neg_v = jnp.where(block != 0, jnp.sign(block), 1.0)
            step = jnp.sum(w_hh * pos_v - w_hl * neg_v, axis=0)
        else:
            step = jnp.sum((w_hh - w_hl) * block, axis=0)
        return acc + step, None

    acc, _ = jax.lax.scan(body, jnp.zeros(vol_shape, jnp.float32),
                          jnp.arange(P))
    return rank_epilogue(acc, affs, hi, tgt, cfg, center_valid)


def rank_epilogue(acc, affs, hi, tgt, cfg: ConsensusConfig,
                  center_valid=None) -> jnp.ndarray:
    """fgCnt normalization + center gating + sentinel — shared by the XLA
    rank and the Pallas rank so the two engines can never diverge here.

    fgCnt (rankPatches.cu:139): ordered pairs (q hi, r target-eligible,
    q != r) minus hi-hi pairs with r <= q."""
    vol_shape = affs.shape[1:]
    rad = cfg.rad
    n_tgt = jnp.sum(tgt, axis=0)
    n_hi = jnp.sum(hi, axis=0)
    fg_cnt = n_hi * (n_tgt - 1.0) - n_hi * (n_hi - 1.0) / 2.0

    # the CUDA center gate is only fg & interior (not the overlap mask)
    fg = affs[cfg.mid] > cfg.patch_threshold
    interior = jnp.ones(vol_shape, dtype=bool)
    for ax in range(len(vol_shape)):
        if rad[ax] == 0:
            continue
        idx = jax.lax.broadcasted_iota(jnp.int32, vol_shape, ax)
        interior &= (idx >= int(rad[ax])) & \
            (idx < vol_shape[ax] - int(rad[ax]))
    center_ok = fg & interior
    if center_valid is not None:
        center_ok = center_ok & center_valid

    sentinel = -1.0 if cfg.norm_rank else -9999999.0
    score = acc / jnp.maximum(1.0, fg_cnt) if cfg.norm_rank else acc
    return jnp.where(center_ok, score, sentinel).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def symmetrize_consensus(cons: jnp.ndarray, cfg: ConsensusConfig) -> jnp.ndarray:
    """Fill the lex-negative offset half: S[-d][x+d] = S[d][x].

    After this, the canonical consensus value for a voxel pair (x1, x2) can
    be read as S[x2-x1 + ps-1][x1] regardless of orientation (the CUDA patch
    graph kernel re-orients pairs because it only stores the lex-positive
    half; computePatchGraph.cu:89-124).
    """
    ps = cfg.ps
    ndim = len(ps)
    neigh = cfg.neigh
    vol_shape = cons.shape[ndim:]
    n_off = int(np.prod(neigh))

    flat = cons.reshape((n_off,) + tuple(vol_shape))
    deltas = patch_offsets(neigh) - (ps - 1)      # all offsets d
    lex = np.array([tuple(d) > tuple([0] * ndim) for d in deltas])

    # index of -d for each d
    rev = np.ravel_multi_index(
        tuple((-(deltas.T)) + (ps - 1)[:, None]), tuple(neigh))

    neg_ids = np.where(~lex & lex[rev])[0]        # lexneg with a lexpos twin
    if len(neg_ids) == 0:
        return cons

    def fill(args):
        # for lexneg d: out[x] = cons[-d][x + d]
        src, d = args
        return _shift_nd(src, -d, tuple(range(ndim)))

    srcs = flat[jnp.asarray(rev[neg_ids])]
    ds = jnp.asarray(deltas[neg_ids], jnp.int32)
    filled = jax.lax.map(fill, (srcs, ds), batch_size=64)
    flat = flat.at[jnp.asarray(neg_ids)].set(filled)
    return flat.reshape(cons.shape)


@functools.partial(jax.jit, static_argnames=("cfg",))
def symmetrize_half(cons_half: jnp.ndarray,
                    cfg: ConsensusConfig) -> jnp.ndarray:
    """Canonical-half consensus (psz, ndy, ndx, *vol) — what
    consensus_array_pallas emits — to the full symmetrized array
    (ndz, ndy, ndx, *vol).

    Embeds the half into the full neighborhood extent (lex-negative
    planes zero, exactly the layout consensus_array produces) and applies
    the shift identity S[-d][x+d] = S[d][x]."""
    return symmetrize_consensus(embed_half(cons_half, cfg), cfg)


def embed_half(cons_half: jnp.ndarray, cfg: ConsensusConfig) -> jnp.ndarray:
    """Canonical-half consensus -> full-extent canonical array (lex-negative
    planes zero) — the exact layout ``consensus_array`` produces, so any
    canonical consumer (e.g. the XLA-scan rank) can take it directly."""
    psz = int(cfg.ps[0])
    ndim = len(cfg.ps)
    assert cons_half.shape[0] == psz and cons_half.ndim == ndim * 2
    zeros = jnp.zeros((psz - 1,) + cons_half.shape[1:], cons_half.dtype)
    return jnp.concatenate([zeros, cons_half], axis=0)


def _graph_gather_tables(cfg: ConsensusConfig):
    """Static index tables for the per-pair consensus contraction."""
    ps = cfg.ps
    ndim = len(ps)
    P = cfg.P
    offs = patch_offsets(ps)                       # (P, ndim)
    dp = offs[None, :, :] - offs[:, None, :]       # (P1, P2, ndim) = p2 - p1
    return offs, dp


@functools.lru_cache(maxsize=8)
def _pair_count_panel(ps_t: tuple, strides_t: tuple):
    """Pre-skewed in-reach pair-count table (bf16 0/1), shape (P, U...),
    U = 3*ps - 2 per axis (the UNPADDED skewed extent, matching
    ``_skew_panel``).

    The per-pixel-pair in-reach test of computePatchGraph.cu (bounds
    ordered by flat pixel index) depends on (p1, p2, dc) only through
    dt = dc + off(p2) - off(p1):

        FT[dt] = all(lo(fwd) <= dt <= hi(fwd)),  fwd = dt . strides >= 0

    (|dt| <= 3(ps-1) always, since |dc| <= 2(ps-1) and |dp| <= ps-1).
    FT is laid out per first-patch pixel exactly like the skewed
    consensus panel (padded layout), so the dynamic-slice start
    (dc + 2(ps-1)) yields the full (P, P) count matrix:

        in_cnt[p1, p2] = FP[p1, dc + 2(ps-1) + off(p2)]

    Unlike the VALUE panel, this table cannot shrink to the unpadded
    skewed extent: pairs at |dt_k| = ps are in-reach (count) but have no
    consensus entry (value), so the count field has genuine support over
    the whole E = 5*ps - 4 extent where the value field is zero.
    """
    ps = np.asarray(ps_t, np.int64)
    ndim = len(ps)
    m = 3 * (ps - 1)
    axes = [np.arange(-mm, mm + 1) for mm in m]
    dt = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    strides = np.asarray(strides_t, np.int64)
    fwd = (dt @ strides) >= 0
    lo = np.where(fwd[..., None], -(ps - 1), -ps)
    hi = np.where(fwd[..., None], ps, ps - 1)
    FT = np.all((dt >= lo) & (dt <= hi), axis=-1)
    offs = patch_offsets(tuple(int(p) for p in ps))     # (P, ndim)
    P = len(offs)
    E = 5 * ps - 4
    IDX = []
    for ax in range(ndim):
        y = np.arange(int(E[ax]))
        g = y[None, :] + (int(ps[ax]) - 1) - offs[:, ax][:, None]
        shape = [P] + [1] * ndim
        shape[1 + ax] = int(E[ax])
        IDX.append(g.reshape(shape))
    FP = FT[tuple(IDX)]
    import jax as _jax
    return _jax.device_put(jnp.asarray(FP, jnp.bfloat16))


@functools.lru_cache(maxsize=8)
def _joint_shear_tables(ps_t: tuple):
    """Per-axis JOINT shear-sum tables J_k[d, q, u] = [u == d + q].

    Contracting the (neigh…, ps…) window against these reduces the
    displacement AND position axis of one dimension in a single MXU
    pass with contraction extent (2ps-1)*ps (e.g. 91 at ps 7) instead
    of the plain shear's ps (7): the skewed (P, U^d) panel is never
    materialized when only its hi-contraction (the correlation field)
    is needed.  Equal to  field = hi @ _dot_shear_panel(pb)  because
    panel[q, u] = pb[u - q][q] per axis."""
    ps = np.asarray(ps_t, np.int64)
    out = []
    for k in range(len(ps)):
        pm = int(ps[k])
        dm = 2 * pm - 1
        um = 3 * pm - 2
        t = np.zeros((dm, pm, um), np.float32)
        d_i, q_i = np.meshgrid(np.arange(dm), np.arange(pm), indexing="ij")
        t[d_i, q_i, d_i + q_i] = 1.0
        out.append(t)
    return tuple(out)


def _joint_field(pbh: jnp.ndarray, ps: np.ndarray) -> jnp.ndarray:
    """hi-weighted window (neigh…, ps…) -> correlation field (U…).

    ``pbh`` must already carry the hi vector (pbh = pb * hi.reshape(ps));
    the result equals ``hi @ _dot_shear_panel(pb, ps)`` reshaped to the
    unpadded skewed extent U = 3*ps - 2, at ~4x fewer (and larger) MXU
    passes: each einsum contracts a (2ps-1)*ps joint axis and drops it,
    so intermediates shrink instead of growing toward (P, U^d)."""
    hp = _graph_mxu_precision()
    J = _joint_shear_tables(tuple(int(p) for p in ps))
    if len(ps) == 3:
        t = jnp.einsum("abcdef,adZ->bcefZ", pbh, J[0], precision=hp)
        t = jnp.einsum("bcefZ,beY->cfZY", t, J[1], precision=hp)
        return jnp.einsum("cfZY,cfX->ZYX", t, J[2], precision=hp)
    if len(ps) == 2:
        t = jnp.einsum("abcd,acY->bdY", pbh, J[0], precision=hp)
        return jnp.einsum("bdY,bdX->YX", t, J[1], precision=hp)
    raise NotImplementedError(len(ps))


@functools.lru_cache(maxsize=8)
def _shear_tables(ps_t: tuple):
    """Per-axis one-hot shear tables T_k[p, d, e] = [e == d + p].

    Contracting the (neigh…, ps…) window against these on the MXU
    performs the same shear as ``_skew_panel`` (measured ~1.7x faster
    than the pad+reshape VPU shuffles at 7^3: scripts/skew_micro.py)."""
    ps = np.asarray(ps_t, np.int64)
    out = []
    for k in range(len(ps)):
        pm = int(ps[k])
        dm = 2 * pm - 1
        em = 3 * pm - 2
        t = np.zeros((pm, dm, em), np.float32)
        p_i, d_i = np.meshgrid(np.arange(pm), np.arange(dm), indexing="ij")
        t[p_i, d_i, p_i + d_i] = 1.0
        # numpy constants: this is called under jit, where device_put
        # would cache a tracer (UnexpectedTracerError on the next trace)
        out.append(t)
    return tuple(out)


def _graph_mxu_precision():
    """MXU precision for the graph-stage contractions.

    One operand of every contraction is exactly bf16-representable
    (one-hot shear tables; 0/1 hi vectors), so 3-pass bf16 (HIGH)
    splits only the value operand and is exact to ~2^-23 relative —
    indistinguishable from HIGHEST at half the MXU passes.  Env
    PPP_GRAPH_PRECISION={default,high,highest} for A/B timing."""
    name = os.environ.get("PPP_GRAPH_PRECISION", "high").upper()
    return getattr(jax.lax.Precision, name, jax.lax.Precision.HIGH)


def _graph_chunk(cfg: ConsensusConfig | None = None) -> int:
    """Segments per chunked-map step in the graph stage (0/1 = the
    sequential per-segment loop).

    Measured on the bench workload (scripts/graph_chunk_ab.py, 68 k
    pairs at 50^3/7^3): chunk 128 = 1.06 s, chunk 1 = 1.52 s, but the
    INTERMEDIATE sizes lose (chunk 8 = 2.57 s, 32 = 1.66 s — batching
    overhead without amortization), and 256 OOMs a 16 GB chip alongside
    the resident consensus.  So the auto choice is binary: 128 when the
    chunk's panel+window transients fit a 2 GB budget, else the
    sequential loop.  PPP_GRAPH_CHUNK overrides."""
    env = os.environ.get("PPP_GRAPH_CHUNK")
    if env is not None:
        return int(env)
    if cfg is None:
        return 1
    ps = cfg.ps
    P = cfg.P
    n_off = int(np.prod(cfg.neigh))
    u = int(np.prod([3 * int(p) - 2 for p in ps]))
    per_seg = (P * u + n_off * P) * 4          # f32 panel + window
    return 128 if 128 * per_seg <= 2 << 30 else 1


def _dot_shear_panel(pb: jnp.ndarray, ps: np.ndarray) -> jnp.ndarray:
    """(neigh…, ps…) window -> skewed (P, prod(U)) panel via one-hot MXU
    contractions; numerically equal to ``_skew_panel`` (each output
    element is a single 1.0 * value product)."""
    hp = _graph_mxu_precision()
    Tz, Ty, Tx = _shear_tables(tuple(int(p) for p in ps))
    t = jnp.einsum("abcdef,daZ->bcdefZ", pb, Tz, precision=hp)
    t = jnp.einsum("bcdefZ,ebY->cdefZY", t, Ty, precision=hp)
    t = jnp.einsum("cdefZY,fcX->defZYX", t, Tx, precision=hp)
    P = int(np.prod(ps))
    return t.reshape(P, -1)


def _skew_panel(pb: jnp.ndarray, ps: np.ndarray,
                neigh: np.ndarray) -> jnp.ndarray:
    """(neigh..., ps...) patch consensus window -> skewed (P, U...) panel.

    Input: pb[d, p] = S[d][c + offset(p) - rad] (the per-patch window).
    Output panel[p, u] = S[u - offset(p)][c + offset(p) - rad] with u
    per-axis in [0, U), U = neigh + ps - 1 = 3*ps - 2 (the UNPADDED
    skewed extent); out-of-range offsets read zero.  After contracting
    the patch axis into a field and zero-padding the FIELD by (ps-1) per
    side — which commutes exactly with the contraction, since the old
    padded-panel entries were zero — the consensus value sum for a pixel
    pair (p1 in patch at c1, p2 in patch at c2) is read at

        field_padded[dc + 2*(ps-1) + offset(p2)]   (dc = c2 - c1)

    i.e. the p1-dependence is GONE from the index.  Padding the ~80x
    smaller field instead of the panel cuts the skew materialization and
    the matmul operand ~4x at 7^3 (31^3 -> 19^3 extents).  The skew
    itself is the classic pad+reshape shear (stride tricks), no gathers.
    """
    ndim = len(ps)
    out = pb
    # axis layout: (d_0..d_{n-1}, p_0..p_{n-1}); skew axis ax pairs
    # rows p_ax with cols d_ax:  B[p, y] = A[p, y - p]
    for ax in range(ndim):
        n_rows = int(ps[ax])
        n_cols = out.shape[ax]
        if n_rows == 1:
            continue
        # bring (p_ax, d_ax) to the last two dims
        perm = [a for a in range(out.ndim) if a not in (ax, ndim + ax)]
        perm += [ndim + ax, ax]
        t = jnp.transpose(out, perm)             # (..., p_ax, d_ax)
        lead = t.shape[:-2]
        width = n_cols + n_rows                  # pad >= n_rows for zeros
        ext = n_cols + n_rows - 1                # skewed extent
        t = jnp.pad(t, [(0, 0)] * len(lead) + [(0, 0), (0, n_rows)])
        t = t.reshape(lead + (n_rows * width,))[..., :n_rows * ext]
        t = t.reshape(lead + (n_rows, ext))
        # restore axis order (d_ax now has extent ext)
        inv = np.argsort(perm)
        out = jnp.transpose(t, inv)
    # flatten patch axes in front; the (ps-1)-per-side zero pad that makes
    # dynamic-slice starts dc + 2*(ps-1) in-range happens on the contracted
    # FIELD in the caller, not on the panel
    d_ext = out.shape[:ndim]
    out = out.reshape(tuple(d_ext) + (-1,))
    return jnp.moveaxis(out, -1, 0)              # (P, d_ext...)


def _field_band(x: jnp.ndarray, ps, U_sp, E_sp) -> jnp.ndarray:
    """Flat (prod(U),) field -> zero-padded 2-D BAND layout (E0, prod(E[1:])).

    Equivalent to ``pad(x.reshape(U), (ps-1, ps-1))`` followed by a
    flatten of the trailing axes, but built with 2-D pads so the result
    (and the per-pair dynamic slices taken from it) live in an (8, 128)
    lane tiling with ~1.1x physical padding — a 3-D (31, 31, 31) layout
    tiles its last TWO dims and inflates HBM ~4x (31 -> 128 lanes).
    Column index of spatial (y, x) is y * E2 + x (suffix-product
    strides), so a (ps0, W) band slice at (z0, y0*E2 + x0) covers the
    whole (ps0, ps1, ps2) window; the off-window columns in the band are
    masked by the matching ``_h2_band`` embedding of the reducing
    vector.
    """
    ndim = len(U_sp)
    lo = [int(p - 1) for p in ps]
    hi = [int(e - u - l) for e, u, l in zip(E_sp, U_sp, lo)]
    x = x.reshape(tuple(int(u) for u in U_sp))
    x = jnp.pad(x, [(0, 0)] * (ndim - 1) + [(lo[-1], hi[-1])])
    col = int(E_sp[-1])
    for ax in range(ndim - 2, 0, -1):
        x = x.reshape(x.shape[:ax] + (x.shape[ax] * col,))
        x = jnp.pad(x, [(0, 0)] * ax + [(lo[ax] * col, hi[ax] * col)])
        col = int(E_sp[ax]) * col
    return jnp.pad(x, [(lo[0], hi[0])] + [(0, 0)] * (x.ndim - 1))


def _h2_band(h2: jnp.ndarray, ps, ext) -> jnp.ndarray:
    """Embed per-patch-pixel vectors (…, P) into the band layout
    (…, ps0, W) matching a (ps0, W) slice of a ``_field_band``-laid-out
    field with per-axis column strides ``suffix-products of ext``.

    W = 1 + sum_j (ps_j - 1) * prod(ext[j+1:]); entries off the patch
    window are zero, so an elementwise multiply-reduce of the embedded
    vector against a band slice equals the (ps…) window dot product.
    """
    ndim = len(ps)
    lead = h2.shape[:-1]
    nl = len(lead)
    x = h2.reshape(lead + tuple(int(p) for p in ps))
    u = 1
    for ax in range(ndim - 1, 1, -1):
        target = int(ext[ax]) * u
        tail = x.shape[nl + ax]
        x = jnp.pad(x, [(0, 0)] * (nl + ax) + [(0, target - tail)])
        x = x.reshape(x.shape[:nl + ax - 1]
                      + (x.shape[nl + ax - 1] * target,))
        u = target
    W = 1 + sum(int(ps[j] - 1) * int(np.prod(ext[j + 1:]))
                for j in range(1, ndim))
    return x[..., :W]


@functools.partial(jax.jit, static_argnames=("cfg", "drop_intersection",
                                              "n_unique", "group",
                                              "chunk"))
def _patch_graph_weights_jit(
    affs: jnp.ndarray,
    cons_sym: jnp.ndarray,
    centers: jnp.ndarray,        # (n_unique, ndim) int32 unique patch centers
    seg_first: jnp.ndarray,      # (n_seg,) int32 first-patch id per segment
    seg_partner: jnp.ndarray,    # (n_seg, G) int32 partner ids
    seg_valid: jnp.ndarray,      # (n_seg, G) bool
    cnt_panel: jnp.ndarray,      # (P, E...) bf16 pre-skewed in-reach table
    cfg: ConsensusConfig,
    n_unique: int,
    group: int,
    seed: int = 0,
    drop_intersection: bool = True,
    chunk: int | None = None,
) -> jnp.ndarray:
    ps, rad = cfg.ps, cfg.rad
    ndim = len(ps)
    P = cfg.P
    th = cfg.patch_threshold
    vol_shape = np.array(affs.shape[1:])

    offs, _dp = _graph_gather_tables(cfg)
    offs_j = jnp.asarray(offs, jnp.int32)
    rad_j = jnp.asarray(rad, jnp.int32)

    fg = (affs[cfg.mid] > th).astype(jnp.float32)
    fg_pad = jnp.pad(fg, [(int(r), int(r)) for r in rad])
    neigh = cfg.neigh
    n_off = int(np.prod(neigh))
    blk_sp = tuple(int(p) for p in ps)

    # keep the padded consensus FLAT (n_off, *vol): a 6-D layout makes XLA
    # tile the small neigh axes into (8,128) lanes (~10x HBM padding
    # blowup).  Input dtype (possibly bf16) is kept - a full f32 upcast
    # here doubles the largest live array; slices upcast per segment.
    cons_sp_pad = jnp.pad(
        cons_sym.reshape((n_off,) + tuple(int(v) for v in vol_shape)),
        [(0, 0)] + [(int(r), int(r)) for r in rad])

    # hi mask once per unique patch (pairs share endpoints ~40x)
    def per_patch_hi(c):
        c = c.astype(jnp.int32)
        v = affs[(slice(None),) + tuple(c[k] for k in range(ndim))]
        win = jax.lax.dynamic_slice(fg_pad, tuple(c[k] for k in range(ndim)),
                                    blk_sp)
        return (v > th) * win.reshape(-1)

    HIs = jax.lax.map(per_patch_hi, centers.astype(jnp.int32),
                      batch_size=32)

    # field formulation: the pair weight factorizes through a per-segment
    # correlation field,
    #
    #   field[y]  = sum_p1 hi1[p1] * panel[p1, y]       (one matvec)
    #   acc(pair) = sum_p2 hi2[p2] * field[dc + 2(ps-1) + off(p2)]
    #             = dot(hi2, slice(field, dc))
    #
    # so each pair costs a 7^d slice + dot instead of a (P, P) value
    # matrix — no per-pair gathers, no (P, P) random draws.  The in-reach
    # denominator uses the same contraction against the static pre-skewed
    # count table.  Intersection downweighting (reference: keep 20% of
    # intersection pixels via a sequential LCG, computePatchGraph.cu:74-86)
    # is applied IN EXPECTATION: the correction term
    #   sum_{x1 in A, x2 in B} hi1 hi2 W  (A/B = the per-endpoint
    # intersection boxes) is computed exactly via a masked-hi1 matvec and
    # subtracted at weight 0.8 — same mean as the Bernoulli(0.2) keep,
    # zero variance (deterministic, order-free).
    U_sp = tuple(int(3 * p - 2) for p in ps)     # unpadded skewed extent
    E_sp = tuple(int(5 * p - 4) for p in ps)     # padded (slice-able) extent
    cnt_flat = cnt_panel.reshape(P, -1).astype(jnp.float32)
    hp = _graph_mxu_precision()
    # count fields for ALL unique patches in one (n_unique, P) @ (P, E^d)
    # matmul: inside the segment loop this was a 1-row matvec per segment
    # (>= 8x MXU row waste + one pass per segment); hoisted it is a single
    # well-shaped matmul.  64 MB at 50^3/7^3 - far below the consensus.
    # The hoist materializes (n_unique, prod(E^d)) f32 (~116 KB/patch at
    # ps=7), so it is gated on a 2 GiB budget: dense volumes with very
    # many unique patches fall back to the O(1)-memory per-segment matvec.
    hoist_cnt = n_unique * int(np.prod(E_sp)) * 4 <= 2 << 30
    if hoist_cnt:
        CNT = jnp.matmul(HIs.astype(jnp.float32), cnt_flat,
                         precision=hp).reshape(
            (n_unique, int(E_sp[0]), -1))
    # band-layout geometry (see _field_band): column strides are suffix
    # products of the extents; h2 windows embed into (ps0, W) bands
    uE = [int(np.prod(E_sp[j + 1:])) for j in range(ndim)]
    uU = [int(np.prod(U_sp[j + 1:])) for j in range(ndim)]
    W_E = 1 + sum(int(ps[j] - 1) * uE[j] for j in range(1, ndim))
    W_U = 1 + sum(int(ps[j] - 1) * uU[j] for j in range(1, ndim))
    ps0 = int(ps[0])

    def seg_window(i):
        # (n_off, ps...) consensus window of segment i's first patch;
        # a plain dynamic slice (sequential window reads measured 36 ms
        # TOTAL at 535 segments — scripts/window_micro.py; turning them
        # into one big gather was the variant that measured 2.5x slower)
        c1 = centers[i].astype(jnp.int32)
        return jax.lax.dynamic_slice(
            cons_sp_pad, (0,) + tuple(c1[k] for k in range(ndim)),
            (n_off,) + blk_sp).astype(jnp.float32)

    def one_segment(seg):
        i, partners, valid = seg
        pb = seg_window(i).reshape(tuple(int(v) for v in neigh) + blk_sp)
        return _one_segment_body(i, partners, valid, pb)

    def _one_segment_body(i, partners, valid, pb):
        c1 = centers[i].astype(jnp.int32)
        hi1 = HIs[i]

        # value side: the hi-contraction of the skewed panel is computed
        # directly by the joint shear-sum tables — the (P, U^d) panel is
        # only materialized when the intersection correction needs it.
        # The field contracts on the unpadded extent, then pads the tiny
        # FIELD so slice starts dc + 2(ps-1) are in range — identical
        # values (the old padded-panel entries were zero) at ~4x less skew
        # materialization and matmul traffic.  The count table keeps the
        # padded extent (genuine support there, see _pair_count_panel).
        # Fields live in the 2-D band layout (~4x less physical HBM than
        # a tiled (E0, E1, E2) array; see _field_band).
        pbh = pb * hi1.reshape(tuple(int(p) for p in ps)).astype(pb.dtype)
        field = _field_band(_joint_field(pbh, ps).reshape(-1),
                            ps, U_sp, E_sp)
        if hoist_cnt:
            cnt_field = CNT[i]
        else:
            cnt_field = jnp.matmul(hi1[None].astype(jnp.float32),
                                   cnt_flat, precision=hp).reshape(
                (int(E_sp[0]), -1))

        dcs = centers[partners].astype(jnp.int32) - c1[None]   # (G, ndim)
        hi2 = HIs[partners]                                    # (G, P)
        h2E = _h2_band(hi2, ps, E_sp)                          # (G, ps0, W_E)
        if drop_intersection:
            # the correction contracts G box-masked hi1 variants against
            # the window — only here does the skewed (P, U^d) panel pay
            # for itself (the matmul below has full MXU rows)
            if ndim == 3:
                panel = _dot_shear_panel(pb, ps)               # (P, U^d)
            else:
                panel = _skew_panel(pb, ps, neigh).reshape(P, -1)
            # per-endpoint intersection boxes:
            # x1 within rad of c2  <=>  |off(p1) - rad - dc| <= rad
            box_a = jnp.all(jnp.abs(offs_j[None] - rad_j - dcs[:, None])
                            <= rad_j, axis=-1)                 # (G, P)
            box_b = jnp.all(jnp.abs(offs_j[None] - rad_j + dcs[:, None])
                            <= rad_j, axis=-1)
            mh1 = hi1[None, :] * box_a
            # value-side correction field on the UNPADDED extent: a
            # nonzero correction needs |dc| <= rad (else both boxes are
            # empty and h2bU == 0 masks whatever the clamped slice
            # reads), and there the start dc + ps - 1 is in range.
            corr = jnp.matmul(mh1, panel, precision=hp).reshape(
                (-1, int(U_sp[0]), int(np.prod(U_sp[1:]))))
            h2bU = _h2_band(hi2 * box_b, ps, U_sp)             # (G, ps0, W_U)
            # count-side correction collapses to a PRODUCT OF SCALARS:
            # for p1 in box_a and p2 in box_b, x1 and x2 both lie in the
            # patch intersection box, so |dt| = |x2 - x1| <= ps - 1 per
            # axis and the in-reach table (_pair_count_panel) is
            # identically 1 there; dot(h2b, corr_cnt_slice) therefore
            # equals dot(hi1, box_a) * dot(h2, box_b) exactly — the
            # (P, E^d) count matmul and its (G, E^d) materialization
            # drop out entirely.
            a_vec = jnp.matmul(box_a.astype(jnp.float32), hi1)  # (G,)
        else:
            corr = h2bU = a_vec = None

        def one_pair(ok, dc, h2e, cf, h2bu, a):
            z0 = dc[0] + 2 * (int(ps[0]) - 1)
            col0 = sum((dc[j] + 2 * (int(ps[j]) - 1)) * uE[j]
                       for j in range(1, ndim))
            sl = jax.lax.dynamic_slice(field, (z0, col0), (ps0, W_E))
            csl = jax.lax.dynamic_slice(cnt_field, (z0, col0), (ps0, W_E))
            acc = jnp.sum(h2e * sl)
            fg_cnt = jnp.sum(h2e * csl)
            if drop_intersection:
                zc = jnp.clip(dc[0] + int(ps[0]) - 1, 0,
                              int(U_sp[0]) - ps0)
                cc = sum(jnp.clip(dc[j] + int(ps[j]) - 1, 0,
                                  int(U_sp[j]) - int(ps[j])) * uU[j]
                         for j in range(1, ndim))
                cfs = jax.lax.dynamic_slice(cf, (zc, cc), (ps0, W_U))
                acc = acc - 0.8 * jnp.sum(h2bu * cfs)
                fg_cnt = fg_cnt - 0.8 * a * jnp.sum(h2bu)
            w = acc / jnp.maximum(1.0, fg_cnt) if cfg.norm_graph else acc
            return jnp.where(ok, w, 0.0)

        if drop_intersection:
            return jax.vmap(one_pair)(valid, dcs, h2E, corr, h2bU, a_vec)
        return jax.vmap(
            lambda ok, dc, h2e: one_pair(ok, dc, h2e, None, None,
                                         None))(valid, dcs, h2E)

    if chunk is None:
        chunk = _graph_chunk(cfg)
    n_seg = int(seg_first.shape[0])
    if chunk <= 1 or n_seg <= chunk:
        # sequential map: the per-segment einsums are ~1 ms MXU passes,
        # so n_seg sequential steps dominate the stage wall at scale —
        # the chunked path below batches them; this branch remains for
        # A/B (PPP_GRAPH_CHUNK=1) and tiny inputs
        return jax.lax.map(one_segment, (seg_first.astype(jnp.int32),
                                         seg_partner.astype(jnp.int32),
                                         seg_valid))

    # CHUNKED segment loop: B segments per step.  The window reads stay
    # sequential dynamic slices (an inner lax.map — cheap, and the one
    # formulation that does NOT gather), while every einsum in the
    # segment body runs vmapped over the chunk: B-batched shear/joint
    # contractions and one (B, G, P) @ (B, P, U^d) correction matmul
    # replace B ~1 ms single-segment MXU passes.  At bench scale
    # (~1.1 k segments from trained affinities) this turns ~1.1 k
    # sequential steps into ~n/B big ones.
    pad = -n_seg % chunk
    sf = jnp.pad(seg_first.astype(jnp.int32), (0, pad))
    sp_ = jnp.pad(seg_partner.astype(jnp.int32), ((0, pad), (0, 0)))
    sv = jnp.pad(seg_valid, ((0, pad), (0, 0)))
    n_chunks = (n_seg + pad) // chunk

    def one_chunk(seg_b):
        i_b, partners_b, valid_b = seg_b
        wins = jax.lax.map(seg_window, i_b)          # (B, n_off, ps...)
        pb_b = wins.reshape((chunk,) + tuple(int(v) for v in neigh)
                            + blk_sp)
        return jax.vmap(_one_segment_body)(i_b, partners_b, valid_b, pb_b)

    w = jax.lax.map(one_chunk,
                    (sf.reshape(n_chunks, chunk),
                     sp_.reshape(n_chunks, chunk, -1),
                     sv.reshape(n_chunks, chunk, -1)))
    return w.reshape(n_chunks * chunk, -1)[:n_seg]


def patch_graph_weights(
    affs: jnp.ndarray,
    cons_sym: jnp.ndarray,
    pairs: jnp.ndarray,
    cfg: ConsensusConfig,
    seed: int = 0,
    drop_intersection: bool = True,
    group: int = 64,
    mesh=None,
    chunk: int | None = None,
) -> jnp.ndarray:
    """Affinity weight per candidate patch pair (computePatchGraph.cu).

    ``cons_sym`` must be the symmetrized consensus.  TPU-regular
    formulation: pairs are grouped by their first patch; per group the
    patch's (neigh, ps^d) consensus window is sliced from HBM once and
    SKEWED (pad+reshape shear, see ``_skew_panel``) into a (P, E^d)
    panel, then contracted with the patch's hi-pixel vector into a
    CORRELATION FIELD (one matvec); each pair reduces to a 7^d
    dynamic-slice of the field + a dot with its own hi vector — no
    per-pair gathers, no (P, P) materialization.  The in-reach pair
    count (the weight denominator) uses the same contraction against a
    static pre-skewed count table (``_pair_count_panel``).

    Intersection pixels (within both patches' reach) are downweighted to
    0.2 IN EXPECTATION via an exactly-computed correction term over the
    separable intersection boxes (the CUDA kernel randomly keeps 20% via
    a sequential LCG, computePatchGraph.cu:74-86; order-dependence makes
    bit parity impossible in any parallel formulation — the expected
    contribution matches, with zero sampling variance).  ``seed`` is
    retained for API compatibility and no longer affects the result.
    """
    ndim = len(cfg.ps)
    ps = np.asarray(cfg.ps)
    pairs = np.asarray(pairs).astype(np.int64)  # unsigned dc would wrap
    n_pairs = len(pairs)
    if n_pairs == 0:
        return jnp.zeros((0,), jnp.float32)
    flat = np.concatenate([pairs[:, :ndim], pairs[:, ndim:]], axis=0)
    centers, inv = np.unique(flat, axis=0, return_inverse=True)
    id_pairs = np.stack([inv[:n_pairs], inv[n_pairs:]], axis=1)

    # pairs with any |dc| > 2*(ps-1) have no pixel pair within consensus
    # reach: weight is exactly 0 (and they'd overflow the panel pad)
    dc = centers[id_pairs[:, 1]] - centers[id_pairs[:, 0]]
    near = np.all(np.abs(dc) <= 2 * (ps - 1)[None, :], axis=1)
    near_idx = np.nonzero(near)[0]

    out = np.zeros(n_pairs, np.float32)
    if len(near_idx) == 0:
        return jnp.asarray(out)

    # orientation balancing: a pair may be computed from either endpoint —
    # acc/fg_cnt are exactly symmetric under (c1, c2) swap (S_sym symmetry
    # + the fwd lex bounds mirror; the expectation-form intersection
    # correction is symmetric too).  Assign each pair to its busier
    # endpoint so pairs concentrate into fewer panel segments (each
    # segment is one sequential lax.map step).
    cnt = np.bincount(id_pairs[near_idx].ravel(),
                      minlength=len(centers))
    a_e = id_pairs[near_idx, 0]
    b_e = id_pairs[near_idx, 1]
    swap = cnt[b_e] > cnt[a_e]
    p_first = np.where(swap, b_e, a_e)
    p_second = np.where(swap, a_e, b_e)

    # group near pairs by (balanced) first endpoint into fixed segments
    sort = np.argsort(p_first, kind="stable")
    order = near_idx[sort]
    p_first, p_second = p_first[sort], p_second[sort]
    firsts, seg_starts = np.unique(p_first, return_index=True)
    seg_first, seg_partner, seg_valid, seg_out = [], [], [], []
    bounds = list(seg_starts) + [len(order)]
    for fi, f in enumerate(firsts):
        lo, hi = bounds[fi], bounds[fi + 1]
        for s in range(lo, hi, group):
            stop = min(s + group, hi)  # never spill into the next first
            out_idx = order[s:stop]
            partners = p_second[s:stop]
            pad = group - len(out_idx)
            seg_first.append(f)
            seg_partner.append(np.pad(partners, (0, pad)))
            seg_valid.append(np.pad(np.ones(len(out_idx), bool), (0, pad)))
            seg_out.append(np.pad(out_idx, (0, pad)))
    # pad segment count to a multiple of 8 to bound recompiles (and, on a
    # mesh, to a multiple of 8 * n_devices so segments split evenly)
    n_dev = int(mesh.shape[mesh.axis_names[0]]) if mesh is not None else 1
    mult = 8 * max(1, n_dev)
    n_seg = len(seg_first)
    n_seg_pad = -(-n_seg // mult) * mult
    for _ in range(n_seg_pad - n_seg):
        seg_first.append(0)
        seg_partner.append(np.zeros(group, np.int64))
        seg_valid.append(np.zeros(group, bool))
        seg_out.append(np.zeros(group, np.int64))

    vol_shape = np.asarray(affs.shape[1:])
    strides = tuple(int(np.prod(vol_shape[i + 1:])) for i in range(ndim))
    cnt_panel = _pair_count_panel(tuple(int(p) for p in ps), strides)
    jit_args = (jnp.asarray(centers, jnp.int32),
                jnp.asarray(np.asarray(seg_first), jnp.int32),
                jnp.asarray(np.stack(seg_partner), jnp.int32),
                jnp.asarray(np.stack(seg_valid)), cnt_panel)
    jit_kw = dict(cfg=cfg, n_unique=len(centers), group=group,
                  seed=seed, drop_intersection=drop_intersection,
                  chunk=_graph_chunk(cfg) if chunk is None else chunk)
    if n_dev > 1:
        # segment-parallel over the mesh: segments are independent, so
        # they round-robin across devices; affs/consensus/centers ride in
        # replicated (an all-gather when the consensus arrives z-sharded
        # from sharded_consensus_and_rank).  Memory-scaling (z-partitioned
        # windows) is the blockwise path's job — this targets wall-clock.
        from jax.sharding import PartitionSpec as SP

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        ax = mesh.axis_names[0]

        def worker(affs_r, cons_r, centers_r, sf, sp, sv, cp):
            return _patch_graph_weights_jit(affs_r, cons_r, centers_r,
                                            sf, sp, sv, cp, **jit_kw)

        rep4 = SP(*([None] * 4))
        kwargs = dict(
            mesh=mesh,
            in_specs=(rep4, SP(*([None] * cons_sym.ndim)),
                      SP(None, None), SP(ax), SP(ax, None), SP(ax, None),
                      SP(*([None] * cnt_panel.ndim))),
            out_specs=SP(ax, None))
        try:
            fn = shard_map(worker, check_vma=False, **kwargs)
        except TypeError:  # older jax spelling
            fn = shard_map(worker, check_rep=False, **kwargs)
        # re-place operands onto the mesh (affs/cons usually live on a
        # single committed device from the earlier stages)
        from jax.sharding import NamedSharding

        ops = [jax.device_put(x, NamedSharding(mesh, s))
               for x, s in zip((affs, cons_sym) + jit_args,
                               kwargs["in_specs"])]
        w = fn(*ops)
    else:
        w = _patch_graph_weights_jit(affs, cons_sym, *jit_args, **jit_kw)
    w = np.asarray(w)
    mask = np.stack(seg_valid)
    out[np.stack(seg_out)[mask]] = w[mask]
    return jnp.asarray(out)
