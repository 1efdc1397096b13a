"""Pallas TPU kernel for the consensus vote array.

Computes the same array as ops/consensus_jax.consensus_array via the
*banded autocorrelation* identity on target-aligned stacks:

    cons[d][x] = sum_q w( G[q][x], G[q+d][x+d] )

where G[q][x] = affs[q][x - (q - rad)] re-aligns every patch channel to the
pixel it points at.

Layout/traffic design (v3):

- grid = (z, dz, qz) with qz innermost; the (dy, dx) in-plane displacement
  loops run INSIDE the kernel, so each (G-plane, z) pair streams HBM->VMEM
  once per (z, dz) cell instead of once per (z, dz, dy) (the v1/v2 grids
  re-fetched every plane ndy times: ~200 GB of HBM traffic at 50^3/7^3).
- the left operand is stored cropped to the valid (Y, X) region; the right
  operand carries a (rad + ps - 1) zero margin per axis so every (dy, dx)
  displacement is a plain window *read* at an offset - there are NO rolls
  and NO lane rotates (dynamic lane rotates > 128 and dynamic negative
  sublane rolls both miscompile in current Mosaic; this design never
  issues either).
- dx is unrolled statically (static lane slices); dy is a fori_loop whose
  dynamic offset only feeds a sublane-dim ``pl.ds`` window start.
- the output is written already cropped to (Z, ndz, ndy, ndx, Y, X) - no
  padded intermediate (v2's 128-lane padding inflated the output 2.5x and
  OOM'd the chip at 50^3/7^3).

The XLA scan formulation pays ~P read-modify-writes of the full consensus;
here every consensus element is written once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .consensus_jax import ConsensusConfig, _masks
from .np_reference import patch_offsets

# static-unroll budget for the in-plane dx loop (2 * psx - 1 iterations)
_MAX_NDX_UNROLL = 64


def pallas_supported(cfg: ConsensusConfig, vol_shape=None) -> bool:
    """True when the kernel supports this patchshape (3D stacks; the dx
    displacement loop is unrolled statically).

    Z == 1 volumes (2D data) are excluded: single-z grids miscompile to
    all-zero output for in-plane extents >= ~18 on current Mosaic (probed
    empirically; 3D volumes are unaffected) - the XLA scan path handles 2D.
    """
    ps = np.asarray(cfg.ps)
    if len(ps) != 3 or 2 * int(ps[2]) - 1 > _MAX_NDX_UNROLL:
        return False
    if vol_shape is not None and int(vol_shape[0]) <= 1:
        return False
    return True


def _target_aligned(stack: jnp.ndarray, ps: np.ndarray, margin):
    """(P, Z, Y, X) center-aligned -> (psz, psy, psx, Z+2mz, Y+2my, X+2mx)
    target-aligned with a zero margin per axis (margin >= rad so the
    alignment shifts stay inside)."""
    P, Z, Y, X = stack.shape
    rad = ps // 2
    offs = patch_offsets(ps)
    mz, my, mx = (int(m) for m in margin)
    padded = jnp.pad(stack, [(0, 0), (mz, mz), (my, my), (mx, mx)])
    out = []
    dims = (Z + 2 * mz, Y + 2 * my, X + 2 * mx)
    for q in range(P):
        s = offs[q] - rad
        # out[x] = padded[q][x - s] (static shift, zero fill via margin)
        big = jnp.pad(padded[q], [(int(m), int(m)) for m in margin])
        sl = tuple(slice(int(m) - int(si), int(m) - int(si) + dim)
                   for m, si, dim in zip(margin, s, dims))
        out.append(big[sl])
    G = jnp.stack(out, 0)
    return G.reshape(tuple(int(p) for p in ps) + dims)


def _kernel(a_l, b_l, hi_l, lo_l, a_r, b_r, hi_r, lo_r,
            cons_ref, *refs,
            ps, my, mx, th, weight_mode, n_dx, Y, X, fuse_norm,
            with_counts):
    # count accumulation is only needed for in-kernel normalization or an
    # explicit counts output; otherwise it would double the hot-loop VPU
    # work for a result nobody reads
    need_cnt = fuse_norm or with_counts
    # counts accumulate in VMEM scratch; with fuse_norm the normalization
    # happens in-kernel on the last qz step and the count array never
    # reaches HBM (it is half the consensus memory/traffic)
    if with_counts:
        cnt_ref, cons_s, cnt_s = refs
    else:
        cons_s, cnt_s = refs
    psz, psy, psx = ps
    # canonical half: the dz grid axis spans only dz >= 0 (lex-positive
    # displacements); pid(1) IS the displacement.  The lex-negative half
    # is recovered by the cheap shift identity S[-d][x+d] = S[d][x]
    # (consensus_jax.symmetrize_half) exactly like the XLA scan path —
    # halving the pair-loop VPU work vs the brute-force both-orientation
    # kernel (ordered pair count P^2 -> P^2/2).
    dzo = pl.program_id(1)
    qz = pl.program_id(2)
    qz2 = qz + dzo
    dz0 = dzo == 0

    @pl.when(qz == 0)
    def _init():
        cons_s[...] = jnp.zeros_like(cons_s)
        cnt_s[...] = jnp.zeros_like(cnt_s)

    valid_z = qz2 < psz

    @pl.when(valid_z)
    def _compute():
        def dy_body(dyi, _):
            dy = dyi - (psy - 1)
            y0 = my + dy                   # dynamic, always >= my-psy+1 >= 0
            # band limit: only qy with qy and qy+dy inside the patch
            # contribute (the masked full loop wasted ~71% of iterations)
            qy_lo = jnp.maximum(0, -dy)
            qy_hi = jnp.minimum(psy, psy - dy)

            for k in range(n_dx):          # static unroll
                dx = k - (psx - 1)
                x0 = mx + dx               # static
                qx_lo = max(0, -dx)        # static band per dx
                qx_hi = min(psx, psx - dx)

                def qy_body(qy, accs):
                    acc_c, acc_n = accs
                    q2y = qy + dy
                    for qx in range(qx_lo, qx_hi):   # static unroll
                        q2x = qx + dx
                        al = a_l[0, qy, qx, 0]
                        bl = b_l[0, qy, qx, 0]
                        hl = hi_l[0, qy, qx, 0]
                        ll = lo_l[0, qy, qx, 0]
                        rsl = (0, q2y, q2x, 0, pl.ds(y0, Y),
                               slice(x0, x0 + X))
                        ar = a_r[rsl]
                        br = b_r[rsl]
                        hr = hi_r[rsl]
                        lr = lo_r[rsl]
                        pp = al * (ar - br) - bl * ar
                        sc = hl * (hr - lr) - ll * hr
                        if weight_mode == "norm_prob_product":
                            contrib = (pp - th * th * sc) / (1.0 - th * th)
                        elif weight_mode == "prob_product":
                            contrib = pp
                        else:
                            contrib = sc
                        acc_c = acc_c + contrib
                        if need_cnt:
                            acc_n = acc_n + hl * (hr + lr) + ll * hr
                    return acc_c, acc_n

                acc0 = jnp.zeros((Y, X), jnp.float32)
                acc_c, acc_n = jax.lax.fori_loop(qy_lo, qy_hi, qy_body,
                                                 (acc0, acc0))
                if dx == 0:
                    # d == 0 (dz0 & dy == 0 here) means q2 == q for every
                    # pair: all self-pairs, excluded (whole cell masks out)
                    spm = jnp.logical_not(
                        dz0 & (dy == 0)).astype(jnp.float32)
                    acc_c = acc_c * spm
                    if need_cnt:
                        acc_n = acc_n * spm
                elif dx < 0:
                    # canonical gate: at dz == 0, dy == 0, only dx > 0 is
                    # lex-positive (the dy > 0 part is handled by the loop
                    # lower bound below)
                    spm = jnp.logical_not(
                        dz0 & (dy == 0)).astype(jnp.float32)
                    acc_c = acc_c * spm
                    if need_cnt:
                        acc_n = acc_n * spm
                cons_s[dyi, k] += acc_c
                if need_cnt:
                    cnt_s[dyi, k] += acc_n
            return ()

        # canonical gate: at dz == 0 only dy >= 0 displacements
        dy_lo = jnp.where(dz0, psy - 1, 0)
        jax.lax.fori_loop(dy_lo, 2 * psy - 1, dy_body, ())

    @pl.when(qz == psz - 1)
    def _finish():
        # accumulation stays f32 in VMEM scratch; only the final
        # (possibly bf16) result is written to HBM
        cons = cons_s[...]
        if fuse_norm:
            cnt = cnt_s[...]
            cons = jnp.where(cnt != 0, cons / jnp.maximum(cnt, 1e-30),
                             cons)
        cons_ref[0, :, :, 0] = cons.astype(cons_ref.dtype)
        if with_counts:
            cnt_ref[0, :, :, 0] = cnt_s[...]


def _kernel_v5(a_l, b_l, hi_l, lo_l, a_r, b_r, hi_r, lo_r,
               cons_ref, *refs,
               ps, my, mx, th, weight_mode, n_dx, Y, X, fuse_norm,
               with_counts):
    """v5 consensus body: the (dy, dx) displacement loops are STATIC and
    the whole (qy, qx) band of a displacement is read as one channel
    RECTANGLE and multiply-reduced in a single vector expression.

    v4 issued one (Y, X) op per (dy, dx, qy, qx) with dynamic sublane
    window starts — ~2400 small ops per grid cell whose addressing and
    loop overhead dominated (the kernel ran at <1% of VPU peak on 44
    GFLOPs of real work).  Static slicing + band-rect reduces cut the
    instruction count ~14x at identical FLOPs.
    """
    need_cnt = fuse_norm or with_counts
    if with_counts:
        cnt_ref, cons_s, cnt_s = refs
    else:
        cons_s, cnt_s = refs
    psz, psy, psx = ps
    dzo = pl.program_id(1)
    qz = pl.program_id(2)
    qz2 = qz + dzo
    dz0 = dzo == 0

    @pl.when(qz == 0)
    def _init():
        cons_s[...] = jnp.zeros_like(cons_s)
        cnt_s[...] = jnp.zeros_like(cnt_s)

    valid_z = qz2 < psz

    @pl.when(valid_z)
    def _compute():
        def rect(dyi, k, dy, dx):
            qy_lo, qy_hi = max(0, -dy), min(psy, psy - dy)
            qx_lo, qx_hi = max(0, -dx), min(psx, psx - dx)
            y0, x0 = my + dy, mx + dx
            lsl = (0, slice(qy_lo, qy_hi), slice(qx_lo, qx_hi), 0)
            rsl = (0, slice(qy_lo + dy, qy_hi + dy),
                   slice(qx_lo + dx, qx_hi + dx), 0,
                   slice(y0, y0 + Y), slice(x0, x0 + X))
            hl = hi_l[lsl]
            ll = lo_l[lsl]
            hr = hi_r[rsl]
            lr = lo_r[rsl]
            sc = hl * (hr - lr) - ll * hr
            if weight_mode == "norm_prob_product":
                al = a_l[lsl]
                bl = b_l[lsl]
                ar = a_r[rsl]
                br = b_r[rsl]
                pp = al * (ar - br) - bl * ar
                contrib = (pp - th * th * sc) / (1.0 - th * th)
            elif weight_mode == "prob_product":
                al = a_l[lsl]
                bl = b_l[lsl]
                ar = a_r[rsl]
                br = b_r[rsl]
                contrib = al * (ar - br) - bl * ar
            else:
                contrib = sc
            cons_s[dyi, k] += jnp.sum(contrib, axis=(0, 1))
            if need_cnt:
                cnt_s[dyi, k] += jnp.sum(hl * (hr + lr) + ll * hr,
                                         axis=(0, 1))

        for dyi in range(2 * psy - 1):
            dy = dyi - (psy - 1)
            for k in range(n_dx):
                dx = k - (psx - 1)
                if dy > 0 or (dy == 0 and dx > 0):
                    # lex-positive in-plane displacement: contributes for
                    # every dz of the canonical half
                    rect(dyi, k, dy, dx)
                else:
                    # lex-nonpositive (incl. d == 0 self-pairs at dz == 0):
                    # only valid when dz > 0
                    @pl.when(jnp.logical_not(dz0))
                    def _gated(dyi=dyi, k=k, dy=dy, dx=dx):
                        rect(dyi, k, dy, dx)

    @pl.when(qz == psz - 1)
    def _finish():
        cons = cons_s[...]
        if fuse_norm:
            cnt = cnt_s[...]
            cons = jnp.where(cnt != 0, cons / jnp.maximum(cnt, 1e-30),
                             cons)
        cons_ref[0, :, :, 0] = cons.astype(cons_ref.dtype)
        if with_counts:
            cnt_ref[0, :, :, 0] = cnt_s[...]


def _use_v5() -> bool:
    import os

    return os.environ.get("PPP_PALLAS_V5", "1") != "0"


@functools.partial(jax.jit, static_argnames=("cfg", "with_counts",
                                              "interpret"))
def consensus_array_pallas(affs: jnp.ndarray, cfg: ConsensusConfig,
                           overlap: jnp.ndarray | None = None,
                           with_counts: bool = False,
                           center_valid: jnp.ndarray | None = None,
                           interpret: bool = False):
    """Consensus via the Pallas kernel (3D patchshapes).

    Returns the CANONICAL HALF of the consensus: shape
    ``(psz, ndy, ndx, Z, Y, X)`` holding the planes for dz >= 0, where the
    dz == 0 plane has only lex-positive (dy, dx) entries populated (the
    rest are zero).  This equals ``consensus_array(affs, cfg)[psz-1:]``
    bit-for-bit and costs HALF the pair-loop work of the former
    both-orientation kernel (every unordered pixel pair is visited once,
    like fillConsensusArray.cu's po2 > po1 loop).  Consumers:
    ``rank_scores_pallas`` reads the half directly (rank over canonical
    displacements is exact — see its docstring); the patch graph takes
    ``consensus_jax.symmetrize_half`` of it.
    """
    ps = np.asarray(cfg.ps)
    assert len(ps) == 3, "pallas consensus expects 3D (use 1 for flat axes)"
    psz, psy, psx = (int(p) for p in ps)
    rad = ps // 2
    Z, Y, X = (int(s) for s in affs.shape[1:])
    neigh = tuple(int(n) for n in cfg.neigh)
    n_dx = int(neigh[2])
    assert n_dx <= _MAX_NDX_UNROLL, "dx unroll budget exceeded"

    hi, lo, _ = _masks(affs, cfg, overlap, center_valid)
    a = affs * hi
    b = (1.0 - affs) * lo

    # left operand: aligned with rad margin then cropped to the valid
    # region; right: displacement + alignment margin per axis
    rm = tuple(int(r + p - 1) for r, p in zip(rad, ps))
    mz, my, mx = rm
    lcrop = (slice(None),) * 3 + tuple(
        slice(int(r), int(r) + s) for r, s in zip(rad, (Z, Y, X)))
    L = [_target_aligned(t, ps, tuple(int(r) for r in rad))[lcrop]
         for t in (a, b, hi, lo)]
    R = [_target_aligned(t, ps, rm) for t in (a, b, hi, lo)]

    grid = (Z, psz, psz)        # dz axis spans the canonical half (dz >= 0)

    def left_map(z, dzo, qz):
        return (qz, 0, 0, z, 0, 0)

    def right_map(z, dzo, qz):
        qz2 = jnp.clip(qz + dzo, 0, psz - 1)
        zsel = z + mz + dzo
        return (qz2, 0, 0, zsel, 0, 0)

    def out_map(z, dzo, qz):
        # output written directly in neighborhood-major layout
        # (psz, ndy, ndx, Z, Y, X): no post-kernel transpose copies
        return (dzo, 0, 0, z, 0, 0)

    # arrays are (psz, psy, psx, Zm, Ym, Xm); blocks take one z plane of
    # one qz with all (psy, psx) G-planes resident
    in_block_l = pl.BlockSpec((1, psy, psx, 1, Y, X), left_map,
                              memory_space=pltpu.VMEM)
    in_block_r = pl.BlockSpec((1, psy, psx, 1, Y + 2 * my, X + 2 * mx),
                              right_map, memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, neigh[1], n_dx, 1, Y, X), out_map,
                             memory_space=pltpu.VMEM)

    fuse_norm = bool(cfg.norm_aff)
    # v5 (static band-rect reduces) unless PPP_PALLAS_V5=0; the flag is
    # read at trace time — A/B in separate processes (jit caches by
    # static args only)
    kernel = functools.partial(
        _kernel_v5 if _use_v5() else _kernel,
        ps=(psz, psy, psx), my=my, mx=mx,
        th=float(cfg.patch_threshold), weight_mode=cfg.weight_mode,
        n_dx=n_dx, Y=Y, X=X, fuse_norm=fuse_norm,
        with_counts=with_counts)

    out_dtype = jnp.bfloat16 if cfg.cons_bf16 else jnp.float32
    out_shape = [jax.ShapeDtypeStruct(
        (psz, neigh[1], n_dx, Z, Y, X), out_dtype)]
    out_specs = [out_block]
    if with_counts:
        out_shape.append(jax.ShapeDtypeStruct(
            (psz, neigh[1], n_dx, Z, Y, X), jnp.float32))
        out_specs.append(out_block)
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_block_l] * 4 + [in_block_r] * 4,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((neigh[1], n_dx, Y, X), jnp.float32),
            pltpu.VMEM((neigh[1], n_dx, Y, X), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*L, *R)

    if with_counts:
        return res[0], res[1]
    return res[0]


# ---------------------------------------------------------------------------
# rank kernel
# ---------------------------------------------------------------------------
#
# rankPatches.cu:1-161 semantics via the CANONICAL-HALF consensus S
# (what consensus_array_pallas emits):
#
#   score[c] = sum_{d lex-positive} sum_{q in band(d)}
#                w(q, q+d)(c) * S[d][c + q - rad]
#   w(q, r)  = hi_q hi_r - (hi_q lo_r + lo_q hi_r)      (symmetric)
#
# The full ordered sum over all d != 0 is exactly TWICE the canonical
# sum: the term (q, d) and its swap (q+d, -d) carry the same weight (w is
# symmetric) and the same consensus value (S[-d][x+d] = S[d][x]), so
# restricting to lex-positive d and NOT halving reproduces
# consensus_jax.rank_scores bit-for-bit at half the pair-loop work and
# half the S streaming (only the dz >= 0 planes exist).
# The XLA-scan rank pays P sequential scan steps each touching a
# (P, vol) block; here the sum is banded exactly like the consensus
# kernel (same grid, same operand streaming).  In target-aligned
# coordinates x = c + q - rad the masks become window reads of the SAME
# G stacks the consensus kernel streams: left (margin rad), right
# (margin rad + ps - 1), plus S spatially padded by rad.


def _rank_kernel(hi_l, lo_l, hi_r, lo_r, s_pad, score_ref, score_s,
                 *, ps, th, n_dx, Y, X, int_counter):
    psz, psy, psx = ps
    dzo = pl.program_id(1)      # canonical displacement dz >= 0
    qz = pl.program_id(2)
    qz2 = qz + dzo
    dz0 = dzo == 0

    @pl.when((dzo == 0) & (qz == 0))
    def _init():
        score_s[...] = jnp.zeros_like(score_s)

    valid_z = qz2 < psz

    @pl.when(valid_z)
    def _compute():
        def dy_body(dyi, _):
            dy = dyi - (psy - 1)
            qy_lo = jnp.maximum(0, -dy)
            qy_hi = jnp.minimum(psy, psy - dy)

            for k in range(n_dx):          # static unroll
                dx = k - (psx - 1)
                qx_lo = max(0, -dx)
                qx_hi = min(psx, psx - dx)

                def qy_body(qy, acc):
                    q2y = qy + dy
                    for qx in range(qx_lo, qx_hi):  # static unroll
                        q2x = qx + dx
                        lsl = (0, qy, qx, 0, pl.ds(qy, Y),
                               slice(qx, qx + X))
                        rsl = (0, q2y, q2x, 0, pl.ds(qy + dyi, Y),
                               slice(qx + k, qx + k + X))
                        ssl = (0, dyi, k, 0, pl.ds(qy, Y),
                               slice(qx, qx + X))
                        hl = hi_l[lsl]
                        ll = lo_l[lsl]
                        hr = hi_r[rsl]
                        lr = lo_r[rsl]
                        s = s_pad[ssl].astype(jnp.float32)
                        w_hh = hl * hr
                        w_hl = hl * lr + ll * hr
                        if int_counter:
                            sgn = jnp.sign(s)
                            pos_v = jnp.where(s != 0, sgn, -1.0)
                            neg_v = jnp.where(s != 0, sgn, 1.0)
                            contrib = w_hh * pos_v - w_hl * neg_v
                        else:
                            contrib = (w_hh - w_hl) * s
                        acc = acc + contrib
                    return acc

                acc = jax.lax.fori_loop(
                    qy_lo, qy_hi, qy_body, jnp.zeros((Y, X), jnp.float32))
                if dx <= 0:
                    # dx == 0: d == 0 <=> r == q, self-pairs excluded;
                    # dx < 0: lex-negative at dz == 0, dy == 0 (canonical
                    # gate; dy < 0 is handled by the loop lower bound)
                    spm = jnp.logical_not(
                        dz0 & (dy == 0)).astype(jnp.float32)
                    acc = acc * spm
                score_s[...] += acc
            return ()

        # canonical gate: at dz == 0 only dy >= 0 displacements
        dy_lo = jnp.where(dz0, psy - 1, 0)
        jax.lax.fori_loop(dy_lo, 2 * psy - 1, dy_body, ())

    @pl.when((dzo == psz - 1) & (qz == psz - 1))
    def _finish():
        # canonical half-sum == the full ordered sum halved: no factor
        score_ref[0, ...] = score_s[...]


def _rank_kernel_v5(hi_l, lo_l, hi_r, lo_r, s_pad, score_ref, score_s,
                    *, ps, Y, X, int_counter):
    """v5 rank body: center-aligned mask operands + static d-RECT reduces.

    For a fixed patch pixel q = (qz, qy, qx), every canonical displacement
    d it pairs with reads (a) the partner masks at channels q + d — a
    static channel rectangle of the center-aligned stacks — and (b) the
    consensus at S[d][c + q - rad] — a static spatial window of the
    canonical-half block, all d-channels at once.  One multiply-reduce
    per (q, sub-rect) replaces v4's per-(d, q) plane ops with dynamic
    sublane starts (identical FLOPs, ~10x fewer instructions)."""
    psz, psy, psx = ps
    dzo = pl.program_id(1)
    qz = pl.program_id(2)
    qz2 = qz + dzo
    dz0 = dzo == 0

    @pl.when((dzo == 0) & (qz == 0))
    def _init():
        score_s[...] = jnp.zeros_like(score_s)

    valid_z = qz2 < psz

    @pl.when(valid_z)
    def _compute():
        for qy in range(psy):
            for qx in range(psx):
                hl = hi_l[0, qy, qx, 0]      # (Y, X) at center c
                ll = lo_l[0, qy, qx, 0]

                def subrect(dy_a, dy_b, dx_a, dx_b, qy=qy, qx=qx,
                            hl=hl, ll=ll):
                    # reduced contribution of the static d-subrect
                    # [dy_a, dy_b) x [dx_a, dx_b), or None if empty
                    if dy_a >= dy_b or dx_a >= dx_b:
                        return None
                    rsl = (0, slice(qy + dy_a, qy + dy_b),
                           slice(qx + dx_a, qx + dx_b), 0)
                    hr = hi_r[rsl]           # (bdy, bdx, Y, X) at c
                    lr = lo_r[rsl]
                    ssl = (0, slice(psy - 1 + dy_a, psy - 1 + dy_b),
                           slice(psx - 1 + dx_a, psx - 1 + dx_b), 0,
                           slice(qy, qy + Y), slice(qx, qx + X))
                    s = s_pad[ssl].astype(jnp.float32)
                    w_hh = hl * hr
                    w_hl = hl * lr + ll * hr
                    if int_counter:
                        sgn = jnp.sign(s)
                        pos_v = jnp.where(s != 0, sgn, -1.0)
                        neg_v = jnp.where(s != 0, sgn, 1.0)
                        contrib = w_hh * pos_v - w_hl * neg_v
                    else:
                        contrib = (w_hh - w_hl) * s
                    return jnp.sum(contrib, axis=(0, 1))

                dy_lo, dy_hi = -qy, psy - qy     # band: q + d in patch
                dx_lo, dx_hi = -qx, psx - qx
                # lex-positive in-plane displacements: every dz
                acc = None
                for r in (subrect(1, dy_hi, dx_lo, dx_hi),
                          subrect(0, 1, 1, dx_hi)):
                    if r is not None:
                        acc = r if acc is None else acc + r
                if acc is not None:
                    score_s[...] += acc

                # lex-nonpositive (incl. d == (dz,0,0)): only when dz > 0
                @pl.when(jnp.logical_not(dz0))
                def _neg(qy=qy, qx=qx, subrect=subrect,
                         dy_lo=dy_lo, dx_lo=dx_lo, dx_hi=dx_hi):
                    acc2 = None
                    for r in (subrect(dy_lo, 0, dx_lo, dx_hi),
                              subrect(0, 1, dx_lo, 1)):
                        if r is not None:
                            acc2 = r if acc2 is None else acc2 + r
                    if acc2 is not None:
                        score_s[...] += acc2

    @pl.when((dzo == psz - 1) & (qz == psz - 1))
    def _finish():
        score_ref[0, ...] = score_s[...]


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def rank_scores_pallas(affs: jnp.ndarray, cons_half: jnp.ndarray,
                       cfg: ConsensusConfig,
                       overlap: jnp.ndarray | None = None,
                       center_valid: jnp.ndarray | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """Per-voxel patch agreement score via the Pallas kernel.

    ``cons_half`` must be the CANONICAL-HALF consensus in
    neighborhood-major layout (psz, ndy, ndx, Z, Y, X) — exactly what
    consensus_array_pallas returns.  Matches consensus_jax.rank_scores
    (same sentinels/gating)."""
    ps = np.asarray(cfg.ps)
    assert len(ps) == 3, "pallas rank expects 3D patchshapes"
    psz, psy, psx = (int(p) for p in ps)
    rad = ps // 2
    Z, Y, X = (int(s) for s in affs.shape[1:])
    neigh = tuple(int(n) for n in cfg.neigh)
    n_dz, n_dy, n_dx = neigh
    assert n_dx <= _MAX_NDX_UNROLL, "dx unroll budget exceeded"
    assert cons_half.shape[0] == psz, \
        "rank_scores_pallas expects the canonical-half consensus"

    hi, lo, tgt = _masks(affs, cfg, overlap, center_valid)
    radt = tuple(int(r) for r in rad)
    s_pad = jnp.pad(cons_half,
                    [(0, 0)] * 3 + [(r, r) for r in radt])

    if _use_v5():
        # center-aligned operands, static slicing throughout (see
        # _rank_kernel_v5); no alignment margins needed
        hi6 = hi.reshape((psz, psy, psx, Z, Y, X))
        lo6 = lo.reshape((psz, psy, psx, Z, Y, X))
        grid = (Z, psz, psz)
        my, mx = radt[1], radt[2]

        def lm(z, dzo, qz):
            return (qz, 0, 0, z, 0, 0)

        def rm5(z, dzo, qz):
            return (jnp.clip(qz + dzo, 0, psz - 1), 0, 0, z, 0, 0)

        def s_map5(z, dzo, qz):
            return (dzo, 0, 0, z + qz, 0, 0)

        def out_map5(z, dzo, qz):
            return (z, 0, 0)

        in_m = pl.BlockSpec((1, psy, psx, 1, Y, X), lm,
                            memory_space=pltpu.VMEM)
        in_m_r = pl.BlockSpec((1, psy, psx, 1, Y, X), rm5,
                              memory_space=pltpu.VMEM)
        in_s5 = pl.BlockSpec((1, n_dy, n_dx, 1, Y + 2 * my, X + 2 * mx),
                             s_map5, memory_space=pltpu.VMEM)
        out_b5 = pl.BlockSpec((1, Y, X), out_map5,
                              memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _rank_kernel_v5, ps=(psz, psy, psx), Y=Y, X=X,
            int_counter=bool(cfg.rank_int_counter))
        acc = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[in_m, in_m, in_m_r, in_m_r, in_s5],
            out_specs=out_b5,
            out_shape=jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Y, X), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(hi6, lo6, hi6, lo6, s_pad)

        from .consensus_jax import rank_epilogue

        return rank_epilogue(acc, affs, hi, tgt, cfg, center_valid)

    rm = tuple(int(r + p - 1) for r, p in zip(rad, ps))
    L = [_target_aligned(t, ps, radt) for t in (hi, lo)]
    R = [_target_aligned(t, ps, rm) for t in (hi, lo)]

    grid = (Z, psz, psz)        # dz axis spans the canonical half (dz >= 0)

    def left_map(z, dzo, qz):
        return (qz, 0, 0, z + qz, 0, 0)

    def right_map(z, dzo, qz):
        rz = jnp.clip(qz + dzo, 0, psz - 1)
        return (rz, 0, 0, z + qz + dzo + (psz - 1), 0, 0)

    def s_map(z, dzo, qz):
        return (dzo, 0, 0, z + qz, 0, 0)

    def out_map(z, dzo, qz):
        return (z, 0, 0)

    mz, my, mx = radt
    mzr, myr, mxr = rm
    in_l = pl.BlockSpec((1, psy, psx, 1, Y + 2 * my, X + 2 * mx),
                        left_map, memory_space=pltpu.VMEM)
    in_r = pl.BlockSpec((1, psy, psx, 1, Y + 2 * myr, X + 2 * mxr),
                        right_map, memory_space=pltpu.VMEM)
    in_s = pl.BlockSpec((1, n_dy, n_dx, 1, Y + 2 * my, X + 2 * mx),
                        s_map, memory_space=pltpu.VMEM)
    out_b = pl.BlockSpec((1, Y, X), out_map, memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _rank_kernel, ps=(psz, psy, psx), th=float(cfg.patch_threshold),
        n_dx=n_dx, Y=Y, X=X,
        int_counter=bool(cfg.rank_int_counter))

    acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_l, in_l, in_r, in_r, in_s],
        out_specs=out_b,
        out_shape=jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Y, X), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(L[0], L[1], R[0], R[1], s_pad)

    # fgCnt + center gating + sentinel: the exact epilogue the XLA rank
    # uses (shared so the PPP_DISABLE_PALLAS_RANK fallback cannot diverge)
    from .consensus_jax import rank_epilogue

    return rank_epilogue(acc, affs, hi, tgt, cfg, center_valid)


# ---------------------------------------------------------------------------
# 2x z->x lane folding
# ---------------------------------------------------------------------------
#
# Both kernels vectorize over the in-plane (Y, X) extent of one z-slice per
# grid cell; at FlyLight-crop scale (X = 50) that uses 50 of the VPU's 128
# lanes.  Folding the volume into two z-slabs placed side by side along X
# (with a ps_x - 1 zero gap so no patch window spans the seam, and a
# 3 * rad_z overlap halo so consensus AND rank are exact in each slab's
# owned half) roughly halves the grid (Z -> ~Z/2 + 3 rad_z cells) while
# keeping per-cell cost flat — the same whole-volume-exact halo idea as the
# z-sharded multi-chip path (parallel/sharded.py), applied to the lane
# dimension of a single core.  Halo arithmetic: consensus at base pixel p1
# reads affinities/masks within 2 rad_z of p1; rank at center c reads
# consensus within rad_z, so a slab owning [0, mid) needs rows < mid +
# 3 rad_z (reference reach: fillConsensusArray.cu pair loops * rankPatches.cu
# window reads).  Global-interior center gating rides the existing
# center_valid operand (the folded block's own interior test is wrong at
# the seam columns and slab z-edges).


def fold2x_geometry(cfg: ConsensusConfig, vol_shape):
    """(mid, halo, gap, d0) when 2x z->x folding applies, else None.

    Applies when the patch is true-3D, the volume is deep enough to
    amortize the 3*rad_z halo, and the folded row (2X + gap plus the
    right-operand margins) still fits the 128-lane VPU tile.
    """
    ps = np.asarray(cfg.ps)
    if len(vol_shape) != 3 or int(ps[0]) <= 1:
        return None
    rad = ps // 2
    Z, Y, X = (int(v) for v in vol_shape)
    h = 3 * int(rad[0])
    gap = int(ps[2]) - 1
    mx = int(rad[2] + ps[2] - 1)
    mid = (Z + 1) // 2
    if Z < 4 * h or mid + h > Z:
        return None
    if 2 * X + gap + 2 * mx > 128:
        return None
    return mid, h, gap, mid + h


@functools.partial(jax.jit,
                   static_argnames=("cfg", "geom", "interpret"))
def consensus_and_rank_pallas_fold2x(
        affs: jnp.ndarray, cfg: ConsensusConfig, geom,
        overlap: jnp.ndarray | None = None,
        center_valid: jnp.ndarray | None = None,
        interpret: bool = False):
    """Consensus + rank via the Pallas kernels on the 2x-folded volume.

    Returns (cons_half, scores) on the ORIGINAL volume — cons_half is the
    canonical-half layout consensus_array_pallas emits — numerically equal
    to consensus_array_pallas + rank_scores_pallas run unfolded (each
    slab sees every contribution its owned half needs; fold/unfold are
    pure slice/concat).
    """
    mid, h, gap, d0 = geom
    ps = np.asarray(cfg.ps)
    rad = ps // 2
    Z, Y, X = (int(s) for s in affs.shape[1:])

    def fold(x):
        s0 = x[..., :d0, :, :]
        s1 = x[..., mid - h:, :, :]
        pad1 = d0 - s1.shape[-3]
        if pad1:
            s1 = jnp.pad(s1, [(0, 0)] * (s1.ndim - 3)
                         + [(0, pad1), (0, 0), (0, 0)])
        gz = jnp.zeros(x.shape[:-3] + (d0, Y, gap), x.dtype)
        return jnp.concatenate([s0, gz, s1], axis=-1)

    def unfold(xf):
        a = xf[..., :mid, :, :X]
        b = xf[..., h:h + (Z - mid), :, X + gap:]
        return jnp.concatenate([a, b], axis=-3)

    # global-interior center gate: the folded block's interior test is
    # wrong at the seam columns (slab edges that are volume boundaries
    # globally) and too wide at slab z-edges; enforce the exact global
    # gate through the center_valid operand
    interior = np.zeros((Z, Y, X), bool)
    interior[tuple(slice(int(r), dim - int(r)) if r else slice(None)
                   for r, dim in zip(rad, (Z, Y, X)))] = True
    cv = jnp.asarray(interior)
    if center_valid is not None:
        cv = cv & center_valid

    affs_f = fold(affs)
    ov_f = fold(overlap) if overlap is not None else None
    cv_f = fold(cv)
    cons_f = consensus_array_pallas(affs_f, cfg, overlap=ov_f,
                                    center_valid=cv_f,
                                    interpret=interpret)
    scores_f = rank_scores_pallas(affs_f, cons_f, cfg, overlap=ov_f,
                                  center_valid=cv_f, interpret=interpret)
    return unfold(cons_f), unfold(scores_f)
