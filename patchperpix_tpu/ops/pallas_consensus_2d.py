"""Pallas TPU consensus + rank for 2D data via sublane row folding.

2D volumes (BBBC010-scale: 520x696 images, 25x25 patches) previously ran
the XLA-scan consensus/rank — O(P) sequential scan steps that dominate
the 2D assembly (measured 21.8 s of a 22.6 s assemble at dataset scale).
The 3D Pallas kernel cannot be reused directly: its grid streams one
z-plane per cell, and single-z grids miscompile on current Mosaic
(`pallas_consensus.pallas_supported`).

Design — fold the row axis into (slab, sublane) and decompose row
displacements uniquely:

- the image (H, W) is folded into (ZS, V=8, W) slabs; a row displacement
  d in [-(p-1), p-1] decomposes UNIQUELY as d = V*dzb + dyr with
  dyr in [0, V): the slab-granular part dzb rides the pallas grid /
  BlockSpec index maps (like the 3D kernel's dz grid dim), the sub-slab
  part dyr is an in-kernel loop whose row window is read from
  consecutive slab blocks via ``pltpu.roll`` with a NON-NEGATIVE traced
  amount + static head slice (dynamic negative sublane rolls and
  dynamic_slice-on-values both fail on this Mosaic — probed in
  scripts/probe_dynslice.py).
- sliding multi-slab windows are built by passing the SAME folded array
  through k size-1 slab BlockSpecs offset by one (block indices are in
  units of the block shape, so a size-2 slab block cannot stride by one
  slab).
- operands are a SINGLE sentinel-gated, target-aligned G-stack per side
  (ag[q][x] = center_ok ? affs_G[q][x] : -1) plus one target-eligibility
  plane: hi = (ag > th) * tgt, lo = (ag >= 0) * (ag < bg_th) * tgt are
  derived IN-KERNEL (fillConsensusArray.cu:25-60 semantics via
  consensus_jax._masks), so HBM holds one stack per side instead of
  four — essential at 2D scale where one (P, H, W) stack is ~0.9 GB.
- the patch-pixel q-planes are chunked by qy groups of V (grid dim qg);
  the partner plane q2y = qy + d spans two adjacent groups, selected
  per-access with a clamped dual-read + where (group indices in
  BlockSpec maps are clipped; clipped blocks are provably never
  selected because accessed q2y always lies in [0, p)).

Both kernels emit/consume the fold layout directly; ``unfold_consensus``
produces the standard symmetrized (1, nd, nd, 1, H, W) array for the
patch-graph stage.

Reference semantics: fillConsensusArray.cu / rankPatches.cu via the
numpy goldens (ops/np_reference.py); parity tests in
tests/test_pallas_2d.py (interpret tier) and the tpu tier.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .consensus_jax import ConsensusConfig, _shift_nd
from .np_reference import patch_offsets

V = 8  # sublane fold height

# static-unroll budget for the in-plane displacement loop (2p - 1)
_MAX_ND_UNROLL = 64


@dataclass(frozen=True)
class Geom2D:
    p: int          # 2D patch side
    H: int
    W: int
    ZS: int         # ceil(H / V) volume slabs
    DZL: int        # floor(-(p-1)/V)
    DZB: int        # slab-displacement slots
    QG: int         # qy plane groups of V

    @property
    def rad(self):
        return self.p // 2

    @property
    def nd(self):
        return 2 * self.p - 1

    @property
    def DZC(self):  # canonical slab-displacement slots (dzr >= 0)
        return self.DZB + self.DZL

    @property
    def cmL(self):  # left/tgt/S col margin
        return self.rad

    @property
    def cmR(self):  # right col margin (alignment + displacement)
        return self.rad + self.p - 1

    @property
    def SL(self):   # AGL/TGL/S slabs: 2 top + ZS + 5 bottom
        return self.ZS + 7

    @property
    def SR(self):   # AGR/TGR slabs: 3 top + ZS + 9 bottom (rank right
        return self.ZS + 12  # windows reach slab base + 3)

    # rank row windows: reads at volume row c + (qy - rad) [+ d] become
    # rolled multi-slab windows; the fold pads (2V left/S, 3V right) and
    # the -rad alignment shift decompose into a slab-base increment and
    # a sub-slab local offset
    @property
    def LB(self):   # left/S slab-base add
        return (2 * V - self.rad) // V

    @property
    def LO(self):   # left/S local row offset
        return (2 * V - self.rad) % V

    @property
    def RB(self):   # right slab-base add
        return (3 * V - self.rad) // V

    @property
    def RO(self):   # right local row offset
        return (3 * V - self.rad) % V


def pallas2d_supported(cfg: ConsensusConfig, vol_shape) -> bool:
    """True when the 2D fold kernels cover this config (flat-z volume,
    square odd 2D patch, displacement unroll within budget)."""
    ps = np.asarray(cfg.ps)
    if len(ps) != 3 or int(ps[0]) != 1:
        return False
    if vol_shape is not None and int(vol_shape[0]) != 1:
        return False
    p = int(ps[1])
    if p != int(ps[2]) or p % 2 == 0 or p < 3:
        return False
    if 2 * p - 1 > _MAX_ND_UNROLL:
        return False
    return True


def geom2d(cfg: ConsensusConfig, vol_shape) -> Geom2D:
    p = int(np.asarray(cfg.ps)[1])
    _, H, W = (int(s) for s in vol_shape)
    ZS = -(-H // V)
    DZL = -((p - 1 + V - 1) // V)
    DZH = (p - 1) // V
    return Geom2D(p=p, H=H, W=W, ZS=ZS, DZL=DZL, DZB=DZH - DZL + 1,
                  QG=-(-p // V))


# ---------------------------------------------------------------------------
# operand preparation
# ---------------------------------------------------------------------------


def _fold_rows(x: jnp.ndarray, pad_top: int, total_slabs: int,
               fill) -> jnp.ndarray:
    """(..., rows, cols) -> (..., total_slabs, V, cols); volume row r sits
    at fold row r + pad_top."""
    rows = x.shape[-2]
    pad_bot = total_slabs * V - pad_top - rows
    assert pad_bot >= 0, (rows, pad_top, total_slabs)
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad_top, pad_bot), (0, 0)],
                constant_values=fill)
    return x.reshape(x.shape[:-2] + (total_slabs, V, x.shape[-1]))


def _gated_stack(affs: jnp.ndarray, cfg: ConsensusConfig, g: Geom2D,
                 overlap, center_valid, fold_tgt: bool):
    """Sentinel-gated target-aligned (P, H, W) stack + target plane.

    Semantics per consensus_jax._masks (fillConsensusArray.cu:25-60):
    -1 encodes "center invalid"; affs in [0, 1] so hi = ag > th and
    lo = (ag >= 0) & (ag < bg_th) recover the masks.  With ``fold_tgt``
    the target gate is folded into the sentinel too (tgt ? ag : -1
    zeroes hi and lo identically) and no target plane is needed."""
    p, rad, H, W = g.p, g.rad, g.H, g.W
    th = cfg.patch_threshold
    affs2 = affs.reshape(affs.shape[0], H, W).astype(jnp.float32)

    fg = affs2[cfg.mid] > th
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = ((ii >= rad) & (ii < H - rad)
                & (jj >= rad) & (jj < W - rad))
    center_ok = fg & interior
    if center_valid is not None:
        center_ok = center_ok & center_valid.reshape(H, W)
    tgt_ok = fg
    if cfg.overlapping_inst and overlap is not None:
        tgt_ok = tgt_ok & jnp.logical_not(
            overlap.reshape(H, W).astype(bool))

    ag = jnp.where(center_ok[None], affs2, -1.0)

    # target alignment: G[q][x] = ag[q][x - (off_q - rad)], -1 fill
    # (shift ag+1 with zero fill, subtract 1)
    offs2 = patch_offsets(np.array([p, p])) - rad  # (P, 2)

    def align(plane, s):
        return _shift_nd(plane + 1.0, s, (0, 1)) - 1.0

    agG = jax.vmap(align)(ag, jnp.asarray(offs2, jnp.int32))  # (P, H, W)
    if fold_tgt:
        agG = jnp.where(tgt_ok[None], agG, -1.0)
    return agG, tgt_ok


def _plane_layout(x, g: Geom2D, cm, pad_top, slabs, fill):
    """(P, H, w) -> (QG*V, p, slabs, V, w + 2 cm) fold layout."""
    p = g.p
    x = jnp.pad(x, [(0, 0), (0, 0), (cm, cm)], constant_values=fill)
    x = _fold_rows(x, pad_top, slabs, fill)
    x = x.reshape(p, p, slabs, V, x.shape[-1])
    qpad = g.QG * V - p
    if qpad:
        x = jnp.pad(x, [(0, qpad)] + [(0, 0)] * 4, constant_values=fill)
    return x


def _prep_operands(affs: jnp.ndarray, cfg: ConsensusConfig, g: Geom2D,
                   overlap, center_valid):
    """Gated target-aligned stacks + target planes in fold layout.

    Returns AGL (QG*V, p, SL, V, WmL), AGR (QG*V, p, SR, V, WmR),
    TGL (SL, V, WmL), TGR (SR, V, WmR); fills: ag pads -1, tgt pads 0.
    """
    agG, tgt_ok = _gated_stack(affs, cfg, g, overlap, center_valid,
                               fold_tgt=False)
    AGL = _plane_layout(agG, g, g.cmL, 2 * V, g.SL, -1.0)
    AGR = _plane_layout(agG, g, g.cmR, 3 * V, g.SR, -1.0)

    tf = tgt_ok.astype(jnp.float32)
    TGL = _fold_rows(jnp.pad(tf, [(0, 0), (g.cmL, g.cmL)]), 2 * V, g.SL,
                     0.0)
    TGR = _fold_rows(jnp.pad(tf, [(0, 0), (g.cmR, g.cmR)]), 3 * V, g.SR,
                     0.0)
    return AGL, AGR, TGL, TGR


def _derive(agv, tgtv, th, bg):
    """hi/lo/a/b from a gated G value + target plane (in-kernel)."""
    hi = (agv > th).astype(jnp.float32) * tgtv
    lo = ((agv >= 0.0) & (agv < bg)).astype(jnp.float32) * tgtv
    return hi, lo, agv * hi, (1.0 - agv) * lo


def _rolled(refs, idx, start):
    """Concat len(refs) consecutive-slab (V, cols) planes at ref index
    ``idx`` and extract rows [start, start + V) via a non-negative roll."""
    wall = jnp.concatenate([r[idx] for r in refs], axis=0)
    return pltpu.roll(wall, len(refs) * V - start, 0)[:V]


# ---------------------------------------------------------------------------
# consensus kernel
# ---------------------------------------------------------------------------


def _cons2d_kernel(agl, agrA0, agrA1, agrB0, agrB1, tgl, tgr0, tgr1,
                   out_ref, cons_s, cnt_s, acc_s, accn_s,
                   lhi_s, llo_s, la_s, lb_s,
                   *, g: Geom2D, th, bg, weight_mode, fuse_norm,
                   out_dtype):
    p, rad, W = g.p, g.rad, g.W
    qg = pl.program_id(2)
    # canonical half: the dzb grid axis spans only dzr >= 0 (row
    # displacement d = V*dzr + dyr >= 0); the lex-negative half is
    # recovered by the shift identity S[-d][x+d] = S[d][x] at unfold
    # time — halving the pair-loop VPU work (P^2 -> P^2/2 ordered pairs)
    dzr = pl.program_id(1)

    @pl.when(qg == 0)
    def _init():
        cons_s[...] = jnp.zeros_like(cons_s)
        cnt_s[...] = jnp.zeros_like(cnt_s)

    if weight_mode == "norm_prob_product":
        c1 = 1.0 / (1.0 - th * th)
        c2 = th * th / (1.0 - th * th)

    tgt_l = tgl[0, :, g.cmL:g.cmL + W]            # (V, W)
    gA = qg + dzr                                  # true right plane group

    # left operands into VMEM scratch per cell: keeping 4 x p derived
    # (V, W) planes live in registers across the q2x loop overflows the
    # vreg file and spills every use (the rank kernel's hl_s/ll_s
    # pattern; fill cost is ~1% of the inner loop)
    for qy_loc in range(V):
        for qx in range(p):
            ag_l = agl[qy_loc, qx, 0, :, g.cmL:g.cmL + W]
            hi_v, lo_v, a_v, b_v = _derive(ag_l, tgt_l, th, bg)
            lhi_s[qy_loc, qx] = hi_v
            llo_s[qy_loc, qx] = lo_v
            la_s[qy_loc, qx] = a_v
            lb_s[qy_loc, qx] = b_v

    def dyr_body(dyr, _):
        d = V * dzr + dyr
        # rolled right target rows (x + d), full margined width
        tr_full = _rolled((tgr0, tgr1), 0, dyr)

        qlo = jnp.maximum(jnp.maximum(0, -d), V * qg)
        qhi = jnp.minimum(jnp.minimum(p, p - d), V * (qg + 1))

        # accumulate this dyr iteration into STATICALLY-indexed scratch
        # (k is a python int): dynamic-dyr RMW per (qx, q2x) measured
        # ~6x slower than the rank kernel's static accumulator; the
        # dynamic spill into cons_s[dyr] happens once per dyr
        acc_s[...] = jnp.zeros_like(acc_s)
        if fuse_norm:
            accn_s[...] = jnp.zeros_like(accn_s)

        def qy_body(qy, _c):
            qy_loc = qy - V * qg
            q2y = qy + d
            iA = jnp.clip(q2y - V * gA, 0, V - 1)
            iB = jnp.clip(q2y - V * (gA + 1), 0, V - 1)
            useB = q2y >= V * (gA + 1)
            for q2x in range(p):
                # right plane rows [dyr, dyr+V) of the slab pair, group
                # selected by where (clipped blocks never selected)
                pA = jnp.concatenate([agrA0[iA, q2x, 0],
                                      agrA1[iA, q2x, 0]], axis=0)
                pB = jnp.concatenate([agrB0[iB, q2x, 0],
                                      agrB1[iB, q2x, 0]], axis=0)
                wall = jnp.where(useB, pB, pA)
                ag_r = pltpu.roll(wall, 2 * V - dyr, 0)[:V]   # (V, WmR)
                hr, lr, ar, br = _derive(ag_r, tr_full, th, bg)
                armbr = ar - br
                hrmlr = hr - lr
                hrplr = hr + lr
                for qx in range(p):
                    dx = q2x - qx
                    k = dx + p - 1
                    hl = lhi_s[qy_loc, qx]
                    ll = llo_s[qy_loc, qx]
                    al = la_s[qy_loc, qx]
                    bl = lb_s[qy_loc, qx]
                    x0 = g.cmR + dx
                    cs = slice(x0, x0 + W)
                    pp = al * armbr[:, cs] - bl * ar[:, cs]
                    sc = hl * hrmlr[:, cs] - ll * hr[:, cs]
                    if weight_mode == "norm_prob_product":
                        contrib = pp * c1 - sc * c2
                    elif weight_mode == "prob_product":
                        contrib = pp
                    else:
                        contrib = sc
                    if dx <= 0:
                        # dx == 0: self-pairs (q2 == q <=> d == 0, dx == 0);
                        # dx < 0: lex-negative at d == 0 (canonical gate)
                        spm = (d != 0).astype(jnp.float32)
                        contrib = contrib * spm
                    acc_s[k] += contrib
                    if fuse_norm:
                        cnt = hl * hrplr[:, cs] + ll * hr[:, cs]
                        if dx <= 0:
                            cnt = cnt * spm
                        accn_s[k] += cnt
            return _c

        jax.lax.fori_loop(qlo, qhi, qy_body, 0)
        cons_s[dyr] += acc_s[...]
        if fuse_norm:
            cnt_s[dyr] += accn_s[...]
        return _

    dyr_lo = jnp.maximum(0, -(p - 1) - V * dzr)
    dyr_hi = jnp.minimum(V, p - V * dzr)
    jax.lax.fori_loop(dyr_lo, dyr_hi, dyr_body, ())

    @pl.when(qg == pl.num_programs(2) - 1)
    def _finish():
        cons = cons_s[...]
        if fuse_norm:
            cnt = cnt_s[...]
            cons = jnp.where(cnt != 0, cons / jnp.maximum(cnt, 1e-30),
                             cons)
        # col-pad to the S margin (consensus outside the volume is 0)
        cons = jnp.pad(cons, [(0, 0), (0, 0), (0, 0), (rad, rad)])
        out_ref[0, :, :, 0] = cons.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def consensus_fold_pallas_2d(affs: jnp.ndarray, cfg: ConsensusConfig,
                             overlap: jnp.ndarray | None = None,
                             center_valid: jnp.ndarray | None = None,
                             interpret: bool = False):
    """CANONICAL-HALF 2D consensus in FOLD layout
    (DZC, V, nd, SL, V, W + 2 rad): only the row displacements d >= 0
    exist (slab plane dzr = d // V, sub-slab dyr = d % V), and the
    (d == 0) plane holds only dx > 0 columns.  Volume slab s sits at
    fold slab s + 2, volume col c at fold col c + rad.
    ``unfold_consensus`` yields the standard symmetrized
    (1, nd, nd, 1, H, W) array via the shift identity.

    The margin z-cells (grid runs over all SL output slabs) write exact
    zeros because the left operand's row pads are sentinel-dead."""
    g = geom2d(cfg, affs.shape[1:])
    p, nd, W = g.p, g.nd, g.W
    AGL, AGR, TGL, TGR = _prep_operands(affs, cfg, g, overlap,
                                        center_valid)

    grid = (g.SL, g.DZC, g.QG)      # dzb axis spans dzr >= 0 only
    WmL = W + 2 * g.cmL
    WmR = W + 2 * g.cmR

    def agl_map(z, dzb, qg):
        return (qg, 0, z, 0, 0)

    def agr_map(gi, k):
        def m(z, dzb, qg):
            grp = jnp.clip(qg + dzb + gi, 0, g.QG - 1)
            slab = jnp.clip(z + 1 + dzb + k, 0, g.SR - 1)
            return (grp, 0, slab, 0, 0)
        return m

    def tgr_map(k):
        def m(z, dzb, qg):
            return (jnp.clip(z + 1 + dzb + k, 0, g.SR - 1), 0, 0)
        return m

    agl_spec = pl.BlockSpec((V, p, 1, V, WmL), agl_map,
                            memory_space=pltpu.VMEM)
    agr_specs = [pl.BlockSpec((V, p, 1, V, WmR), agr_map(gi, k),
                              memory_space=pltpu.VMEM)
                 for gi in (0, 1) for k in (0, 1)]
    tgl_spec = pl.BlockSpec((1, V, WmL), lambda z, dzb, qg: (z, 0, 0),
                            memory_space=pltpu.VMEM)
    tgr_specs = [pl.BlockSpec((1, V, WmR), tgr_map(k),
                              memory_space=pltpu.VMEM) for k in (0, 1)]
    out_spec = pl.BlockSpec(
        (1, V, nd, 1, V, W + 2 * g.cmL),
        lambda z, dzb, qg: (dzb, 0, 0, z, 0, 0),
        memory_space=pltpu.VMEM)

    out_dtype = jnp.bfloat16 if cfg.cons_bf16 else jnp.float32
    kernel = functools.partial(
        _cons2d_kernel, g=g, th=float(cfg.patch_threshold),
        bg=float(cfg.bg_th), weight_mode=cfg.weight_mode,
        fuse_norm=bool(cfg.norm_aff), out_dtype=out_dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[agl_spec] + agr_specs + [tgl_spec] + tgr_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (g.DZC, V, nd, g.SL, V, W + 2 * g.cmL), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((V, nd, V, W), jnp.float32),
            pltpu.VMEM((V, nd, V, W), jnp.float32),
            pltpu.VMEM((nd, V, W), jnp.float32),
            pltpu.VMEM((nd, V, W), jnp.float32),
            pltpu.VMEM((V, p, V, W), jnp.float32),
            pltpu.VMEM((V, p, V, W), jnp.float32),
            pltpu.VMEM((V, p, V, W), jnp.float32),
            pltpu.VMEM((V, p, V, W), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(AGL, AGR, AGR, AGR, AGR, TGL, TGR, TGR)


def unfold_consensus(S_fold: jnp.ndarray, cfg: ConsensusConfig,
                     vol_shape) -> jnp.ndarray:
    """Canonical fold layout -> standard symmetrized (1, nd, nd, 1, H, W).

    The canonical planes (d >= 0) come straight out of the fold; the
    lex-negative half is filled by ``symmetrize_consensus``'s shift
    identity S[-d][x+d] = S[d][x] (exactly how the XLA path and the 3D
    pallas path recover it)."""
    from .consensus_jax import symmetrize_consensus

    g = geom2d(cfg, vol_shape)
    nd, W, rad, p = g.nd, g.W, g.rad, g.p
    ds = np.arange(p)                              # canonical d >= 0 rows
    dzb_of = np.floor_divide(ds, V)
    dyr_of = np.mod(ds, V)
    x = S_fold[jnp.asarray(dzb_of), jnp.asarray(dyr_of)]
    x = x[:, :, 2:2 + g.ZS, :, rad:rad + W]        # (p, nd, ZS, V, W)
    x = x.reshape(p, nd, g.ZS * V, W)[:, :, :g.H]
    # embed the canonical rows at d >= 0 (lex-negative rows zero: the
    # exact layout consensus_array produces), then symmetrize
    x = jnp.concatenate(
        [jnp.zeros((p - 1,) + x.shape[1:], x.dtype), x], axis=0)
    # keep the fold dtype: at BBBC010 scale the f32 unfold alone is
    # 3.5 GB and the graph stage consumes bf16 sym exactly (one-hot
    # operands at MXU precision HIGH, same as the 3D pallas path)
    return symmetrize_consensus(x.reshape(1, nd, nd, 1, g.H, W), cfg)


def fold_bytes_f32(cfg: ConsensusConfig, vol_shape) -> int:
    """HBM bytes of the f32 fold-layout consensus for this geometry."""
    g = geom2d(cfg, vol_shape)
    return g.DZC * V * g.nd * g.SL * V * (g.W + 2 * g.rad) * 4


# ---------------------------------------------------------------------------
# rank kernel
# ---------------------------------------------------------------------------
#
# rankPatches.cu semantics via the CANONICAL-HALF fold consensus S:
#   score[c] = sum_{d lex-positive} sum_{q in band(d)}
#                 w(q, q+d)(c) * S[d][c + q - rad]
# (the full ordered sum over all d != 0 is exactly twice the canonical
# sum — w symmetric, S[-d][x+d] = S[d][x] — so restricting to d >= 0 /
# dx > 0 at d == 0 and NOT halving is exact at half the work)
# with w(q, r) = hi_q hi_r - (hi_q lo_r + lo_q hi_r), all masks read at
# the TARGET positions x = c + q - rad (left) and x + d (right).  The
# u = q - rad row shift makes every read a rolled multi-slab window; the
# d slab-part rides the dzb grid dim and the score accumulates across
# (qg, dzb, q2x).
#
# VMEM design (the naive full-width kernel needs 174M > the 128M core):
# - the target gate is FOLDED INTO the stacks (tgt ? ag : -1 makes both
#   hi and lo vanish exactly like the center sentinel), dropping the
#   seven TG operands;
# - q2x rides the grid, shrinking the eight right windows from (V, p,
#   1, V, WmR) to (V, 1, 1, V, Wsk) — the right column slice
#   [cmR - rad + q2x, +W) depends only on q2x, so each q2x plane is
#   PRE-SKEWED in HBM (skew[x'] = plane[x' + q2x]) and the in-kernel
#   slice becomes static at cmR - rad;
# - the per-(qy, qx) left masks are computed once per (z, qg) into VMEM
#   scratch (lstart = qy_loc + LO is static per unrolled qy_loc — plain
#   sublane slices, no rolls) and reused across all (dzb, q2x) cells.


def _rank2d_kernel(agl0, agl1, agl2,
                   agrA0, agrA1, agrA2, agrA3,
                   agrB0, agrB1, agrB2, agrB3,
                   s0, s1, s2,
                   score_ref, score_s, hl_s, ll_s,
                   *, g: Geom2D, th, bg, int_counter):
    p, rad, W = g.p, g.rad, g.W
    qg = pl.program_id(1)
    dzb = pl.program_id(2)
    q2x = pl.program_id(3)
    dzr = dzb                    # canonical: the dzb axis IS dzr >= 0
    gA = qg + dzr

    @pl.when((qg == 0) & (dzb == 0) & (q2x == 0))
    def _init():
        score_s[...] = jnp.zeros_like(score_s)

    @pl.when((dzb == 0) & (q2x == 0))
    def _fill_left():
        # left masks for this (z, qg): lstart is static per qy_loc, so
        # the 3-slab wall reduces to a static sublane slice
        for qy_loc in range(V):
            lstart = qy_loc + g.LO
            for qx in range(p):
                wall = jnp.concatenate(
                    [r[qy_loc, qx, 0] for r in (agl0, agl1, agl2)],
                    axis=0)
                ag_l = wall[lstart:lstart + V, qx:qx + W]
                hl_s[qy_loc, qx] = (ag_l > th).astype(jnp.float32)
                ll_s[qy_loc, qx] = ((ag_l >= 0.0)
                                    & (ag_l < bg)).astype(jnp.float32)

    rs = slice(g.cmR - rad, g.cmR - rad + W)   # static: q2x pre-skewed

    def dyr_body(dyr, _):
        d = V * dzr + dyr
        qlo = jnp.maximum(jnp.maximum(0, -d), V * qg)
        qhi = jnp.minimum(jnp.minimum(p, p - d), V * (qg + 1))

        def qy_body(qy, _c):
            qy_loc = qy - V * qg
            lstart = qy_loc + g.LO       # rows c+u, fold pad 2V, u=qy-rad
            rstart = qy_loc + dyr + g.RO  # rows c+u+d, fold pad 3V
            q2y = qy + d
            iA = jnp.clip(q2y - V * gA, 0, V - 1)
            iB = jnp.clip(q2y - V * (gA + 1), 0, V - 1)
            useB = q2y >= V * (gA + 1)
            pA = jnp.concatenate(
                [r[iA, 0, 0] for r in (agrA0, agrA1, agrA2, agrA3)],
                axis=0)
            pB = jnp.concatenate(
                [r[iB, 0, 0] for r in (agrB0, agrB1, agrB2, agrB3)],
                axis=0)
            wall = jnp.where(useB, pB, pA)
            ag_r = pltpu.roll(wall, 4 * V - rstart, 0)[:V]
            hr = (ag_r > th).astype(jnp.float32)[:, rs]
            lr = ((ag_r >= 0.0) & (ag_r < bg)).astype(jnp.float32)[:, rs]
            for qx in range(p):
                k = q2x - qx + p - 1
                hl = hl_s[qy_loc, qx]
                ll = ll_s[qy_loc, qx]
                # S[d][c + u]: rows rolled like the left reads,
                # cols c + qx - rad at fold col margin rad
                # cast BEFORE the roll: Mosaic's dynamic rotate only
                # supports 32-bit data (S may be stored bf16)
                sw = jnp.concatenate(
                    [s[0, dyr, k, 0] for s in (s0, s1, s2)],
                    axis=0).astype(jnp.float32)
                s_v = pltpu.roll(sw, 3 * V - lstart, 0)[:V, qx:qx + W]
                w_hh = hl * hr
                w_hl = hl * lr + ll * hr
                if int_counter:
                    sgn = jnp.sign(s_v)
                    pos_v = jnp.where(s_v != 0, sgn, -1.0)
                    neg_v = jnp.where(s_v != 0, sgn, 1.0)
                    contrib = w_hh * pos_v - w_hl * neg_v
                else:
                    contrib = (w_hh - w_hl) * s_v
                # canonical gate: keep d > 0, or d == 0 with dx > 0
                # (self-pairs q2 == q and lex-negative dx both excluded)
                spm = ((q2x > qx) | (d != 0)).astype(jnp.float32)
                score_s[...] += contrib * spm
            return _c

        jax.lax.fori_loop(qlo, qhi, qy_body, 0)
        return _

    dyr_lo = jnp.maximum(0, -(p - 1) - V * dzr)
    dyr_hi = jnp.minimum(V, p - V * dzr)
    jax.lax.fori_loop(dyr_lo, dyr_hi, dyr_body, ())

    @pl.when((qg == pl.num_programs(1) - 1)
             & (dzb == pl.num_programs(2) - 1)
             & (q2x == pl.num_programs(3) - 1))
    def _finish():
        # canonical half-sum == the full ordered sum halved: no factor
        score_ref[0] = score_s[...]


def _prep_rank_operands(affs, cfg, g: Geom2D, overlap, center_valid):
    """Target-gated left stack + target-gated PRE-SKEWED right stack.

    The target gate folds into the sentinel (tgt ? ag : -1 zeroes both
    hi and lo), so the rank kernel needs no TG operands.  The right
    stack is skewed per q2x plane (skew[x'] = plane[x' + q2x]) so the
    kernel's right column slice is static.  Gate and skew both apply at
    the (P, H, W) level BEFORE folding — at BBBC010 scale the fold
    layouts are ~1.5 GB each and must not be materialized twice."""
    p = g.p
    agGt, _ = _gated_stack(affs, cfg, g, overlap, center_valid,
                           fold_tgt=True)
    AGLt = _plane_layout(agGt, g, g.cmL, 2 * V, g.SL, -1.0)

    # skew per q2x plane on the margined flat stack, then fold
    x = jnp.pad(agGt, [(0, 0), (0, 0), (g.cmR, g.cmR)],
                constant_values=-1.0)
    Wsk = x.shape[-1] - (p - 1)
    x = x.reshape(p, p, g.H, x.shape[-1])

    def sh(plane, q2x):  # plane (p, H, WmR) — one q2x column of planes
        return jax.lax.dynamic_slice_in_dim(plane, q2x, Wsk, axis=-1)

    x = jax.vmap(sh, in_axes=(1, 0), out_axes=1)(
        x, jnp.arange(p, dtype=jnp.int32))
    x = _fold_rows(x.reshape(p * p, g.H, Wsk), 3 * V, g.SR, -1.0)
    AGRsk = x.reshape(p, p, g.SR, V, Wsk)
    qpad = g.QG * V - p
    if qpad:
        AGRsk = jnp.pad(AGRsk, [(0, qpad)] + [(0, 0)] * 4,
                        constant_values=-1.0)
    return AGLt, AGRsk


def _rank2d_call(affs: jnp.ndarray, S_fold: jnp.ndarray,
                 cfg: ConsensusConfig, overlap, center_valid,
                 interpret: bool) -> jnp.ndarray:
    g = geom2d(cfg, affs.shape[1:])
    p, nd, W = g.p, g.nd, g.W
    AGLt, AGRsk = _prep_rank_operands(affs, cfg, g, overlap,
                                      center_valid)

    grid = (g.ZS, g.QG, g.DZC, p)   # dzb axis spans dzr >= 0 only
    WmL = W + 2 * g.cmL
    WmS = W + 2 * g.cmL
    Wsk = AGRsk.shape[-1]

    def agl_map(k):
        def m(z, qg, dzb, q2x):
            return (qg, 0, jnp.clip(z + qg + g.LB + k, 0, g.SL - 1), 0, 0)
        return m

    def s_map(k):
        def m(z, qg, dzb, q2x):
            return (dzb, 0, 0, jnp.clip(z + qg + g.LB + k, 0, g.SL - 1),
                    0, 0)
        return m

    def agr_map(gi, k):
        def m(z, qg, dzb, q2x):
            grp = jnp.clip(qg + dzb + gi, 0, g.QG - 1)
            slab = jnp.clip(z + qg + dzb + g.RB + k, 0, g.SR - 1)
            return (grp, q2x, slab, 0, 0)
        return m

    agl_specs = [pl.BlockSpec((V, p, 1, V, WmL), agl_map(k),
                              memory_space=pltpu.VMEM) for k in range(3)]
    agr_specs = [pl.BlockSpec((V, 1, 1, V, Wsk), agr_map(gi, k),
                              memory_space=pltpu.VMEM)
                 for gi in (0, 1) for k in range(4)]
    s_specs = [pl.BlockSpec((1, V, nd, 1, V, WmS), s_map(k),
                            memory_space=pltpu.VMEM) for k in range(3)]
    out_spec = pl.BlockSpec((1, V, W), lambda z, qg, dzb, q2x: (z, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _rank2d_kernel, g=g, th=float(cfg.patch_threshold),
        bg=float(cfg.bg_th), int_counter=bool(cfg.rank_int_counter))

    acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=agl_specs + agr_specs + s_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((g.ZS, V, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((V, W), jnp.float32),
            pltpu.VMEM((V, p, V, W), jnp.float32),
            pltpu.VMEM((V, p, V, W), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(AGLt, AGLt, AGLt,
      AGRsk, AGRsk, AGRsk, AGRsk, AGRsk, AGRsk, AGRsk, AGRsk,
      S_fold, S_fold, S_fold)

    acc2 = acc.reshape(g.ZS * V, W)[:g.H]
    return _rank_epilogue_2d(acc2, affs, cfg, g, overlap, center_valid)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def rank_scores_fold_pallas_2d(affs: jnp.ndarray, S_fold: jnp.ndarray,
                               cfg: ConsensusConfig,
                               overlap: jnp.ndarray | None = None,
                               center_valid: jnp.ndarray | None = None,
                               interpret: bool = False) -> jnp.ndarray:
    """Per-voxel rank scores from the FOLD-layout symmetrized consensus
    (consensus_fold_pallas_2d output).  Returns (1, H, W) f32 with the
    exact rank_epilogue gating/sentinels."""
    return _rank2d_call(affs, S_fold, cfg, overlap, center_valid,
                        interpret)


@functools.partial(jax.jit, donate_argnums=(1,),
                   static_argnames=("cfg", "interpret"))
def rank_and_unfold_pallas_2d(affs: jnp.ndarray, S_fold: jnp.ndarray,
                              cfg: ConsensusConfig,
                              overlap: jnp.ndarray | None = None,
                              center_valid: jnp.ndarray | None = None,
                              interpret: bool = False):
    """Rank kernel + symmetrized unfold in one jit with the fold array
    DONATED: at BBBC010 scale the fold layout is ~4.6 GB and this is its
    last consumer, so the buffer is reusable for the unfolded output."""
    scores = _rank2d_call(affs, S_fold, cfg, overlap, center_valid,
                          interpret)
    cons = unfold_consensus(S_fold, cfg, affs.shape[1:])
    return scores, cons


def _rank_epilogue_2d(acc2, affs, cfg: ConsensusConfig, g: Geom2D,
                      overlap, center_valid):
    """rank_epilogue (consensus_jax.py) without materializing the
    (P, vol) mask stacks: n_tgt is a separable box filter of tgt_ok
    gated by center_ok; n_hi contracts the (affs > th) stack against
    shifted tgt planes (rankPatches.cu:139 fgCnt closed form)."""
    p, rad, H, W = g.p, g.rad, g.H, g.W
    th = cfg.patch_threshold
    affs2 = affs.reshape(affs.shape[0], H, W).astype(jnp.float32)
    fg = affs2[cfg.mid] > th
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = ((ii >= rad) & (ii < H - rad)
                & (jj >= rad) & (jj < W - rad))
    center_ok = fg & interior
    if center_valid is not None:
        center_ok = center_ok & center_valid.reshape(H, W)

    tgt_ok = fg
    if cfg.overlapping_inst and overlap is not None:
        tgt_ok = tgt_ok & jnp.logical_not(
            overlap.reshape(H, W).astype(bool))
    tf = tgt_ok.astype(jnp.float32)

    # n_tgt[c] = center_ok * box_p(tgt_ok)(c)
    pad_t = jnp.pad(tf, [(rad, rad), (rad, rad)])
    box = jax.lax.conv_general_dilated(
        pad_t[None, None], jnp.ones((1, 1, p, p), jnp.float32),
        (1, 1), "VALID")[0, 0]
    n_tgt = jnp.where(center_ok, box, 0.0)

    # n_hi[c] = center_ok * sum_q (affs[q][c] > th) * tgt_ok[c+off_q-rad]
    offs2 = patch_offsets(np.array([p, p])) - rad
    tstack = jax.vmap(lambda s: _shift_nd(tf, -s, (0, 1)))(
        jnp.asarray(offs2, jnp.int32))      # T[q][c] = tf[c + off - rad]
    n_hi = jnp.einsum("pij,pij->ij",
                      (affs2 > th).astype(jnp.float32), tstack)
    n_hi = jnp.where(center_ok, n_hi, 0.0)

    fg_cnt = n_hi * (n_tgt - 1.0) - n_hi * (n_hi - 1.0) / 2.0
    sentinel = -1.0 if cfg.norm_rank else -9999999.0
    score = acc2 / jnp.maximum(1.0, fg_cnt) if cfg.norm_rank else acc2
    out = jnp.where(center_ok, score, sentinel).astype(jnp.float32)
    return out.reshape(1, H, W)
