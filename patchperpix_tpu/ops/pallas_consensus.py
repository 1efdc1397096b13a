"""Pallas TPU kernel for the consensus vote array.

Computes the same array as ops/consensus_jax.consensus_array via the
*banded autocorrelation* identity on target-aligned stacks:

    cons[d][x] = sum_q w( G[q][x], G[q+d][x+d] )

where G[q][x] = affs[q][x - (q - rad)] re-aligns every patch channel to the
pixel it points at.  Each grid cell (z, dz, qz) accumulates one
(dy, dx)-layer of the consensus for one z slice: left channel planes
(qz, *, *) multiply rolled right channel planes (qz+dz, *, *), with the
in-plane displacement (dy, dx) realized as a lane-roll over the
zero-padded flattened (y, x) plane (wrapped lanes land in the pad region,
so the roll doubles as the zero-fill shift).

The XLA scan formulation pays ~343 read-modify-writes of the full
consensus; here every consensus element is written once and all operands
stream HBM -> VMEM once per cell.
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


def pallas_supported(cfg: ConsensusConfig) -> bool:
    """True when the kernel is safe for this patchshape (see KNOWN LIMIT)."""
    ps = np.asarray(cfg.ps)
    return len(ps) == 3 and int(ps[1]) <= 5 and int(ps[2]) <= 5


def _target_align_pad(stack: jnp.ndarray, ps: np.ndarray, pad: int):
    """(P, Z, Y, X) center-aligned -> (psz, psy, psx, Z+2p, (Y+2p)*(X+2p))
    target-aligned, spatially zero-padded and (y, x)-flattened."""
    P, Z, Y, X = stack.shape
    rad = ps // 2
    offs = patch_offsets(ps)
    padded = jnp.pad(stack, [(0, 0)] + [(pad, pad)] * 3)
    out = []
    for q in range(P):
        s = offs[q] - rad
        # out[x] = padded[q][x - s] (static shift, zero fill via the pad)
        sl = tuple(slice(pad - int(si), pad - int(si) + dim)
                   for si, dim in zip(s, (Z + 2 * pad, Y + 2 * pad,
                                          X + 2 * pad)))
        big = jnp.pad(padded[q], [(pad, pad)] * 3)[sl]
        out.append(big)
    G = jnp.stack(out, 0)
    lanes = (Y + 2 * pad) * (X + 2 * pad)
    lanes_al = -(-lanes // 128) * 128
    G = G.reshape(tuple(int(p) for p in ps) + (Z + 2 * pad, lanes))
    # align the lane dim to 128 (tpu.dynamic_rotate requirement); the tail
    # zeros are never read for in-plane shifts (they sit beyond the pad
    # rows) and only feed zero wraps
    G = jnp.pad(G, [(0, 0)] * 4 + [(0, lanes_al - lanes)])
    # (psz, psy, psx, Zp, lanes) -> (psz, Zp, psy, psx, lanes): the last two
    # block dims must equal the array dims for Mosaic
    return jnp.transpose(G, (0, 3, 1, 2, 4))


def _kernel(a_l, b_l, hi_l, lo_l, a_r, b_r, hi_r, lo_r,
            cons_ref, cnt_ref, a_s, b_s, hi_s, lo_s,
            *, ps, pad, plane_w, th, weight_mode, dyx_chunk):
    psz, psy, psx = ps
    dz = pl.program_id(1)
    dyx_c = pl.program_id(2)
    qz = pl.program_id(3)
    qz2 = qz + dz - (psz - 1)

    @pl.when(qz == 0)
    def _init():
        cons_ref[...] = jnp.zeros_like(cons_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    valid_z = (qz2 >= 0) & (qz2 < psz)

    @pl.when(valid_z)
    def _compute():
        lanes = a_l.shape[-1]
        nq = psy * psx
        # pad rows to a sublane multiple: tpu.dynamic_rotate miscompiles on
        # some non-8-multiple row counts (observed at 49 rows)
        nq_pad = -(-nq // 8) * 8
        zrows = jnp.zeros((nq_pad - nq, lanes), jnp.float32)

        def padded(x):
            return jnp.concatenate([x.reshape(nq, lanes), zrows], axis=0)

        A_r0 = padded(a_r[0, 0])
        B_r0 = padded(b_r[0, 0])
        HI_r0 = padded(hi_r[0, 0])
        LO_r0 = padded(lo_r[0, 0])

        def d_body(k, _):
            dyx = dyx_c * dyx_chunk + k
            dy = dyx // (2 * psx - 1) - (psy - 1)
            dx = dyx % (2 * psx - 1) - (psx - 1)
            # total offset 0 would pair a patch pixel with itself
            # (po1 == po2, excluded by the reference kernel)
            self_pair = (qz2 == qz) & (dy == 0) & (dx == 0)
            shift = dy * plane_w + dx
            # roll so that R[x] becomes R[x + shift]; wrapped lanes land in
            # the zero pad.  Rolled planes go through scratch so the q loop
            # can index them dynamically (Mosaic: dynamic indexing is a ref
            # operation).
            a_s[...] = pltpu.roll(A_r0, -shift, 1)
            b_s[...] = pltpu.roll(B_r0, -shift, 1)
            hi_s[...] = pltpu.roll(HI_r0, -shift, 1)
            lo_s[...] = pltpu.roll(LO_r0, -shift, 1)

            def q_body(qyx, accs):
                acc_c, acc_n = accs
                qy = qyx // psx
                qx = qyx % psx
                q2y = qy + dy
                q2x = qx + dx
                ok = ((q2y >= 0) & (q2y < psy) & (q2x >= 0) & (q2x < psx)
                      & jnp.logical_not(self_pair))
                q2yc = jnp.clip(q2y, 0, psy - 1)
                q2xc = jnp.clip(q2x, 0, psx - 1)
                j = q2yc * psx + q2xc

                al = a_l[0, 0, qy, qx, :]
                bl = b_l[0, 0, qy, qx, :]
                hl = hi_l[0, 0, qy, qx, :]
                ll = lo_l[0, 0, qy, qx, :]
                ar = a_s[j, :]
                br = b_s[j, :]
                hr = hi_s[j, :]
                lr = lo_s[j, :]
                g = ok.astype(jnp.float32)
                pp = al * (ar - br) - bl * ar
                sc = hl * (hr - lr) - ll * hr
                if weight_mode == "norm_prob_product":
                    contrib = (pp - th * th * sc) / (1.0 - th * th)
                elif weight_mode == "prob_product":
                    contrib = pp
                else:
                    contrib = sc
                cnt = hl * (hr + lr) + ll * hr
                return acc_c + g * contrib, acc_n + g * cnt

            acc0 = jnp.zeros((lanes,), jnp.float32)
            acc_c, acc_n = jax.lax.fori_loop(0, nq, q_body, (acc0, acc0))
            cons_ref[0, 0, 0, k, :] += acc_c
            cnt_ref[0, 0, 0, k, :] += acc_n
            return ()

        jax.lax.fori_loop(0, dyx_chunk, d_body, ())


@functools.partial(jax.jit, static_argnames=("cfg", "with_counts"))
def consensus_array_pallas(affs: jnp.ndarray, cfg: ConsensusConfig,
                           overlap: jnp.ndarray | None = None,
                           with_counts: bool = False,
                           center_valid: jnp.ndarray | None = None):
    """Consensus via the Pallas kernel (3D patchshapes).

    KNOWN LIMIT: in-plane patch extents must be <= 5 - larger extents
    produce lane rotates > 128 that miscompile/fault in current Mosaic
    (tpu.dynamic_rotate); callers should fall back to consensus_array +
    symmetrize_consensus (pallas_supported() checks this).

    Returns the SYMMETRIZED consensus (both pair orientations populated,
    cons[d][x] == cons[-d][x+d]); the canonical lex-positive half is
    bit-identical to ``consensus_array``, and ``symmetrize_consensus`` of
    that equals this output.  Downstream: ranking reads only canonical
    entries (identical values) and the patch graph consumes the symmetric
    array directly, so the separate symmetrize pass disappears.
    """
    ps = np.asarray(cfg.ps)
    assert len(ps) == 3, "pallas consensus expects 3D (use 1 for flat axes)"
    psz, psy, psx = (int(p) for p in ps)
    P = cfg.P
    Z, Y, X = affs.shape[1:]
    pad = max(int(ps.max()) - 1, 1)
    plane_w = X + 2 * pad
    lanes_real = (Y + 2 * pad) * plane_w
    lanes = -(-lanes_real // 128) * 128
    Zp = Z + 2 * pad
    neigh = cfg.neigh
    n_dyx = int(neigh[1] * neigh[2])

    hi, lo, _ = _masks(affs, cfg, overlap, center_valid)
    a = affs * hi
    b = (1.0 - affs) * lo
    A = _target_align_pad(a, ps, pad)
    B = _target_align_pad(b, ps, pad)
    HI = _target_align_pad(hi, ps, pad)
    LO = _target_align_pad(lo, ps, pad)

    dyx_chunk = int(neigh[2])          # one dy row of offsets per cell
    n_dyx_chunks = n_dyx // dyx_chunk
    grid = (Z, int(neigh[0]), n_dyx_chunks, psz)

    def left_map(z, dz, dyx_c, qz):
        return (qz, z + pad, 0, 0, 0)

    def right_map(z, dz, dyx_c, qz):
        qz2 = jnp.clip(qz + dz - (psz - 1), 0, psz - 1)
        return (qz2, z + pad + dz - (psz - 1), 0, 0, 0)

    def out_map(z, dz, dyx_c, qz):
        return (z, dz, dyx_c, 0, 0)

    in_block = pl.BlockSpec((1, 1, psy, psx, lanes), left_map,
                            memory_space=pltpu.VMEM)
    in_block_r = pl.BlockSpec((1, 1, psy, psx, lanes), right_map,
                              memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, 1, 1, dyx_chunk, lanes), out_map,
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, ps=(psz, psy, psx), pad=pad, plane_w=plane_w,
        th=float(cfg.patch_threshold), weight_mode=cfg.weight_mode,
        dyx_chunk=dyx_chunk)

    out_shape = [
        jax.ShapeDtypeStruct((Z, int(neigh[0]), n_dyx_chunks, dyx_chunk,
                              lanes), jnp.float32),
        jax.ShapeDtypeStruct((Z, int(neigh[0]), n_dyx_chunks, dyx_chunk,
                              lanes), jnp.float32),
    ]
    cons_r, cnt_r = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_block, in_block, in_block, in_block,
                  in_block_r, in_block_r, in_block_r, in_block_r],
        out_specs=[out_block, out_block],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((-(-(psy * psx) // 8) * 8, lanes), jnp.float32)
            for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(A, B, HI, LO, A, B, HI, LO)

    # (Z, ndz, n_dyx, 1, lanes) -> (*neigh, Z, Y, X): unflatten the padded
    # plane and crop
    def finish(t):
        t = t.reshape(Z, int(neigh[0]), n_dyx, lanes)[..., :lanes_real]
        t = t.reshape(Z, int(neigh[0]), n_dyx, Y + 2 * pad, plane_w)
        t = t[:, :, :, pad:pad + Y, pad:pad + X]
        t = jnp.moveaxis(t, 0, 2)          # (ndz, n_dyx, Z, Y, X)
        return t.reshape(int(neigh[0]), int(neigh[1]), int(neigh[2]),
                         Z, Y, X)

    cons = finish(cons_r)
    cnt = finish(cnt_r)

    if cfg.norm_aff:
        cons = jnp.where(cnt != 0, cons / jnp.maximum(cnt, 1e-30), cons)
    if with_counts:
        return cons, cnt
    return cons
