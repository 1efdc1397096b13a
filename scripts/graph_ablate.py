"""Ablation timings for the patch-graph segment loop at 50^3/7^3.

Variants of ``_patch_graph_weights_jit`` with stages disabled or
reformulated, to locate the cost and validate the prefix-sum
intersection correction before it lands in the real path.
Run solo on the real chip.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "data/JRC_SS05008-20160318_24_B2_crop.zarr"


def main():
    import jax
    import jax.numpy as jnp

    import patchperpix_tpu.assembly.vote_instances as vi
    import patchperpix_tpu.ops.consensus_jax as cj
    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
    from patchperpix_tpu.ops.synthetic import labels_to_affinities_multi
    from patchperpix_tpu.utils import io as vio

    labels = vio.IoZarr(FIXTURE).read(
        key="volumes/gt_instances").astype(np.int32)
    ps = (7, 7, 7)
    affs = labels_to_affinities_multi(labels, np.array(ps))
    numinst = np.sum(labels > 0, axis=0).astype(np.uint8)
    fg = numinst > 0
    affs_dev = jax.device_put(jnp.asarray(affs))

    captured = {}
    orig = cj.patch_graph_weights

    def capture(affs_a, cons_sym, pairs, cfg, **kw):
        captured.update(affs=affs_a, cons=cons_sym, pairs=pairs, cfg=cfg)
        return orig(affs_a, cons_sym, pairs, cfg, **kw)

    vi.patch_graph_weights = capture
    params = VoteInstancesParams(
        patchshape=ps, engine="pallas", overlapping_inst=True,
        mws=True, select_patches_for_sparse_data=True)
    inst, _ = to_instance_seg(affs_dev, fg, fg.copy(), numinst, params)
    np.asarray(inst)
    A, C, PAIRS, CFG = (captured["affs"], captured["cons"],
                        captured["pairs"], captured["cfg"])

    # host prep identical to patch_graph_weights
    ndim = len(CFG.ps)
    psn = np.asarray(CFG.ps)
    group = 64
    pairs = np.asarray(PAIRS).astype(np.int64)
    n_pairs = len(pairs)
    flat = np.concatenate([pairs[:, :ndim], pairs[:, ndim:]], axis=0)
    centers, inv = np.unique(flat, axis=0, return_inverse=True)
    id_pairs = np.stack([inv[:n_pairs], inv[n_pairs:]], axis=1)
    dc = centers[id_pairs[:, 1]] - centers[id_pairs[:, 0]]
    near = np.all(np.abs(dc) <= 2 * (psn - 1)[None, :], axis=1)
    near_idx = np.nonzero(near)[0]
    cnt = np.bincount(id_pairs[near_idx].ravel(), minlength=len(centers))
    a_e = id_pairs[near_idx, 0]
    b_e = id_pairs[near_idx, 1]
    swap = cnt[b_e] > cnt[a_e]
    p_first = np.where(swap, b_e, a_e)
    p_second = np.where(swap, a_e, b_e)
    sort = np.argsort(p_first, kind="stable")
    order = near_idx[sort]
    p_first, p_second = p_first[sort], p_second[sort]
    firsts, seg_starts = np.unique(p_first, return_index=True)
    seg_first, seg_partner, seg_valid, seg_out = [], [], [], []
    bounds = list(seg_starts) + [len(order)]
    for fi, f in enumerate(firsts):
        lo, hi = bounds[fi], bounds[fi + 1]
        for s in range(lo, hi, group):
            stop = min(s + group, hi)
            chunk = order[s:stop]
            partners = p_second[s:stop]
            pad = group - len(chunk)
            seg_first.append(f)
            seg_partner.append(np.pad(partners, (0, pad)))
            seg_valid.append(np.pad(np.ones(len(chunk), bool), (0, pad)))
            seg_out.append(np.pad(chunk, (0, pad)))
    n_seg = len(seg_first)
    n_seg_pad = -(-n_seg // 8) * 8
    for _ in range(n_seg_pad - n_seg):
        seg_first.append(0)
        seg_partner.append(np.zeros(group, np.int64))
        seg_valid.append(np.zeros(group, bool))
        seg_out.append(np.zeros(group, np.int64))
    vol_shape = np.asarray(A.shape[1:])
    strides = tuple(int(np.prod(vol_shape[i + 1:])) for i in range(ndim))
    cnt_panel = cj._pair_count_panel(tuple(int(p) for p in psn), strides)
    SEGF = jnp.asarray(np.asarray(seg_first), jnp.int32)
    SEGP = jnp.asarray(np.stack(seg_partner), jnp.int32)
    SEGV = jnp.asarray(np.stack(seg_valid))
    CENT = jnp.asarray(centers, jnp.int32)
    print(f"segments: {len(seg_first)}  pairs: {n_pairs}", flush=True)

    cfg = CFG
    P = cfg.P
    ps_t = cfg.ps
    rad = cfg.rad
    th = cfg.patch_threshold
    offs, _ = cj._graph_gather_tables(cfg)
    offs_j = jnp.asarray(offs, jnp.int32)
    rad_j = jnp.asarray(rad, jnp.int32)
    neigh = cfg.neigh
    n_off = int(np.prod(neigh))
    blk_sp = tuple(int(p) for p in ps_t)
    E_sp = tuple(int(5 * p - 4) for p in ps_t)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def variant(affs, cons_sym, centers, seg_first, seg_partner, seg_valid,
                cnt_panel, mode):
        fgm = (affs[cfg.mid] > th).astype(jnp.float32)
        fg_pad = jnp.pad(fgm, [(int(r), int(r)) for r in rad])
        cons_sp_pad = jnp.pad(
            cons_sym.reshape((n_off,) + tuple(int(v) for v in vol_shape)),
            [(0, 0)] + [(int(r), int(r)) for r in rad])
        cnt_flat = cnt_panel.reshape(P, -1).astype(jnp.float32)
        # static prefix (P+1, E^3) of the count table over p1 boxes:
        # cum over the three p1 axes, flattened with a leading zero row
        cnt_cube = cnt_panel.astype(jnp.float32).reshape(blk_sp + E_sp)
        for ax in range(ndim):
            cnt_cube = jnp.cumsum(cnt_cube, axis=ax)
        hp = jax.lax.Precision.HIGHEST

        def per_patch_hi(c):
            c = c.astype(jnp.int32)
            v = affs[(slice(None),) + tuple(c[k] for k in range(ndim))]
            win = jax.lax.dynamic_slice(
                fg_pad, tuple(c[k] for k in range(ndim)), blk_sp)
            return (v > th) * win.reshape(-1)

        HIs = jax.lax.map(per_patch_hi, centers.astype(jnp.int32),
                          batch_size=32)

        def one_segment(seg):
            i, partners, valid = seg
            c1 = centers[i].astype(jnp.int32)
            pb = jax.lax.dynamic_slice(
                cons_sp_pad, (0,) + tuple(c1[k] for k in range(ndim)),
                (n_off,) + blk_sp).astype(jnp.float32).reshape(
                    tuple(int(v) for v in neigh) + blk_sp)
            hi1 = HIs[i]
            dcs = centers[partners].astype(jnp.int32) - c1[None]
            hi2 = HIs[partners]

            if mode == "noskew":
                panel = jnp.zeros((P, int(np.prod(E_sp))), jnp.float32)
                panel = panel + pb.sum() * 0  # keep pb live
            else:
                panel = cj._skew_panel(pb, psn, np.asarray(neigh)).reshape(
                    P, -1)

            field = jnp.matmul(hi1, panel, precision=hp).reshape(E_sp)
            cnt_field = jnp.matmul(hi1, cnt_flat, precision=hp).reshape(E_sp)

            if mode == "fieldonly":
                return field.sum() + cnt_field.sum() + hi2.sum() * 0.0

            if mode in ("corr_matmul",):
                box_a = jnp.all(jnp.abs(offs_j[None] - rad_j - dcs[:, None])
                                <= rad_j, axis=-1)
                box_b = jnp.all(jnp.abs(offs_j[None] - rad_j + dcs[:, None])
                                <= rad_j, axis=-1)
                mh1 = hi1[None, :] * box_a
                corr = jnp.matmul(mh1, panel).reshape((-1,) + E_sp)
                corr_cnt = jnp.matmul(mh1, cnt_flat).reshape((-1,) + E_sp)
            elif mode == "corr_prefix":
                box_b = jnp.all(jnp.abs(offs_j[None] - rad_j + dcs[:, None])
                                <= rad_j, axis=-1)
                # prefix over p1 axes of hi1-weighted panel
                wp = (hi1[:, None] * panel).reshape(blk_sp + E_sp)
                for ax in range(ndim):
                    wp = jnp.cumsum(wp, axis=ax)
            else:
                box_b = corr = corr_cnt = None

            def one_pair(j, ok, dc, h2, bb, extra):
                start = tuple(dc[k] + 2 * (int(ps_t[k]) - 1)
                              for k in range(ndim))
                sl = jax.lax.dynamic_slice(field, start, blk_sp).reshape(-1)
                csl = jax.lax.dynamic_slice(cnt_field, start,
                                            blk_sp).reshape(-1)
                acc = jnp.dot(h2, sl, precision=hp)
                fg_cnt = jnp.dot(h2, csl, precision=hp)
                if mode == "corr_matmul":
                    cf, ccf = extra
                    h2b = h2 * bb
                    cfs = jax.lax.dynamic_slice(cf, start,
                                                blk_sp).reshape(-1)
                    ccfs = jax.lax.dynamic_slice(ccf, start,
                                                 blk_sp).reshape(-1)
                    acc = acc - 0.8 * jnp.dot(h2b, cfs)
                    fg_cnt = fg_cnt - 0.8 * jnp.dot(h2b, ccfs)
                elif mode == "corr_prefix":
                    wp_c, = extra
                    h2b = h2 * bb
                    # p1 box: off(p1) in [max(dc,0), min(ps-1, dc+2*rad)]
                    lo = jnp.maximum(dc, 0)
                    hi_ = jnp.minimum(jnp.asarray(
                        [int(p) - 1 for p in ps_t]), dc + 2 * rad_j)
                    empty = jnp.any(hi_ < lo)
                    # inclusion-exclusion over 8 corners on the cum array:
                    # box_sum = sum_{s in {0,1}^3} (-1)^(sum s)
                    #           * C[hi - s*(hi-lo+1)] with C[-1] = 0
                    g = jnp.zeros((int(np.prod(blk_sp)),), jnp.float32)
                    gc = jnp.zeros((int(np.prod(blk_sp)),), jnp.float32)
                    for sbits in range(8):
                        sv = jnp.asarray([(sbits >> k) & 1
                                          for k in range(ndim)], jnp.int32)
                        idx = hi_ - sv * (hi_ - lo + 1)
                        oob = jnp.any(idx < 0)
                        idx_c = jnp.maximum(idx, 0)
                        sgn = jnp.where(oob, 0.0,
                                        jnp.where(jnp.sum(sv) % 2 == 0,
                                                  1.0, -1.0))
                        row = jax.lax.dynamic_slice(
                            wp_c, tuple(idx_c[k] for k in range(ndim))
                            + start, (1, 1, 1) + blk_sp).reshape(-1)
                        crow = jax.lax.dynamic_slice(
                            cnt_cube, tuple(idx_c[k] for k in range(ndim))
                            + start, (1, 1, 1) + blk_sp).reshape(-1)
                        g = g + sgn * row
                        gc = gc + sgn * crow
                    g = jnp.where(empty, 0.0, 1.0) * g
                    gc = jnp.where(empty, 0.0, 1.0) * gc
                    acc = acc - 0.8 * jnp.dot(h2b, g)
                    fg_cnt = fg_cnt - 0.8 * jnp.dot(h2b, gc)
                w = acc / jnp.maximum(1.0, fg_cnt) if cfg.norm_graph else acc
                return jnp.where(ok, w, 0.0)

            if mode == "corr_matmul":
                return jax.vmap(
                    lambda j, ok, dc, h2, bb, cf, ccf: one_pair(
                        j, ok, dc, h2, bb, (cf, ccf)))(
                            partners, valid, dcs, hi2, box_b,
                            corr, corr_cnt)
            if mode == "corr_prefix":
                return jax.vmap(
                    lambda j, ok, dc, h2, bb: one_pair(
                        j, ok, dc, h2, bb, (wp,)))(
                            partners, valid, dcs, hi2, box_b)
            return jax.vmap(
                lambda j, ok, dc, h2: one_pair(j, ok, dc, h2, None,
                                               None))(partners, valid,
                                                      dcs, hi2)

        return jax.lax.map(one_segment, (seg_first, seg_partner, seg_valid))

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    def timeit(label, fn, n=3):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            sync(fn())
            ts.append(time.perf_counter() - t0)
        print(f"{label:40s} {min(ts)*1e3:8.1f} ms", flush=True)

    args = (A, C, CENT, SEGF, SEGP, SEGV, cnt_panel)
    ref = np.asarray(cj._patch_graph_weights_jit(
        A, C, CENT, SEGF, SEGP, SEGV, cnt_panel, cfg,
        n_unique=len(centers), group=group, seed=0,
        drop_intersection=True))
    got = np.asarray(variant(*args, mode="corr_prefix"))
    err = np.max(np.abs(ref - got))
    print(f"corr_prefix max |err| vs committed: {err:.2e}", flush=True)

    timeit("committed (corr matmul)",
           lambda: variant(*args, mode="corr_matmul"))
    timeit("corr_prefix", lambda: variant(*args, mode="corr_prefix"))
    timeit("base (no corr)", lambda: variant(*args, mode="base"))
    timeit("fieldonly (no pair loop)",
           lambda: variant(*args, mode="fieldonly"))
    timeit("noskew (zero panel)", lambda: variant(*args, mode="noskew"))


if __name__ == "__main__":
    main()
