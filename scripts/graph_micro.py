"""Micro-profile of the patch-graph weight stage at 50^3/7^3.

Captures the exact arguments the assembly driver passes to
``patch_graph_weights`` on the fixture crop, then times variants
(group size, drop_intersection, host-prep vs device) to locate where
the ~1.2 s goes.  Run solo on the real chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "data/JRC_SS05008-20160318_24_B2_crop.zarr"


def sync(x):
    import jax.numpy as jnp
    return float(np.asarray(jnp.sum(x)))


def main():
    import jax
    import jax.numpy as jnp

    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
    import patchperpix_tpu.assembly.vote_instances as vi
    import patchperpix_tpu.ops.consensus_jax as cj
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
        captured.update(affs=affs_a, cons=cons_sym, pairs=pairs, cfg=cfg,
                        kw=kw)
        return orig(affs_a, cons_sym, pairs, cfg, **kw)

    vi.patch_graph_weights = capture
    params = VoteInstancesParams(
        patchshape=ps, engine="pallas", overlapping_inst=True,
        mws=True, select_patches_for_sparse_data=True)
    t0 = time.perf_counter()
    inst, _ = to_instance_seg(affs_dev, fg, fg.copy(), numinst, params)
    np.asarray(inst)
    print(f"pipeline warmup: {time.perf_counter() - t0:.2f}s", flush=True)

    A, C, PAIRS, CFG = (captured["affs"], captured["cons"],
                        captured["pairs"], captured["cfg"])
    KW = captured["kw"]
    print(f"pairs: {len(PAIRS)}  cons dtype: {C.dtype}  kw: {KW}",
          flush=True)

    def timeit(label, fn, n=3):
        fn()  # warmup/compile
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            if hasattr(r, "block_until_ready"):
                sync(r)
            ts.append(time.perf_counter() - t0)
        print(f"{label:48s} {min(ts)*1e3:8.1f} ms", flush=True)
        return min(ts)

    # full call (host prep + device) at several group sizes
    for g in (64, 128, 256, 512):
        timeit(f"patch_graph_weights group={g}",
               lambda g=g: np.asarray(orig(A, C, PAIRS, CFG, group=g, **{
                   k: v for k, v in KW.items() if k != "group"})))

    timeit("patch_graph_weights drop_intersection=False",
           lambda: np.asarray(orig(A, C, PAIRS, CFG, group=64,
                                   seed=KW.get("seed", 0),
                                   drop_intersection=False)))

    # isolate host prep: run the grouping up to the jit call
    def host_prep(group=64):
        ndim = len(CFG.ps)
        psn = np.asarray(CFG.ps)
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
        return centers, seg_first, seg_partner, seg_valid

    centers, seg_first, seg_partner, seg_valid = host_prep()
    print(f"unique centers: {len(centers)}  segments(g=64): "
          f"{len(seg_first)}", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        host_prep()
    print(f"host prep: {(time.perf_counter() - t0) / 5 * 1e3:.1f} ms",
          flush=True)

    # device-only: jit fn with pre-staged args
    n_seg = len(seg_first)
    n_seg_pad = -(-n_seg // 8) * 8
    group = 64
    for _ in range(n_seg_pad - n_seg):
        seg_first.append(0)
        seg_partner.append(np.zeros(group, np.int64))
        seg_valid.append(np.zeros(group, bool))
    vol_shape = np.asarray(A.shape[1:])
    ndim = len(CFG.ps)
    strides = tuple(int(np.prod(vol_shape[i + 1:])) for i in range(ndim))
    cnt_panel = cj._pair_count_panel(tuple(int(p) for p in CFG.ps), strides)
    dev_args = (A, C, jnp.asarray(centers, jnp.int32),
                jnp.asarray(np.asarray(seg_first), jnp.int32),
                jnp.asarray(np.stack(seg_partner), jnp.int32),
                jnp.asarray(np.stack(seg_valid)), cnt_panel)

    def dev_call(drop=True):
        return cj._patch_graph_weights_jit(
            *dev_args, CFG, n_unique=len(centers), group=group,
            seed=0, drop_intersection=drop)

    timeit("device-only jit (drop_intersection=True)",
           lambda: dev_call(True))
    timeit("device-only jit (drop_intersection=False)",
           lambda: dev_call(False))


if __name__ == "__main__":
    main()
