"""Micro: per-segment window slice + skew + field-matvec variants.

The graph-weights ablation (PROFILE.md) puts ~300 ms of the stage in
skew+matvec and ~244 ms in slice+framework at 50^3/7^3 (536 segments).
Variants:

  a. committed: channel-first slice (n_off,7,7,7) + _skew_panel
     (3 transposes via pad+reshape shear) + f32 matvec
  b. channel-last consensus layout: slice (7,7,7,n_off) (contiguous
     8.8 KB rows) + adapted skew (p-axes already leading)
  c. dot-shear: shear each axis with a one-hot (p,d,e) bf16 table via
     einsum (MXU shifts instead of VPU shuffles), channel-first slice
  d. committed slice, but skew+matvec in bf16 (halves shuffle traffic)

Run solo on the real chip: python scripts/skew_micro.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import patchperpix_tpu.ops.consensus_jax as cj

    ps = np.array([7, 7, 7])
    neigh = 2 * ps - 1
    n_off = int(np.prod(neigh))           # 2197
    P = int(np.prod(ps))                  # 343
    U = tuple(int(3 * p - 2) for p in ps)  # 19^3
    Zp = Yp = Xp = 56
    n_seg = 536
    rng = np.random.default_rng(0)

    cons_cf = jax.device_put(jnp.asarray(
        rng.standard_normal((n_off, Zp, Yp, Xp)).astype(np.float32)))
    cons_cl = jax.jit(lambda x: jnp.moveaxis(x, 0, -1) + 0.0)(cons_cf)
    cons_cl.block_until_ready()
    centers = jnp.asarray(rng.integers(0, 49, size=(n_seg, 3)), jnp.int32)
    HI = jnp.asarray(
        (rng.random((n_seg, P)) > 0.5).astype(np.float32))

    blk = tuple(int(p) for p in ps)
    hp = jax.lax.Precision.HIGHEST

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    # one-hot shear tables (p, d, e) for variant c
    def shear_tables(dtype):
        tabs = []
        for ax in range(3):
            pm, dm, em = int(ps[ax]), int(neigh[ax]), int(U[ax])
            t = np.zeros((pm, dm, em), np.float32)
            for p in range(pm):
                for d in range(dm):
                    t[p, d, p + d] = 1.0
            tabs.append(jnp.asarray(t, dtype))
        return tuple(tabs)

    TABS32 = shear_tables(jnp.float32)

    @jax.jit
    def var_a(cons, cs, HIs):
        def one(args):
            c, hi1 = args
            pb = jax.lax.dynamic_slice(
                cons, (0, c[0], c[1], c[2]), (n_off,) + blk).reshape(
                    tuple(int(v) for v in neigh) + blk)
            panel = cj._skew_panel(pb, ps, neigh).reshape(P, -1)
            return jnp.matmul(hi1, panel, precision=hp)
        return jax.lax.map(one, (cs, HIs))

    @jax.jit
    def var_b(cons, cs, HIs):
        def one(args):
            c, hi1 = args
            pb = jax.lax.dynamic_slice(
                cons, (c[0], c[1], c[2], 0), blk + (n_off,)).reshape(
                    blk + tuple(int(v) for v in neigh))
            # p-axes leading: skew pairs (ax, 3+ax); reuse _skew_panel's
            # shear on transposed-axis layout
            out = pb
            for ax in range(3):
                n_rows = int(ps[ax])
                n_cols = out.shape[3 + ax]
                perm = [a for a in range(6) if a not in (ax, 3 + ax)]
                perm += [ax, 3 + ax]
                t = jnp.transpose(out, perm)
                lead = t.shape[:-2]
                width = n_cols + n_rows
                ext = n_cols + n_rows - 1
                t = jnp.pad(t, [(0, 0)] * len(lead) + [(0, 0), (0, n_rows)])
                t = t.reshape(lead + (n_rows * width,))[..., :n_rows * ext]
                t = t.reshape(lead + (n_rows, ext))
                inv = np.argsort(perm)
                out = jnp.transpose(t, inv)
            panel = out.reshape(P, -1)
            return jnp.matmul(hi1, panel, precision=hp)
        return jax.lax.map(one, (cs, HIs))

    # dot-shear: axis k pairs d-axis k with p-axis k; shears keep the
    # p axes, hi1 contracts at the end
    @jax.jit
    def var_c2(cons, cs, HIs):
        def one_keep(args):
            c, hi1 = args
            pb = jax.lax.dynamic_slice(
                cons, (0, c[0], c[1], c[2]), (n_off,) + blk).reshape(
                    tuple(int(v) for v in neigh) + blk)
            t = jnp.einsum('abcdef,daZ->bcdefZ', pb, TABS32[0],
                           precision=hp)
            t = jnp.einsum('bcdefZ,ebY->cdefZY', t, TABS32[1],
                           precision=hp)
            t = jnp.einsum('cdefZY,fcX->defZYX', t, TABS32[2],
                           precision=hp)
            return jnp.einsum('defZYX,def->ZYX'.replace('def', 'def'),
                              t, hi1.reshape(blk), precision=hp)
        return jax.lax.map(one_keep, (cs, HIs))

    @jax.jit
    def var_d(cons, cs, HIs):
        def one(args):
            c, hi1 = args
            pb = jax.lax.dynamic_slice(
                cons, (0, c[0], c[1], c[2]), (n_off,) + blk).astype(
                    jnp.bfloat16).reshape(
                    tuple(int(v) for v in neigh) + blk)
            panel = cj._skew_panel(pb, ps, neigh).reshape(P, -1)
            return jnp.matmul(hi1.astype(jnp.bfloat16), panel,
                              preferred_element_type=jnp.float32)
        return jax.lax.map(one, (cs, HIs))

    def timeit(label, fn, *a, n=3):
        t0 = time.perf_counter()
        sync(fn(*a))
        print(f"{label:24s} compile+run {time.perf_counter()-t0:6.1f} s",
              flush=True)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        print(f"{label:24s} {min(ts)*1e3:8.1f} ms", flush=True)

    # correctness cross-check a vs b vs c2 on a few segments
    fa = np.asarray(var_a(cons_cf, centers[:8], HI[:8]))
    fb = np.asarray(var_b(cons_cl, centers[:8], HI[:8]))
    fc = np.asarray(var_c2(cons_cf, centers[:8], HI[:8])).reshape(8, -1)
    print("b vs a max err:", np.max(np.abs(fa - fb)),
          " c vs a:", np.max(np.abs(fa - fc)), flush=True)

    timeit("a channel-first+skew", var_a, cons_cf, centers, HI)
    timeit("b channel-last+skew", var_b, cons_cl, centers, HI)
    timeit("c dot-shear", var_c2, cons_cf, centers, HI)
    timeit("d bf16 skew", var_d, cons_cf, centers, HI)


if __name__ == "__main__":
    main()
