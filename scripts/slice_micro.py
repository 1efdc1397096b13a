"""Micro: per-segment consensus window slice cost by layout.

Hypothesis: dynamic_slice of (n_off, 7,7,7) windows from the
(n_off, Z,Y,X) padded consensus is DMA-bound (28-byte rows); a
channel-LAST layout slices (7,7,7, n_off) windows with 8.8 KB rows.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    n_off = 13 ** 3
    Zp = Yp = Xp = 56
    ps = 7
    rng = np.random.default_rng(0)
    cons_cf = jax.device_put(jnp.asarray(
        rng.standard_normal((n_off, Zp, Yp, Xp)).astype(np.float32)))
    cons_cl = jnp.moveaxis(cons_cf, 0, -1)
    cons_cl = jax.device_put(jax.jit(lambda x: x + 0.0)(cons_cl))
    centers = jnp.asarray(
        rng.integers(0, 50, size=(536, 3)).astype(np.int32))

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    @jax.jit
    def slice_cf(cons, cs):
        def one(c):
            w = jax.lax.dynamic_slice(
                cons, (0, c[0], c[1], c[2]), (n_off, ps, ps, ps))
            return w.sum()
        return jax.lax.map(one, cs)

    @jax.jit
    def slice_cl(cons, cs):
        def one(c):
            w = jax.lax.dynamic_slice(
                cons, (c[0], c[1], c[2], 0), (ps, ps, ps, n_off))
            return w.sum()
        return jax.lax.map(one, cs)

    @jax.jit
    def slice_cl_t(cons, cs):
        # channel-last slice + transpose back to (n_off, ps^3)
        def one(c):
            w = jax.lax.dynamic_slice(
                cons, (c[0], c[1], c[2], 0), (ps, ps, ps, n_off))
            return jnp.moveaxis(w.reshape(ps * ps * ps, n_off),
                                -1, 0).sum()
        return jax.lax.map(one, cs)

    @jax.jit
    def slice_cf_wide(cons, cs):
        # channel-first but slicing full-X rows, then static-x subslice
        def one(c):
            w = jax.lax.dynamic_slice(
                cons, (0, c[0], c[1], 0), (n_off, ps, ps, Xp))
            w = jax.lax.dynamic_slice(w, (0, 0, 0, c[2]),
                                      (n_off, ps, ps, ps))
            return w.sum()
        return jax.lax.map(one, cs)

    def timeit(label, fn, *a, n=3):
        fn(*a)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        print(f"{label:32s} {min(ts)*1e3:8.1f} ms", flush=True)

    timeit("channel-first (current)", slice_cf, cons_cf, centers)
    timeit("channel-last", slice_cl, cons_cl, centers)
    timeit("channel-last + transpose", slice_cl_t, cons_cl, centers)
    timeit("channel-first wide-X 2step", slice_cf_wide, cons_cf, centers)


if __name__ == "__main__":
    main()
