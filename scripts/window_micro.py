"""Isolate the patch-graph window-read cost: offset-major vs spatial-major.

The graph stage slices a (n_off, 7,7,7) window per segment from the
padded consensus.  Offset-major layout makes each read 7 contiguous
floats (28 B) x 2197*49 rows; spatial-major makes it n_off contiguous
floats (8.8 KB) x 343 rows.  Run solo on the real chip.
"""

import functools
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    n_off, D = 13 ** 3, 56
    n_seg = 535
    key = jax.random.PRNGKey(0)
    cons_om = jax.jit(lambda k: jax.random.uniform(
        k, (n_off, D, D, D), jnp.float32))(key)
    cons_sm = jax.jit(lambda x: jnp.transpose(x, (1, 2, 3, 0)))(cons_om)
    print("data ready", flush=True)
    starts = jnp.asarray(
        rng.randint(0, D - 7, size=(n_seg, 3)).astype(np.int32))

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    @jax.jit
    def read_om(cons, st):
        def one(c):
            w = jax.lax.dynamic_slice(
                cons, (0, c[0], c[1], c[2]), (n_off, 7, 7, 7))
            return jnp.sum(w)
        return jax.lax.map(one, st)

    @jax.jit
    def read_sm(cons, st):
        def one(c):
            w = jax.lax.dynamic_slice(
                cons, (c[0], c[1], c[2], 0), (7, 7, 7, n_off))
            return jnp.sum(w)
        return jax.lax.map(one, st)

    @jax.jit
    def noop(cons, st):
        def one(c):
            return jnp.sum(c)
        return jax.lax.map(one, st)

    for name, fn, arg in (("offset-major", read_om, cons_om),
                          ("spatial-major", read_sm, cons_sm),
                          ("loop-only", noop, cons_om)):
        sync(fn(arg, starts))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(arg, starts))
            ts.append(time.perf_counter() - t0)
        print(f"{name:16s} {min(ts)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
