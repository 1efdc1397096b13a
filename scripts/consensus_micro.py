"""Micro-profile of the pallas consensus + rank stage at 50^3/7^3.

Splits operand prep (_masks + _target_aligned) from the pallas kernels by
timing (a) the full jitted entry points, (b) prep-only jits, (c) the
pallas_call with pre-staged operands.  Run solo on the real chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "data/JRC_SS05008-20160318_24_B2_crop.zarr"


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from patchperpix_tpu.ops.consensus_jax import (
        ConsensusConfig, _masks, rank_epilogue)
    from patchperpix_tpu.ops import pallas_consensus as pc
    from patchperpix_tpu.ops.synthetic import labels_to_affinities_multi
    from patchperpix_tpu.utils import io as vio

    labels = vio.IoZarr(FIXTURE).read(
        key="volumes/gt_instances").astype(np.int32)
    ps = (7, 7, 7)
    affs = jax.device_put(jnp.asarray(
        labels_to_affinities_multi(labels, np.array(ps))))
    cfg = ConsensusConfig(patchshape=ps, overlapping_inst=True)

    def sync(x):
        return float(np.asarray(jnp.sum(
            x[0] if isinstance(x, (tuple, list)) else x)))

    def timeit(label, fn, n=3):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            sync(fn())
            ts.append(time.perf_counter() - t0)
        print(f"{label:44s} {min(ts)*1e3:8.1f} ms", flush=True)

    # (a) full entry points
    cons = pc.consensus_array_pallas(affs, cfg)
    timeit("consensus_array_pallas (full)",
           lambda: pc.consensus_array_pallas(affs, cfg))
    timeit("rank_scores_pallas (full)",
           lambda: pc.rank_scores_pallas(affs, cons, cfg))

    # (b) prep-only: masks and the 8 target-aligned operand stacks
    rad = np.asarray(ps) // 2
    rm = tuple(int(r + p - 1) for r, p in zip(rad, np.asarray(ps)))
    radt = tuple(int(r) for r in rad)
    Z, Y, X = affs.shape[1:]
    lcrop = (slice(None),) * 3 + tuple(
        slice(int(r), int(r) + s) for r, s in zip(rad, (Z, Y, X)))

    @jax.jit
    def prep_masks(a):
        hi, lo, _ = _masks(a, cfg, None)
        return hi, lo

    @jax.jit
    def prep_consensus_operands(a):
        hi, lo, _ = _masks(a, cfg, None)
        aa = a * hi
        bb = (1.0 - a) * lo
        L = [pc._target_aligned(t, np.asarray(ps), radt)[lcrop]
             for t in (aa, bb, hi, lo)]
        R = [pc._target_aligned(t, np.asarray(ps), rm)
             for t in (aa, bb, hi, lo)]
        return L + R

    timeit("masks only", lambda: prep_masks(affs))
    ops = prep_consensus_operands(affs)
    timeit("masks + 8 target-aligned operands",
           lambda: prep_consensus_operands(affs))
    print("operand bytes: %.0f MB" % (sum(
        np.prod(o.shape) * 4 for o in ops) / 1e6), flush=True)


if __name__ == "__main__":
    main()
