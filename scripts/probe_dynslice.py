"""Mosaic probe for the 2D fold kernel's load primitives:

A sliding multi-slab row window is built by passing the SAME folded
array through n_slab size-1 slab BlockSpecs offset by one (block index
units equal block shape, so a size-2 block cannot stride by one slab),
concatenating the (V, W) values in-kernel, and dynamic-slicing rows at
a TRACED non-negative start inside a fori_loop (dynamic negative
sublane rolls are a known miscompile; starts here are >= 0).

Run: python scripts/probe_dynslice.py [interpret]
"""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if len(sys.argv) > 1:  # interpret tier runs on forced CPU (env is ignored)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(n_slab, W, interpret):
    ZS = 8
    V = 8

    rows = n_slab * V

    def kernel(*refs):
        slab_refs, o_ref = refs[:n_slab], refs[n_slab]
        if MODE == "roll":
            w = jnp.concatenate([r[0] for r in slab_refs], axis=0)

            def body(s, acc):
                # rows [s, s+V) == first V rows of roll by (rows - s):
                # dynamic sublane roll with a NON-NEGATIVE amount (the
                # negative-amount variant is the known miscompile)
                win = pltpu.roll(w, rows - s, 0)[:V]
                return acc + win * (s + 1).astype(jnp.float32)

            o_ref[0] = jax.lax.fori_loop(0, (n_slab - 1) * V, body,
                                         jnp.zeros((V, W), jnp.float32))
        else:  # scratch staging + dynamic ds read
            o_ref, scratch = refs[n_slab], refs[n_slab + 1]
            for k in range(n_slab):
                scratch[k * V:(k + 1) * V] = slab_refs[k][0]

            def body(s, acc):
                win = scratch[pl.ds(s, V)]
                return acc + win * (s + 1).astype(jnp.float32)

            o_ref[0] = jax.lax.fori_loop(0, (n_slab - 1) * V, body,
                                         jnp.zeros((V, W), jnp.float32))

    x = jnp.asarray(
        np.random.RandomState(0).rand(ZS, V, W).astype(np.float32))
    grid = (ZS - n_slab + 1,)
    in_specs = [
        pl.BlockSpec((1, V, W), (lambda z, k=k: (z + k, 0, 0)),
                     memory_space=pltpu.VMEM)
        for k in range(n_slab)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, V, W), lambda z: (z, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], V, W), jnp.float32),
        scratch_shapes=([] if MODE == "roll"
                        else [pltpu.VMEM((rows, W), jnp.float32)]),
        interpret=interpret,
    )(*([x] * n_slab))

    flat = np.asarray(x).reshape(ZS * V, W)
    want = np.zeros((grid[0], V, W), np.float32)
    for z in range(grid[0]):
        for s in range((n_slab - 1) * V):
            want[z] += flat[z * V + s:z * V + s + V] * (s + 1)
    err = np.abs(np.asarray(out) - want).max()
    print(f"MODE={MODE} n_slab={n_slab} W={W} interpret={interpret} "
          f"max_err={err}", flush=True)
    assert err < 1e-4, "MISCOMPILE"


if __name__ == "__main__":
    interp = len(sys.argv) > 1
    for MODE in ("roll", "scratch"):
        for ns in (2, 3):
            for W in (696, 720, 768):
                try:
                    probe(ns, W, interp)
                except Exception as e:  # noqa: BLE001
                    print(f"MODE={MODE} n_slab={ns} W={W} FAILED: "
                          f"{type(e).__name__}: {str(e)[:200]}",
                          flush=True)
    print("PROBE DONE", flush=True)
