"""A/B the patch-graph chunk size on the BENCH workload (trained affs).

Captures the exact patch_graph_weights arguments from the trained
self-consistent pipeline, then times chunk in {1, 8, 32, 128} in one
process (chunk is a static jit arg, so each variant compiles its own
program).  Run solo on the real chip:

    python scripts/graph_chunk_ab.py [--out parity/graph_chunk_ab.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="parity/graph_chunk_ab.json")
    ap.add_argument("--chunks", default="1,8,32,128")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    import patchperpix_tpu.ops.consensus_jax as cj
    from patchperpix_tpu.assembly import VoteInstancesParams
    from patchperpix_tpu.assembly.vote_instances import numinst_from_probs
    from patchperpix_tpu.infer.fused import (decode_volume_device,
                                             predict_volume_device)

    model, cfg = bench.crop_model()
    params = bench.load_trained_params(model, cfg)
    assert params is not None
    raw = bench.load_raw_clip()
    win = (52, 52, 52)
    code, prob = predict_volume_device(model, params, raw, cfg, win, win)
    numinst = numinst_from_probs(
        np.asarray(prob, np.float32),
        VoteInstancesParams(patchshape=bench.PS, numinst_threshs=(0.9, 0.1)))
    fg = numinst > 0
    dec = decode_volume_device(model, params, code, fg, cfg)

    captured = {}
    orig = cj.patch_graph_weights

    def capture(affs_a, cons_sym, pairs, cfg_a, **kw):
        captured.update(affs=affs_a, cons=cons_sym, pairs=pairs, cfg=cfg_a,
                        kw=kw)
        return orig(affs_a, cons_sym, pairs, cfg_a, **kw)

    cj.patch_graph_weights = capture
    import patchperpix_tpu.assembly.vote_instances as vi
    vi.patch_graph_weights = capture
    bench.run_assembly(dec, fg, numinst, "jax", skeletonize=False,
                       pt=0.6, fc=0.5)
    cj.patch_graph_weights = orig
    vi.patch_graph_weights = orig
    assert captured, "graph stage not reached"
    kw = dict(captured["kw"])
    kw.pop("chunk", None)
    print(f"captured {len(captured['pairs'])} pairs", flush=True)

    res = {"n_pairs": int(len(captured["pairs"]))}
    base = None
    for c in (int(x) for x in args.chunks.split(",")):
        w = orig(captured["affs"], captured["cons"], captured["pairs"],
                 captured["cfg"], chunk=c, **kw)
        ref_w = np.asarray(w)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            w = orig(captured["affs"], captured["cons"], captured["pairs"],
                     captured["cfg"], chunk=c, **kw)
        np.asarray(w)
        dt = (time.perf_counter() - t0) / reps
        if base is None:
            base = ref_w
        else:
            np.testing.assert_allclose(ref_w, base, atol=1e-4, rtol=1e-4)
        res[f"chunk_{c}_s"] = round(dt, 4)
        print(f"chunk {c}: {dt:.4f}s", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
