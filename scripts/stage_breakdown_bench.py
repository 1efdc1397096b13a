"""Per-stage breakdown of the BENCH assembly (trained self-consistent path).

Same as scripts/stage_breakdown.py but on the exact workload bench.py
times: the trained SWA checkpoint's own decoded affinities + own
fg/numinst, assembled with the swept-winner params (pt 0.6 / fc 0.5 /
no skeletonize).  Run solo on the real chip:

    python scripts/stage_breakdown_bench.py [runs]
"""

import contextlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench

    import patchperpix_tpu.assembly.vote_instances as vi
    from patchperpix_tpu.assembly import VoteInstancesParams
    from patchperpix_tpu.assembly.vote_instances import numinst_from_probs
    from patchperpix_tpu.infer.fused import (decode_volume_device,
                                             predict_volume_device)

    stage_times = {}

    @contextlib.contextmanager
    def timed_trace(name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            stage_times[name] = stage_times.get(name, 0.0) + (
                time.perf_counter() - t0)

    vi._stage_trace = timed_trace

    model, cfg = bench.crop_model()
    params = bench.load_trained_params(model, cfg)
    assert params is not None, "no parity/bench_ckpt committed"
    raw = bench.load_raw_clip()
    win = (52, 52, 52)
    code, prob = predict_volume_device(model, params, raw, cfg, win, win)
    numinst = numinst_from_probs(
        np.asarray(prob, np.float32),
        VoteInstancesParams(patchshape=bench.PS,
                            numinst_threshs=(0.9, 0.1)))
    fg = numinst > 0
    dec = decode_volume_device(model, params, code, fg, cfg)
    print(f"own fg vox {int(fg.sum())}", flush=True)

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for r in range(runs):
        stage_times.clear()
        t0 = time.perf_counter()
        inst, _ = bench.run_assembly(dec, fg, numinst, "jax",
                                     skeletonize=False, pt=0.6, fc=0.5)
        inst = np.asarray(inst)
        total = time.perf_counter() - t0
        out = {k: round(v, 3) for k, v in stage_times.items()}
        out["TOTAL"] = round(total, 3)
        out["untraced"] = round(total - sum(stage_times.values()), 3)
        out["run"] = r
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
