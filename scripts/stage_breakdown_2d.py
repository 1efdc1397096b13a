"""Per-stage breakdown of 2D assembly at BBBC010 scale (XLA scan path).

Same monkeypatch as stage_breakdown.py, on the bench_2d synthetic worms.
Run solo on the real chip: python scripts/stage_breakdown_2d.py [runs].
"""

import contextlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_2d import worm_labels  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import patchperpix_tpu.assembly.vote_instances as vi
    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
    from patchperpix_tpu.ops.synthetic import labels_to_affinities

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

    ps = np.array([1, 25, 25])
    labels = worm_labels()
    affs = labels_to_affinities(labels, ps)
    fg = labels > 0
    params = VoteInstancesParams(
        patchshape=(1, 25, 25), engine="jax", patch_threshold=0.5,
        fc_threshold=0.5, mws=True, select_patches_for_sparse_data=True)
    affs_dev = jax.device_put(jnp.asarray(affs))

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for r in range(runs):
        stage_times.clear()
        t0 = time.perf_counter()
        inst, _ = to_instance_seg(affs_dev, fg, fg.copy(),
                                  fg.astype(np.uint8), params)
        inst = np.asarray(inst)
        total = time.perf_counter() - t0
        out = {k: round(v, 3) for k, v in stage_times.items()}
        out["TOTAL"] = round(total, 3)
        out["untraced"] = round(total - sum(stage_times.values()), 3)
        out["run"] = r
        out["n_inst"] = int(len(np.unique(inst[inst > 0])))
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
