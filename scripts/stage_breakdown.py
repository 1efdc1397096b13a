"""Per-stage wall-clock breakdown of to_instance_seg at 50^3/7^3.

Monkeypatches the ``_stage_trace`` profiler hook into a timing context.
Stage boundaries in the driver force host materialization (cover and
pairs consume numpy), so wall time per context is meaningful.  Run solo
on the real chip: ``python scripts/stage_breakdown.py [runs]``.
"""

import contextlib
import json
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
    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
    from patchperpix_tpu.ops.synthetic import labels_to_affinities_multi
    from patchperpix_tpu.utils import io as vio

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

    labels = vio.IoZarr(FIXTURE).read(
        key="volumes/gt_instances").astype(np.int32)
    ps = (7, 7, 7)
    affs = labels_to_affinities_multi(labels, np.array(ps))
    numinst = np.sum(labels > 0, axis=0).astype(np.uint8)
    fg = numinst > 0
    affs_dev = jax.device_put(jnp.asarray(affs))

    params = VoteInstancesParams(
        patchshape=ps, engine="pallas", overlapping_inst=True,
        mws=True, select_patches_for_sparse_data=True)

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for r in range(runs):
        stage_times.clear()
        t0 = time.perf_counter()
        inst, _ = to_instance_seg(affs_dev, fg, fg.copy(), numinst, params)
        inst = np.asarray(inst)
        total = time.perf_counter() - t0
        out = {k: round(v, 3) for k, v in stage_times.items()}
        out["TOTAL"] = round(total, 3)
        out["untraced"] = round(total - sum(stage_times.values()), 3)
        out["run"] = r
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
