"""Steady-state assembly timing at 50^3/7^3 (PROFILE.md breakdown).

Measures per-stage wall times on the real chip with the pallas engine
(consensus + NEW pallas rank) and sweeps the patch-graph segment group
size.  Usage: python scripts/assemble_timing.py [groups...]
"""

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

    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
    from patchperpix_tpu.ops.synthetic import labels_to_affinities_multi
    from patchperpix_tpu.utils import io as vio

    labels = vio.IoZarr(FIXTURE).read(
        key="volumes/gt_instances").astype(np.int32)
    ps = (7, 7, 7)
    affs = labels_to_affinities_multi(labels, np.array(ps))
    numinst = np.sum(labels > 0, axis=0).astype(np.uint8)
    fg = numinst > 0
    affs_dev = jax.device_put(jnp.asarray(affs))

    groups = [int(g) for g in sys.argv[1:]] or [64, 128, 256]

    import patchperpix_tpu.ops.consensus_jax as cj

    orig_pgw = cj.patch_graph_weights

    for engine in ("pallas", "jax"):
        for group in groups:
            def pgw(*a, **k):
                k["group"] = group
                return orig_pgw(*a, **k)

            # patch the group size through the assembly driver
            import patchperpix_tpu.assembly.vote_instances as vi
            vi.patch_graph_weights = pgw

            params = VoteInstancesParams(
                patchshape=ps, engine=engine, overlapping_inst=True,
                mws=True, select_patches_for_sparse_data=True)
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                inst, _ = to_instance_seg(affs_dev, fg, fg.copy(),
                                          numinst, params)
                inst = np.asarray(inst)
                times.append(round(time.perf_counter() - t0, 2))
            print(json.dumps({
                "engine": engine, "group": group,
                "warmup_s": times[0], "steady_s": times[1],
                "n_inst": int(len(np.unique(inst[inst > 0])))}),
                flush=True)
            if engine == "jax":
                break  # group sweep only needed once (same graph stage)


if __name__ == "__main__":
    main()
