"""Benchmark: vote-instances assembly throughput on the FlyLight fixture.

Builds ideal 7^3 patch affinities from the shipped FlyLight 50^3 GT crop
(data/JRC_SS05008-20160318_24_B2_crop.zarr), runs the full assembly
pipeline (consensus + ranking on the accelerator, greedy cover / patch graph
/ labeling around it) and reports steady-state throughput in Mvox/s.

``vs_baseline`` is the speedup of the JAX engine over the numpy golden
reference (the stand-in for the reference's CPU path, measured on a smaller
sub-volume and normalized per foreground voxel - the cost driver of the
O(V_fg * P^2) consensus stage).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "Mvox/s", "vs_baseline": N}
"""

import json
import time

import numpy as np


def build_inputs(size=None, patchshape=(7, 7, 7)):
    from patchperpix_tpu.ops.synthetic import labels_to_affinities_multi
    from patchperpix_tpu.utils import io as vio

    io = vio.IoZarr("data/JRC_SS05008-20160318_24_B2_crop.zarr")
    labels = io.read(key="volumes/gt_instances").astype(np.int32)
    if size is not None:
        labels = labels[:, :size, :size, :size]
    affs = labels_to_affinities_multi(labels, patchshape)
    numinst = np.sum(labels > 0, axis=0).astype(np.uint8)
    fg = numinst > 0
    return affs, fg, numinst


def run_assembly(affs, fg, numinst, engine, patchshape=(7, 7, 7)):
    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg

    params = VoteInstancesParams(
        patchshape=tuple(patchshape), engine=engine,
        patch_threshold=0.5, fc_threshold=0.5,
        overlapping_inst=True, mws=True,
        select_patches_for_sparse_data=True,
        skeletonize_foreground=False)
    return to_instance_seg(affs, fg, fg.copy(), numinst, params)


def main():
    ps = (7, 7, 7)
    affs, fg, numinst = build_inputs(patchshape=ps)
    nvox = int(np.prod(fg.shape))
    nfg = int(fg.sum())

    # warmup (compilation) + steady-state timing
    run_assembly(affs, fg, numinst, "jax", ps)
    t0 = time.perf_counter()
    inst, _ = run_assembly(affs, fg, numinst, "jax", ps)
    t_jax = time.perf_counter() - t0
    n_inst = len(np.unique(inst[inst > 0]))

    # numpy golden reference on a sub-volume, normalized per fg voxel
    sub = 24
    affs_s, fg_s, ni_s = build_inputs(size=sub, patchshape=ps)
    nfg_s = max(int(fg_s.sum()), 1)
    t0 = time.perf_counter()
    run_assembly(affs_s, fg_s, ni_s, "numpy", ps)
    t_np = time.perf_counter() - t0
    t_np_scaled = t_np * nfg / nfg_s

    mvox_s = nvox / t_jax / 1e6
    vs_baseline = t_np_scaled / t_jax
    print(json.dumps({
        "metric": "flylight-50^3 7^3-patch assemble (predict-GT affs)"
                  f" [{n_inst} instances, {nfg} fg vox]",
        "value": round(mvox_s, 3),
        "unit": "Mvox/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
