"""Measure 2D assembly at BBBC010 scale (item: VERDICT r2 weak #2).

BBBC010 images are 520x696 with 25x25 patches (reference README.md:96-107).
The Mosaic Z==1 miscompile excludes the pallas kernel for 2D, so 2D runs
the XLA scan path — this script measures that at dataset scale on
synthetic worm-like instances and records steady-state stage times.

Usage: python scripts/bench_2d.py [H W]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worm_labels(h=520, w=696, n_worms=16, seed=0):
    rng = np.random.RandomState(seed)
    labels = np.zeros((1, h, w), np.int32)
    lab = 0
    for _ in range(n_worms):
        lab += 1
        y0 = rng.randint(30, h - 30)
        x0 = rng.randint(20, w - 120)
        length = rng.randint(80, 140)
        amp = rng.randint(4, 10)
        phase = rng.rand() * 6.28
        xs = np.arange(x0, min(x0 + length, w - 10))
        ys = (y0 + amp * np.sin(xs / 11.0 + phase)).astype(int)
        ys = np.clip(ys, 3, h - 4)
        for dx, x in enumerate(xs):
            labels[0, ys[dx] - 2:ys[dx] + 3, x] = lab
    return labels


def main():
    import jax
    import jax.numpy as jnp

    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
    from patchperpix_tpu.ops.synthetic import labels_to_affinities

    h = int(sys.argv[1]) if len(sys.argv) > 2 else 520
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 696
    ps = np.array([1, 25, 25])
    labels = worm_labels(h, w)
    affs = labels_to_affinities(labels, ps)
    fg = labels > 0
    n_fg = int(fg.sum())
    params = VoteInstancesParams(
        patchshape=(1, 25, 25), engine="jax", patch_threshold=0.5,
        fc_threshold=0.5, mws=True, select_patches_for_sparse_data=True)

    affs_dev = jax.device_put(jnp.asarray(affs))
    times = []
    for it in range(2):
        t0 = time.perf_counter()
        inst, _ = to_instance_seg(affs_dev, fg, fg.copy(),
                                  fg.astype(np.uint8), params)
        inst = np.asarray(inst)
        times.append(time.perf_counter() - t0)
    n_inst = len(np.unique(inst[inst > 0]))
    n_gt = int(labels.max())
    print(json.dumps({
        "shape": [h, w], "patch": [25, 25], "fg_vox": n_fg,
        "gt_instances": n_gt, "pred_instances": n_inst,
        "t_warmup_s": round(times[0], 2),
        "t_steady_s": round(times[1], 2)}), flush=True)


if __name__ == "__main__":
    main()
