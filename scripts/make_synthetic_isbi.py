"""Synthetic ISBI2012-style dense EM dataset for the protocol rehearsal.

ISBI 2012 raw data is not available in this environment (documented in
parity/results.json), but the ISBI benchmark *protocol* — dense 2D
foreground, 25x25 direct-affinity patches, the isbi assembly hacks
(sparsified candidate grid + boundary-ring fg filtering), mutex
watershed, rRAND/VOI scoring (reference README.md:110-120,
isbi_hacks.py, vote_instances.py:216-218/298-301) — can be rehearsed
end-to-end on synthetic data at dataset resolution (512x512 slices).

Each sample mimics an EM cross-section: a relaxed-Voronoi tessellation
of cell regions separated by ~2 px membrane ridges.  GT instances are
the dense region labels with membrane pixels left 0 (like the ISBI GT,
where membranes separate neurite profiles); raw is light cytoplasm with
dark membranes + texture + sensor noise.

Usage: python scripts/make_synthetic_isbi.py [--root data/synth_isbi]
           [--train 6 --val 2 --test 2] [--size 512]
"""

import argparse
import os
import sys

import numpy as np
from scipy import ndimage

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patchperpix_tpu.utils import io as vio  # noqa: E402


def make_sample(size, n_cells, rng):
    """(raw (1,s,s) f32, gt (1,s,s) int32) dense EM-like tessellation."""
    h = w = size
    seeds = np.stack([rng.randint(0, h, n_cells),
                      rng.randint(0, w, n_cells)], axis=1)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # warp the coordinate frame with smooth noise so boundaries curve
    warp = np.stack([
        ndimage.gaussian_filter(rng.normal(0, 1, (h, w)), 24) * 60,
        ndimage.gaussian_filter(rng.normal(0, 1, (h, w)), 24) * 60,
    ])
    wy, wx = yy + warp[0], xx + warp[1]
    # nearest-seed labeling in the warped frame (relaxed Voronoi);
    # chunk over seeds to keep memory flat
    best_d = np.full((h, w), np.inf, np.float32)
    label = np.zeros((h, w), np.int32)
    for i, (sy, sx) in enumerate(seeds):
        # anisotropic metric per cell for elongated profiles
        ay = rng.uniform(0.6, 1.6)
        ax = rng.uniform(0.6, 1.6)
        d = ((wy - sy) * ay) ** 2 + ((wx - sx) * ax) ** 2
        take = d < best_d
        best_d[take] = d[take]
        label[take] = i + 1
    # membranes: pixels whose 4-neighborhood crosses a region boundary
    bound = np.zeros((h, w), bool)
    bound[:-1] |= label[:-1] != label[1:]
    bound[:, :-1] |= label[:, :-1] != label[:, 1:]
    membrane = ndimage.binary_dilation(bound, iterations=1)
    gt = label.copy()
    gt[membrane] = 0
    # raw: light cytoplasm, dark membranes, intracellular texture
    raw = np.full((h, w), 0.75, np.float32)
    texture = ndimage.gaussian_filter(rng.normal(0, 1, (h, w)), 2.5) * 0.08
    raw += texture
    memb_soft = ndimage.gaussian_filter(membrane.astype(np.float32), 0.8)
    raw = raw * (1.0 - 0.85 * np.clip(memb_soft * 1.6, 0, 1))
    raw += rng.normal(0, 0.04, raw.shape)
    raw = np.clip(raw, 0, 1).astype(np.float32)
    return raw[None], gt[None].astype(np.int32)


def write_zarr(path, raw, gt):
    io = vio.IoZarr(path, mode="w")
    io.create("volumes/raw", raw.shape, "float32")
    io.write(raw, key="volumes/raw")
    io.create("volumes/gt_instances", gt.shape, "int32")
    io.write(gt, key="volumes/gt_instances")
    io.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/synth_isbi")
    ap.add_argument("--train", type=int, default=6)
    ap.add_argument("--val", type=int, default=2)
    ap.add_argument("--test", type=int, default=2)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    for split, n in (("train", args.train), ("val", args.val),
                     ("test", args.test)):
        d = os.path.join(args.root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            raw, gt = make_sample(args.size,
                                  n_cells=rng.randint(35, 60), rng=rng)
            p = os.path.join(d, f"isbi_{split}_{i:02d}.zarr")
            write_zarr(p, raw, gt)
            n_inst = len(np.unique(gt[gt > 0]))
            print(f"{p}: {n_inst} instances, "
                  f"fg {float((gt > 0).mean()):.3f}")


if __name__ == "__main__":
    main()
