"""Synthetic BBBC010-style worm dataset for the 2D protocol rehearsal.

BBBC010 raw data is not available in this environment (documented in
parity/results.json), but the 2D benchmark *protocol* — 25x25 ppp
patches, overlapping elongated instances, train -> predict -> label ->
evaluate via the CLI (reference README.md:96-107, experiments/wormbodies
setup) — can be rehearsed end-to-end on synthetic data at dataset
resolution (520x696, like the BBBC010 out-of-focus wells).

Each sample: curved sinusoid worms (~5 px wide, 80-140 px long, random
orientation), some pairs genuinely crossing.  GT is written 2-channel
(max_num_inst = 2, like the wormbodies setups): overlapping worms land
in different channels.  Raw = per-worm intensity + gaussian smoothing +
sensor noise.

Usage: python scripts/make_synthetic_worms.py [--root data/synth_worms]
           [--train 6 --val 2 --test 2] [--h 520 --w 696]
"""

import argparse
import os
import sys

import numpy as np
from scipy import ndimage

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patchperpix_tpu.utils import io as vio  # noqa: E402


def make_sample(h, w, n_worms, rng):
    """(raw (1,h,w) f32, gt (2,h,w) int32) with crossing worm pairs."""
    gt = np.zeros((2, h, w), np.int32)
    painted = np.zeros((h, w), bool)
    lab = 0
    for wi in range(n_worms):
        lab += 1
        # centerline: sinusoid in a rotated frame
        length = rng.randint(80, 140)
        amp = rng.uniform(3.0, 10.0)
        period = rng.uniform(8.0, 14.0)
        phase = rng.rand() * 2 * np.pi
        theta = rng.rand() * np.pi
        cy, cx = rng.randint(40, h - 40), rng.randint(40, w - 40)
        t = np.linspace(-length / 2, length / 2, length * 2)
        u, v = t, amp * np.sin(t / period + phase)
        ys = (cy + u * np.sin(theta) + v * np.cos(theta)).astype(int)
        xs = (cx + u * np.cos(theta) - v * np.sin(theta)).astype(int)
        ok = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
        ys, xs = ys[ok], xs[ok]
        if len(ys) < 40:
            lab -= 1
            continue
        mask = np.zeros((h, w), bool)
        mask[ys, xs] = True
        mask = ndimage.binary_dilation(mask, iterations=2)
        # channel assignment: overlapping worms go to different channels
        ch = 1 if (mask & painted).sum() > 0 else 0
        if (gt[ch][mask] > 0).any() and (gt[1 - ch][mask] > 0).any():
            # both channels occupied here -> would need 3 insts; skip
            lab -= 1
            continue
        gt[ch][mask] = lab
        painted |= mask
    fg = (gt > 0).any(axis=0)
    raw = np.where(fg, rng.uniform(0.55, 0.85), 0.08)
    raw = ndimage.gaussian_filter(raw, 1.2)
    raw = raw + rng.normal(0, 0.03, raw.shape)
    raw = np.clip(raw, 0, 1).astype(np.float32)
    return raw[None], gt


def write_zarr(path, raw, gt):
    io = vio.IoZarr(path, mode="w")
    io.create("volumes/raw", raw.shape, "float32")
    io.write(raw, key="volumes/raw")
    io.create("volumes/gt_instances", gt.shape, "int32")
    io.write(gt.astype(np.int32), key="volumes/gt_instances")
    io.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/synth_worms")
    ap.add_argument("--train", type=int, default=6)
    ap.add_argument("--val", type=int, default=2)
    ap.add_argument("--test", type=int, default=2)
    ap.add_argument("--h", type=int, default=520)
    ap.add_argument("--w", type=int, default=696)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    for split, n in (("train", args.train), ("val", args.val),
                     ("test", args.test)):
        d = os.path.join(args.root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            raw, gt = make_sample(args.h, args.w,
                                  n_worms=rng.randint(10, 18), rng=rng)
            p = os.path.join(d, f"worms_{split}_{i:02d}.zarr")
            write_zarr(p, raw, gt)
            n_inst = len(np.unique(gt[gt > 0]))
            print(f"{p}: {n_inst} instances, "
                  f"fg {float((gt > 0).any(0).mean()):.3f}")


if __name__ == "__main__":
    main()
