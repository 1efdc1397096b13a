"""Loss-curve artifact from a train_log.jsonl -> parity/train_curve.png.

Usage: python scripts/plot_training.py <train_log.jsonl> [out.png]
Two series (total loss, patch-affinity jaccard) on separate single-axis
panels — no dual-axis; palette = validated categorical slots 1/2.
"""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

SERIES_1 = "#2a78d6"
SERIES_2 = "#eb6834"
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT_2 = "#52514e"
GRID = "#e4e3df"


def main():
    log = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "parity/train_curve.png"
    rows = [json.loads(l) for l in open(log) if '"loss"' in l]
    steps = [r["step"] for r in rows]
    loss = [r["loss"] for r in rows]
    jp = [r.get("jaccard_patch") for r in rows]

    fig, axes = plt.subplots(1, 2, figsize=(10, 3.4), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    for ax, ys, color, title in (
            (axes[0], loss, SERIES_1, "training loss"),
            (axes[1], jp, SERIES_2, "patch-affinity jaccard")):
        ax.set_facecolor(SURFACE)
        ax.plot(steps, ys, color=color, linewidth=2)
        ax.set_title(title, color=TEXT, fontsize=11, loc="left")
        ax.set_xlabel("step", color=TEXT_2, fontsize=9)
        ax.tick_params(colors=TEXT_2, labelsize=8)
        ax.grid(True, color=GRID, linewidth=0.6)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
    axes[0].set_yscale("log")
    fig.suptitle(os.path.basename(os.path.dirname(os.path.dirname(log))) or
                 log, color=TEXT_2, fontsize=9, x=0.99, ha="right")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    fig.savefig(out, facecolor=SURFACE)
    print("written", out, f"({len(rows)} points)")


if __name__ == "__main__":
    main()
