"""Post-hoc SWA: average params over a set of checkpoints of one run.

The reference trains with optional SWA and loads the averaged model at
predict/decode (predict_no_gp.py:66-72, train.py torch SWA).  The r4 crop
run trained without SWA; this script builds the averaged model after the
fact from the saved checkpoint trail (equivalent up to the sampling
schedule: tail checkpoints are cosine-LR end-of-training snapshots).

Writes a standalone experiment dir (config copied, single averaged
checkpoint) that select_checkpoint.py / sweep_assembly.py can consume.

Usage:
  python scripts/average_checkpoints.py --exp experiments_out/crop_r4_dec \
      --ckpts 340000:400000:10000 --out experiments_out/crop_r4_swa
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_ckpts(spec: str):
    if ":" in spec:
        a, b, s = (int(x) for x in spec.split(":"))
        return list(range(a, b + 1, s))
    return [int(x) for x in spec.split(",")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="experiments_out/crop_r4_dec")
    ap.add_argument("--ckpts", required=True,
                    help="a,b,c or start:stop:step (stop inclusive)")
    ap.add_argument("--out", default="experiments_out/crop_r4_swa")
    ap.add_argument("--step", type=int, default=None,
                    help="step suffix of the written checkpoint "
                         "(default: last averaged step)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from patchperpix_tpu.train.trainer import (checkpoint_path,
                                               load_checkpoint,
                                               save_checkpoint)

    steps = parse_ckpts(args.ckpts)
    train_dir = os.path.join(args.exp, "train")
    acc = None
    for s in steps:
        params = load_checkpoint(checkpoint_path(train_dir, s))["params"]
        params = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
        acc = params if acc is None else jax.tree.map(
            lambda a, b: a + b, acc, params)
        print(f"added checkpoint {s}", flush=True)
    n = float(len(steps))
    avg = jax.tree.map(lambda a: (a / n).astype(np.float32), acc)

    out_step = args.step or steps[-1]
    os.makedirs(os.path.join(args.out, "train"), exist_ok=True)
    for aux in ("config.toml", "train_net_config.json",
                "test_net_config.json"):
        src = os.path.join(args.exp, aux)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.out, aux))
    dst = checkpoint_path(os.path.join(args.out, "train"), out_step)
    shutil.rmtree(dst, ignore_errors=True)
    save_checkpoint(dst, {"params": avg})
    print(f"wrote {dst} (avg of {len(steps)} checkpoints: "
          f"{steps[0]}..{steps[-1]})")


if __name__ == "__main__":
    main()
