"""Export a params-only checkpoint for bench.py's self-consistent
workload (parity/bench_ckpt).

Usage: python scripts/export_bench_ckpt.py <exp_base> [checkpoint]
e.g.   python scripts/export_bench_ckpt.py experiments_out/crop_dec_r3
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from patchperpix_tpu.train.trainer import (checkpoint_path,
                                               get_latest_checkpoint,
                                               load_checkpoint,
                                               save_checkpoint)

    exp = sys.argv[1]
    train_dir = os.path.join(exp, "train")
    if len(sys.argv) > 2:
        path = checkpoint_path(train_dir, int(sys.argv[2]))
    else:
        path, _ = get_latest_checkpoint(train_dir)
    print("loading", path)
    state = load_checkpoint(path)
    params = jax.tree.map(np.asarray, state["params"])
    out = os.path.join("parity", "bench_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    save_checkpoint(out, {"params": params})
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"written {out} ({n / 1e6:.2f} M params)")


if __name__ == "__main__":
    main()
