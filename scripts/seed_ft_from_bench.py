"""Seed a resumable CLI experiment from the params-only bench checkpoint.

The workspace is re-cloned between driver sessions, so full training
state only survives if committed; `parity/bench_ckpt` (params-only,
ppp+dec) is the surviving 200k-iter anchor.  This script reconstructs a
FULL train state (params + fresh Adam moments + step) under a new
experiment so `cli train` resumes from it (trainer.resume_state
reinitializes the optimizer on structure mismatch anyway — the seed
moments are zeros either way).

Usage: python scripts/seed_ft_from_bench.py <expid> [step]
e.g.   python scripts/seed_ft_from_bench.py crop_r4_dec 200000
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import optax

    from patchperpix_tpu.train.trainer import (checkpoint_path,
                                               load_checkpoint,
                                               save_checkpoint)

    expid = sys.argv[1] if len(sys.argv) > 1 else "crop_r4_dec"
    step = int(sys.argv[2]) if len(sys.argv) > 2 else 200000
    params = load_checkpoint(os.path.join("parity", "bench_ckpt"))["params"]
    opt = optax.adam(3e-5)
    state = {"params": params, "opt_state": opt.init(params), "step": step}
    train_dir = os.path.join("experiments_out", expid, "train")
    os.makedirs(train_dir, exist_ok=True)
    out = checkpoint_path(train_dir, step)
    save_checkpoint(out, state)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"seeded {out} ({n / 1e6:.2f} M params, step {step})")


if __name__ == "__main__":
    main()
