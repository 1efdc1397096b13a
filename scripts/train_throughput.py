"""Measure training throughput + host-RSS growth: device sampler vs host.

Usage: python scripts/train_throughput.py [device|host] [steps]
Prints one JSON line with steps/s and RSS delta per step.
"""

import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "data/JRC_SS05008-20160318_24_B2_crop.zarr"


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "device"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    import jax

    from patchperpix_tpu.models import PPPConfig, PPPModel
    from patchperpix_tpu.train import (AugmentConfig, CropSampler,
                                       DeviceSampler, Prefetcher,
                                       SamplerConfig, TrainConfig,
                                       load_sample, train_until)

    sample = load_sample(FIXTURE, "volumes/raw", "volumes/gt_instances",
                         clipmax=1500)
    ps = (7, 7, 7)
    mcfg = PPPConfig(
        patchshape=ps, num_channels=3, num_fmaps=20,
        fmap_inc_factors=(3, 3), fmap_dec_factors=(1.0, 1.0),
        downsample_factors=((2, 2, 2), (2, 2, 2)),
        overlapping_inst=True, max_num_inst=2,
        train_code=False, padding="same")
    model = PPPModel(mcfg)
    crop = (40, 40, 40)
    scfg = SamplerConfig(
        input_shape=crop, output_shape=crop, patchshape=ps, batch_size=3,
        probability_fg=0.8, probability_overlap=0.15,
        probability_random=0.05,
        augment=AugmentConfig(elastic=False, mirror=True, transpose=True))
    out = f"/tmp/tp_{mode}"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    tcfg = TrainConfig(max_iterations=steps, checkpoints=steps,
                       snapshots=0, lr=1e-3, output_folder=out,
                       log_every=100, tensorboard=False)

    if mode == "device":
        pf = DeviceSampler([sample], scfg, max_gt_channels=3)
    else:
        pf = Prefetcher(CropSampler([sample], scfg), cache_size=8,
                        max_gt_channels=3)

    rss0 = rss_mb()
    t0 = time.time()
    state = train_until(model, mcfg, tcfg, pf)
    # force final readback
    float(np.asarray(jax.tree.leaves(state["params"])[0]).sum())
    wall = time.time() - t0
    pf.stop()
    rss1 = rss_mb()
    print(json.dumps({
        "mode": mode, "steps": steps, "wall_s": round(wall, 1),
        "steps_per_s": round(steps / wall, 2),
        "rss0_mb": round(rss0, 1), "rss1_mb": round(rss1, 1),
        "rss_delta_mb_per_step": round((rss1 - rss0) / steps, 4)}),
        flush=True)


if __name__ == "__main__":
    main()
