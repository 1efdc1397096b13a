"""Micro-bench the fused train chunk: dtype x batch variants.

Usage: python scripts/step_micro.py
Prints steps/s for (f32, bf16) x (batch 3, 8) after warmup.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "data/JRC_SS05008-20160318_24_B2_crop.zarr"


def main():
    import dataclasses

    import jax

    from patchperpix_tpu.models import PPPConfig, PPPModel
    from patchperpix_tpu.train import (AugmentConfig, DeviceSampler,
                                       SamplerConfig, TrainConfig,
                                       load_sample)
    from patchperpix_tpu.train.trainer import (make_fused_chunk,
                                               make_optimizer)

    sample = load_sample(FIXTURE, "volumes/raw", "volumes/gt_instances",
                         clipmax=1500)
    ps = (7, 7, 7)
    base = PPPConfig(
        patchshape=ps, num_channels=3, num_fmaps=20,
        fmap_inc_factors=(3, 3), fmap_dec_factors=(1.0, 1.0),
        downsample_factors=((2, 2, 2), (2, 2, 2)),
        overlapping_inst=True, max_num_inst=2,
        train_code=False, padding="same")
    crop = (40, 40, 40)
    K = 100

    variants = [("float32", 3), ("bfloat16", 3), ("float32", 8),
                ("bfloat16", 8)]
    if len(sys.argv) > 2:
        variants = [(sys.argv[1], int(sys.argv[2]))]
    for dtype, batch in variants:
        if True:
            mcfg = dataclasses.replace(base, dtype=dtype)
            model = PPPModel(mcfg)
            scfg = SamplerConfig(
                input_shape=crop, output_shape=crop, patchshape=ps,
                batch_size=batch, probability_fg=0.8,
                probability_overlap=0.15, probability_random=0.05,
                augment=AugmentConfig(elastic=False))
            ds = DeviceSampler([sample], scfg, max_gt_channels=3)
            tcfg = TrainConfig(lr=1e-3, log_every=K, checkpoints=10 * K)
            opt = make_optimizer(tcfg)
            chunk = make_fused_chunk(model, mcfg, tcfg, opt, ds, K)
            rng = jax.random.PRNGKey(0)
            raw0, _, _ = jax.jit(ds.sample_batch)(rng)
            params = model.init(rng, raw0, method=PPPModel.full_init)
            opt_state = opt.init(params)
            import jax.numpy as jnp

            swa_p = jnp.zeros(())
            swa_n = jnp.asarray(0, jnp.int32)
            # warmup (compile)
            (params, opt_state, swa_p, swa_n, _), mets = chunk(
                params, opt_state, swa_p, swa_n, rng,
                jnp.asarray(0, jnp.int32))
            float(np.asarray(mets["loss"][-1]))
            t0 = time.perf_counter()
            n_chunks = 3
            for i in range(n_chunks):
                (params, opt_state, swa_p, swa_n, _), mets = chunk(
                    params, opt_state, swa_p, swa_n,
                    jax.random.PRNGKey(i + 1),
                    jnp.asarray((i + 1) * K, jnp.int32))
            float(np.asarray(mets["loss"][-1]))
            dt = time.perf_counter() - t0
            print(json.dumps({
                "dtype": dtype, "batch": batch,
                "steps_per_s": round(n_chunks * K / dt, 2),
                "vox_per_s": round(n_chunks * K * batch * 40 ** 3 / dt),
                "loss": float(np.asarray(mets["loss"][-1]))}), flush=True)


if __name__ == "__main__":
    main()
