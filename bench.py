"""Benchmark: end-to-end predict -> decode -> assemble on the FlyLight crop.

North-star metric (BASELINE.json): Mvox/s for the full pipeline on one TPU
chip vs the reference's CPU throughput.

TPU path (fused, device-resident - no intermediate volume ever crosses the
host relay): flagship ppp+dec model (3-level valid UNet, code 176, 7^3
patches) sliding-window predict -> on-device code decode at the GT fg
voxels -> vote-instances assembly of GT-derived affinities (workload pinned
to the GT so instance count / fg voxels are deterministic; predict+decode
run on the real model at the same shapes).

Baseline (denominator): measured ONCE on this host with
``python bench.py --measure-baseline`` and cached in
``bench_baseline.json`` (committed):
- torch-CPU sliding-window predict + batched decode with an
  architecture-equivalent model (benchmarks/torch_baseline.py; the
  reference's own stack is torch)
- numpy golden assembly of the FULL 50^3 volume (no subvolume scaling)

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "Mvox/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

PS = (7, 7, 7)
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "data/JRC_SS05008-20160318_24_B2_crop.zarr")


def build_inputs(size=None, patchshape=PS):
    from patchperpix_tpu.ops.synthetic import labels_to_affinities_multi
    from patchperpix_tpu.utils import io as vio

    io = vio.IoZarr(FIXTURE)
    labels = io.read(key="volumes/gt_instances").astype(np.int32)
    if size is not None:
        labels = labels[:, :size, :size, :size]
    affs = labels_to_affinities_multi(labels, patchshape)
    numinst = np.sum(labels > 0, axis=0).astype(np.uint8)
    fg = numinst > 0
    return affs, fg, numinst


def load_raw():
    from patchperpix_tpu.utils import io as vio

    io = vio.IoZarr(FIXTURE)
    raw = io.read(key="volumes/raw").astype(np.float32)
    return raw / max(float(raw.max()), 1e-6)


def flagship_model():
    from patchperpix_tpu.models import PPPConfig, PPPModel

    cfg = PPPConfig(
        patchshape=PS, num_channels=3, num_fmaps=20,
        fmap_inc_factors=(3, 3, 3), fmap_dec_factors=(1.2, 1.2, 1.2),
        downsample_factors=((2, 2, 2),) * 3, kernel_size=3,
        num_repetitions=2, padding="valid", overlapping_inst=True,
        max_num_inst=2, train_code=True, code_units=176, ae_code_fmaps=22,
        ae_num_fmaps=(64, 128), num_code_samples=1024)
    return PPPModel(cfg), cfg


def net_shapes(model, cfg, input_extent=156):
    import jax
    import jax.numpy as jnp

    in_sp = (input_extent,) * 3
    raw = jnp.zeros((1, cfg.num_channels) + in_sp, jnp.float32)
    shapes = jax.eval_shape(
        lambda r: model.init_with_output(jax.random.PRNGKey(0), r)[0], raw)
    return in_sp, tuple(shapes[0].shape[2:])


def run_assembly(affs, fg, numinst, engine, patchshape=PS):
    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg

    params = VoteInstancesParams(
        patchshape=tuple(patchshape), engine=engine,
        patch_threshold=0.5, fc_threshold=0.5,
        overlapping_inst=True, mws=True,
        select_patches_for_sparse_data=True,
        skeletonize_foreground=False)
    return to_instance_seg(affs, fg, fg.copy(), numinst, params)


def _sync(x):
    """Force completion with a host readback (axon block_until_ready
    returns at dispatch)."""
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def measure_baseline():
    """One-time CPU baseline; writes bench_baseline.json."""
    from benchmarks.torch_baseline import (decode_baseline_cpu,
                                           predict_baseline_cpu)

    out = {}
    if os.path.exists("bench_baseline_assembly.json"):
        out.update(json.load(open("bench_baseline_assembly.json")))
    else:
        affs, fg, numinst = build_inputs()
        t0 = time.perf_counter()
        run_assembly(affs, fg, numinst, "numpy")
        out["t_assemble_numpy_full_s"] = time.perf_counter() - t0
        out["fg_vox"] = int(fg.sum())

    raw = load_raw()
    # same window grid as the TPU path (abstract shape eval, no device)
    model, cfg = flagship_model()
    in_sp, out_sp = net_shapes(model, cfg)
    t_pred = predict_baseline_cpu(raw, in_sp, out_sp)
    t_dec = decode_baseline_cpu(out.get("fg_vox", 21819))
    out["t_predict_torch_cpu_s"] = t_pred
    out["t_decode_torch_cpu_s"] = t_dec
    out["host"] = os.uname().nodename
    json.dump(out, open(BASELINE_FILE, "w"), indent=1)
    print(json.dumps(out), file=sys.stderr)


def main():
    import jax

    affs, fg, numinst = build_inputs()
    nvox = int(np.prod(fg.shape))
    nfg = int(fg.sum())
    raw = load_raw()

    model, cfg = flagship_model()
    in_sp, out_sp = net_shapes(model, cfg)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    params = model.init(rng, jnp.zeros((1, 3, 108, 108, 108)),
                        method=model.full_init)

    from patchperpix_tpu.infer.fused import (decode_volume_device,
                                             predict_volume_device)

    affs_dev = jax.device_put(jnp.asarray(affs))  # uploaded once, untimed

    def pipeline(timing):
        t0 = time.perf_counter()
        code, ni = predict_volume_device(model, params, raw, cfg,
                                         in_sp, out_sp)
        _sync(code)
        t1 = time.perf_counter()
        dec = decode_volume_device(model, params, code, fg, cfg)
        _sync(dec)
        t2 = time.perf_counter()
        inst, _ = run_assembly(affs_dev, fg, numinst, "jax")
        t3 = time.perf_counter()
        timing.update(predict=t1 - t0, decode=t2 - t1, assemble=t3 - t2,
                      total=t3 - t0)
        return inst

    warm = {}
    pipeline(warm)   # compile warmup
    t = {}
    inst = pipeline(t)
    n_inst = len(np.unique(inst[inst > 0]))
    print(json.dumps({"warmup": warm, "steady": t}), file=sys.stderr)

    if os.path.exists(BASELINE_FILE):
        b = json.load(open(BASELINE_FILE))
        # assembly denominator: the ACTUAL reference CPU vote_instances
        # (benchmarks/reference_cpu.py, measured once on this host) when
        # available; else this repo's numpy golden (parity-tested, faster
        # than the reference, i.e. a CONSERVATIVE stand-in)
        t_asm = b.get("t_assemble_reference_full_s",
                      b["t_assemble_numpy_full_s"])
        t_base = (b["t_predict_torch_cpu_s"] + b["t_decode_torch_cpu_s"]
                  + t_asm)
    else:  # fallback: scaled mini numpy assembly only (round-1 method)
        sub = 24
        affs_s, fg_s, ni_s = build_inputs(size=sub)
        t0 = time.perf_counter()
        run_assembly(affs_s, fg_s, ni_s, "numpy")
        t_base = (time.perf_counter() - t0) * nfg / max(int(fg_s.sum()), 1)

    mvox_s = nvox / t["total"] / 1e6
    print(json.dumps({
        "metric": "flylight-50^3 7^3 predict->decode->assemble"
                  f" [{n_inst} instances, {nfg} fg vox]",
        "value": round(mvox_s, 4),
        "unit": "Mvox/s",
        "vs_baseline": round(t_base / t["total"], 2),
    }))


if __name__ == "__main__":
    if "--measure-baseline" in sys.argv:
        measure_baseline()
    else:
        main()
