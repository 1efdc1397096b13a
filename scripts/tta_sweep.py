"""Flip-TTA A/B on the trained 400k-SWA anchor (round-5 accuracy push).

The r5 anchor (parity/results.json trained_e2e) sits at avg_f1_cov
0.6746 with single-orientation prediction; fine-tuning at two lrs could
not beat it.  This sweeps the remaining inference-side lever: averaging
the 2^3 spatial flips (infer/tta.py) — numinst/fg averaged in softmax
space, ppp+dec codes decoded per flip at the shared fg and averaged in
patch-probability space.  Assembly combos are the sweep winners from
parity/sweep_r5_swa*.json.

Modes: full TTA, prob-only (averaged numinst, identity-flip affs),
affs-only (identity-flip numinst, averaged affs) — attributes the gain.

Usage: python scripts/tta_sweep.py [--exp experiments_out/crop_r4_swa]
           [--ckpt 400000] [--out parity/sweep_r5_tta.json]
           [--modes full,prob,affs] [--flips 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "data/JRC_SS05008-20160318_24_B2_crop.zarr"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default=None,
                    help="experiment dir (config.toml + train/); default "
                         "is the committed bench checkpoint")
    ap.add_argument("--config", default="configs/flylight_crop_dec.toml")
    ap.add_argument("--ckpt-dir", default="parity/bench_ckpt",
                    help="params-only checkpoint dir (used when no --exp)")
    ap.add_argument("--ckpt", type=int, default=0)
    ap.add_argument("--out", default="parity/sweep_r5_tta.json")
    ap.add_argument("--modes", default="full,prob,affs")
    ap.add_argument("--flips", type=int, default=8,
                    help="number of flips (prefix of all_flips; 8 = all)")
    ap.add_argument("--rms", default="0,200,400,500,600")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
    from patchperpix_tpu.cli import _build_model
    from patchperpix_tpu.config import load_config
    from patchperpix_tpu.evaluate import evaluate_labels
    from patchperpix_tpu.infer.tta import (all_flips, decode_tta,
                                           predict_tta, unflip_affs)
    from patchperpix_tpu.train import load_sample
    from patchperpix_tpu.train.trainer import (get_latest_checkpoint,
                                               load_checkpoint)
    from patchperpix_tpu.utils.postprocess import remove_small_components

    cfg_path = os.path.join(args.exp, "config.toml") if args.exp \
        else args.config
    config = load_config(cfg_path)
    model, mcfg = _build_model(config)
    ps = tuple(config["model"]["patchshape"])

    if args.exp:
        train_dir = os.path.join(args.exp, "train")
        if args.ckpt:
            ckpt = os.path.join(train_dir,
                                f"train_net_checkpoint_{args.ckpt}")
            step = args.ckpt
        else:
            ckpt, step = get_latest_checkpoint(train_dir)
        params = load_checkpoint(ckpt)["params"]
    else:
        ckpt, step = args.ckpt_dir, "bench"
        import jax.numpy as _jnp
        tmpl = jax.eval_shape(
            lambda r: model.init(jax.random.PRNGKey(0), r,
                                 method=model.full_init),
            _jnp.zeros((1, mcfg.num_channels, 16, 16, 16), _jnp.float32))
        tmpl = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), tmpl)
        params = load_checkpoint(ckpt, {"params": tmpl})["params"]
    print(f"checkpoint: {ckpt} (step {step})", flush=True)

    clipmax = config.get("preprocessing", {}).get("clipmax", 1500)
    sample = load_sample(FIXTURE, config["data"]["raw_key"],
                         config["data"]["gt_key"], clipmax=clipmax)
    crop = tuple(config["model"]["test_input_shape_same"])

    flips = all_flips(3)[: args.flips]
    t0 = time.perf_counter()
    heads1, prob_mean = predict_tta(model, params, sample.raw, mcfg,
                                    crop, crop, flips=flips)
    prob_tta = np.asarray(prob_mean, np.float32)
    # identity-orientation head2 for the single-orientation ablations
    from patchperpix_tpu.infer.fused import predict_volume_device
    _, h2_id = predict_volume_device(model, params, sample.raw, mcfg,
                                     crop, crop)
    prob_single = np.asarray(h2_id, np.float32)
    print(f"predict x{len(flips)} {time.perf_counter() - t0:.1f}s",
          flush=True)

    def derive_numinst(prob, threshs):
        numinst = np.zeros(prob.shape[1:], dtype=np.uint8)
        for i, t in enumerate(threshs):
            numinst[prob[i + 1] > t] = i + 1
        return numinst

    dec_cache = {}

    def affs_for(mode, fg, key):
        """Dense affinities on device for the given TTA mode."""
        ck = (mode if mode != "prob" else "single", key)
        if ck in dec_cache:
            return dec_cache[ck]
        if mcfg.train_code:
            if mode in ("full", "affs"):
                a = decode_tta(model, params, heads1, fg, mcfg)
            else:  # prob-only: identity-flip decode
                from patchperpix_tpu.infer.fused import decode_volume_device
                a = decode_volume_device(model, params, heads1[0][1],
                                         fg, mcfg)
        else:
            from patchperpix_tpu.infer.tta import average_affs
            if mode in ("full", "affs"):
                a = average_affs(heads1, ps)
            else:
                a = heads1[0][1]
        dec_cache[ck] = a
        return a

    def evaluate(inst, rm):
        out = remove_small_components(inst, rm) if rm else inst
        res = evaluate_labels(out, sample.labels,
                              localization_criterion="cldice",
                              assignment_strategy="greedy",
                              keep_gt_shape=True)
        g = res["general"]
        cm = res["confusion_matrix"]
        return {"avg_f1_cov": round(float(g["avg_f1_cov_score"]), 4),
                "skel_cov": round(float(g["avg_gt_skel_coverage"]), 4),
                "avFscore": round(float(cm["avFscore"]), 4),
                "AP_0.5": round(float(cm["th_0_5"]["AP"]), 4),
                "num_pred": int(np.unique(out).size - 1)}

    combos = [
        dict(name="noskel0.6fc0.5", pt=0.6, fc=0.5, mws=True, skel=False,
             ni=(0.9, 0.1)),
        dict(name="noskel0.6", pt=0.6, fc=0.6, mws=True, skel=False,
             ni=(0.9, 0.1)),
        dict(name="pt0.6", pt=0.6, fc=0.6, mws=True, skel=True,
             ni=(0.9, 0.1)),
        dict(name="ref", pt=0.5, fc=0.5, mws=True, skel=True,
             ni=(0.9, 0.1)),
    ]
    rms = tuple(int(r) for r in args.rms.split(","))
    modes = args.modes.split(",")

    results = {"checkpoint": step, "exp": args.exp,
               "flips": len(flips), "rows": []}
    best = None
    for mode in modes:
        prob = prob_tta if mode in ("full", "prob") else prob_single
        for c in combos:
            numinst = derive_numinst(prob, c["ni"])
            fg = numinst > 0
            pv = VoteInstancesParams(
                patchshape=ps, engine="jax", overlapping_inst=True,
                mws=c["mws"], patch_threshold=c["pt"],
                fc_threshold=c["fc"],
                select_patches_for_sparse_data=True,
                skeletonize_foreground=c["skel"])
            t0 = time.perf_counter()
            inst, _ = to_instance_seg(affs_for(mode, fg, c["ni"]), fg,
                                      fg.copy(), numinst, pv)
            inst = np.asarray(inst)
            inst[~fg] = 0
            dt = time.perf_counter() - t0
            for rm in rms:
                row = {"mode": mode, "combo": c["name"], "rm": rm,
                       "asm_s": round(dt, 2),
                       **evaluate(inst.copy(), rm)}
                results["rows"].append(row)
                print(f"RESULT {mode}:{c['name']}_rm{rm} "
                      f"avg_f1_cov {row['avg_f1_cov']} "
                      f"skel {row['skel_cov']} avF {row['avFscore']} "
                      f"AP05 {row['AP_0.5']} npred {row['num_pred']}",
                      flush=True)
                if best is None or row["avg_f1_cov"] > best["avg_f1_cov"]:
                    best = row
    results["best"] = best
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("BEST", json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
