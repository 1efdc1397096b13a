"""Checkpoint selection over a trained run (round-5 item 1).

Loops over a list of checkpoints of one experiment, runs the
self-consistent pipeline (predict -> own-fg decode -> assemble) on the
shipped FlyLight crop for each, and scores avg_f1_cov / AP@0.5 under a
small grid of assembly params x eval-side small-component filters.
This is the reference's validate_checkpoints protocol
(run_ppp.py:919-1051) collapsed into one process so the predict/decode/
assembly compilations are shared across checkpoints.

Usage:
  python scripts/select_checkpoint.py --exp experiments_out/crop_r4_dec \
      --ckpts 200000,250000,300000,340000,360000,380000,400000 \
      --out parity/select_r5.json
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
    ap.add_argument("--exp", default="experiments_out/crop_r4_dec")
    ap.add_argument("--ckpts", required=True,
                    help="comma-separated checkpoint iterations")
    ap.add_argument("--out", default="parity/select_r5.json")
    ap.add_argument("--combos", default="ref,pt0.6",
                    help="assembly combos to score per checkpoint")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patchperpix_tpu.assembly import (VoteInstancesParams,
                                          to_instance_seg)
    from patchperpix_tpu.cli import _build_model
    from patchperpix_tpu.config import load_config
    from patchperpix_tpu.evaluate import evaluate_labels
    from patchperpix_tpu.infer.fused import (decode_volume_device,
                                             predict_volume_device)
    from patchperpix_tpu.train import load_sample
    from patchperpix_tpu.train.trainer import (checkpoint_path,
                                               load_checkpoint)
    from patchperpix_tpu.utils.postprocess import remove_small_components

    config = load_config(os.path.join(args.exp, "config.toml"))
    model, mcfg = _build_model(config)
    ps = tuple(config["model"]["patchshape"])
    clipmax = config.get("preprocessing", {}).get("clipmax", 1500)
    sample = load_sample(FIXTURE, config["data"]["raw_key"],
                         config["data"]["gt_key"], clipmax=clipmax)
    crop = tuple(config["model"]["test_input_shape_same"])

    all_combos = {
        "ref": dict(pt=0.5, fc=0.5, mws=True, skel=True, ni=(0.9, 0.1)),
        "pt0.6": dict(pt=0.6, fc=0.6, mws=True, skel=True, ni=(0.9, 0.1)),
        "pt0.6fc0.4": dict(pt=0.6, fc=0.4, mws=True, skel=True,
                           ni=(0.9, 0.1)),
        # full-fg cover (no skeletonize) swept best on the r5 SWA
        # checkpoints (parity/sweep_r5_swa*.json)
        "noskel0.6": dict(pt=0.6, fc=0.6, mws=True, skel=False,
                          ni=(0.9, 0.1)),
        "noskel0.6fc0.5": dict(pt=0.6, fc=0.5, mws=True, skel=False,
                               ni=(0.9, 0.1)),
    }
    combos = {k: all_combos[k] for k in args.combos.split(",")}
    rms = (0, 200, 400, 500)

    results = {"exp": args.exp, "rows": []}
    best = None
    for step in [int(c) for c in args.ckpts.split(",")]:
        ckpt = checkpoint_path(os.path.join(args.exp, "train"), step)
        state = load_checkpoint(ckpt)
        params = state["params"]
        t0 = time.perf_counter()
        h1, h2 = predict_volume_device(model, params, sample.raw, mcfg,
                                       crop, crop)
        h1 = h1 if isinstance(h1, jax.Array) else jnp.asarray(h1)
        prob = np.asarray(h2, np.float32)
        t_pred = time.perf_counter() - t0
        for cname, c in combos.items():
            numinst = np.zeros(prob.shape[1:], dtype=np.uint8)
            for i, t in enumerate(c["ni"]):
                numinst[prob[i + 1] > t] = i + 1
            fg = numinst > 0
            affs = (decode_volume_device(model, params, h1, fg, mcfg)
                    if mcfg.train_code else h1)
            pv = VoteInstancesParams(
                patchshape=ps, engine="jax", overlapping_inst=True,
                mws=c["mws"], patch_threshold=c["pt"],
                fc_threshold=c["fc"],
                select_patches_for_sparse_data=True,
                skeletonize_foreground=c["skel"])
            inst, _ = to_instance_seg(affs, fg, fg.copy(), numinst, pv)
            inst = np.asarray(inst)
            inst[~fg] = 0
            for rm in rms:
                out = remove_small_components(inst.copy(), rm) if rm \
                    else inst
                res = evaluate_labels(out, sample.labels,
                                      localization_criterion="cldice",
                                      assignment_strategy="greedy",
                                      keep_gt_shape=True)
                g = res["general"]
                cm = res["confusion_matrix"]
                row = {
                    "ckpt": step, "combo": cname, "rm": rm,
                    "avg_f1_cov": round(float(g["avg_f1_cov_score"]), 4),
                    "skel_cov": round(
                        float(g["avg_gt_skel_coverage"]), 4),
                    "avFscore": round(float(cm["avFscore"]), 4),
                    "AP_0.5": round(float(cm["th_0_5"]["AP"]), 4),
                    "num_pred": int(np.unique(out).size - 1),
                }
                results["rows"].append(row)
                print(f"RESULT ckpt {step} {cname}_rm{rm} "
                      f"avg_f1_cov {row['avg_f1_cov']} "
                      f"AP05 {row['AP_0.5']} npred {row['num_pred']}",
                      flush=True)
                if best is None or row["avg_f1_cov"] > best["avg_f1_cov"]:
                    best = row
        print(f"ckpt {step} done (predict {t_pred:.1f}s)", flush=True)
        results["best"] = best
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print("BEST", json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
