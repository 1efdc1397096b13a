"""Assembly-parameter sweep for a trained checkpoint (round-3 item 1).

Predicts the shipped FlyLight crop ONCE with a CLI-trained checkpoint,
then sweeps vote_instances parameters (patch_threshold / fc_threshold /
mws / skeletonize / numinst_threshs) on the device and, for each
assembly, the evaluation-side remove_small_components filter (the
reference's recipe: ignore_small_comps=200 at assembly,
remove_small_components=500 at evaluation — default.toml vote_instances
+ evaluation sections).  Mirrors the reference's validate_checkpoints
grid search (run_ppp.py:919-1051) as an in-process loop so the sweep
reuses the single prediction.

Usage: python scripts/sweep_assembly.py [--exp experiments_out/crop_r3_ft]
           [--ckpt N] [--out parity/sweep_ft.json]
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
    ap.add_argument("--exp", default="experiments_out/crop_r3_ft")
    ap.add_argument("--ckpt", type=int, default=0, help="0 = latest")
    ap.add_argument("--out", default="parity/sweep_ft.json")
    ap.add_argument("--quick", action="store_true",
                    help="only the reference-recipe rows")
    ap.add_argument("--only", default=None,
                    help="run a single combo by name")
    ap.add_argument("--rms", default=None,
                    help="comma list of eval-side remove_small_components "
                         "filters (default 0,200,400,500,600)")
    ap.add_argument("--anchor", action="store_true",
                    help="re-score the best row under both metric "
                         "families and write the trained_e2e anchor "
                         "into parity/results.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
    from patchperpix_tpu.cli import _build_model
    from patchperpix_tpu.config import load_config
    from patchperpix_tpu.evaluate import evaluate_labels
    from patchperpix_tpu.infer.fused import predict_volume_device
    from patchperpix_tpu.train import load_sample
    from patchperpix_tpu.train.trainer import (get_latest_checkpoint,
                                               load_checkpoint)
    from patchperpix_tpu.utils.postprocess import remove_small_components

    config = load_config(os.path.join(args.exp, "config.toml"))
    model, mcfg = _build_model(config)
    ps = tuple(config["model"]["patchshape"])

    train_dir = os.path.join(args.exp, "train")
    if args.ckpt:
        ckpt = os.path.join(train_dir, f"train_net_checkpoint_{args.ckpt}")
        step = args.ckpt
    else:
        ckpt, step = get_latest_checkpoint(train_dir)
    print(f"checkpoint: {ckpt} (step {step})", flush=True)
    state = load_checkpoint(ckpt)
    params = state["params"]

    clipmax = config.get("preprocessing", {}).get("clipmax", 1500)
    sample = load_sample(FIXTURE, config["data"]["raw_key"],
                         config["data"]["gt_key"], clipmax=clipmax)
    crop = tuple(config["model"]["test_input_shape_same"])
    t0 = time.perf_counter()
    h1, h2 = predict_volume_device(model, params, sample.raw, mcfg,
                                   crop, crop)
    # keep affinities (or codes, for ppp+dec) on device
    h1 = h1 if isinstance(h1, jax.Array) else jnp.asarray(h1)
    prob = np.asarray(h2, np.float32)
    print(f"predict {time.perf_counter() - t0:.1f}s", flush=True)

    dec_cache = {}

    def affs_for(fg, ni_key):
        """Dense affinities on device; ppp+dec decodes per fg variant."""
        if not mcfg.train_code:
            return h1
        if ni_key not in dec_cache:
            from patchperpix_tpu.infer.fused import decode_volume_device

            dec_cache[ni_key] = decode_volume_device(
                model, params, h1, fg, mcfg)
        return dec_cache[ni_key]

    def derive_numinst(threshs):
        numinst = np.zeros(prob.shape[1:], dtype=np.uint8)
        for i, t in enumerate(threshs):
            numinst[prob[i + 1] > t] = i + 1
        return numinst

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

    # assembly combos; each is evaluated at several eval-side filters
    combos = [
        dict(name="ref", pt=0.5, fc=0.5, mws=True, skel=True,
             ni=(0.9, 0.1)),
        dict(name="nomws", pt=0.5, fc=0.5, mws=False, skel=True,
             ni=(0.9, 0.1)),
        dict(name="pt0.4", pt=0.4, fc=0.4, mws=True, skel=True,
             ni=(0.9, 0.1)),
        dict(name="pt0.6", pt=0.6, fc=0.6, mws=True, skel=True,
             ni=(0.9, 0.1)),
        dict(name="fc0.7", pt=0.5, fc=0.7, mws=True, skel=True,
             ni=(0.9, 0.1)),
        dict(name="noskel", pt=0.5, fc=0.5, mws=True, skel=False,
             ni=(0.9, 0.1)),
        dict(name="ni0.8_0.2", pt=0.5, fc=0.5, mws=True, skel=True,
             ni=(0.8, 0.2)),
        dict(name="ni0.9_0.3", pt=0.5, fc=0.5, mws=True, skel=True,
             ni=(0.9, 0.3)),
        # lower patch-fg threshold for cover/graph only: bigger patch fg
        # sets -> more cross-patch pixel pairs -> stronger merge edges
        dict(name="fc0.4", pt=0.5, fc=0.4, mws=True, skel=True,
             ni=(0.9, 0.1)),
        dict(name="fc0.3", pt=0.5, fc=0.3, mws=True, skel=True,
             ni=(0.9, 0.1)),
        # second selection pass around overlap regions
        # (select_patches_overlap_neighborhood, foreground_cover.py:53-85)
        dict(name="ovn", pt=0.5, fc=0.5, mws=True, skel=True,
             ni=(0.9, 0.1), ovn=True),
        dict(name="pt0.6fc0.4", pt=0.6, fc=0.4, mws=True, skel=True,
             ni=(0.9, 0.1)),
        # noskel (full-fg cover) swept best at the r5 360k checkpoint;
        # cross it with the other winning knobs
        dict(name="noskel0.6", pt=0.6, fc=0.6, mws=True, skel=False,
             ni=(0.9, 0.1)),
        dict(name="noskel0.6fc0.5", pt=0.6, fc=0.5, mws=True, skel=False,
             ni=(0.9, 0.1)),
        dict(name="noskel_ni0.9_0.3", pt=0.5, fc=0.5, mws=True,
             skel=False, ni=(0.9, 0.3)),
    ]
    if args.only:
        combos = [c for c in combos if c["name"] == args.only]
    elif args.quick:
        combos = combos[:1]
    rms = tuple(int(r) for r in args.rms.split(",")) if args.rms \
        else (0, 200, 400, 500, 600)

    results = {"checkpoint": step, "exp": args.exp, "rows": []}
    best = None
    for c in combos:
        numinst = derive_numinst(c["ni"])
        fg = numinst > 0
        pv = VoteInstancesParams(
            patchshape=ps, engine="jax", overlapping_inst=True,
            mws=c["mws"], patch_threshold=c["pt"], fc_threshold=c["fc"],
            select_patches_for_sparse_data=True,
            select_patches_overlap_neighborhood=c.get("ovn", False),
            skeletonize_foreground=c["skel"])
        t0 = time.perf_counter()
        inst, _ = to_instance_seg(affs_for(fg, c["ni"]), fg, fg.copy(),
                                  numinst, pv)
        inst = np.asarray(inst)
        inst[~fg] = 0
        dt = time.perf_counter() - t0
        for rm in rms:
            row = {"combo": c["name"], "rm": rm, "asm_s": round(dt, 2),
                   **evaluate(inst.copy(), rm)}
            results["rows"].append(row)
            tag = f"{c['name']}_rm{rm}"
            print(f"RESULT {tag} avg_f1_cov {row['avg_f1_cov']} "
                  f"skel {row['skel_cov']} avF {row['avFscore']} "
                  f"AP05 {row['AP_0.5']} npred {row['num_pred']}",
                  flush=True)
            if best is None or row["avg_f1_cov"] > best["avg_f1_cov"]:
                best = row
    results["best"] = best
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("BEST", json.dumps(best), flush=True)

    if args.anchor and best is not None:
        bc = next(c for c in combos if c["name"] == best["combo"])
        numinst = derive_numinst(bc["ni"])
        fg = numinst > 0
        pv = VoteInstancesParams(
            patchshape=ps, engine="jax", overlapping_inst=True,
            mws=bc["mws"], patch_threshold=bc["pt"],
            fc_threshold=bc["fc"],
            select_patches_for_sparse_data=True,
            select_patches_overlap_neighborhood=bc.get("ovn", False),
            skeletonize_foreground=bc["skel"])
        inst, _ = to_instance_seg(affs_for(fg, bc["ni"]), fg, fg.copy(),
                                  numinst, pv)
        inst = np.asarray(inst)
        inst[~fg] = 0
        inst = remove_small_components(inst, best["rm"])
        anchor = {"checkpoint": step, "exp_base": args.exp,
                  "source": "cli",
                  "assembly_params": {**{k: v for k, v in bc.items()
                                         if k != "name"},
                                      "eval_remove_small": best["rm"]}}
        for name, (loc, asg) in {"iou_hungarian": ("iou", "hungarian"),
                                 "cldice_greedy": ("cldice", "greedy")
                                 }.items():
            res = evaluate_labels(inst, sample.labels,
                                  localization_criterion=loc,
                                  assignment_strategy=asg,
                                  keep_gt_shape=True)
            g, cm = res["general"], res["confusion_matrix"]
            ths = [f"th_0_{i}" for i in range(5, 10)]
            anchor[name] = {
                "avS_0.5:0.9": float(np.mean(
                    [cm[t]["AP"] for t in ths if t in cm])),
                "avFscore": float(cm["avFscore"]),
                "AP_0.5": float(cm["th_0_5"]["AP"]),
                "fscore_0.5": float(cm["th_0_5"]["fscore"]),
                "num_gt": int(g["Num GT"]),
                "num_pred": int(g["Num Pred"]),
                "avg_f1_cov_score": float(g["avg_f1_cov_score"]),
                "avg_gt_skel_coverage": float(g["avg_gt_skel_coverage"]),
            }
        res_path = "parity/results.json"
        blob = json.load(open(res_path)) if os.path.exists(res_path) \
            else {}
        tl = os.path.join(args.exp, "train", "train_log.jsonl")
        if os.path.exists(tl):
            with open(tl) as f:
                last = json.loads(f.readlines()[-1])
            anchor["final_train_loss"] = last.get("loss")
        anchor["train_iters"] = step
        blob["trained_e2e"] = anchor
        with open(res_path, "w") as f:
            json.dump(blob, f, indent=1)
        print("ANCHOR", json.dumps(anchor["cldice_greedy"]), flush=True)


if __name__ == "__main__":
    main()
