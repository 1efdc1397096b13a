"""Diagnose WHERE trained-e2e accuracy dies (round-3 item 1 prep).

Loads the newest parity/train checkpoint (fmaps20, same-padding, crop 40^3
training windows), predicts the 50^3 crop, then isolates the stages:

  A. fg / numinst quality vs GT (IoU of derived masks)
  B. affinity quality vs GT affinities on the GT fg (jaccard at 0.5/0.9)
  C. assembly on PRED affs + GT fg/numinst   (assembly params isolated)
  D. assembly on PRED affs + PRED fg/numinst (full trained path)
     ... C/D swept over patch_threshold {0.5, 0.9}

Usage: python scripts/diagnose_trained.py [--win 40|full]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "data/JRC_SS05008-20160318_24_B2_crop.zarr"


def main():
    import jax
    import jax.numpy as jnp

    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
    from patchperpix_tpu.evaluate import evaluate_labels
    from patchperpix_tpu.infer.fused import predict_volume_device
    from patchperpix_tpu.models import PPPConfig, PPPModel
    from patchperpix_tpu.ops.synthetic import labels_to_affinities_multi
    from patchperpix_tpu.train import load_sample
    from patchperpix_tpu.train.trainer import (get_latest_checkpoint,
                                               load_checkpoint)

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

    ckpt, step = get_latest_checkpoint("parity/train")
    print(f"checkpoint: {ckpt} (step {step})", flush=True)
    rng = jax.random.PRNGKey(0)
    raw0 = np.zeros((1, 3, 16, 16, 16), np.float32)
    params = model.init(rng, jnp.asarray(raw0), method=PPPModel.full_init)
    import optax
    opt = optax.adam(1e-3)
    tmpl = {"params": params, "opt_state": opt.init(params), "step": 0}
    state = load_checkpoint(ckpt, tmpl)
    params = state["params"]

    win = "full" if "--win" in sys.argv and \
        sys.argv[sys.argv.index("--win") + 1] == "full" else "40"
    if win == "full":
        crop = (52, 52, 52)
    else:
        crop = (40, 40, 40)
    print(f"predict window {crop}", flush=True)
    t0 = time.perf_counter()
    h1, h2 = predict_volume_device(model, params, sample.raw, mcfg,
                                   crop, crop)
    print(f"predict {time.perf_counter()-t0:.1f}s", flush=True)

    prob = np.asarray(h2, np.float32)
    affs = np.asarray(h1, np.float32)

    # GT side
    gt_numinst = np.sum(sample.labels > 0, axis=0).astype(np.uint8)
    gt_fg = gt_numinst > 0
    gt_affs = labels_to_affinities_multi(sample.labels, np.array(ps))

    # A: fg / numinst quality
    from patchperpix_tpu.assembly.vote_instances import numinst_from_probs

    numinst = numinst_from_probs(
        prob, VoteInstancesParams(patchshape=ps,
                                  numinst_threshs=(0.9, 0.1)))
    fg = numinst > 0
    iou_fg = (fg & gt_fg).sum() / max((fg | gt_fg).sum(), 1)
    acc_ni = (numinst == gt_numinst)[gt_fg | fg].mean()
    print(json.dumps({
        "fg_iou": float(iou_fg),
        "numinst_acc_on_union": float(acc_ni),
        "fg_pred": int(fg.sum()), "fg_gt": int(gt_fg.sum()),
        "n2_pred": int((numinst == 2).sum()),
        "n2_gt": int((gt_numinst == 2).sum())}), flush=True)

    # B: affinity quality on GT fg
    for th in (0.5, 0.9):
        pa = affs[:, gt_fg] > th
        ga = gt_affs[:, gt_fg] > 0.5
        jac = (pa & ga).sum() / max((pa | ga).sum(), 1)
        print(json.dumps({"aff_thresh": th, "aff_jaccard_on_gtfg":
                          float(jac)}), flush=True)

    def run_asm(aff_in, fgm, nim, pt):
        pv = VoteInstancesParams(
            patchshape=ps, engine="jax", overlapping_inst=True, mws=True,
            patch_threshold=pt, fc_threshold=0.5,
            select_patches_for_sparse_data=True,
            skeletonize_foreground=True, remove_small_comps=60)
        inst, _ = to_instance_seg(jax.device_put(jnp.asarray(aff_in)),
                                  fgm, fgm.copy(), nim, pv)
        inst = np.asarray(inst)
        inst[~fgm] = 0
        from patchperpix_tpu.utils.postprocess import remove_small_components
        inst = remove_small_components(inst, 60)
        res = evaluate_labels(inst, sample.labels,
                              localization_criterion="cldice",
                              assignment_strategy="greedy",
                              keep_gt_shape=True)
        g = res["general"]
        cm = res["confusion_matrix"]
        return {"avg_f1_cov": g.get("avg_f1_cov_score"),
                "skel_cov": g.get("avg_gt_skel_coverage"),
                "AP_0.5": cm["th_0_5"]["AP"],
                "avFscore": cm["avFscore"],
                "num_pred": g["Num Pred"]}

    out = {}
    for pt in (0.5, 0.9):
        out[f"C_gtfg_pt{pt}"] = run_asm(affs, gt_fg, gt_numinst, pt)
        print(f"C pt={pt}: {json.dumps(out[f'C_gtfg_pt{pt}'])}", flush=True)
        out[f"D_predfg_pt{pt}"] = run_asm(affs, fg, numinst, pt)
        print(f"D pt={pt}: {json.dumps(out[f'D_predfg_pt{pt}'])}", flush=True)

    with open("parity/diagnose.json", "w") as f:
        json.dump(out, f, indent=1, default=float)
    print("written parity/diagnose.json", flush=True)


if __name__ == "__main__":
    main()
