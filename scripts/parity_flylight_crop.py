"""Accuracy-parity anchor on the shipped FlyLight 50^3 crop.

Two measurements, written to parity/results.json (+ PARITY.md summary):

A. ORACLE assembly accuracy: vote_instances on GT-derived affinities
   (use_score_oracle seam, SURVEY §4) - isolates assembly quality from
   model quality.  The assembly must reconstruct the GT instances almost
   perfectly; this anchors the avAP-parity claim for the assembly half of
   the pipeline.

B. Trained end-to-end: overfit the 3D overlapping-instance model on the
   crop (the only real dataset shipped in this environment; BBBC010 /
   dsb2018 / ISBI raw data are not available here), then
   predict -> assemble -> evaluate.  This is a single-crop sanity number,
   NOT a benchmark reproduction - it demonstrates the training/inference
   path produces usable instances and records the score trajectory.

Scores reported in BASELINE.md terms: avS[0.5:0.9] = mean AP over IoU
thresholds 0.5..0.9 (README.md:96-135), plus the FlyLight
avg_f1_cov_score (clDice + greedy, run_ppp.py:1609-1654).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(_REPO, "data/JRC_SS05008-20160318_24_B2_crop.zarr")
OUT_DIR = os.path.join(_REPO, "parity")


def summarize(res: dict) -> dict:
    cm = res["confusion_matrix"]
    avs = float(np.mean([cm[f"th_0_{i}"]["AP"] for i in range(5, 10)]))
    out = {
        "avS_0.5:0.9": avs,
        "avFscore": cm["avFscore"],
        "AP_0.5": cm["th_0_5"]["AP"],
        "fscore_0.5": cm["th_0_5"]["fscore"],
        "num_gt": res["general"]["Num GT"],
        "num_pred": res["general"]["Num Pred"],
    }
    if "avg_f1_cov_score" in res["general"]:
        out["avg_f1_cov_score"] = res["general"]["avg_f1_cov_score"]
        out["avg_gt_skel_coverage"] = res["general"]["avg_gt_skel_coverage"]
    return out


def eval_both(inst, labels):
    from patchperpix_tpu.evaluate import evaluate_labels

    iou = evaluate_labels(inst, labels, localization_criterion="iou",
                          assignment_strategy="hungarian",
                          keep_gt_shape=True)
    cld = evaluate_labels(inst, labels, localization_criterion="cldice",
                          assignment_strategy="greedy", keep_gt_shape=True)
    return {"iou_hungarian": summarize(iou),
            "cldice_greedy": summarize(cld)}


def oracle_assembly(sample):
    """GT affinities -> assembly -> scores (expect ~perfect)."""
    import jax
    import jax.numpy as jnp

    from patchperpix_tpu.assembly import (VoteInstancesParams,
                                          to_instance_seg)
    from patchperpix_tpu.ops.synthetic import labels_to_affinities_multi

    ps = (7, 7, 7)
    affs = labels_to_affinities_multi(sample.labels, np.array(ps))
    numinst = np.sum(sample.labels > 0, axis=0).astype(np.uint8)
    fg = numinst > 0
    params = VoteInstancesParams(
        patchshape=ps, engine="jax", overlapping_inst=True, mws=True,
        select_patches_for_sparse_data=True)
    t0 = time.perf_counter()
    inst, _ = to_instance_seg(jax.device_put(jnp.asarray(affs)), fg,
                              fg.copy(), numinst, params)
    wall = time.perf_counter() - t0
    inst = np.asarray(inst)
    inst[~fg] = 0
    scores = eval_both(inst, sample.labels)
    scores["wall_s"] = wall

    # fragment-level: FlyLight neurons are spatially fragmented inside the
    # crop (28 connected components across the 3 gt instances); a
    # patch-based assembly can only merge within patch reach, so also
    # score against the per-fragment GT (one component per channel)
    from scipy import ndimage

    frags = []
    for c in range(sample.labels.shape[0]):
        lab, n = ndimage.label(sample.labels[c] > 0, np.ones((3, 3, 3)))
        for i in range(1, n + 1):
            m = lab == i
            if m.sum() >= 30:
                frags.append(m)
    frag_stack = np.stack([m.astype(np.int32) * (i + 1)
                           for i, m in enumerate(frags)], axis=0)
    scores["vs_fragments"] = eval_both(inst, frag_stack)
    scores["n_gt_fragments"] = len(frags)
    return scores


def trained_e2e(sample, iters: int, out_dir: str, big: bool = False,
                resume: bool = False):
    """Overfit-train on the crop, then predict -> assemble -> evaluate.

    ``resume`` keeps existing checkpoints and continues toward ``iters`` -
    used to chunk long runs across processes (the axon H2D path leaks
    ~5 MB of host RAM per step, OOM-killing single-process runs beyond
    ~20k steps at 40^3 crops)."""
    import shutil

    if not resume:
        shutil.rmtree(out_dir, ignore_errors=True)  # fresh, no stale resume
    import jax
    import jax.numpy as jnp

    from patchperpix_tpu.assembly import (VoteInstancesParams,
                                          to_instance_seg)
    from patchperpix_tpu.models import PPPConfig, PPPModel
    from patchperpix_tpu.infer.fused import predict_volume_device
    from patchperpix_tpu.train import (AugmentConfig, CropSampler,
                                       Prefetcher, SamplerConfig,
                                       TrainConfig, train_until)

    ps = (7, 7, 7)
    if big:
        # closer to the flylight flagship (default.toml: 20 fmaps, inc x3)
        mcfg = PPPConfig(
            patchshape=ps, num_channels=3, num_fmaps=20,
            fmap_inc_factors=(3, 3), fmap_dec_factors=(1.0, 1.0),
            downsample_factors=((2, 2, 2), (2, 2, 2)),
            overlapping_inst=True, max_num_inst=2,
            train_code=False, padding="same")
    else:
        mcfg = PPPConfig(
            patchshape=ps, num_channels=3, num_fmaps=16,
            fmap_inc_factors=(3, 3), fmap_dec_factors=(1.0, 1.0),
            downsample_factors=((2, 2, 2), (2, 2, 2)),
            overlapping_inst=True, max_num_inst=2,
            train_code=False, padding="same")
    model = PPPModel(mcfg)

    crop = (40, 40, 40) if big else (32, 32, 32)  # more context for big
    scfg = SamplerConfig(
        input_shape=crop, output_shape=crop,
        patchshape=ps, batch_size=3,
        probability_fg=0.8, probability_overlap=0.15,
        probability_random=0.05,
        augment=AugmentConfig(elastic=False, mirror=True, transpose=True))
    sampler = CropSampler([sample], scfg)
    pf = Prefetcher(sampler, cache_size=8, max_gt_channels=3)
    tcfg = TrainConfig(max_iterations=iters,
                       checkpoints=min(5000, iters),
                       snapshots=0, lr=1e-3,
                       output_folder=out_dir, log_every=200)
    t0 = time.perf_counter()
    state = train_until(model, mcfg, tcfg, pf)
    pf.stop()
    t_train = time.perf_counter() - t0
    params = state["params"]

    h1, h2 = predict_volume_device(model, params, sample.raw, mcfg,
                                   crop, crop)
    from patchperpix_tpu.assembly.vote_instances import numinst_from_probs

    numinst = numinst_from_probs(
        np.asarray(h2, np.float32),
        VoteInstancesParams(patchshape=ps, numinst_threshs=(0.9, 0.1)))
    fg = numinst > 0

    # flylight.toml assembly settings (patch_threshold 0.9)
    params_vi = VoteInstancesParams(
        patchshape=ps, engine="jax", overlapping_inst=True, mws=True,
        patch_threshold=0.9, fc_threshold=0.5,
        select_patches_for_sparse_data=True,
        skeletonize_foreground=True, remove_small_comps=60)
    inst, _ = to_instance_seg(h1, fg, fg.copy(), numinst, params_vi)
    inst = np.asarray(inst)
    inst[~fg] = 0

    from patchperpix_tpu.utils.postprocess import remove_small_components

    inst = remove_small_components(inst, 60)
    scores = eval_both(inst, sample.labels)
    scores["train_iters"] = iters
    scores["train_wall_s"] = t_train
    scores["fg_vox_pred"] = int(fg.sum())
    scores["fg_vox_gt"] = int(sample.fg_mask.sum())
    return scores


def trained_e2e_from_exp(sample, exp_base: str, checkpoint: int | None):
    """Score the CLI-produced instanced output (predict/label ran through
    `python -m patchperpix_tpu.cli`, checkpoints from the CLI `train`
    task — the reference workflow run_ppp.py:625-1190)."""
    from patchperpix_tpu.utils import io as vio

    if checkpoint is None:
        from patchperpix_tpu.cli import get_checkpoint_list

        cps = get_checkpoint_list(os.path.join(exp_base, "train"))
        if not cps:
            raise SystemExit(f"no checkpoints in {exp_base}/train — "
                             "did training reach its first checkpoint?")
        checkpoint = cps[-1]
    inst_dir = os.path.join(exp_base, "test", "instanced", str(checkpoint))
    base = os.path.splitext(os.path.basename(FIXTURE))[0]
    path = os.path.join(inst_dir, base + ".hdf")
    io = vio.IoHDF5(path, mode="r")
    inst = io.read(key="vote_instances")
    io.close()
    scores = eval_both(inst, sample.labels)
    scores["checkpoint"] = int(checkpoint)
    scores["exp_base"] = exp_base
    scores["source"] = "cli"
    with open(os.path.join(exp_base, "train", "train_log.jsonl")) as f:
        rows = [json.loads(l) for l in f if '"loss"' in l]
    scores["final_train_loss"] = rows[-1]["loss"] if rows else None
    scores["train_iters"] = rows[-1]["step"] if rows else None
    return scores


def main():
    from patchperpix_tpu.train import load_sample

    big = "--big" in sys.argv
    skip_oracle = "--skip-oracle" in sys.argv
    resume = "--resume" in sys.argv
    from_exp = None
    checkpoint = None
    argv = sys.argv[1:]
    consumed = set()
    if "--from-exp" in argv:
        i = argv.index("--from-exp")
        from_exp = argv[i + 1]
        consumed |= {i, i + 1}
    if "--checkpoint" in argv:
        i = argv.index("--checkpoint")
        checkpoint = int(argv[i + 1])
        consumed |= {i, i + 1}
    args = [a for j, a in enumerate(argv)
            if j not in consumed and not a.startswith("--")]
    iters = int(args[0]) if args else 3000
    os.makedirs(OUT_DIR, exist_ok=True)
    sample = load_sample(FIXTURE, "volumes/raw", "volumes/gt_instances",
                         clipmax=1500)

    res_path = os.path.join(OUT_DIR, "results.json")
    results = {"fixture": FIXTURE,
               "note": ("single-crop sanity anchor; BBBC010/dsb2018/ISBI "
                        "raw data are not available in this environment")}
    if skip_oracle:
        if os.path.exists(res_path):
            results = json.load(open(res_path))
    else:
        print("== oracle assembly ==", flush=True)
        results["oracle_assembly"] = oracle_assembly(sample)
        print(json.dumps(results["oracle_assembly"], indent=1), flush=True)

    if from_exp is not None:
        print(f"== trained e2e (CLI experiment {from_exp}) ==", flush=True)
        results["trained_e2e"] = trained_e2e_from_exp(sample, from_exp,
                                                      checkpoint)
    else:
        print(f"== trained e2e ({iters} iters, big={big}) ==", flush=True)
        results["trained_e2e"] = trained_e2e(sample, iters,
                                             os.path.join(OUT_DIR, "train"),
                                             big=big, resume=resume)
        results["trained_e2e"]["model"] = "fmaps20" if big else "fmaps16"
    print(json.dumps(results["trained_e2e"], indent=1), flush=True)

    with open(res_path, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print("written", res_path)


if __name__ == "__main__":
    main()
