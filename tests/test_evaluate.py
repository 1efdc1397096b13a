"""Evaluation suite tests."""

import numpy as np
import pytest

from patchperpix_tpu.config import get_by_path
from patchperpix_tpu.evaluate import (evaluate_fg, evaluate_labels,
                                      evaluate_numinst, evaluate_patch,
                                      summarize_metric_dict)


def _gt_pred_perfect():
    gt = np.zeros((20, 20), dtype=np.int32)
    gt[2:8, 2:8] = 1
    gt[12:18, 12:18] = 2
    return gt, gt.copy()


def test_perfect_prediction_iou_hungarian():
    gt, pred = _gt_pred_perfect()
    res = evaluate_labels(pred, gt, localization_criterion="iou",
                          assignment_strategy="hungarian")
    assert res["general"]["Num GT"] == 2
    assert res["general"]["Num Pred"] == 2
    th5 = res["confusion_matrix"]["th_0_5"]
    assert th5["AP_TP"] == 2 and th5["AP_FP"] == 0 and th5["AP_FN"] == 0
    assert th5["fscore"] == 1.0
    assert res["confusion_matrix"]["avFscore"] == 1.0
    assert res["general"]["avg_gt_skel_coverage"] == pytest.approx(1.0)
    assert res["general"]["avg_f1_cov_score"] == pytest.approx(1.0)


def test_split_and_merge_detection():
    gt, _ = _gt_pred_perfect()
    # split instance 1 into two, merge everything else missing
    pred = np.zeros_like(gt)
    pred[2:8, 2:5] = 1
    pred[2:8, 5:8] = 2
    res = evaluate_labels(pred, gt, localization_criterion="iou",
                          assignment_strategy="greedy")
    th1 = res["confusion_matrix"]["th_0_1"]
    assert th1["false_split"] == 1        # gt 1 overlapped by 2 preds
    assert th1["AP_FN"] >= 1              # gt 2 unmatched


def test_merge_detection():
    gt, _ = _gt_pred_perfect()
    pred = (gt > 0).astype(np.int32)      # single pred covers both
    res = evaluate_labels(pred, gt)
    th1 = res["confusion_matrix"]["th_0_1"]
    assert th1["false_merge"] == 1


@pytest.mark.parametrize("strategy", ["hungarian", "greedy"])
def test_offset_prediction_partial_iou(strategy):
    gt, _ = _gt_pred_perfect()
    pred = np.zeros_like(gt)
    pred[4:10, 4:10] = 7   # overlaps gt 1 with iou ~ (4*4)/(2*36-16)
    res = evaluate_labels(pred, gt, assignment_strategy=strategy)
    iou = 16 / (36 + 36 - 16)
    for th in (0.1, 0.2):
        key = "th_" + str(th).replace(".", "_")
        e = res["confusion_matrix"][key]
        assert e["AP_TP"] == (1 if iou > th else 0)


def test_cldice_localization():
    gt = np.zeros((1, 30, 30), dtype=np.int32)
    gt[0, 15, 5:25] = 1                   # a line
    pred = np.zeros_like(gt)
    pred[0, 15, 5:20] = 3                 # covers 75% of the line
    res = evaluate_labels(pred, gt, localization_criterion="cldice",
                          assignment_strategy="greedy")
    cov = res["general"]["avg_gt_skel_coverage"]
    assert 0.5 < cov < 0.95
    th5 = res["confusion_matrix"]["th_0_5"]
    assert th5["AP_TP"] == 1              # clDice well above 0.5


def test_keep_gt_shape_channel_stack():
    gt = np.zeros((2, 20, 20), dtype=np.int32)
    gt[0, 2:10, 2:10] = 1
    gt[1, 6:14, 6:14] = 2                 # overlapping instances
    pred = np.zeros((20, 20), dtype=np.int32)
    pred[2:10, 2:10] = 1
    pred[10:14, 10:14] = 2
    res = evaluate_labels(pred, gt, keep_gt_shape=True)
    assert res["general"]["Num GT"] == 2


def test_remove_small_components_in_eval():
    gt, pred = _gt_pred_perfect()
    pred = pred.copy()
    pred[0, 19] = 9                       # 1-px junk instance
    res = evaluate_labels(pred, gt, remove_small_components=5)
    assert res["general"]["Num Pred"] == 2


def test_summarize_metric_dict(tmp_path):
    gt, pred = _gt_pred_perfect()
    res = evaluate_labels(pred, gt)
    rows = summarize_metric_dict(
        {"s1": res}, ["general.Num GT", "confusion_matrix.th_0_5.fscore"],
        out_csv=str(tmp_path / "summary.csv"))
    assert rows[0] == ["sample", "general.Num GT",
                      "confusion_matrix.th_0_5.fscore"]
    assert rows[1] == ["s1", 2, 1.0]
    assert (tmp_path / "summary.csv").exists()


def test_evaluate_patch_and_oracle_iou():
    from patchperpix_tpu.ops import synthetic

    ps = np.array([1, 5, 5])
    labels = synthetic.two_blob_labels_2d()
    affs = synthetic.labels_to_affinities(labels, ps)
    res = evaluate_patch(affs, labels[None], ps, thresholds=(0.5,))
    e = res["th_0_5"]
    assert e["fscore"] > 0.99             # ideal affinities
    iou_vol = e["iou_volume"]
    assert iou_vol.shape == labels.shape
    fg = labels > 0
    assert iou_vol[fg].mean() > 0.9


def test_evaluate_numinst_and_fg():
    gt = np.zeros((2, 10, 10), dtype=np.int32)
    gt[0, 2:8, 2:8] = 1
    gt[1, 5:9, 5:9] = 2
    ni_gt = np.clip((gt > 0).sum(0), 0, 2)
    pred = np.zeros((3, 10, 10), dtype=np.float32)
    for k in range(3):
        pred[k] = (ni_gt == k).astype(np.float32)
    res = evaluate_numinst(pred, gt, max_numinst=2)
    assert res["accuracy"] == 1.0
    assert res["class_2"]["fscore"] == 1.0

    fg_prob = (ni_gt > 0).astype(np.float32) * 0.9
    res_fg = evaluate_fg(fg_prob, ni_gt > 0, thresholds=(0.5,),
                         remove_small_comps=(0,))
    assert res_fg["th_0_5_rm_0"]["fscore"] == 1.0


# --- hand-computed fixtures for the package-semantics metrics ------------
# (VERDICT r1 item 6: union-based gt skeleton coverage, assigned-pred TP
# coverage, per-gt gt_skel_coverage list)


def _hline(y, x0, x1, shape=(20, 40)):
    m = np.zeros(shape, np.int32)
    m[y, x0:x1] = 1
    return m


def test_gt_skel_coverage_union_not_capped_sum():
    """Two identical preds covering 60% of a line gt: union coverage is
    0.6; the old capped per-pred SUM would report 1.0 (0.6+0.6 capped)."""
    gt = _hline(10, 0, 30)              # 30-px line, skeleton == line
    # two predictions over the SAME 18-px sub-line (overlapping
    # instances); their union covers 60% of the skeleton even though the
    # per-pred coverages sum to 1.2
    pred = np.zeros((2, 20, 40), np.int32)
    pred[0, 10, 0:18] = 1
    pred[1, 10, 0:18] = 2
    from patchperpix_tpu.evaluate.instance_metrics import (
        _instance_masks, union_skel_coverage)

    gt_masks = _instance_masks(gt)
    union = (pred.max(axis=0) > 0)
    cov = union_skel_coverage(gt_masks, union)
    assert cov.shape == (1,)
    assert abs(cov[0] - 0.6) < 1e-9


def test_metric_dict_hand_computed_split_case():
    """1 gt line of 30 px; two preds covering [0,18) and [18,30).
    IoU(gt, p1)=18/30=0.6, IoU(gt, p2)=12/30=0.4.
    At th 0.5: TP=1 (p1), FP=1, FN=0 -> precision 1/2, recall 1,
    fscore 2/3.  false_split=1 (two preds above the 0.1 floor on one gt),
    false_merge=0.  Union skel coverage = 1.0."""
    gt = _hline(10, 0, 30)
    pred = np.zeros((20, 40), np.int32)
    pred[10, 0:18] = 1
    pred[10, 18:30] = 2
    res = evaluate_labels(pred, gt, localization_criterion="iou",
                          assignment_strategy="hungarian")
    th5 = res["confusion_matrix"]["th_0_5"]
    assert th5["AP_TP"] == 1 and th5["AP_FP"] == 1 and th5["AP_FN"] == 0
    assert abs(th5["fscore"] - 2 / 3) < 1e-9
    assert th5["false_split"] == 1 and th5["false_merge"] == 0
    # same FS count reported at every threshold (matching-independent)
    assert res["confusion_matrix"]["th_0_9"]["false_split"] == 1
    assert res["general"]["gt_skel_coverage"] == [1.0]
    assert abs(res["general"]["avg_gt_skel_coverage"] - 1.0) < 1e-9


def test_metric_dict_hand_computed_merge_case():
    """2 gt lines; one pred spanning both plus background gap.
    gt1=[0,10), gt2=[20,30) on the same row; pred=[0,30).
    IoU(g1,p)=10/30, IoU(g2,p)=10/30 -> no match at 0.5;
    false_merge=1, false_split=0.  Union coverage = [1.0, 1.0]."""
    gt = np.zeros((20, 40), np.int32)
    gt[10, 0:10] = 1
    gt[10, 20:30] = 2
    pred = np.zeros((20, 40), np.int32)
    pred[10, 0:30] = 1
    res = evaluate_labels(pred, gt)
    th5 = res["confusion_matrix"]["th_0_5"]
    assert th5["AP_TP"] == 0 and th5["false_merge"] == 1
    assert th5["false_split"] == 0
    assert res["general"]["gt_skel_coverage"] == [1.0, 1.0]


def test_tp_skel_coverage_uses_assigned_pred():
    """gt matched (by IoU) to pred A with skeleton recall 0.75 while an
    unmatched pred B has recall 0.25: avg_tp_skel_coverage must be A's
    0.75, and would differ under the old max-over-preds (max = 0.75 here,
    so craft B bigger off-gt: B covers 100% of the skeleton but has tiny
    IoU due to huge off-gt area -> max would give 1.0, assigned gives
    0.75)."""
    gt = np.zeros((30, 40), np.int32)
    gt[10, 0:20] = 1                       # 20-px line
    pred = np.zeros((30, 40), np.int32)
    pred[10, 0:15] = 1                     # A: skel recall 15/20, IoU 0.75
    pred[12:29, 0:40] = 2                  # B: big blob (tiny IoU with gt)
    pred[10, 15:20] = 2                    # ...but covers the rest of gt
    res = evaluate_labels(pred, gt)
    th5 = res["confusion_matrix"]["th_0_5"]
    assert th5["AP_TP"] == 1
    assert abs(th5["avg_tp_skel_coverage"] - 0.75) < 1e-9


def test_average_score_over_instances():
    """Instance-count-weighted fold averaging (run_ppp.py:1609-1671):
    TP/FP/FN summed before the F-score, coverages concatenated."""
    from patchperpix_tpu.evaluate import (average_score_over_instances,
                                          average_score_with_instance_counts)

    ths = (0.5,)

    def md(tp, fp, fn, covs):
        return {"general": {"gt_skel_coverage": covs},
                "confusion_matrix": {"th_0_5": {
                    "AP_TP": tp, "AP_FP": fp, "AP_FN": fn,
                    "false_split": 1, "false_merge": 0}}}

    # sample A: 1 gt (TP), sample B: 3 gts (1 TP 2 FN)
    dicts = {"a": md(1, 0, 0, [1.0]), "b": md(1, 0, 2, [0.5, 0.0, 1.0])}
    avs, counts = average_score_over_instances(dicts, thresholds=ths)
    # fscore = 2*2/(2*2+0+2) = 2/3 ; mean cov = 0.625
    assert abs(avs - 0.5 * (2 / 3) - 0.5 * 0.625) < 1e-9
    assert counts["tp"] == [2] and counts["fn"] == [2]
    assert counts["false_split"] == 2

    avs2, acc = average_score_with_instance_counts(counts, counts)
    assert abs(acc["avFscore"] - 2 / 3) < 1e-9
    assert acc["false_split"] == 4
    assert abs(avs2 - avs) < 1e-9


def test_partly_excludes_unlabeled_region_fp():
    """Partly-labeled GT (run_ppp.py:1206-1212): a prediction on an
    unlabeled region is NOT an FP for a partly sample but IS for a
    complete one."""
    gt = np.zeros((20, 20), dtype=np.int32)
    gt[2:8, 2:8] = 1
    pred = np.zeros((20, 20), dtype=np.int32)
    pred[2:8, 2:8] = 1          # matches the labeled gt
    pred[12:18, 12:18] = 2      # in an unlabeled region

    full = evaluate_labels(pred, gt, localization_criterion="iou",
                           assignment_strategy="hungarian")
    assert full["general"]["Num Pred"] == 2
    assert full["confusion_matrix"]["th_0_5"]["AP_FP"] == 1

    part = evaluate_labels(pred, gt, localization_criterion="iou",
                           assignment_strategy="hungarian", partly=True)
    assert part["general"]["Num Pred"] == 1
    assert part["general"]["Num Pred unfiltered"] == 2
    assert part["confusion_matrix"]["th_0_5"]["AP_FP"] == 0
    assert part["confusion_matrix"]["th_0_5"]["AP_TP"] == 1
    assert part["confusion_matrix"]["th_0_5"]["fscore"] == 1.0


def test_keep_gt_shape_flat_volume_falls_back():
    """A flat (Z, Y, X) GT passed with keep_gt_shape=True must NOT be
    scored as per-slice instances: slices holding several ids disable the
    stack interpretation."""
    gt = np.zeros((4, 20, 20), dtype=np.int32)  # flat 3D volume, 2 ids
    gt[1:3, 2:8, 2:8] = 1
    gt[1:3, 12:18, 12:18] = 2
    pred = gt.copy()
    res = evaluate_labels(pred, gt, localization_criterion="iou",
                          assignment_strategy="hungarian",
                          keep_gt_shape=True)
    assert res["general"]["Num GT"] == 2  # not 4 slice-instances
    assert res["confusion_matrix"]["th_0_5"]["fscore"] == 1.0


def test_fold_average_threshold_keys_float_noise():
    """average_score_over_instances must find evaluate_labels' threshold
    keys even for float-noise thresholds like np.arange's 0.30000000004."""
    from patchperpix_tpu.evaluate.instance_metrics import (
        average_score_over_instances)

    gt, pred = _gt_pred_perfect()
    ths = tuple(np.arange(0.1, 1.0, 0.1))  # noisy floats
    res = evaluate_labels(pred, gt, thresholds=ths)
    avS, counts = average_score_over_instances({"s": res}, thresholds=ths)
    assert avS > 0.9
    assert counts["tp"] == [2] * 9


def test_rand_voi_perfect_segmentation():
    from patchperpix_tpu.evaluate import rand_voi_scores

    gt = np.zeros((20, 20), np.int32)
    gt[2:8, 2:8] = 1
    gt[12:18, 12:18] = 2
    res = rand_voi_scores(gt, gt + 5 * (gt > 0))  # relabeling is free
    assert res["rand_fscore"] == pytest.approx(1.0)
    assert res["adapted_rand_error"] == pytest.approx(0.0)
    assert res["voi_split"] == pytest.approx(0.0, abs=1e-12)
    assert res["voi_merge"] == pytest.approx(0.0, abs=1e-12)


def test_rand_voi_even_split_closed_form():
    """One gt segment predicted as two equal halves: precision 1,
    recall 1/2, V^Rand 2/3, ARE 1/3, voi_split ln2, voi_merge 0."""
    from patchperpix_tpu.evaluate import rand_voi_scores

    gt = np.zeros((10, 8), np.int32)
    gt[:, :] = 1
    pred = np.ones_like(gt)
    pred[5:] = 2
    res = rand_voi_scores(gt, pred)
    assert res["rand_precision"] == pytest.approx(1.0)
    assert res["rand_recall"] == pytest.approx(0.5)
    assert res["rand_fscore"] == pytest.approx(2 / 3)
    assert res["adapted_rand_error"] == pytest.approx(1 / 3)
    assert res["voi_split"] == pytest.approx(np.log(2))
    assert res["voi_merge"] == pytest.approx(0.0, abs=1e-12)


def test_rand_voi_foreground_restricted():
    """Predictions on gt==0 pixels are ignored (ISBI convention)."""
    from patchperpix_tpu.evaluate import rand_voi_scores

    gt = np.zeros((10, 10), np.int32)
    gt[:5] = 1
    pred = gt.copy()
    noisy = pred.copy()
    noisy[7:, 7:] = 9  # spurious instance entirely in background
    assert rand_voi_scores(gt, noisy) == rand_voi_scores(gt, pred)


def test_rand_voi_through_evaluate_labels():
    gt = np.zeros((16, 16), np.int32)
    gt[2:8, 2:8] = 1
    gt[10:15, 10:15] = 2
    res = evaluate_labels(
        gt.copy(), gt, localization_criterion="iou",
        assignment_strategy="hungarian",
        add_general_metrics=("avg_gt_skel_coverage", "avg_f1_cov_score",
                             "adapted_rand_error", "voi"))
    g = res["general"]
    assert g["rand_fscore"] == pytest.approx(1.0)
    assert g["voi_split"] == pytest.approx(0.0, abs=1e-12)
    assert g["voi_merge"] == pytest.approx(0.0, abs=1e-12)
