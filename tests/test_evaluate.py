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
