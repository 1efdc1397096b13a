"""End-to-end on the real FlyLight 50^3 fixture: train (briefly) -> predict
-> vote_instances -> evaluate, with the 3D multi-channel overlapping-
instance configuration (numinst head, clDice evaluation).

A short training run cannot reach paper accuracy; the assertions check the
full pipeline wiring on real data (SURVEY.md §7 step 3)."""

import numpy as np
import pytest

from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
from patchperpix_tpu.evaluate import evaluate_labels
from patchperpix_tpu.infer.predict import predict_volume
from patchperpix_tpu.models import PPPConfig, PPPModel
from patchperpix_tpu.train import (AugmentConfig, CropSampler, Prefetcher,
                                   SampleData, SamplerConfig, TrainConfig,
                                   load_sample, train_until)

pytestmark = pytest.mark.slow

FIXTURE = "data/JRC_SS05008-20160318_24_B2_crop.zarr"


@pytest.fixture(scope="module")
def sample():
    return load_sample(FIXTURE, "volumes/raw", "volumes/gt_instances",
                       clipmax=1500)


def test_fixture_loads(sample):
    assert sample.raw.shape == (3, 50, 50, 50)
    assert sample.labels.shape == (3, 50, 50, 50)
    assert sample.fg_mask.sum() > 1000
    assert sample.overlap_mask.sum() > 0  # overlapping instances exist


def test_flylight_train_predict_label_evaluate(sample, tmp_path):
    mcfg = PPPConfig(
        patchshape=(5, 5, 5), num_channels=3, num_fmaps=6,
        fmap_inc_factors=(2,), fmap_dec_factors=(1.0,),
        downsample_factors=((2, 2, 2),),
        overlapping_inst=True, max_num_inst=2,
        train_code=False, padding="same")
    model = PPPModel(mcfg)

    scfg = SamplerConfig(
        input_shape=(24, 24, 24), output_shape=(24, 24, 24),
        patchshape=(5, 5, 5), batch_size=2,
        probability_fg=0.9, probability_overlap=0.1,
        augment=AugmentConfig(elastic=False, mirror=True, transpose=False))
    sampler = CropSampler([sample], scfg)
    pf = Prefetcher(sampler, cache_size=4, max_gt_channels=3)
    tcfg = TrainConfig(max_iterations=60, checkpoints=60, lr=3e-3,
                       output_folder=str(tmp_path), log_every=30)
    state = train_until(model, mcfg, tcfg, pf)
    pf.stop()
    params = state["params"]

    affs, numinst_prob = predict_volume(
        model, params, sample.raw, mcfg,
        input_shape=(24, 24, 24), output_shape=(24, 24, 24), batch_size=2)
    assert affs.shape == (125, 50, 50, 50)
    assert numinst_prob.shape == (3, 50, 50, 50)
    np.testing.assert_allclose(
        np.asarray(numinst_prob, dtype=np.float32).sum(0), 1.0, atol=1e-2)

    # numinst-threshold foreground derivation (flylight defaults)
    prob = np.asarray(numinst_prob, dtype=np.float32)
    numinst = np.zeros(prob.shape[1:], dtype=np.uint8)
    for i, t in enumerate((0.9, 0.1)):
        numinst[prob[i + 1] > t] = i + 1
    fg = numinst > 0
    if fg.sum() < 100:  # barely-trained net: fall back to gt-ish fg
        fg = sample.fg_mask
        numinst = (sample.fg_mask.astype(np.uint8)
                   + sample.overlap_mask.astype(np.uint8))

    params_vi = VoteInstancesParams(
        patchshape=(5, 5, 5), engine="pallas", overlapping_inst=True,
        mws=True, select_patches_for_sparse_data=True,
        skeletonize_foreground=True)
    inst, fg_out = to_instance_seg(
        np.asarray(affs, np.float32), fg, fg.copy(), numinst, params_vi)
    assert inst.shape == (50, 50, 50)

    res = evaluate_labels(
        inst, sample.labels, localization_criterion="cldice",
        assignment_strategy="greedy", keep_gt_shape=True,
        add_general_metrics=("avg_gt_skel_coverage", "avg_f1_cov_score"))
    assert res["general"]["Num GT"] >= 2
    assert "avg_f1_cov_score" in res["general"]
    assert "th_0_5" in res["confusion_matrix"]
