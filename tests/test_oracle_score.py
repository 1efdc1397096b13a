"""Score-asserting regression tests for the oracle assembly (VERDICT r2:
'a score regression fails loudly').

The oracle assembly (GT-derived affinities -> vote_instances) must stay
near its measured ceiling on the shipped FlyLight crop
(parity/results.json: avg_f1_cov_score 0.78 full crop).  A drop below the
floors here means an assembly-quality regression, not a model issue.
"""

import os

import numpy as np
import pytest

FIXTURE = "data/JRC_SS05008-20160318_24_B2_crop.zarr"

pytestmark = pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason="fixture not present")


def _oracle_assembly_score(labels):
    import jax
    import jax.numpy as jnp

    from patchperpix_tpu.assembly import (VoteInstancesParams,
                                          to_instance_seg)
    from patchperpix_tpu.evaluate import evaluate_labels
    from patchperpix_tpu.ops.synthetic import labels_to_affinities_multi

    ps = (7, 7, 7)
    affs = labels_to_affinities_multi(labels, np.array(ps))
    numinst = np.sum(labels > 0, axis=0).astype(np.uint8)
    fg = numinst > 0
    params = VoteInstancesParams(
        patchshape=ps, engine="jax", overlapping_inst=True, mws=True,
        select_patches_for_sparse_data=True)
    inst, _ = to_instance_seg(jax.device_put(jnp.asarray(affs)), fg,
                              fg.copy(), numinst, params)
    inst = np.asarray(inst)
    inst[~fg] = 0
    res = evaluate_labels(inst, labels, localization_criterion="cldice",
                          assignment_strategy="greedy", keep_gt_shape=True)
    return res["general"]["avg_f1_cov_score"]


def _load_labels():
    from patchperpix_tpu.train import load_sample

    return load_sample(FIXTURE, "volumes/raw", "volumes/gt_instances",
                       clipmax=1500).labels


@pytest.mark.slow
def test_oracle_assembly_score_subcrop():
    """32^3 subcrop oracle regression (CPU-tractable slice of the full
    parity anchor; floor calibrated from the committed result in
    parity/oracle_subcrop.json)."""
    import json

    labels = _load_labels()[:, 9:41, 9:41, 9:41]
    assert (labels > 0).any()
    score = _oracle_assembly_score(labels)
    calib = "parity/oracle_subcrop.json"
    floor = 0.55
    if os.path.exists(calib):
        with open(calib) as f:
            floor = 0.9 * json.load(f)["avg_f1_cov_score"]
    assert score >= floor, f"oracle subcrop score {score} < floor {floor}"


@pytest.mark.tpu
def test_oracle_assembly_score_full_crop():
    """Full 50^3 oracle >= 0.7 avg_f1_cov_score (ceiling 0.78,
    parity/results.json)."""
    labels = _load_labels()
    score = _oracle_assembly_score(labels)
    assert score >= 0.7, f"oracle full-crop score {score} < 0.7"
