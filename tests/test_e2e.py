"""End-to-end: train -> predict -> (decode) -> vote_instances -> labels.

Exercises the full minimum slice of the framework (SURVEY.md build step 3)
on an easy synthetic 2D task so it runs in CI time on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
from patchperpix_tpu.infer.decode import decode_volume, derive_fg_mask
from patchperpix_tpu.infer.predict import enumerate_shifts, predict_volume
from patchperpix_tpu.models import PPPConfig, PPPModel
from patchperpix_tpu.train import (AugmentConfig, CropSampler, Prefetcher,
                                   SampleData, SamplerConfig, TrainConfig,
                                   train_until)

pytestmark = pytest.mark.slow


def _make_sample(seed, size=48):
    """Two bright square instances on dark background, gap between them."""
    rng = np.random.RandomState(seed)
    labels = np.zeros((2, size, size), dtype=np.int32)
    y1, x1 = rng.randint(6, 14, 2)
    y2, x2 = rng.randint(26, 34, 2)
    labels[0, y1:y1 + 10, x1:x1 + 10] = 1
    labels[1, y2:y2 + 10, x2:x2 + 10] = 2
    raw = (labels.sum(0) > 0).astype(np.float32)[None]
    raw = np.clip(raw + 0.08 * rng.randn(1, size, size), 0, 1).astype(
        np.float32)
    return SampleData(raw=raw, labels=labels,
                      fg_mask=np.any(labels > 0, axis=0),
                      overlap_mask=np.sum(labels > 0, axis=0) > 1)


def _cfg(train_code):
    return PPPConfig(
        patchshape=(1, 5, 5), num_channels=1, num_fmaps=8,
        fmap_inc_factors=(2,), fmap_dec_factors=(1.0,),
        downsample_factors=((1, 2, 2),),
        train_code=train_code, code_units=16,
        ae_code_fmaps=4, ae_num_fmaps=(8, 16),
        ae_downsample_factors=((2, 2), (2, 2)),
        num_code_samples=64,
        overlapping_inst=False, padding="same")


def _train(mcfg, tmp_path, iters=150, lr=3e-3):
    samples = [_make_sample(s) for s in range(3)]
    scfg = SamplerConfig(
        input_shape=(32, 32), output_shape=(32, 32), patchshape=(5, 5),
        batch_size=4, probability_fg=0.9, probability_overlap=0.0,
        augment=AugmentConfig(elastic=False, mirror=True, transpose=True),
        seed=1)
    sampler = CropSampler(samples, scfg)
    pf = Prefetcher(sampler, cache_size=4, max_gt_channels=3)
    tcfg = TrainConfig(max_iterations=iters, checkpoints=iters, lr=lr,
                       output_folder=str(tmp_path), log_every=50)
    model = PPPModel(mcfg)
    state = train_until(model, mcfg, tcfg, pf)
    pf.stop()
    return model, state["params"]


def test_enumerate_shifts_covers_volume():
    shifts = enumerate_shifts((40, 40), (16, 16), (8, 8))
    shifts = np.array(shifts)
    assert shifts.min() == 0
    assert (shifts.max(axis=0) == [24, 24]).all()
    # stride-8 grid, snapped
    assert len(shifts) == 16


def test_e2e_direct_affinities(tmp_path):
    mcfg = _cfg(train_code=False)
    model, params = _train(mcfg, tmp_path)

    test_sample = _make_sample(99)
    h1, h2 = predict_volume(model, params, test_sample.raw, mcfg,
                            input_shape=(32, 32), output_shape=(32, 32),
                            batch_size=2)
    assert h1.shape == (25, 48, 48)
    affs = h1.astype(np.float32)[:, None]         # (P, 1, H, W)

    fg_gt = test_sample.fg_mask[None]
    # the model should at least confidently detect foreground
    fg_pred = affs[12] > 0.5
    iou_fg = (fg_pred & fg_gt).sum() / max((fg_pred | fg_gt).sum(), 1)
    assert iou_fg > 0.6, f"model failed to learn fg, iou={iou_fg}"

    params_vi = VoteInstancesParams(patchshape=(1, 5, 5), engine="jax",
                                    skeletonize_foreground=False)
    fg = affs[12] > 0.5
    inst, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                              params_vi)
    inst[~fg] = 0
    ids = np.unique(inst[inst > 0])
    assert len(ids) == 2, f"expected 2 instances, got {ids}"
    # each gt blob maps to one distinct predicted instance
    got = set()
    for gt_id in (1, 2):
        m = test_sample.labels[gt_id - 1] == gt_id
        vals, counts = np.unique(inst[fg & m[None]], return_counts=True)
        keep = vals > 0
        vals, counts = vals[keep], counts[keep]
        assert len(vals) >= 1
        got.add(int(vals[np.argmax(counts)]))
    assert len(got) == 2


def test_e2e_code_decode(tmp_path):
    mcfg = _cfg(train_code=True)
    model, params = _train(mcfg, tmp_path, iters=200)

    test_sample = _make_sample(77)
    code, fgbg = predict_volume(model, params, test_sample.raw, mcfg,
                                input_shape=(32, 32), output_shape=(32, 32),
                                batch_size=2)
    assert code.shape == (16, 48, 48)
    fg_mask = derive_fg_mask(fgbg.astype(np.float32), False, 0.5)
    fg_gt = test_sample.fg_mask
    iou_fg = (fg_mask & fg_gt).sum() / max((fg_mask | fg_gt).sum(), 1)
    assert iou_fg > 0.5, f"fg head failed, iou={iou_fg}"

    affs2d = decode_volume(model, params, code.astype(np.float32), fg_mask,
                           mcfg, batch_size=256)
    assert affs2d.shape == (25, 48, 48)
    affs = affs2d[:, None]
    fg = fg_mask[None]
    # decoded affinities must be confident on fg centers
    assert float(np.median(affs[12][:, fg_mask])) > 0.5

    params_vi = VoteInstancesParams(patchshape=(1, 5, 5), engine="jax")
    inst, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                              params_vi)
    inst[~fg] = 0
    ids = np.unique(inst[inst > 0])
    assert len(ids) == 2, f"expected 2 instances, got {ids}"
