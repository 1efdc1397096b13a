"""Device-resident sampler + fused train loop (train/device_data.py).

Runs on the CPU backend (conftest); validates that the on-device
pipeline reproduces the host CropSampler's semantics and that the fused
lax.scan loop trains, checkpoints, resumes and SWA-averages like the
host loop."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchperpix_tpu.models import PPPConfig, PPPModel
from patchperpix_tpu.train import (AugmentConfig, DeviceSampler,
                                   SampleData, SamplerConfig, TrainConfig,
                                   device_sampler_supported,
                                   get_latest_checkpoint, load_checkpoint,
                                   train_until)


def _toy_sample(seed=0, size=40):
    rng = np.random.RandomState(seed)
    labels = np.zeros((2, size, size), dtype=np.int32)
    labels[0, 5:18, 5:18] = 1
    labels[1, 14:28, 14:28] = 2
    raw = (labels.sum(0) > 0).astype(np.float32)[None]
    raw += 0.05 * rng.randn(1, size, size).astype(np.float32)
    raw = np.clip(raw, 0, 1)
    fg = np.any(labels > 0, axis=0)
    ov = np.sum(labels > 0, axis=0) > 1
    return SampleData(raw=raw, labels=labels, fg_mask=fg, overlap_mask=ov)


def _cfg(**kw):
    base = dict(
        input_shape=(32, 32), output_shape=(32, 32), patchshape=(5, 5),
        batch_size=3,
        augment=AugmentConfig(elastic=False, probability_overlay=0.0))
    base.update(kw)
    return SamplerConfig(**base)


def test_unsupported_configs_fall_back():
    assert device_sampler_supported(
        _cfg(augment=AugmentConfig(elastic=True))) == "elastic augmentation"
    assert device_sampler_supported(
        _cfg(augment=AugmentConfig(probability_overlay=0.5))) \
        == "overlay augmentation"
    assert device_sampler_supported(_cfg(min_masked=0.5)) \
        == "min_masked rejection sampling"
    assert device_sampler_supported(_cfg()) is None
    with pytest.raises(ValueError):
        DeviceSampler([_toy_sample()], _cfg(min_masked=0.5))


def test_batch_shapes_and_values():
    ds = DeviceSampler([_toy_sample(0), _toy_sample(1)], _cfg(),
                       max_gt_channels=4)
    raw, labels, partly = jax.jit(ds.sample_batch)(jax.random.PRNGKey(0))
    assert raw.shape == (3, 1, 32, 32)
    assert labels.shape == (3, 4, 36, 36)  # 32 + 2*2 patch context
    assert partly.shape == (3,)
    raw = np.asarray(raw)
    labels = np.asarray(labels)
    assert raw.min() >= 0 and raw.max() <= 1
    # labels only contain known ids
    assert set(np.unique(labels)).issubset({0, 1, 2})


def test_fg_bias_on_device():
    """probability_fg=1 -> every crop is centered on a foreground voxel,
    like the host sampler's fg pool."""
    ds = DeviceSampler([_toy_sample()], _cfg(probability_fg=1.0,
                                             probability_overlap=0.0,
                                             probability_random=0.0))
    hits = 0
    sample_jit = jax.jit(ds.sample_batch)
    for i in range(8):
        _, labels, _ = sample_jit(jax.random.PRNGKey(i))
        lab = np.asarray(labels)
        c = lab.shape[-1] // 2
        hits += int((lab[:, :, c, c] > 0).any(axis=1).sum())
    assert hits >= 20  # 24 crops, center voxel fg (borders allow few misses)


def test_center_semantics_match_host_padding():
    """A crop 'centered' at corner voxel (0, 0) zero-pads out-of-volume
    space exactly like CropSampler._crop_at."""
    s = _toy_sample()
    ds = DeviceSampler([s], _cfg())
    center = jnp.zeros(2, jnp.int32)
    raw = jax.lax.dynamic_slice(
        ds.raw_all[0], (0, 0, 0),
        (1,) + tuple(int(b) for b in ds.big))
    # top-left quadrant of the window is zero padding
    half = int(ds.big[0]) // 2
    assert float(jnp.abs(raw[0, :half, :half]).max()) == 0.0
    # window center equals the original volume's (0,0) voxel
    assert float(raw[0, half, half]) == pytest.approx(float(s.raw[0, 0, 0]))


def test_mirror_transpose_preserve_multiset():
    """Augmented crops are spatial rearrangements: the value multiset of
    a full-volume crop is invariant under mirror/transpose."""
    s = _toy_sample(size=24)
    cfg = _cfg(input_shape=(24, 24), output_shape=(24, 24),
               probability_fg=0.0, probability_overlap=0.0,
               probability_random=1.0, batch_size=2,
               augment=AugmentConfig(elastic=False, mirror=True,
                                     transpose=True,
                                     intensity_scale=(1.0, 1.0),
                                     intensity_shift=(0.0, 0.0)))
    ds = DeviceSampler([s], cfg)
    # crops are drawn somewhere in the padded space, so compare VALUE
    # MULTISETS of the nonzero labels: mirror/transpose can only
    # rearrange, never create/destroy labeled voxels beyond what the
    # window clips — a full-volume-sized window always contains every
    # labeled voxel of at least one instance when centered inside
    found_aug = False
    sample_jit = jax.jit(ds.sample_batch)
    ref_counts = {i: int((s.labels == i).sum()) for i in (1, 2)}
    for i in range(8):
        raw, labels, _ = sample_jit(jax.random.PRNGKey(i))
        lab = np.asarray(labels)
        for b in range(lab.shape[0]):
            ids, cnts = np.unique(lab[b], return_counts=True)
            assert set(ids).issubset({0, 1, 2})
            for idv, c in zip(ids, cnts):
                if idv > 0:  # never MORE voxels of an id than exist
                    assert c <= ref_counts[int(idv)]
            if not np.array_equal(lab[b], lab[0]):
                found_aug = True
    assert found_aug  # augmentation actually produced distinct crops


def test_fused_train_until_trains_checkpoints_and_resumes(tmp_path):
    mcfg = PPPConfig(
        patchshape=(1, 5, 5), num_channels=1, num_fmaps=4,
        fmap_inc_factors=(2,), fmap_dec_factors=(1.0,),
        downsample_factors=((1, 2, 2),),
        train_code=False, overlapping_inst=False, padding="same")
    model = PPPModel(mcfg)
    ds = DeviceSampler([_toy_sample(0), _toy_sample(1)], _cfg())
    tcfg = TrainConfig(max_iterations=6, checkpoints=2, snapshots=0,
                       lr=1e-3, output_folder=str(tmp_path), log_every=2,
                       use_swa=True, swa_start=2, swa_freq=2,
                       tensorboard=False)
    state = train_until(model, mcfg, tcfg, ds)
    assert state["step"] == 6
    assert int(state["swa_n"]) == 3  # steps 2, 4, 6
    _, step = get_latest_checkpoint(str(tmp_path))
    assert step == 6

    # loss decreased over the run
    with open(os.path.join(str(tmp_path), "train_log.jsonl")) as f:
        rows = [json.loads(l) for l in f if "loss" in l]
    assert rows[-1]["loss"] < rows[0]["loss"] * 1.5

    # resume continues to 10 with the fused loop
    tcfg2 = TrainConfig(max_iterations=10, checkpoints=2, snapshots=0,
                        lr=1e-3, output_folder=str(tmp_path), log_every=2,
                        use_swa=True, swa_start=2, swa_freq=2,
                        tensorboard=False)
    state2 = train_until(model, mcfg, tcfg2, ds)
    assert state2["step"] == 10
    assert int(state2["swa_n"]) == 5

    # swa params differ from raw params (they average history)
    l_final = jax.tree.leaves(state2["params"])[0]
    l_swa = jax.tree.leaves(state2["swa_params"])[0]
    assert not np.allclose(np.asarray(l_final), np.asarray(l_swa))


def test_fused_loop_matches_host_loop_loss_scale(tmp_path):
    """Fused-loop training reaches a loss comparable to the host loop on
    the same problem (not bit-identical: different rng streams)."""
    from patchperpix_tpu.train import CropSampler, Prefetcher

    mcfg = PPPConfig(
        patchshape=(1, 5, 5), num_channels=1, num_fmaps=4,
        fmap_inc_factors=(2,), fmap_dec_factors=(1.0,),
        downsample_factors=((1, 2, 2),),
        train_code=False, overlapping_inst=False, padding="same")
    model = PPPModel(mcfg)

    ds = DeviceSampler([_toy_sample(0)], _cfg())
    tcfg = TrainConfig(max_iterations=30, checkpoints=30, snapshots=0,
                       lr=3e-3, output_folder=str(tmp_path / "dev"),
                       log_every=30, tensorboard=False)
    sdev = train_until(model, mcfg, tcfg, ds)

    host = CropSampler([_toy_sample(0)], _cfg())
    pf = Prefetcher(host, cache_size=4, max_gt_channels=6)
    tcfg2 = TrainConfig(max_iterations=30, checkpoints=30, snapshots=0,
                        lr=3e-3, output_folder=str(tmp_path / "host"),
                        log_every=30, tensorboard=False)
    shost = train_until(model, mcfg, tcfg2, pf)
    pf.stop()

    def last_loss(folder):
        with open(os.path.join(folder, "train_log.jsonl")) as f:
            rows = [json.loads(l) for l in f if "loss" in l]
        return rows[-1]["loss"]

    ldev = last_loss(str(tmp_path / "dev"))
    lhost = last_loss(str(tmp_path / "host"))
    assert ldev < 2.0 * lhost + 0.1


def test_partly_flag_and_weighted_overlap_pool():
    """partly flags flow per-sample; point_balance_radius weighting uses
    the cumulative-weight searchsorted path."""
    s_complete = _toy_sample(0)
    s_partly = _toy_sample(1)
    s_partly.partly = True
    # overlap CSV-style points with strong clustering for weighting
    pts = np.array([[15, 15], [15, 16], [16, 15], [16, 16], [30, 30]])
    s_partly.overlap_points = pts
    cfg = _cfg(probability_fg=0.0, probability_overlap=1.0,
               probability_random=0.0, point_balance_radius=3.0,
               batch_size=16)
    ds = DeviceSampler([s_complete, s_partly], cfg)
    assert ds.ov.cumw is not None  # weighted pool active
    _, _, partly = jax.jit(ds.sample_batch)(jax.random.PRNGKey(0))
    partly = np.asarray(partly)
    assert partly.any() and not partly.all()  # both samples drawn

    # weighting: the isolated point (weight 1/1) should be drawn far more
    # often than each clustered point (weight 1/4): over many draws the
    # isolated point gets ~50% of the partly sample's overlap draws
    iso = clus = 0
    one = DeviceSampler([s_partly], cfg)
    sample_jit = jax.jit(one.sample_batch)
    for i in range(6):
        _, labels, _ = sample_jit(jax.random.PRNGKey(i))
        lab = np.asarray(labels)
        c = lab.shape[-1] // 2
        # identify crop center: compare against the two pool locations via
        # the center pixel's label pattern is ambiguous; instead re-derive
        # centers from the sampler directly
    # statistical check on _choose_center directly
    draws = jax.vmap(lambda k: one._choose_center(k, 0))(
        jax.random.split(jax.random.PRNGKey(1), 256))
    draws = np.asarray(draws)
    iso = int((draws == pts[4]).all(axis=1).sum())
    assert iso > 256 * 0.3  # unweighted would give ~20%
