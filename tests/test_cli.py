"""CLI orchestrator integration test on a tiny synthetic dataset."""

import json
import os
import textwrap

import numpy as np
import pytest

from patchperpix_tpu import cli
from patchperpix_tpu.utils import io as vio


def _write_sample(path, seed):
    rng = np.random.RandomState(seed)
    labels = np.zeros((2, 48, 48), dtype=np.uint8)
    y1, x1 = rng.randint(6, 12, 2)
    y2, x2 = rng.randint(26, 32, 2)
    labels[0, y1:y1 + 10, x1:x1 + 10] = 1
    labels[1, y2:y2 + 10, x2:x2 + 10] = 2
    raw = (labels.sum(0) > 0).astype(np.float32)[None]
    raw = np.clip(raw + 0.05 * rng.randn(1, 48, 48), 0, 1)
    io = vio.IoZarr(str(path), mode="w")
    io.create("volumes/raw", raw.shape, np.float32)
    io.write(raw.astype(np.float32), key="volumes/raw")
    io.create("volumes/gt_instances", labels.shape, np.uint8)
    io.write(labels, key="volumes/gt_instances")
    io.close()


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    for split in ("train", "val", "test"):
        d = root / split
        d.mkdir()
        for i in range(2):
            _write_sample(d / f"sample_{split}{i}.zarr", seed=hash(split) %
                          1000 + i)
    return root


@pytest.fixture(scope="module")
def config_file(dataset, tmp_path_factory):
    cfg = tmp_path_factory.mktemp("cfg") / "test.toml"
    cfg.write_text(textwrap.dedent(f"""
        [general]
        logging = "INFO"

        [data]
        train_data = "{dataset}/train"
        val_data = "{dataset}/val"
        test_data = "{dataset}/test"
        input_format = "zarr"
        num_channels = 1
        raw_key = "volumes/raw"
        gt_key = "volumes/gt_instances"

        [model]
        patchshape = [1, 5, 5]
        num_fmaps = 8
        fmap_inc_factors = [2]
        fmap_dec_factors = [1.0]
        downsample_factors = [[1, 2, 2]]
        train_padding = "same"
        val_padding = "same"
        train_input_shape_same = [32, 32]
        test_input_shape_same = [48, 48]
        overlapping_inst = false
        train_code = false

        [training]
        max_iterations = 120
        checkpoints = 120
        batch_size = 4
        cache_size = 4

        [training.sampling]
        probability_fg = 0.9
        probability_overlap = 0.0
        probability_random = 0.1

        [optimizer.optimizer]
        optimizer = "Adam"
        lr = 0.003

        [prediction]
        fg_thresh = 0.5
        batch_size = 2

        [vote_instances]
        patch_threshold = 0.5
        fc_threshold = 0.5
        engine = "jax"
        select_patches_for_sparse_data = true
        mws = false

        [evaluation]
        res_key = "vote_instances"
        metric = "confusion_matrix.avFscore"
        localization_criterion = "iou"
        assignment_strategy = "hungarian"
        summary = [ "general.Num GT", "general.Num Pred",
                    "confusion_matrix.avFscore",]
        [validation]
        params_zip = ["patch_threshold"]
        patch_threshold = [0.5]
    """))
    return str(cfg)


@pytest.fixture(scope="module")
def exp_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("exps"))


@pytest.fixture(scope="module")
def trained(config_file, exp_root):
    paths = cli.main(["--config", config_file, "--root", exp_root,
                      "-id", "testrun", "-d", "mknet", "train"])
    return paths


def test_mknet_and_train(trained):
    assert os.path.exists(os.path.join(trained["base"],
                                       "train_net_config.json"))
    with open(os.path.join(trained["base"], "train_net_config.json")) as f:
        nc = json.load(f)
    assert nc["input_shape"] == [32, 32]
    assert nc["output_shape"] == [32, 32]
    from patchperpix_tpu.cli import get_checkpoint_list
    assert get_checkpoint_list(trained["train"]) == [120]
    # config provenance
    assert os.path.exists(os.path.join(trained["base"], "config.toml"))
    assert os.path.exists(os.path.join(trained["base"], "run.log"))


def test_predict_label_evaluate(trained, config_file, exp_root):
    paths = cli.main(["--config", config_file, "--root", exp_root,
                      "-id", "testrun",
                      "-d", "predict", "label", "evaluate",
                      "--mode", "test"])
    proc = os.path.join(paths["test_processed"], "120")
    inst = os.path.join(paths["test_instanced"], "120")
    ev = os.path.join(paths["test_evaluated"], "120")
    zarrs = [p for p in os.listdir(proc) if p.endswith(".zarr")]
    assert len(zarrs) == 2
    hdfs = [p for p in os.listdir(inst) if p.endswith(".hdf")]
    assert len(hdfs) == 2
    assert os.path.exists(os.path.join(ev, "summary.csv"))
    # a trained model on this easy task should find 2 instances per sample
    with open(os.path.join(
            ev, sorted(os.listdir(ev))[0].replace(".csv", ".json"))
            if False else os.path.join(
            ev, [p for p in sorted(os.listdir(ev))
                 if p.endswith(".json")][0])) as f:
        res = json.load(f)
    assert res["general"]["Num GT"] == 2
    assert res["general"]["Num Pred"] >= 1


def test_infer_fused_matches_staged(trained, config_file, exp_root):
    """The device-resident fast path writes the same instance hdf layout
    as predict+decode+label and finds the same instances."""
    paths = cli.main(["--config", config_file, "--root", exp_root,
                      "-id", "testrun",
                      "-d", "infer_fused", "--mode", "val"])
    inst = os.path.join(paths["val_instanced"], "120")
    hdfs = sorted(p for p in os.listdir(inst) if p.endswith(".hdf"))
    assert len(hdfs) == 2
    io = vio.IoHDF5(os.path.join(inst, hdfs[0]), mode="r")
    out = io.read(key="vote_instances")
    io.close()
    assert out.max() >= 1  # found at least one instance

    # staged pipeline on the same split for comparison (separate exp dir
    # so the instanced outputs don't collide with the fused ones)
    import shutil

    staged_base = os.path.join(exp_root, "stagedrun")
    shutil.rmtree(staged_base, ignore_errors=True)
    shutil.copytree(os.path.join(exp_root, "testrun", "train"),
                    os.path.join(staged_base, "train"))
    staged = cli.main(["--config", config_file, "--root", exp_root,
                       "-id", "stagedrun",
                       "-d", "predict", "label", "--mode", "val"])
    sinst = os.path.join(staged["val_instanced"], "120")
    io = vio.IoHDF5(os.path.join(sinst, hdfs[0]), mode="r")
    ref_out = io.read(key="vote_instances")
    io.close()
    n_fused = len(np.unique(out[out > 0]))
    n_staged = len(np.unique(ref_out[ref_out > 0]))
    assert n_fused == n_staged


def test_predict_skips_existing(trained, config_file, exp_root):
    # second predict run must skip all existing outputs (cli.setup_logging
    # replaces handlers, so assert on the run.log file)
    log = os.path.join(trained["base"], "run.log")
    before = open(log).read()
    cli.main(["--config", config_file, "--root", exp_root,
              "-id", "testrun", "-d", "predict", "--mode", "test"])
    after = open(log).read()
    assert "skipping" in after[len(before):]


def test_validate_checkpoints(trained, config_file, exp_root):
    paths = cli.main(["--config", config_file, "--root", exp_root,
                      "-id", "testrun", "-d", "validate_checkpoints"])
    with open(os.path.join(paths["base"], "results.json")) as f:
        res = json.load(f)
    assert res["best"] is not None
    assert res["best"]["checkpoint"] == 120
    assert res["best"]["score"] > 0


def test_multihost_shard_samples(monkeypatch):
    from patchperpix_tpu.parallel.multihost import (owns_sample,
                                                    shard_samples)

    monkeypatch.setenv("PPP_PROCESS_INDEX", "1")
    monkeypatch.setenv("PPP_PROCESS_COUNT", "3")
    samples = list(range(10))
    mine = shard_samples(samples)
    assert mine == [1, 4, 7]
    # partition covers everything exactly once
    all_parts = [shard_samples(samples, index=i, count=3)
                 for i in range(3)]
    assert sorted(sum(all_parts, [])) == samples
    assert owns_sample(4, index=1, count=3)


def test_cli_swa_and_val_interleave(config_file, exp_root):
    """training.use_swa / swa_start / swa_freq / val_log_step reach the
    trainer from the CLI (ref train.py:338-374, 498-534): the checkpoint
    carries swa_params, prediction.use_swa predicts from them, and val_*
    rows appear in train_log.jsonl."""
    paths = cli.main([
        "--config", config_file, "--root", exp_root, "-id", "swarun",
        "--set", "training.max_iterations=60",
        "--set", "training.checkpoints=60",
        "--set", "training.use_swa=true",
        "--set", "training.swa_start=20",
        "--set", "training.swa_freq=10",
        "--set", "training.val_log_step=30",
        "--set", "training.snapshots=50",
        "-d", "mknet", "train"])

    from patchperpix_tpu.train.trainer import (checkpoint_path,
                                               load_checkpoint)
    state = load_checkpoint(checkpoint_path(paths["train"], 60))
    assert "swa_params" in state and state["swa_n"] >= 2

    with open(os.path.join(paths["train"], "train_log.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    val_rows = [r for r in rows if any(k.startswith("val_") for k in r)]
    assert len(val_rows) == 2  # steps 30, 60

    # training.snapshots reaches the trainer (was silently ignored)
    assert os.path.exists(os.path.join(paths["train"], "snapshots",
                                       "snapshot_50.hdf"))

    # prediction.use_swa predicts from the averaged params without error
    paths = cli.main([
        "--config", config_file, "--root", exp_root, "-id", "swarun",
        "--set", "prediction.use_swa=true",
        "-d", "predict"])
    import glob as _glob
    preds = _glob.glob(os.path.join(paths["test_processed"], "60",
                                    "*.zarr"))
    assert preds


def test_validate_multi_param_res_keys(trained, config_file, exp_root):
    """Per-param result keys (run_ppp.py:969-988): with >1 param set each
    set's labels are written under their own res_key in the SAME instanced
    hdf, so the best set's outputs survive (no delete-and-recompute)."""
    paths = cli.main([
        "--config", config_file, "--root", exp_root, "-id", "testrun",
        "--set", "validation.patch_threshold=[0.5,0.7]",
        "-d", "validate_checkpoints"])
    with open(os.path.join(paths["base"], "results.json")) as f:
        res = json.load(f)
    assert len(res["results"]) == 2
    keys = {r["res_key"] for r in res["results"]}
    assert keys == {"vote_instances_ps0", "vote_instances_ps1"}
    inst = os.path.join(paths["val_instanced"], "120")
    hdfs = sorted(p for p in os.listdir(inst) if p.endswith(".hdf"))
    assert hdfs
    io = vio.IoHDF5(os.path.join(inst, hdfs[0]), mode="r")
    a = io.read(key="vote_instances_ps0")
    b = io.read(key="vote_instances_ps1")
    io.close()
    assert a.shape == b.shape


def test_label_hdf_prediction_input(trained, config_file, exp_root):
    """label also consumes .hdf prediction files
    (utilVoteInstances.py:136-170)."""
    paths = cli.main(["--config", config_file, "--root", exp_root,
                      "-id", "testrun", "-d", "predict", "--mode", "test"])
    proc = os.path.join(paths["test_processed"], "120")
    zarrs = sorted(p for p in os.listdir(proc) if p.endswith(".zarr"))
    # convert one prediction to hdf under a fresh fake checkpoint dir
    proc2 = os.path.join(paths["test_processed"], "121")
    os.makedirs(proc2, exist_ok=True)
    z = vio.IoZarr(os.path.join(proc, zarrs[0]), mode="r")
    out = vio.IoHDF5(os.path.join(
        proc2, zarrs[0].replace(".zarr", ".hdf")), mode="w")
    for k in ("volumes/pred_affs", "volumes/pred_fgbg"):
        try:
            out.write(z.read(key=k), key=k)
        except KeyError:
            pass
    out.close()
    paths = cli.main(["--config", config_file, "--root", exp_root,
                      "-id", "testrun", "--checkpoint", "121",
                      "-d", "label", "--mode", "test"])
    inst = os.path.join(paths["test_instanced"], "121")
    hdfs = [p for p in os.listdir(inst) if p.endswith(".hdf")]
    assert len(hdfs) == 1
    io = vio.IoHDF5(os.path.join(inst, hdfs[0]), mode="r")
    outv = io.read(key="vote_instances")
    io.close()
    assert outv.max() >= 1


def test_cross_validate(trained, config_file, exp_root):
    """2-fold cross validation end-to-end (run_ppp.py:1674-1971): fold
    swap, per-fold grid files, applied scores, instance-weighted average."""
    paths = cli.main(["--config", config_file, "--root", exp_root,
                      "-id", "testrun",
                      "--set", "evaluation.average_over_instances=true",
                      "-d", "cross_validate"])
    with open(os.path.join(paths["base"], "cross_val_results.json")) as f:
        res = json.load(f)
    for k in ("val_data->test_data", "test_data->val_data"):
        assert k in res, res.keys()
        assert res[k]["best"]["checkpoint"] == 120
        assert isinstance(res[k]["applied_score"], float)
        assert "applied_score_over_instances" in res[k]
    assert res["mean_score"] is not None
    assert "instance_weighted" in res
    # fold-qualified grid-score files: selection really ran on BOTH folds
    # (second fold must not overwrite the first fold's grid)
    for fold in ("val", "test"):
        with open(os.path.join(paths["base"],
                               f"results_{fold}.json")) as f:
            grid = json.load(f)
        assert grid["best"] is not None
