"""Experiment orchestrator CLI.

Reference: experiments/run_ppp.py (2,297 LoC) — task dispatch over
``mknet train validate_checkpoints validate predict decode label
postprocess evaluate cross_validate visualize cleanup``, timestamped
experiment folders, layered TOML config with CLI overrides and provenance
write-back, per-stage wall-time logging, skip-if-exists resume.

Usage:
  python -m patchperpix_tpu.cli --config cfg.toml --root exps -d train
  python -m patchperpix_tpu.cli --config cfg.toml --root exps -id run1 \
      -d predict decode label evaluate --checkpoint 100000
"""

from __future__ import annotations

import argparse
import copy
import dataclasses
import functools
import glob
import json
import logging
import os
import shutil
import time
from datetime import datetime

import numpy as np

from . import config as cfglib
from .assembly import VoteInstancesParams, do_all, to_instance_seg
from .models import PPPConfig, PPPModel
from .utils import io as vio

logger = logging.getLogger(__name__)


def time_func(fn):
    """Per-stage wall-time logging (run_ppp.py:94-102)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.time()
        out = fn(*args, **kwargs)
        logger.info("TIME %s: %.1f s", fn.__name__, time.time() - t0)
        return out

    return wrapper


def get_arguments(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", action="append", default=None,
                   help="TOML config file(s), later override earlier; "
                        "optional with --run_from_exp")
    p.add_argument("-d", "--do", nargs="+", default=[],
                   choices=["all", "mknet", "train", "validate_checkpoints",
                            "validate", "predict", "decode", "label",
                            "infer_fused",
                            "postprocess", "evaluate", "evaluate_prediction",
                            "cross_validate", "visualize", "cleanup"])
    p.add_argument("--root", default="experiments_out")
    p.add_argument("-id", "--expid", default=None,
                   help="existing experiment id to continue")
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--test-checkpoint", type=int, default=None)
    p.add_argument("--sample", default=None, help="restrict to one sample")
    p.add_argument("--mode", default="test", choices=["train", "val", "test"])
    p.add_argument("--train-data", default=None)
    p.add_argument("--val-data", default=None)
    p.add_argument("--test-data", default=None)
    p.add_argument("--debug_args", action="store_true",
                   help="clamp iterations/workers for smoke runs")
    p.add_argument("--run_from_exp", action="store_true",
                   help="reuse the stored merged config of the experiment "
                        "given by --expid (run_ppp.py run-from-exp analog)")
    p.add_argument("--validate_on_train", action="store_true",
                   help="validate_checkpoints scores on the train split")
    p.add_argument("--param_set", type=int, default=None)
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   dest="overrides",
                   help="generic config override, dotted path: "
                        "--set vote_instances.patch_threshold=0.9 "
                        "(run_ppp.py update_config analog)")
    p.add_argument("--predict_single", action="store_true",
                   help="predict only the first sample (smoke runs)")
    args = p.parse_args(argv)
    if not args.config and not (args.run_from_exp and args.expid):
        p.error("--config is required unless --run_from_exp with --expid")
    return args


def backup_and_copy_file(src, dst_dir):
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, os.path.basename(src))
    if os.path.exists(dst):
        ts = datetime.now().strftime("%y%m%d_%H%M%S")
        shutil.copy2(dst, dst + "_backup" + ts)
    shutil.copy2(src, dst)


def create_folders(root: str, expid: str | None) -> dict:
    """Timestamped run dir + per-stage subdirs (run_ppp.py:270-330)."""
    if expid is None:
        expid = datetime.now().strftime("%y%m%d_%H%M%S")
    base = os.path.join(root, expid)
    paths = {"base": base, "expid": expid,
             "train": os.path.join(base, "train"),
             "backups": os.path.join(base, "backups")}
    for mode in ("train", "val", "test"):
        paths[f"{mode}_processed"] = os.path.join(base, mode, "processed")
        paths[f"{mode}_instanced"] = os.path.join(base, mode, "instanced")
        paths[f"{mode}_evaluated"] = os.path.join(base, mode, "evaluated")
    for p in paths.values():
        if p != expid and not p.endswith(expid):
            os.makedirs(p, exist_ok=True)
    os.makedirs(base, exist_ok=True)
    return paths


def setup_logging(base: str, level: str = "INFO"):
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(base, "run.log"))],
        force=True)


def list_samples(data_dir: str, input_format: str = "zarr") -> list[str]:
    files = sorted(glob.glob(os.path.join(data_dir, f"*.{input_format}")))
    return [os.path.splitext(os.path.basename(f))[0] for f in files]


def get_checkpoint_list(train_folder: str) -> list[int]:
    import re

    out = []
    for p in glob.glob(os.path.join(train_folder, "train_net_checkpoint_*")):
        m = re.search(r"checkpoint_(\d+)$", p)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _resolve_checkpoint(args, config, paths) -> int:
    # --test-checkpoint pins the checkpoint for test-split stages
    # (ref run_ppp.py test_checkpoint); --checkpoint applies everywhere
    if getattr(args, "mode", None) == "test" \
            and getattr(args, "test_checkpoint", None):
        return args.test_checkpoint
    if args.checkpoint:
        return args.checkpoint
    cps = get_checkpoint_list(paths["train"])
    if not cps:
        raise RuntimeError("no checkpoints found; run train first")
    return cps[-1]


def _build_model(config) -> tuple[PPPModel, PPPConfig]:
    mcfg = PPPConfig.from_config({**config.get("model", {}),
                                  "num_channels":
                                  config.get("data", {}).get(
                                      "num_channels", 1)})
    return PPPModel(mcfg), mcfg


def _load_params(model, mcfg, paths, step, config, use_swa=False):
    from .train.trainer import checkpoint_path, load_checkpoint

    # load_checkpoint is backend-portable (re-targets saved shardings to
    # the local device when they don't resolve, e.g. TPU ckpt on CPU)
    state = load_checkpoint(checkpoint_path(paths["train"], step))
    if use_swa:
        # stochastic weight averaging weights (ref predict_no_gp.py:67-72
        # loads "swa_model" state); fall back to the raw params when the
        # checkpoint predates SWA being enabled
        if "swa_params" in state:
            return state["swa_params"]
        logger.warning("prediction.use_swa set but checkpoint %s has no "
                       "swa_params; using raw params", step)
    return state["params"]


def _train_shapes(config, mcfg):
    m = config.get("model", {})
    pad = m.get("train_padding", "valid")
    if pad == "valid":
        in_sp = tuple(m.get("train_input_shape_valid", (140, 140, 140)))
    else:
        in_sp = tuple(m.get("train_input_shape_same", (104, 104, 104)))
    return in_sp, pad


def _test_shapes(config, mcfg):
    m = config.get("model", {})
    pad = m.get("val_padding", "valid")
    if pad == "valid":
        in_sp = tuple(m.get("test_input_shape_valid", (156, 156, 156)))
    else:
        in_sp = tuple(m.get("test_input_shape_same", (104, 104, 104)))
    return in_sp, pad


@time_func
def mknet(args, config, paths):
    """Compute + persist net input/output shapes (replaces the TF1 graph
    builder and the torch zero-probe, run_ppp.py:376-415)."""
    model, mcfg = _build_model(config)
    for name, (in_sp, pad) in (("train_net", _train_shapes(config, mcfg)),
                               ("test_net", _test_shapes(config, mcfg))):
        if pad == "valid":
            # compute via eval_shape on the real model
            import jax
            import jax.numpy as jnp

            raw = jnp.zeros((1, mcfg.num_channels) + in_sp, jnp.float32)
            shapes = jax.eval_shape(
                lambda r: PPPModel(mcfg).init_with_output(
                    jax.random.PRNGKey(0), r)[0], raw)
            out_sp = tuple(shapes[0].shape[2:])
        else:
            out_sp = in_sp
        net_config = {"input_shape": list(in_sp),
                      "output_shape": list(out_sp)}
        path = os.path.join(paths["base"], name + "_config.json")
        with open(path, "w") as f:
            json.dump(net_config, f)
        logger.info("%s: input %s output %s", name, in_sp, out_sp)
    return paths["base"]


def _net_config(paths, name):
    with open(os.path.join(paths["base"], name + "_config.json")) as f:
        return json.load(f)


@time_func
def train(args, config, paths):
    from .train import (AugmentConfig, CropSampler, Prefetcher,
                        SamplerConfig, TrainConfig, load_sample,
                        train_until)

    data = config.get("data", {})
    tr = config.get("training", {})
    train_dir = args.train_data or data.get("train_data")
    fmt = data.get("input_format", "zarr")
    clipmax = config.get("preprocessing", {}).get("clipmax")

    ov_folder = tr.get("sampling", {}).get("overlap_csv_folder")

    def _load_dir(d, partly=None):
        out = []
        for s in list_samples(d, fmt):
            csv = (os.path.join(ov_folder, s + ".csv")
                   if ov_folder else None)
            out.append(load_sample(
                os.path.join(d, s + "." + fmt),
                data.get("raw_key", "volumes/raw"),
                data.get("gt_key", "volumes/gt_instances"),
                clipmax=clipmax, partly=partly, overlap_csv=csv))
        return out

    samples = _load_dir(train_dir, partly=False)
    add_partly = bool(tr.get("add_partly", False))
    if add_partly:
        # partly-labeled mixing + complete oversampling (train.py:612-633)
        samples = samples * int(tr.get("oversample_complete", 1))
        partly_dir = data.get("train_data_partly") or \
            train_dir.replace("complete", "partly")
        if os.path.isdir(partly_dir) and partly_dir != train_dir:
            samples += _load_dir(partly_dir, partly=True)
        else:
            logger.warning("add_partly set but no partly data dir at %s",
                           partly_dir)

    model, mcfg = _build_model(config)
    if not os.path.exists(os.path.join(paths["base"],
                                       "train_net_config.json")):
        mknet(args, config, paths)
    nc = _net_config(paths, "train_net")

    aug = config.get("training", {}).get("augmentation", {})
    # SimpleAugment toggles (ref augmentation.simple section,
    # train.py:270-274); booleans here, default on
    simple = aug.get("simple", {})
    acfg = AugmentConfig(
        mirror=bool(simple.get("mirror", True)),
        transpose=bool(simple.get("transpose", True)),
        elastic="elastic" in aug,
        control_point_spacing=tuple(aug.get("elastic", {}).get(
            "control_point_spacing", (20, 20, 20))),
        jitter_sigma=tuple(aug.get("elastic", {}).get(
            "jitter_sigma", (1, 1, 1))),
        rotation_min=aug.get("elastic", {}).get("rotation_min", -45),
        rotation_max=aug.get("elastic", {}).get("rotation_max", 45),
        intensity_scale=tuple(aug.get("intensity", {}).get(
            "scale", (0.9, 1.1))),
        intensity_shift=tuple(aug.get("intensity", {}).get(
            "shift", (-0.1, 0.1))),
        probability_permute=tr.get("probability_permute", 0.0),
        probability_hue=tr.get("probability_hue", 0.0),
        hue_max_change=tr.get("hue_max_change", 0.5),
        probability_overlay=aug.get("overlay", {}).get(
            "probability_overlay", 0.0))
    sampling = tr.get("sampling", {})
    scfg = SamplerConfig(
        input_shape=tuple(nc["input_shape"]),
        output_shape=tuple(nc["output_shape"]),
        patchshape=tuple(p for p in config["model"]["patchshape"] if p > 1),
        batch_size=tr.get("batch_size", 2),
        probability_fg=sampling.get("probability_fg", 0.7),
        probability_overlap=sampling.get("probability_overlap", 0.25),
        probability_random=sampling.get("probability_random", 0.05),
        min_masked=sampling.get("min_masked", 0.0),
        point_balance_radius=sampling.get("point_balance_radius", 0.0),
        augment=acfg)
    # device-resident pipeline (train/device_data.py): volumes uploaded to
    # HBM once, sampling+augmentation inside the jitted step — no per-step
    # H2D and a fused K-step scan.  Used when requested and the config's
    # augmentations are reproducible on device.
    # fixed gt channel count for the jitted step: the samples' own channel
    # maximum (padding to more just burns gt_affinities_dense compute);
    # the overlay augmentation concatenates a second crop's labels, so it
    # needs double headroom or the overlaid instances would be truncated
    # to unlabeled (visible raw, background supervision)
    base_gt = max(s.labels.shape[0] for s in samples)
    if acfg.probability_overlay > 0:
        base_gt *= 2
    max_gt = int(tr.get("max_gt_channels", base_gt))
    pf = None
    if tr.get("device_sampler", False):
        from .train import DeviceSampler, device_sampler_supported

        reason = device_sampler_supported(scfg)
        if int(tr.get("num_devices", 1)) > 1:
            # the fused device loop is single-device; data-parallel runs
            # keep the host prefetcher (train_until would raise otherwise)
            reason = reason or "num_devices > 1 (data-parallel mesh)"
        if reason is None:
            pf = DeviceSampler(samples, scfg, max_gt_channels=max_gt)
            logger.info("training with the device-resident sampler")
        else:
            logger.warning("device_sampler requested but config needs %s; "
                           "falling back to the host prefetcher", reason)
    if pf is None:
        sampler = CropSampler(samples, scfg)
        pf = Prefetcher(sampler, cache_size=tr.get("cache_size", 8),
                        max_gt_channels=max_gt, with_partly=add_partly)

    max_iter = 10 if args.debug_args else tr.get("max_iterations", 400002)
    tcfg = TrainConfig(
        max_iterations=max_iter,
        checkpoints=tr.get("checkpoints", 5000),
        snapshots=tr.get("snapshots", 10000),
        val_log_step=tr.get("val_log_step", 0),
        lr=config.get("optimizer", {}).get("optimizer", {}).get("lr", 1e-4),
        lr_schedule=config.get("optimizer", {}).get("optimizer", {}).get(
            "lr_schedule", ""),
        warmup_steps=config.get("optimizer", {}).get("optimizer", {}).get(
            "warmup_steps", 0),
        optimizer=config.get("optimizer", {}).get("optimizer", {}).get(
            "optimizer", "Adam"),
        output_folder=paths["train"],
        use_swa=bool(tr.get("use_swa", False)),
        swa_start=int(tr.get("swa_start", 0)),
        swa_freq=int(tr.get("swa_freq", 1)),
        use_gt_extra=tr.get("use_gt_extra", False),
        add_partly=add_partly,
        mask_bg_weight=tr.get("mask_bg_weight", 0.01))

    # interleaved validation (ref TrainValProvider train.py:338-374): when
    # val_log_step is set, sample no-augment batches from val_data and log
    # val_* metrics every val_log_step iterations
    val_batch_fn = None
    val_pf = None
    if tcfg.val_log_step > 0:
        val_dir = args.val_data or data.get("val_data")
        if val_dir and os.path.isdir(val_dir):
            val_samples = _load_dir(val_dir)
            vcfg = dataclasses.replace(
                scfg, augment=AugmentConfig(
                    elastic=False, mirror=False, transpose=False,
                    intensity_scale=(1.0, 1.0),
                    intensity_shift=(0.0, 0.0)))
            val_sampler = CropSampler(val_samples, vcfg)
            val_pf = Prefetcher(val_sampler, cache_size=2,
                                max_gt_channels=max_gt,
                                with_partly=add_partly)
            val_batch_fn = val_pf.next
        else:
            logger.warning("val_log_step=%d but no val_data dir (%s); "
                           "interleaved validation disabled",
                           tcfg.val_log_step, val_dir)
    mesh = None
    if int(tr.get("num_devices", 1)) > 1:
        from .train.trainer import make_data_mesh

        mesh = make_data_mesh(num_devices=int(tr["num_devices"]))
    state = train_until(model, mcfg, tcfg, pf, val_batch_fn=val_batch_fn,
                        mesh=mesh)
    pf.stop()
    if val_pf is not None:
        val_pf.stop()
    return state["step"]


def _data_dir_for_mode(args, config, mode):
    data = config.get("data", {})
    return {"train": args.train_data or data.get("train_data"),
            "val": args.val_data or data.get("val_data"),
            "test": args.test_data or data.get("test_data")}[mode]


@time_func
def predict(args, config, paths, mode=None, checkpoint=None):
    """Per-sample sliding-window prediction with skip-if-exists
    (run_ppp.py:625-679)."""
    from .infer import predict_sample_to_zarr
    from .train.data import load_sample

    mode = mode or args.mode
    checkpoint = checkpoint or _resolve_checkpoint(args, config, paths)
    data = config.get("data", {})
    data_dir = _data_dir_for_mode(args, config, mode)
    out_dir = os.path.join(paths[f"{mode}_processed"], str(checkpoint))
    os.makedirs(out_dir, exist_ok=True)

    model, mcfg = _build_model(config)
    if not os.path.exists(os.path.join(paths["base"],
                                       "test_net_config.json")):
        mknet(args, config, paths)
    nc = _net_config(paths, "test_net")
    params = _load_params(model, mcfg, paths, checkpoint, config,
                          use_swa=config.get("prediction", {}).get(
                              "use_swa", False))

    samples = list_samples(data_dir, data.get("input_format", "zarr"))
    if args.sample:
        samples = [s for s in samples if s == args.sample]
    if getattr(args, "predict_single", False):
        samples = samples[:1]
    from .parallel.multihost import shard_samples

    samples = shard_samples(samples)  # multi-host fan-out (no-op solo)
    done = []
    for s in samples:
        out_path = os.path.join(out_dir, s + ".zarr")
        key = ("volumes/pred_code" if mcfg.train_code
               else "volumes/pred_affs")
        if vio.check_file(out_path, keys=[key], remove_on_error=True):
            logger.info("skipping %s (exists)", s)
            continue
        sd = load_sample(
            os.path.join(data_dir, s + "." + data.get("input_format",
                                                      "zarr")),
            data.get("raw_key", "volumes/raw"),
            data.get("gt_key", "volumes/gt_instances"),
            clipmax=config.get("preprocessing", {}).get("clipmax"))
        predict_sample_to_zarr(
            model, params, sd.raw, mcfg,
            nc["input_shape"], nc["output_shape"], out_path,
            batch_size=config.get("prediction", {}).get("batch_size", 1))
        done.append(s)
    return done


@time_func
def decode(args, config, paths, mode=None, checkpoint=None):
    """Code -> dense affinities for predicted samples (run_ppp.py:682-746)."""
    from .infer import decode_sample

    mode = mode or args.mode
    checkpoint = checkpoint or _resolve_checkpoint(args, config, paths)
    out_dir = os.path.join(paths[f"{mode}_processed"], str(checkpoint))
    model, mcfg = _build_model(config)
    if not mcfg.train_code:
        logger.info("direct-affinity model; decode is a no-op")
        return []
    params = _load_params(model, mcfg, paths, checkpoint, config)
    done = []
    for path in sorted(glob.glob(os.path.join(out_dir, "*.zarr"))):
        if vio.check_file(path, keys=["volumes/pred_affs"]):
            logger.info("skipping %s (decoded)", path)
            continue
        decode_sample(model, params, path, mcfg,
                      fg_thresh=config.get("prediction", {}).get(
                          "fg_thresh", 0.5),
                      batch_size=config.get("model", {}).get(
                          "decode_batch_size", 1024))
        done.append(path)
    return done


@time_func
def label(args, config, paths, mode=None, checkpoint=None,
          param_overrides=None):
    """vote_instances per sample (run_ppp.py:1054-1190)."""
    mode = mode or args.mode
    checkpoint = checkpoint or _resolve_checkpoint(args, config, paths)
    in_dir = os.path.join(paths[f"{mode}_processed"], str(checkpoint))
    out_dir = os.path.join(paths[f"{mode}_instanced"], str(checkpoint))
    os.makedirs(out_dir, exist_ok=True)

    vi_cfg = dict(config.get("vote_instances", {}))
    vi_cfg["patchshape"] = config["model"]["patchshape"]
    vi_cfg["overlapping_inst"] = config["model"].get("overlapping_inst",
                                                     False)
    if vi_cfg.get("overlapping_inst"):
        vi_cfg.setdefault("numinst_key", "volumes/pred_numinst")
    if param_overrides:
        vi_cfg.update(param_overrides)
    params = VoteInstancesParams.from_config(vi_cfg,
                                             result_folder=out_dir)
    if params.blockwise and config["model"].get("train_code", False):
        # ppp+dec blockwise: decode code windows on demand inside assembly
        # for predictions with no dense pred_affs store (out-of-core; the
        # decode stage / its 50-100 GB dense volume are skipped entirely).
        # Files that DO carry pred_affs still stream from the dense store
        # (blockwise_vote_instances_zarr prefers it per file).
        from .infer.decode import CodeDecoder

        model, mcfg = _build_model(config)
        mparams = _load_params(model, mcfg, paths, checkpoint, config)
        params.code_decoder = CodeDecoder(
            model, mparams, mcfg,
            batch_size=config.get("model", {}).get(
                "decode_batch_size", 1024))
    todo = []
    # zarr + hdf prediction inputs (ref also labels hdf predictions,
    # utilVoteInstances.py:136-170)
    pred_paths = sorted(glob.glob(os.path.join(in_dir, "*.zarr"))
                        + glob.glob(os.path.join(in_dir, "*.hdf")))
    for path in pred_paths:
        s = os.path.splitext(os.path.basename(path))[0]
        if args.sample and s != args.sample:
            continue
        out_path = os.path.join(out_dir, s + ".hdf")
        if os.path.abspath(out_path) == os.path.abspath(path):
            continue
        if vio.check_file(out_path, keys=[params.res_key],
                          remove_on_error=True):
            logger.info("skipping %s (labelled)", s)
            continue
        todo.append((s, path))
    from .parallel.multihost import shard_samples

    todo = shard_samples(todo)  # multi-host fan-out (no-op solo)

    # sample parallelism (ref mp.Pool(num_parallel_samples) + GPU mutex,
    # run_ppp.py:1070-1081): a thread pool suffices here — the JAX runtime
    # serializes device dispatch, so only host IO/numpy stages overlap
    n_par = int(params.num_parallel_samples)
    if n_par > 1 and len(todo) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=n_par) as ex:
            list(ex.map(lambda sp: do_all(sp[1], params,
                                          result_folder=out_dir), todo))
    else:
        for s, path in todo:
            do_all(path, params, result_folder=out_dir)
    return [s for s, _ in todo]


@time_func
def infer_fused(args, config, paths, mode=None, checkpoint=None,
                param_overrides=None):
    """predict -> decode -> assemble fully device-resident per sample.

    The fast path: tile predictions accumulate on device, codes decode +
    scatter on device, and assembly consumes the device affinity stack -
    no float16 zarr roundtrip between stages (the reference writes/reads
    one per stage, predict_no_gp.py:230-233 / decode.py:43).  Output is
    the same instance hdf the label task writes, so evaluate/postprocess
    work unchanged.  Use predict/decode/label instead when per-stage
    artifacts or restart-resume matter.
    """
    from .infer.fused import decode_volume_device, predict_volume_device
    from .train.data import load_sample

    mode = mode or args.mode
    checkpoint = checkpoint or _resolve_checkpoint(args, config, paths)
    data = config.get("data", {})
    data_dir = _data_dir_for_mode(args, config, mode)
    out_dir = os.path.join(paths[f"{mode}_instanced"], str(checkpoint))
    os.makedirs(out_dir, exist_ok=True)

    model, mcfg = _build_model(config)
    if not os.path.exists(os.path.join(paths["base"],
                                       "test_net_config.json")):
        mknet(args, config, paths)
    nc = _net_config(paths, "test_net")
    params = _load_params(model, mcfg, paths, checkpoint, config,
                          use_swa=config.get("prediction", {}).get(
                              "use_swa", False))

    vi_cfg = dict(config.get("vote_instances", {}))
    vi_cfg["patchshape"] = config["model"]["patchshape"]
    vi_cfg["overlapping_inst"] = config["model"].get("overlapping_inst",
                                                     False)
    if param_overrides:
        vi_cfg.update(param_overrides)
    vparams = VoteInstancesParams.from_config(vi_cfg,
                                              result_folder=out_dir)

    from .assembly.vote_instances import finalize_and_write

    samples = list_samples(data_dir, data.get("input_format", "zarr"))
    if args.sample:
        samples = [s for s in samples if s == args.sample]
    if getattr(args, "predict_single", False):
        samples = samples[:1]
    from .parallel.multihost import shard_samples

    samples = shard_samples(samples)
    done = []
    fg_thresh = config.get("prediction", {}).get("fg_thresh", 0.5)
    for s in samples:
        out_path = os.path.join(out_dir, s + ".hdf")
        if vio.check_file(out_path, keys=[vparams.res_key],
                          remove_on_error=True):
            logger.info("skipping %s (labelled)", s)
            continue
        sd = load_sample(
            os.path.join(data_dir, s + "." + data.get("input_format",
                                                      "zarr")),
            data.get("raw_key", "volumes/raw"),
            data.get("gt_key", "volumes/gt_instances"),
            clipmax=config.get("preprocessing", {}).get("clipmax"))
        h1, h2 = predict_volume_device(
            model, params, sd.raw, mcfg,
            nc["input_shape"], nc["output_shape"])
        prob = np.asarray(h2, np.float32)
        if mcfg.overlapping_inst:
            from .assembly.vote_instances import numinst_from_probs

            numinst = numinst_from_probs(prob, vparams)
            fg = numinst > 0
        else:
            fg = prob[0] > fg_thresh  # same comparison as load_affinities
            numinst = fg.astype(np.uint8)
        if mcfg.train_code:
            affs = decode_volume_device(model, params, h1, fg, mcfg)
        else:
            affs = h1
        if affs.ndim == 3:  # 2D data -> (P, 1, H, W), as load_affinities
            affs = affs[:, None]
            fg = fg[None]
            numinst = numinst[None]
        inst, fg_out = to_instance_seg(affs, fg, fg.copy(), numinst,
                                       vparams)
        finalize_and_write(inst, fg_out, vparams, s, out_dir)
        done.append(s)
    return done


@time_func
def evaluate(args, config, paths, mode=None, checkpoint=None,
             res_key=None) -> dict:
    """Instance metrics per sample + CSV summary (run_ppp.py:1446-1536).

    ``res_key`` overrides the hdf dataset read per sample — used by
    validate_checkpoints' per-param result keys (run_ppp.py:969-988)."""
    from .evaluate import evaluate_file, summarize_metric_dict

    mode = mode or args.mode
    checkpoint = checkpoint or _resolve_checkpoint(args, config, paths)
    inst_dir = os.path.join(paths[f"{mode}_instanced"], str(checkpoint))
    eval_dir = os.path.join(paths[f"{mode}_evaluated"], str(checkpoint))
    os.makedirs(eval_dir, exist_ok=True)
    data = config.get("data", {})
    data_dir = _data_dir_for_mode(args, config, mode)
    ev = config.get("evaluation", {})

    kwargs = dict(
        res_key=res_key or ev.get("res_key", "vote_instances"),
        gt_key=data.get("gt_key", "volumes/gt_instances"),
        localization_criterion=ev.get("localization_criterion", "iou"),
        assignment_strategy=ev.get("assignment_strategy", "hungarian"),
        remove_small_components=ev.get("remove_small_components", 0),
        keep_gt_shape=ev.get("keep_gt_shape", False),
        add_general_metrics=ev.get("add_general_metrics", ()),
        add_multi_thresh_metrics=ev.get("add_multi_thresh_metrics", ()))
    # partly-labeled split (run_ppp.py:1206-1212): when add_partly_val is
    # set and a partly-annotated GT variant exists (complete -> partly path
    # swap), evaluate against it with partly=True so predictions in
    # unlabeled regions are not counted as FP
    add_partly_val = bool(data.get("add_partly_val", False))
    jobs = []
    for path in sorted(glob.glob(os.path.join(inst_dir, "*.hdf"))):
        s = os.path.splitext(os.path.basename(path))[0]
        if args.sample and s != args.sample:
            continue
        gt_file = os.path.join(data_dir,
                               s + "." + data.get("input_format", "zarr"))
        # partly detection scoped to the data dir + file names (the
        # reference substring-tests the whole path, run_ppp.py:1213, which
        # misfires when an unrelated parent dir contains "partly")
        partly = ("partly" in os.path.basename(os.path.normpath(data_dir))
                  or "partly" in os.path.basename(gt_file))
        if add_partly_val and not partly:
            partly_gt = gt_file.replace("complete", "partly")
            if partly_gt != gt_file and os.path.exists(partly_gt):
                gt_file, partly = partly_gt, True
        jobs.append((s, path, gt_file, partly))
    from .parallel.multihost import shard_samples

    jobs = shard_samples(jobs)  # multi-host fan-out (no-op solo)

    # per-sample parallel evaluation (ref joblib, run_ppp.py:1469-1475)
    n_workers = int(ev.get("num_workers", 1))
    metric_dicts = {}
    complete = {s: not partly for s, _p, _g, partly in jobs}
    if n_workers > 1 and len(jobs) > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=n_workers) as ex:
            futs = {s: ex.submit(evaluate_file, p, g, partly=partly,
                                 **kwargs)
                    for s, p, g, partly in jobs}
            for s, fut in futs.items():
                metric_dicts[s] = fut.result()
    else:
        for s, p, g, partly in jobs:
            metric_dicts[s] = evaluate_file(p, g, partly=partly, **kwargs)
    for s, res in metric_dicts.items():
        with open(os.path.join(eval_dir, s + ".json"), "w") as f:
            json.dump(res, f, indent=2, default=float)

    # summaries (run_ppp.py:1488-1529): complete samples -> summary.csv,
    # partly samples -> summary_partly.csv, all -> summary_combined.csv
    if metric_dicts and ev.get("summary"):
        full = {s: m for s, m in metric_dicts.items() if complete[s]}
        part = {s: m for s, m in metric_dicts.items() if not complete[s]}
        name = "summary.csv" if full or not part else "summary_partly.csv"
        summarize_metric_dict(full or part, ev["summary"],
                              os.path.join(eval_dir, name))
        if full and part:
            summarize_metric_dict(
                part, ev.get("summary_partly", ev["summary"]),
                os.path.join(eval_dir, "summary_partly.csv"))
            summarize_metric_dict(metric_dicts, ev["summary"],
                                  os.path.join(eval_dir,
                                               "summary_combined.csv"))
    return metric_dicts


def _metric_of(metric_dicts: dict, metric_key: str) -> float:
    vals = [cfglib.get_by_path(md, metric_key) for md in
            metric_dicts.values()]
    vals = [v for v in vals if v is not None]
    return float(np.mean(vals)) if vals else float("-inf")


@time_func
def validate_checkpoints(args, config, paths, mode=None,
                         results_name="results.json"):
    """Grid search: checkpoints x parameter sets; selects the best by the
    configured metric and writes results.json (run_ppp.py:919-1051)."""
    val = config.get("validation", {})
    metric_key = config.get("evaluation", {}).get(
        "metric", "confusion_matrix.avFscore")
    checkpoints = val.get("checkpoints") or get_checkpoint_list(
        paths["train"])
    param_sets = cfglib.named_params(val) or [{}]
    if args.param_set is not None:
        param_sets = [param_sets[args.param_set]]

    # selection split: val by default; 'train' with --validate_on_train
    # (ref run_ppp.py); cross_validate passes mode= explicitly per fold
    if getattr(args, "validate_on_train", False):
        vmode = "train"
    else:
        vmode = mode or "val"
    base_res_key = config.get("evaluation", {}).get("res_key",
                                                    "vote_instances")
    results = []
    for cp in checkpoints:
        predict(args, config, paths, mode=vmode, checkpoint=cp)
        decode(args, config, paths, mode=vmode, checkpoint=cp)
        for pi, pset in enumerate(param_sets):
            # per-param result keys (run_ppp.py:969-988): each param set's
            # labels live under their own res_key in the same hdf, so the
            # best param set's outputs survive for the apply step instead
            # of being deleted and recomputed
            res_key = (base_res_key if len(param_sets) == 1
                       else f"{base_res_key}_ps{pi}")
            label(args, config, paths, mode=vmode, checkpoint=cp,
                  param_overrides={**pset, "res_key": res_key})
            mdicts = evaluate(args, config, paths, mode=vmode,
                              checkpoint=cp, res_key=res_key)
            score = _metric_of(mdicts, metric_key)
            results.append({"checkpoint": cp, "params": pset,
                            "res_key": res_key,
                            "metric": metric_key, "score": score})
            logger.info("checkpoint %s params %s -> %s = %.5f",
                        cp, pset, metric_key, score)

    best = max(results, key=lambda r: r["score"]) if results else None
    out = {"results": results, "best": best}
    with open(os.path.join(paths["base"], results_name), "w") as f:
        json.dump(out, f, indent=2, default=float)
    return out


@time_func
def cross_validate(args, config, paths):
    """2-fold cross validation over the configured folds
    (run_ppp.py:1674-1971): best params on fold A applied to fold B and
    vice versa; scores averaged over samples."""
    metric_key = config.get("evaluation", {}).get(
        "metric", "confusion_matrix.avFscore")
    folds = config.get("data", {}).get("cross_val_folders",
                                       ["val_data", "test_data"])
    fold_modes = {"val_data": "val", "test_data": "test"}
    # FlyLight variant: accumulate per-instance TP/FP/FN + skeleton
    # coverages across folds instead of sample means
    # (run_ppp.py:1609-1671)
    over_instances = config.get("evaluation", {}).get(
        "average_over_instances", False)
    fold_counts = []
    results = {}
    for select_fold, apply_fold in (tuple(folds), tuple(reversed(folds))):
        sel_mode = fold_modes.get(select_fold, "val")
        app_mode = fold_modes.get(apply_fold, "test")
        args_sel = copy.copy(args)
        args_sel.mode = sel_mode
        # mode= routes selection to THIS fold's split (validate_checkpoints
        # otherwise defaults to val, which made the second fold select and
        # apply on the same split); fold-qualified results file so the
        # second fold doesn't overwrite the first fold's grid scores
        r = validate_checkpoints(args_sel, config, paths, mode=sel_mode,
                                 results_name=f"results_{sel_mode}.json")
        best = r["best"]
        if best is None:
            continue
        cp = best["checkpoint"]
        predict(args, config, paths, mode=app_mode, checkpoint=cp)
        decode(args, config, paths, mode=app_mode, checkpoint=cp)
        label(args, config, paths, mode=app_mode, checkpoint=cp,
              param_overrides=best["params"])
        mdicts = evaluate(args, config, paths, mode=app_mode, checkpoint=cp)
        entry = {"best": best,
                 "applied_score": _metric_of(mdicts, metric_key)}
        if over_instances:
            from .evaluate import average_score_over_instances

            avs, counts = average_score_over_instances(mdicts)
            entry["applied_score_over_instances"] = avs
            fold_counts.append(counts)
        results[f"{select_fold}->{apply_fold}"] = entry
    scores = [v["applied_score"] for v in results.values()]
    results["mean_score"] = float(np.mean(scores)) if scores else None
    if over_instances and len(fold_counts) == 2:
        from .evaluate import average_score_with_instance_counts

        avs, acc = average_score_with_instance_counts(*fold_counts)
        results["instance_weighted"] = acc
    with open(os.path.join(paths["base"], "cross_val_results.json"),
              "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results


@time_func
def evaluate_prediction(args, config, paths, mode=None, checkpoint=None):
    """Prediction-only metrics: numinst / fg / patch-IoU with the oracle
    volume written back (run_ppp.py:1300-1443)."""
    from .evaluate import evaluate_fg, evaluate_numinst, evaluate_patch
    from .train.data import load_sample

    mode = mode or args.mode
    checkpoint = checkpoint or _resolve_checkpoint(args, config, paths)
    proc = os.path.join(paths[f"{mode}_processed"], str(checkpoint))
    data = config.get("data", {})
    data_dir = _data_dir_for_mode(args, config, mode)
    evp = config.get("evaluation", {}).get("prediction", {})
    model_cfg = config.get("model", {})
    ps = tuple(model_cfg.get("patchshape", (7, 7, 7)))

    out = {}
    for path in sorted(glob.glob(os.path.join(proc, "*.zarr"))):
        s = os.path.splitext(os.path.basename(path))[0]
        if args.sample and s != args.sample:
            continue
        io = vio.open_volume(path, mode="r")
        sd = load_sample(
            os.path.join(data_dir, s + "." + data.get("input_format",
                                                      "zarr")),
            data.get("raw_key", "volumes/raw"),
            data.get("gt_key", "volumes/gt_instances"))
        res: dict = {}
        if evp.get("eval_patch_prediction"):
            affs = io.read(key=config.get("prediction", {}).get(
                "aff_key", "volumes/pred_affs")).astype(np.float32)
            patch_res = evaluate_patch(affs, sd.labels, ps)
            if evp.get("store_iou", True):
                # write the oracle IoU volume back into the pred file
                # (use_score_oracle consumes it; run_ppp.py:1370-1443)
                oth = evp.get("oracle_threshold", 0.5)
                okey = "th_" + str(round(oth, 2)).replace(".", "_")
                iou = patch_res[okey]["iou_volume"]
                wio = vio.open_volume(path, mode="r+")
                wio.create("volumes/patch_iou", iou.shape, np.float32,
                           chunks=iou.shape)
                wio.write(iou.astype(np.float32), key="volumes/patch_iou")
                wio.close()
            res["patch"] = {
                k: {kk: vv for kk, vv in v.items() if kk != "iou_volume"}
                for k, v in patch_res.items()}
        if evp.get("eval_numinst_prediction") and \
                model_cfg.get("overlapping_inst"):
            ni = io.read(key=config.get("prediction", {}).get(
                "numinst_key", "volumes/pred_numinst")).astype(np.float32)
            res["numinst"] = evaluate_numinst(
                ni, sd.labels, evp.get("max_numinst", 2))
        if evp.get("eval_fg_prediction"):
            key = config.get("prediction", {}).get("fg_key",
                                                   "volumes/pred_fgbg")
            try:
                fg_prob = io.read(key=key).astype(np.float32)[0]
            except Exception:
                ni = io.read(key=config.get("prediction", {}).get(
                    "numinst_key", "volumes/pred_numinst")).astype(
                        np.float32)
                fg_prob = 1.0 - ni[0]
            res["fg"] = evaluate_fg(fg_prob, sd.fg_mask)
        io.close()
        out[s] = res
        with open(os.path.join(proc, s + "_pred_metrics.json"), "w") as f:
            json.dump(res, f, indent=2, default=float)
    return out


@time_func
def postprocess(args, config, paths):
    """Instance cleanup + optional per-instance skeleton NRRD export
    (run_ppp.py:2230-2259, util/postprocess.py:76-119)."""
    from .utils.postprocess import postprocess_instances

    checkpoint = _resolve_checkpoint(args, config, paths)
    inst_dir = os.path.join(paths[f"{args.mode}_instanced"], str(checkpoint))
    pp = config.get("postprocessing", {})
    rm = pp.get("remove_small_comps",
                config.get("vote_instances", {}).get(
                    "remove_small_comps", 0))
    for path in sorted(glob.glob(os.path.join(inst_dir, "*.hdf"))):
        postprocess_instances(
            path, res_key=config.get("evaluation", {}).get(
                "res_key", "vote_instances"),
            remove_small_comps=rm,
            export_skeleton_nrrds=pp.get("export_skeleton_nrrds", False))
    return inst_dir


@time_func
def visualize(args, config, paths):
    """Patch mosaics + instance PNGs (run_ppp.py:1539-1606)."""
    import h5py

    from .visualize import visualize_instances
    from .visualize.patches import visualize_patches

    checkpoint = _resolve_checkpoint(args, config, paths)
    inst_dir = os.path.join(paths[f"{args.mode}_instanced"], str(checkpoint))
    viz = config.get("visualize", {})
    out = []
    for path in sorted(glob.glob(os.path.join(inst_dir, "*.hdf"))):
        s = os.path.splitext(os.path.basename(path))[0]
        with h5py.File(path, "r") as f:
            inst = f["vote_instances"][()]
        png = os.path.join(inst_dir, s + ".png")
        visualize_instances(inst, png)
        out.append(png)
    if viz.get("show_patches"):
        # patch-prediction mosaics from the processed zarrs
        proc = os.path.join(paths[f"{args.mode}_processed"],
                            str(checkpoint))
        ps = tuple(config["model"]["patchshape"])
        for path in sorted(glob.glob(os.path.join(proc, "*.zarr"))):
            s = os.path.splitext(os.path.basename(path))[0]
            io = vio.open_volume(path, mode="r")
            try:
                affs = io.read(key=config.get("prediction", {}).get(
                    "aff_key", "volumes/pred_affs")).astype(np.float32)
            except Exception:
                io.close()
                continue
            io.close()
            png = os.path.join(proc, s + "_patches.png")
            visualize_patches(affs, ps, png,
                              z=viz.get("patch_mosaic_z"))
            out.append(png)
    return out


@time_func
def cleanup(args, config, paths):
    """Delete predictions whose instances exist (run_ppp.py:1092-1107)."""
    checkpoint = _resolve_checkpoint(args, config, paths)
    removed = []
    for mode in ("val", "test"):
        proc = os.path.join(paths[f"{mode}_processed"], str(checkpoint))
        inst = os.path.join(paths[f"{mode}_instanced"], str(checkpoint))
        for path in sorted(glob.glob(os.path.join(proc, "*.zarr"))):
            s = os.path.splitext(os.path.basename(path))[0]
            if os.path.exists(os.path.join(inst, s + ".hdf")):
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
    return removed


def main(argv=None):
    args = get_arguments(argv)
    cfg_files = list(args.config or [])
    if args.run_from_exp and args.expid:
        stored = os.path.join(args.root, args.expid, "config.toml")
        if not os.path.exists(stored):
            raise FileNotFoundError(f"--run_from_exp: {stored} not found")
        cfg_files = [stored] + cfg_files
        args.config = cfg_files
    config = cfglib.load_config(*cfg_files)
    for ov in args.overrides:
        key, _, val = ov.partition("=")
        import ast

        try:
            parsed = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            parsed = val
        cfglib.set_by_path(config, key.strip(), parsed)
    if args.debug_args:
        cfglib.set_by_path(config, "training.max_iterations", 10)
        cfglib.set_by_path(config, "training.cache_size", 2)

    paths = create_folders(args.root, args.expid)
    setup_logging(paths["base"],
                  config.get("general", {}).get("logging", "INFO"))

    # provenance: merged config + original files into backups/, plus a git
    # diff of the framework source (run_ppp.py:2014-2022)
    cfglib.dump_config(config, os.path.join(paths["base"], "config.toml"))
    for c in args.config:
        backup_and_copy_file(c, paths["backups"])
    try:
        import subprocess

        src_root = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        diff = subprocess.run(
            ["git", "-C", src_root, "diff", "HEAD"],
            capture_output=True, text=True, timeout=30)
        head = subprocess.run(
            ["git", "-C", src_root, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=30)
        ts = datetime.now().strftime("%y%m%d_%H%M%S")
        with open(os.path.join(paths["backups"],
                               f"ppp_source_{ts}.diff"), "w") as f:
            f.write(f"# HEAD: {head.stdout.strip()}\n")
            f.write(diff.stdout)
    except Exception as e:  # provenance is best-effort
        logger.warning("git provenance snapshot failed: %s", e)

    tasks = args.do or ["all"]
    if "all" in tasks:
        tasks = ["mknet", "train", "validate_checkpoints", "predict",
                 "decode", "label", "evaluate"]
    dispatch = {
        "mknet": mknet, "train": train, "predict": predict,
        "decode": decode, "label": label, "infer_fused": infer_fused,
        "evaluate": evaluate,
        "validate_checkpoints": validate_checkpoints,
        "validate": validate_checkpoints,
        "evaluate_prediction": evaluate_prediction,
        "cross_validate": cross_validate,
        "postprocess": postprocess, "visualize": visualize,
        "cleanup": cleanup,
    }
    for task in tasks:
        logger.info("=== task %s ===", task)
        dispatch[task](args, config, paths)
    return paths


if __name__ == "__main__":
    main()
