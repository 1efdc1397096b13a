"""Training loop: optax optimization, orbax checkpoints, SWA, val interleave.

Reference: experiments/.../train.py train_until (gp.TorchTrainExt loop with
AMP/SWA/checkpointing, train.py:498-572).  The train step is one jitted
function; data arrives from the host Prefetcher with static shapes.
"""

from __future__ import annotations

import functools
import glob
import json
import logging
import os
import re
import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.losses import masked_bce_logits, masked_ce, sampled_bce, summaries
from ..models.ppp import PPPConfig, PPPModel
from ..ops.affinities import (gather_at, gt_affinities_dense,
                              gt_affinities_sampled, sample_fg_corners)

logger = logging.getLogger(__name__)


@dataclass
class TrainConfig:
    max_iterations: int = 400002
    checkpoints: int = 5000          # checkpoint interval
    snapshots: int = 10000
    val_log_step: int = 0
    lr: float = 1e-4
    lr_schedule: str = ""    # "" (constant, ref train.py:498 Adam 1e-4),
                             # "cosine" (linear warmup + cosine decay to
                             # lr/10 over max_iterations)
    warmup_steps: int = 0
    optimizer: str = "Adam"
    use_swa: bool = False
    swa_start: int = 0
    swa_freq: int = 1
    output_folder: str = "."
    log_every: int = 100
    tensorboard: bool = True   # scalar summaries to <output>/tb when
                               # torch.utils.tensorboard is available
                               # (ref gp.TorchTrainExt(log_dir=...),
                               # train.py:521)
    mask_bg_weight: float = 0.01
    use_gt_extra: bool = False
    add_partly: bool = False   # partly-labeled data: per-pixel loss mask
                               # from labels (1 at labeled px, bg_weight
                               # elsewhere; ref CreateMask train.py:735-741)


def checkpoint_path(folder: str, step: int, name: str = "train_net") -> str:
    return os.path.join(folder, f"{name}_checkpoint_{step}")


def get_latest_checkpoint(folder: str, name: str = "train_net"):
    """Natural-sorted latest checkpoint (train_util.py:19-52)."""
    paths = glob.glob(os.path.join(folder, f"{name}_checkpoint_*"))
    best, best_step = None, -1
    for p in paths:
        m = re.search(r"checkpoint_(\d+)$", p)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best, best_step


def save_checkpoint(path: str, state: dict):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), state, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(path: str, template: dict | None = None) -> dict:
    """Restore a checkpoint; portable across backends.

    A checkpoint written on one backend (TPU trainer) must load on any
    other (CPU inference/tests): when the saved device shardings don't
    resolve locally, re-target every array to the local default device
    via the checkpoint's own metadata."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    try:
        if template is None:
            return ckpt.restore(path)
        return ckpt.restore(path, target=template)
    except Exception:
        meta = ckpt.metadata(path).item_metadata
        sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sh),
            dict(meta))
        return ckpt.restore(path, abstract)


def resume_state(path: str, state: dict, optimizer) -> dict:
    """Checkpoint resume tolerant of optimizer-structure changes.

    Switching the lr schedule (e.g. cosine -> constant for a fine-tune)
    changes the optax state pytree; the template restore then falls back
    to a raw-dict restore that loses the NamedTuple structure and crashes
    optimizer.update later.  Detect the structure mismatch and
    reinitialize the optimizer from the restored params instead."""
    tmpl_opt = state["opt_state"]
    state = load_checkpoint(path, state)
    if jax.tree_util.tree_structure(state["opt_state"]) != \
            jax.tree_util.tree_structure(tmpl_opt):
        logger.warning("optimizer state structure changed since the "
                       "checkpoint; reinitializing optimizer moments")
        state["opt_state"] = optimizer.init(state["params"])
    return state


def make_optimizer(cfg: TrainConfig):
    sched = cfg.lr
    if cfg.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if cfg.warmup_steps else cfg.lr,
            peak_value=cfg.lr,
            warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=cfg.max_iterations,
            end_value=cfg.lr / 10.0)
    elif cfg.lr_schedule:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule}")
    name = cfg.optimizer.lower()
    if name == "adam":
        return optax.adam(sched)
    if name == "sgd":
        return optax.sgd(sched)
    raise ValueError(f"unknown optimizer {cfg.optimizer}")


def make_train_step(model: PPPModel, mcfg: PPPConfig, tcfg: TrainConfig,
                    optimizer, mesh=None, raw_spec=None, labels_spec=None,
                    jit=True):
    """Returns jitted step(params, opt_state, raw, labels, rng) ->
    (params, opt_state, metrics).

    With ``mesh`` the step is compiled data-parallel (GSPMD): params and
    optimizer state replicated, batches sharded over the mesh's first axis
    (override per-array layouts with ``raw_spec``/``labels_spec``, e.g. add
    a spatial axis); XLA inserts the gradient all-reduce over ICI.  This is
    the TPU-native translation of the reference's single-GPU train loop
    (SURVEY §2.6: pjit over a data axis, psum for grads)."""
    ps = mcfg.patchshape_squeezed
    max_ni = mcfg.max_num_inst

    def compute_losses(params, raw, labels, rng, partly=None):
        h1, h2 = model.apply(params, raw)
        # AMP (ref train.py:552-572 autocast): convs run in cfg.dtype
        # (e.g. bfloat16 on the MXU), losses always accumulate in f32
        h1 = h1.astype(jnp.float32)
        h2 = h2.astype(jnp.float32)
        out_sp = h1.shape[2:]
        ndim = len(out_sp)
        rad = tuple(p // 2 for p in ps)

        # numinst / fgbg GT from the context-padded labels, center-cropped
        lab_sp = labels.shape[2:]
        center_sl = (slice(None), slice(None)) + tuple(
            slice(r, r + o) for r, o in zip(rad, out_sp))
        labels_out = labels[center_sl]
        ninst = jnp.sum(labels_out > 0, axis=1)
        gt_fg = ninst == 1 if mcfg.overlapping_inst else ninst > 0

        # partly-labeled loss mask (CreateMask, train.py:735-741): for
        # partly items, labeled px weigh 1 and unlabeled px bg_weight;
        # complete items weigh 1 everywhere
        loss_mask = None
        if partly is not None:
            labeled = (ninst > 0).astype(h1.dtype)
            pmask = labeled + (1.0 - labeled) * tcfg.mask_bg_weight
            item = partly.reshape((-1,) + (1,) * ndim).astype(h1.dtype)
            loss_mask = (item * pmask + (1.0 - item))[:, None]

        if mcfg.train_code:
            code = jnp.moveaxis(h1, 1, -1)          # (B, *out, code)
            corners, valid = sample_fg_corners(
                rng, gt_fg, mcfg.num_code_samples)
            codes = gather_at(code, corners)
            act = {"sigmoid": jax.nn.sigmoid, "relu": jax.nn.relu,
                   "identity": lambda v: v}[mcfg.code_activation.lower()]
            codes = act(codes)
            pred_patch_logits = model.apply(params, codes,
                                            method=PPPModel.decode)
            gt_affs = gt_affinities_sampled(labels, corners, ps)
            gt_affs = gt_affs.reshape((-1,) + tuple(ps))
            loss_patch = sampled_bce(pred_patch_logits, gt_affs, valid)
            pred_affs_prob = jax.nn.sigmoid(pred_patch_logits)
            gt_affs_metric = gt_affs
        else:
            gt_affs = gt_affinities_dense(labels, ps)   # (B, P, *out)
            loss_patch = masked_bce_logits(h1, gt_affs, loss_mask,
                                           num_channels=float(mcfg.patchsize))
            pred_affs_prob = jax.nn.sigmoid(h1)
            gt_affs_metric = gt_affs

        if mcfg.overlapping_inst:
            gt_ni = jnp.clip(ninst, 0, max_ni)
            loss_fg = masked_ce(h2, gt_ni, loss_mask,
                                use_gt_extra=tcfg.use_gt_extra)
            pred_fg_prob = 1.0 - jax.nn.softmax(h2, axis=1)[:, 0]
            gt_fg_metric = (ninst > 0).astype(jnp.float32)
        else:
            gt_fgbg = (ninst > 0).astype(h2.dtype)[:, None]
            loss_fg = masked_bce_logits(h2, gt_fgbg, loss_mask)
            pred_fg_prob = jax.nn.sigmoid(h2[:, 0])
            gt_fg_metric = gt_fgbg[:, 0]

        loss = loss_patch + loss_fg
        mets = {"loss": loss, "loss_patch": loss_patch, "loss_fg": loss_fg}
        mets.update(summaries(pred_affs_prob, gt_affs_metric,
                              pred_fg_prob, gt_fg_metric))
        return loss, mets

    add_partly = tcfg.add_partly

    def step(params, opt_state, raw, labels, rng, partly=None):
        (loss, mets), grads = jax.value_and_grad(
            compute_losses, has_aux=True)(params, raw, labels, rng, partly)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mets

    def eval_step(params, raw, labels, rng, partly=None):
        _, mets = compute_losses(params, raw, labels, rng, partly)
        return mets

    if not jit:
        return step, eval_step
    if mesh is None:
        return jax.jit(step), jax.jit(eval_step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    data_axis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    raw_sh = NamedSharding(mesh, raw_spec if raw_spec is not None
                           else P(data_axis))
    labels_sh = NamedSharding(mesh, labels_spec if labels_spec is not None
                              else P(data_axis))
    step_in = [repl, repl, raw_sh, labels_sh, repl]
    eval_in = [repl, raw_sh, labels_sh, repl]
    if add_partly:
        step_in.append(NamedSharding(mesh, P(data_axis)))
        eval_in.append(NamedSharding(mesh, P(data_axis)))
    step = jax.jit(step,
                   in_shardings=tuple(step_in),
                   out_shardings=(repl, repl, repl))
    eval_step = jax.jit(eval_step,
                        in_shardings=tuple(eval_in),
                        out_shardings=repl)
    return step, eval_step


def make_fused_chunk(model: PPPModel, mcfg: PPPConfig, tcfg: TrainConfig,
                     optimizer, dsampler, K: int):
    """K train steps fused into ONE device dispatch via lax.scan, with the
    batch sampled on device each step (DeviceSampler).  Zero per-step
    host<->device traffic; SWA averaging runs inside the scan.

    Returns jitted chunk(params, opt_state, swa_params, swa_n, rng, step0)
    -> ((params, opt_state, swa_params, swa_n, rng), stacked metrics (K,)).
    ``step0`` is a device scalar (the global step before the chunk) so
    repeated chunks hit the same compiled executable."""
    step, _ = make_train_step(model, mcfg, tcfg, optimizer, jit=False)
    use_swa = tcfg.use_swa
    add_partly = tcfg.add_partly

    def chunk(params, opt_state, swa_params, swa_n, rng, step0):
        def body(carry, i):
            params, opt_state, swa_params, swa_n, rng = carry
            rng, r1, r2 = jax.random.split(rng, 3)
            raw, labels, partly = dsampler.sample_batch(r1)
            args = (params, opt_state, raw.astype(jnp.float32), labels, r2)
            if add_partly:
                args = args + (partly,)
            params, opt_state, mets = step(*args)
            if use_swa:
                gstep = step0 + i + 1
                since = gstep - tcfg.swa_start
                do = (since >= 0) & (since % max(tcfg.swa_freq, 1) == 0)
                swa_n = swa_n + jnp.where(do, 1, 0)
                swa_params = jax.tree.map(
                    lambda a, p: jnp.where(
                        do, a + (p - a) / jnp.maximum(swa_n, 1), a),
                    swa_params, params)
            return (params, opt_state, swa_params, swa_n, rng), mets

        carry = (params, opt_state, swa_params, swa_n, rng)
        carry, mets = jax.lax.scan(body, carry, jnp.arange(K))
        return carry, mets

    return jax.jit(chunk, donate_argnums=(0, 1, 2))


def _chunk_size(tcfg: TrainConfig) -> int:
    """Largest K that hits every host-side interval boundary exactly."""
    import math

    K = math.gcd(max(tcfg.log_every, 1), max(tcfg.checkpoints, 1))
    if tcfg.snapshots:
        K = math.gcd(K, tcfg.snapshots)
    if tcfg.val_log_step:
        K = math.gcd(K, tcfg.val_log_step)
    return max(K, 1)


def make_data_mesh(num_devices: int | None = None, backend: str | None = None):
    """1-D data-parallel mesh over the available devices (axis "dp")."""
    from jax.sharding import Mesh

    devices = (jax.local_devices(backend=backend) if backend
               else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("dp",))


def train_until(model: PPPModel, mcfg: PPPConfig, tcfg: TrainConfig,
                prefetcher, val_batch_fn=None, init_raw=None,
                rng_seed: int = 42, mesh=None) -> dict:
    """Run training to ``max_iterations``, resuming from the latest
    checkpoint.  Returns the final state dict (params / opt_state / step,
    plus swa_params when enabled).

    ``mesh``: optional jax.sharding.Mesh for data-parallel training — the
    batch is sharded over the mesh's first axis, params/opt replicated, and
    the jitted step all-reduces grads over ICI (make_train_step).

    ``prefetcher`` may be a host Prefetcher OR a DeviceSampler — the
    latter routes to the fused device-resident loop (zero per-step
    host<->device traffic, K steps per dispatch)."""
    from .device_data import DeviceSampler

    if isinstance(prefetcher, DeviceSampler):
        if mesh is not None:
            raise ValueError(
                "device_sampler does not support a data-parallel mesh yet "
                "(the fused loop is single-device); set "
                "training.num_devices=1 or use the host prefetcher")
        return _train_until_device(model, mcfg, tcfg, prefetcher,
                                   val_batch_fn=val_batch_fn,
                                   rng_seed=rng_seed)
    os.makedirs(tcfg.output_folder, exist_ok=True)
    rng = jax.random.PRNGKey(rng_seed)
    optimizer = make_optimizer(tcfg)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl_sh = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        put_data = lambda x: jax.device_put(jnp.asarray(x), data_sh)
    else:
        repl_sh = None
        put_data = jnp.asarray

    def split_batch(b):
        """(raw, labels[, partly]) -> (raw, labels, partly-or-None)."""
        if len(b) == 3:
            return b[0], b[1], b[2]
        return b[0], b[1], None

    if init_raw is None:
        first_batch = split_batch(prefetcher.next())
        raw0 = first_batch[0]
    else:
        raw0 = init_raw
        first_batch = None

    rng, init_rng = jax.random.split(rng)
    params = model.init(init_rng, jnp.asarray(raw0),
                        method=PPPModel.full_init)
    opt_state = optimizer.init(params)
    if repl_sh is not None:
        params = jax.device_put(params, repl_sh)
        opt_state = jax.device_put(opt_state, repl_sh)
    state = {"params": params, "opt_state": opt_state, "step": 0}
    if tcfg.use_swa:
        state["swa_params"] = jax.tree.map(jnp.copy, params)
        state["swa_n"] = 0

    latest, latest_step = get_latest_checkpoint(tcfg.output_folder)
    if latest is not None:
        logger.info("resuming from %s", latest)
        state = resume_state(latest, state, optimizer)
        state["step"] = latest_step
        if repl_sh is not None:
            state["params"] = jax.device_put(state["params"], repl_sh)
            state["opt_state"] = jax.device_put(state["opt_state"], repl_sh)

    step_fn, eval_fn = make_train_step(model, mcfg, tcfg, optimizer,
                                       mesh=mesh)
    params, opt_state = state["params"], state["opt_state"]
    step = int(state["step"])

    log_path = os.path.join(tcfg.output_folder, "train_log.jsonl")
    log_f = open(log_path, "a")
    tb_writer = None
    if tcfg.tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(
                os.path.join(tcfg.output_folder, "tb"))
        except Exception:  # tensorboard optional
            tb_writer = None
    snap_fwd = None
    t0 = time.time()
    while step < tcfg.max_iterations:
        if first_batch is not None:
            raw, labels, partly = first_batch
            first_batch = None
        else:
            raw, labels, partly = split_batch(prefetcher.next())
        rng, step_rng = jax.random.split(rng)
        args = (params, opt_state, put_data(raw), put_data(labels),
                step_rng)
        if tcfg.add_partly:
            if partly is None:
                partly = np.zeros(len(np.asarray(raw)), dtype=bool)
            args = args + (put_data(partly),)
        params, opt_state, mets = step_fn(*args)
        step += 1

        if step % tcfg.log_every == 0 or step == 1:
            mets = {k: float(v) for k, v in mets.items()}
            mets.update(step=step, wall=time.time() - t0)
            log_f.write(json.dumps(mets) + "\n")
            log_f.flush()
            if tb_writer is not None:
                for k, v in mets.items():
                    if k not in ("step", "wall"):
                        tb_writer.add_scalar(f"train/{k}", v, step)
            logger.info("step %d loss %.5f (patch %.5f fg %.5f)",
                        step, mets["loss"], mets["loss_patch"],
                        mets["loss_fg"])

        if tcfg.val_log_step and step % tcfg.val_log_step == 0 \
                and val_batch_fn is not None:
            vraw, vlabels, vpartly = split_batch(val_batch_fn())
            rng, vrng = jax.random.split(rng)
            vargs = (params, put_data(vraw), put_data(vlabels), vrng)
            if tcfg.add_partly:
                if vpartly is None:
                    vpartly = np.zeros(len(np.asarray(vraw)), dtype=bool)
                vargs = vargs + (put_data(vpartly),)
            vmets = eval_fn(*vargs)
            vmets = {f"val_{k}": float(v) for k, v in vmets.items()}
            vmets["step"] = step
            log_f.write(json.dumps(vmets) + "\n")
            log_f.flush()
            if tb_writer is not None:
                for k, v in vmets.items():
                    if k != "step":
                        tb_writer.add_scalar(f"val/{k[4:]}", v, step)

        if tcfg.snapshots and step % tcfg.snapshots == 0:
            # periodic raw/gt/pred snapshot hdf (gp.Snapshot saves the
            # predictions too, train.py:539-547)
            import h5py

            if snap_fwd is None:
                snap_fwd = jax.jit(model.apply)
            h1, h2 = snap_fwd(params, put_data(raw))
            snap_dir = os.path.join(tcfg.output_folder, "snapshots")
            os.makedirs(snap_dir, exist_ok=True)
            with h5py.File(os.path.join(
                    snap_dir, f"snapshot_{step}.hdf"), "w") as f:
                f.create_dataset("volumes/raw", data=np.asarray(raw),
                                 compression="gzip")
                f.create_dataset("volumes/gt_labels",
                                 data=np.asarray(labels),
                                 compression="gzip")
                f.create_dataset("volumes/pred_head1",
                                 data=np.asarray(h1, dtype=np.float16),
                                 compression="gzip")
                f.create_dataset("volumes/pred_head2",
                                 data=np.asarray(h2, dtype=np.float16),
                                 compression="gzip")

        if tcfg.use_swa and step >= tcfg.swa_start \
                and (step - tcfg.swa_start) % tcfg.swa_freq == 0:
            n = state.get("swa_n", 0)
            state["swa_params"] = jax.tree.map(
                lambda a, p: a + (p - a) / (n + 1),
                state["swa_params"], params)
            state["swa_n"] = n + 1

        if step % tcfg.checkpoints == 0 or step == tcfg.max_iterations:
            state.update(params=params, opt_state=opt_state, step=step)
            path = checkpoint_path(tcfg.output_folder, step)
            save_checkpoint(path, state)
            logger.info("saved checkpoint %s", path)

    log_f.close()
    if tb_writer is not None:
        tb_writer.close()
    state.update(params=params, opt_state=opt_state, step=step)
    return state


def _train_until_device(model: PPPModel, mcfg: PPPConfig, tcfg: TrainConfig,
                        dsampler, val_batch_fn=None,
                        rng_seed: int = 42) -> dict:
    """Fused device-resident training loop (DeviceSampler path).

    The volumes live in HBM; each dispatch runs K = gcd(intervals) steps
    via lax.scan with on-device sampling/augmentation (make_fused_chunk).
    Host work per chunk: one small metrics readback.  This is the
    TPU-native shape of the reference's 400k-iteration runs
    (train.py:552-572) — the host never touches a batch."""
    os.makedirs(tcfg.output_folder, exist_ok=True)
    rng = jax.random.PRNGKey(rng_seed)
    optimizer = make_optimizer(tcfg)

    rng, init_rng, data_rng = jax.random.split(rng, 3)
    sample_jit = jax.jit(dsampler.sample_batch)  # one wrapper: snapshots
                                                 # must not retrace it
    raw0, _, _ = sample_jit(data_rng)
    params = model.init(init_rng, raw0, method=PPPModel.full_init)
    opt_state = optimizer.init(params)
    state = {"params": params, "opt_state": opt_state, "step": 0}
    if tcfg.use_swa:
        state["swa_params"] = jax.tree.map(jnp.copy, params)
        state["swa_n"] = 0

    latest, latest_step = get_latest_checkpoint(tcfg.output_folder)
    if latest is not None:
        logger.info("resuming from %s", latest)
        state = resume_state(latest, state, optimizer)
        state["step"] = latest_step

    params, opt_state = state["params"], state["opt_state"]
    step = int(state["step"])
    if tcfg.use_swa:
        swa_params = state["swa_params"]
        swa_n = jnp.asarray(int(state.get("swa_n", 0)), jnp.int32)
    else:
        swa_params = jnp.zeros(())  # dummy carried through the scan
        swa_n = jnp.asarray(0, jnp.int32)

    K = _chunk_size(tcfg)
    chunk_fns = {K: make_fused_chunk(model, mcfg, tcfg, optimizer,
                                     dsampler, K)}
    _, eval_fn = make_train_step(model, mcfg, tcfg, optimizer)

    log_path = os.path.join(tcfg.output_folder, "train_log.jsonl")
    log_f = open(log_path, "a")
    tb_writer = None
    if tcfg.tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(os.path.join(tcfg.output_folder, "tb"))
        except Exception:
            tb_writer = None

    def log_mets(mets_row: dict, at_step: int, wall: float):
        mets_row = {k: float(v) for k, v in mets_row.items()}
        mets_row.update(step=at_step, wall=wall)
        log_f.write(json.dumps(mets_row) + "\n")
        log_f.flush()
        if tb_writer is not None:
            for k, v in mets_row.items():
                if k not in ("step", "wall"):
                    tb_writer.add_scalar(f"train/{k}", v, at_step)
        logger.info("step %d loss %.5f (patch %.5f fg %.5f)", at_step,
                    mets_row["loss"], mets_row["loss_patch"],
                    mets_row["loss_fg"])

    snap_fwd = None
    t0 = time.time()
    first = step == 0
    while step < tcfg.max_iterations:
        k = min(K, tcfg.max_iterations - step)
        if k not in chunk_fns:  # tail chunk gets its own executable
            chunk_fns[k] = make_fused_chunk(model, mcfg, tcfg, optimizer,
                                            dsampler, k)
        rng, chunk_rng = jax.random.split(rng)
        (params, opt_state, swa_params, swa_n, _), mets = \
            chunk_fns[k](params, opt_state, swa_params, swa_n, chunk_rng,
                         jnp.asarray(step, jnp.int32))
        step += k
        mets = {mk: np.asarray(v) for mk, v in mets.items()}
        if first:
            log_mets({mk: v[0] for mk, v in mets.items()}, step - k + 1,
                     time.time() - t0)
            first = False
        if step % tcfg.log_every == 0:
            log_mets({mk: v[-1] for mk, v in mets.items()}, step,
                     time.time() - t0)

        if tcfg.val_log_step and step % tcfg.val_log_step == 0 \
                and val_batch_fn is not None:
            b = val_batch_fn()
            vraw, vlabels = jnp.asarray(b[0]), jnp.asarray(b[1])
            rng, vrng = jax.random.split(rng)
            vargs = (params, vraw, vlabels, vrng)
            if tcfg.add_partly:
                vpartly = (jnp.asarray(b[2]) if len(b) > 2 else
                           jnp.zeros(vraw.shape[0], bool))
                vargs = vargs + (vpartly,)
            vmets = eval_fn(*vargs)
            vmets = {f"val_{mk}": float(v) for mk, v in vmets.items()}
            vmets["step"] = step
            log_f.write(json.dumps(vmets) + "\n")
            log_f.flush()
            if tb_writer is not None:
                for mk, v in vmets.items():
                    if mk != "step":
                        tb_writer.add_scalar(f"val/{mk[4:]}", v, step)

        if tcfg.snapshots and step % tcfg.snapshots == 0:
            import h5py

            rng, srng = jax.random.split(rng)
            raw, labels, _ = sample_jit(srng)
            if snap_fwd is None:
                snap_fwd = jax.jit(model.apply)
            h1, h2 = snap_fwd(params, raw)
            snap_dir = os.path.join(tcfg.output_folder, "snapshots")
            os.makedirs(snap_dir, exist_ok=True)
            with h5py.File(os.path.join(
                    snap_dir, f"snapshot_{step}.hdf"), "w") as f:
                f.create_dataset("volumes/raw", data=np.asarray(raw),
                                 compression="gzip")
                f.create_dataset("volumes/gt_labels",
                                 data=np.asarray(labels),
                                 compression="gzip")
                f.create_dataset("volumes/pred_head1",
                                 data=np.asarray(h1, dtype=np.float16),
                                 compression="gzip")
                f.create_dataset("volumes/pred_head2",
                                 data=np.asarray(h2, dtype=np.float16),
                                 compression="gzip")

        if step % tcfg.checkpoints == 0 or step == tcfg.max_iterations:
            state.update(params=params, opt_state=opt_state, step=step)
            if tcfg.use_swa:
                state["swa_params"] = swa_params
                state["swa_n"] = int(swa_n)
            path = checkpoint_path(tcfg.output_folder, step)
            save_checkpoint(path, state)
            logger.info("saved checkpoint %s", path)

    log_f.close()
    if tb_writer is not None:
        tb_writer.close()
    state.update(params=params, opt_state=opt_state, step=step)
    if tcfg.use_swa:
        state["swa_params"] = swa_params
        state["swa_n"] = int(swa_n)
    return state
