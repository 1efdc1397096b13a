"""Masked losses + training metrics.

Reference: experiments/.../torch_loss.py — masked BCE-with-logits on patch
affinities, masked CE (or BCE) on numinst/fgbg, with partly-labeled-data
loss masks, plus jaccard / accuracy / mse summaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def masked_bce_logits(logits, targets, mask=None, num_channels=1.0):
    """MaskedBCEWithLogitsLoss (torch_loss.py:47-67).

    mask: (B, Cm, *sp) or None; channel 1 is used when Cm > 1 (the fg
    channel of the 3-class mask), channel 0 otherwise.
    """
    loss = optax.sigmoid_binary_cross_entropy(logits, targets)
    if mask is None:
        return jnp.where(loss.size == 0, jnp.sum(loss), jnp.mean(loss))
    ch = 0 if mask.shape[1] == 1 else 1
    m = mask[:, ch]
    cnt = jnp.sum(m) * num_channels
    return jnp.where(cnt == 0, 0.0,
                     jnp.sum(loss * m[:, None]) / jnp.maximum(cnt, 1e-30))


def masked_ce(logits, targets_int, mask=None,
              use_gt_extra=False):
    """MaskedCrossEntropyLoss (torch_loss.py:12-44).

    logits: (B, K, *sp); targets_int: (B, *sp) int.
    """
    logp = jax.nn.log_softmax(logits, axis=1)
    onehot = jax.nn.one_hot(targets_int, logits.shape[1],
                            axis=1, dtype=logits.dtype)
    loss = -(logp * onehot)
    if mask is None:
        per_pix = jnp.sum(loss, axis=1)
        return jnp.where(per_pix.size == 0, jnp.sum(per_pix),
                         jnp.mean(per_pix))
    if use_gt_extra:
        cnt = jnp.sum(mask)
        return jnp.where(cnt == 0, 0.0,
                         jnp.sum(loss * mask) / jnp.maximum(cnt, 1e-30))
    per_pix = jnp.sum(loss, axis=1)
    m = mask[:, 0] if mask.ndim == per_pix.ndim + 1 else mask
    cnt = jnp.sum(m)
    return jnp.where(cnt == 0, 0.0,
                     jnp.sum(per_pix * m) / jnp.maximum(cnt, 1e-30))


def sampled_bce(logits, targets, valid=None):
    """BCE over sampled patches (ppp+dec path): (N, *ps) with per-sample
    validity mask (rows from batch items without fg are excluded)."""
    loss = optax.sigmoid_binary_cross_entropy(logits, targets)
    if valid is None:
        return jnp.mean(loss)
    v = valid.astype(loss.dtype).reshape((-1,) + (1,) * (loss.ndim - 1))
    cnt = jnp.sum(v) * float(loss[0].size)
    return jnp.where(cnt == 0, 0.0,
                     jnp.sum(loss * v) / jnp.maximum(cnt, 1e-30))


def binary_jaccard(pred, target, thresh=0.5):
    p = pred > thresh
    t = target > thresh
    inter = jnp.sum(p & t)
    union = jnp.sum(p | t)
    return jnp.where(union == 0, 0.0, inter / jnp.maximum(union, 1))


def binary_accuracy(pred, target, thresh=0.5, ignore_bg=False):
    p = pred > thresh
    t = target > thresh
    if ignore_bg:
        m = t
        cnt = jnp.sum(m)
        return jnp.where(cnt == 0, 0.0,
                         jnp.sum((p == t) & m) / jnp.maximum(cnt, 1))
    return jnp.mean((p == t).astype(jnp.float32))


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def summaries(pred_affs_prob, gt_affs, pred_fg_prob, gt_fg):
    """The torch_loss.py:99-117 metric dict."""
    return {
        "jaccard_patch": binary_jaccard(pred_affs_prob, gt_affs),
        "accuracy_patch": binary_accuracy(pred_affs_prob, gt_affs),
        "accuracy2_patch": binary_accuracy(pred_affs_prob, gt_affs,
                                           ignore_bg=True),
        "mse_patch": mse(pred_affs_prob, gt_affs),
        "jaccard_fg": binary_jaccard(pred_fg_prob, gt_fg),
        "accuracy_fg": binary_accuracy(pred_fg_prob, gt_fg),
        "accuracy2_fg": binary_accuracy(pred_fg_prob, gt_fg, ignore_bg=True),
        "mse_fg": mse(pred_fg_prob, gt_fg),
    }
