"""Device-resident training data pipeline.

TPU-native replacement for the host Prefetcher on crop-scale datasets:
the sample volumes are uploaded to HBM ONCE, and every batch is cropped,
pool-sampled and augmented INSIDE the jitted train step.  Zero per-step
host<->device traffic — which on this platform both removes the training
H2D bottleneck and fixes the ~5 MB/step host-RAM leak of relayed per-step
transfers (PROFILE.md).  The trainer fuses K steps per dispatch with
``lax.scan`` so even the dispatch overhead amortizes.

Semantics mirror train/data.py CropSampler (itself the gunpowder graph of
experiments/.../train.py:575-862):
- three sampling pools mixed by probability: foreground-biased,
  overlap-biased (optionally point_balance_radius-weighted), uniform
  random (train.py:841-855)
- volumes are pre-padded by the crop half-extent so border centers get
  zero padding exactly like the host sampler's padded crops
- SimpleAugment mirror/transpose, channel permute, random hue, intensity
  scale/shift as branchless jnp.where / lax.switch transforms

Not supported on device (configs using them fall back to the host
sampler): elastic deformation, OverlayAugment, min_masked rejection.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .data import AugmentConfig, SampleData, SamplerConfig

logger = logging.getLogger(__name__)


def device_sampler_supported(cfg: SamplerConfig) -> str | None:
    """None when the device sampler can reproduce this config, else the
    reason string for the host fallback."""
    a = cfg.augment
    if a.elastic:
        return "elastic augmentation"
    if a.probability_overlay > 0:
        return "overlay augmentation"
    if cfg.min_masked > 0:
        return "min_masked rejection sampling"
    return None


@dataclass
class _Pools:
    coords: jnp.ndarray   # (S, Nmax, d) int32 crop centers (padded space)
    counts: jnp.ndarray   # (S,) int32
    cumw: jnp.ndarray | None  # (S, Nmax) cumulative weights or None


class DeviceSampler:
    """Batches sampled and augmented on device.

    ``sample_batch(rng)`` is a pure jittable function returning
    (raw (B, C, *input_shape), labels (B, G, *label_shape), partly (B,)).
    """

    def __init__(self, samples: list[SampleData], cfg: SamplerConfig,
                 max_gt_channels: int = 6):
        assert samples, "no training samples"
        reason = device_sampler_supported(cfg)
        if reason is not None:
            raise ValueError(f"device sampler unsupported: {reason}")
        self.cfg = cfg
        self.ndim = len(cfg.input_shape)
        ps = np.asarray(cfg.patchshape)
        self.label_shape = tuple(int(o + 2 * (p // 2))
                                 for o, p in zip(cfg.output_shape, ps))
        big = np.maximum(np.array(cfg.input_shape),
                         np.array(self.label_shape))
        self.big = big
        self.G = int(max_gt_channels)

        # pad every sample to the common spatial extent, then pre-pad by
        # the crop half-extent on each side: a crop "centered" at voxel v
        # of the original volume is then the slice starting at v in padded
        # space, with zeros wherever the window leaves the volume (same
    # out-of-range semantics as CropSampler._crop_at)
        spatial = np.max([s.fg_mask.shape for s in samples], axis=0)
        half = big // 2
        pad_sp = tuple(int(s + 2 * h) for s, h in zip(spatial, half))
        S = len(samples)
        C = samples[0].raw.shape[0]
        raw_all = np.zeros((S, C) + pad_sp, np.float32)
        lab_all = np.zeros((S, self.G) + pad_sp, np.int32)
        fg_list, ov_list, ovw_list = [], [], []
        partly = np.zeros(S, bool)
        for i, s in enumerate(samples):
            sl = tuple(slice(int(h), int(h + e))
                       for h, e in zip(half, s.fg_mask.shape))
            raw_all[(i, slice(None)) + sl] = s.raw
            g = min(self.G, s.labels.shape[0])
            lab_all[(i, slice(0, g)) + sl] = s.labels[:g]
            fg_list.append(np.argwhere(s.fg_mask))
            pts = (s.overlap_points if s.overlap_points is not None
                   else np.argwhere(s.overlap_mask))
            ov_list.append(pts)
            w = None
            if cfg.point_balance_radius > 0 and len(pts) > 1:
                from scipy.spatial import cKDTree

                tree = cKDTree(pts)
                counts = np.array(
                    [len(tree.query_ball_point(p, cfg.point_balance_radius))
                     for p in pts], np.float64)
                w = 1.0 / np.maximum(counts, 1)
                w = w / w.sum()
            ovw_list.append(w)
            partly[i] = s.partly

        self.raw_all = jax.device_put(raw_all)
        self.lab_all = jax.device_put(lab_all)
        self.partly = jax.device_put(partly)
        self.spatial = jax.device_put(
            np.array([s.fg_mask.shape for s in samples], np.int32))
        self.fg = self._pools(fg_list, None)
        self.ov = self._pools(ov_list, ovw_list)
        self.n_samples = S

    def _pools(self, coord_list, weight_list) -> _Pools:
        S = len(coord_list)
        nmax = max(1, max(len(c) for c in coord_list))
        coords = np.zeros((S, nmax, self.ndim), np.int32)
        counts = np.zeros(S, np.int32)
        have_w = weight_list is not None and any(
            w is not None for w in weight_list)
        cumw = np.ones((S, nmax), np.float32) if have_w else None
        for i, c in enumerate(coord_list):
            counts[i] = len(c)
            if len(c):
                coords[i, :len(c)] = c
                if have_w:
                    w = (weight_list[i] if weight_list[i] is not None
                         else np.full(len(c), 1.0 / len(c)))
                    cumw[i, :len(c)] = np.cumsum(w)
        return _Pools(jax.device_put(coords), jax.device_put(counts),
                      jax.device_put(cumw) if have_w else None)

    # ---- device-side sampling ------------------------------------------

    def _choose_center(self, rng, si):
        """Pool-mixed center (original-volume coords; train.py:841-855)."""
        r_pool, r_fg, r_ov, r_rand, r_w = jax.random.split(rng, 5)
        u = jax.random.uniform(r_pool)
        p_fg, p_ov = self.cfg.probability_fg, self.cfg.probability_overlap

        fg_n = self.fg.counts[si]
        ov_n = self.ov.counts[si]
        fg_idx = jax.random.randint(r_fg, (), 0, jnp.maximum(fg_n, 1))
        if self.ov.cumw is not None:
            uu = jax.random.uniform(r_w)
            ov_idx = jnp.searchsorted(self.ov.cumw[si], uu)
            ov_idx = jnp.minimum(ov_idx, jnp.maximum(ov_n, 1) - 1)
        else:
            ov_idx = jax.random.randint(r_ov, (), 0, jnp.maximum(ov_n, 1))
        c_fg = self.fg.coords[si, fg_idx]
        c_ov = self.ov.coords[si, ov_idx]
        c_rand = jax.random.randint(
            r_rand, (self.ndim,), 0, 1 << 30) % self.spatial[si]
        use_fg = (u < p_fg) & (fg_n > 0)
        use_ov = (~use_fg) & (u < p_fg + p_ov) & (ov_n > 0)
        center = jnp.where(use_fg, c_fg,
                           jnp.where(use_ov, c_ov, c_rand))
        return center.astype(jnp.int32)

    def _augment(self, rng, raw, labels):
        """Mirror / transpose / permute / hue / intensity, branchless.

        Every random draw gets its OWN key — reusing a key across a
        decision and a value couples them (e.g. transposed crops would
        always land in the lower half of the intensity-scale range)."""
        a = self.cfg.augment
        keys = jax.random.split(rng, self.ndim + 8)
        (k_tr, k_tr_pi, k_perm_do, k_perm, k_hue_do, k_hue_amt,
         k_scale, k_shift) = keys[self.ndim:]
        sp_axes_raw = list(range(1, 1 + self.ndim))

        if a.mirror:
            for d, ax in enumerate(sp_axes_raw):
                if raw.shape[ax] > 1:
                    flip = jax.random.bernoulli(keys[d])
                    raw = jnp.where(flip, jnp.flip(raw, axis=ax), raw)
                    labels = jnp.where(flip, jnp.flip(labels, axis=ax),
                                       labels)
        if a.transpose:
            # candidate spatial-axis swaps among equal-extent axes
            last = raw.shape[sp_axes_raw[-1]]
            tr = [ax for ax in sp_axes_raw if raw.shape[ax] == last]
            pairs = [(i, j) for ii, i in enumerate(tr)
                     for j in tr[ii + 1:]]
            if pairs and all(labels.shape[p[0]] == labels.shape[p[1]]
                             for p in pairs):
                def mk(i, j):
                    order = list(range(raw.ndim))
                    order[i], order[j] = order[j], order[i]
                    return order

                do_tr = jax.random.bernoulli(k_tr)
                pi = jax.random.randint(k_tr_pi, (), 0, len(pairs))
                branches_r = [
                    (lambda o: (lambda x: jnp.transpose(x, o)))(mk(i, j))
                    for i, j in pairs]
                raw_t = jax.lax.switch(pi, branches_r, raw)
                lab_t = jax.lax.switch(pi, branches_r, labels)
                raw = jnp.where(do_tr, raw_t, raw)
                labels = jnp.where(do_tr, lab_t, labels)

        if a.probability_permute > 0 and raw.shape[0] >= 2:
            do_p = jax.random.uniform(k_perm_do) < a.probability_permute
            perm = jax.random.permutation(k_perm, raw.shape[0])
            raw = jnp.where(do_p, raw[perm], raw)
        if a.probability_hue > 0 and raw.shape[0] >= 3:
            do_h = jax.random.uniform(k_hue_do) < a.probability_hue
            amount = jnp.abs(jax.random.uniform(
                k_hue_amt, minval=-a.hue_max_change,
                maxval=a.hue_max_change))
            rolled = jnp.roll(raw[:3], 1, axis=0)
            mixed = jnp.clip((1 - amount) * raw[:3] + amount * rolled, 0, 1)
            raw = jnp.where(do_h, raw.at[:3].set(mixed), raw)

        scale = jax.random.uniform(k_scale, (),
                                   minval=a.intensity_scale[0],
                                   maxval=a.intensity_scale[1])
        shift = jax.random.uniform(k_shift, (),
                                   minval=a.intensity_shift[0],
                                   maxval=a.intensity_shift[1])
        raw = jnp.clip(raw * scale + shift, 0, 1)
        return raw, labels

    def _one(self, rng):
        r_si, r_c, r_aug = jax.random.split(rng, 3)
        si = jax.random.randint(r_si, (), 0, self.n_samples)
        center = self._choose_center(r_c, si)

        # crop the union extent at `center` (pre-padded space: the window
        # starting AT center is centered on the original voxel), augment,
        # then center-crop raw/labels to their own shapes
        big = tuple(int(b) for b in self.big)
        raw = jax.lax.dynamic_slice(
            self.raw_all[si], (0,) + tuple(center),
            (self.raw_all.shape[1],) + big)
        labels = jax.lax.dynamic_slice(
            self.lab_all[si], (0,) + tuple(center),
            (self.lab_all.shape[1],) + big)
        raw, labels = self._augment(r_aug, raw, labels)

        def center_crop(x, shape):
            # host parity: CropSampler crops around center big//2, i.e.
            # start = big//2 - shape//2 (differs from (big-shape)//2 by
            # one voxel when parities mix)
            off = tuple(b // 2 - s // 2 for b, s in zip(big, shape))
            return jax.lax.dynamic_slice(
                x, (0,) + off, (x.shape[0],) + tuple(shape))

        raw = center_crop(raw, self.cfg.input_shape)
        labels = center_crop(labels, self.label_shape)
        return raw, labels, self.partly[si]

    def sample_batch(self, rng):
        """(raw, labels, partly) batch, all device, jit-safe."""
        keys = jax.random.split(rng, self.cfg.batch_size)
        raw, labels, partly = jax.vmap(self._one)(keys)
        return raw, labels.astype(jnp.int32), partly

    def stop(self):
        """Prefetcher-interface no-op (no background thread to stop)."""
