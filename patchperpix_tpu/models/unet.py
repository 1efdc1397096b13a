"""Flax U-Net backbone (2D/3D), valid- or same-padding.

TPU-native re-design of the funlib.learn.torch UNet the reference wraps
(experiments/.../torch_model.py:89-100): channels-last layout (NDHWC) so XLA
tiles convs onto the MXU, static padding mode, transposed-conv or
resize-conv upsampling, per-level feature factors (fmap_inc_factors /
fmap_dec_factors), center-cropped skip connections for valid padding.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def center_crop_spatial(x: jnp.ndarray, target_spatial) -> jnp.ndarray:
    """Center-crop (B, *spatial, C) to target spatial dims."""
    spatial = x.shape[1:-1]
    offs = [(s - t) // 2 for s, t in zip(spatial, target_spatial)]
    sl = (slice(None),) + tuple(
        slice(o, o + t) for o, t in zip(offs, target_spatial)) + (slice(None),)
    return x[sl]


class ConvPass(nn.Module):
    """num_repetitions convs + activation (funlib ConvPass equivalent)."""
    features: int
    kernel_size: Sequence[int]
    num_repetitions: int = 2
    padding: str = "VALID"
    activation: str | None = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_repetitions):
            x = nn.Conv(self.features, kernel_size=tuple(self.kernel_size),
                        padding=self.padding, dtype=self.dtype,
                        kernel_init=nn.initializers.kaiming_normal())(x)
            if self.activation:
                x = getattr(nn, self.activation)(x)
        return x


class Downsample(nn.Module):
    factors: Sequence[int]

    @nn.compact
    def __call__(self, x):
        return nn.max_pool(x, window_shape=tuple(self.factors),
                           strides=tuple(self.factors))


class Upsample(nn.Module):
    """Transposed-conv or nearest-resize upsampling."""
    factors: Sequence[int]
    features: int
    mode: str = "trans_conv"
    activation: str | None = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.mode == "trans_conv":
            x = nn.ConvTranspose(
                self.features, kernel_size=tuple(self.factors),
                strides=tuple(self.factors), padding="VALID",
                dtype=self.dtype,
                kernel_init=nn.initializers.kaiming_normal())(x)
        else:  # resize_conv
            spatial = x.shape[1:-1]
            new_spatial = tuple(int(s * f)
                                for s, f in zip(spatial, self.factors))
            x = jnp.repeat(x, self.factors[0], axis=1)
            for ax, f in enumerate(self.factors[1:], start=2):
                x = jnp.repeat(x, f, axis=ax)
            assert x.shape[1:-1] == new_spatial
            x = nn.Conv(self.features,
                        kernel_size=(1,) * len(self.factors),
                        padding="SAME", dtype=self.dtype)(x)
        if self.activation:
            x = getattr(nn, self.activation)(x)
        return x


class UNet(nn.Module):
    """U-Net over (B, *spatial, C_in) -> (B, *spatial_out, C_out).

    ``out_channels``: feature count of the final up-level
    (= round(num_fmaps * fmap_dec_factors[0]) to mirror the reference's
    decode-factor scaling).
    """
    num_fmaps: int = 20
    fmap_inc_factors: Sequence[float] = (3, 3, 3)
    fmap_dec_factors: Sequence[float] = (1.2, 1.2, 1.2)
    downsample_factors: Sequence[Sequence[int]] = ((2, 2, 2),) * 3
    kernel_size: int = 3
    num_repetitions: int = 2
    padding: str = "valid"          # "valid" | "same"
    upsampling: str = "trans_conv"
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @property
    def levels(self) -> int:
        return len(self.downsample_factors)

    def level_fmaps(self, level: int) -> int:
        f = self.num_fmaps
        for i in range(level):
            f = int(round(f * self.fmap_inc_factors[i]))
        return f

    def up_fmaps(self, level: int) -> int:
        return int(round(self.level_fmaps(level)
                         * self.fmap_dec_factors[level]))

    @property
    def out_channels(self) -> int:
        return self.up_fmaps(0)

    @nn.compact
    def __call__(self, x):
        pad = "VALID" if self.padding == "valid" else "SAME"
        ndim = x.ndim - 2
        ks = (self.kernel_size,) * ndim

        skips = []
        for level in range(self.levels):
            x = ConvPass(self.level_fmaps(level), ks,
                         self.num_repetitions, pad, self.activation,
                         self.dtype)(x)
            skips.append(x)
            x = Downsample(self.downsample_factors[level])(x)

        x = ConvPass(self.level_fmaps(self.levels), ks,
                     self.num_repetitions, pad, self.activation,
                     self.dtype)(x)

        for level in reversed(range(self.levels)):
            x = Upsample(self.downsample_factors[level],
                         self.up_fmaps(level), self.upsampling,
                         self.activation, self.dtype)(x)
            skip = center_crop_spatial(skips[level], x.shape[1:-1])
            x = jnp.concatenate([skip, x], axis=-1)
            x = ConvPass(self.up_fmaps(level), ks,
                         self.num_repetitions, pad, self.activation,
                         self.dtype)(x)
        return x


def valid_output_shape(unet: UNet, input_shape) -> tuple:
    """Static in->out spatial shape computation (replaces the reference's
    zero-tensor probe, torch_model.py:264-296) via jax.eval_shape."""
    import jax

    x = jnp.zeros((1,) + tuple(input_shape) + (1,), unet.dtype)
    shapes = jax.eval_shape(
        lambda v: unet.init_with_output(jax.random.PRNGKey(0), v)[0], x)
    return tuple(shapes.shape[1:-1])
