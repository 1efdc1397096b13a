"""Patch decoder for the ppp+dec variant.

Reference: Autoencoder in experiments/.../torch_model.py:452-544 — the
encoder convs exist but are bypassed; only the decode path runs: a flat code
vector is reshaped to a small spatial grid of ``code_fmaps`` channels,
expanded by a 1x1 conv, then upsampled with resize-convs and cropped to the
patch shape.  Channels-last layout; decoding batches of codes is a single
vmapped forward (one MXU-friendly batched conv stack).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .unet import ConvPass, Upsample, center_crop_spatial


class PatchDecoder(nn.Module):
    patchshape: Sequence[int]            # squeezed, e.g. (7, 7, 7) or (25, 25)
    code_units: int = 176
    code_fmaps: int = 22
    num_fmaps: Sequence[int] = (64, 128)
    downsample_factors: Sequence[Sequence[int]] = ((2, 2, 2), (2, 2, 2))
    kernel_size: int = 3
    num_repetitions: int = 2
    upsampling: str = "resize_conv"
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @property
    def spatial_dims(self) -> int:
        return len(self.patchshape)

    @property
    def code_spatial(self) -> int:
        s = round((self.code_units / self.code_fmaps)
                  ** (1.0 / self.spatial_dims))
        assert s ** self.spatial_dims * self.code_fmaps == self.code_units, \
            "code_units must factor as code_fmaps * s^ndim"
        return int(s)

    @nn.compact
    def __call__(self, code):
        """code: (N, code_units) -> patch logits (N, *patchshape)."""
        ndim = self.spatial_dims
        x = code.reshape((-1,) + (self.code_spatial,) * ndim
                         + (self.code_fmaps,))
        nf_bottom = self.num_fmaps[-1]
        x = ConvPass(nf_bottom, (1,) * ndim, 1, "SAME",
                     self.activation, self.dtype)(x)  # from_code

        ks = (self.kernel_size,) * ndim
        up_features = list(reversed(self.num_fmaps))[1:] + [1]
        for i, nf in enumerate(up_features):
            x = Upsample(self.downsample_factors[-(i + 1)], nf,
                         self.upsampling, self.activation, self.dtype)(x)
            x = ConvPass(nf, ks, self.num_repetitions, "SAME",
                         self.activation if nf != 1 else None,
                         self.dtype)(x)

        x = center_crop_spatial(x, tuple(self.patchshape))
        return x[..., 0]
