"""Torch-CPU baseline for the predict -> decode stages.

The reference implementation is torch (funlib UNet, torch_model.py:34-223 +
Autoencoder :452-544); its CPU throughput is the BASELINE.json north-star
denominator.  funlib/gunpowder are not installed here, so this module
provides an architecture-equivalent torch model written from scratch
(same level count / feature maps / valid-conv structure / head widths /
decoder shape, per SURVEY.md §2.2) used ONLY to measure baseline CPU
throughput of the sliding-window predict and batched code decode.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn


def _conv_block(cin, cout, reps=2, dim=3, padding=0):
    conv = nn.Conv3d if dim == 3 else nn.Conv2d
    layers = []
    for i in range(reps):
        layers += [conv(cin if i == 0 else cout, cout, 3, padding=padding),
                   nn.ReLU(inplace=True)]
    return nn.Sequential(*layers)


class BaselineUNet3D(nn.Module):
    """3-level valid-conv UNet, fmaps 20 * 3^level, two 1x1 heads
    (code_units + numinst classes) - the FlyLight setup01 shape."""

    def __init__(self, in_ch=3, num_fmaps=20, inc=3, levels=3,
                 code_units=176, numinst_classes=3, padding=0):
        super().__init__()
        f = [num_fmaps * inc ** l for l in range(levels + 1)]
        self.downs = nn.ModuleList(
            [_conv_block(in_ch if l == 0 else f[l - 1], f[l],
                         padding=padding)
             for l in range(levels)])
        self.pool = nn.MaxPool3d(2)
        self.bottom = _conv_block(f[levels - 1], f[levels], padding=padding)
        self.ups = nn.ModuleList(
            [nn.ConvTranspose3d(f[l + 1], f[l], 2, stride=2)
             for l in reversed(range(levels))])
        self.upconvs = nn.ModuleList(
            [_conv_block(2 * f[l], f[l], padding=padding)
             for l in reversed(range(levels))])
        self.head_code = nn.Conv3d(f[0], code_units, 1)
        self.head_numinst = nn.Conv3d(f[0], numinst_classes, 1)

    @staticmethod
    def _crop_to(t, ref):
        ds = [(a - b) // 2 for a, b in zip(t.shape[2:], ref.shape[2:])]
        sl = (slice(None), slice(None)) + tuple(
            slice(d, d + s) for d, s in zip(ds, ref.shape[2:]))
        return t[sl]

    def forward(self, x):
        skips = []
        for down in self.downs:
            x = down(x)
            skips.append(x)
            x = self.pool(x)
        x = self.bottom(x)
        for up, conv, skip in zip(self.ups, self.upconvs,
                                  reversed(skips)):
            x = up(x)
            x = torch.cat([self._crop_to(skip, x), x], dim=1)
            x = conv(x)
        return self.head_code(x), self.head_numinst(x)


class BaselineDecoder(nn.Module):
    """code (176 = 22 x 2^3) -> 7^3 patch logits (Autoencoder decode path:
    spatial code view, 1x1 from_code, upsample/conv [64, 128], crop)."""

    def __init__(self, code_fmaps=22, fmaps=(64, 128), patch=7):
        super().__init__()
        self.code_fmaps = code_fmaps
        self.patch = patch
        self.from_code = nn.Conv3d(code_fmaps, fmaps[0], 1)
        self.up1 = nn.Upsample(scale_factor=2, mode="nearest")
        self.conv1 = _conv_block(fmaps[0], fmaps[1], dim=3, padding=1)
        self.up2 = nn.Upsample(scale_factor=2, mode="nearest")
        self.conv2 = _conv_block(fmaps[1], fmaps[1], dim=3, padding=1)
        self.out = nn.Conv3d(fmaps[1], 1, 1)

    def forward(self, code):
        x = code.view(code.shape[0], self.code_fmaps, 2, 2, 2)
        x = self.from_code(x)
        x = self.conv1(self.up1(x))
        x = self.conv2(self.up2(x))
        x = self.out(x)
        p = self.patch
        return x[:, 0, :p, :p, :p]


@torch.no_grad()
def predict_baseline_cpu(raw: np.ndarray, input_shape, output_shape,
                         batch_size: int = 1, levels: int = 3,
                         padding: int = 0) -> float:
    """Wall time of the torch-CPU sliding-window predict over ``raw``
    (same window grid as the TPU path).  Returns seconds.

    ``levels``/``padding`` select the geometry: the 3-level valid flagship
    (default) or the 2-level same-padding crop model (padding=1)."""
    import time

    from patchperpix_tpu.infer.predict import enumerate_shifts

    model = BaselineUNet3D(in_ch=raw.shape[0], levels=levels,
                           padding=padding).eval()
    spatial = np.array(raw.shape[1:])
    input_shape = np.array(input_shape)
    output_shape = np.array(output_shape)
    context = (input_shape - output_shape) // 2
    shape_padded = np.array(
        [(int(s) // int(o) + 1) * int(o) + 2 * int(c)
         for s, o, c in zip(spatial, output_shape, context)])
    raw_padded = np.pad(
        raw, [(0, 0)] + [(int(c), int(sp - s - c))
                         for c, s, sp in zip(context, spatial,
                                             shape_padded)])
    shifts = enumerate_shifts(shape_padded, input_shape, output_shape)
    t0 = time.perf_counter()
    for sh in shifts:
        sl = (slice(None),) + tuple(
            slice(int(s), int(s + n)) for s, n in zip(sh, input_shape))
        tile = torch.from_numpy(raw_padded[sl][None].astype(np.float32))
        code, ni = model(tile)
        _ = torch.sigmoid(code).numpy()
        _ = torch.softmax(ni, 1).numpy()
    return time.perf_counter() - t0


@torch.no_grad()
def decode_baseline_cpu(n_fg: int, code_units: int = 176,
                        batch_size: int = 1024) -> float:
    """Wall time of the torch-CPU batched decode of ``n_fg`` codes
    (decode.py:45-58 workload).  Returns seconds."""
    import time

    model = BaselineDecoder().eval()
    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    for i in range(0, n_fg, batch_size):
        n = min(batch_size, n_fg - i)
        codes = torch.from_numpy(
            rng.rand(n, code_units).astype(np.float32))
        _ = torch.sigmoid(model(codes)).numpy()
    return time.perf_counter() - t0
