"""Swin-UNETR backbone: shifted-window transformer encoder + conv decoder.

TPU-native equivalent of the reference's alternative backbone
(``network_style = "swinunetr"``, torch_model.py:110-117, which swaps the
funlib U-Net for ``monai.networks.nets.SwinUNETR(feature_size=num_fmaps)``
and attaches the same two 1x1 heads on ``unet.out_channels`` features).

Design for the MXU rather than a port of monai's module graph:

- windowed multi-head attention is three einsums per block (qk^T, softmax
  matmul, out projection) over (num_windows*B, window_volume, C) operands —
  static shapes, large batched matmuls, bf16-friendly;
- the shifted-window attention mask and the relative-position-bias index
  table are precomputed with numpy at trace time (static for XLA) instead
  of computed on device;
- window partition/merge are reshape+transpose only (no gathers), and the
  cyclic shift is ``jnp.roll`` (lowered to two contiguous slices);
- spatial dims are padded per stage to window multiples and cropped after
  (static pad amounts; any input size works, like monai's internal pad).

Output: (B, *spatial, feature_size) at INPUT resolution ("same" padding
semantics — the transformer has no valid-conv margin), drop-in for
``models.unet.UNet`` under ``PPPModel`` via ``out_channels``.
Supports 2D and 3D (spatial rank follows the input).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _window_partition(x, ws):
    """(B, *S, C) -> (B*num_windows, prod(ws), C); S must divide by ws."""
    b, *s, c = x.shape
    nd = len(s)
    # (B, n0, w0, n1, w1, ..., C)
    shape = [b]
    for d in range(nd):
        shape += [s[d] // ws[d], ws[d]]
    x = x.reshape(shape + [c])
    # -> (B, n0, n1, ..., w0, w1, ..., C)
    perm = [0] + [1 + 2 * d for d in range(nd)] \
        + [2 + 2 * d for d in range(nd)] + [1 + 2 * nd]
    x = x.transpose(perm)
    return x.reshape(-1, int(np.prod(ws)), c)


def _window_merge(x, ws, s, b):
    """Inverse of :func:`_window_partition`."""
    nd = len(s)
    n = [s[d] // ws[d] for d in range(nd)]
    x = x.reshape([b] + n + list(ws) + [x.shape[-1]])
    perm = [0]
    for d in range(nd):
        perm += [1 + d, 1 + nd + d]
    perm += [1 + 2 * nd]
    x = x.transpose(perm)
    return x.reshape([b] + list(s) + [x.shape[-1]])


def _rel_pos_index(ws):
    """Static (W, W) index into the (prod(2*ws-1),) bias table."""
    coords = np.stack(np.meshgrid(
        *[np.arange(w) for w in ws], indexing="ij"))  # (nd, *ws)
    flat = coords.reshape(len(ws), -1)                # (nd, W)
    rel = flat[:, :, None] - flat[:, None, :]         # (nd, W, W)
    idx = np.zeros(rel.shape[1:], np.int32)
    for d, w in enumerate(ws):
        idx = idx * (2 * w - 1) + (rel[d] + w - 1)
    return idx


def _shift_mask(s, ws, shift):
    """Static additive attention mask (num_windows, W, W) for shifted
    windows: tokens wrapped across a volume boundary by the cyclic shift
    must not attend to the tokens they now neighbor (Swin's img_mask)."""
    img = np.zeros(s, np.int32)
    cnt = 0
    slices_per_dim = []
    for d in range(len(s)):
        slices_per_dim.append([slice(0, s[d] - ws[d]),
                               slice(s[d] - ws[d], s[d] - shift[d]),
                               slice(s[d] - shift[d], s[d])]
                              if shift[d] > 0 else [slice(0, s[d])])
    import itertools
    for combo in itertools.product(*slices_per_dim):
        img[combo] = cnt
        cnt += 1
    win = _window_partition(img[None, ..., None].astype(np.float32),
                            ws)[..., 0]               # (nw, W)
    diff = win[:, :, None] - win[:, None, :]
    return np.where(diff == 0, 0.0, -1e9).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        """x: (nW*B, W, C); mask: (nW, W, W) additive or None."""
        w = x.shape[1]
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, use_bias=True,
                       kernel_init=nn.initializers.xavier_uniform())(x)
        qkv = qkv.reshape(-1, w, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bwhd,bvhd->bhwv", q, k) / np.sqrt(head_dim)
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            (int(np.prod([2 * v - 1 for v in self.window])),
             self.num_heads))
        idx = _rel_pos_index(self.window)             # static (W, W)
        attn = attn + table[idx].transpose(2, 0, 1)[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, self.num_heads, w, w) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, self.num_heads, w, w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhwv,bvhd->bwhd", attn, v).reshape(-1, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform())(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: tuple
    shifted: bool
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, *s, c = x.shape
        nd = len(s)
        ws = tuple(min(self.window[d], s[d]) for d in range(nd))
        # pad spatial dims to window multiples (static amounts)
        pad = [(0, (-s[d]) % ws[d]) for d in range(nd)]
        sp = tuple(s[d] + pad[d][1] for d in range(nd))
        shift = tuple((ws[d] // 2 if (self.shifted and sp[d] > ws[d])
                       else 0) for d in range(nd))

        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = jnp.pad(h, [(0, 0)] + pad + [(0, 0)])
        if any(shift):
            h = jnp.roll(h, [-v for v in shift], axis=range(1, 1 + nd))
            mask = jnp.asarray(_shift_mask(sp, ws, shift))
        else:
            mask = None
        h = _window_partition(h, ws)
        h = WindowAttention(self.dim, self.num_heads, ws,
                            self.dtype)(h, mask)
        h = _window_merge(h, ws, sp, b)
        if any(shift):
            h = jnp.roll(h, shift, axis=range(1, 1 + nd))
        h = h[(slice(None),) + tuple(slice(0, s[d]) for d in range(nd))]
        x = x + h

        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class PatchMerging(nn.Module):
    """2x spatial downsample: concat 2^nd neighbors -> LayerNorm -> Dense."""
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, *s, c = x.shape
        nd = len(s)
        pad = [(0, s[d] % 2) for d in range(nd)]
        x = jnp.pad(x, [(0, 0)] + pad + [(0, 0)])
        x = _window_partition(x, (2,) * nd)           # (B*n, 2^nd, C)
        x = x.reshape(b, -1, x.shape[1] * c)
        sp = tuple((s[d] + pad[d][1]) // 2 for d in range(nd))
        x = x.reshape((b,) + sp + (x.shape[-1],))
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, use_bias=False)(x)


class _ConvBlock(nn.Module):
    fmaps: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        for _ in range(2):
            x = nn.Conv(self.fmaps, (3,) * nd, padding="SAME",
                        dtype=self.dtype,
                        kernel_init=nn.initializers.kaiming_normal())(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class SwinUNETR(nn.Module):
    """Swin transformer encoder + UNETR-style conv decoder.

    feature_size mirrors the reference's ``feature_size=num_fmaps``
    (torch_model.py:111-117); depths/num_heads follow the Swin defaults.
    Output resolution == input resolution ("same" semantics).
    """
    feature_size: int = 24
    depths: Sequence[int] = (2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12)
    window_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.feature_size

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        ws = (self.window_size,) * nd
        f = self.feature_size

        # stem skip at full resolution (monai's encoder1 on the raw input)
        skip0 = _ConvBlock(f, self.dtype)(x)

        # patch embed: /2
        s_in = x.shape[1:-1]
        pad = [(0, d % 2) for d in s_in]
        h = jnp.pad(x, [(0, 0)] + pad + [(0, 0)])
        h = nn.Conv(f, (2,) * nd, strides=(2,) * nd, padding="VALID",
                    dtype=self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)

        skips = []
        dims = [f * (2 ** i) for i in range(len(self.depths))]
        for i, depth in enumerate(self.depths):
            for blk in range(depth):
                h = SwinBlock(dims[i], self.num_heads[i], ws,
                              shifted=bool(blk % 2), dtype=self.dtype)(h)
            skips.append(h)
            if i < len(self.depths) - 1:
                h = PatchMerging(dims[i + 1], self.dtype)(h)

        # decoder: transposed-conv x2 per level + skip concat + conv block
        for i in reversed(range(len(self.depths) - 1)):
            h = nn.ConvTranspose(dims[i], (2,) * nd, strides=(2,) * nd,
                                 padding="VALID", dtype=self.dtype)(h)
            skip = skips[i]
            h = h[(slice(None),)
                  + tuple(slice(0, v) for v in skip.shape[1:-1])]
            h = _ConvBlock(dims[i], self.dtype)(
                jnp.concatenate([skip, h], axis=-1))

        # back to full resolution
        h = nn.ConvTranspose(f, (2,) * nd, strides=(2,) * nd,
                             padding="VALID", dtype=self.dtype)(h)
        h = h[(slice(None),) + tuple(slice(0, v) for v in s_in)]
        return _ConvBlock(f, self.dtype)(
            jnp.concatenate([skip0, h], axis=-1))
