"""PatchPerPix model: U-Net backbone + patch/code head + fgbg/numinst head.

Reference: UnetModelWrapper (experiments/.../torch_model.py:34-449).
Two operating modes:
- direct ("ppp"): the first head emits prod(patchshape) affinity logits per
  pixel.
- coded ("ppp+dec", train_code): the first head emits a low-dimensional code
  per pixel; a PatchDecoder expands codes to patch logits (training decodes
  only at sampled fg locations; inference decodes fg pixels blockwise).

The second head emits 1 fgbg logit, or max_num_inst+1 numinst logits when
overlapping instances are modeled.

API boundary uses channels-first (C, *spatial) like the reference; compute
is channels-last internally for the TPU.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .autoencoder import PatchDecoder
from .unet import UNet


@dataclass(frozen=True)
class PPPConfig:
    patchshape: tuple = (7, 7, 7)
    num_channels: int = 1
    # "unet" | "swinunetr" (torch_model.py:88-117 network_style)
    network_style: str = "unet"
    num_fmaps: int = 20
    fmap_inc_factors: tuple = (3, 3, 3)
    fmap_dec_factors: tuple = (1.2, 1.2, 1.2)
    downsample_factors: tuple = ((2, 2, 2), (2, 2, 2), (2, 2, 2))
    kernel_size: int = 3
    num_repetitions: int = 2
    padding: str = "valid"
    upsampling: str = "trans_conv"
    activation: str = "relu"
    train_code: bool = False
    code_units: int = 176
    overlapping_inst: bool = False
    max_num_inst: int = 2
    patch_activation: str = "sigmoid"
    code_activation: str = "sigmoid"
    # autoencoder (decoder) section
    ae_code_fmaps: int = 22
    ae_num_fmaps: tuple = (64, 128)
    ae_downsample_factors: tuple = ((2, 2, 2), (2, 2, 2))
    ae_kernel_size: int = 3
    ae_num_repetitions: int = 2
    ae_upsampling: str = "resize_conv"
    num_code_samples: int = 1024
    dtype: str = "float32"

    @property
    def patchshape_squeezed(self) -> tuple:
        return tuple(p for p in self.patchshape if p > 1)

    @property
    def patchsize(self) -> int:
        return int(np.prod(self.patchshape_squeezed))

    @property
    def spatial_dims(self) -> int:
        return len(self.patchshape_squeezed)

    @property
    def out_channels_head1(self) -> int:
        return self.code_units if self.train_code else self.patchsize

    @property
    def out_channels_head2(self) -> int:
        return self.max_num_inst + 1 if self.overlapping_inst else 1

    @classmethod
    def from_config(cls, cfg: dict) -> "PPPConfig":
        ae = cfg.get("autoencoder", {})
        def tup(x):
            return tuple(tuple(v) if isinstance(v, (list, tuple)) else v
                         for v in x)
        return cls(
            patchshape=tuple(cfg.get("patchshape", (7, 7, 7))),
            num_channels=cfg.get("num_channels", 1),
            network_style=cfg.get("network_style", "unet").lower(),
            num_fmaps=cfg.get("num_fmaps", 20),
            fmap_inc_factors=tuple(cfg.get("fmap_inc_factors", (3, 3, 3))),
            fmap_dec_factors=tuple(cfg.get("fmap_dec_factors", (1.2,) * 3)),
            downsample_factors=tup(cfg.get("downsample_factors",
                                           ((2, 2, 2),) * 3)),
            kernel_size=cfg.get("kernel_size", 3),
            num_repetitions=cfg.get("num_repetitions", 2),
            padding=cfg.get("train_padding", cfg.get("padding", "valid")),
            upsampling=cfg.get("upsampling", "trans_conv"),
            activation=cfg.get("activation", "relu"),
            train_code=cfg.get("train_code", False),
            code_units=cfg.get("code_units", 176),
            overlapping_inst=cfg.get("overlapping_inst", False),
            max_num_inst=cfg.get("max_num_inst", 2),
            patch_activation=cfg.get("patch_activation", "sigmoid"),
            code_activation=ae.get("code_activation", "sigmoid"),
            ae_code_fmaps=ae.get("code_fmaps", 22),
            ae_num_fmaps=tuple(ae.get("num_fmaps", (64, 128))),
            ae_downsample_factors=tup(ae.get("downsample_factors",
                                             ((2, 2, 2), (2, 2, 2)))),
            ae_kernel_size=ae.get("kernel_size", 3),
            ae_num_repetitions=ae.get("num_repetitions", 2),
            ae_upsampling=ae.get("upsampling", "resize_conv"),
            num_code_samples=ae.get("num_code_samples", 1024),
            # AMP: "bfloat16" runs convs/matmuls in bf16 on the MXU with
            # f32 params (ref train.py:552-572 torch autocast)
            dtype=cfg.get("dtype", "float32"),
        )


class PPPModel(nn.Module):
    cfg: PPPConfig

    def setup(self):
        c = self.cfg
        ndim = c.spatial_dims
        dtype = jnp.dtype(c.dtype)
        # squeeze leading size-1 patch axes out of per-level factors for 2D
        if ndim == 2:
            ds = tuple(tuple(f[-2:]) for f in c.downsample_factors)
            ae_ds = tuple(tuple(f[-2:]) for f in c.ae_downsample_factors)
        else:
            ds = c.downsample_factors
            ae_ds = c.ae_downsample_factors
        if c.network_style == "swinunetr":
            # alternative backbone (torch_model.py:110-117); same-size
            # output (no valid-conv margin), heads attach unchanged
            from .swin import SwinUNETR
            n_stages = len(ds)
            self.unet = SwinUNETR(
                feature_size=c.num_fmaps,
                depths=(2,) * n_stages,
                num_heads=tuple(
                    max(1, c.num_fmaps * (2 ** i) // 8)
                    for i in range(n_stages)),
                dtype=dtype)
        elif c.network_style == "unet":
            self.unet = UNet(
                num_fmaps=c.num_fmaps,
                fmap_inc_factors=c.fmap_inc_factors,
                fmap_dec_factors=c.fmap_dec_factors,
                downsample_factors=ds,
                kernel_size=c.kernel_size,
                num_repetitions=c.num_repetitions,
                padding=c.padding,
                upsampling=c.upsampling,
                activation=c.activation,
                dtype=dtype)
        else:
            raise ValueError(
                f"invalid network style: {c.network_style!r} "
                "(expected 'unet' or 'swinunetr')")
        self.head_code_affs = nn.Conv(
            c.out_channels_head1, kernel_size=(1,) * ndim, padding="VALID",
            dtype=dtype, kernel_init=nn.initializers.xavier_uniform())
        self.head_fgbg_numinst = nn.Conv(
            c.out_channels_head2, kernel_size=(1,) * ndim, padding="VALID",
            dtype=dtype, kernel_init=nn.initializers.kaiming_normal())
        if c.train_code:
            self.decoder = PatchDecoder(
                patchshape=c.patchshape_squeezed,
                code_units=c.code_units,
                code_fmaps=c.ae_code_fmaps,
                num_fmaps=c.ae_num_fmaps,
                downsample_factors=ae_ds,
                kernel_size=c.ae_kernel_size,
                num_repetitions=c.ae_num_repetitions,
                upsampling=c.ae_upsampling,
                dtype=dtype)

    def __call__(self, raw):
        """raw: (B, C, *spatial) -> (code_affs_logits, fgbg_numinst_logits),
        both channels-first."""
        ndim = self.cfg.spatial_dims
        x = jnp.moveaxis(raw, 1, -1)
        feats = self.unet(x)
        h1 = self.head_code_affs(feats)
        h2 = self.head_fgbg_numinst(feats)
        return jnp.moveaxis(h1, -1, 1), jnp.moveaxis(h2, -1, 1)

    def decode(self, codes):
        """codes (N, code_units) -> patch logits (N, *patchshape_squeezed)."""
        return self.decoder(codes)

    def full_init(self, raw):
        """Touches every submodule so ``init`` creates all params
        (``__call__`` alone never reaches the decoder)."""
        out = self(raw)
        if self.cfg.train_code:
            dummy = jnp.zeros((1, self.cfg.code_units), out[0].dtype)
            self.decode(dummy)
        return out


def apply_activations(cfg: PPPConfig, head1_logits, head2_logits):
    """Inference-time activations (torch_model.py:307-318)."""
    act = {"sigmoid": jax.nn.sigmoid, "relu": jax.nn.relu,
           "identity": lambda v: v}
    a1 = act[(cfg.code_activation if cfg.train_code
              else cfg.patch_activation).lower()]
    head1 = a1(head1_logits)
    if cfg.overlapping_inst:
        head2 = jax.nn.softmax(head2_logits, axis=1)
    else:
        head2 = jax.nn.sigmoid(head2_logits)
    return head1, head2
