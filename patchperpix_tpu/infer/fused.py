"""Device-resident predict -> decode (fused inference path).

TPU-native variant of predict_no_gp.py + decode.py for single-chip
end-to-end runs: tile predictions accumulate into device arrays via
dynamic_update_slice and the decoded dense (P, *vol) affinity stack is
scattered on device, so NO intermediate volume ever crosses to the host
(the reference round-trips float16 zarr files between stages,
predict_no_gp.py:230-233 / decode.py:43).  Assembly consumes the device
stack directly (to_instance_seg detects device-resident inputs).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ppp import PPPConfig, PPPModel, apply_activations
from .predict import enumerate_shifts

logger = logging.getLogger(__name__)


@functools.partial(jax.jit,
                   static_argnames=("model", "mcfg", "input_shape"),
                   donate_argnums=(3, 4))  # donate both accumulators:
                                           # without donation every tile
                                           # copies the full volumes
def _fwd_and_place(model, mcfg, params, out1, out2, raw_all, offset,
                   input_shape):
    # module-level jit: repeated pipeline invocations hit the trace cache
    # instead of re-tracing a fresh closure every call
    tile = jax.lax.dynamic_slice(
        raw_all, (0,) + tuple(offset),
        (raw_all.shape[0],) + tuple(int(i) for i in input_shape))
    h1, h2 = model.apply(params, tile[None])
    h1, h2 = apply_activations(mcfg, h1, h2)
    h1 = h1.astype(out1.dtype)  # bf16 (AMP) models emit bf16 heads
    h2 = h2.astype(out2.dtype)
    out1 = jax.lax.dynamic_update_slice(out1, h1[0], (0,) + tuple(offset))
    out2 = jax.lax.dynamic_update_slice(out2, h2[0], (0,) + tuple(offset))
    return out1, out2


def predict_volume_device(model: PPPModel, params, raw: np.ndarray,
                          mcfg: PPPConfig, input_shape, output_shape,
                          batch_size: int = 1):
    """Sliding-window prediction, outputs stay on device.

    Returns (head1 (C1, *spatial), head2 (C2, *spatial)) as jax arrays
    (activations applied).
    """
    spatial = np.array(raw.shape[1:])
    input_shape = np.array(input_shape)
    output_shape = np.array(output_shape)
    from .predict import pad_to_grid

    raw_padded, shape_padded, context = pad_to_grid(
        raw, spatial, input_shape, output_shape)
    raw_dev = jax.device_put(jnp.asarray(raw_padded, jnp.float32))

    shifts = enumerate_shifts(shape_padded, input_shape, output_shape)
    out_sp = tuple(int(s) for s in shape_padded - 2 * context)

    out1 = jnp.zeros((mcfg.out_channels_head1,) + out_sp, jnp.float32)
    out2 = jnp.zeros((mcfg.out_channels_head2,) + out_sp, jnp.float32)
    in_sp = tuple(int(i) for i in input_shape)
    for sh in shifts:
        off = jnp.asarray(sh, jnp.int32)
        out1, out2 = _fwd_and_place(model, mcfg, params, out1, out2,
                                    raw_dev, off, in_sp)

    crop = tuple(slice(0, int(s)) for s in spatial)
    return out1[(slice(None),) + crop], out2[(slice(None),) + crop]


@functools.partial(jax.jit, static_argnames=("model", "P"),
                   donate_argnums=(2,))  # donate the accumulator
def _dec_scatter(model, params, out, flat_code, idx, *, P):
    # codes from predict_volume_device already have the code activation
    # applied (apply_activations).  The last chunk is edge-padded with a
    # REAL index (callers pad idx with chunk[0]), so duplicate scatter
    # targets always carry identical new values — zero-padding instead
    # made index 0 both a valid fg voxel and padding, and XLA's
    # arbitrary duplicate winner could keep the stale value.
    codes = flat_code[:, idx].T               # (B, code_units)
    logits = model.apply(params, codes, method=PPPModel.decode)
    patches = jax.nn.sigmoid(logits).reshape(idx.shape[0], P).T
    return out.at[:, idx].set(patches.astype(out.dtype))


def decode_volume_device(model: PPPModel, params, code, fg_mask: np.ndarray,
                         mcfg: PPPConfig, batch_size: int = 4096):
    """code (code_units, *vol) device array + host fg mask -> dense affs
    (P, *vol) device array (sigmoid applied)."""
    P = mcfg.patchsize
    vol_shape = code.shape[1:]
    coords = np.argwhere(fg_mask)
    n_total = int(np.prod(vol_shape))
    flat_code = code.reshape(code.shape[0], -1)
    out = jnp.zeros((P, n_total), jnp.float32)
    if len(coords) == 0:
        return out.reshape((P,) + tuple(vol_shape))

    flat_idx = np.ravel_multi_index(coords.T, vol_shape)

    B = int(batch_size)
    for i in range(0, len(flat_idx), B):
        chunk = flat_idx[i:i + B]
        if len(chunk) < B:  # edge-pad with a real index (see _dec_scatter)
            chunk = np.pad(chunk, (0, B - len(chunk)), mode="edge")
        out = _dec_scatter(model, params, out, flat_code,
                           jnp.asarray(chunk), P=P)
    return out.reshape((P,) + tuple(vol_shape))
