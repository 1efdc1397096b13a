"""Closed-form FLOP / HBM-byte accounting for the assembly kernels.

The reference never measured its kernels against hardware limits; this
module answers "is it actually fast, or just faster than a 1-core CPU?"
(VERDICT r3): per-kernel algorithmic FLOPs and minimum HBM traffic are
closed-form in (volume shape, patchshape, pair count), so achieved
GFLOP/s / GB/s and % of chip peak can be printed next to every wall time.

Cost conventions (match the kernel formulations in ops/consensus_jax.py):

- consensus: scan over base patch offsets q; every ordered channel pair
  (q, r>q) is one fused compare/product/select/accumulate over all V
  voxels (~6 VPU flops per pair-voxel).  Minimum HBM traffic = read the
  (P, V) affinity stack once per scan sweep + write the (N, V) consensus
  (N = prod(2*ps-1)).
- rank: the same pair structure reading the consensus instead of writing
  (~4 flops per pair-voxel); traffic = affs + consensus read + (V,) write.
- patch graph: per selected pair, the cross-patch contraction touches
  P * P (mask_q x mask_r x consensus-window) terms (~3 flops each, MXU-
  eligible in the one-hot shear formulation); traffic = the per-segment
  consensus window gathers.

These are ALGORITHMIC minima: they exclude padding, halo overlap, fold
layouts, and recomputation, so "% of peak" is a conservative lower bound
on hardware utilization (the kernel may move/compute more than charged).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class ChipPeaks:
    name: str
    mxu_bf16_tflops: float   # dense matmul peak
    vpu_f32_tflops: float    # vector unit peak (estimate: lanes*ops*clock)
    hbm_gbps: float


# MXU/HBM peaks are published figures (cloud.google.com TPU system
# architecture docs).  The VPU f32 peaks are ESTIMATES (no published
# figure exists): 8 ops/cycle * 8x128 lanes * clock — order-of-magnitude
# anchors only, and labeled "est-VPU" wherever a %-of-peak is printed.
_PEAKS = {
    "v5e": ChipPeaks("TPU v5e", 197.0, 7.5, 819.0),
    "v5litepod": ChipPeaks("TPU v5e", 197.0, 7.5, 819.0),
    "v5p": ChipPeaks("TPU v5p", 459.0, 14.0, 2765.0),
    "v4": ChipPeaks("TPU v4", 275.0, 8.6, 1228.0),
    "v6e": ChipPeaks("TPU v6e", 918.0, 14.0, 1640.0),
    "cpu": ChipPeaks("host CPU (1 core est.)", 0.1, 0.05, 20.0),
}


def chip_peaks(device_kind: str | None = None) -> ChipPeaks:
    if device_kind is None:
        try:
            import jax

            device_kind = jax.devices()[0].device_kind
        except Exception:  # pragma: no cover
            device_kind = "cpu"
    dk = device_kind.lower().replace(" ", "")
    for key, peaks in _PEAKS.items():
        if key in dk:
            return peaks
    return _PEAKS["v5e"]  # the bench chip


@dataclass(frozen=True)
class KernelCost:
    flops: float       # algorithmic floating-point ops
    hbm_bytes: float   # minimum HBM traffic
    unit: str          # which peak applies: "vpu" | "mxu"


def _neigh_size(ps) -> int:
    ps = np.asarray(ps, dtype=np.int64)
    return int(np.prod(np.where(ps > 1, 2 * ps - 1, 1)))


def consensus_cost(vol_shape, ps, cons_bf16: bool = False) -> KernelCost:
    V = float(np.prod(vol_shape))
    P = float(np.prod(ps))
    pairs = P * (P + 1) / 2
    flops = V * pairs * 6.0
    cons_b = 2 if cons_bf16 else 4
    hbm = V * P * 4.0 + V * _neigh_size(ps) * cons_b
    return KernelCost(flops, hbm, "vpu")


def rank_cost(vol_shape, ps, cons_bf16: bool = False) -> KernelCost:
    V = float(np.prod(vol_shape))
    P = float(np.prod(ps))
    pairs = P * (P + 1) / 2
    flops = V * pairs * 4.0
    cons_b = 2 if cons_bf16 else 4
    hbm = V * P * 4.0 + V * _neigh_size(ps) * cons_b + V * 4.0
    return KernelCost(flops, hbm, "vpu")


def graph_cost(n_pairs, ps, cons_bf16: bool = False) -> KernelCost:
    P = float(np.prod(ps))
    flops = float(n_pairs) * P * P * 3.0
    cons_b = 2 if cons_bf16 else 4
    # per pair: one (P,) window of each patch + one (neigh,) consensus
    # window around the center offset
    hbm = float(n_pairs) * (2 * P * 4.0 + _neigh_size(ps) * cons_b)
    return KernelCost(flops, hbm, "mxu")


def unet_cost(vol_shape, num_fmaps, fmap_inc, levels, in_ch,
              kernel_size: int = 3, reps: int = 2,
              ndim: int = 3) -> KernelCost:
    """Conv FLOPs of the 2-head U-Net forward (MXU work; HBM = feature
    maps once per conv)."""
    V = float(np.prod(vol_shape))
    k = float(kernel_size ** ndim)
    flops = 0.0
    hbm = 0.0
    cin = float(in_ch)
    v = V
    f = float(num_fmaps)
    for lvl in range(levels):
        for _ in range(reps):
            flops += 2.0 * v * cin * f * k
            hbm += v * (cin + f) * 2.0  # bf16 activations
            cin = f
        if lvl < levels - 1:
            v /= 2.0 ** ndim
            f *= float(fmap_inc)
    # decoder ~ mirrors the encoder cost
    flops *= 2.0
    hbm *= 2.0
    return KernelCost(flops, hbm, "mxu")


def analyze(cost: KernelCost, wall_s: float,
            peaks: ChipPeaks | None = None) -> dict:
    """Achieved rates + % of the applicable peak + bound classification."""
    peaks = peaks or chip_peaks()
    peak_tflops = (peaks.mxu_bf16_tflops if cost.unit == "mxu"
                   else peaks.vpu_f32_tflops)
    gflops = cost.flops / wall_s / 1e9
    gbps = cost.hbm_bytes / wall_s / 1e9
    frac_compute = gflops / (peak_tflops * 1e3)
    frac_hbm = gbps / peaks.hbm_gbps
    # roofline: which ceiling does the ALGORITHM hit first at this
    # intensity (flops/byte vs machine balance)?
    balance = peak_tflops * 1e3 / peaks.hbm_gbps  # flop/byte
    intensity = cost.flops / max(cost.hbm_bytes, 1.0)
    return {
        "wall_s": wall_s,
        "gflops_per_s": round(gflops, 2),
        "gbytes_per_s": round(gbps, 2),
        "pct_of_%s_peak" % cost.unit: round(100 * frac_compute, 2),
        "pct_of_hbm_peak": round(100 * frac_hbm, 2),
        "arithmetic_intensity": round(intensity, 2),
        "bound": ("compute" if intensity > balance else "memory"),
        "chip": peaks.name,
    }


def assembly_mfu_summary(vol_shape, ps, n_pairs, stage_seconds: dict,
                         cons_bf16: bool = False,
                         peaks: ChipPeaks | None = None) -> dict:
    """Per-stage roofline for a measured assembly stage breakdown.

    ``stage_seconds`` keys: "consensus", "rank" (or one fused
    "consensus+rank"), "graph"."""
    peaks = peaks or chip_peaks()
    out = {}
    if "consensus+rank" in stage_seconds:
        c = consensus_cost(vol_shape, ps, cons_bf16)
        r = rank_cost(vol_shape, ps, cons_bf16)
        fused = KernelCost(c.flops + r.flops, c.hbm_bytes + r.hbm_bytes,
                           "vpu")
        out["consensus+rank"] = analyze(
            fused, stage_seconds["consensus+rank"], peaks)
    else:
        if "consensus" in stage_seconds:
            out["consensus"] = analyze(
                consensus_cost(vol_shape, ps, cons_bf16),
                stage_seconds["consensus"], peaks)
        if "rank" in stage_seconds:
            out["rank"] = analyze(rank_cost(vol_shape, ps, cons_bf16),
                                  stage_seconds["rank"], peaks)
    if "graph" in stage_seconds and n_pairs:
        out["graph"] = analyze(graph_cost(n_pairs, ps, cons_bf16),
                               stage_seconds["graph"], peaks)
    return out
