"""Out-of-core decode: z-slab streaming + decode-on-demand blockwise reader.

The reference materializes the full dense (prod(ps), *vol) affinity volume
in host RAM during decode (decode.py:43) — SURVEY §3.3 requires the TPU
build to stream it.  These tests pin:
- slab-streamed ``decode_sample`` == dense in-memory decode (any budget),
- ``CodeAffReader`` windows/columns == reading the staged dense f16 store,
- blockwise assembly straight from codes == staged decode-then-assemble.
"""

import numpy as np
import jax
import pytest

from patchperpix_tpu.assembly import VoteInstancesParams
from patchperpix_tpu.assembly.blockwise import (ZarrAffReader,
                                                blockwise_vote_instances_zarr)
from patchperpix_tpu.infer.decode import (CodeAffReader, CodeDecoder,
                                          decode_sample, decode_volume,
                                          derive_fg_mask)
from patchperpix_tpu.models import PPPConfig, PPPModel
from patchperpix_tpu.utils import io as vio
from patchperpix_tpu.utils.postprocess import relabel


def _tiny_code_model():
    cfg = PPPConfig(
        patchshape=(3, 3, 3), num_channels=1, num_fmaps=2,
        fmap_inc_factors=(2,), fmap_dec_factors=(1.0,),
        downsample_factors=((2, 2, 2),),
        train_code=True, code_units=8, ae_code_fmaps=1,
        ae_num_fmaps=(2, 4), num_code_samples=8,
        overlapping_inst=True, max_num_inst=2, padding="same")
    model = PPPModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 1, 8, 8, 8), np.float32),
                        method=PPPModel.full_init)
    return model, params, cfg


def _write_code_pred(path, code, numinst):
    io = vio.IoZarr(path, mode="w")
    io.create("volumes/pred_code", code.shape, np.float32,
              chunks=(code.shape[0], 8, 8, 8))
    io.write(code.astype(np.float32), key="volumes/pred_code")
    io.create("volumes/pred_numinst", numinst.shape, np.float32,
              chunks=(numinst.shape[0], 8, 8, 8))
    io.write(numinst.astype(np.float32), key="volumes/pred_numinst")
    io.close()


def _synthetic_code_pred(vol=(24, 20, 20), seed=0):
    rng = np.random.RandomState(seed)
    code = rng.randn(8, *vol).astype(np.float32)
    # numinst probabilities: two fg blobs (P(bg) low) scaled to the
    # volume so larger volumes really exercise multi-block decode
    v = np.asarray(vol)

    def _blob(frac0, frac1):
        return tuple(slice(int(s * frac0), int(s * frac1)) for s in v)

    pbg = np.ones(vol, np.float32) * 0.98
    pbg[_blob(0.15, 0.45)] = 0.02
    pbg[_blob(0.55, 0.9)] = 0.02
    numinst = np.stack([pbg, 1 - pbg, np.zeros(vol, np.float32)])
    return code, numinst


def test_decode_sample_streaming_matches_dense(tmp_path):
    model, params, cfg = _tiny_code_model()
    code, numinst = _synthetic_code_pred()
    path = str(tmp_path / "pred.zarr")
    _write_code_pred(path, code, numinst)

    # budget forces multiple z-slabs (per-z ~76 KB at 20x20, P=27)
    decode_sample(model, params, path, cfg, batch_size=64,
                  max_ram_mb=0.6)
    io = vio.IoZarr(path)
    affs = io.read(key="volumes/pred_affs")
    io.close()
    assert affs.dtype == np.float16

    fg = derive_fg_mask(numinst, overlapping_inst=True)
    dense = decode_volume(model, params, code, fg, cfg, batch_size=64)
    np.testing.assert_array_equal(affs, dense.astype(np.float16))
    # decode really is gated on fg
    assert affs[:, ~fg].sum() == 0
    assert affs[:, fg].sum() > 0


def test_code_reader_matches_dense_store(tmp_path):
    model, params, cfg = _tiny_code_model()
    code, numinst = _synthetic_code_pred()
    path = str(tmp_path / "pred.zarr")
    _write_code_pred(path, code, numinst)
    decode_sample(model, params, path, cfg, batch_size=64)

    dec = CodeDecoder(model, params, cfg, batch_size=64)
    cr = CodeAffReader(path, dec)
    zr = ZarrAffReader(path, "volumes/pred_affs", cfg.patchsize)

    # interior window, border window with out-of-volume padding
    for start, stop in [((4, 4, 4), (12, 12, 12)),
                        ((-2, 14, 12), (6, 26, 24))]:
        np.testing.assert_array_equal(
            cr.read_window(np.array(start), np.array(stop)),
            zr.read_window(np.array(start), np.array(stop)))

    fg = derive_fg_mask(numinst, overlapping_inst=True)
    fg_pts = np.argwhere(fg)[::50]
    bg_pt = np.argwhere(~fg)[0]
    coords = [tuple(int(x) for x in c) for c in fg_pts] + [
        tuple(int(x) for x in bg_pt)]
    cc = cr.read_columns(coords)
    zc = zr.read_columns(coords)
    for c in coords:
        np.testing.assert_array_equal(cc[c], zc[c])
    # center channel (fg fallback reader) parity
    np.testing.assert_array_equal(cr.read_channel(cfg.patchsize // 2),
                                  zr.read_channel(cfg.patchsize // 2))
    cr.close()
    zr.close()


def _run_blockwise_pair(tmp_path, vol, chunksize, max_ram_mb=4.0):
    """(instances from codes directly, instances from the staged store)."""
    model, params, cfg = _tiny_code_model()
    code, numinst = _synthetic_code_pred(vol)
    code_path = str(tmp_path / "code_only.zarr")
    staged_path = str(tmp_path / "staged.zarr")
    _write_code_pred(code_path, code, numinst)
    _write_code_pred(staged_path, code, numinst)

    vi = VoteInstancesParams(
        patchshape=(3, 3, 3), engine="jax", removeIntersection=False,
        overlapping_inst=True, numinst_key="volumes/pred_numinst",
        # untrained decoder emits ~sigmoid(0)=0.5 patches: threshold below
        # that so the assembly is non-degenerate
        patch_threshold=0.45, fc_threshold=0.45,
        blockwise=True)
    dec = CodeDecoder(model, params, cfg, batch_size=64)
    from_codes, fg_a = blockwise_vote_instances_zarr(
        code_path, vi, chunksize=chunksize,
        result_folder=str(tmp_path / "ra"), decoder=dec)

    # staged: decode to a dense f16 store first (slab-streamed), then
    # assemble from the store — the reference's two-stage path
    decode_sample(model, params, staged_path, cfg, batch_size=64,
                  max_ram_mb=max_ram_mb)
    staged, fg_b = blockwise_vote_instances_zarr(
        staged_path, vi, chunksize=chunksize,
        result_folder=str(tmp_path / "rb"), decoder=dec)
    return from_codes, staged, fg_a, fg_b


def test_blockwise_from_codes_matches_staged(tmp_path):
    from_codes, staged, fg_a, fg_b = _run_blockwise_pair(
        tmp_path, vol=(24, 20, 20), chunksize=(14, 14, 14))
    np.testing.assert_array_equal(fg_a, fg_b)
    # identical deterministic pipelines (f16 quantization in both readers)
    np.testing.assert_array_equal(relabel(from_codes), relabel(staged))
    assert from_codes.max() > 0  # non-degenerate


@pytest.mark.slow
def test_blockwise_from_codes_120cubed(tmp_path):
    """FlyLight-scale shape check (VERDICT r3 #1): a >=120^3 code volume
    assembles straight from codes with a small decode-RAM budget; the
    dense (P, *vol) array never materializes (peak slab = budget)."""
    from_codes, staged, fg_a, fg_b = _run_blockwise_pair(
        tmp_path, vol=(120, 120, 120), chunksize=(64, 64, 64),
        max_ram_mb=8.0)  # dense store would be 27 * 120^3 * 4B = 186 MB
    np.testing.assert_array_equal(fg_a, fg_b)
    np.testing.assert_array_equal(relabel(from_codes), relabel(staged))
