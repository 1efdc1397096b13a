"""Zarr roundtrip of the inference stages: predict -> decode on disk."""

import numpy as np
import jax

from patchperpix_tpu.infer import decode_sample, predict_sample_to_zarr
from patchperpix_tpu.models import PPPConfig, PPPModel
from patchperpix_tpu.utils import io as vio


def test_predict_decode_zarr_roundtrip(tmp_path):
    mcfg = PPPConfig(
        patchshape=(1, 5, 5), num_channels=1, num_fmaps=4,
        fmap_inc_factors=(2,), fmap_dec_factors=(1.0,),
        downsample_factors=((1, 2, 2),),
        train_code=True, code_units=8,
        ae_code_fmaps=2, ae_num_fmaps=(4, 8),
        ae_downsample_factors=((2, 2), (2, 2)),
        overlapping_inst=False, padding="same")
    model = PPPModel(mcfg)
    raw = np.random.RandomState(0).rand(1, 40, 40).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 1, 24, 24), np.float32),
                        method=PPPModel.full_init)

    out = str(tmp_path / "sample.zarr")
    predict_sample_to_zarr(model, params, raw, mcfg,
                           input_shape=(24, 24), output_shape=(24, 24),
                           out_path=out, batch_size=2)
    io = vio.IoZarr(out)
    code = io.read(key="volumes/pred_code")
    fgbg = io.read(key="volumes/pred_fgbg")
    assert code.shape == (8, 40, 40)
    assert fgbg.shape == (1, 40, 40)
    io.close()

    decode_sample(model, params, out, mcfg, fg_thresh=0.0,
                  batch_size=64, fg_key="volumes/pred_fgbg")
    io = vio.IoZarr(out)
    affs = io.read(key="volumes/pred_affs")
    assert affs.shape == (25, 40, 40)
    assert np.isfinite(affs.astype(np.float32)).all()
    # decoded probabilities in [0, 1]
    assert 0.0 <= float(affs.astype(np.float32).min())
    assert float(affs.astype(np.float32).max()) <= 1.0
    io.close()
