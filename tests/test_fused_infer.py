"""Fused device-resident predict->decode: parity vs the host-path stages."""

import numpy as np
import jax
import jax.numpy as jnp

from patchperpix_tpu.infer.decode import decode_volume
from patchperpix_tpu.infer.fused import (decode_volume_device,
                                         predict_volume_device)
from patchperpix_tpu.infer.predict import predict_volume
from patchperpix_tpu.models import PPPConfig, PPPModel


def _tiny_code_model():
    return PPPConfig(
        patchshape=(3, 3, 3), num_channels=1, num_fmaps=2,
        fmap_inc_factors=(2,), fmap_dec_factors=(1.0,),
        downsample_factors=((2, 2, 2),),
        train_code=True, code_units=8, ae_code_fmaps=1,
        ae_num_fmaps=(2, 4), num_code_samples=8,
        overlapping_inst=True, max_num_inst=2, padding="same")


def test_fused_predict_matches_host_path():
    cfg = _tiny_code_model()
    model = PPPModel(cfg)
    rng = np.random.RandomState(0)
    raw = rng.rand(1, 12, 12, 12).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1, 8, 8, 8)), method=model.full_init)

    h1_host, h2_host = predict_volume(model, params, raw, cfg,
                                      (8, 8, 8), (8, 8, 8),
                                      out_dtype=np.float32)
    h1_dev, h2_dev = predict_volume_device(model, params, raw, cfg,
                                           (8, 8, 8), (8, 8, 8))
    np.testing.assert_allclose(np.asarray(h1_dev), h1_host,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h2_dev), h2_host,
                               atol=1e-5, rtol=1e-4)


def test_fused_decode_matches_host_path():
    cfg = _tiny_code_model()
    model = PPPModel(cfg)
    rng = np.random.RandomState(1)
    code = rng.rand(8, 10, 10, 10).astype(np.float32)
    fg = rng.rand(10, 10, 10) > 0.6
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1, 8, 8, 8)), method=model.full_init)

    host = decode_volume(model, params, code, fg, cfg, batch_size=64)
    dev = decode_volume_device(model, params, jnp.asarray(code), fg, cfg,
                               batch_size=64)
    np.testing.assert_allclose(np.asarray(dev), host, atol=1e-5, rtol=1e-4)


def test_assembly_accepts_device_affs():
    from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
    from patchperpix_tpu.ops import synthetic
    from patchperpix_tpu.utils.postprocess import relabel

    labels = synthetic.two_blob_labels_3d()
    affs = synthetic.labels_to_affinities(labels, np.array([3, 3, 3]))
    fg = affs[13] > 0.5
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False)
    host, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                              params)
    dev, _ = to_instance_seg(jax.device_put(jnp.asarray(affs)), fg,
                             fg.copy(), fg.astype(np.uint8), params)
    np.testing.assert_array_equal(relabel(host), relabel(dev))
