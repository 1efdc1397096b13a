"""Reference output/diagnostic knobs: store_scores, shuffle_patches,
save_mip, vote_instances_masked, dilate_instances, chessboard offsets
(ranked_patches.py:147-210, stitch_patch_graph.py:404-422 / 823-895)."""

import os

import h5py
import numpy as np

from patchperpix_tpu.assembly import (VoteInstancesParams, do_all,
                                      to_instance_seg)
from patchperpix_tpu.assembly.blockwise import (blockwise_vote_instances,
                                                get_chessboard_offsets)
from patchperpix_tpu.ops import synthetic
from patchperpix_tpu.utils.postprocess import relabel


def _case_3d():
    labels = np.zeros((16, 20, 20), dtype=np.int32)
    labels[3:9, 3:10, 3:10] = 1
    labels[9:15, 11:18, 11:18] = 2
    ps = np.array([3, 3, 3])
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[13] > 0.5
    return labels, affs, fg


def _write_hdf(tmp_path, affs):
    pred = str(tmp_path / "sample.hdf")
    with h5py.File(pred, "w") as f:
        f.create_dataset("volumes/pred_affs", data=affs)
    return pred


def test_store_scores_writeback(tmp_path):
    """ranked_patches.py:147-181: score volume written back under
    volumes/<thresh>/scores with candidate centers marked +100."""
    labels, affs, fg = _case_3d()
    pred = _write_hdf(tmp_path, affs)
    params = VoteInstancesParams(
        patchshape=(3, 3, 3), engine="jax", numinst_key=None, fg_key=None,
        store_scores=True, result_folder=str(tmp_path))
    do_all(pred, params)
    with h5py.File(pred, "r") as f:
        scores = f["volumes/0_5/scores"][()]
    assert scores.shape == fg.shape
    # interior fg centers are marked +100 on top of scores in [-1, 1]
    assert (scores > 50).sum() > 0
    marked = scores > 50
    assert fg[marked].all()
    # border ring (patch radius) holds no candidates
    assert not marked[0].any() and not marked[-1].any()


def test_shuffle_patches_still_segments():
    """ranked_patches.py:199-210: shuffling the ranked list is a
    diagnostic but the pipeline still produces a full cover."""
    labels, affs, fg = _case_3d()
    base = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax")
    inst, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                              base)
    shuf = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                               shuffle_patches=True, seed=3)
    inst_s, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                                shuf)
    # perfect synthetic affinities: the partition is rank-order-invariant
    pairs = set(zip(relabel(inst)[fg].tolist(),
                    relabel(inst_s)[fg].tolist()))
    assert len(pairs) == 2


def test_masked_mip_dilate_outputs(tmp_path):
    labels, affs, fg = _case_3d()
    pred = _write_hdf(tmp_path, affs)
    params = VoteInstancesParams(
        patchshape=(3, 3, 3), engine="jax", numinst_key=None, fg_key=None,
        save_mip=True, dilate_instances=True, remove_small_comps=5,
        crop_to_foreground=False, result_folder=str(tmp_path))
    out = do_all(pred, params)
    with h5py.File(out, "r") as f:
        inst = f["vote_instances"][()]
        masked = f["vote_instances_masked"][()]
        dil = f["vote_instances_dil_1"][()]
        mdil = f["vote_instances_masked_dil_1"][()]
        fg_out = f["vote_foreground"][()]
    # masked = instances zeroed outside fg (stitch_patch_graph.py:860-866)
    expect = inst.copy()
    expect[fg_out == 0] = 0
    np.testing.assert_array_equal(masked, expect)
    # dilation grows every instance but never loses a label
    assert set(np.unique(dil)) == set(np.unique(inst))
    for lbl in np.unique(inst):
        if lbl:
            assert (dil == lbl).sum() >= (inst == lbl).sum()
    np.testing.assert_array_equal(mdil[fg_out == 0], 0)
    # MIP PNGs: pre-cleanup + post-cleanup variants
    assert os.path.exists(str(tmp_path / "sample.png"))
    assert os.path.exists(str(tmp_path / "sample_cleaned.png"))
    from PIL import Image

    img = np.asarray(Image.open(str(tmp_path / "sample.png")))
    assert img.shape == (20, 20, 3)
    assert img.max() > 0


def test_save_tif_label_volume(tmp_path):
    """stitch_patch_graph.py:836-841: cleaned uint16 relabeled volume as
    (multipage) tif next to the hdf."""
    labels, affs, fg = _case_3d()
    pred = _write_hdf(tmp_path, affs)
    params = VoteInstancesParams(
        patchshape=(3, 3, 3), engine="jax", numinst_key=None, fg_key=None,
        save_tif=True, remove_small_comps=5,
        crop_to_foreground=False, result_folder=str(tmp_path))
    out = do_all(pred, params)
    from patchperpix_tpu.utils.io import read_tif

    tif_path = str(tmp_path / "sample.tif")
    assert os.path.exists(tif_path)
    tif = read_tif(tif_path)
    with h5py.File(out, "r") as f:
        inst = f["vote_instances"][()]
    assert tif.shape == inst.shape
    assert tif.dtype == np.uint16
    # tif is the relabeled cleaned volume
    np.testing.assert_array_equal(tif, relabel(inst).astype(np.uint16))


def test_save_tif_roundtrip_2d_float():
    """float32 mosaic tif (visualize/patches.py:196-198 parity)."""
    import tempfile

    from patchperpix_tpu.utils.io import read_tif, save_tif
    from patchperpix_tpu.visualize.patches import visualize_patches

    rng = np.random.RandomState(0)
    arr = rng.rand(9, 6, 6).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.tif")
        save_tif(p, arr[0])
        back = read_tif(p)
        np.testing.assert_array_equal(back, arr[0])
        # and through the mosaic writer
        p2 = os.path.join(d, "patches.tif")
        visualize_patches(arr.reshape(9, 1, 6, 6), (1, 3, 3), p2, z=0)
        m = read_tif(p2)
        assert m.dtype == np.float32 and m.ndim == 2


def test_chessboard_offsets_phases():
    """stitch_patch_graph.py:404-422: 8 phases in 3D, equal-phase blocks
    never grid-adjacent."""
    offs = get_chessboard_offsets((40, 40, 40), (10, 10, 10))
    assert len(offs) == 64
    phases = {}
    for row in offs:
        phases.setdefault(int(row[0]), []).append(row[1:])
    assert set(phases) == set(range(8))
    for ph, blocks in phases.items():
        pts = np.array(blocks) // 10
        for i in range(len(pts)):
            d = np.abs(pts - pts[i]).sum(axis=1)
            assert not ((d == 1).any())  # no face neighbors share a phase
    # 2D: 4 phases
    offs2 = get_chessboard_offsets((20, 20), (10, 10))
    assert sorted(int(r[0]) for r in offs2) == [0, 1, 2, 3]


def test_chessboard_blockwise_matches_plain():
    labels, affs, fg = _case_3d()
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False)
    plain, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8), params, chunksize=(10, 10, 10))
    chess = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                removeIntersection=False, chessboard=True,
                                num_parallel_blocks=4)
    cb, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8), chess, chunksize=(10, 10, 10))
    pairs = set(zip(relabel(plain)[fg].tolist(), relabel(cb)[fg].tolist()))
    assert len(pairs) == len(np.unique(plain[plain > 0]))
