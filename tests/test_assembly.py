"""Pipeline-level tests: vote_instances driver, IO, skeleton, postprocess."""

import numpy as np
import pytest

from patchperpix_tpu.assembly import VoteInstancesParams, do_all, to_instance_seg
from patchperpix_tpu.ops import synthetic
from patchperpix_tpu.utils import io as vio
from patchperpix_tpu.utils.postprocess import (clean_mask, relabel,
                                               remove_small_components)
from patchperpix_tpu.utils.skeleton import skeletonize


def _setup_case(ps=(1, 5, 5)):
    labels = synthetic.two_blob_labels_2d()
    affs = synthetic.labels_to_affinities(labels, np.array(ps))
    mid = int(np.prod(ps)) // 2
    fg = affs[mid] > 0.5
    return labels, affs, fg


@pytest.mark.parametrize("engine", ["numpy", "jax"])
def test_to_instance_seg_both_engines(engine):
    labels, affs, fg = _setup_case()
    params = VoteInstancesParams(patchshape=(1, 5, 5), engine=engine,
                                 select_patches_for_sparse_data=True)
    inst, fg_out = to_instance_seg(affs, fg, fg.copy(),
                                   fg.astype(np.uint8), params)
    inst[fg == 0] = 0
    assert len(np.unique(inst[inst > 0])) == 2
    for gt_id in (1, 2):
        pred = np.unique(inst[labels == gt_id])
        assert len(pred[pred > 0]) == 1


def test_engines_agree_on_labels():
    labels, affs, fg = _setup_case()
    res = {}
    for engine in ("numpy", "jax"):
        params = VoteInstancesParams(
            patchshape=(1, 5, 5), engine=engine,
            removeIntersection=False,  # only stochastic stage
            select_patches_for_sparse_data=True)
        inst, _ = to_instance_seg(affs, fg, fg.copy(),
                                  fg.astype(np.uint8), params)
        res[engine] = relabel(inst)
    np.testing.assert_array_equal(res["numpy"], res["jax"])


def test_return_intermediates_contract():
    labels, affs, fg = _setup_case()
    params = VoteInstancesParams(patchshape=(1, 5, 5), engine="jax",
                                 return_intermediates=True)
    pairs, weights = to_instance_seg(affs, fg, fg.copy(),
                                     fg.astype(np.uint8), params)
    assert pairs is not None and len(pairs) == len(weights)
    assert pairs.shape[1] == 6


def test_empty_volume():
    affs = np.full((25, 1, 20, 20), 0.05, dtype=np.float32)
    fg = np.zeros((1, 20, 20), dtype=bool)
    params = VoteInstancesParams(patchshape=(1, 5, 5))
    inst, fg_out = to_instance_seg(affs, fg, fg.copy(),
                                   fg.astype(np.uint8), params)
    assert inst.sum() == 0


def test_do_all_roundtrip(tmp_path):
    labels, affs, fg = _setup_case()
    import h5py
    pred = tmp_path / "sample.hdf"
    with h5py.File(pred, "w") as f:
        f.create_dataset("volumes/pred_affs", data=affs)
    params = VoteInstancesParams(patchshape=(1, 5, 5),
                                 numinst_key=None, fg_key=None,
                                 result_folder=str(tmp_path))
    out = do_all(str(pred), params)
    with h5py.File(out, "r") as f:
        inst = f["vote_instances"][()]
    assert len(np.unique(inst[inst > 0])) == 2


def test_zarr_io_roundtrip(tmp_path):
    path = str(tmp_path / "test.zarr")
    io = vio.IoZarr(path, mode="w")
    data = np.arange(2 * 8 * 8, dtype=np.float32).reshape(2, 8, 8)
    io.create("volumes/pred", data.shape, data.dtype, chunks=(1, 4, 4))
    io.write(data, key="volumes/pred")
    back = io.read(key="volumes/pred")
    np.testing.assert_array_equal(back, data)
    # windowed
    win = io.read(bb=(slice(0, 1), slice(2, 6), slice(0, 4)),
                  key="volumes/pred")
    np.testing.assert_array_equal(win, data[0:1, 2:6, 0:4])
    assert io.list_keys() == ["volumes/pred"]


def test_load_input_halo_padding(tmp_path):
    path = str(tmp_path / "test.zarr")
    io = vio.IoZarr(path, mode="w")
    data = np.arange(1 * 10 * 10, dtype=np.float32).reshape(1, 10, 10)
    io.create("v", data.shape, data.dtype)
    io.write(data, key="v")
    block = vio.load_input(io, "v", offset=(0, 0), block_shape=(4, 4),
                           context=(2, 2), pad_value=-1)
    assert block.shape == (1, 8, 8)
    assert (block[0, :2, :] == -1).all() and (block[0, :, :2] == -1).all()
    np.testing.assert_array_equal(block[0, 2:, 2:], data[0, :6, :6])


def test_fixture_zarr_readable():
    io = vio.IoZarr("data/JRC_SS05008-20160318_24_B2_crop.zarr")
    assert io.shape("volumes/raw") == (3, 50, 50, 50)
    assert io.shape("volumes/gt_instances") == (3, 50, 50, 50)
    raw = io.read(bb=(slice(0, 3), slice(0, 8), slice(0, 8), slice(0, 8)),
                  key="volumes/raw")
    assert raw.shape == (3, 8, 8, 8)


def test_skeletonize_2d_line_preserved():
    img = np.zeros((1, 15, 15), dtype=bool)
    img[0, 7, 2:13] = True
    sk = skeletonize(img)
    np.testing.assert_array_equal(sk > 0, img)  # already thin


def test_skeletonize_2d_blob_topology():
    img = np.zeros((20, 20), dtype=bool)
    img[4:16, 4:16] = True
    sk = skeletonize(img) > 0
    assert 0 < sk.sum() < img.sum()
    from scipy import ndimage
    lab, n = ndimage.label(sk, structure=np.ones((3, 3)))
    assert n == 1  # connected


def test_skeletonize_3d_tube():
    img = np.zeros((5, 5, 20), dtype=bool)
    img[1:4, 1:4, 2:18] = True
    sk = skeletonize(img) > 0
    assert 0 < sk.sum() <= 20
    from scipy import ndimage
    lab, n = ndimage.label(sk, structure=np.ones((3, 3, 3)))
    assert n == 1
    # roughly spans the tube length
    xs = np.where(sk)[2]
    assert xs.max() - xs.min() >= 12


def test_postprocess_helpers():
    lab = np.zeros((10, 10), dtype=np.uint16)
    lab[0:2, 0:2] = 5   # size 4
    lab[5:9, 5:9] = 9   # size 16
    out = remove_small_components(lab, 10)
    assert set(np.unique(out)) == {0, 9}
    rl = relabel(out)
    assert set(np.unique(rl)) == {0, 1}
    m = clean_mask(lab > 0, 10)
    assert m.sum() == 16


def test_score_oracle_ranking(tmp_path):
    """use_score_oracle (ranked_patches.py:120-136): ranking comes from the
    stored GT patch-IoU volume; with a score_threshold, zero-oracle regions
    are never selected."""
    labels, affs, fg = _setup_case()
    # oracle: instance 1 region scores 1.0, instance 2 region 0.0
    oracle = np.where(labels == 1, 1.0, 0.0).astype(np.float32)[None]

    path = str(tmp_path / "s.zarr")
    io = vio.IoZarr(path, mode="w")
    io.create("volumes/pred_affs", affs.shape, np.float32,
              chunks=affs.shape)
    io.write(affs, key="volumes/pred_affs")
    io.create("volumes/patch_iou", oracle.shape, np.float32,
              chunks=oracle.shape)
    io.write(oracle, key="volumes/patch_iou")
    io.close()

    import h5py

    params = VoteInstancesParams(
        patchshape=(1, 5, 5), engine="jax",
        select_patches_for_sparse_data=True,
        use_score_oracle=True, score_threshold=0.5,
        crop_to_foreground=False)
    out = do_all(path, params, result_folder=str(tmp_path / "out"))
    with h5py.File(out, "r") as f:
        inst = f["vote_instances"][()]
    inst[~fg] = 0
    # only the high-oracle instance is assembled
    assert (inst[labels == 1] > 0).any()
    assert not (inst[labels == 2] > 0).any()

    # without the oracle both instances assemble
    params2 = VoteInstancesParams(
        patchshape=(1, 5, 5), engine="jax",
        select_patches_for_sparse_data=True, crop_to_foreground=False)
    out2 = do_all(path, params2, result_folder=str(tmp_path / "out2"))
    with h5py.File(out2, "r") as f:
        inst2 = f["vote_instances"][()]
    inst2[~fg] = 0
    assert (inst2[labels == 1] > 0).any() and (inst2[labels == 2] > 0).any()


def test_store_intermediates_resume(tmp_path):
    """2-phase npy persistence (aff_patch_graph.py:96-110): pairs/graph
    saved next to the result; a rerun labels from the stored arrays."""
    import os

    import h5py

    labels, affs, fg = _setup_case()
    path = str(tmp_path / "s.zarr")
    io = vio.IoZarr(path, mode="w")
    io.create("volumes/pred_affs", affs.shape, np.float32,
              chunks=affs.shape)
    io.write(affs, key="volumes/pred_affs")
    io.close()

    params = VoteInstancesParams(
        patchshape=(1, 5, 5), engine="jax", removeIntersection=False,
        select_patches_for_sparse_data=True, store_intermediates=True)
    out_dir = str(tmp_path / "out")
    out = do_all(path, params, result_folder=out_dir)
    pp = os.path.join(out_dir, "s_selected_patch_pairs.npy")
    ag = os.path.join(out_dir, "s_aff_graph.npy")
    assert os.path.exists(pp) and os.path.exists(ag)
    with h5py.File(out, "r") as f:
        inst1 = f["vote_instances"][()]

    # resume: rerun labels from the stored intermediates (mtimes untouched)
    os.remove(out)
    m1, m2 = os.path.getmtime(pp), os.path.getmtime(ag)
    out = do_all(path, params, result_folder=out_dir)
    assert os.path.getmtime(pp) == m1 and os.path.getmtime(ag) == m2
    with h5py.File(out, "r") as f:
        inst2 = f["vote_instances"][()]
    np.testing.assert_array_equal(inst1, inst2)


def test_postprocess_instances_and_nrrd(tmp_path):
    import h5py

    from patchperpix_tpu.utils.io import read_nrrd
    from patchperpix_tpu.utils.postprocess import postprocess_instances

    inst = np.zeros((12, 12, 12), np.uint16)
    inst[2:9, 2:9, 2:9] = 1
    inst[10, 10, 10] = 2       # tiny comp -> removed
    p = str(tmp_path / "s.hdf")
    with h5py.File(p, "w") as f:
        f.create_dataset("vote_instances", data=inst)
    postprocess_instances(p, remove_small_comps=5,
                          export_skeleton_nrrds=True,
                          output_folder=str(tmp_path))
    with h5py.File(p, "r") as f:
        cleaned = f["vote_instances_rm_5"][()]
    assert set(np.unique(cleaned)) == {0, 1}
    sk = read_nrrd(str(tmp_path / "s_1.nrrd"))
    assert sk.shape == (12, 12, 12)
    assert sk.sum() > 0


def test_do_all_vote_debug_canvases(tmp_path):
    """vote_debug writes the reference's tiled patch canvas + graph-edge
    canvas (vote_instances.py:270-274, graph_to_labeling.py:118-137) into
    the result hdf, with the same instance map as a non-debug run."""
    labels, affs, fg = _setup_case()
    import h5py
    pred = tmp_path / "sample.hdf"
    with h5py.File(pred, "w") as f:
        f.create_dataset("volumes/pred_affs", data=affs)
    params = VoteInstancesParams(patchshape=(1, 5, 5),
                                 numinst_key=None, fg_key=None,
                                 vote_debug=True,
                                 result_folder=str(tmp_path))
    out = do_all(str(pred), params)
    with h5py.File(out, "r") as f:
        inst = f["vote_instances"][()]
        tiles = f["vote_debug"][()]
        edges = f["vote_debug2"][()]
    assert len(np.unique(inst[inst > 0])) == 2
    H, W = fg.shape[-2:]
    assert tiles.shape == (5 * H, 5 * W)
    assert edges.shape == (5 * H, 5 * W)
    # grid lines painted at tile boundaries
    assert (tiles[::5, :] == 2.0).all()
    # a foreground voxel's tile carries its patch values (some nonzero
    # interior), and at least one graph edge was drawn
    assert tiles[tiles != 2.0].max() > 0
    assert edges.max() > 0


def test_sample_subsampling_cover(tmp_path):
    """params.sample < 1 (get_patch_sets.py:32-54): patch pixels are
    randomly thinned in the cover stages; ideal affinities still
    reconstruct both instances, and selection differs from sample=1."""
    labels, affs, fg = _setup_case()
    base = dict(patchshape=(1, 5, 5), engine="jax",
                select_patches_for_sparse_data=False)
    full, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                              VoteInstancesParams(**base))
    sub, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                             VoteInstancesParams(**base, sample=0.5))
    assert len(np.unique(full[full > 0])) == 2
    assert len(np.unique(sub[sub > 0])) == 2
