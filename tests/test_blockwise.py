"""Blockwise assembly: whole-vs-blockwise label equivalence (SURVEY.md §4:
'run blockwise on a small volume and assert label-equivalence (up to
relabeling) against the whole-volume path')."""

import numpy as np
import pytest

from patchperpix_tpu.assembly import VoteInstancesParams, to_instance_seg
from patchperpix_tpu.assembly.blockwise import (blockwise_vote_instances,
                                                get_offsets)
from patchperpix_tpu.ops import synthetic
from patchperpix_tpu.utils.postprocess import relabel


def test_get_offsets_grid():
    offs = get_offsets((10, 20, 5), (8, 8, 8))
    offs = np.array(offs)
    assert offs.shape == (2 * 3 * 1, 3)
    assert (offs[0] == [0, 0, 0]).all()
    assert offs.max(axis=0).tolist() == [8, 16, 0]


def _case_3d():
    labels = np.zeros((20, 28, 28), dtype=np.int32)
    labels[4:10, 4:12, 4:12] = 1
    labels[10:16, 14:24, 14:24] = 2
    labels[4:9, 16:24, 4:10] = 3
    ps = np.array([3, 3, 3])
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[13] > 0.5
    return labels, affs, fg


def test_blockwise_matches_whole_volume():
    labels, affs, fg = _case_3d()
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False)
    whole, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                               params)
    whole[~fg] = 0

    block, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8), params, chunksize=(14, 14, 14))
    block[~fg] = 0

    assert len(np.unique(whole[whole > 0])) == 3
    assert len(np.unique(block[block > 0])) == 3
    # label equivalence up to relabeling: matching partition of fg voxels
    wl, bl = relabel(whole), relabel(block)
    pairs = set(zip(wl[fg].tolist(), bl[fg].tolist()))
    assert len(pairs) == 3  # bijection between label sets


def test_blockwise_single_block_equals_whole():
    labels, affs, fg = _case_3d()
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False)
    whole, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                               params)
    block, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8), params, chunksize=(64, 64, 64))
    whole[~fg] = 0
    block[~fg] = 0
    pairs = set(zip(relabel(whole)[fg].tolist(), relabel(block)[fg].tolist()))
    assert len(pairs) == len(np.unique(whole[whole > 0]))


def test_blockwise_resume_dict():
    labels, affs, fg = _case_3d()
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False)
    cache: dict = {}
    b1, _ = blockwise_vote_instances(affs, fg, fg.astype(np.uint8), params,
                                     chunksize=(14, 14, 14),
                                     block_results=cache)
    assert len(cache) > 0
    # resume with the filled cache: no recompute, same result
    b2, _ = blockwise_vote_instances(affs, fg, fg.astype(np.uint8), params,
                                     chunksize=(14, 14, 14),
                                     block_results=dict(cache))
    np.testing.assert_array_equal(b1, b2)


def test_blockwise_empty_volume():
    affs = np.full((27, 10, 10, 10), 0.05, dtype=np.float32)
    fg = np.zeros((10, 10, 10), dtype=bool)
    params = VoteInstancesParams(patchshape=(3, 3, 3))
    inst, _ = blockwise_vote_instances(affs, fg, fg.astype(np.uint8),
                                       params, chunksize=(8, 8, 8))
    assert inst.sum() == 0


def _write_pred_zarr(tmp_path, affs, name="sample.zarr"):
    from patchperpix_tpu.utils import io as vio

    path = str(tmp_path / name)
    io = vio.IoZarr(path, mode="w")
    io.create("volumes/pred_affs", affs.shape, np.float16,
              chunks=(affs.shape[0], 8, 8, 8))
    io.write(affs.astype(np.float16), key="volumes/pred_affs")
    io.close()
    return path


def test_blockwise_zarr_out_of_core(tmp_path):
    """Out-of-core path streams from the store and matches the in-memory
    blockwise result; per-block npz persist and enable resume."""
    import os

    from patchperpix_tpu.assembly.blockwise import (
        blockwise_vote_instances_zarr)

    labels, affs, fg = _case_3d()
    affs16 = affs.astype(np.float16).astype(np.float32)
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False)
    mem, _ = blockwise_vote_instances(affs16, fg, fg.astype(np.uint8),
                                      params, chunksize=(14, 14, 14))
    path = _write_pred_zarr(tmp_path, affs)
    ooc, fg_out = blockwise_vote_instances_zarr(
        params=params, aff_file=path, chunksize=(14, 14, 14),
        result_folder=str(tmp_path))
    mem[~fg] = 0
    ooc[~fg_out.astype(bool)] = 0
    wl, bl = relabel(mem), relabel(ooc)
    pairs = set(zip(wl[wl > 0].tolist(), bl[wl > 0].tolist()))
    assert len(pairs) == 3

    # per-block files persisted (store dir carries a params fingerprint
    # so resume never mixes configs)
    import glob as _glob

    stores = _glob.glob(str(tmp_path / "sample_blocks*"))
    assert len(stores) == 1
    store = stores[0]
    files = sorted(os.listdir(store))
    assert files and all(f.endswith(".npz") for f in files)

    # resume: delete one block file, rerun -> same labels, others untouched
    mtimes = {f: os.path.getmtime(os.path.join(store, f)) for f in files}
    os.remove(os.path.join(store, files[0]))
    ooc2, _ = blockwise_vote_instances_zarr(
        params=params, aff_file=path, chunksize=(14, 14, 14),
        result_folder=str(tmp_path))
    np.testing.assert_array_equal(relabel(ooc), relabel(ooc2))
    for f in files[1:]:
        assert os.path.getmtime(os.path.join(store, f)) == mtimes[f]


def test_blockwise_parallel_blocks_equal_serial(tmp_path):
    labels, affs, fg = _case_3d()
    params_ser = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                     removeIntersection=False,
                                     num_parallel_blocks=1)
    params_par = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                     removeIntersection=False,
                                     num_parallel_blocks=4)
    a, _ = blockwise_vote_instances(affs, fg, fg.astype(np.uint8),
                                    params_ser, chunksize=(14, 14, 14))
    b, _ = blockwise_vote_instances(affs, fg, fg.astype(np.uint8),
                                    params_par, chunksize=(14, 14, 14))
    np.testing.assert_array_equal(relabel(a), relabel(b))


def test_do_all_routes_blockwise(tmp_path):
    """CLI-level contract: params.blockwise=True streams through the
    out-of-core blockwise path (ADVICE r1: was silently ignored)."""
    import h5py

    from patchperpix_tpu.assembly import do_all

    labels, affs, fg = _case_3d()
    path = _write_pred_zarr(tmp_path, affs)
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False, blockwise=True,
                                 chunksize=(14, 14, 14))
    out = do_all(path, params, result_folder=str(tmp_path / "out"))
    with h5py.File(out, "r") as f:
        inst = f["vote_instances"][()]
    assert len(np.unique(inst[inst > 0])) == 3


def test_blockwise_matches_whole_volume_border_fg():
    """fg touching the global volume border: block windows zero-pad past
    the edge, so without the center_valid gate border centers were treated
    as interior (selected/voted) and block output diverged from the
    whole-volume path."""
    labels = np.zeros((16, 20, 20), dtype=np.int32)
    labels[0:6, 0:8, 0:8] = 1        # touches z=0 / y=0 / x=0 borders
    labels[10:16, 12:20, 12:20] = 2  # touches the far borders
    ps = np.array([3, 3, 3])
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[13] > 0.5
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False)
    whole, _ = to_instance_seg(affs, fg, fg.copy(), fg.astype(np.uint8),
                               params)
    whole[~fg] = 0
    block, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8), params, chunksize=(10, 10, 10))
    block[~fg] = 0
    assert len(np.unique(whole[whole > 0])) == 2
    assert len(np.unique(block[block > 0])) == 2
    # instance-level bijection where both paths painted; at the border
    # the per-block greedy cover may legitimately pick different patches
    # than the global ranked order (it covers MORE shell fg, never less),
    # so voxel-exact partition equality is not required there
    wl, bl = relabel(whole), relabel(block)
    both = (wl > 0) & (bl > 0)
    pairs = set(zip(wl[both].tolist(), bl[both].tolist()))
    assert len(pairs) == 2
    # block coverage must be a superset of the whole-volume coverage
    assert not ((wl > 0) & (bl == 0)).any()


def test_blockwise_block_devices_distributes_and_matches():
    """block_devices=-1 distributes blocks over the 8-virtual-device mesh
    (each worker thread pins a device via jax.default_device) and the
    stitched output is unchanged (SURVEY §2.6 spatial-block row)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    labels, affs, fg = _case_3d()
    params = VoteInstancesParams(patchshape=(3, 3, 3), engine="jax",
                                 removeIntersection=False)
    ref_out, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8), params, chunksize=(14, 14, 14))
    ref_out[~fg] = 0

    used = []
    real_default_device = jax.default_device

    class _Recorder:
        def __call__(self, dev):
            used.append(dev)
            return real_default_device(dev)

    jax.default_device = _Recorder()
    try:
        params_md = VoteInstancesParams(
            patchshape=(3, 3, 3), engine="jax", removeIntersection=False,
            block_devices=-1)
        out, _ = blockwise_vote_instances(
            affs, fg, fg.astype(np.uint8), params_md,
            chunksize=(14, 14, 14))
    finally:
        jax.default_device = real_default_device
    out[~fg] = 0

    assert len({str(d) for d in used}) > 1  # blocks spread over devices
    wl, bl = relabel(ref_out), relabel(out)
    pairs = set(zip(wl[fg].tolist(), bl[fg].tolist()))
    assert len(pairs) == len(np.unique(wl[fg]))


@pytest.mark.slow
def test_blockwise_block_devices_full_assembly_120(tmp_path):
    """Full blockwise assembly at 120^3 with blocks distributed over the
    8-virtual-device mesh (VERDICT r4 item 7): the multi-device run must
    produce the same instance partition as the single-device blockwise
    run at out-of-core scale.  Canonical block shapes mean ONE compiled
    program serves all 27 blocks on every device."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")

    rng = np.random.RandomState(7)
    labels = np.zeros((120, 120, 120), dtype=np.int32)
    # ~10 well-separated solid blobs spanning block boundaries
    grid = [(z, y, x) for z in (20, 60, 100) for y in (25, 85)
            for x in (30, 90)]
    for i, c in enumerate(grid[:10]):
        jit = rng.randint(-6, 7, size=3)
        z, y, x = (int(np.clip(a + b, 10, 109)) for a, b in zip(c, jit))
        r = int(rng.randint(6, 10))
        zz, yy, xx = np.ogrid[:120, :120, :120]
        ball = ((zz - z) ** 2 + (yy - y) ** 2 + (xx - x) ** 2) <= r * r
        labels[ball] = i + 1

    ps = np.array([3, 3, 3])
    affs = synthetic.labels_to_affinities(labels, ps)
    fg = affs[13] > 0.5
    base = dict(patchshape=(3, 3, 3), engine="jax",
                removeIntersection=False)

    ref_out, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8), VoteInstancesParams(**base),
        chunksize=(40, 40, 40))
    ref_out[~fg] = 0

    out, _ = blockwise_vote_instances(
        affs, fg, fg.astype(np.uint8),
        VoteInstancesParams(block_devices=-1, **base),
        chunksize=(40, 40, 40))
    out[~fg] = 0

    n_inst = len(np.unique(labels)) - 1
    wl, bl = relabel(ref_out), relabel(out)
    assert len(np.unique(wl[wl > 0])) == n_inst
    # instance-level bijection between the two runs
    pairs = set(zip(wl[fg].tolist(), bl[fg].tolist()))
    assert len(pairs) == n_inst
    assert len({b for _, b in pairs}) == n_inst
