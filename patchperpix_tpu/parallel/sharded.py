"""Spatially-sharded consensus + ranking over a device mesh.

TPU-native replacement for the reference's blockwise CUDA orchestration
(stitch_patch_graph.py: per-block GPU runs with zarr files as mailboxes and
an mp.Lock serializing kernel launches): the volume's z axis is sharded over
the mesh with ``shard_map``; each device exchanges a 3*rad halo of affinity
slices with its neighbors over ICI (``jax.lax.ppermute``) and runs the exact
same consensus/rank program on its extended slab.  Unlike the file-based
halo recompute, results are bit-identical to the whole-volume computation
(centers outside the global volume are masked via ``center_valid``).

Halo width: votes into voxel x come from centers within rad of x, which
read targets within 2*rad; ranking a center c reads consensus up to rad
away, whose votes involve centers up to 2*rad and targets up to 3*rad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.consensus_jax import ConsensusConfig, consensus_array, rank_scores


def make_spatial_mesh(n_devices: int | None = None, axis: str = "sp",
                      backend: str | None = None) -> Mesh:
    if backend is not None:
        devices = jax.local_devices(backend=backend)
    else:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _halo_exchange(block: jnp.ndarray, halo: int, axis_name: str,
                   spatial_axis: int) -> jnp.ndarray:
    """Concatenate ``halo`` slices from the left/right mesh neighbors.

    Edge shards get zero halos (the global volume ends there).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    ndim = block.ndim
    size = block.shape[spatial_axis]

    def take(start, count):
        sl = [slice(None)] * ndim
        sl[spatial_axis] = slice(start, start + count)
        return block[tuple(sl)]

    # my top slices go to my right neighbor (they become its left halo)
    right_perm = [(i, (i + 1) % n) for i in range(n)]
    left_perm = [(i, (i - 1) % n) for i in range(n)]

    from_left = jax.lax.ppermute(take(size - halo, halo), axis_name,
                                 right_perm)
    from_right = jax.lax.ppermute(take(0, halo), axis_name, left_perm)

    zero = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zero, from_left)
    from_right = jnp.where(idx == n - 1, zero, from_right)
    return jnp.concatenate([from_left, block, from_right],
                           axis=spatial_axis)


def sharded_consensus_and_rank(
    affs: jnp.ndarray,
    cfg: ConsensusConfig,
    mesh: Mesh,
    overlap: jnp.ndarray | None = None,
    center_valid: jnp.ndarray | None = None,
    axis: str = "sp",
):
    """Whole-volume-exact consensus + rank, z-sharded over the mesh.

    affs: (P, Z, Y, X) with Z divisible by the mesh size.  Returns
    (consensus (*neigh, Z, Y, X), scores (Z, Y, X)) with the same sharding
    (consensus z axis is the first spatial axis, index ndim of the array).

    ``center_valid`` (global (Z, Y, X) bool) composes an external center
    gate — e.g. blockwise stitching's global-interior mask — with the
    shard-boundary gate: the mask is z-sharded and halo-exchanged like
    the affinities, so a blockwise window can itself run on a mesh.
    """
    ps = cfg.ps
    ndim = len(ps)
    rad = int(cfg.rad[0])
    halo = 3 * rad
    n = mesh.shape[axis]
    Z = affs.shape[1]
    assert Z % n == 0, f"z extent {Z} not divisible by mesh size {n}"
    local = Z // n
    assert local >= halo, (
        f"local slab ({local} z-slices) must cover the {halo}-slice halo; "
        f"use fewer devices or a larger volume")

    has_overlap = overlap is not None
    has_cv = center_valid is not None

    def worker(affs_blk, *masks):
        # affs_blk: (P, local, Y, X)
        ext = _halo_exchange(affs_blk, halo, axis, spatial_axis=1)
        # overlap/center_valid halos only when the masks exist (a dummy
        # exchange would cost a full-volume transfer + 2 ppermutes each)
        mi = iter(masks)
        ov_ext = None
        if has_overlap:
            ov_ext = _halo_exchange(next(mi).astype(jnp.float32), halo,
                                    axis, spatial_axis=0) > 0.5

        # center validity in GLOBAL coordinates: global interior gating is
        # already handled by zero halos at the edge shards; halo centers
        # from neighbors are valid (they are interior globally whenever
        # their own fg/interior tests pass on the extended block)
        idxv = jax.lax.axis_index(axis)
        zpos = jnp.arange(ext.shape[1]) - halo + idxv * local
        valid_z = (zpos >= rad) & (zpos < Z - rad)
        cv = jnp.broadcast_to(valid_z[:, None, None], ext.shape[1:])
        if has_cv:
            # compose the external gate (blockwise global-interior mask)
            cv = cv & (_halo_exchange(next(mi).astype(jnp.float32), halo,
                                      axis, spatial_axis=0) > 0.5)

        cons_ext = consensus_array(ext, cfg, overlap=ov_ext,
                                   center_valid=cv)
        scores_ext = rank_scores(ext, cons_ext, cfg, overlap=ov_ext,
                                 center_valid=cv)
        # crop the halo back off (z is axis ndim of cons, axis 0 of scores)
        sl = [slice(None)] * cons_ext.ndim
        sl[ndim] = slice(halo, halo + local)
        cons_loc = cons_ext[tuple(sl)]
        scores_loc = scores_ext[halo:halo + local]
        return cons_loc, scores_loc

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec_affs = P(None, axis, None, None)
    spec_mask = P(axis, None, None)
    spec_cons = P(*([None] * ndim), axis, None, None)
    spec_scores = P(axis, None, None)

    args = [affs]
    in_specs = [spec_affs]
    if has_overlap:
        args.append(overlap)
        in_specs.append(spec_mask)
    if has_cv:
        args.append(center_valid)
        in_specs.append(spec_mask)
    kwargs = dict(mesh=mesh, in_specs=tuple(in_specs),
                  out_specs=(spec_cons, spec_scores))
    try:
        fn = shard_map(worker, check_vma=False, **kwargs)
    except TypeError:  # older jax spelling
        fn = shard_map(worker, check_rep=False, **kwargs)
    return fn(*args)
