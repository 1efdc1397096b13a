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


def _shard_map():
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    return shard_map


def _smap(worker, **kwargs):
    shard_map = _shard_map()
    try:
        return shard_map(worker, check_vma=False, **kwargs)
    except TypeError:  # older jax spelling
        return shard_map(worker, check_rep=False, **kwargs)


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
    fn = _smap(worker, mesh=mesh, in_specs=tuple(in_specs),
               out_specs=(spec_cons, spec_scores))
    return fn(*args)


def sharded_cover_min_scatter(affs, rankvol, mask, interior, n: int,
                              ps: tuple, fc_threshold: float, mesh: Mesh,
                              axis: str = "sp"):
    """z-sharded exact min-rank greedy cover (the pix_th == 0 closed form,
    ops/cover.py:85-140 ``_greedy_cover_min_scatter``).

    The cover's sequential ranked walk collapses, for the sparse-data
    single-threshold cascade, to ``m(x) = min rank over candidates whose
    fg-window contains x`` — a min-reduction over P shifted rank fields.
    Votes into a pixel come from centers within ``rad``, so each shard only
    needs a ``rad``-slice halo of the rank field and affinities
    (vs 3*rad for consensus+rank).  The two cross-shard quantities are
    collectives over the mesh: the rank cutoff ``r_star`` (a pmax of
    per-shard maxima) and the replicated ``selected`` vector (a pmax-OR of
    per-shard scatter results — each pixel is owned by exactly one shard).

    affs: (P, Z, Y, X); rankvol/mask/interior: (Z, Y, X) with
    rankvol int32 (INF background, candidate ranks at centers, overlap
    rows pre-gated to INF by the caller).  Z divisible by the mesh size,
    local slab >= rad.  Returns (selected (n,) bool, running (Z, Y, X))
    identical to the single-device closed form.
    """
    import numpy as _np

    from ..ops.consensus_jax import _shift_nd
    from ..ops.np_reference import patch_offsets

    ndim = len(ps)
    rad = tuple(int(p) // 2 for p in ps)
    halo = rad[0]
    nsh = mesh.shape[axis]
    Z = mask.shape[0]
    assert Z % nsh == 0, f"z extent {Z} not divisible by mesh size {nsh}"
    local = Z // nsh
    assert local >= halo, (
        f"local slab ({local}) must cover the {halo}-slice cover halo")
    INF = jnp.int32(2 ** 30)

    offs = patch_offsets(_np.asarray(ps))
    shifts = jnp.asarray(offs - _np.asarray(rad)[None, :], jnp.int32)
    fc = jnp.float32(fc_threshold)

    def worker(affs_blk, rank_blk, mask_blk, int_blk):
        ext_affs = _halo_exchange(affs_blk, halo, axis, spatial_axis=1)
        # the rank field needs INF (not zero) fill at the global edges:
        # exchange the INF-complement, whose zero-filled edge halos map
        # back to INF
        ext_rank = INF - _halo_exchange(INF - rank_blk, halo, axis,
                                        spatial_axis=0)

        def m_q(q, s):
            gated = jnp.where(ext_affs[q] > fc, ext_rank, INF)
            return INF - _shift_nd(INF - gated, s, tuple(range(ndim)))

        m_ext = jnp.min(jax.vmap(m_q)(jnp.arange(ext_affs.shape[0]),
                                      shifts), axis=0)
        m = m_ext[halo:halo + local]
        m = jnp.where(mask_blk > 0.5, m, INF)

        int_mask = (int_blk > 0.5) & (mask_blk > 0.5)
        r_local = jnp.max(jnp.where(int_mask, m, -1),
                          initial=jnp.int32(-1))
        r_star = jax.lax.pmax(r_local, axis)

        covered = (m <= r_star) & (m < INF)
        running = jnp.where(covered, 0.0, mask_blk)
        idx = jnp.where(covered, m, n)               # trash slot n
        sel_local = jnp.zeros((n + 1,), jnp.int32).at[
            idx.reshape(-1)].set(1)
        selected = jax.lax.pmax(sel_local, axis)     # replicated OR
        return selected, running

    spec_affs = P(None, axis, None, None)
    spec_vol = P(axis, None, None)
    fn = _smap(worker, mesh=mesh,
               in_specs=(spec_affs, spec_vol, spec_vol, spec_vol),
               out_specs=(P(), spec_vol))
    selected, running = fn(affs, rankvol, mask, interior)
    return selected[:n] > 0, running
