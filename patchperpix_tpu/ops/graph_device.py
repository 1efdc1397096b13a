"""On-device connected components over the patch graph.

North-star item: replace the host union-find (np_reference.graph_components,
ref graph_to_labeling.py:46-54 networkx CCs) with an iterative min-label
propagation pass on device for stitched FlyLight-scale graphs.

Semantics: nodes are the patch centers appearing in positive-weight edges;
two nodes share a component iff connected through positive edges.  The
result reproduces the host union-find's component enumeration exactly:
components are ordered by the first appearance of any member node in the
positive edge list, and members within a component keep their first
appearance order (graph_components inserts nodes in edge order and groups
by root in insertion order), so instance ids and paint order match the
numpy engine bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_nodes",))
def _label_propagation(edges: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
    """Min-label propagation to a fixpoint.

    edges: (E, 2) int32 node indices (positive edges only, may contain
    (i, i) self loops as padding).  Returns (n_nodes,) component labels
    (the min node index of the component).
    """
    init = jnp.arange(n_nodes, dtype=jnp.int32)
    e0, e1 = edges[:, 0], edges[:, 1]

    def body(state):
        labels, _changed = state
        l0 = labels[e0]
        l1 = labels[e1]
        m = jnp.minimum(l0, l1)
        new = labels.at[e0].min(m)
        new = new.at[e1].min(m)
        # pointer jumping: label <- label of label (halves tree depth)
        new = jnp.minimum(new, new[new])
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.asarray(True)))
    return labels


def graph_components_device(pairs: np.ndarray, weights: np.ndarray):
    """Connected components of the positive-edge patch graph on device.

    Drop-in for np_reference.graph_components(mws=False): returns a list of
    lists of node tuples in the identical deterministic order.
    """
    ndim = pairs.shape[1] // 2
    pos = np.asarray(weights) > 0
    if not pos.any():
        return []
    pp = np.asarray(pairs)[pos]
    a = pp[:, :ndim]
    b = pp[:, ndim:]
    # node ids in first-appearance order over the positive edge list,
    # a before b within an edge (matches the union-find insertion order)
    flat = np.stack([a, b], axis=1).reshape(-1, ndim)
    coords, first_idx = np.unique(flat, axis=0, return_index=True)
    order = np.argsort(first_idx, kind="stable")
    coords = coords[order]                      # insertion-ordered nodes
    key_of = {tuple(int(x) for x in c): i for i, c in enumerate(coords)}
    e0 = np.array([key_of[tuple(int(x) for x in r)] for r in a], np.int32)
    e1 = np.array([key_of[tuple(int(x) for x in r)] for r in b], np.int32)

    # pad node/edge counts to power-of-2 buckets so jit compiles per
    # bucket, not per sample (padding: isolated nodes + (0,0) self loops)
    n = len(coords)
    n_pad = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 1)
    e = np.stack([e0, e1], axis=1)
    e_pad = 1 << max(int(np.ceil(np.log2(max(len(e), 2)))), 1)
    if e_pad > len(e):
        e = np.concatenate(
            [e, np.zeros((e_pad - len(e), 2), np.int32)], axis=0)
    labels = np.asarray(_label_propagation(
        jnp.asarray(e), n_nodes=n_pad))[:n]

    comps: dict = {}
    for i in range(len(coords)):               # insertion order
        comps.setdefault(int(labels[i]), []).append(
            tuple(int(x) for x in coords[i]))
    return list(comps.values())
