"""Static-shape graph containers for XLA.

TPU-first re-design of the reference's PyG ``Data`` usage
(reference: data/graph_construction.py:91-174). Everything is padded to
bucketed sizes so each (node-bucket, edge-bucket) pair compiles exactly once;
validity masks mark live nodes/edges. Edges are stored COO sorted by
destination so destination-segment reductions (softmax, sums) are
cache-friendly on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def round_up_to_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (last bucket if n exceeds all)."""
    for b in buckets:
        if n <= b:
            return int(b)
    raise ValueError(f"size {n} exceeds largest bucket {buckets[-1]}")


def round_up_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PaddedGraph:
    """A batch of graph data padded to static shapes.

    Attributes:
      x:          [N_pad, F]  node features (padding rows are zero).
      edge_src:   [E_pad]     int32 source node index per edge (0 for pads).
      edge_dst:   [E_pad]     int32 destination node index, sorted ascending.
      edge_attr:  [E_pad, Fe] edge features (zero for pads).
      node_mask:  [N_pad]     bool, True for live nodes.
      edge_mask:  [E_pad]     bool, True for live edges.
      pos:        [N_pad, 2]  (col, row) grid position per node.
      local_std:  [N_pad]     per-node local std (correction normalizer,
                              reference: data/graph_construction.py:157-167).
      graph_id:   [N_pad]     int32 graph index per node (for batched graphs,
                              the analogue of PyG Batch.batch —
                              reference: scripts/inference_native.py:312-341).
    """

    x: jax.Array
    edge_src: jax.Array
    edge_dst: jax.Array
    edge_attr: jax.Array
    node_mask: jax.Array
    edge_mask: jax.Array
    pos: jax.Array
    local_std: jax.Array
    graph_id: jax.Array

    @property
    def num_nodes_padded(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.edge_src.shape[0]

    @property
    def num_node_features(self) -> int:
        return self.x.shape[1]

    @property
    def num_edge_features(self) -> int:
        return self.edge_attr.shape[1]

    def num_nodes(self) -> jax.Array:
        return jnp.sum(self.node_mask.astype(jnp.int32))

    def num_edges(self) -> jax.Array:
        return jnp.sum(self.edge_mask.astype(jnp.int32))


def make_padded_graph(
    x: np.ndarray,
    edge_index: np.ndarray,
    edge_attr: Optional[np.ndarray],
    *,
    n_pad: int,
    e_pad: int,
    pos: Optional[np.ndarray] = None,
    local_std: Optional[np.ndarray] = None,
    graph_id: Optional[np.ndarray] = None,
    sort_by_dst: bool = True,
) -> PaddedGraph:
    """Pack host-side arrays into a PaddedGraph.

    Args:
      x: [N, F] node features.
      edge_index: [2, E] (src, dst) int array.
      edge_attr: [E, Fe] edge features or None.
      n_pad/e_pad: static padded sizes (N <= n_pad, E <= e_pad).
    """
    n = x.shape[0]
    e = edge_index.shape[1] if edge_index.size else 0
    if n > n_pad:
        raise ValueError(f"{n} nodes > n_pad {n_pad}")
    if e > e_pad:
        raise ValueError(f"{e} edges > e_pad {e_pad}")
    f = x.shape[1]
    fe = edge_attr.shape[1] if edge_attr is not None and edge_attr.size else (
        edge_attr.shape[1] if edge_attr is not None and edge_attr.ndim == 2 else 0
    )
    if edge_attr is None:
        fe = 0
        edge_attr = np.zeros((e, 0), dtype=np.float32)

    src = edge_index[0].astype(np.int32)
    dst = edge_index[1].astype(np.int32)
    if sort_by_dst and e > 0:
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        edge_attr = edge_attr[order]

    def pad2(a: np.ndarray, rows: int) -> np.ndarray:
        out = np.zeros((rows,) + a.shape[1:], dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    x_p = pad2(np.asarray(x, np.float32), n_pad)
    node_mask = np.zeros(n_pad, bool)
    node_mask[:n] = True
    edge_mask = np.zeros(e_pad, bool)
    edge_mask[:e] = True

    # Padded edges target the last node slot so dst stays non-decreasing
    # (segment ops use indices_are_sorted=True); contributions are masked.
    dst_pad = np.full(e_pad, n_pad - 1, np.int32)
    dst_pad[:e] = dst
    src_pad = np.zeros(e_pad, np.int32)
    src_pad[:e] = src

    pos_p = pad2(np.asarray(pos, np.float32), n_pad) if pos is not None else np.zeros(
        (n_pad, 2), np.float32
    )
    std_p = pad2(np.asarray(local_std, np.float32), n_pad) if local_std is not None else (
        np.zeros(n_pad, np.float32)
    )
    gid_p = pad2(np.asarray(graph_id, np.int32), n_pad) if graph_id is not None else (
        np.zeros(n_pad, np.int32)
    )

    return PaddedGraph(
        x=jnp.asarray(x_p),
        edge_src=jnp.asarray(src_pad),
        edge_dst=jnp.asarray(dst_pad),
        edge_attr=jnp.asarray(pad2(np.asarray(edge_attr, np.float32), e_pad)),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        pos=jnp.asarray(pos_p),
        local_std=jnp.asarray(std_p),
        graph_id=jnp.asarray(gid_p),
    )


def batch_graphs(
    graphs: Sequence[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]],
    *,
    n_pad: int,
    e_pad: int,
    pos_list: Optional[Sequence[np.ndarray]] = None,
    local_std_list: Optional[Sequence[np.ndarray]] = None,
) -> Tuple[PaddedGraph, np.ndarray]:
    """Concatenate many small graphs into one PaddedGraph.

    The TPU-native analogue of PyG ``Batch.from_data_list``
    (reference: scripts/inference_native.py:281-342): node indices are offset,
    graph_id records the owning graph per node so outputs can be un-batched.

    Returns (padded_graph, node_counts) where node_counts[i] is graph i's
    node count (host-side, for un-batching).
    """
    xs, srcs, dsts, attrs, gids = [], [], [], [], []
    poss, stds = [], []
    offset = 0
    counts = []
    for gi, (x, edge_index, edge_attr) in enumerate(graphs):
        n = x.shape[0]
        counts.append(n)
        xs.append(np.asarray(x, np.float32))
        if edge_index.size:
            srcs.append(edge_index[0].astype(np.int64) + offset)
            dsts.append(edge_index[1].astype(np.int64) + offset)
        if edge_attr is not None and edge_attr.size:
            attrs.append(np.asarray(edge_attr, np.float32))
        gids.append(np.full(n, gi, np.int32))
        if pos_list is not None:
            poss.append(np.asarray(pos_list[gi], np.float32))
        if local_std_list is not None:
            stds.append(np.asarray(local_std_list[gi], np.float32))
        offset += n

    x = np.concatenate(xs, 0) if xs else np.zeros((0, 1), np.float32)
    if srcs:
        edge_index = np.stack([np.concatenate(srcs), np.concatenate(dsts)], 0)
    else:
        edge_index = np.zeros((2, 0), np.int64)
    edge_attr = np.concatenate(attrs, 0) if attrs else None
    g = make_padded_graph(
        x,
        edge_index,
        edge_attr,
        n_pad=n_pad,
        e_pad=e_pad,
        pos=np.concatenate(poss, 0) if poss else None,
        local_std=np.concatenate(stds, 0) if stds else None,
        graph_id=np.concatenate(gids) if gids else None,
    )
    return g, np.asarray(counts, np.int64)


def merge_stacked(batched: PaddedGraph) -> PaddedGraph:
    """Flatten a stacked [B, ...] PaddedGraph into one big graph on device.

    The TPU-native analogue of PyG Batch semantics for a leading batch dim:
    node arrays reshape to [B*N_pad, ...], edge indices get per-graph
    offsets of i*N_pad. Because padded edges within each graph target slot
    N_pad-1, the merged dst array remains globally non-decreasing, so
    sorted-segment reductions stay valid. BatchNorm then sees the whole
    batch's live nodes — matching the reference's batched-graph statistics
    (reference: training/trainer.py:485-501 + PyG BatchNorm).
    """
    b, n_pad = batched.node_mask.shape
    e_pad = batched.edge_mask.shape[1]
    offsets = (jnp.arange(b, dtype=jnp.int32) * n_pad)[:, None]

    def flat(a):
        return a.reshape((-1,) + a.shape[2:])

    return PaddedGraph(
        x=flat(batched.x),
        edge_src=flat(batched.edge_src + offsets),
        edge_dst=flat(batched.edge_dst + offsets),
        edge_attr=flat(batched.edge_attr),
        node_mask=flat(batched.node_mask),
        edge_mask=flat(batched.edge_mask),
        pos=flat(batched.pos),
        local_std=flat(batched.local_std),
        graph_id=flat(jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None],
                                       (b, n_pad))),
    )


def csr_row_offsets(edge_dst: np.ndarray, num_nodes: int) -> np.ndarray:
    """Row offsets per destination for dst-sorted edges (CSR by destination)."""
    counts = np.bincount(edge_dst, minlength=num_nodes)
    return np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
