"""ELL (padded incidence-list) graph layout — the TPU sparse format.

For bounded-degree graphs (grid graphs: deg <= 9, k-NN: deg = k, VR
refinement batches: deg <= 9) edges are stored destination-major as
[N, max_deg] source indices + mask. Message passing becomes gather-only:
no scatter at all — segment softmax collapses to a masked softmax over the
degree axis, and aggregation is a weighted sum over k gathered rows. XLA
lowers this to pure gathers + dense reductions, which TPUs run much
faster than scatter-adds (v5e, k=8 k-NN: ~29M edges/s ELL vs ~7M COO;
see benchmarks/RESULTS.md).

This is the layout behind BASELINE.json's "padded CSR/COO ... static
edge-count bucketing": CSR-by-destination with rows padded to max_deg.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graph import PaddedGraph


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EllGraph:
    """Destination-major padded incidence list.

    Attributes:
      x:         [N, F] node features.
      nbr_src:   [N, K] int32 source node of each incoming edge (0 if pad).
      nbr_mask:  [N, K] bool live-edge mask.
      edge_attr: [N, K, Fe] per-incoming-edge features.
      node_mask: [N] bool.
      pos, local_std, graph_id: as in PaddedGraph.
    """

    x: jax.Array
    nbr_src: jax.Array
    nbr_mask: jax.Array
    edge_attr: jax.Array
    node_mask: jax.Array
    pos: jax.Array
    local_std: jax.Array
    graph_id: jax.Array

    @property
    def num_nodes_padded(self) -> int:
        return self.x.shape[0]

    @property
    def max_degree(self) -> int:
        return self.nbr_src.shape[1]

    def num_edges(self) -> jax.Array:
        return jnp.sum(self.nbr_mask.astype(jnp.int32))


def coo_to_ell(g: PaddedGraph, max_degree: Optional[int] = None) -> EllGraph:
    """Host-side conversion from dst-sorted COO to ELL."""
    src = np.asarray(g.edge_src)
    dst = np.asarray(g.edge_dst)
    mask = np.asarray(g.edge_mask)
    attr = np.asarray(g.edge_attr)
    n = g.num_nodes_padded
    fe = attr.shape[1]

    live_src = src[mask]
    live_dst = dst[mask]
    live_attr = attr[mask]
    deg = np.bincount(live_dst, minlength=n)
    k = int(max_degree if max_degree is not None else (deg.max() if deg.size else 1))
    k = max(k, 1)
    if deg.size and deg.max() > k:
        raise ValueError(f"max degree {deg.max()} exceeds ELL width {k}")

    nbr_src = np.zeros((n, k), np.int32)
    nbr_mask = np.zeros((n, k), bool)
    eattr = np.zeros((n, k, fe), np.float32)
    # dst-sorted: edges of each dst are contiguous; slot = position in run
    slot = np.arange(len(live_dst)) - np.concatenate(
        [[0], np.cumsum(deg)])[live_dst]
    nbr_src[live_dst, slot] = live_src
    nbr_mask[live_dst, slot] = True
    eattr[live_dst, slot] = live_attr

    return EllGraph(
        x=g.x,
        nbr_src=jnp.asarray(nbr_src),
        nbr_mask=jnp.asarray(nbr_mask),
        edge_attr=jnp.asarray(eattr),
        node_mask=g.node_mask,
        pos=g.pos,
        local_std=g.local_std,
        graph_id=g.graph_id,
    )


def ell_gather(x: jax.Array, nbr_src: jax.Array) -> jax.Array:
    """[N, F] gathered at [N, K] -> [N, K, F]."""
    return jnp.take(x, nbr_src, axis=0)


def ell_masked_softmax(
    logits: jax.Array,      # [N, K, ...] per-incoming-edge logits
    mask: jax.Array,        # [N, K]
    self_logits: Optional[jax.Array] = None,  # [N, ...]
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Masked softmax over the degree axis, optionally joined by a per-node
    self term (GAT's injected self-loop)."""
    neg = jnp.float32(-1e30)
    ml = jnp.where(_b(mask, logits), logits, neg)
    m = jnp.max(ml, axis=1)
    if self_logits is not None:
        m = jnp.maximum(m, self_logits)
    e = jnp.exp(ml - m[:, None])
    e = jnp.where(_b(mask, e), e, 0.0)
    denom = jnp.sum(e, axis=1)
    e_self = None
    if self_logits is not None:
        e_self = jnp.exp(self_logits - m)
        denom = denom + e_self
    denom = jnp.maximum(denom, 1e-16)
    w = e / denom[:, None]
    w_self = e_self / denom if e_self is not None else None
    return w, w_self


def _b(mask: jax.Array, like: jax.Array) -> jax.Array:
    return mask.reshape(mask.shape + (1,) * (like.ndim - mask.ndim))
