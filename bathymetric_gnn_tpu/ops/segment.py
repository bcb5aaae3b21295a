"""Masked segment reductions — the XLA reference path for message passing.

These implement the sparse gather/scatter primitives that the reference gets
from PyTorch Geometric's CUDA kernels (reference: models/gnn.py:120-143 uses
GATConv/GCNConv/SAGEConv/GINConv whose internals are scatter/segment-softmax).
On TPU they lower to XLA ``segment_sum``-style reductions over dst-sorted
edges; the Pallas kernels in ``ops/pallas`` swap in behind the same API for
the hot path.

All functions take an ``edge_mask`` so padded edges contribute exactly zero.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x[idx] — per-edge gather of node data. idx: [E], x: [N, ...]."""
    return jnp.take(x, idx, axis=0)


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked scatter-add of per-edge data into per-node slots."""
    if edge_mask is not None:
        data = data * _bmask(edge_mask, data)
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked mean over incoming edges; segments with no edges get zero."""
    s = segment_sum(data, segment_ids, num_segments, edge_mask)
    ones = jnp.ones(data.shape[0], dtype=data.dtype)
    if edge_mask is not None:
        ones = ones * edge_mask.astype(data.dtype)
    cnt = jax.ops.segment_sum(
        ones, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )
    cnt = jnp.maximum(cnt, 1.0)
    return s / _expand(cnt, s)


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    edge_mask: Optional[jax.Array] = None,
    fill: float = -jnp.inf,
) -> jax.Array:
    """Masked max over incoming edges; empty segments get ``fill``."""
    if edge_mask is not None:
        data = jnp.where(_bmask(edge_mask, data) > 0, data, fill)
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    edge_mask: Optional[jax.Array] = None,
    self_logits: Optional[jax.Array] = None,
):
    """Numerically-stable softmax over incoming edges per destination node.

    This is the segment softmax inside PyG's GATConv (its injected self-loop
    — reference quirk Q3, SURVEY §2.5 — is handled here without materializing
    extra edges: pass ``self_logits`` [N, ...] and each node's own logit joins
    its softmax group).

    Returns (edge_weights, self_weights) where self_weights is None when
    self_logits is None.
    """
    m = segment_max(logits, segment_ids, num_segments, edge_mask)
    if self_logits is not None:
        m = jnp.maximum(m, self_logits)
    # Empty segments: m = -inf; make the gathered max finite so exp(x - m)
    # doesn't produce NaN on padded edges (they're masked to 0 anyway).
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(logits - jnp.take(m_safe, segment_ids, axis=0))
    if edge_mask is not None:
        e = e * _bmask(edge_mask, e)
    denom = jax.ops.segment_sum(
        e, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )
    e_self = None
    if self_logits is not None:
        e_self = jnp.exp(self_logits - m_safe)
        denom = denom + e_self
    denom = jnp.maximum(denom, 1e-16)
    w = e / jnp.take(denom, segment_ids, axis=0)
    w_self = e_self / denom if e_self is not None else None
    return w, w_self


def _bmask(mask: jax.Array, like: jax.Array) -> jax.Array:
    """Broadcast a [E] mask against [E, ...] data."""
    m = mask.astype(like.dtype)
    return m.reshape(m.shape + (1,) * (like.ndim - 1))


def _expand(v: jax.Array, like: jax.Array) -> jax.Array:
    return v.reshape(v.shape + (1,) * (like.ndim - 1))
