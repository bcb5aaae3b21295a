"""Grid <-> graph conversion facade.

TPU-native equivalent of the reference's GraphBuilder
(reference: data/graph_construction.py:29-505): featurization and edge
enumeration run on device (jit) via ``ops.features``/``ops.edges``; this
module handles bucketing, host marshalling, and the inverse scatter
(graph_to_grid).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.config import BucketConfig, GraphConfig
from ..ops import edges as edge_ops
from ..ops import features as feat_ops
from ..ops.graph import PaddedGraph, round_up_to_bucket


@partial(jax.jit, static_argnames=("resolution", "connectivity", "include_self_loops",
                                   "n_pad", "e_pad", "stats_window", "with_uncertainty"))
def _build_graph_device(
    depth: jax.Array,
    valid_mask: jax.Array,
    uncertainty: Optional[jax.Array],
    *,
    resolution: Tuple[float, float],
    connectivity: int,
    include_self_loops: bool,
    n_pad: int,
    e_pad: int,
    stats_window: int,
    with_uncertainty: bool,
):
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    gf = feat_ops.compute_grid_features(
        depth,
        valid_mask,
        uncertainty if with_uncertainty else None,
        stats_window,
    )
    rows, cols, node_valid = edge_ops.enumerate_nodes(valid_mask, n_pad)
    depth_c = jnp.where(valid_mask, depth, 0.0)
    depth_filled = jnp.where(valid_mask, depth_c, gf.local_mean)
    src, dst, attr, mask = edge_ops.enumerate_edges_coo(
        valid_mask, rows, cols, node_valid, depth_filled, resolution,
        connectivity, include_self_loops,
    )
    src, dst, attr, emask = edge_ops.compact_edges(src, dst, attr, mask, e_pad, n_pad)

    x = gf.features[rows, cols]
    x = jnp.where(node_valid[:, None], x, 0.0)
    local_std = jnp.where(node_valid, gf.local_std[rows, cols], 0.0)
    pos = jnp.stack([cols.astype(jnp.float32), rows.astype(jnp.float32)], -1)

    return PaddedGraph(
        x=x,
        edge_src=src,
        edge_dst=dst,
        edge_attr=attr,
        node_mask=node_valid,
        edge_mask=emask,
        pos=pos,
        local_std=local_std,
        graph_id=jnp.zeros(n_pad, jnp.int32),
    ), rows, cols


class GraphBuilder:
    """Builds PaddedGraphs from gridded depth data (device-side compute)."""

    def __init__(
        self,
        graph_config: Optional[GraphConfig] = None,
        bucket_config: Optional[BucketConfig] = None,
    ):
        self.cfg = graph_config or GraphConfig()
        self.buckets = bucket_config or BucketConfig()

    def pad_sizes(self, num_valid: int) -> Tuple[int, int]:
        n_pad = round_up_to_bucket(max(num_valid, 1), self.buckets.node_buckets)
        k = self.cfg.connectivity + (1 if self.cfg.include_self_loops else 0)
        e_pad = n_pad * k
        return n_pad, e_pad

    def build_graph(
        self,
        depth: np.ndarray,
        valid_mask: Optional[np.ndarray] = None,
        uncertainty: Optional[np.ndarray] = None,
        resolution: Tuple[float, float] = (1.0, 1.0),
    ) -> "BuiltGraph":
        """Grid -> PaddedGraph. Mirrors GraphBuilder.build_graph
        (reference: data/graph_construction.py:91-174). With knn_k > 0
        the grid featurization is kept but edges come from a k-NN build
        over the valid-cell coordinates (BASELINE k=8 configs) instead of
        grid connectivity."""
        if valid_mask is None:
            valid_mask = np.isfinite(depth)
        if self.cfg.knn_k > 0:
            return self._build_knn_from_grid(depth, valid_mask, uncertainty,
                                             resolution)
        num_valid = int(valid_mask.sum())
        n_pad, e_pad = self.pad_sizes(num_valid)
        with_unc = uncertainty is not None
        g, rows, cols = _build_graph_device(
            jnp.asarray(depth, jnp.float32),
            jnp.asarray(valid_mask, bool),
            jnp.asarray(uncertainty, jnp.float32) if with_unc else None,
            resolution=(float(resolution[0]), float(resolution[1])),
            connectivity=self.cfg.connectivity,
            include_self_loops=self.cfg.include_self_loops,
            n_pad=n_pad,
            e_pad=e_pad,
            stats_window=self.cfg.local_stats_window,
            with_uncertainty=with_unc,
        )
        return BuiltGraph(g, grid_shape=depth.shape, num_nodes=num_valid,
                          rows=np.asarray(rows), cols=np.asarray(cols))

    def _build_knn_from_grid(self, depth, valid_mask, uncertainty,
                             resolution) -> "BuiltGraph":
        """Grid featurization (device) + k-NN edges over valid cells.

        Node features are IDENTICAL to the grid path (masked local stats,
        gradients, curvature — SURVEY Q6); only the incidence structure
        changes. Nodes are Hilbert-ordered by build_knn_graph so the
        banded-ELL kernel applies; rows/cols carry the permutation so
        graph_to_grid still scatters correctly."""
        depth = np.asarray(depth, np.float32)
        valid_mask = np.asarray(valid_mask, bool)
        with_unc = uncertainty is not None
        gf = feat_ops.compute_grid_features(
            jnp.asarray(np.where(np.isfinite(depth), depth, 0.0)),
            jnp.asarray(valid_mask),
            jnp.asarray(uncertainty, jnp.float32) if with_unc else None,
            self.cfg.local_stats_window,
        )
        rows, cols = np.nonzero(valid_mask)
        feats = np.asarray(gf.features)[rows, cols]
        lstd = np.asarray(gf.local_std)[rows, cols]
        dvals = np.where(np.isfinite(depth), depth, 0.0)[rows, cols]
        pos = np.stack([cols, rows], -1).astype(np.float32)
        bg = self.build_knn_graph(
            feats, pos, k=self.cfg.knn_k, local_std=lstd,
            resolution=(float(resolution[0]), float(resolution[1])),
            depth=dvals,
        )
        bg.grid_shape = depth.shape
        bg.rows = rows[bg.perm]
        bg.cols = cols[bg.perm]
        return bg

    def build_knn_graph(
        self,
        x: np.ndarray,
        pos: np.ndarray,
        k: int,
        local_std: Optional[np.ndarray] = None,
        resolution: Tuple[float, float] = (1.0, 1.0),
        depth: Optional[np.ndarray] = None,
        spatial_sort: bool = True,
    ) -> "BuiltGraph":
        """k-NN graph from node coordinates (BASELINE.json k=8 configs).

        spatial_sort reorders nodes along a Hilbert curve first so
        neighbor indices stay within narrow bands — the banded-ELL
        sparse kernel (ops/ell_banded.py) depends on this locality
        (Hilbert beats Morton ~2-3x on spill fraction)."""
        from ..ops.graph import make_padded_graph

        n = x.shape[0]
        order = None
        if spatial_sort and n > 1:
            order = edge_ops.hilbert_order(pos)
            x = np.asarray(x)[order]
            pos = np.asarray(pos)[order]
            if local_std is not None:
                local_std = np.asarray(local_std)[order]
            if depth is not None:
                depth = np.asarray(depth)[order]
        ei = edge_ops.knn_edges(pos, k)
        # edge features from positions + (optional) per-node depth
        res = np.asarray(resolution, np.float32)
        delta = (pos[ei[1]] - pos[ei[0]]) * res[None, :]
        dist = np.sqrt((delta ** 2).sum(-1)).astype(np.float32)
        if depth is not None:
            ddiff = (depth[ei[1]] - depth[ei[0]]).astype(np.float32)
        else:
            ddiff = np.zeros_like(dist)
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.degrees(np.arctan(np.where(dist > 0, ddiff / np.maximum(dist, 1e-12), 0.0)))
        attr = np.stack([dist, ddiff, slope], -1).astype(np.float32)
        n_pad = round_up_to_bucket(max(n, 1), self.buckets.node_buckets)
        e_pad = n_pad * max(k, 1)
        g = make_padded_graph(
            x, ei, attr, n_pad=n_pad, e_pad=e_pad, pos=pos,
            local_std=local_std,
        )
        bg = BuiltGraph(g, grid_shape=None, num_nodes=n, rows=None, cols=None)
        # graph node i corresponds to original input index perm[i]
        bg.perm = order if order is not None else np.arange(n)
        return bg


@partial(jax.jit, static_argnames=("resolution", "connectivity", "stats_window",
                                   "with_uncertainty"))
def build_grid_inputs(
    depth: jax.Array,
    valid_mask: jax.Array,
    uncertainty: Optional[jax.Array] = None,
    *,
    resolution: Tuple[float, float] = (1.0, 1.0),
    connectivity: int = 8,
    stats_window: int = 5,
    with_uncertainty: bool = False,
):
    """Dense-path inputs for GridBathymetricGNN: (features [H,W,F],
    valid, nbr_mask [K,H,W], edge_attr [K,H,W,3], local_std [H,W]).

    Fully on device; the flagship inference/training path never leaves
    dense [H, W] form (no compaction, no scatter).
    """
    from ..models.grid_gat import incoming_edge_attrs, neighbor_masks
    from ..ops.edges import offsets_for_connectivity

    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    gf = feat_ops.compute_grid_features(
        depth, valid_mask, uncertainty if with_uncertainty else None,
        stats_window,
    )
    depth_filled = jnp.where(valid_mask, depth, gf.local_mean)
    offsets = offsets_for_connectivity(connectivity)
    nbr = neighbor_masks(valid_mask, offsets)
    eattr = incoming_edge_attrs(depth_filled, offsets,
                                (float(resolution[0]), float(resolution[1])))
    eattr = jnp.where(nbr[..., None], eattr, 0.0)
    return gf.features, valid_mask, nbr, eattr, gf.local_std


class BuiltGraph:
    """A PaddedGraph plus host-side reconstruction metadata."""

    def __init__(self, graph: PaddedGraph, grid_shape, num_nodes, rows, cols):
        self.graph = graph
        self.grid_shape = grid_shape
        self.num_nodes = num_nodes
        self.rows = rows
        self.cols = cols

    def graph_to_grid(self, node_values: np.ndarray, fill: float = np.nan) -> np.ndarray:
        """Scatter per-node values back onto the grid
        (reference: data/graph_construction.py:471-505)."""
        out = np.full(self.grid_shape, fill, np.float32)
        n = self.num_nodes
        out[self.rows[:n], self.cols[:n]] = np.asarray(node_values)[:n]
        return out
