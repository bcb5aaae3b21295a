"""Native VR BAG inference: bucketed batching of refinement graphs.

Re-design of the reference's NativeVRProcessor
(reference: scripts/inference_native.py:117-343): thousands of tiny
refinement grids (3x3..50x50) are packed into static-shape PaddedGraph
batches under a node budget, run through the sparse COO model in ONE
forward pass per bucket, and un-batched via graph_id. Static bucketing
means each bucket size compiles exactly once (BASELINE "static edge-count
bucketing").
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.config import Config
from ..config.constants import CORRECTION_NORM_FLOOR
from ..data.graph_build import GraphBuilder
from ..models.gnn import BathymetricGNN, make_model
from ..ops.ell import coo_to_ell
from ..ops.graph import PaddedGraph, batch_graphs, round_up_to_bucket

logger = logging.getLogger(__name__)


class NativeVRProcessor:
    """Batches refinement grids into single sparse forward passes."""

    def __init__(
        self,
        model: BathymetricGNN,
        variables: Dict,
        config: Optional[Config] = None,
        node_budget: int = 50000,
        node_buckets: Tuple[int, ...] = (1024, 4096, 16384, 65536, 131072),
        use_ell: bool = True,
    ):
        self.model = model
        self.variables = variables
        self.config = config or Config()
        self.use_ell = use_ell
        if use_ell:
            # gather-only sparse path; same param tree as the COO model
            from ..models.gnn_ell import EllBathymetricGNN

            self.ell_model = EllBathymetricGNN(
                hidden_channels=model.hidden_channels,
                num_layers=model.num_layers, gnn_type=model.gnn_type,
                heads=model.heads, num_classes=model.num_classes,
                dropout=0.0,
                predict_correction=model.predict_correction,
                feature_extractor_layers=model.feature_extractor_layers,
                edge_dim=model.edge_dim,
            )
        self.builder = GraphBuilder(self.config.graph, self.config.bucket)
        self.node_budget = node_budget
        self.node_buckets = node_buckets
        self.in_channels = int(
            variables["params"]["MLPFeatureExtractor_0"]["TorchLinear_0"]
            ["kernel"].shape[0]
        )
        self.pending: List[Dict] = []
        self.pending_nodes = 0
        self._forward = self._make_forward()

    def _make_forward(self):
        model = self.ell_model if self.use_ell else self.model

        @jax.jit
        def forward(variables, graph):
            out = model.apply(variables, graph)
            corr = out.get("correction")
            if corr is not None:
                corr = corr * jnp.maximum(graph.local_std,
                                          CORRECTION_NORM_FLOOR)
            return {
                "classification": out["predicted_class"].astype(jnp.int32),
                "confidence": out["confidence"],
                "correction": corr if corr is not None
                else jnp.zeros_like(out["confidence"]),
            }

        return forward

    # -- batching (reference: scripts/inference_native.py:249-342) ---------

    def add_to_batch(self, depth: np.ndarray, uncertainty: np.ndarray,
                     resolution: Tuple[float, float], context=None) -> None:
        valid = np.isfinite(depth) & (np.abs(depth) < 1.0e5)
        bg = self.builder.build_graph(
            np.where(valid, depth, np.nan), valid,
            uncertainty if self.in_channels >= 8 else None, resolution,
        )
        g = bg.graph
        n = bg.num_nodes
        self.pending.append({
            "x": np.asarray(g.x)[:n],
            "edge_index": np.stack([np.asarray(g.edge_src),
                                    np.asarray(g.edge_dst)])[:,
                                   np.asarray(g.edge_mask)],
            "edge_attr": np.asarray(g.edge_attr)[np.asarray(g.edge_mask)],
            "local_std": np.asarray(g.local_std)[:n],
            "rows": bg.rows[:n], "cols": bg.cols[:n],
            "shape": depth.shape, "context": context,
        })
        self.pending_nodes += n

    def batch_ready(self) -> bool:
        return self.pending_nodes >= self.node_budget

    def flush_batch(self) -> List[Dict]:
        """One forward pass over all pending graphs; returns per-grid
        result dicts with dense 2-D output grids."""
        if not self.pending:
            return []
        n_total = self.pending_nodes
        n_pad = round_up_to_bucket(n_total, self.node_buckets)
        e_pad = n_pad * (self.config.graph.connectivity + 1)
        graph, counts = batch_graphs(
            [(p["x"], p["edge_index"], p["edge_attr"]) for p in self.pending],
            n_pad=n_pad, e_pad=e_pad,
            local_std_list=[p["local_std"] for p in self.pending],
        )
        if self.use_ell:
            graph = coo_to_ell(
                graph, max_degree=self.config.graph.connectivity)
        out = self._forward(self.variables, graph)
        out = {k: np.asarray(v) for k, v in out.items()}

        results = []
        offset = 0
        for p, n in zip(self.pending, counts):
            sl = slice(offset, offset + int(n))
            grids = {}
            for ch in ("classification", "confidence", "correction"):
                arr = np.full(p["shape"], np.nan, np.float32)
                arr[p["rows"], p["cols"]] = out[ch][sl]
                grids[ch] = arr
            grids["classification"] = np.nan_to_num(
                grids["classification"], nan=-1).astype(np.int64)
            grids["confidence"] = np.nan_to_num(grids["confidence"])
            grids["correction"] = np.nan_to_num(grids["correction"])
            grids["context"] = p["context"]
            results.append(grids)
            offset += int(n)
        logger.debug("flushed %d graphs (%d nodes, bucket %d)",
                     len(results), n_total, n_pad)
        self.pending = []
        self.pending_nodes = 0
        return results

    def process_grid(self, depth, uncertainty, resolution) -> Dict:
        """Single-grid convenience path
        (reference: scripts/inference_native.py:206-247)."""
        self.add_to_batch(depth, uncertainty, resolution)
        return self.flush_batch()[0]
