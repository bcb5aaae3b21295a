"""ELL-layout full model, parameter-compatible with BathymetricGNN.

Submodules are explicitly named to mirror models/gnn.BathymetricGNN
(GNNBackbone_0 / GATConv_i / MaskedBatchNorm_i / heads), so any COO-trained
checkpoint applies unchanged while message passing runs on the gather-only
ELL layout — the production sparse path for bounded-degree graphs
(VR refinement batches, k-NN graphs).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.ell import EllGraph
from .conv_ell import (GATConvELL, GATConvEllBanded, GCNConvELL,
                       GINConvELL, SAGEConvELL)
from .layers import (ClassificationHead, ConfidenceHead, CorrectionHead,
                     MaskedBatchNorm, MLPFeatureExtractor)


class EllGNNBackbone(nn.Module):
    hidden_channels: int
    num_layers: int
    gnn_type: str = "GAT"
    heads: int = 4
    dropout: float = 0.1
    edge_dim: Optional[int] = None
    # "xla" = plain ELL gathers; "banded" = band/spill decomposition
    # (XLA); "banded_pallas" = fused TPU band kernel (ops/pallas/
    # ell_gat_fused.py). Parameters are identical across all three.
    sparse_kernel: str = "xla"
    compute_dtype: str = "float32"
    bn_axis_name: Optional[str] = None  # sync-BN for data-parallel shards

    @nn.compact
    def __call__(self, g: EllGraph, x: jax.Array,
                 deterministic: bool = True,
                 use_running_average: Optional[bool] = None,
                 banded=None) -> jax.Array:
        if use_running_average is None:
            use_running_average = deterministic
        use_banded = self.gnn_type == "GAT" and self.sparse_kernel != "xla"
        if use_banded and banded is None:
            raise ValueError(
                "sparse_kernel=banded* needs the BandedEll structure "
                "(pass banded=band_ell(g))")
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            if use_banded:
                x = GATConvEllBanded(
                    out_channels=self.hidden_channels,
                    heads=self.heads if not last else 1,
                    concat=not last,
                    dropout=self.dropout,
                    edge_dim=self.edge_dim,
                    use_pallas=self.sparse_kernel == "banded_pallas",
                    compute_dtype=self.compute_dtype,
                    name=f"GATConv_{i}",
                )(g, banded, x, deterministic)
                width = self.hidden_channels * (self.heads if not last else 1)
            elif self.gnn_type == "GAT":
                x = GATConvELL(
                    out_channels=self.hidden_channels,
                    heads=self.heads if not last else 1,
                    concat=not last,
                    dropout=self.dropout,
                    edge_dim=self.edge_dim,
                    name=f"GATConv_{i}",
                )(g, x, deterministic)
                width = self.hidden_channels * (self.heads if not last else 1)
            elif self.gnn_type == "GCN":
                x = GCNConvELL(self.hidden_channels,
                               name=f"GCNConv_{i}")(g, x, deterministic)
                width = self.hidden_channels
            elif self.gnn_type == "GraphSAGE":
                x = SAGEConvELL(self.hidden_channels,
                                name=f"SAGEConv_{i}")(g, x, deterministic)
                width = self.hidden_channels
            elif self.gnn_type == "GIN":
                x = GINConvELL(self.hidden_channels,
                               name=f"GINConv_{i}")(g, x, deterministic)
                width = self.hidden_channels
            else:
                raise ValueError(self.gnn_type)
            # relu + feature dropout fold into the norm's fused pass
            # (on the bf16 fast path this saves a [N, F] read+write round
            # trip per layer — same as the grid models)
            do_drop = (not last and self.dropout > 0 and not deterministic)
            x = MaskedBatchNorm(width, axis_name=self.bn_axis_name,
                                name=f"MaskedBatchNorm_{i}")(
                x, g.node_mask, use_running_average,
                fuse_relu=not last,
                drop_rate=self.dropout if do_drop else 0.0,
                drop_rng=self.make_rng("dropout") if do_drop else None)
        return x


class EllBathymetricGNN(nn.Module):
    """BathymetricGNN on EllGraph inputs (same param tree as the COO model)."""

    hidden_channels: int = 64
    num_layers: int = 4
    gnn_type: str = "GAT"
    heads: int = 4
    num_classes: int = 3
    dropout: float = 0.1
    predict_correction: bool = True
    feature_extractor_layers: int = 2
    edge_dim: Optional[int] = 3
    sparse_kernel: str = "xla"
    compute_dtype: str = "float32"
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, g: EllGraph, deterministic: bool = True,
                 use_running_average: Optional[bool] = None,
                 banded=None) -> Dict[str, jax.Array]:
        x = MLPFeatureExtractor(
            self.hidden_channels, self.feature_extractor_layers,
            self.dropout, name="MLPFeatureExtractor_0",
        )(g.x, deterministic)
        x = EllGNNBackbone(
            hidden_channels=self.hidden_channels,
            num_layers=self.num_layers, gnn_type=self.gnn_type,
            heads=self.heads, dropout=self.dropout,
            edge_dim=self.edge_dim if self.gnn_type == "GAT" else None,
            sparse_kernel=self.sparse_kernel,
            compute_dtype=self.compute_dtype,
            bn_axis_name=self.bn_axis_name,
            name="GNNBackbone_0",
        )(g, x, deterministic, use_running_average, banded=banded)
        logits = ClassificationHead(
            self.hidden_channels, self.num_classes, self.dropout,
            name="ClassificationHead_0")(x, deterministic)
        out = {
            "class_logits": logits,
            "class_probs": nn.softmax(logits, -1),
            "predicted_class": jnp.argmax(logits, -1),
            "confidence": ConfidenceHead(self.hidden_channels, self.dropout,
                                         name="ConfidenceHead_0")(
                x, deterministic),
        }
        if self.predict_correction:
            out["correction"] = CorrectionHead(
                self.hidden_channels, self.dropout,
                name="CorrectionHead_0")(x, deterministic)
        return out


def make_ell_model(model_cfg, in_channels: int, edge_dim: int = 3,
                   sparse_kernel: str = "xla",
                   compute_dtype: str = "float32") -> EllBathymetricGNN:
    return EllBathymetricGNN(
        hidden_channels=model_cfg.hidden_channels,
        num_layers=model_cfg.num_layers,
        gnn_type=model_cfg.gnn_type,
        heads=model_cfg.heads,
        num_classes=model_cfg.num_classes,
        dropout=model_cfg.dropout,
        predict_correction=model_cfg.predict_correction,
        feature_extractor_layers=model_cfg.feature_extractor_layers,
        edge_dim=edge_dim,
        sparse_kernel=sparse_kernel,
        compute_dtype=compute_dtype,
    )
