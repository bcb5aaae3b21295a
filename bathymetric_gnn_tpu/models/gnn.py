"""The full multi-task bathymetric GNN.

TPU-native re-design of the reference's BathymetricGNN
(reference: models/gnn.py:263-451): MLP feature extractor -> GNN backbone
(GAT/GCN/GraphSAGE/GIN) -> 3 output heads (classification, confidence,
correction), operating on PaddedGraph with masked statistics everywhere.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config.constants import (ACTION_AUTO_CORRECT, ACTION_KEEP,
                                ACTION_REVIEW, CLASS_NOISE)
from ..ops.graph import PaddedGraph
from .conv import GATConv, GCNConv, GINConv, SAGEConv
from .layers import (ClassificationHead, ConfidenceHead, CorrectionHead,
                     MaskedBatchNorm, MLPFeatureExtractor)


class GNNBackbone(nn.Module):
    """Stack of conv layers with BatchNorm + ReLU + dropout
    (reference: models/gnn.py:74-188). GAT: heads concat on all but the
    last layer; last layer single-head."""

    hidden_channels: int
    num_layers: int
    gnn_type: str = "GAT"
    heads: int = 4
    dropout: float = 0.1
    edge_dim: Optional[int] = None
    bn_axis_name: Optional[str] = None  # sync-BN moments across this axis

    @nn.compact
    def __call__(
        self,
        g: PaddedGraph,
        x: jax.Array,
        deterministic: bool = True,
        use_running_average: Optional[bool] = None,
    ) -> jax.Array:
        if use_running_average is None:
            use_running_average = deterministic
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            if self.gnn_type == "GAT":
                x = GATConv(
                    out_channels=self.hidden_channels,
                    heads=self.heads if not last else 1,
                    concat=not last,
                    dropout=self.dropout,
                    edge_dim=self.edge_dim,
                )(g, x, deterministic)
                width = self.hidden_channels * (self.heads if not last else 1)
            elif self.gnn_type == "GCN":
                x = GCNConv(self.hidden_channels)(g, x, deterministic)
                width = self.hidden_channels
            elif self.gnn_type == "GraphSAGE":
                x = SAGEConv(self.hidden_channels)(g, x, deterministic)
                width = self.hidden_channels
            elif self.gnn_type == "GIN":
                x = GINConv(self.hidden_channels)(g, x, deterministic)
                width = self.hidden_channels
            else:
                raise ValueError(f"unknown gnn_type {self.gnn_type}")

            x = MaskedBatchNorm(width, axis_name=self.bn_axis_name)(
                x, g.node_mask, use_running_average)
            if not last:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class BathymetricGNN(nn.Module):
    """Multi-task GNN: per-node class logits + confidence + correction
    (reference: models/gnn.py:263-451)."""

    hidden_channels: int = 64
    num_layers: int = 4
    gnn_type: str = "GAT"
    heads: int = 4
    num_classes: int = 3
    dropout: float = 0.1
    predict_correction: bool = True
    feature_extractor_layers: int = 2
    edge_dim: Optional[int] = 3
    bn_axis_name: Optional[str] = None  # sync-BN for data-parallel shards

    @nn.compact
    def __call__(
        self,
        g: PaddedGraph,
        deterministic: bool = True,
        use_running_average: Optional[bool] = None,
    ) -> Dict[str, jax.Array]:
        x = MLPFeatureExtractor(
            self.hidden_channels, self.feature_extractor_layers, self.dropout
        )(g.x, deterministic)
        x = GNNBackbone(
            hidden_channels=self.hidden_channels,
            num_layers=self.num_layers,
            gnn_type=self.gnn_type,
            heads=self.heads,
            dropout=self.dropout,
            edge_dim=self.edge_dim if self.gnn_type == "GAT" else None,
            bn_axis_name=self.bn_axis_name,
        )(g, x, deterministic, use_running_average)

        logits = ClassificationHead(self.hidden_channels, self.num_classes,
                                    self.dropout)(x, deterministic)
        probs = nn.softmax(logits, axis=-1)
        out = {
            "class_logits": logits,
            "class_probs": probs,
            "predicted_class": jnp.argmax(logits, -1),
            "confidence": ConfidenceHead(self.hidden_channels, self.dropout)(
                x, deterministic
            ),
            "node_embedding": x,
        }
        if self.predict_correction:
            out["correction"] = CorrectionHead(self.hidden_channels,
                                               self.dropout)(x, deterministic)
        return out


def predict_with_thresholds(
    outputs: Dict[str, jax.Array],
    auto_correct_threshold: float = 0.85,
    review_threshold: float = 0.6,
) -> Dict[str, jax.Array]:
    """Deployment thresholding (reference: models/gnn.py:410-451):
    action = auto-correct for confident noise, review for low confidence."""
    conf = outputs["confidence"]
    cls = outputs["predicted_class"]
    auto = (cls == CLASS_NOISE) & (conf > auto_correct_threshold)
    review = conf < review_threshold
    action = jnp.where(
        auto, ACTION_AUTO_CORRECT, jnp.where(review, ACTION_REVIEW, ACTION_KEEP)
    )
    return {
        **outputs,
        "action": action,
        "auto_correct": auto,
        "needs_review": review,
    }


def make_model(model_cfg, in_channels: int, edge_dim: int = 3) -> BathymetricGNN:
    """Build from a ModelConfig (checkpoints record in_channels/edge_dim —
    SURVEY §2.5 Q2)."""
    return BathymetricGNN(
        hidden_channels=model_cfg.hidden_channels,
        num_layers=model_cfg.num_layers,
        gnn_type=model_cfg.gnn_type,
        heads=model_cfg.heads,
        num_classes=model_cfg.num_classes,
        dropout=model_cfg.dropout,
        predict_correction=model_cfg.predict_correction,
        feature_extractor_layers=model_cfg.feature_extractor_layers,
        edge_dim=edge_dim,
    )
