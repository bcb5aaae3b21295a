"""End-to-end reference-checkpoint migration test.

Builds a torch model with the reference's EXACT module structure and
state_dict key names (reference: models/gnn.py:263-358), runs it with the
oracle layers, imports its state_dict through utils/torch_import, and
requires the JAX model to reproduce its outputs — the BASELINE "allclose"
migration gate.
"""

import numpy as np
import torch
import torch.nn.functional as TF
from torch import nn

import torch_ref as TR

from bathymetric_gnn_tpu.models.gnn import BathymetricGNN
from bathymetric_gnn_tpu.ops.graph import make_padded_graph
from bathymetric_gnn_tpu.utils.torch_import import (import_torch_checkpoint,
                                                    import_torch_state_dict)

torch.manual_seed(7)

HIDDEN = 16
HEADS = 2
LAYERS = 3
IN_CH = 7
EDGE_DIM = 3


class _BNWrap(nn.Module):
    """PyG BatchNorm = wrapper holding .module = BatchNorm1d."""

    def __init__(self, width):
        super().__init__()
        self.module = nn.BatchNorm1d(width)

    def forward(self, x):
        return self.module(x)


class RefStyleModel(nn.Module):
    """Mirror of the reference BathymetricGNN structure + names."""

    def __init__(self):
        super().__init__()
        fe = nn.Module()
        fe.mlp = nn.Sequential(
            nn.Linear(IN_CH, HIDDEN), nn.ReLU(), nn.Dropout(0.1),
            nn.Linear(HIDDEN, HIDDEN),
        )
        self.feature_extractor = fe
        gnn = nn.Module()
        gnn.convs = nn.ModuleList()
        gnn.norms = nn.ModuleList()
        for i in range(LAYERS):
            last = i == LAYERS - 1
            in_c = HIDDEN if i == 0 else HIDDEN * HEADS
            gnn.convs.append(TR.RefGATConv(
                in_c, HIDDEN, heads=HEADS if not last else 1,
                concat=not last, edge_dim=EDGE_DIM))
            gnn.norms.append(_BNWrap(HIDDEN * (HEADS if not last else 1)))
        self.gnn = gnn
        for name in ("classification_head", "confidence_head",
                     "correction_head"):
            head = nn.Module()
            out = {"classification_head": 3}.get(name, 1)
            head.mlp = nn.Sequential(
                nn.Linear(HIDDEN, HIDDEN // 2), nn.ReLU(), nn.Dropout(0.1),
                nn.Linear(HIDDEN // 2, out),
            )
            setattr(self, name, head)

    def forward(self, x, edge_index, edge_attr):
        x = self.feature_extractor.mlp(x)
        for i, (conv, norm) in enumerate(zip(self.gnn.convs, self.gnn.norms)):
            x = conv(x, edge_index, edge_attr)
            x = norm(x)
            if i < LAYERS - 1:
                x = TF.relu(x)
        logits = self.classification_head.mlp(x)
        conf = torch.sigmoid(self.confidence_head.mlp(x))[:, 0]
        corr = self.correction_head.mlp(x)[:, 0]
        return logits, conf, corr


def rename_gat_keys(sd):
    """RefGATConv stores the shared transform as 'lin' — same as PyG."""
    return sd


class TestTorchImport:
    def test_migrated_checkpoint_matches_torch(self):
        from test_conv_parity import random_graph

        x, ei, attr = random_graph(n=40, e=220, f=IN_CH, fe=EDGE_DIM)
        model_t = RefStyleModel().eval()
        with torch.no_grad():
            logits_t, conf_t, corr_t = model_t(
                torch.tensor(x), torch.tensor(ei), torch.tensor(attr))

        ckpt = {
            "model_state_dict": model_t.state_dict(),
            "in_channels": IN_CH,
            "edge_dim": EDGE_DIM,
            "config": {"model": {"num_layers": LAYERS, "gnn_type": "GAT",
                                 "hidden_channels": HIDDEN,
                                 "attention_heads": HEADS}},
        }
        params, batch_stats, meta = import_torch_checkpoint(ckpt)
        assert meta["in_channels"] == IN_CH
        assert meta["num_layers"] == LAYERS

        g = make_padded_graph(x, ei, attr, n_pad=64, e_pad=512)
        model_j = BathymetricGNN(hidden_channels=HIDDEN, num_layers=LAYERS,
                                 heads=HEADS, dropout=0.0)
        out = model_j.apply({"params": params, "batch_stats": batch_stats},
                            g, use_running_average=True)
        np.testing.assert_allclose(np.asarray(out["class_logits"])[:40],
                                   logits_t.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["confidence"])[:40],
                                   conf_t.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["correction"])[:40],
                                   corr_t.numpy(), rtol=1e-3, atol=1e-3)

    def test_state_dict_without_wrapper(self):
        model_t = RefStyleModel()
        params, bs = import_torch_state_dict(
            model_t.state_dict(), num_layers=LAYERS)
        assert "GNNBackbone_0" in params
        assert "GATConv_0" in params["GNNBackbone_0"]
        assert params["GNNBackbone_0"]["GATConv_0"]["lin_src"].shape == (
            HIDDEN, HIDDEN * HEADS)
