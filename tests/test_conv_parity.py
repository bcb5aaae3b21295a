"""Activation-parity tests: JAX conv layers vs torch PyG-semantics oracle.

The BASELINE "allclose" gate (SURVEY §7.1 step 4): import torch weights into
the flax layers and require per-layer outputs to match.
"""

import numpy as np
import pytest
import torch

from bathymetric_gnn_tpu.models.conv import GATConv, GCNConv, GINConv, SAGEConv
from bathymetric_gnn_tpu.models.layers import MaskedBatchNorm
from bathymetric_gnn_tpu.ops.graph import make_padded_graph

import torch_ref as TR

torch.manual_seed(0)


def random_graph(n=40, e=200, f=7, fe=3, seed=0):
    rg = np.random.default_rng(seed)
    x = rg.normal(size=(n, f)).astype(np.float32)
    src = rg.integers(0, n, e)
    dst = rg.integers(0, n, e)
    # dedupe to avoid double edges (grid graphs have none)
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    ei = pairs.T.astype(np.int64)
    attr = rg.normal(size=(ei.shape[1], fe)).astype(np.float32)
    return x, ei, attr


def to_jax_graph(x, ei, attr, n_pad=64, e_pad=512):
    return make_padded_graph(x, ei, attr, n_pad=n_pad, e_pad=e_pad)


class TestGATParity:
    @pytest.mark.parametrize("heads,concat", [(4, True), (1, False), (2, False)])
    def test_gat_with_edge_attr(self, heads, concat):
        x, ei, attr = random_graph()
        ref = TR.RefGATConv(7, 16, heads=heads, concat=concat, edge_dim=3)
        with torch.no_grad():
            out_t = ref(torch.tensor(x), torch.tensor(ei), torch.tensor(attr)).numpy()

        g = to_jax_graph(x, ei, attr)
        layer = GATConv(out_channels=16, heads=heads, concat=concat, edge_dim=3)
        params = {
            "lin_src": ref.lin.weight.detach().numpy().T,
            "att_src": ref.att_src.detach().numpy(),
            "att_dst": ref.att_dst.detach().numpy(),
            "lin_edge": ref.lin_edge.weight.detach().numpy().T,
            "att_edge": ref.att_edge.detach().numpy(),
            "bias": ref.bias.detach().numpy(),
        }
        out_j = layer.apply({"params": params}, g, g.x)
        out_j = np.asarray(out_j)[:40]
        np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-5)

    def test_gat_no_edge_attr(self):
        x, ei, _ = random_graph()
        ref = TR.RefGATConv(7, 8, heads=2, concat=True, edge_dim=None)
        with torch.no_grad():
            out_t = ref(torch.tensor(x), torch.tensor(ei)).numpy()
        g = make_padded_graph(x, ei, None, n_pad=64, e_pad=512)
        layer = GATConv(out_channels=8, heads=2, concat=True, edge_dim=None)
        params = {
            "lin_src": ref.lin.weight.detach().numpy().T,
            "att_src": ref.att_src.detach().numpy(),
            "att_dst": ref.att_dst.detach().numpy(),
            "bias": ref.bias.detach().numpy(),
        }
        out_j = np.asarray(layer.apply({"params": params}, g, g.x))[:40]
        np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-5)


class TestGCNParity:
    def test_gcn(self):
        x, ei, _ = random_graph()
        ref = TR.RefGCNConv(7, 16)
        with torch.no_grad():
            out_t = ref(torch.tensor(x), torch.tensor(ei)).numpy()
        g = make_padded_graph(x, ei, None, n_pad=64, e_pad=512)
        params = {
            "kernel": ref.lin.weight.detach().numpy().T,
            "bias": ref.bias.detach().numpy(),
        }
        out_j = np.asarray(GCNConv(16).apply({"params": params}, g, g.x))[:40]
        np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-5)


class TestSAGEParity:
    def test_sage(self):
        x, ei, _ = random_graph()
        ref = TR.RefSAGEConv(7, 16)
        with torch.no_grad():
            out_t = ref(torch.tensor(x), torch.tensor(ei)).numpy()
        g = make_padded_graph(x, ei, None, n_pad=64, e_pad=512)
        params = {
            "lin_l": ref.lin_l.weight.detach().numpy().T,
            "bias_l": ref.lin_l.bias.detach().numpy(),
            "lin_r": ref.lin_r.weight.detach().numpy().T,
        }
        out_j = np.asarray(SAGEConv(16).apply({"params": params}, g, g.x))[:40]
        np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-5)


class TestGINParity:
    def test_gin(self):
        x, ei, _ = random_graph()
        ref = TR.RefGINConv(7, 16)
        with torch.no_grad():
            out_t = ref(torch.tensor(x), torch.tensor(ei)).numpy()
        g = make_padded_graph(x, ei, None, n_pad=64, e_pad=512)
        seq = ref.mlp
        params = {
            "TorchLinear_0": {"kernel": seq[0].weight.detach().numpy().T,
                              "bias": seq[0].bias.detach().numpy()},
            "TorchLinear_1": {"kernel": seq[2].weight.detach().numpy().T,
                              "bias": seq[2].bias.detach().numpy()},
        }
        out_j = np.asarray(GINConv(16).apply({"params": params}, g, g.x))[:40]
        np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-5)


class TestMaskedBatchNorm:
    def test_train_mode_matches_torch_on_live_nodes(self):
        rg = np.random.default_rng(1)
        x = rg.normal(2.0, 3.0, (30, 8)).astype(np.float32)
        x_pad = np.zeros((64, 8), np.float32)
        x_pad[:30] = x
        mask = np.zeros(64, bool)
        mask[:30] = True

        bn_t = torch.nn.BatchNorm1d(8)
        bn_t.train()
        with torch.no_grad():
            out_t = bn_t(torch.tensor(x)).numpy()

        bn = MaskedBatchNorm(8)
        vars_ = bn.init(torch.manual_seed(0) and __import__("jax").random.PRNGKey(0),
                        x_pad, mask)
        out_j, new_vars = bn.apply(
            vars_, x_pad, mask, use_running_average=False,
            mutable=["batch_stats"],
        )
        np.testing.assert_allclose(np.asarray(out_j)[:30], out_t, rtol=1e-3,
                                   atol=1e-4)
        # padding did not pollute running stats
        rm = np.asarray(new_vars["batch_stats"]["mean"])
        np.testing.assert_allclose(rm, 0.1 * x.mean(0), rtol=1e-4, atol=1e-5)

    def test_eval_uses_running_stats(self):
        import jax

        x_pad = np.ones((16, 4), np.float32) * 5
        mask = np.ones(16, bool)
        bn = MaskedBatchNorm(4)
        vars_ = bn.init(jax.random.PRNGKey(0), x_pad, mask)
        out = bn.apply(vars_, x_pad, mask, use_running_average=True)
        # running mean 0, var 1 -> output ~= input
        np.testing.assert_allclose(np.asarray(out), x_pad, rtol=1e-4)
