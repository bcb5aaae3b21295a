"""Three-way GATConv agreement: scalar-loop float64 oracle (numpy_oracle)
vs the vectorized torch oracle (torch_ref) vs the JAX layer.

PyG itself cannot be installed in this zero-egress environment, so the
BASELINE "allclose vs reference PyG" gate rests on TWO independently
written oracles (VERDICT round-1 weak-point 1): torch_ref.py uses
vectorized scatter/segment ops; numpy_oracle.py uses explicit per-edge
Python loops in float64. They share only PyG's documented semantics —
if either misread the definition (self-loop mean edge fill, LeakyReLU
placement, per-destination softmax, concat-vs-mean, bias), the three-way
comparison would split.
"""

import numpy as np
import pytest
import torch

import torch_ref as TR
from numpy_oracle import gat_forward_scalar

from bathymetric_gnn_tpu.models.conv import GATConv
from bathymetric_gnn_tpu.ops.graph import make_padded_graph

torch.manual_seed(0)


def random_graph(n=24, e=90, f=5, fe=3, seed=0, isolated=()):
    rg = np.random.default_rng(seed)
    x = rg.normal(size=(n, f)).astype(np.float32)
    src = rg.integers(0, n, e)
    dst = rg.integers(0, n, e)
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    # force isolated nodes: drop every edge touching them (exercises the
    # no-incoming-edges self-loop fill path)
    for iso in isolated:
        pairs = pairs[(pairs[:, 0] != iso) & (pairs[:, 1] != iso)]
    ei = pairs.T.astype(np.int64)
    attr = rg.normal(size=(ei.shape[1], fe)).astype(np.float32)
    return x, ei, attr


def ref_params(f=5, out_c=8, heads=2, fe=3, concat=True):
    ref = TR.RefGATConv(f, out_c, heads=heads, concat=concat, edge_dim=fe)
    p_np = {
        "lin": ref.lin.weight.detach().numpy().T,
        "att_src": ref.att_src.detach().numpy(),
        "att_dst": ref.att_dst.detach().numpy(),
        "lin_edge": ref.lin_edge.weight.detach().numpy().T,
        "att_edge": ref.att_edge.detach().numpy(),
        "bias": ref.bias.detach().numpy(),
    }
    p_jax = dict(p_np)
    p_jax["lin_src"] = p_jax.pop("lin")
    return ref, p_np, p_jax


class TestThreeWayAgreement:
    @pytest.mark.parametrize("heads,concat", [(2, True), (1, False),
                                              (4, True)])
    def test_all_three_match(self, heads, concat):
        x, ei, attr = random_graph()
        ref, p_np, p_jax = ref_params(heads=heads, concat=concat)
        with torch.no_grad():
            out_t = ref(torch.tensor(x), torch.tensor(ei),
                        torch.tensor(attr)).numpy()
        out_s = gat_forward_scalar(x, ei, attr, p_np, heads, 8,
                                   concat=concat)
        # scalar-f64 oracle vs torch oracle: independent implementations
        np.testing.assert_allclose(out_s, out_t, rtol=1e-4, atol=1e-5)

        g = make_padded_graph(x, ei, attr, n_pad=32, e_pad=128)
        layer = GATConv(out_channels=8, heads=heads, concat=concat,
                        edge_dim=3)
        out_j = np.asarray(layer.apply({"params": p_jax}, g, g.x))[:24]
        np.testing.assert_allclose(out_j, out_s, rtol=1e-4, atol=1e-5)

    def test_isolated_node_self_loop_fill(self):
        """A node with no incoming edges gets a zero-vector self-loop
        edge_attr (PyG fill_value='mean' of an empty set) — the case most
        likely to diverge between implementations."""
        x, ei, attr = random_graph(isolated=(3, 17))
        ref, p_np, p_jax = ref_params()
        with torch.no_grad():
            out_t = ref(torch.tensor(x), torch.tensor(ei),
                        torch.tensor(attr)).numpy()
        out_s = gat_forward_scalar(x, ei, attr, p_np, 2, 8)
        np.testing.assert_allclose(out_s, out_t, rtol=1e-4, atol=1e-5)

        g = make_padded_graph(x, ei, attr, n_pad=32, e_pad=128)
        layer = GATConv(out_channels=8, heads=2, concat=True, edge_dim=3)
        out_j = np.asarray(layer.apply({"params": p_jax}, g, g.x))[:24]
        np.testing.assert_allclose(out_j, out_s, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out_j[[3, 17]], out_s[[3, 17]],
                                   rtol=1e-4, atol=1e-5)

    def test_grid_gat_matches_scalar_oracle(self):
        """The dense-grid (shifted-window) layer against the scalar oracle
        on a real grid graph — ties the flagship path to both oracles."""
        import jax
        import jax.numpy as jnp

        from bathymetric_gnn_tpu.config.config import (BucketConfig,
                                                       GraphConfig)
        from bathymetric_gnn_tpu.data.graph_build import (GraphBuilder,
                                                          build_grid_inputs)
        from bathymetric_gnn_tpu.models.grid_gat import GridGATConv

        rg = np.random.default_rng(1)
        h = w = 10
        depth = (30 + rg.normal(0, 1, (h, w))).astype(np.float32)
        valid = np.ones((h, w), bool)
        valid[2:4, 3:7] = False
        depth[~valid] = np.nan
        dd = np.nan_to_num(depth).astype(np.float32)
        feats, v, nbr, eattr_grid, _ = build_grid_inputs(dd, valid)
        x = rg.normal(size=(h, w, 5)).astype(np.float32)
        x[~valid] = 0.0

        gb = GraphBuilder(GraphConfig(connectivity=8),
                          BucketConfig(node_buckets=(128,)))
        bg = gb.build_graph(dd, valid)
        g = bg.graph
        em = np.asarray(g.edge_mask)
        ei = np.stack([np.asarray(g.edge_src)[em],
                       np.asarray(g.edge_dst)[em]])
        attr = np.asarray(g.edge_attr)[em]
        nreal = bg.num_nodes
        xf = x[bg.rows[:nreal], bg.cols[:nreal]]

        layer = GridGATConv(out_channels=8, heads=2, concat=True, edge_dim=3)
        params = layer.init(jax.random.PRNGKey(2), jnp.asarray(x), v, nbr,
                            eattr_grid)["params"]
        out_grid = np.asarray(layer.apply(
            {"params": params}, jnp.asarray(x), v, nbr, eattr_grid))

        p_np = {
            "lin": np.asarray(params["lin_src"]),
            "att_src": np.asarray(params["att_src"]),
            "att_dst": np.asarray(params["att_dst"]),
            "lin_edge": np.asarray(params["lin_edge"]),
            "att_edge": np.asarray(params["att_edge"]),
            "bias": np.asarray(params["bias"]),
        }
        out_s = gat_forward_scalar(xf, ei, attr, p_np, 2, 8)
        np.testing.assert_allclose(
            out_grid[bg.rows[:nreal], bg.cols[:nreal]], out_s,
            rtol=1e-4, atol=1e-5)
