"""Dense-grid path vs sparse-COO path parity.

The flagship shifted-window GAT must produce EXACTLY the same outputs as
the COO segment-op path (which itself is parity-tested against the torch
PyG oracle) when driven with the same parameters on the same grid graph.
"""

import jax
import numpy as np

from bathymetric_gnn_tpu.config.config import BucketConfig, GraphConfig
from bathymetric_gnn_tpu.data.graph_build import GraphBuilder, build_grid_inputs
from bathymetric_gnn_tpu.models.conv import GATConv
from bathymetric_gnn_tpu.models.gnn import BathymetricGNN
from bathymetric_gnn_tpu.models.grid_gat import (GridBathymetricGNN,
                                                 GridGATConv, params_from_coo)

from conftest import make_ramp_surface


def masked_grid(h=32, w=32):
    depth = make_ramp_surface(h, w)
    valid = np.ones((h, w), bool)
    valid[4:9, 6:12] = False
    valid[0, :] = False
    depth[~valid] = np.nan
    return depth, valid


def build_both(depth, valid, connectivity=8):
    gb = GraphBuilder(GraphConfig(connectivity=connectivity),
                      BucketConfig(node_buckets=(4096,)))
    bg = gb.build_graph(np.nan_to_num(depth), valid)
    feats, v, nbr, eattr, lstd = build_grid_inputs(
        np.nan_to_num(depth).astype(np.float32), valid,
        connectivity=connectivity,
    )
    return bg, (feats, v, nbr, eattr, lstd)


class TestGridFeaturesMatchCOO:
    def test_node_features_match(self):
        depth, valid = masked_grid()
        bg, (feats, *_ ) = build_both(depth, valid)
        n = bg.num_nodes
        coo_x = np.asarray(bg.graph.x)[:n]
        grid_x = np.asarray(feats)[bg.rows[:n], bg.cols[:n]]
        np.testing.assert_allclose(grid_x, coo_x, rtol=1e-6, atol=1e-6)

    def test_edge_attr_match(self):
        depth, valid = masked_grid()
        bg, (_, _, nbr, eattr, _) = build_both(depth, valid)
        g = bg.graph
        em = np.asarray(g.edge_mask)
        src = np.asarray(g.edge_src)[em]
        dst = np.asarray(g.edge_dst)[em]
        attr = np.asarray(g.edge_attr)[em]
        rows, cols = bg.rows, bg.cols
        nbr = np.asarray(nbr)
        eattr = np.asarray(eattr)
        # grid edge_attr[k, i] is the incoming edge from offset k at dst i
        from bathymetric_gnn_tpu.ops.edges import OFFSETS_8
        count = 0
        for i in range(0, len(src), 53):
            sr, sc = rows[src[i]], cols[src[i]]
            tr, tc = rows[dst[i]], cols[dst[i]]
            o = (sr - tr, sc - tc)  # offset from dst to its neighbor (src)
            k = OFFSETS_8.index(o)
            assert nbr[k, tr, tc]
            np.testing.assert_allclose(eattr[k, tr, tc], attr[i],
                                       rtol=1e-5, atol=1e-5)
            count += 1
        assert count > 10


class TestGridGATLayerParity:
    def test_single_layer(self):
        depth, valid = masked_grid()
        bg, (feats, v, nbr, eattr, _) = build_both(depth, valid)
        g = bg.graph
        n = bg.num_nodes

        layer_coo = GATConv(out_channels=12, heads=3, concat=True, edge_dim=3)
        params = layer_coo.init(jax.random.PRNGKey(1), g, g.x)["params"]
        out_coo = np.asarray(layer_coo.apply({"params": params}, g, g.x))[:n]

        layer_grid = GridGATConv(out_channels=12, heads=3, concat=True,
                                 edge_dim=3)
        out_grid = layer_grid.apply({"params": params}, feats, v, nbr, eattr)
        out_grid = np.asarray(out_grid)[bg.rows[:n], bg.cols[:n]]
        np.testing.assert_allclose(out_grid, out_coo, rtol=2e-4, atol=2e-5)

    def test_single_layer_4conn_no_edge(self):
        depth, valid = masked_grid()
        bg, (feats, v, nbr, eattr, _) = build_both(depth, valid, connectivity=4)
        g = bg.graph
        n = bg.num_nodes
        layer_coo = GATConv(out_channels=8, heads=2, concat=False, edge_dim=None)
        params = layer_coo.init(jax.random.PRNGKey(2), g, g.x)["params"]
        out_coo = np.asarray(layer_coo.apply({"params": params}, g, g.x))[:n]
        layer_grid = GridGATConv(out_channels=8, heads=2, concat=False,
                                 edge_dim=None, connectivity=4)
        out_grid = layer_grid.apply({"params": params}, feats, v, nbr, eattr)
        out_grid = np.asarray(out_grid)[bg.rows[:n], bg.cols[:n]]
        np.testing.assert_allclose(out_grid, out_coo, rtol=2e-4, atol=2e-5)


class TestFullModelParity:
    def test_full_model(self):
        depth, valid = masked_grid(40, 40)
        bg, (feats, v, nbr, eattr, _) = build_both(depth, valid)
        g = bg.graph
        n = bg.num_nodes

        coo_model = BathymetricGNN(hidden_channels=16, num_layers=3, heads=2)
        variables = coo_model.init(jax.random.PRNGKey(0), g)
        out_coo = coo_model.apply(variables, g)

        grid_model = GridBathymetricGNN(hidden_channels=16, num_layers=3,
                                        heads=2)
        grid_vars = {
            "params": params_from_coo(variables["params"], 3),
            "batch_stats": params_from_coo(variables["batch_stats"], 3),
        }
        out_grid = grid_model.apply(grid_vars, feats, v, nbr, eattr)

        rows, cols = bg.rows[:n], bg.cols[:n]
        for key in ("class_logits", "confidence", "correction"):
            a = np.asarray(out_grid[key])[rows, cols]
            b = np.asarray(out_coo[key])[:n]
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4,
                                       err_msg=key)

    def test_batchnorm_stats_note(self):
        # COO path computes batch stats over live nodes; grid path over
        # valid cells — same set, so train-mode stats must match too.
        depth, valid = masked_grid(24, 24)
        bg, (feats, v, nbr, eattr, _) = build_both(depth, valid)
        g = bg.graph
        coo_model = BathymetricGNN(hidden_channels=8, num_layers=2, heads=2,
                                   dropout=0.0)
        variables = coo_model.init(jax.random.PRNGKey(0), g)
        out_coo, upd_coo = coo_model.apply(
            variables, g, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
        )
        grid_model = GridBathymetricGNN(hidden_channels=8, num_layers=2,
                                        heads=2, dropout=0.0)
        gvars = {
            "params": params_from_coo(variables["params"], 2),
            "batch_stats": params_from_coo(variables["batch_stats"], 2),
        }
        out_grid, upd_grid = grid_model.apply(
            gvars, feats, v, nbr, eattr, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
        )
        a = np.asarray(upd_grid["batch_stats"]["MaskedBatchNorm_0"]["mean"])
        b = np.asarray(upd_coo["batch_stats"]["GNNBackbone_0"]
                       ["MaskedBatchNorm_0"]["mean"])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
