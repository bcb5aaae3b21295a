"""Microbenchmarks: COO vs ELL vs grid message-passing paths, dtypes.

Run on the real TPU: python benchmarks/micro_bench.py
Results recorded in benchmarks/RESULTS.md across rounds.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from bench_util import time_fn


def main(iters=12):
    import jax
    import jax.numpy as jnp

    from bathymetric_gnn_tpu.config.config import BucketConfig, GraphConfig
    from bathymetric_gnn_tpu.data.graph_build import (GraphBuilder,
                                                      build_grid_inputs)
    from bathymetric_gnn_tpu.models.conv import GATConv
    from bathymetric_gnn_tpu.models.conv_ell import GATConvELL
    from bathymetric_gnn_tpu.models.grid_gat import (GridBathymetricGNN,
                                                     GridGATConv)
    from bathymetric_gnn_tpu.ops.ell import coo_to_ell

    results = {}
    h = w = 256
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base_depth = 30.0 + 0.05 * xx + 0.5 * np.sin(yy / 7.0)
    valid = np.ones((h, w), bool)

    gb = GraphBuilder(GraphConfig(), BucketConfig(node_buckets=(h * w,)))
    bg = gb.build_graph(base_depth, valid)
    g = bg.graph
    ell = coo_to_ell(g)
    n_edges = int(np.asarray(g.edge_mask).sum())
    results["n_edges"] = n_edges

    rg = np.random.default_rng(0)
    kwargs = dict(out_channels=64, heads=4, concat=True, edge_dim=3)
    layer_coo = GATConv(**kwargs)
    xs = [jnp.asarray(rg.normal(size=(g.num_nodes_padded, 64))
                      .astype(np.float32)) for _ in range(4)]
    params = layer_coo.init(jax.random.PRNGKey(0), g, xs[0])["params"]

    coo_fwd = jax.jit(
        lambda p, gg, xx_: layer_coo.apply({"params": p}, gg, xx_))
    dt = time_fn(coo_fwd, [(params, g, x) for x in xs], iters=iters)
    results["coo_layer_Medges_per_s"] = round(n_edges / dt / 1e6, 1)

    layer_ell = GATConvELL(**kwargs)
    ell_fwd = jax.jit(
        lambda p, gg, xx_: layer_ell.apply({"params": p}, gg, xx_))
    dt = time_fn(ell_fwd, [(params, ell, x) for x in xs], iters=iters)
    results["ell_layer_Medges_per_s"] = round(n_edges / dt / 1e6, 1)

    feats, v, nbr, eattr, _ = build_grid_inputs(base_depth, valid)
    xgs = [x[: h * w].reshape(h, w, 64) for x in xs]
    for dtype in ("float32", "bfloat16"):
        layer_grid = GridGATConv(**kwargs, compute_dtype=dtype)
        grid_fwd = jax.jit(
            lambda p, xx_, vv, nn, ee: layer_grid.apply(
                {"params": p}, xx_, vv, nn, ee))
        dt = time_fn(grid_fwd, [(params, xg, v, nbr, eattr) for xg in xgs], iters=iters)
        results[f"grid_layer_{dtype}_Medges_per_s"] = round(
            n_edges / dt / 1e6, 1)

    # full flagship model fwd (featurization included), f32 vs bf16
    depths = [jnp.asarray(base_depth + i * 0.001) for i in range(4)]
    vj = jnp.asarray(valid)
    for dtype in ("float32", "bfloat16"):
        model = GridBathymetricGNN(hidden_channels=64, num_layers=4, heads=4,
                                   compute_dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0), feats, v, nbr, eattr)

        @jax.jit
        def fwd(variables, depth, valid):
            f_, v_, n_, e_, _ = build_grid_inputs(depth, valid)
            return model.apply(variables, f_, v_, n_, e_)["class_logits"]

        dt = time_fn(fwd, [(variables, d, vj) for d in depths], iters=iters)
        results[f"model_fwd_{dtype}_Medges_per_s"] = round(
            n_edges * 4 / dt / 1e6, 1)
        results[f"model_fwd_{dtype}_ms"] = round(dt * 1e3, 3)

    # training step (grad) on the grid model
    model = GridBathymetricGNN(hidden_channels=64, num_layers=4, heads=4,
                               dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), feats, v, nbr, eattr)
    labels = jnp.asarray(rg.integers(0, 3, (h, w)).astype(np.int32))

    @jax.jit
    def train_grad(params, depth, valid):
        def loss(p):
            f_, v_, n_, e_, _ = build_grid_inputs(depth, valid)
            out = model.apply({"params": p,
                               "batch_stats": variables["batch_stats"]},
                              f_, v_, n_, e_)
            lp = jax.nn.log_softmax(out["class_logits"])
            return -jnp.mean(jnp.take_along_axis(
                lp, labels[..., None], -1))
        return jax.grad(loss)(params)

    dt = time_fn(train_grad, [(variables["params"], d, vj) for d in depths], iters=iters)
    results["model_fwd_bwd_Medges_per_s"] = round(n_edges * 4 / dt / 1e6, 1)
    results["model_fwd_bwd_ms"] = round(dt * 1e3, 3)

    # k-NN config (BASELINE): 65536 nodes, k=8
    pos = rg.uniform(0, 256, (h * w, 2)).astype(np.float32)
    xfeat = rg.normal(size=(h * w, 7)).astype(np.float32)
    bg_knn = gb.build_knn_graph(xfeat, pos, k=8)
    ell_knn = coo_to_ell(bg_knn.graph)
    n_edges_knn = int(np.asarray(bg_knn.graph.edge_mask).sum())
    xk = [jnp.asarray(rg.normal(size=(bg_knn.graph.num_nodes_padded, 64))
                      .astype(np.float32)) for _ in range(4)]
    dt = time_fn(ell_fwd, [(params, ell_knn, x) for x in xk], iters=iters)
    results["ell_knn_layer_Medges_per_s"] = round(n_edges_knn / dt / 1e6, 1)
    dt = time_fn(coo_fwd, [(params, bg_knn.graph, x) for x in xk], iters=6)
    results["coo_knn_layer_Medges_per_s"] = round(n_edges_knn / dt / 1e6, 1)

    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
