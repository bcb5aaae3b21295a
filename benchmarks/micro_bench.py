"""Microbenchmarks: COO vs ELL sparse paths, grid path, dtype variants.

Run on the real TPU: python benchmarks/micro_bench.py
Results recorded in benchmarks/RESULTS.md across rounds.
"""

import json
import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from bathymetric_gnn_tpu.config.config import BucketConfig, GraphConfig
    from bathymetric_gnn_tpu.data.graph_build import (GraphBuilder,
                                                      build_grid_inputs)
    from bathymetric_gnn_tpu.models.conv import GATConv
    from bathymetric_gnn_tpu.models.conv_ell import GATConvELL
    from bathymetric_gnn_tpu.models.grid_gat import GridGATConv
    from bathymetric_gnn_tpu.ops.ell import coo_to_ell

    results = {}
    h = w = 256
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = 30.0 + 0.05 * xx + 0.5 * np.sin(yy / 7.0)
    valid = np.ones((h, w), bool)

    gb = GraphBuilder(GraphConfig(), BucketConfig(node_buckets=(h * w,)))
    bg = gb.build_graph(depth, valid)
    g = bg.graph
    ell = coo_to_ell(g)
    n_edges = int(np.asarray(g.edge_mask).sum())
    results["n_edges"] = n_edges

    # single GAT layer, 64 hidden x 4 heads
    kwargs = dict(out_channels=64, heads=4, concat=True, edge_dim=3)
    layer_coo = GATConv(**kwargs)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(g.num_nodes_padded, 64)).astype(np.float32))
    params = layer_coo.init(jax.random.PRNGKey(0), g, x)["params"]

    coo_fwd = jax.jit(lambda p, gg, xx_: layer_coo.apply({"params": p}, gg, xx_))
    dt = timeit(coo_fwd, params, g, x)
    results["coo_layer_edges_per_s"] = round(n_edges / dt)

    layer_ell = GATConvELL(**kwargs)
    ell_fwd = jax.jit(lambda p, gg, xx_: layer_ell.apply({"params": p}, gg, xx_))
    dt = timeit(ell_fwd, params, ell, x)
    results["ell_layer_edges_per_s"] = round(n_edges / dt)

    # grid layer
    feats, v, nbr, eattr, _ = build_grid_inputs(depth, valid)
    layer_grid = GridGATConv(**kwargs)
    xg = x[: h * w].reshape(h, w, 64)
    grid_fwd = jax.jit(
        lambda p, xx_, vv, nn, ee: layer_grid.apply({"params": p}, xx_, vv,
                                                    nn, ee))
    dt = timeit(grid_fwd, params, xg, v, nbr, eattr)
    results["grid_layer_edges_per_s"] = round(n_edges / dt)

    # grid layer in bf16 activations
    xg16 = xg.astype(jnp.bfloat16)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    dt = timeit(grid_fwd, p16, xg16, v, nbr, eattr)
    results["grid_layer_bf16_edges_per_s"] = round(n_edges / dt)

    # backward pass (grid)
    def loss(p, xx_, vv, nn, ee):
        return jnp.sum(layer_grid.apply({"params": p}, xx_, vv, nn, ee) ** 2)

    grid_bwd = jax.jit(jax.grad(loss))
    dt = timeit(grid_bwd, params, xg, v, nbr, eattr)
    results["grid_layer_bwd_edges_per_s"] = round(n_edges / dt)

    # k-NN graph (BASELINE config): 65536 nodes, k=8
    rg = np.random.default_rng(0)
    pos = rg.uniform(0, 256, (h * w, 2)).astype(np.float32)
    xfeat = rg.normal(size=(h * w, 7)).astype(np.float32)
    t0 = time.perf_counter()
    bg_knn = gb.build_knn_graph(xfeat, pos, k=8)
    results["knn_build_s"] = round(time.perf_counter() - t0, 3)
    ell_knn = coo_to_ell(bg_knn.graph)
    xk = jnp.asarray(rg.normal(size=(bg_knn.graph.num_nodes_padded,
                                     64)).astype(np.float32))
    n_edges_knn = int(np.asarray(bg_knn.graph.edge_mask).sum())
    dt = timeit(ell_fwd, params, ell_knn, xk)
    results["ell_knn_layer_edges_per_s"] = round(n_edges_knn / dt)
    dt = timeit(coo_fwd, params, bg_knn.graph, xk)
    results["coo_knn_layer_edges_per_s"] = round(n_edges_knn / dt)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
