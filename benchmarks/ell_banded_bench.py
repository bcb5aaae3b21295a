"""Sparse-path (k-NN ELL) layer benchmark: XLA gathers vs banded kernel.

The BASELINE.json config #1 workload: 65,536 Morton-ordered nodes, k=8
k-NN graph, one GAT layer (in 64 -> 4 heads x 64). Times four paths with
the scan-marginal methodology (see bench.py):

  ell_xla        — plain ELL, XLA gathers (round-1 path, ~28 M edges/s)
  banded_xla     — band/spill decomposition, still XLA gathers
  banded_pallas  — fused Pallas band kernel, f32 streams
  banded_pallas_bf16 — same, bf16 streams (f32 softmax/accum in-kernel)

Usage: python benchmarks/ell_banded_bench.py [--nodes 65536] [--band 256]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS_SHORT = 10
ITERS_LONG = 60


def marginal_time(fn, x0):
    """Two-point scan-marginal seconds/iter for y = fn(x) chained."""
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def scan_steps(x):
            def body(carry, _):
                out = fn(carry)
                return carry + 1e-20 * out[:, :carry.shape[1]], ()

            y, _ = jax.lax.scan(body, x, None, length=n)
            return y

        return scan_steps

    short, long_ = make(ITERS_SHORT), make(ITERS_LONG)
    float(jnp.sum(short(x0)))
    float(jnp.sum(long_(x0)))
    ts, tl = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(short(x0)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jnp.sum(long_(x0)))
        tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (ITERS_LONG - ITERS_SHORT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=65536)
    ap.add_argument("--band", type=int, default=256)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--paths", default="ell_xla,banded_xla,banded_pallas,"
                                       "banded_pallas_bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bathymetric_gnn_tpu.config.config import BucketConfig, GraphConfig
    from bathymetric_gnn_tpu.data.graph_build import GraphBuilder
    from bathymetric_gnn_tpu.models.conv_ell import (GATConvELL,
                                                     GATConvEllBanded)
    from bathymetric_gnn_tpu.ops.ell import coo_to_ell
    from bathymetric_gnn_tpu.ops.ell_banded import band_ell

    n = args.nodes
    rg = np.random.default_rng(0)
    # survey-like point cloud: jittered grid (what VR soundings look like)
    side = int(np.sqrt(n))
    yy, xx = np.mgrid[0:side, 0:side].astype(np.float32)
    pos = np.stack([xx.ravel(), yy.ravel()], -1)[:n]
    pos = pos + rg.normal(0, 0.25, pos.shape).astype(np.float32)
    depth = (30 + rg.normal(0, 2, len(pos))).astype(np.float32)
    x_feat = rg.normal(size=(len(pos), 64)).astype(np.float32)

    gb = GraphBuilder(GraphConfig(), BucketConfig(node_buckets=(n,)))
    bg = gb.build_knn_graph(x_feat, pos, k=args.k, depth=depth)
    g = coo_to_ell(bg.graph, max_degree=args.k)
    banded = band_ell(g, band_rows=args.band)
    n_edges = int(np.asarray(g.nbr_mask).sum())
    spill = banded.spill_fraction(g)

    x0 = jnp.asarray(rg.normal(size=(g.num_nodes_padded, 64))
                     .astype(np.float32))
    results = {"nodes": g.num_nodes_padded, "edges": n_edges,
               "band_rows": args.band, "spill_fraction": round(spill, 5),
               "backend": jax.default_backend()}

    layer_xla = GATConvELL(out_channels=64, heads=4, edge_dim=3)
    params = layer_xla.init(jax.random.PRNGKey(0), g, x0)

    def bench(name, fn):
        dt = marginal_time(fn, x0)
        results[name + "_ms"] = round(dt * 1e3, 3)
        results[name + "_Medges_per_s"] = round(n_edges / dt / 1e6, 1)

    paths = args.paths.split(",")
    if "ell_xla" in paths:
        bench("ell_xla", lambda x: layer_xla.apply(params, g, x))
    if "banded_xla" in paths:
        lb = GATConvEllBanded(out_channels=64, heads=4, edge_dim=3)
        bench("banded_xla", lambda x: lb.apply(params, g, banded, x))
    if "banded_pallas" in paths:
        lp = GATConvEllBanded(out_channels=64, heads=4, edge_dim=3,
                              use_pallas=True)
        bench("banded_pallas", lambda x: lp.apply(params, g, banded, x))
    if "banded_pallas_legacy" in paths:
        # round-2 path: band kernel + XLA spill fold/renorm
        ll = GATConvEllBanded(out_channels=64, heads=4, edge_dim=3,
                              use_pallas=True, spill_in_kernel=False)
        bench("banded_pallas_legacy",
              lambda x: ll.apply(params, g, banded, x))
    if "banded_pallas_bf16" in paths:
        lpb = GATConvEllBanded(out_channels=64, heads=4, edge_dim=3,
                               use_pallas=True, compute_dtype="bfloat16")
        bench("banded_pallas_bf16", lambda x: lpb.apply(params, g, banded, x))

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
