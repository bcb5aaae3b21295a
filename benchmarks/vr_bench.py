"""Native VR refinement-grid inference throughput.

Judge config #4 (BASELINE.json): "native VR-BAG processing:
per-refinement-grid graphs (3x3..50x50), confidence + uncertainty-scaling
outputs". Generates a realistic mix of refinement-grid sizes (reference:
data/vr_bag.py:243 iterates 3x3..50x50 grids), runs them through
NativeVRProcessor end to end (host featurization/batching + device
forward + un-batching), and reports grids/s and Mnodes/s.

Prints one JSON line. Run on the real TPU.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def make_refinements(n_grids: int, seed: int = 0):
    """Mixed refinement grids: sizes 3..50, depth ramps + noise, ~5%
    invalid cells (NODATA), per-grid resolutions 0.5..4 m."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(3, 51, size=(n_grids, 2))
    grids = []
    for i in range(n_grids):
        h, w = int(sizes[i, 0]), int(sizes[i, 1])
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        depth = (20.0 + rng.uniform(-5, 5) + 0.1 * xx + 0.05 * yy
                 + rng.normal(0, 0.05, (h, w)).astype(np.float32))
        invalid = rng.random((h, w)) < 0.05
        depth[invalid] = 1.0e6  # BAG NODATA
        uncert = np.full((h, w), 0.25, np.float32)
        res = float(rng.uniform(0.5, 4.0))
        grids.append((depth, uncert, (res, res)))
    return grids


def run(processor, grids):
    n_results = 0
    for depth, uncert, res in grids:
        processor.add_to_batch(depth, uncert, res)
        if processor.batch_ready():
            n_results += len(processor.flush_batch())
    n_results += len(processor.drain())
    return n_results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-grids", type=int, default=2000)
    ap.add_argument("--mode", choices=("grid", "ell", "noslab"),
                    default="grid",
                    help="grid = slab through the dense shifted-window "
                         "fast path (default); ell = slab through the "
                         "gather ELL model; noslab = per-grid device "
                         "build (one compile per refinement shape — slow "
                         "on first pass)")
    ap.add_argument("--node-budget", type=int, default=50000)
    args = ap.parse_args()

    import jax

    from bathymetric_gnn_tpu.inference.native_vr import NativeVRProcessor
    from bathymetric_gnn_tpu.models.gnn import BathymetricGNN

    model = BathymetricGNN(hidden_channels=64, num_layers=4, heads=4)
    # init via a small built graph to get the full variables tree
    # (jitted: eager flax init issues hundreds of tiny device ops, which
    # is pathological over the TPU tunnel)
    from bathymetric_gnn_tpu.config.config import BucketConfig, GraphConfig
    from bathymetric_gnn_tpu.data.graph_build import GraphBuilder

    gb = GraphBuilder(GraphConfig(), BucketConfig(node_buckets=(4096,)))
    d0 = 20.0 + np.random.default_rng(1).normal(0, 1, (32, 32)).astype(
        np.float32)
    bg = gb.build_graph(d0, np.ones((32, 32), bool))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), bg.graph)

    processor = NativeVRProcessor(
        model, variables, node_budget=args.node_budget,
        use_ell=True, use_slab=args.mode != "noslab",
        use_grid=args.mode == "grid")

    grids = make_refinements(args.n_grids)
    n_nodes = sum(int(np.sum(np.isfinite(d) & (np.abs(d) < 1e5)))
                  for d, _, _ in grids)

    # warm (compile all buckets)
    run(processor, grids[: max(200, args.n_grids // 4)])

    t0 = time.perf_counter()
    n = run(processor, grids)
    dt = time.perf_counter() - t0
    assert n == args.n_grids, (n, args.n_grids)
    print(json.dumps({
        "mode": args.mode,
        "n_grids": args.n_grids,
        "n_nodes": n_nodes,
        "wall_s": round(dt, 3),
        "grids_per_s": round(args.n_grids / dt, 1),
        "Mnodes_per_s": round(n_nodes / dt / 1e6, 3),
    }))


if __name__ == "__main__":
    main()
