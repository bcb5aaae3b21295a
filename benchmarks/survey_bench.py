"""End-to-end survey inference benchmark: tiles/s and cells/s.

Generates a synthetic survey, runs the full tiled pipeline (load -> tile ->
dense-grid forward -> Hann stitch -> corrections -> write), reports
throughput. BASELINE metric: tiles/s full-survey inference.

Run: python benchmarks/survey_bench.py [--size 2048] [--tile 256]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--overlap", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args()

    import jax

    from bathymetric_gnn_tpu.config.config import (Config, ModelConfig,
                                                   TileConfig)
    from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
    from bathymetric_gnn_tpu.inference.pipeline import BathymetricPipeline
    from bathymetric_gnn_tpu.io.geotiff import write_geotiff
    from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN

    n = args.size
    rg = np.random.default_rng(0)
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    depth = (30 + 8 * np.sin(xx / 90) + 5 * np.cos(yy / 70)
             + rg.normal(0, 0.05, (n, n))).astype(np.float32)
    # a swath gap like real surveys
    depth[:, n // 2 - 20:n // 2 - 10] = np.nan

    cfg = Config(
        model=ModelConfig(hidden_channels=args.hidden, num_layers=args.layers,
                          heads=4, compute_dtype="bfloat16"),
        tile=TileConfig(tile_size=args.tile, overlap=args.overlap,
                        min_valid_ratio=0.05),
    )
    pipe = BathymetricPipeline(cfg)

    # random-init model (throughput benchmark; quality irrelevant here)
    model = GridBathymetricGNN(hidden_channels=args.hidden,
                               num_layers=args.layers, heads=4)
    f, v, nb, ea, _ = build_grid_inputs(
        depth[:args.tile, :args.tile].copy(), np.ones((args.tile, args.tile),
                                                      bool))
    variables = model.init(jax.random.PRNGKey(0), f, v, nb, ea)
    pipe.use_variables(variables["params"], variables["batch_stats"],
                       from_coo=False)

    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "survey.tif"
        write_geotiff(src, depth[None], pixel_scale=(0.5, 0.5),
                      origin=(0.0, 0.0))
        # first pass includes jit compilation; report the warmed second pass
        t0 = time.perf_counter()
        pipe.process(src, Path(td) / "out.tif")
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        stats = pipe.process(src, Path(td) / "out.tif")
        wall = time.perf_counter() - t0

    out = {
        "survey_cells": n * n,
        "tiles": stats["tiles_processed"],
        "cold_wall_s": round(cold, 2),
        "wall_s": round(wall, 2),
        "tiles_per_s": round(stats["tiles_processed"] / wall, 2),
        "Mcells_per_s": round(n * n / wall / 1e6, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
