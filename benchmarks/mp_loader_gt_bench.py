"""Multi-process loader on its claimed payoff case (VERDICT r4 item 7):
ground-truth tile loading over a deflate-compressed GT raster.

The r4 measurement covered only the WORST case (cheap synthetic samples,
IPC-dominated, 0.55x on this 2-core host). Here the per-item host work is
real raster IO: windowed strip decompression of a 5-band deflate GeoTIFF
(round 5 made GroundTruthTileDataset.raw_item windowed) plus feature
extraction, which is the workload the reference's own num_workers=4
assumed. Reports samples/s for in-process vs 2-worker loading, and the
raw_item cost alone.

Run: python benchmarks/mp_loader_gt_bench.py [--size 4096] [--tile 512]
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
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    from bathymetric_gnn_tpu.config.config import (BucketConfig, Config,
                                                   TrainingConfig)
    from bathymetric_gnn_tpu.io.geotiff import write_geotiff
    from bathymetric_gnn_tpu.training.datasets import (
        GroundTruthTileDataset, epoch_batches)
    from bathymetric_gnn_tpu.utils.mp_loader import ProcessSampleLoader

    n = args.size
    rg = np.random.default_rng(0)
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    clean = (30 + 8 * np.sin(xx / 37) + 5 * np.cos(yy / 23)
             + rg.normal(0, 0.05, (n, n))).astype(np.float32)
    spikes = rg.random((n, n)) < 0.03
    noisy = np.where(spikes, clean + rg.uniform(1, 6, (n, n))
                     * rg.choice([-1, 1], (n, n)), clean).astype(np.float32)
    labels = np.where(spikes, 2.0, 0.0).astype(np.float32)
    diff = (noisy - clean).astype(np.float32)
    unc = np.full((n, n), 0.3, np.float32)
    tmp = Path(tempfile.mkdtemp(prefix="mp_gt_"))
    gt_path = tmp / "gt.tif"
    t0 = time.time()
    write_geotiff(gt_path, np.stack([labels, diff, noisy, clean, unc]),
                  pixel_scale=(1.0, 1.0), origin=(0.0, 0.0), nodata=-1.0)
    size_mb = gt_path.stat().st_size / 1e6
    print(f"# wrote {size_mb:.0f} MB deflate GT raster in "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    cfg = Config(bucket=BucketConfig(node_buckets=(args.tile * args.tile,)),
                 training=TrainingConfig(batch_size=args.batch))
    ds = GroundTruthTileDataset([str(gt_path)], cfg, tile_size=args.tile,
                                overlap=64, min_valid_ratio=0.1,
                                cache_size=0)
    n_tiles = len(ds)

    # raw_item cost alone (the worker-side half)
    t0 = time.time()
    for i in range(min(8, n_tiles)):
        ds.raw_item(i)
    raw_ms = (time.time() - t0) / min(8, n_tiles) * 1e3

    def run_epoch(batches):
        count = 0
        t0 = time.time()
        for graph, targets in batches:
            count += graph.node_mask.shape[0]
        return count / (time.time() - t0)

    rng = np.random.default_rng(0)
    inproc = run_epoch(epoch_batches(ds, args.batch, rng))

    loader = ProcessSampleLoader(ds, num_workers=args.workers)
    try:
        # warm the pool (spawn + first imports), then measure one epoch
        next(iter(loader.epoch_batches(args.batch, rng)))
        mp_rate = run_epoch(loader.epoch_batches(args.batch, rng))
    finally:
        loader.close()

    print(json.dumps({
        "metric": "mp_loader_gt",
        "raster_mb": round(size_mb, 1),
        "tiles": n_tiles,
        "raw_item_ms": round(raw_ms, 1),
        "inprocess_samples_per_s": round(inproc, 2),
        f"mp{args.workers}_samples_per_s": round(mp_rate, 2),
        "speedup": round(mp_rate / max(inproc, 1e-9), 2),
    }))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
