"""Flagship-scale streaming inference: big-survey tiles/s under an RSS cap.

BASELINE config #5 is a 60,000 x 60,000 survey (~3.6B cells, ~14 GB of f32
per full-grid array) — far beyond what the reference's in-memory pipeline
(reference: models/pipeline.py:160) can hold. This bench PROVES the
O(band) streaming path: it synthesizes a survey directly to disk row-band
by row-band (never materializing the grid), then runs
StreamingPipeline.process_streaming and reports throughput and the
process's peak RSS.

Run: python benchmarks/streaming_survey_bench.py [--size 16384]
     [--tile 256] [--rss-cap-gb 4]
"""

import argparse
import json
import resource
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def synthesize_survey_streaming(path, n, chunk=1024, seed=0):
    """Write an [n, n] synthetic survey GeoTIFF in row bands (O(chunk*n)
    memory): swell + shoal features + sensor noise + a swath gap."""
    from bathymetric_gnn_tpu.io.geotiff import StreamingGeoTiffWriter

    rg = np.random.default_rng(seed)
    w = StreamingGeoTiffWriter(path, n, n, 1, pixel_scale=(1.0, 1.0),
                               origin=(0.0, float(n)),
                               nodata=float("nan"), rows_per_strip=chunk)
    xx = np.arange(n, dtype=np.float32)[None, :]
    for r0 in range(0, n, chunk):
        r1 = min(r0 + chunk, n)
        yy = np.arange(r0, r1, dtype=np.float32)[:, None]
        band = (30 + 8 * np.sin(xx / 90) + 5 * np.cos(yy / 70)
                + 2 * np.sin(xx / 17 + yy / 23)
                + rg.normal(0, 0.05, (r1 - r0, n))).astype(np.float32)
        band[:, n // 2 - 20:n // 2 - 10] = np.nan   # swath gap
        w.write_rows(0, r0, band)
    w.close()


def measure_tunnel_retention(iters=24, mb=8):
    """Per-run calibration of the axon tunnel's host-RSS retention per
    uploaded byte (RESULTS.md round-3 forensics measured ~0.9 B/B and
    that .delete()/gc/clear_caches don't release it). Uploading a known
    volume and reading the RSS delta validates the coefficient for THIS
    run instead of crediting a fixed estimate — if the client stops
    retaining, the credit drops to ~0 and the raw gate applies."""
    import gc

    import jax
    import numpy as np

    def vm_rss_bytes():
        # CURRENT RSS, not ru_maxrss: the r4 60k run proved the monotone
        # high-water mark is unusable here — after processing, RSS sits
        # far below the peak, so calibration uploads never registered and
        # the measured coefficient collapsed to 0.0 (log: coeff 0.0 at
        # peak 25.67 GB with a predicted 23.5 GB retained). VmRSS sees
        # retention growth immediately regardless of the historical peak.
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
        return 0

    dev = jax.devices()[0]
    chunk = np.empty(mb << 20, np.uint8)
    # distinct contents defeat any dedup/caching in the client
    rss0 = vm_rss_bytes()
    for i in range(iters):
        chunk[:8] = np.frombuffer(np.int64(i).tobytes(), np.uint8)
        a = jax.device_put(chunk, dev)
        a.block_until_ready()
        a.delete()
    gc.collect()
    rss1 = vm_rss_bytes()
    coeff = (rss1 - rss0) / (iters * (mb << 20))
    return min(max(coeff, 0.0), 1.2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=16384)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--overlap", type=int, default=32)
    ap.add_argument("--rss-cap-gb", type=float, default=4.0,
                    help="fail if peak RSS exceeds this")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from bathymetric_gnn_tpu.config.config import (Config, ModelConfig,
                                                   TileConfig)
    from bathymetric_gnn_tpu.inference.streaming import StreamingPipeline

    n = args.size
    tmpdir = Path(tempfile.mkdtemp(prefix="stream_bench_"))
    src = tmpdir / "survey.tif"
    dst = tmpdir / "survey_clean.tif"

    t0 = time.time()
    synthesize_survey_streaming(src, n)
    t_synth = time.time() - t0
    print(f"# synthesized {n}x{n} survey in {t_synth:.1f}s "
          f"({src.stat().st_size / 1e9:.2f} GB)", file=sys.stderr)

    cfg = Config(
        model=ModelConfig(hidden_channels=64, num_layers=4, heads=4,
                          compute_dtype="bfloat16"),
        tile=TileConfig(tile_size=args.tile, overlap=args.overlap,
                        min_valid_ratio=0.01),
    )
    import jax

    from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
    from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN

    pipe = StreamingPipeline(cfg)
    # random-init model (throughput benchmark; quality irrelevant here)
    model = GridBathymetricGNN(hidden_channels=64, num_layers=4, heads=4)
    t = args.tile
    probe = np.zeros((t, t), np.float32)
    f, v, nb, ea, _ = build_grid_inputs(probe, np.ones((t, t), bool))
    variables = model.init(jax.random.PRNGKey(0), f, v, nb, ea)
    pipe.use_variables(variables["params"], variables["batch_stats"],
                       from_coo=False)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on Linux
    t0 = time.time()
    stats = pipe.process_streaming(src, dst)
    dt = time.time() - t0
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    tiles = stats["tiles_processed"]
    cells = n * n
    # The remote "axon" tunnel's client RETAINS ~0.9 B of host RSS per
    # byte uploaded (minimal repro in benchmarks/RESULTS.md round 3:
    # 2.1 GB uploaded -> +1.86 GB RSS; .delete()/gc/clear_caches don't
    # release it; the identical pipeline run on a hardware-attached CPU
    # backend holds FLAT RSS). Estimate and report that infrastructure
    # overhead so the gate measures the PIPELINE's O(band) behavior.
    version = getattr(jax.devices()[0].client, "platform_version", "")
    on_tunnel = "axon" in version
    upload_gb = tiles * args.tile * args.tile * 5 / 1e9  # f32 depth + valid
    # validate the retention coefficient for THIS run (advisor r3): only
    # the measured fraction of the upload volume is credited to the
    # tunnel, so a real pipeline-RSS regression can't hide behind a
    # fixed estimate. Calibrating AFTER the run is conservative: ru_maxrss
    # is monotone and retained bytes are never released, so calibration
    # uploads grow maxrss only by NEW retention (if current RSS sits a
    # little under the peak, the first uploads don't register and the
    # coefficient — hence the credit — only shrinks).
    if on_tunnel:
        try:
            retention_coeff = measure_tunnel_retention()
        except Exception as e:   # never lose an 85-min run's result here
            print(f"# retention calibration failed ({e}); crediting the "
                  f"full upload volume (pre-r4 behavior)", file=sys.stderr)
            retention_coeff = 1.0
    else:
        retention_coeff = 0.0
    credited_gb = retention_coeff * upload_gb if on_tunnel else 0.0
    pipeline_rss_gb = peak_rss_gb - credited_gb
    result = {
        "metric": "streaming_survey_inference",
        "size": n, "tile": args.tile,
        "tiles_processed": tiles,
        "seconds": round(dt, 2),
        "tiles_per_s": round(tiles / dt, 2),
        "mcells_per_s": round(cells / dt / 1e6, 3),
        "peak_rss_gb": round(peak_rss_gb, 3),
        "rss_at_start_gb": round(rss0 / 1e6, 3),
        "tunnel_retention_coeff_measured": round(retention_coeff, 3),
        "tunnel_retained_upload_gb_est": round(credited_gb, 2),
        "pipeline_rss_gb": round(pipeline_rss_gb, 3),
        "out_gb": round(dst.stat().st_size / 1e9, 2),
    }
    print(json.dumps(result))
    if not args.keep:
        src.unlink()
        dst.unlink()
        tmpdir.rmdir()
    assert pipeline_rss_gb < args.rss_cap_gb, (
        f"pipeline RSS {pipeline_rss_gb:.2f} GB (peak {peak_rss_gb:.2f} "
        f"minus tunnel-retained uploads) exceeds cap {args.rss_cap_gb} GB")


if __name__ == "__main__":
    main()
