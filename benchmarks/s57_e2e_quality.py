"""S-57 end-to-end quality experiment (VERDICT r4 item 3b).

Drives the full production feature-class path as ONE experiment, with
every stage going through the real CLIs/libraries:

  1. synthesize a clean survey with REAL bathymetric feature structure
     (wreck ridges + rock bumps stamped at known positions), noise it
     with the synthetic generator (no feature injection — class-1 labels
     come from S-57, as in production),
  2. write a native ISO-8211 S-57 .000 cell (io/s57_8211.S57Writer) with
     WRECKS/UWTROC/OBSTRN point features at those positions (+ SOUNDG
     that must NOT label),
  3. run cli extract-s57-features on the cell (parse check + GeoJSON),
  4. run cli prepare-ground-truth --s57 CELL.000 (class-1 discs overlay
     the diff-threshold labels),
  5. train the flagship COO model on the GT tiles (train split),
  6. evaluate 3-class metrics on held-out GT tiles.

Reference axis: scripts/extract_s57_features.py:784 +
scripts/prepare_ground_truth.py:99 + docs/TRAINING_PLAN.md:894 (the
reference's Phase 3, which never shipped there).

Run: python benchmarks/s57_e2e_quality.py [--size 1024] [--epochs 30]
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
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--weight-smoothing", type=float, default=0.01)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from bathymetric_gnn_tpu.cli import (extract_s57_features,
                                         prepare_ground_truth)
    from bathymetric_gnn_tpu.config.config import (BucketConfig, Config,
                                                   ModelConfig,
                                                   TrainingConfig)
    from bathymetric_gnn_tpu.data.synthetic_noise import \
        SyntheticNoiseGenerator
    from bathymetric_gnn_tpu.io.geotiff import write_geotiff
    from bathymetric_gnn_tpu.io.s57_8211 import S57Writer
    from bathymetric_gnn_tpu.models.gnn import make_model
    from bathymetric_gnn_tpu.training import losses as L
    from bathymetric_gnn_tpu.training.datasets import GroundTruthTileDataset
    from bathymetric_gnn_tpu.training.evaluation import (compute_metrics,
                                                         print_metrics)
    from bathymetric_gnn_tpu.training.trainer import Trainer

    n = args.size
    rg = np.random.default_rng(args.seed)
    tmp = Path(tempfile.mkdtemp(prefix="s57_e2e_"))

    # --- 1. clean survey with real feature structure -------------------
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    clean = (30 + 8 * np.sin(xx / 90) + 5 * np.cos(yy / 70)
             + rg.normal(0, 0.05, (n, n))).astype(np.float32)
    feats = []  # (kind, row, col)
    n_wreck, n_rock, n_obstr = 10, 12, 6
    margin = 80
    for kind, count in (("WRECKS", n_wreck), ("UWTROC", n_rock),
                        ("OBSTRN", n_obstr)):
        for _ in range(count):
            r = int(rg.integers(margin, n - margin))
            c = int(rg.integers(margin, n - margin))
            size = float(rg.uniform(6, 14))
            height = float(rg.uniform(1.5, 4.0))
            if kind == "WRECKS":
                s_long, s_short = size, max(size / 3.0, 1.5)
            else:
                s_long = s_short = size / 2.0
            theta = rg.uniform(0, np.pi)
            ext = int(np.ceil(2.5 * s_long))
            r0, r1 = max(r - ext, 0), min(r + ext + 1, n)
            c0, c1 = max(c - ext, 0), min(c + ext + 1, n)
            rr, cc = np.ogrid[r0:r1, c0:c1]
            dy, dx = rr - r, cc - c
            u = dx * np.cos(theta) + dy * np.sin(theta)
            v = -dx * np.sin(theta) + dy * np.cos(theta)
            clean[r0:r1, c0:c1] -= (height * np.exp(
                -0.5 * ((u / s_long) ** 2 + (v / s_short) ** 2))
            ).astype(np.float32)
            feats.append((kind, r, c))

    # survey-like noise: ~3 cm sensor gaussian + 1-8 m spikes on ~4% of
    # cells (the generator's DEFAULT heavy gaussian of 0.4-2 m would put
    # nearly every cell past prepare-ground-truth's 0.15 m diff
    # threshold, leaving a degenerate all-noise label field)
    from bathymetric_gnn_tpu.config.config import SyntheticNoiseConfig

    gen = SyntheticNoiseGenerator(SyntheticNoiseConfig(
        gaussian_std_range=(0.005, 0.03),
        spike_density_range=(0.02, 0.06),
        spike_magnitude_range=(0.05, 0.4),
        blob_enabled=False, systematic_enabled=False,
        feature_enabled=False,
    ), seed=args.seed + 7)
    lbl = gen.generate(clean)
    res = 2.0  # m/px: the reference's 50/25/30 m label discs then span
    # 25/13/15 px — comparable to the stamped bump footprints
    origin = (0.0, float(n) * res)
    write_geotiff(tmp / "clean.tif", clean[None], pixel_scale=(res, res),
                  origin=origin)
    write_geotiff(tmp / "noisy.tif", lbl.noisy_depth[None],
                  pixel_scale=(res, res), origin=origin)

    # --- 2. native S-57 cell ------------------------------------------
    # projected-meter coordinates (the default COMF=1e7 assumes degree
    # magnitudes; 1e3 keeps meter coords in int32 with mm precision —
    # the reader decodes COMF from the cell's DSPM record)
    w = S57Writer(comf=1000.0)
    for kind, r, c in feats:
        x = origin[0] + (c + 0.5) * res
        y = origin[1] - (r + 0.5) * res
        node = w.add_node(x, y, depth=float(clean[r, c]))
        attrs = {"VALSOU": float(clean[r, c])}
        if kind == "WRECKS":
            attrs["CATWRK"] = 2
        w.add_feature(kind, [node], attributes=attrs)
    snd = w.add_node(0, 0, soundings=[(200.0, 200.0, 9.3),
                                      (210.0, 205.0, 9.7)])
    w.add_feature("SOUNDG", [snd])
    cell = tmp / "cell.000"
    w.save(cell)

    # --- 3. extract CLI (parse + GeoJSON out) --------------------------
    gj = tmp / "features.geojson"
    extract_s57_features.main(["--enc", str(cell),
                               "--output-geojson", str(gj)])
    n_extracted = len(json.loads(gj.read_text())["features"])

    # --- 4. prepare-ground-truth with the native cell ------------------
    gt_dir = tmp / "gt"
    prepare_ground_truth.main([
        "--clean", str(tmp / "clean.tif"), "--noisy", str(tmp / "noisy.tif"),
        "--output-dir", str(gt_dir), "--s57", str(cell),
    ])
    gt_file = next(gt_dir.glob("*_ground_truth.tif"))

    # --- 5. train on GT tiles ------------------------------------------
    cfg = Config(
        model=ModelConfig(hidden_channels=64, num_layers=4, heads=4),
        bucket=BucketConfig(node_buckets=(args.tile * args.tile,)),
        training=TrainingConfig(epochs=args.epochs, batch_size=4,
                                seed=args.seed,
                                early_stop_patience=args.epochs),
    )
    full = GroundTruthTileDataset([str(gt_file)], cfg, tile_size=args.tile,
                                  overlap=16, min_valid_ratio=0.1,
                                  seed=args.seed)
    # deterministic tile split 75/25
    idx = np.arange(len(full.index))
    rg2 = np.random.default_rng(123)
    rg2.shuffle(idx)
    cut = max(int(0.75 * len(idx)), 1)

    def subset(keep):
        ds = GroundTruthTileDataset([str(gt_file)], cfg,
                                    tile_size=args.tile, overlap=16,
                                    min_valid_ratio=0.1, seed=args.seed)
        ds.index = [ds.index[i] for i in keep]
        return ds

    train_ds, val_ds = subset(idx[:cut]), subset(idx[cut:])
    counts = train_ds.class_counts()
    cw = L.compute_class_weights(np.asarray(counts),
                                 smoothing=args.weight_smoothing)
    cfg.training.class_weights = tuple(float(x) for x in cw)
    print(f"# tiles train/val {len(train_ds)}/{len(val_ds)}, class counts "
          f"{list(counts)} -> weights {np.round(cw, 3)}", file=sys.stderr)

    model = make_model(cfg.model, in_channels=7, edge_dim=3)
    t0 = time.time()
    trainer = Trainer(cfg, model, train_ds, val_dataset=val_ds,
                      output_dir=str(tmp / "ckpt"))
    state = trainer.train()
    train_s = time.time() - t0

    # --- 6. evaluate on the held-out tiles -----------------------------
    import jax

    all_pred, all_lbl = [], []
    from bathymetric_gnn_tpu.ops.graph import merge_stacked
    from bathymetric_gnn_tpu.training.datasets import epoch_batches

    @jax.jit
    def predict(params, bs, graph):
        graph = merge_stacked(graph)
        out = model.apply({"params": params, "batch_stats": bs}, graph,
                          deterministic=True)
        return out["predicted_class"], graph.node_mask

    rng = np.random.default_rng(0)
    for graph, targets in epoch_batches(val_ds, 4, rng, shuffle=False):
        pred, mask = predict(state.params, state.batch_stats, graph)
        m = np.asarray(mask).astype(bool).reshape(-1)
        all_pred.append(np.asarray(pred).reshape(-1)[m])
        all_lbl.append(np.asarray(targets["labels"]).reshape(-1)[m])
    pred = np.concatenate(all_pred)
    lab = np.concatenate(all_lbl)
    metrics = compute_metrics(pred, lab)
    print_metrics(metrics)

    per_class = metrics["per_class"]
    feat_m = per_class.get("feature", {})
    noise_m = per_class.get("noise", {})
    stats_files = list(gt_dir.glob("*_gt_stats.json"))
    gt_stats = (json.loads(stats_files[0].read_text())
                if stats_files else {})
    print(json.dumps({
        "metric": "s57_e2e_quality",
        "size": n, "epochs": args.epochs, "seed": args.seed,
        "s57_features_written": len(feats),
        "s57_features_extracted": n_extracted,
        "gt_feature_cells": int(gt_stats.get("feature_cells", -1)),
        "val_accuracy": round(float(metrics["accuracy"]), 4),
        "feature_f1": round(float(feat_m.get("f1", 0.0)), 4),
        "feature_precision": round(float(feat_m.get("precision", 0.0)), 4),
        "feature_recall": round(float(feat_m.get("recall", 0.0)), 4),
        "noise_f1": round(float(noise_m.get("f1", 0.0)), 4),
        "feature_support": int(feat_m.get("support", 0)),
        "train_seconds": round(train_s, 1),
    }))
    if not args.keep:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
