"""CLI integration tests: train -> infer -> evaluate, GT prep, diagnostics."""

import json

import numpy as np
import pytest

from bathymetric_gnn_tpu.io.geotiff import read_geotiff, write_geotiff

from conftest import make_ramp_surface


@pytest.fixture(scope="module")
def survey_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("surveys")
    for i in range(2):
        depth = make_ramp_surface(128, 128, seed=i)
        write_geotiff(d / f"clean_{i}.tif", depth[None],
                      pixel_scale=(1.0, 1.0), origin=(0.0, 0.0))
    return d


@pytest.fixture(scope="module")
def trained_model_dir(tmp_path_factory, survey_dir):
    from bathymetric_gnn_tpu.cli.train import main

    out = tmp_path_factory.mktemp("model")
    main([
        "--data-dir", str(survey_dir), "--output-dir", str(out),
        "--epochs", "2", "--batch-size", "2", "--tile-size", "64",
        "--overlap", "8", "--hidden-channels", "8", "--num-layers", "2",
        "--heads", "2",
    ])
    return out


class TestTrainCLI:
    def test_artifacts(self, trained_model_dir):
        assert (trained_model_dir / "best").exists()
        assert (trained_model_dir / "config.yaml").exists()
        assert (trained_model_dir / "history.json").exists()
        hist = json.loads((trained_model_dir / "history.json").read_text())
        assert len(hist["train_loss"]) == 2


class TestInferenceCLI:
    def test_infer_and_evaluate(self, trained_model_dir, tmp_path):
        from bathymetric_gnn_tpu.cli.inference import main as infer_main

        depth = make_ramp_surface(100, 100, seed=9)
        src = tmp_path / "survey.tif"
        write_geotiff(src, depth[None], pixel_scale=(1.0, 1.0),
                      origin=(0.0, 0.0))
        out = tmp_path / "cleaned.tif"
        infer_main([
            "--input", str(src), "--output", str(out),
            "--model", str(trained_model_dir / "best"),
            "--tile-size", "64", "--overlap", "16",
            "--stats-json", str(tmp_path / "stats.json"),
        ])
        assert out.exists()
        stats = json.loads((tmp_path / "stats.json").read_text())
        assert stats["valid_cells"] == 100 * 100
        bands, _ = read_geotiff(out)
        assert bands.shape[0] == 5

        # evaluate against a trivially-derived GT (all seafloor)
        from bathymetric_gnn_tpu.cli.evaluate_model import main as eval_main
        gt = np.zeros((5, 100, 100), np.float32)
        gt[2] = depth
        gtp = tmp_path / "gt.tif"
        write_geotiff(gtp, gt, pixel_scale=(1.0, 1.0), origin=(0.0, 0.0))
        eval_main([
            "--predictions", str(out), "--ground-truth", str(gtp),
            "--output-json", str(tmp_path / "metrics.json"),
        ])
        m = json.loads((tmp_path / "metrics.json").read_text())
        assert "accuracy" in m and "per_class" in m


class TestGroundTruthCLI:
    def test_prepare_and_analyze(self, tmp_path):
        from bathymetric_gnn_tpu.cli.analyze_noise_patterns import \
            main as analyze_main
        from bathymetric_gnn_tpu.cli.prepare_ground_truth import \
            main as prep_main
        from bathymetric_gnn_tpu.data.synthetic_noise import \
            SyntheticNoiseGenerator

        clean = make_ramp_surface(96, 96)
        lbl = SyntheticNoiseGenerator(seed=0).generate(clean)
        noisy = lbl.noisy_depth + 0.05  # small systematic offset
        write_geotiff(tmp_path / "clean.tif", clean[None],
                      pixel_scale=(1.0, 1.0), origin=(0.0, 96.0))
        write_geotiff(tmp_path / "noisy.tif", noisy[None],
                      pixel_scale=(1.0, 1.0), origin=(0.0, 96.0))
        prep_main([
            "--clean", str(tmp_path / "clean.tif"),
            "--noisy", str(tmp_path / "noisy.tif"),
            "--output-dir", str(tmp_path / "gt"),
        ])
        gt_file = tmp_path / "gt" / "noisy_ground_truth.tif"
        assert gt_file.exists()
        stats = json.loads(
            (tmp_path / "gt" / "noisy_gt_stats.json").read_text())
        # offset removed (reference lesson: docs/LESSONS_LEARNED.md:13-35)
        assert abs(stats["systematic_offset_m"]) > 0.0
        assert 1 < stats["noise_pct"] < 90
        bands, info = read_geotiff(gt_file)
        assert bands.shape[0] == 5
        assert set(np.unique(bands[0])) <= {-1.0, 0.0, 2.0}

        analyze_main([str(gt_file)])

    def test_gt_dataset_roundtrip(self, tmp_path):
        """GT raster -> GroundTruthTileDataset -> training sample."""
        from bathymetric_gnn_tpu.config.config import (BucketConfig, Config,
                                                       ModelConfig)
        from bathymetric_gnn_tpu.data.synthetic_noise import \
            SyntheticNoiseGenerator
        from bathymetric_gnn_tpu.data.ground_truth import compute_ground_truth
        from bathymetric_gnn_tpu.training.datasets import \
            GroundTruthTileDataset

        clean = make_ramp_surface(128, 128)
        lbl = SyntheticNoiseGenerator(seed=0).generate(clean)
        write_geotiff(tmp_path / "c.tif", clean[None], pixel_scale=(1, 1),
                      origin=(0.0, 128.0))
        write_geotiff(tmp_path / "n.tif", lbl.noisy_depth[None],
                      pixel_scale=(1, 1), origin=(0.0, 128.0))
        compute_ground_truth(tmp_path / "c.tif", tmp_path / "n.tif",
                             tmp_path / "gt")
        cfg = Config(bucket=BucketConfig(node_buckets=(4096, 16384)))
        ds = GroundTruthTileDataset(
            [str(tmp_path / "gt" / "n_ground_truth.tif")], cfg,
            tile_size=64, overlap=8,
        )
        assert len(ds) > 0
        s = ds[0]
        labels = s.targets["labels"][:s.num_nodes]
        assert set(np.unique(labels)) <= {0, 2}
        assert np.isfinite(s.targets["correction"]).all()
        assert ds.class_counts().sum() > 0


class TestDiagnostics:
    def test_diagnose_and_explore(self, tmp_path, capsys):
        from bathymetric_gnn_tpu.cli.diagnose_tiles import main as diag_main
        from bathymetric_gnn_tpu.cli.explore_bag import main as explore_main
        from bathymetric_gnn_tpu.io.bag import write_vr_bag

        depth = make_ramp_surface(80, 80)
        depth[:40] = np.nan
        write_geotiff(tmp_path / "s.tif", depth[None], pixel_scale=(1, 1),
                      origin=(0.0, 80.0))
        diag_main([str(tmp_path / "s.tif"), "--tile-size", "32",
                   "--overlap", "8"])
        out = json.loads(capsys.readouterr().out)
        d = out[str(tmp_path / "s.tif")]
        assert d["valid_ratio"] == pytest.approx(0.5, abs=0.01)

        refinements = [(0, 0, np.full((4, 4), 10.0, np.float32), None, 8.0)]
        write_vr_bag(tmp_path / "v.bag", (1, 1), 32.0, refinements)
        explore_main([str(tmp_path / "v.bag")])
        out2 = json.loads(capsys.readouterr().out)
        assert out2[str(tmp_path / "v.bag")]["type"] == "VR"


class TestGroundTruthS57Overlay:
    def test_s57_geojson_overlay_labels_features(self, tmp_path):
        """Round-4 wiring of the reference's unshipped Phase 3: S-57
        feature points overlay class-1 discs onto the prepared GT raster
        and flow into the GT dataset's labels."""
        from bathymetric_gnn_tpu.config.config import BucketConfig, Config
        from bathymetric_gnn_tpu.data.ground_truth import \
            compute_ground_truth
        from bathymetric_gnn_tpu.data.s57 import (S57Feature,
                                                  features_to_geojson)
        from bathymetric_gnn_tpu.data.synthetic_noise import \
            SyntheticNoiseGenerator
        from bathymetric_gnn_tpu.training.datasets import \
            GroundTruthTileDataset

        clean = make_ramp_surface(128, 128)
        lbl = SyntheticNoiseGenerator(seed=0).generate(clean)
        write_geotiff(tmp_path / "c.tif", clean[None], pixel_scale=(1, 1),
                      origin=(0.0, 128.0))
        write_geotiff(tmp_path / "n.tif", lbl.noisy_depth[None],
                      pixel_scale=(1, 1), origin=(0.0, 128.0))
        feats = [
            S57Feature("WRECKS", "point", x=40.0, y=80.0, depth=12.0),
            S57Feature("UWTROC", "point", x=100.0, y=30.0),
            S57Feature("SOUNDG", "point", x=60.0, y=60.0),  # label None
        ]
        gj = tmp_path / "feats.geojson"
        features_to_geojson(feats, gj)
        stats = compute_ground_truth(
            tmp_path / "c.tif", tmp_path / "n.tif", tmp_path / "gt",
            s57_path=gj)
        assert stats["feature_cells"] > 0
        bands, _ = read_geotiff(tmp_path / "gt" / "n_ground_truth.tif")
        labels = bands[0]
        assert (labels == 1).sum() == stats["feature_cells"]
        # wreck disc (r=50 m) centered at col 40, row 128-80=48
        assert labels[48, 40] == 1
        # nodata untouched
        assert set(np.unique(labels)) <= {-1.0, 0.0, 1.0, 2.0}

        cfg = Config(bucket=BucketConfig(node_buckets=(4096, 16384)))
        ds = GroundTruthTileDataset(
            [str(tmp_path / "gt" / "n_ground_truth.tif")], cfg,
            tile_size=64, overlap=8,
        )
        found = set()
        for i in range(len(ds)):
            s = ds[i]
            found |= set(np.unique(s.targets["labels"][:s.num_nodes]))
        assert 1 in found
        assert ds.class_counts()[1] > 0
