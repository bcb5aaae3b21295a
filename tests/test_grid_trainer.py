"""Batched dense-grid training path: model parity, training loop,
checkpoint -> inference pipeline round trip."""

import jax
import json
import jax.numpy as jnp
import numpy as np
import pytest

from bathymetric_gnn_tpu.config.config import (BucketConfig, Config,
                                               ModelConfig, TileConfig,
                                               TrainingConfig)
from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
from bathymetric_gnn_tpu.models.grid_batched import BatchedGridGNN
from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN
from bathymetric_gnn_tpu.training.grid_trainer import (GridTrainer,
                                                       SyntheticGridDataset,
                                                       collate_grids)

from conftest import make_ramp_surface


def small_cfg(**kw):
    return Config(
        model=ModelConfig(hidden_channels=8, num_layers=2, heads=2),
        tile=TileConfig(tile_size=64, overlap=16),
        training=TrainingConfig(epochs=2, batch_size=2, seed=0, **kw),
    )


class TestBatchedModelParity:
    def test_batched_equals_per_sample(self):
        depth1 = make_ramp_surface(32, 32, seed=0)
        depth2 = make_ramp_surface(32, 32, seed=1)
        valid = np.ones((32, 32), bool)
        f1, v1, n1, e1, _ = build_grid_inputs(depth1, valid)
        f2, v2, n2, e2, _ = build_grid_inputs(depth2, valid)

        single = GridBathymetricGNN(hidden_channels=8, num_layers=2, heads=2)
        variables = single.init(jax.random.PRNGKey(0), f1, v1, n1, e1)
        out1 = single.apply(variables, f1, v1, n1, e1)
        out2 = single.apply(variables, f2, v2, n2, e2)

        batched = BatchedGridGNN(hidden_channels=8, num_layers=2, heads=2)
        fb = jnp.stack([f1, f2])
        vb = jnp.stack([v1, v2])
        nb = jnp.stack([n1, n2])
        eb = jnp.stack([e1, e2])
        # init to verify param-tree compatibility, then reuse single's params
        vars_b = batched.init(jax.random.PRNGKey(0), fb, vb, nb, eb)
        assert (jax.tree.structure(vars_b["params"])
                == jax.tree.structure(variables["params"]))
        out_b = batched.apply(variables, fb, vb, nb, eb)

        # NOTE: batch-mode BatchNorm uses joint batch statistics in train
        # mode; in eval (running averages, init = 0/1) outputs match
        # per-sample exactly.
        np.testing.assert_allclose(np.asarray(out_b["class_logits"][0]),
                                   np.asarray(out1["class_logits"]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_b["class_logits"][1]),
                                   np.asarray(out2["class_logits"]),
                                   rtol=2e-4, atol=2e-5)


class TestGridTrainer:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        cfg = small_cfg()
        grids = [make_ramp_surface(128, 128, seed=i) for i in range(2)]
        ds = SyntheticGridDataset(grids, cfg, tile_size=64, overlap=16,
                                  seed=0)
        out = tmp_path_factory.mktemp("grid_ckpt")
        trainer = GridTrainer(cfg, ds, output_dir=str(out))
        state = trainer.train()
        return cfg, ds, trainer, state, out

    def test_loss_decreases(self, trained):
        _, _, trainer, _, _ = trained
        h = trainer.history["train_loss"]
        assert len(h) == 2 and h[-1] < h[0]

    def test_checkpoint_feeds_inference_pipeline(self, trained, tmp_path):
        from bathymetric_gnn_tpu.inference.pipeline import BathymetricPipeline
        from bathymetric_gnn_tpu.io.geotiff import read_geotiff, write_geotiff

        cfg, ds, trainer, state, out = trained
        pipe_cfg = small_cfg()
        pipe_cfg.tile = TileConfig(tile_size=64, overlap=16,
                                   min_valid_ratio=0.05)
        pipe = BathymetricPipeline(pipe_cfg)
        pipe.load_model(out / "best")

        depth = make_ramp_surface(100, 100, seed=7)
        src = tmp_path / "s.tif"
        write_geotiff(src, depth[None], pixel_scale=(1.0, 1.0),
                      origin=(0.0, 0.0))
        stats = pipe.process(src, tmp_path / "o.tif")
        assert stats["valid_cells"] == 10000
        bands, _ = read_geotiff(tmp_path / "o.tif")
        assert np.isfinite(bands[0]).all()

    def test_resume(self, trained):
        cfg, ds, trainer, state, out = trained
        cfg2 = small_cfg()
        cfg2.training.epochs = 3
        t2 = GridTrainer(cfg2, ds, output_dir=str(out))
        t2.train(resume=True)
        assert len(t2.history["train_loss"]) == 1


class TestBandedSparseTrainer:
    """knn_k>0 + sparse_kernel=banded_pallas: the graph Trainer trains
    through the fused banded-ELL kernels (interpret mode on CPU)."""

    def test_sparse_training_loss_decreases(self, tmp_path):
        from bathymetric_gnn_tpu.config.config import (BucketConfig, Config,
                                                       GraphConfig,
                                                       ModelConfig,
                                                       SyntheticNoiseConfig,
                                                       TrainingConfig)
        from bathymetric_gnn_tpu.models.gnn import make_model
        from bathymetric_gnn_tpu.training.datasets import \
            SyntheticTileDataset
        from bathymetric_gnn_tpu.training.trainer import Trainer

        from conftest import make_ramp_surface

        cfg = Config(
            model=ModelConfig(hidden_channels=8, num_layers=2, heads=2,
                              dropout=0.1, sparse_kernel="banded_pallas"),
            graph=GraphConfig(knn_k=8),
            bucket=BucketConfig(node_buckets=(2048,)),
            training=TrainingConfig(epochs=4, batch_size=2, seed=0,
                                    early_stop_patience=10),
            # learnable noise (spikes only) so 4 epochs trend downward
            # despite per-epoch re-augmentation
            synthetic_noise=SyntheticNoiseConfig(
                gaussian_enabled=False, blob_enabled=False,
                systematic_enabled=False,
                spike_density_range=(0.05, 0.08)),
        )
        grids = [make_ramp_surface(80, 80, seed=i) for i in range(2)]
        ds = SyntheticTileDataset(grids, cfg, tile_size=40, overlap=8,
                                  min_valid_ratio=0.0, seed=0)
        model = make_model(cfg.model, in_channels=7, edge_dim=3)
        tr = Trainer(cfg, model, ds, output_dir=str(tmp_path / "ck"))
        assert tr.use_banded_training
        state = tr.train()
        losses = [json.loads(l)["train_loss"]
                  for l in open(tmp_path / "ck" / "metrics.jsonl")]
        assert min(losses[1:]) < losses[0]

        # checkpoint round-trips into the knn-native inference path
        import dataclasses

        from bathymetric_gnn_tpu.inference.native_vr import \
            NativeVRProcessor
        from bathymetric_gnn_tpu.inference.pipeline import \
            load_checkpoint_variables

        params, bs, ckpt_cfg, meta = load_checkpoint_variables(
            str(tmp_path / "ck" / "best"))
        proc = NativeVRProcessor(
            model, {"params": params, "batch_stats": bs}, cfg,
            node_budget=10_000)
        assert proc.knn_k == 8
        d = (20 + np.random.default_rng(0).normal(0, 1, (30, 30))
             ).astype(np.float32)
        out = proc.process_grid(d, np.zeros_like(d), (1.0, 1.0))
        assert set(np.unique(out["classification"])) <= {0, 1, 2}
