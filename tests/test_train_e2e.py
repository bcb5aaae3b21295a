"""End-to-end slice (SURVEY §7.2): featurize -> GAT -> loss -> train loop on
synthetically-noised ramp surfaces; loss must drop and the model must begin
detecting injected noise. Plus checkpoint save/resume round-trip."""

import numpy as np
import pytest

from bathymetric_gnn_tpu.config.config import (BucketConfig, Config,
                                               GraphConfig, ModelConfig,
                                               TrainingConfig)
from bathymetric_gnn_tpu.models.gnn import make_model
from bathymetric_gnn_tpu.training.datasets import SyntheticTileDataset
from bathymetric_gnn_tpu.training.trainer import (Trainer,
                                                  cosine_warm_restarts)

from conftest import make_ramp_surface


def small_config(**training_kw):
    cfg = Config(
        model=ModelConfig(hidden_channels=16, num_layers=2, heads=2),
        bucket=BucketConfig(node_buckets=(4096,)),
        training=TrainingConfig(epochs=3, batch_size=2, seed=0, **training_kw),
    )
    return cfg


def make_dataset(cfg, n_surveys=2, size=128):
    grids = [make_ramp_surface(size, size, seed=i) for i in range(n_surveys)]
    return SyntheticTileDataset(grids, cfg, tile_size=64, overlap=8, seed=0)


class TestSchedule:
    def test_warm_restarts_shape(self):
        lrs = [cosine_warm_restarts(e, 1.0, t0=4, t_mult=2) for e in range(12)]
        assert lrs[0] == 1.0
        assert lrs[4] == 1.0  # restart
        assert lrs[3] < 0.2
        assert lrs[11] < lrs[4]


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        cfg = small_config()
        ds = make_dataset(cfg)
        model = make_model(cfg.model, in_channels=7, edge_dim=3)
        out = tmp_path_factory.mktemp("ckpt")
        trainer = Trainer(cfg, model, ds, output_dir=str(out))
        state = trainer.train()
        return cfg, ds, model, trainer, state, out

    def test_loss_decreases(self, trained):
        _, _, _, trainer, _, _ = trained
        h = trainer.history["train_loss"]
        assert len(h) == 3
        assert h[-1] < h[0], h

    def test_accuracy_reasonable(self, trained):
        # synthetic tiles are mostly seafloor; after 3 epochs the model
        # should beat the trivial 50% mark on train accuracy
        _, _, _, trainer, _, _ = trained
        assert trainer.history["train_acc"][-1] > 0.5

    def test_checkpoints_exist(self, trained):
        *_, out = trained
        assert (out / "best").exists()
        assert (out / "last").exists()
        assert (out / "final").exists()
        assert (out / "config.yaml").exists()

    def test_resume_roundtrip(self, trained):
        import jax
        cfg, ds, model, trainer, state, out = trained
        cfg2 = small_config()
        cfg2.training.epochs = 4  # one more epoch
        t2 = Trainer(cfg2, model, ds, output_dir=str(out))
        s2 = t2.train(resume=True)
        # resumed: only 1 extra epoch of history
        assert len(t2.history["train_loss"]) == 1
        # params actually updated from the restored ones
        diff = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                            state.params, s2.params)
        assert max(jax.tree.leaves(diff)) > 0
