"""Data-parallel training on an 8-virtual-device CPU mesh.

Validates the shard_map DP step runs, keeps replicas consistent, and
matches the single-device step numerically on balanced batches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bathymetric_gnn_tpu.config.config import (BucketConfig, Config,
                                               GraphConfig, ModelConfig,
                                               TrainingConfig)
from bathymetric_gnn_tpu.models.gnn import make_model
from bathymetric_gnn_tpu.parallel.data_parallel import (make_dp_eval_step,
                                                        make_dp_train_step)
from bathymetric_gnn_tpu.parallel.mesh import make_mesh, shard_batch_pytree
from bathymetric_gnn_tpu.training.datasets import SyntheticTileDataset, collate_samples
from bathymetric_gnn_tpu.training.trainer import Trainer, TrainState

from conftest import make_ramp_surface


def build_batch(batch=8, tile=48):
    cfg = Config(
        model=ModelConfig(hidden_channels=8, num_layers=2, heads=2),
        bucket=BucketConfig(node_buckets=(4096,)),
        training=TrainingConfig(batch_size=batch, seed=0),
    )
    grids = [make_ramp_surface(tile * 2, tile * 2, seed=i) for i in range(2)]
    ds = SyntheticTileDataset(grids, cfg, tile_size=tile, overlap=8,
                              min_valid_ratio=0.0, seed=0)
    samples = [ds[i % len(ds)] for i in range(batch)]
    graph, targets = collate_samples(samples)
    return cfg, ds, graph, targets


class TestDataParallel:
    def test_dp_step_runs_and_matches_single_device(self):
        cfg, ds, graph, targets = build_batch()
        model = make_model(cfg.model, in_channels=7, edge_dim=3)
        trainer = Trainer(cfg, model, ds, output_dir="/tmp/dp_test_ckpt")
        state = trainer.init_state(ds[0].graph)

        mesh = make_mesh(8, graph_axis=1)
        dp_step = make_dp_train_step(
            model, trainer.optimizer, cfg.training, trainer.class_weights,
            trainer.huber_delta, mesh,
        )
        rng = jax.random.PRNGKey(0)
        lr = jnp.float32(1e-3)

        graph_sh = shard_batch_pytree(graph, mesh)
        targets_sh = shard_batch_pytree(targets, mesh)
        new_state, losses, acc = dp_step(state, graph_sh, targets_sh, rng, lr)
        assert np.isfinite(float(losses["total"]))
        assert 0 <= float(acc) <= 1

        # single-device reference step on the same batch (dropout differs
        # per shard, so compare with dropout disabled via eval-loss path):
        ev = make_dp_eval_step(model, cfg.training, trainer.class_weights,
                               trainer.huber_delta, mesh)
        dp_losses, dp_acc = ev(state, graph_sh, targets_sh)

        losses1, acc1 = trainer._eval_step(state, graph, targets)
        # Components normalized by fixed node counts match exactly
        # (mean-of-means == global mean on balanced full-valid tiles).
        # Components normalized by data-dependent counts (shoal FP count,
        # noise-node count, class-weight sums) legitimately differ between
        # per-shard and global normalization — standard DDP semantics.
        np.testing.assert_allclose(float(dp_losses["confidence"]),
                                   float(losses1["confidence"]), rtol=2e-4)
        np.testing.assert_allclose(
            float(dp_losses["feature_preservation"]),
            float(losses1["feature_preservation"]), rtol=2e-4,
        )
        np.testing.assert_allclose(float(dp_acc), float(acc1), rtol=1e-5)
        # total stays in the same ballpark
        np.testing.assert_allclose(float(dp_losses["total"]),
                                   float(losses1["total"]), rtol=0.05)

    def test_dp_params_updated(self):
        cfg, ds, graph, targets = build_batch()
        model = make_model(cfg.model, in_channels=7, edge_dim=3)
        trainer = Trainer(cfg, model, ds, output_dir="/tmp/dp_test_ckpt2")
        state = trainer.init_state(ds[0].graph)
        mesh = make_mesh(8)
        dp_step = make_dp_train_step(
            model, trainer.optimizer, cfg.training, trainer.class_weights,
            trainer.huber_delta, mesh,
        )
        new_state, *_ = dp_step(state, shard_batch_pytree(graph, mesh),
                                shard_batch_pytree(targets, mesh),
                                jax.random.PRNGKey(1), jnp.float32(1e-3))
        diffs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            state.params, new_state.params,
        )
        assert max(jax.tree.leaves(diffs)) > 0


class TestMultiHostScaffolding:
    """Single-process behavior of the multi-host helpers (the process
    topology itself needs a pod; these pin the API and the host-local
    degenerate case)."""

    def test_initialize_noop_single_process(self):
        import jax

        from bathymetric_gnn_tpu.parallel.mesh import initialize_distributed

        info = initialize_distributed()
        assert info["processes"] == 1
        assert info["process_id"] == 0
        assert info["global_devices"] == len(jax.devices())

    def test_host_mesh_layout(self):
        import jax
        import numpy as np

        from bathymetric_gnn_tpu.parallel.mesh import make_host_mesh

        mesh = make_host_mesh(graph_axis=4)
        assert mesh.axis_names == ("data", "graph")
        assert mesh.devices.shape == (len(jax.devices()) // 4, 4)
        # graph-minor layout: consecutive device ids share a graph group
        ids = np.vectorize(lambda d: d.id)(mesh.devices)
        assert (np.diff(ids, axis=1) == 1).all()

    def test_host_local_batch_single_process(self):
        import jax.numpy as jnp
        import numpy as np

        from bathymetric_gnn_tpu.parallel.mesh import (
            host_local_batch_to_global, make_host_mesh)

        mesh = make_host_mesh(graph_axis=1)
        batch = {"a": jnp.arange(16.0).reshape(8, 2)}
        out = host_local_batch_to_global(batch, mesh)
        np.testing.assert_array_equal(np.asarray(out["a"]),
                                      np.asarray(batch["a"]))
        assert out["a"].sharding.spec[0] == "data"


class TestDpSparseKnn:
    """Data-parallel banded-ELL (k-NN) training step: 8 shards on the
    virtual CPU mesh, fused kernels in interpret mode; exact semantics
    vs the single-device sparse step on the concatenated batch."""

    def _build(self, n_shards=4, per_shard=2):
        import dataclasses

        from bathymetric_gnn_tpu.ops.ell import coo_to_ell
        from bathymetric_gnn_tpu.ops.ell_banded import band_ell

        cfg = Config(
            model=ModelConfig(hidden_channels=8, num_layers=2, heads=2,
                              dropout=0.0,
                              sparse_kernel="banded_pallas"),
            bucket=BucketConfig(node_buckets=(2048,)),
            training=TrainingConfig(batch_size=n_shards * per_shard,
                                    seed=0),
        )
        cfg.graph = dataclasses.replace(cfg.graph, knn_k=8)
        grids = [make_ramp_surface(80, 80, seed=i) for i in range(2)]
        ds = SyntheticTileDataset(grids, cfg, tile_size=40, overlap=8,
                                  min_valid_ratio=0.0, seed=0)
        samples = [ds[i % len(ds)] for i in range(n_shards * per_shard)]
        graph, targets = collate_samples(samples)

        from bathymetric_gnn_tpu.ops.graph import merge_stacked

        def to_sparse(stacked, s_max, spill_pad):
            merged = merge_stacked(stacked)
            g = coo_to_ell(merged, max_degree=8)
            return g, band_ell(g, band_rows=128, s_max=s_max,
                               spill_pad=spill_pad)

        return cfg, ds, graph, targets, to_sparse

    def test_dp_sparse_matches_single_device(self):
        import dataclasses

        import optax

        from bathymetric_gnn_tpu.models.gnn import make_model
        from bathymetric_gnn_tpu.models.gnn_ell import make_ell_model
        from bathymetric_gnn_tpu.parallel.data_parallel import (
            make_dp_sparse_train_step, stack_banded_batches)

        n_shards, per_shard = 4, 2
        cfg, ds, graph, targets, to_sparse = self._build(n_shards,
                                                         per_shard)
        model = make_model(cfg.model, in_channels=7, edge_dim=3)
        trainer = Trainer(cfg, model, ds, output_dir="/tmp/dp_sparse_ck")
        state = trainer.init_state(ds[0].graph)
        optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3),
        )
        state = dataclasses.replace(state,
                                    opt_state=optimizer.init(state.params))

        # per-shard sparse batches with FORCED common shapes
        take = lambda t, i: jax.tree.map(
            lambda a: a[i * per_shard:(i + 1) * per_shard], t)
        pairs = [to_sparse(take(graph, i), s_max=256, spill_pad=65536)
                 for i in range(n_shards)]
        g_st, banded_st = stack_banded_batches(pairs)
        targets_st = jax.tree.map(
            lambda a: a.reshape((n_shards, per_shard) + a.shape[1:]),
            targets)

        mesh = make_mesh(n_shards, graph_axis=1)
        ell_model = make_ell_model(cfg.model, in_channels=7, edge_dim=3,
                                   sparse_kernel="banded_pallas")
        dp_step = make_dp_sparse_train_step(
            ell_model, optimizer, cfg.training, trainer.class_weights,
            trainer.huber_delta, mesh,
        )
        rng = jax.random.PRNGKey(0)
        new_state, losses, acc = dp_step(state, g_st, banded_st,
                                         targets_st, rng,
                                         jnp.float32(1e-3))
        assert np.isfinite(float(losses["total"]))

        # single-device reference: trainer's own sparse step on the FULL
        # concatenated batch (same kernels, dropout 0, sync semantics)
        g_all, banded_all = to_sparse(graph, s_max=256, spill_pad=65536)
        trainer.optimizer = optimizer
        sstep = trainer._make_sparse_step(train=True)
        ref_state, ref_losses, ref_acc = sstep(
            state, g_all, banded_all, targets, rng, jnp.float32(1e-3))

        np.testing.assert_allclose(float(losses["total"]),
                                   float(ref_losses["total"]), rtol=1e-4)
        np.testing.assert_allclose(float(acc), float(ref_acc), rtol=1e-5)
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(new_state.params)[0],
                jax.tree_util.tree_flatten_with_path(ref_state.params)[0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-6,
                                       err_msg=str(pa))
