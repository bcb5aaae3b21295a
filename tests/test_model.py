"""Full-model tests: shapes, determinism, threshold logic, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from bathymetric_gnn_tpu.config.config import BucketConfig, GraphConfig
from bathymetric_gnn_tpu.data.graph_build import GraphBuilder
from bathymetric_gnn_tpu.models.gnn import (BathymetricGNN,
                                            predict_with_thresholds)

from conftest import make_ramp_surface


def build_test_graph(h=24, w=24):
    depth = make_ramp_surface(h, w)
    valid = np.ones((h, w), bool)
    valid[2:5, 2:5] = False
    gb = GraphBuilder(GraphConfig(), BucketConfig(node_buckets=(1024,)))
    return gb.build_graph(depth, valid)


def init_model(g, **kw):
    model = BathymetricGNN(hidden_channels=16, num_layers=2, heads=2, **kw)
    variables = model.init(jax.random.PRNGKey(0), g)
    return model, variables


class TestForward:
    def test_output_shapes(self):
        bg = build_test_graph()
        g = bg.graph
        model, variables = init_model(g)
        out = model.apply(variables, g)
        n_pad = g.num_nodes_padded
        assert out["class_logits"].shape == (n_pad, 3)
        assert out["class_probs"].shape == (n_pad, 3)
        assert out["confidence"].shape == (n_pad,)
        assert out["correction"].shape == (n_pad,)
        assert np.isfinite(np.asarray(out["class_logits"])).all()
        conf = np.asarray(out["confidence"])
        assert ((conf >= 0) & (conf <= 1)).all()

    def test_all_gnn_types(self):
        bg = build_test_graph()
        g = bg.graph
        for t in ("GAT", "GCN", "GraphSAGE", "GIN"):
            model, variables = init_model(g, gnn_type=t)
            out = model.apply(variables, g)
            assert np.isfinite(np.asarray(out["class_logits"])).all(), t

    def test_train_mode_runs_with_dropout(self):
        bg = build_test_graph()
        g = bg.graph
        model, variables = init_model(g)
        out, updates = model.apply(
            variables, g, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        assert np.isfinite(np.asarray(out["class_logits"])).all()
        assert "batch_stats" in updates

    def test_thresholding(self):
        out = {
            "confidence": jnp.array([0.9, 0.9, 0.5, 0.7]),
            "predicted_class": jnp.array([2, 0, 0, 2]),
        }
        p = predict_with_thresholds(out)
        np.testing.assert_array_equal(np.asarray(p["action"]), [1, 0, 2, 0])

    def test_param_count_default_config(self):
        # default config (64 hidden, 4 layers, 4 heads, edge_dim 3)
        # should land near the reference's 182K params
        # (docs/TRAINING_DASHBOARD.md:144-147)
        bg = build_test_graph()
        g = bg.graph
        model = BathymetricGNN()
        variables = model.init(jax.random.PRNGKey(0), g)
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
        assert 150_000 < n < 260_000, n


class TestGradientFlow:
    def test_grad_nonzero_and_finite(self):
        from bathymetric_gnn_tpu.training.losses import combined_loss

        bg = build_test_graph()
        g = bg.graph
        model, variables = init_model(g)
        params = variables["params"]
        rg = np.random.default_rng(0)
        n_pad = g.num_nodes_padded
        targets = {
            "labels": jnp.asarray(rg.integers(0, 3, n_pad).astype(np.int32)),
            "correction": jnp.asarray(rg.normal(size=n_pad).astype(np.float32)),
        }
        targets["noise_mask"] = targets["labels"] == 2

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                g, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"],
            )
            return combined_loss(out, targets, g.node_mask)["total"]

        grads = jax.grad(loss_fn)(params)
        flat = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        total_norm = float(
            jnp.sqrt(sum(jnp.sum(x ** 2) for x in flat))
        )
        assert total_norm > 1e-6


class TestMaskedBNLowp:
    """The bf16 custom-VJP BatchNorm path (models/layers._bn_lowp) must
    match the f32 autodiff formulation: same normalize, same moments, and
    the hand-written single-pass backward must equal autodiff gradients
    (reference torch semantics: BatchNorm1d training mode, grad flows
    through batch moments)."""

    def _setup(self, seed=0, n=512, f=64, mean_shift=5.0):
        from bathymetric_gnn_tpu.models.layers import MaskedBatchNorm

        rng = np.random.default_rng(seed)
        x = (rng.normal(mean_shift, 2.0, (n, f))).astype(np.float32)
        mask = rng.random(n) < 0.8
        mask[:4] = True
        bn = MaskedBatchNorm(features=f)
        v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                    jnp.asarray(mask))
        return bn, v, x, mask

    def test_forward_and_moments_match_f32(self):
        bn, v, x, mask = self._setup()
        y32, st32 = bn.apply(v, jnp.asarray(x), jnp.asarray(mask),
                             mutable=["batch_stats"])
        y16, st16 = bn.apply(v, jnp.asarray(x, jnp.bfloat16),
                             jnp.asarray(mask), mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y16, np.float32),
                                   np.asarray(y32), atol=0.08)

        def stat(st, name):
            bs = st["batch_stats"]
            bs = bs.get("MaskedBatchNorm_0", bs)
            return np.asarray(bs[name])

        # running mean AND running var (the var carries the unbiased
        # n/(n-1) correction in both paths) must agree across dtypes
        np.testing.assert_allclose(stat(st16, "mean"), stat(st32, "mean"),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(stat(st16, "var"), stat(st32, "var"),
                                   rtol=3e-2, atol=3e-2)

    def test_grad_matches_autodiff(self):
        bn, v, x, mask = self._setup(seed=1)
        w = np.asarray(
            np.random.default_rng(9).normal(0, 1, x.shape), np.float32)

        def loss(params, xin):
            y = bn.apply({"params": params,
                          "batch_stats": v["batch_stats"]}, xin,
                         jnp.asarray(mask), mutable=["batch_stats"])[0]
            return jnp.sum(y.astype(jnp.float32) * w)

        g32 = jax.grad(loss, argnums=(0, 1))(
            v["params"], jnp.asarray(x))
        g16 = jax.grad(loss, argnums=(0, 1))(
            v["params"], jnp.asarray(x, jnp.bfloat16))
        dx32 = np.asarray(g32[1])
        dx16 = np.asarray(g16[1], np.float32)
        scale_ref = np.abs(dx32).max() + 1e-9
        assert np.abs(dx16 - dx32).max() / scale_ref < 0.05
        for k in g32[0]:
            a32, a16 = np.asarray(g32[0][k]), np.asarray(g16[0][k])
            np.testing.assert_allclose(
                a16, a32, rtol=3e-2,
                atol=3e-2 * (np.abs(a32).max() + 1e-9))


class TestBNFusedActivation:
    """MaskedBatchNorm's fused ReLU + feature dropout must equal the
    historical external nn.relu + bernoulli-dropout composition on the
    f32 path (same rng draw)."""

    def test_equals_external_relu_dropout(self):
        from bathymetric_gnn_tpu.models.layers import MaskedBatchNorm

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(1.0, 2.0, (300, 32)).astype(np.float32))
        mask = jnp.asarray(rng.random(300) < 0.9)
        bn = MaskedBatchNorm(32)
        v = bn.init(jax.random.PRNGKey(0), x, mask)
        key = jax.random.PRNGKey(7)
        fused, _ = bn.apply(v, x, mask, mutable=["batch_stats"],
                            fuse_relu=True, drop_rate=0.25, drop_rng=key)
        plain, _ = bn.apply(v, x, mask, mutable=["batch_stats"])
        y = jnp.maximum(plain, 0.0)
        keep = jax.random.bernoulli(key, 0.75, y.shape)
        y = jnp.where(keep, y / 0.75, 0.0)
        y = jnp.where(mask[:, None], y, 0.0)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(y),
                                   rtol=1e-6, atol=1e-6)


class TestClassWeightOverride:
    """TrainingConfig.class_weights must override the dataset-estimated
    inverse-frequency weights in the grid trainer (round 4: the rare
    feature class needs weights beyond the parity estimator's 0.1
    smoothing cap)."""

    def test_grid_trainer_uses_explicit_weights(self, tmp_path):
        from bathymetric_gnn_tpu.config.config import (Config, ModelConfig,
                                                       TrainingConfig)
        from bathymetric_gnn_tpu.training.grid_trainer import (
            GridTrainer, SyntheticGridDataset)

        rg = np.random.default_rng(0)
        yy, xx = np.mgrid[0:128, 0:128].astype(np.float32)
        grid = (30 + np.sin(xx / 9) + rg.normal(0, .05, xx.shape)
                ).astype(np.float32)
        cfg = Config(model=ModelConfig(hidden_channels=8, num_layers=2,
                                       heads=2),
                     training=TrainingConfig(
                         epochs=1, batch_size=2,
                         class_weights=(0.2, 2.5, 0.3)))
        ds = SyntheticGridDataset([grid], cfg, tile_size=64, overlap=8,
                                  seed=0)
        tr = GridTrainer(cfg, ds, ds, output_dir=str(tmp_path))
        np.testing.assert_allclose(np.asarray(tr.class_weights),
                                   [0.2, 2.5, 0.3])
