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
