"""Fused Pallas grid-GAT kernel: parity vs GridGATConv (interpret mode on
CPU) and gradient correctness of the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
from bathymetric_gnn_tpu.models.grid_gat import GridGATConv
from bathymetric_gnn_tpu.ops.pallas.grid_gat_fused import (
    _reference_forward, fused_grid_gat, gat_param_matrices)
from bathymetric_gnn_tpu.ops.edges import offsets_for_connectivity

from conftest import make_ramp_surface


def setup(h=32, w=128, f_in=16, heads=4, c=16, seed=0):
    rg = np.random.default_rng(seed)
    depth = make_ramp_surface(h, w)
    valid = np.ones((h, w), bool)
    valid[5:9, 10:40] = False
    depth[~valid] = np.nan
    _, v, nbr, eattr, _ = build_grid_inputs(
        np.nan_to_num(depth).astype(np.float32), valid)
    x = rg.normal(size=(h, w, f_in)).astype(np.float32)
    x[~valid] = 0.0

    layer = GridGATConv(out_channels=c, heads=heads, concat=True, edge_dim=3)
    params = layer.init(jax.random.PRNGKey(1), jnp.asarray(x), v, nbr,
                        eattr)["params"]
    return layer, params, x, valid, np.asarray(nbr), np.asarray(eattr)


def run_fused(params, x, valid, nbr, eattr, heads, c, block_rows=8,
              use_ref=False, dmask=None):
    w_lin, a_src, a_dst, m_edge, bias = gat_param_matrices(
        params, heads, c, 3)
    args = (jnp.asarray(x), w_lin, a_src, a_dst, m_edge,
            jnp.asarray(eattr), jnp.asarray(nbr, jnp.float32),
            jnp.asarray(valid, jnp.float32), bias)
    if use_ref:
        return _reference_forward(
            *args, offsets=offsets_for_connectivity(8),
            negative_slope=0.2, use_edge=True, dmask=dmask)
    return fused_grid_gat(*args, dmask, 8, 0.2, True, block_rows, True)


class TestFusedForward:
    def test_reference_formulation_matches_layer(self):
        layer, params, x, valid, nbr, eattr = setup()
        out_layer = np.asarray(layer.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(valid),
            jnp.asarray(nbr), jnp.asarray(eattr)))
        out_ref = np.asarray(run_fused(params, x, valid, nbr, eattr, 4, 16,
                                       use_ref=True))
        np.testing.assert_allclose(out_ref, out_layer, rtol=1e-4, atol=1e-5)

    def test_pallas_kernel_matches_layer(self):
        layer, params, x, valid, nbr, eattr = setup()
        out_layer = np.asarray(layer.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(valid),
            jnp.asarray(nbr), jnp.asarray(eattr)))
        out_k = np.asarray(run_fused(params, x, valid, nbr, eattr, 4, 16))
        np.testing.assert_allclose(out_k, out_layer, rtol=2e-4, atol=2e-4)

    def test_block_boundary_rows_exact(self):
        # values at rows crossing block boundaries (R=8) must match too
        layer, params, x, valid, nbr, eattr = setup(h=40)
        out_layer = np.asarray(layer.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(valid),
            jnp.asarray(nbr), jnp.asarray(eattr)))
        out_k = np.asarray(run_fused(params, x, valid, nbr, eattr, 4, 16))
        for r in (7, 8, 15, 16, 31, 32, 39):
            np.testing.assert_allclose(out_k[r], out_layer[r], rtol=2e-4,
                                       atol=2e-4, err_msg=f"row {r}")

    def test_odd_height_falls_back(self):
        layer, params, x, valid, nbr, eattr = setup(h=30)  # 30 % 8 != 0
        out = run_fused(params, x, valid, nbr, eattr, 4, 16)
        out_layer = np.asarray(layer.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(valid),
            jnp.asarray(nbr), jnp.asarray(eattr)))
        np.testing.assert_allclose(np.asarray(out), out_layer, rtol=1e-4,
                                   atol=1e-5)


class TestFusedBf16:
    def test_bf16_kernel_close_to_f32_layer(self):
        """bf16-I/O kernel (interpret) tracks the f32 layer within bf16
        rounding (inputs are ~unit scale, outputs O(1))."""
        from bathymetric_gnn_tpu.ops.pallas.grid_gat_fused import (
            fused_grid_gat_infer)

        layer, params, x, valid, nbr, eattr = setup()
        out_layer = np.asarray(layer.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(valid),
            jnp.asarray(nbr), jnp.asarray(eattr)))
        w_lin, a_src, a_dst, m_edge, bias = gat_param_matrices(
            params, 4, 16, 3)
        out_bf = fused_grid_gat_infer(
            jnp.asarray(x), w_lin, a_src, a_dst, m_edge, jnp.asarray(eattr),
            jnp.asarray(nbr, jnp.float32), jnp.asarray(valid, jnp.float32),
            bias, None, 8, 0.2, True, 8, True, compute_dtype=jnp.bfloat16)
        assert out_bf.dtype == jnp.bfloat16
        err = np.abs(np.asarray(out_bf, np.float32) - out_layer)
        scale = np.maximum(np.abs(out_layer), 1.0)
        assert np.max(err / scale) < 0.06, np.max(err / scale)

    def test_bf16_odd_height_fallback_close(self):
        from bathymetric_gnn_tpu.ops.pallas.grid_gat_fused import (
            fused_grid_gat_infer)

        layer, params, x, valid, nbr, eattr = setup(h=30)
        out_layer = np.asarray(layer.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(valid),
            jnp.asarray(nbr), jnp.asarray(eattr)))
        w_lin, a_src, a_dst, m_edge, bias = gat_param_matrices(
            params, 4, 16, 3)
        out_bf = fused_grid_gat_infer(
            jnp.asarray(x), w_lin, a_src, a_dst, m_edge, jnp.asarray(eattr),
            jnp.asarray(nbr, jnp.float32), jnp.asarray(valid, jnp.float32),
            bias, None, 8, 0.2, True, 8, True, compute_dtype=jnp.bfloat16)
        assert out_bf.dtype == jnp.bfloat16
        err = np.abs(np.asarray(out_bf, np.float32) - out_layer)
        scale = np.maximum(np.abs(out_layer), 1.0)
        assert np.max(err / scale) < 0.06, np.max(err / scale)

    def test_bf16_model_classes_match_f32(self):
        """Flagship model in bf16-pallas mode predicts (nearly) the same
        classes as the f32 XLA path."""
        depth = make_ramp_surface(32, 128)
        valid = np.ones((32, 128), bool)
        feats, v, nbr, eattr, _ = build_grid_inputs(
            depth.astype(np.float32), valid)
        from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN

        f32_model = GridBathymetricGNN(hidden_channels=16, num_layers=2,
                                       heads=2)
        variables = f32_model.init(jax.random.PRNGKey(0), feats, v, nbr,
                                   eattr)
        out_f32 = f32_model.apply(variables, feats, v, nbr, eattr)
        bf_model = GridBathymetricGNN(hidden_channels=16, num_layers=2,
                                      heads=2, use_pallas=True,
                                      compute_dtype="bfloat16")
        out_bf = bf_model.apply(variables, feats, v, nbr, eattr)
        agree = np.mean(np.asarray(out_bf["predicted_class"])
                        == np.asarray(out_f32["predicted_class"]))
        assert agree > 0.99, agree
        np.testing.assert_allclose(
            np.asarray(out_bf["confidence"], np.float32),
            np.asarray(out_f32["confidence"]), atol=0.05)


class TestFusedBackward:
    def _grads(self, dmask=None, h=32):
        """Pallas-bwd-kernel grads vs jax.vjp of the XLA reference, over
        ALL differentiable inputs (x, W, a_src, a_dst, m_edge, bias)."""
        layer, params, x, valid, nbr, eattr = setup(h=h)
        w_lin, a_src, a_dst, m_edge, bias = gat_param_matrices(
            params, 4, 16, 3)
        eattr_j = jnp.asarray(eattr)
        nbr_j = jnp.asarray(nbr, jnp.float32)
        valid_j = jnp.asarray(valid, jnp.float32)

        def loss_fused(x_, w_, as_, ad_, me_, b_):
            o = fused_grid_gat(x_, w_, as_, ad_, me_, eattr_j, nbr_j,
                               valid_j, b_, dmask, 8, 0.2, True, 8, True)
            return jnp.sum(o ** 2)

        def loss_ref(x_, w_, as_, ad_, me_, b_):
            o = _reference_forward(x_, w_, as_, ad_, me_, eattr_j,
                                   nbr_j, valid_j, b_,
                                   offsets=offsets_for_connectivity(8),
                                   negative_slope=0.2, use_edge=True,
                                   dmask=dmask)
            return jnp.sum(o ** 2)

        argv = (jnp.asarray(x), w_lin, a_src, a_dst, m_edge, bias)
        g_f = jax.grad(loss_fused, argnums=tuple(range(6)))(*argv)
        g_r = jax.grad(loss_ref, argnums=tuple(range(6)))(*argv)
        return g_f, g_r

    def test_grad_matches_xla_path(self):
        g_f, g_r = self._grads()
        for name, a, b in zip(
                ("x", "w_lin", "a_src", "a_dst", "m_edge", "bias"),
                g_f, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3, err_msg=name)

    def test_grad_matches_with_dropout_mask(self):
        rng = jax.random.PRNGKey(7)
        keep = jax.random.bernoulli(rng, 0.9, (9, 4, 32, 128))
        dmask = keep.astype(jnp.float32) / 0.9
        g_f, g_r = self._grads(dmask=dmask)
        for name, a, b in zip(
                ("x", "w_lin", "a_src", "a_dst", "m_edge", "bias"),
                g_f, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3, err_msg=name)

    def test_grad_ragged_height_fallback(self):
        g_f, g_r = self._grads(h=30)   # 30 % 8 != 0 -> XLA vjp fallback
        for a, b in zip(g_f, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)

    def test_forward_dropout_mask_parity(self):
        layer, params, x, valid, nbr, eattr = setup()
        rng = jax.random.PRNGKey(3)
        keep = jax.random.bernoulli(rng, 0.85, (9, 4, 32, 128))
        dmask = keep.astype(jnp.float32) / 0.85
        out_k = np.asarray(run_fused(params, x, valid, nbr, eattr, 4, 16,
                                     dmask=dmask))
        out_r = np.asarray(run_fused(params, x, valid, nbr, eattr, 4, 16,
                                     use_ref=True, dmask=dmask))
        np.testing.assert_allclose(out_k, out_r, rtol=2e-4, atol=2e-4)

    def test_model_train_grads_pallas_vs_xla(self):
        """Whole-model value_and_grad parity: use_pallas training path
        (fwd + bwd kernels) vs the XLA path, dropout off so both paths are
        deterministic."""
        from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN

        depth = make_ramp_surface(32, 128)
        valid = np.ones((32, 128), bool)
        valid[4:8, 20:60] = False
        feats, v, nbr, eattr, _ = build_grid_inputs(
            np.nan_to_num(depth).astype(np.float32), valid)
        kw = dict(hidden_channels=16, num_layers=2, heads=2, dropout=0.0)
        xla_model = GridBathymetricGNN(**kw)
        pl_model = GridBathymetricGNN(**kw, use_pallas=True)
        variables = xla_model.init(jax.random.PRNGKey(0), feats, v, nbr,
                                   eattr)

        def loss(model, params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, v, nbr, eattr, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            return (jnp.sum(out["class_logits"] ** 2)
                    + jnp.sum(out["confidence"] ** 2))

        lx, gx = jax.value_and_grad(
            lambda p: loss(xla_model, p))(variables["params"])
        lp, gp = jax.value_and_grad(
            lambda p: loss(pl_model, p))(variables["params"])
        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
        flat_x = jax.tree_util.tree_leaves_with_path(gx)
        flat_p = jax.tree_util.tree_leaves_with_path(gp)
        for (kx, ax), (kp, ap) in zip(flat_x, flat_p):
            path = str(kx)
            ax, ap = np.asarray(ax), np.asarray(ap)
            if "GridGATConv" in path and "'bias'" in path:
                # batch-stats BatchNorm follows each conv, so the conv
                # bias cancels exactly; its true grad is ~0 and what
                # remains is f32 cancellation noise in BOTH paths —
                # assert near-zero rather than noise-vs-noise equality
                assert np.max(np.abs(ax)) < 3e-2, path
                assert np.max(np.abs(ap)) < 3e-2, path
                continue
            # compare relative to the leaf's grad scale: the fused
            # forward's different f32 accumulation order perturbs the
            # loss at ~1e-7 relative, which the sum-squared loss scale
            # turns into absolute grad noise (the XLA-vjp fallback shows
            # the identical deviation, so this is numerics, not math)
            scale = np.max(np.abs(ax)) + 1.0
            assert np.max(np.abs(ap - ax)) < 5e-3 * scale, (
                path, np.max(np.abs(ap - ax)), scale)


class TestPallasFlagInModel:
    def test_grid_model_with_use_pallas_matches(self):
        """GridBathymetricGNN(use_pallas=True) == XLA path (interpret on CPU)."""
        import jax

        from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
        from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN

        depth = make_ramp_surface(32, 128)
        valid = np.ones((32, 128), bool)
        valid[4:8, 20:60] = False
        feats, v, nbr, eattr, _ = build_grid_inputs(
            np.nan_to_num(depth).astype(np.float32), valid)
        xla_model = GridBathymetricGNN(hidden_channels=16, num_layers=2,
                                       heads=2)
        variables = xla_model.init(jax.random.PRNGKey(0), feats, v, nbr, eattr)
        out_x = xla_model.apply(variables, feats, v, nbr, eattr)
        pl_model = GridBathymetricGNN(hidden_channels=16, num_layers=2,
                                      heads=2, use_pallas=True)
        out_p = pl_model.apply(variables, feats, v, nbr, eattr)
        for key in ("class_logits", "confidence", "correction"):
            np.testing.assert_allclose(
                np.asarray(out_p[key]), np.asarray(out_x[key]),
                rtol=2e-3, atol=2e-3, err_msg=key)


class TestBf16Training:
    """Round-3: bf16 kernel I/O on the TRAINING path (custom-VJP kernels
    with bf16 forward streams, f32 backward recompute). Gradients must
    stay close to the f32 path — bf16 rounding is treated as identity."""

    def test_bf16_train_grads_close_to_f32(self):
        from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN

        depth = make_ramp_surface(32, 128)
        valid = np.ones((32, 128), bool)
        feats, v, nbr, eattr, _ = build_grid_inputs(
            np.nan_to_num(depth).astype(np.float32), valid)

        def make(cd):
            return GridBathymetricGNN(hidden_channels=16, num_layers=2,
                                      heads=4, dropout=0.0,
                                      use_pallas=True, compute_dtype=cd)

        m32, m16 = make("float32"), make("bfloat16")
        variables = m32.init(jax.random.PRNGKey(0), feats, v, nbr, eattr)

        def loss(model, params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                feats, v, nbr, eattr, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            return (jnp.sum(out["class_logits"] ** 2)
                    + jnp.sum(out["confidence"] ** 2))

        l32, g32 = jax.value_and_grad(
            lambda p: loss(m32, p))(variables["params"])
        l16, g16 = jax.value_and_grad(
            lambda p: loss(m16, p))(variables["params"])
        assert np.isfinite(float(l16))
        np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)
        flat32 = jax.tree_util.tree_flatten_with_path(g32)[0]
        flat16 = dict(jax.tree_util.tree_flatten_with_path(g16)[0])
        norms = {p: np.linalg.norm(np.asarray(l)) for p, l in flat32}
        big = max(norms.values())
        for path, leaf in flat32:
            a, b = np.asarray(flat16[path]), np.asarray(leaf)
            name = "/".join(str(p) for p in path)
            if norms[path] < 1e-3 * big:
                # near-zero reference grads (e.g. a pre-BatchNorm bias is
                # a no-op direction): bf16 cotangent rounding breaks the
                # exact cancellation — only require the noise stays small
                # relative to the dominant gradients
                assert np.linalg.norm(a - b) < 0.05 * big, (
                    name, np.linalg.norm(a - b), big)
                continue
            # relative L2: what matters for training is the direction of
            # the whole leaf, not single bf16-rounded elements
            rel = np.linalg.norm(a - b) / norms[path]
            assert rel < 0.3, (name, rel)


class TestFusedBackwardBf16:
    """Round-4: bf16 matmul inputs in the backward kernel
    (compute_dtype=bfloat16 training). Interpret mode emulates the MXU's
    bf16-in/f32-accumulate dots by rounding operands; parity vs the f32
    XLA reference is bounded by bf16 operand rounding, so tolerances are
    looser than the f32 gates above."""

    def _grads(self, dmask=None, h=32):
        layer, params, x, valid, nbr, eattr = setup(h=h)
        w_lin, a_src, a_dst, m_edge, bias = gat_param_matrices(
            params, 4, 16, 3)
        eattr_j = jnp.asarray(eattr)
        nbr_j = jnp.asarray(nbr, jnp.float32)
        valid_j = jnp.asarray(valid, jnp.float32)

        def loss_fused(x_, w_, as_, ad_, me_, b_):
            o = fused_grid_gat(x_, w_, as_, ad_, me_, eattr_j, nbr_j,
                               valid_j, b_, dmask, 8, 0.2, True, 8, True,
                               jnp.bfloat16)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_ref(x_, w_, as_, ad_, me_, b_):
            o = _reference_forward(x_, w_, as_, ad_, me_, eattr_j,
                                   nbr_j, valid_j, b_,
                                   offsets=offsets_for_connectivity(8),
                                   negative_slope=0.2, use_edge=True,
                                   dmask=dmask)
            return jnp.sum(o ** 2)

        argv = (jnp.asarray(x), w_lin, a_src, a_dst, m_edge, bias)
        g_f = jax.grad(loss_fused, argnums=tuple(range(6)))(*argv)
        g_r = jax.grad(loss_ref, argnums=tuple(range(6)))(*argv)
        return g_f, g_r

    def _check(self, g_f, g_r):
        for name, a, b in zip(
                ("x", "w_lin", "a_src", "a_dst", "m_edge", "bias"),
                g_f, g_r):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.abs(b).max(), 1e-3)
            np.testing.assert_allclose(a / scale, b / scale,
                                       rtol=0, atol=3e-2, err_msg=name)

    def test_bf16_bwd_grads_close(self):
        self._check(*self._grads())

    def test_bf16_bwd_grads_with_dropout(self):
        rng = jax.random.PRNGKey(7)
        keep = jax.random.bernoulli(rng, 0.9, (9, 4, 32, 128))
        dmask = keep.astype(jnp.float32) / 0.9
        self._check(*self._grads(dmask=dmask))
