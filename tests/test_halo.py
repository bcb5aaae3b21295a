"""Halo-exchange spatial partition: sharded forward must exactly match the
single-device dense-grid model on an 8-way row-sharded grid."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN
from bathymetric_gnn_tpu.parallel.halo import (HaloGridGNN,
                                               make_sharded_grid_forward)
from bathymetric_gnn_tpu.parallel.mesh import make_mesh

from conftest import make_ramp_surface


def setup_case(h=64, w=48, masked=True):
    depth = make_ramp_surface(h, w)
    valid = np.ones((h, w), bool)
    if masked:
        valid[10:14, 5:30] = False      # interior hole
        valid[30:34, :] = False         # hole crossing a shard boundary
        valid[0, :] = False
        depth = depth.copy()
        depth[~valid] = np.nan
    return np.nan_to_num(depth).astype(np.float32), valid


@pytest.fixture(scope="module")
def models_and_vars():
    kw = dict(hidden_channels=16, num_layers=3, heads=2, dropout=0.0)
    single = GridBathymetricGNN(**kw)
    halo = HaloGridGNN(**kw)
    depth, valid = setup_case()
    feats, v, nbr, eattr, _ = build_grid_inputs(depth, valid)
    variables = single.init(jax.random.PRNGKey(0), feats, v, nbr, eattr)
    return single, halo, variables


class TestHaloParity:
    def test_sharded_matches_single_device(self, models_and_vars):
        single, halo, variables = models_and_vars
        depth, valid = setup_case()
        feats, v, nbr, eattr, _ = build_grid_inputs(depth, valid)
        out_single = single.apply(variables, feats, v, nbr, eattr)

        mesh = make_mesh(8, graph_axis=8, axis_names=("data", "graph"))
        fwd = make_sharded_grid_forward(halo, mesh)
        out_sharded = fwd(variables, depth, valid)

        for key in ("class_logits", "confidence", "correction"):
            a = np.asarray(out_sharded[key])
            b = np.asarray(out_single[key])
            # the sharded path centers masked stats on its shard-local
            # mean; identical math, different f32 rounding -> tiny noise
            np.testing.assert_allclose(a[valid], b[valid], rtol=1e-3,
                                       atol=5e-4, err_msg=key)

    def test_all_valid_grid(self, models_and_vars):
        single, halo, variables = models_and_vars
        depth, valid = setup_case(masked=False)
        feats, v, nbr, eattr, _ = build_grid_inputs(depth, valid)
        out_single = single.apply(variables, feats, v, nbr, eattr)
        mesh = make_mesh(8, graph_axis=8)
        fwd = make_sharded_grid_forward(halo, mesh)
        out_sharded = fwd(variables, depth, valid)
        np.testing.assert_allclose(
            np.asarray(out_sharded["class_logits"]),
            np.asarray(out_single["class_logits"]), rtol=1e-3, atol=5e-4)

    def test_overlap_matches_serial(self, models_and_vars):
        """Overlapped halo formulation (interior conv concurrent with the
        boundary-row ppermutes + strip-conv finish) must equal the serial
        exchange-then-aggregate path."""
        single, halo, variables = models_and_vars
        depth, valid = setup_case()
        mesh = make_mesh(8, graph_axis=8)
        kw = dict(hidden_channels=16, num_layers=3, heads=2, dropout=0.0)
        out_overlap = make_sharded_grid_forward(
            HaloGridGNN(**kw, overlap=True), mesh)(variables, depth, valid)
        out_serial = make_sharded_grid_forward(
            HaloGridGNN(**kw, overlap=False), mesh)(variables, depth, valid)
        for key in ("class_logits", "confidence", "correction"):
            np.testing.assert_allclose(
                np.asarray(out_overlap[key]), np.asarray(out_serial[key]),
                rtol=1e-5, atol=1e-6, err_msg=key)

    def test_train_mode_batchnorm_global(self, models_and_vars):
        """psum'd BatchNorm moments == single-device batch moments."""
        single, halo, variables = models_and_vars
        depth, valid = setup_case()
        feats, v, nbr, eattr, _ = build_grid_inputs(depth, valid)
        _, upd_single = single.apply(
            variables, feats, v, nbr, eattr, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )
        mesh = make_mesh(8, graph_axis=8)
        halo_model = halo

        def local(vs, d, vm):
            return halo_model.apply(
                vs, d, vm, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
            )

        fwd = jax.jit(lambda vs, d, vm: jax.shard_map(
            local, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(), vs), P("graph"), P("graph")),
            out_specs=(P("graph"), jax.tree.map(lambda _: P(), variables
                                                ["batch_stats"]) and
                       jax.tree.map(lambda _: P(),
                                    {"batch_stats":
                                     variables["batch_stats"]})),
            check_vma=False,
        )(vs, d, vm))
        out, upd = fwd(variables, depth, valid)
        a = np.asarray(upd["batch_stats"]["MaskedBatchNorm_0"]["mean"])
        b = np.asarray(upd_single["batch_stats"]["MaskedBatchNorm_0"]["mean"])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def _make_train_batch(bsz=2, h=32, w=48, seed=7):
    import jax.numpy as jnp

    rg = np.random.default_rng(seed)
    tiles, valids, labels, corrs = [], [], [], []
    for i in range(bsz):
        depth, valid = setup_case(h=h, w=w, masked=(i == 0))
        lbl = (rg.random((h, w)) < 0.2).astype(np.int32) * 2
        corr = rg.normal(0, 0.3, (h, w)).astype(np.float32) * (lbl == 2)
        tiles.append(depth); valids.append(valid)
        labels.append(lbl); corrs.append(corr)
    return {
        "noisy": jnp.asarray(np.stack(tiles)),
        "valid": jnp.asarray(np.stack(valids)),
        "labels": jnp.asarray(np.stack(labels)),
        "raw_correction": jnp.asarray(np.stack(corrs)),
    }


def _make_optimizer(tc):
    import optax

    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=tc.learning_rate, weight_decay=tc.weight_decay),
    )


class TestHaloTrainStep:
    """dp x sp training step on a 2x4 virtual mesh: one full optimizer
    update with row-sharded grids must run and produce finite losses,
    updated params, and graph-consistent BatchNorm stats."""

    def test_dp_sp_step(self, models_and_vars):
        import jax.numpy as jnp
        import optax

        from bathymetric_gnn_tpu.config.config import TrainingConfig
        from bathymetric_gnn_tpu.parallel.halo import make_halo_train_step
        from bathymetric_gnn_tpu.training.trainer import TrainState

        single, halo, variables = models_and_vars
        tc = TrainingConfig()
        optimizer = optax.chain(
            optax.clip_by_global_norm(tc.grad_clip_norm),
            optax.inject_hyperparams(optax.adamw)(
                learning_rate=tc.learning_rate,
                weight_decay=tc.weight_decay),
        )
        state = TrainState(variables["params"], variables["batch_stats"],
                           optimizer.init(variables["params"]), jnp.int32(0))

        # batch of 2 tiles sharded data=2, rows sharded graph=4
        rg = np.random.default_rng(7)
        tiles, valids, labels, corrs = [], [], [], []
        for i in range(2):
            depth, valid = setup_case(h=32, w=48, masked=(i == 0))
            lbl = (rg.random((32, 48)) < 0.2).astype(np.int32) * 2
            corr = rg.normal(0, 0.3, (32, 48)).astype(np.float32) * (lbl == 2)
            tiles.append(depth); valids.append(valid)
            labels.append(lbl); corrs.append(corr)
        batch = {
            "noisy": jnp.asarray(np.stack(tiles)),
            "valid": jnp.asarray(np.stack(valids)),
            "labels": jnp.asarray(np.stack(labels)),
            "raw_correction": jnp.asarray(np.stack(corrs)),
        }

        mesh = make_mesh(8, graph_axis=4)
        step = make_halo_train_step(
            halo, optimizer, tc, jnp.ones(3), 1.0, mesh)
        new_state, losses, acc = step(state, batch, jax.random.PRNGKey(0),
                                      jnp.float32(1e-3))
        assert np.isfinite(float(losses["total"]))
        assert 0.0 <= float(acc) <= 1.0
        # params actually moved
        d0 = jax.tree.leaves(state.params)[0]
        d1 = jax.tree.leaves(new_state.params)[0]
        assert not np.allclose(np.asarray(d0), np.asarray(d1))
        # a second step chains (opt state round-trips)
        s2, losses2, _ = step(new_state, batch, jax.random.PRNGKey(1),
                              jnp.float32(1e-3))
        assert np.isfinite(float(losses2["total"]))
        assert int(s2.step) == 2

    def test_sharded_step_matches_single_device(self, models_and_vars):
        """EXACT dp x sp objective: a train step on the 2x4 mesh must
        reproduce the single-device step (same model on a 1x1 mesh) —
        losses, accuracy, AND updated parameters — on masked grids whose
        valid nodes distribute unevenly across row shards (VERDICT r1
        item 4). Loss terms are psum'd over the graph axis before
        normalizing; grads psum over graph / pmean over data."""
        import jax.numpy as jnp

        from bathymetric_gnn_tpu.config.config import TrainingConfig
        from bathymetric_gnn_tpu.parallel.halo import make_halo_train_step
        from bathymetric_gnn_tpu.training.trainer import TrainState

        import optax

        single, halo, variables = models_and_vars  # halo has dropout=0.0
        tc = TrainingConfig()
        # SGD(lr=1) + huge clip threshold: updated params differ from the
        # originals by exactly -grad, so the param comparison IS a grad
        # comparison (Adam's first step is ~lr*sign(g) — comparing it is
        # ill-conditioned wherever g ~ f32 noise)
        optimizer = optax.chain(
            optax.clip_by_global_norm(1e9),
            optax.inject_hyperparams(optax.sgd)(learning_rate=1.0),
        )

        def fresh_state():
            return TrainState(variables["params"], variables["batch_stats"],
                              optimizer.init(variables["params"]),
                              jnp.int32(0))

        batch = _make_train_batch(bsz=2)
        cw = jnp.asarray([0.5, 1.5, 1.0], jnp.float32)  # non-uniform CE weights

        mesh_ref = make_mesh(1, graph_axis=1)
        step_ref = make_halo_train_step(halo, optimizer, tc, cw, 1.0,
                                        mesh_ref)
        st_ref, losses_ref, acc_ref = step_ref(
            fresh_state(), batch, jax.random.PRNGKey(3), jnp.float32(1e-3))

        mesh = make_mesh(8, graph_axis=4)
        step_sh = make_halo_train_step(halo, optimizer, tc, cw, 1.0, mesh)
        st_sh, losses_sh, acc_sh = step_sh(
            fresh_state(), batch, jax.random.PRNGKey(3), jnp.float32(1e-3))

        for k in losses_ref:
            np.testing.assert_allclose(
                float(losses_sh[k]), float(losses_ref[k]),
                rtol=2e-4, atol=1e-5, err_msg=f"loss[{k}]")
        np.testing.assert_allclose(float(acc_sh), float(acc_ref),
                                   rtol=1e-5, atol=1e-6)
        # param delta == -grad (SGD lr=1): grads must match shard counts
        ref_g = jax.tree.map(lambda new, old: np.asarray(new) - np.asarray(old),
                             st_ref.params, variables["params"])
        sh_g = jax.tree.map(lambda new, old: np.asarray(new) - np.asarray(old),
                            st_sh.params, variables["params"])
        gscale = max(float(np.max(np.abs(g))) for g in jax.tree.leaves(ref_g))
        for a, b in zip(jax.tree.leaves(sh_g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(a, b, rtol=1e-3,
                                       atol=max(gscale * 1e-4, 1e-7))
        # BatchNorm running stats also agree (psum'd masked moments)
        for a, b in zip(jax.tree.leaves(st_sh.batch_stats),
                        jax.tree.leaves(st_ref.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)
