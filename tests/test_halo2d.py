"""2-D (row x col) halo partition: block-sharded forward and the
dp x row x col train step must match the single-device model, including
corner cells carried by the two-step halo exchange."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN
from bathymetric_gnn_tpu.parallel.halo2d import (
    HaloGrid2DGNN, make_halo2d_train_step, make_sharded_grid2d_forward)

from conftest import make_ramp_surface


def mesh_2d(nr=2, nc=2, data=1):
    devs = np.asarray(jax.devices()[:data * nr * nc]).reshape(data, nr, nc)
    return Mesh(devs, ("data", "row", "col"))


def setup_case(h=32, w=32, masked=True):
    depth = make_ramp_surface(h, w)
    valid = np.ones((h, w), bool)
    if masked:
        valid[6:10, 5:20] = False            # interior hole
        valid[h // 2 - 2:h // 2 + 2, :] = False  # hole on the row seam
        valid[:, w // 2] = False             # line on the col seam
        depth = depth.copy()
        depth[~valid] = np.nan
    return np.nan_to_num(depth).astype(np.float32), valid


@pytest.fixture(scope="module")
def models_and_vars():
    kw = dict(hidden_channels=16, num_layers=3, heads=2, dropout=0.0)
    single = GridBathymetricGNN(**kw)
    halo = HaloGrid2DGNN(**kw)
    depth, valid = setup_case()
    feats, v, nbr, eattr, _ = build_grid_inputs(depth, valid)
    variables = single.init(jax.random.PRNGKey(0), feats, v, nbr, eattr)
    return single, halo, variables


class TestHalo2DParity:
    def test_block_sharded_matches_single_device(self, models_and_vars):
        single, halo, variables = models_and_vars
        depth, valid = setup_case()
        feats, v, nbr, eattr, _ = build_grid_inputs(depth, valid)
        out_single = single.apply(variables, feats, v, nbr, eattr)

        fwd = make_sharded_grid2d_forward(halo, mesh_2d(2, 2))
        out_sharded = fwd(variables, depth, valid)
        for key in ("class_logits", "confidence", "correction"):
            # shard-local-mean centering of the masked stats gives
            # identical math but different f32 rounding (see the 1-D
            # parity test); 2-D blocks re-center per block
            np.testing.assert_allclose(
                np.asarray(out_sharded[key])[valid],
                np.asarray(out_single[key])[valid],
                rtol=1e-3, atol=2e-3, err_msg=key)

    def test_2x4_and_4x2_layouts(self, models_and_vars):
        single, halo, variables = models_and_vars
        depth, valid = setup_case(h=48, w=64)
        feats, v, nbr, eattr, _ = build_grid_inputs(depth, valid)
        out_single = single.apply(variables, feats, v, nbr, eattr)
        for nr, nc in ((2, 4), (4, 2)):
            fwd = make_sharded_grid2d_forward(halo, mesh_2d(nr, nc))
            out_sharded = fwd(variables, depth, valid)
            np.testing.assert_allclose(
                np.asarray(out_sharded["class_logits"])[valid],
                np.asarray(out_single["class_logits"])[valid],
                rtol=1e-3, atol=5e-4, err_msg=f"{nr}x{nc}")

    def test_corner_cells_exact(self, models_and_vars):
        """Cells adjacent to the 4-corner junction of a 2x2 block split
        depend on the diagonal neighbor's data — the two-step exchange
        must deliver it."""
        single, halo, variables = models_and_vars
        depth, valid = setup_case(masked=False)
        feats, v, nbr, eattr, _ = build_grid_inputs(depth, valid)
        out_single = single.apply(variables, feats, v, nbr, eattr)
        fwd = make_sharded_grid2d_forward(halo, mesh_2d(2, 2))
        out_sharded = fwd(variables, depth, valid)
        h, w = depth.shape
        corner = np.s_[h // 2 - 2:h // 2 + 2, w // 2 - 2:w // 2 + 2]
        np.testing.assert_allclose(
            np.asarray(out_sharded["class_logits"])[corner],
            np.asarray(out_single["class_logits"])[corner],
            rtol=1e-3, atol=5e-4)


class TestHalo2DTrainStep:
    def test_sharded_step_matches_unsharded_mesh(self, models_and_vars):
        """EXACT dp x row x col objective: a train step on the 1x2x2 mesh
        must reproduce the same step on a 1x1x1 mesh — losses, accuracy,
        AND updated parameters — on a masked survey whose valid cells
        distribute unevenly across blocks. (The 1x1x1 step itself matches
        the single-device forward via TestHalo2DParity; comparing step-
        vs-step pins the psum'd numerator/denominator sharding math
        without re-deriving featurization rounding, mirroring the 1-D
        test in test_halo.py.)"""
        from bathymetric_gnn_tpu.config.config import TrainingConfig
        from bathymetric_gnn_tpu.training.trainer import TrainState

        single, halo, variables = models_and_vars  # halo has dropout=0.0
        tc = TrainingConfig()
        # SGD(lr=1) + huge clip threshold: updated params differ from the
        # originals by exactly -grad, so the param comparison IS a grad
        # comparison (see test_halo.py)
        optimizer = optax.chain(
            optax.clip_by_global_norm(1e9),
            optax.inject_hyperparams(optax.sgd)(learning_rate=1.0))

        def fresh_state():
            return TrainState(variables["params"], variables["batch_stats"],
                              optimizer.init(variables["params"]),
                              jnp.int32(0))

        rng = np.random.default_rng(0)
        depth, valid = setup_case()
        labels = (rng.random(depth.shape) < 0.25).astype(np.int32) * 2
        raw_corr = rng.normal(0, 0.1, depth.shape).astype(np.float32)
        batch = {
            "noisy": jnp.asarray(depth)[None],
            "valid": jnp.asarray(valid)[None],
            "labels": jnp.asarray(labels)[None],
            "raw_correction": jnp.asarray(raw_corr)[None],
        }
        cw = jnp.asarray([0.5, 1.5, 1.0], jnp.float32)

        step_ref = make_halo2d_train_step(halo, optimizer, tc, cw, 1.0,
                                          mesh_2d(1, 1))
        st_ref, losses_ref, acc_ref = step_ref(
            fresh_state(), batch, jax.random.PRNGKey(3), jnp.float32(1e-3))

        step_sh = make_halo2d_train_step(halo, optimizer, tc, cw, 1.0,
                                         mesh_2d(2, 2))
        st_sh, losses_sh, acc_sh = step_sh(
            fresh_state(), batch, jax.random.PRNGKey(3), jnp.float32(1e-3))

        for k in losses_ref:
            np.testing.assert_allclose(
                float(losses_sh[k]), float(losses_ref[k]),
                rtol=2e-4, atol=1e-5, err_msg=f"loss[{k}]")
        np.testing.assert_allclose(float(acc_sh), float(acc_ref),
                                   rtol=1e-5, atol=1e-6)
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(st_sh.params),
                jax.tree_util.tree_leaves_with_path(st_ref.params)):
            a, b = np.asarray(a), np.asarray(b)
            gscale = np.max(np.abs(b)) + 1e-9
            np.testing.assert_allclose(
                a, b, rtol=1e-3, atol=max(gscale * 1e-4, 1e-7),
                err_msg=str(kp))
