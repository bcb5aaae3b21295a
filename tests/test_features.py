"""Golden tests: on-device featurization vs independent SciPy/NumPy math.

The goldens re-derive the reference's feature definitions
(reference: data/graph_construction.py:245-456) directly from SciPy here, so
the device path is checked against an independent implementation.
"""

import numpy as np
import pytest
from scipy import ndimage

from bathymetric_gnn_tpu.ops import features as F

from conftest import make_ramp_surface


def scipy_masked_stats(depth, valid, size=5):
    dm = np.where(valid, depth, 0.0).astype(np.float64)
    vf = valid.astype(np.float64)
    area = float(size * size)
    s = ndimage.uniform_filter(dm, size=size, mode="constant", cval=0.0) * area
    c = ndimage.uniform_filter(vf, size=size, mode="constant", cval=0.0) * area
    sc = np.maximum(c, 1.0)
    mean = s / sc
    sq = ndimage.uniform_filter(np.where(valid, depth.astype(np.float64) ** 2, 0.0),
                                size=size, mode="constant", cval=0.0) * area
    var = np.maximum(sq / sc - mean ** 2, 0.0)
    return mean, np.sqrt(var), c


def make_masked_depth(h=48, w=48):
    depth = make_ramp_surface(h, w)
    valid = np.ones((h, w), bool)
    valid[:6, :] = False          # boundary band
    valid[20:25, 10:18] = False   # interior hole
    valid[-1, -1] = False
    depth = depth.copy()
    depth[~valid] = np.nan
    return depth, valid


class TestMaskedLocalStats:
    def test_matches_scipy(self):
        depth, valid = make_masked_depth()
        mean_g, std_g, cnt_g = scipy_masked_stats(np.nan_to_num(depth), valid)
        mean_d, std_d, cnt_d = F.masked_local_stats(
            np.nan_to_num(depth).astype(np.float32), valid, 5
        )
        # reference reports mean 0 on fully-invalid windows; golden too
        mean_gz = np.where(cnt_g > 0, mean_g, 0.0)
        np.testing.assert_allclose(np.asarray(mean_d), mean_gz, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(std_d), std_g, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(cnt_d), cnt_g, atol=1e-3)

    def test_deep_flat_water_no_cancellation(self):
        # 4000 m deep, mm-scale roughness: float32 E[x^2]-E[x]^2 would
        # catastrophically cancel without the shift trick (SURVEY §7.3 #7).
        rg = np.random.default_rng(0)
        depth = 4000.0 + rg.normal(0, 0.001, (32, 32)).astype(np.float32)
        valid = np.ones((32, 32), bool)
        # exact golden: per-window two-pass std in float64 (scipy's
        # moving-sum uniform_filter is itself imprecise in this regime)
        win = np.lib.stride_tricks.sliding_window_view(
            depth.astype(np.float64), (5, 5)
        )
        std_g = win.std(axis=(-2, -1))
        _, std_d, _ = F.masked_local_stats(depth, valid, 5)
        np.testing.assert_allclose(
            np.asarray(std_d)[2:-2, 2:-2], std_g, rtol=2e-3, atol=2e-6
        )


class TestGradients:
    def test_matches_np_gradient(self):
        depth = make_ramp_surface(40, 56)
        gy_g, gx_g = np.gradient(depth)
        gy_d, gx_d = F.gradients(depth)
        np.testing.assert_allclose(np.asarray(gy_d), gy_g, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx_d), gx_g, rtol=1e-5, atol=1e-5)


class TestCurvature:
    def test_matches_scipy_laplace(self):
        depth = make_ramp_surface(40, 40)
        valid = np.ones((40, 40), bool)
        valid[5:9, 5:9] = False
        lap_g = ndimage.laplace(depth.astype(np.float64))
        cnt = ndimage.convolve(valid.astype(np.float64), np.ones((3, 3)),
                               mode="constant", cval=0.0)
        lap_g[cnt < 3] = 0.0
        lap_d = F.curvature(depth, valid)
        np.testing.assert_allclose(np.asarray(lap_d), lap_g, rtol=1e-4, atol=1e-4)


class TestComputeGridFeatures:
    def test_shapes_and_finiteness(self):
        depth, valid = make_masked_depth()
        gf = F.compute_grid_features(np.nan_to_num(depth), valid)
        assert gf.features.shape == (48, 48, 7)
        assert np.isfinite(np.asarray(gf.features)).all()
        assert (np.asarray(gf.features)[~valid] == 0).all()

    def test_uncertainty_channel(self):
        depth, valid = make_masked_depth()
        unc = np.full(depth.shape, 0.25, np.float32)
        gf = F.compute_grid_features(np.nan_to_num(depth), valid, unc)
        assert gf.features.shape == (48, 48, 8)
        f = np.asarray(gf.features)
        assert np.allclose(f[valid, 7], 0.25)

    def test_feature_order_is_canonical(self):
        depth, valid = make_masked_depth()
        gf = F.compute_grid_features(np.nan_to_num(depth), valid)
        f = np.asarray(gf.features)
        # channel 0 = raw depth at valid cells
        np.testing.assert_allclose(
            f[valid, 0], np.nan_to_num(depth)[valid], rtol=1e-6
        )
        # channel 2 = local_std
        np.testing.assert_allclose(f[..., 2][valid],
                                   np.asarray(gf.local_std)[valid], rtol=1e-6)
