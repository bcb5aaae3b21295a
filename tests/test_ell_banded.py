"""Banded-ELL sparse path: band/spill decomposition + Pallas band kernel
must exactly reproduce the plain ELL GAT layer (models/conv_ell.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bathymetric_gnn_tpu.config.config import BucketConfig, GraphConfig
from bathymetric_gnn_tpu.data.graph_build import GraphBuilder
from bathymetric_gnn_tpu.models.conv_ell import GATConvELL, GATConvEllBanded
from bathymetric_gnn_tpu.ops.ell import coo_to_ell
from bathymetric_gnn_tpu.ops.ell_banded import band_ell


def make_knn_ell(n_points=1500, n_pad=2048, k=8, seed=0, edge_dim=3):
    rg = np.random.default_rng(seed)
    pos = rg.random((n_points, 2)).astype(np.float32) * 100.0
    depth = (30 + rg.normal(0, 2, n_points)).astype(np.float32)
    x = rg.normal(size=(n_points, 7)).astype(np.float32)
    gb = GraphBuilder(GraphConfig(), BucketConfig(node_buckets=(n_pad,)))
    bg = gb.build_knn_graph(x, pos, k=k, depth=depth)
    return coo_to_ell(bg.graph, max_degree=k)


@pytest.fixture(scope="module")
def knn_case():
    g = make_knn_ell()
    banded = band_ell(g, band_rows=256)
    x = jnp.asarray(
        np.random.default_rng(3).normal(
            size=(g.num_nodes_padded, 16)).astype(np.float32))
    return g, banded, x


class TestBandedDecomposition:
    def test_partition_covers_all_edges(self, knn_case):
        g, banded, _ = knn_case
        live = int(np.asarray(g.nbr_mask).sum())
        in_band = int((np.asarray(banded.loc_t) >= 0).sum())
        spills = int(np.asarray(banded.spill_mask).sum())
        assert in_band + spills == live
        # Morton ordering keeps spill small on k-NN graphs
        assert banded.spill_fraction(g) < 0.15

    def test_local_indices_resolve_to_sources(self, knn_case):
        g, banded, _ = knn_case
        from bathymetric_gnn_tpu.ops.ell_banded import banded_window_source

        gsrc = np.asarray(banded_window_source(banded)).T   # [N, K]
        loc = np.asarray(banded.loc_t).T
        src = np.asarray(g.nbr_src)
        sel = loc >= 0
        np.testing.assert_array_equal(gsrc[sel], src[sel])

    def test_spill_edges_match(self, knn_case):
        g, banded, _ = knn_case
        src = np.asarray(g.nbr_src)
        sm = np.asarray(banded.spill_mask)
        sd = np.asarray(banded.spill_dst)[sm]
        sk = np.asarray(banded.spill_slot)[sm]
        ss = np.asarray(banded.spill_src)[sm]
        np.testing.assert_array_equal(src[sd, sk], ss)


def _init_pair(g, x, banded, **kw):
    ell = GATConvELL(out_channels=12, heads=2, edge_dim=3, **kw)
    band = GATConvEllBanded(out_channels=12, heads=2, edge_dim=3, **kw)
    v1 = ell.init(jax.random.PRNGKey(7), g, x)
    v2 = band.init(jax.random.PRNGKey(7), g, banded, x)
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    return ell, band, v1


class TestBandedXlaParity:
    def test_matches_plain_ell(self, knn_case):
        g, banded, x = knn_case
        ell, band, v = _init_pair(g, x, banded)
        ref = ell.apply(v, g, x)
        out = band.apply(v, g, banded, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_no_self_loops_and_no_edge_dim(self, knn_case):
        g, banded, x = knn_case
        for kw in ({"add_self_loops": False},):
            ell = GATConvELL(out_channels=12, heads=2, edge_dim=3, **kw)
            band = GATConvEllBanded(out_channels=12, heads=2, edge_dim=3,
                                    **kw)
            v = ell.init(jax.random.PRNGKey(1), g, x)
            ref = ell.apply(v, g, x)
            out = band.apply(v, g, banded, x)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)

    def test_band_rows_128(self, knn_case):
        g, _, x = knn_case
        banded = band_ell(g, band_rows=128)
        ell, band, v = _init_pair(g, x, banded)
        ref = ell.apply(v, g, x)
        out = band.apply(v, g, banded, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestBandedPallasParity:
    """Pallas band kernel (interpret mode off-TPU) vs the XLA band part."""

    def test_f32_matches(self, knn_case):
        g, banded, x = knn_case
        ell, band_x, v = _init_pair(g, x, banded)
        band_p = GATConvEllBanded(out_channels=12, heads=2, edge_dim=3,
                                  use_pallas=True)
        ref = band_x.apply(v, g, banded, x)
        out = band_p.apply(v, g, banded, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # and against the plain ELL layer
        ref2 = ell.apply(v, g, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref2),
                                   rtol=5e-5, atol=5e-5)

    def test_full_model_banded_matches_xla(self, knn_case):
        """EllBathymetricGNN with sparse_kernel='banded'/'banded_pallas'
        reproduces the plain-ELL model from the SAME checkpoint."""
        from bathymetric_gnn_tpu.models.gnn_ell import EllBathymetricGNN

        g, banded, _ = knn_case
        kw = dict(hidden_channels=16, num_layers=2, heads=2, dropout=0.0)
        base = EllBathymetricGNN(**kw)
        v = base.init(jax.random.PRNGKey(0), g)
        ref = base.apply(v, g)
        for kernel in ("banded", "banded_pallas"):
            m = EllBathymetricGNN(**kw, sparse_kernel=kernel)
            out = m.apply(v, g, banded=banded)
            for key in ("class_logits", "confidence", "correction"):
                np.testing.assert_allclose(
                    np.asarray(out[key]), np.asarray(ref[key]),
                    rtol=5e-4, atol=5e-5, err_msg=f"{kernel}:{key}")

    def test_bf16_close(self, knn_case):
        g, banded, x = knn_case
        _, band_x, v = _init_pair(g, x, banded)
        band_p = GATConvEllBanded(out_channels=12, heads=2, edge_dim=3,
                                  use_pallas=True, compute_dtype="bfloat16")
        ref = band_x.apply(v, g, banded, x)
        out = band_p.apply(v, g, banded, x)
        ref_n = np.asarray(ref)
        scale = np.abs(ref_n).max()
        assert np.abs(np.asarray(out) - ref_n).max() < 0.02 * max(scale, 1)
