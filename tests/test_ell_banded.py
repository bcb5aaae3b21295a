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


class TestFusedSpillInKernel:
    """Round-3 fused kernel (spill folded in-kernel, normalized output)
    vs the legacy band-kernel + XLA-spill-fold path, plus the streamed
    attention-dropout replay."""

    def test_legacy_and_fused_match(self, knn_case):
        g, banded, x = knn_case
        _, _, v = _init_pair(g, x, banded)
        legacy = GATConvEllBanded(out_channels=12, heads=2, edge_dim=3,
                                  use_pallas=True, spill_in_kernel=False)
        fused = GATConvEllBanded(out_channels=12, heads=2, edge_dim=3,
                                 use_pallas=True, spill_in_kernel=True)
        np.testing.assert_allclose(
            np.asarray(fused.apply(v, g, banded, x)),
            np.asarray(legacy.apply(v, g, banded, x)),
            rtol=2e-5, atol=2e-5)

    def test_dropout_replay_matches_dense_oracle(self, knn_case):
        """The fused kernel's streamed dropout masks reproduce the exact
        post-softmax-weight dropout semantics: a dense oracle applies the
        SAME masks to the undropped softmax weights and must agree."""
        from bathymetric_gnn_tpu.models.conv_ell import (
            make_banded_dropout_masks)
        from bathymetric_gnn_tpu.ops.ell import ell_gather, \
            ell_masked_softmax

        g, banded, x = knn_case
        h_heads, cc, p = 2, 12, 0.35
        fused = GATConvEllBanded(out_channels=cc, heads=h_heads, edge_dim=3,
                                 use_pallas=True, spill_in_kernel=True,
                                 dropout=p)
        v = fused.init(jax.random.PRNGKey(7), g, banded, x)
        rng = jax.random.PRNGKey(123)
        out = fused.apply(v, g, banded, x, False,
                          rngs={"dropout": rng})

        # flax's make_rng derivation is internal; run the module a second
        # time capturing the masks via a monkeypatched generator
        captured = {}
        import bathymetric_gnn_tpu.models.conv_ell as ce
        orig = ce.make_banded_dropout_masks

        def capture(rng_, *a, **kw):
            res = orig(rng_, *a, **kw)
            captured["masks"] = res
            return res

        ce.make_banded_dropout_masks = capture
        try:
            out2 = fused.apply(v, g, banded, x, False,
                               rngs={"dropout": rng})
        finally:
            ce.make_banded_dropout_masks = orig
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   rtol=1e-6, atol=1e-6)
        dm, dm_sp = captured["masks"]
        if np.asarray(dm).ndim == 3:  # round-5 wide layout -> oracle layout
            from bathymetric_gnn_tpu.models.conv_ell import \
                banded_masks_wide_to_khn
            dm = banded_masks_wide_to_khn(dm, g.nbr_src.shape[1], h_heads)

        # dense oracle: undropped softmax weights (GATConvELL math), then
        # apply the streamed masks per edge via the band/spill mapping
        params = v["params"]
        n, k = g.nbr_src.shape
        w_lin = params["lin_src"]
        xh = (x @ w_lin).reshape(n, h_heads, cc)
        a_src = jnp.sum(xh * params["att_src"], -1)
        a_dst = jnp.sum(xh * params["att_dst"], -1)
        we = params["lin_edge"]
        m_edge = jnp.einsum("fac,xac->fa",
                            we.reshape(3, h_heads, cc), params["att_edge"])
        logits = (ell_gather(a_src, g.nbr_src) + a_dst[:, None, :]
                  + g.edge_attr @ m_edge)
        cnt = jnp.maximum(jnp.sum(g.nbr_mask.astype(jnp.float32), 1), 1.0)
        mean_attr = jnp.sum(
            jnp.where(g.nbr_mask[..., None], g.edge_attr, 0.0), 1
        ) / cnt[:, None]
        self_logit = jax.nn.leaky_relu(
            a_src + a_dst + mean_attr @ m_edge, 0.2)
        logits = jax.nn.leaky_relu(logits, 0.2)
        wts, w_self = ell_masked_softmax(logits, g.nbr_mask, self_logit)

        # per-(n, k) mask: in-band slots read dm[k*H+h, n]; spilled edges
        # read dm_sp[band, h, position-in-band] (same compaction order as
        # band_ell: spill_dst-major)
        dm = np.asarray(dm)
        dm_sp = np.asarray(dm_sp)
        loc = np.asarray(banded.loc_t).T               # [N, K]
        mask_nk = np.empty((n, k, h_heads), np.float32)
        for kk in range(k):
            mask_nk[:, kk, :] = dm[kk * h_heads:(kk + 1) * h_heads, :].T
        sm = np.asarray(banded.spill_mask)
        sd = np.asarray(banded.spill_dst)[sm]
        sk = np.asarray(banded.spill_slot)[sm]
        r = banded.band_rows
        band_of = sd // r
        counts = np.bincount(band_of, minlength=banded.loc_t.shape[1] // r)
        starts = np.concatenate([[0], np.cumsum(counts)])
        pos_in_band = np.arange(len(sd)) - starts[band_of]
        mask_nk[sd, sk, :] = dm_sp[band_of, :, pos_in_band]
        w_drop = np.asarray(wts) * mask_nk
        w_self_drop = (np.asarray(w_self)
                       * dm[k * h_heads:, :].T)

        nbr_x = ell_gather(xh, g.nbr_src)
        ref = (jnp.sum(nbr_x * jnp.asarray(w_drop)[..., None], axis=1)
               + xh * jnp.asarray(w_self_drop)[..., None])
        ref = ref.reshape(n, h_heads * cc) + params["bias"]
        ref = jnp.where(g.node_mask[:, None], ref, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestFusedBackward:
    """Custom-VJP backward kernel (interpret mode off-TPU) vs jax.grad of
    the plain ELL layer — same params, same graph, full input+param
    gradient parity."""

    def test_grads_match_plain_ell(self, knn_case):
        g, banded, x = knn_case
        ell, band_p, v = _init_pair(g, x, banded)
        fused = GATConvEllBanded(out_channels=12, heads=2, edge_dim=3,
                                 use_pallas=True, spill_in_kernel=True)
        rg = np.random.default_rng(11)
        w = jnp.asarray(rg.normal(size=(g.num_nodes_padded, 24))
                        .astype(np.float32))

        def loss_ell(params, xx):
            out = ell.apply({"params": params}, g, xx)
            return jnp.sum(out * w)

        def loss_fused(params, xx):
            out = fused.apply({"params": params}, g, banded, xx)
            return jnp.sum(out * w)

        gp_ref, gx_ref = jax.grad(loss_ell, argnums=(0, 1))(v["params"], x)
        gp, gx = jax.grad(loss_fused, argnums=(0, 1))(v["params"], x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=5e-4, atol=5e-5)
        flat_ref = jax.tree_util.tree_flatten_with_path(gp_ref)[0]
        flat = dict(jax.tree_util.tree_flatten_with_path(gp)[0])
        for path, leaf in flat_ref:
            np.testing.assert_allclose(
                np.asarray(flat[path]), np.asarray(leaf),
                rtol=5e-4, atol=5e-5,
                err_msg="/".join(str(p) for p in path))

    def test_grads_no_self_loops(self, knn_case):
        g, banded, x = knn_case
        ell = GATConvELL(out_channels=12, heads=2, edge_dim=3,
                         add_self_loops=False)
        fused = GATConvEllBanded(out_channels=12, heads=2, edge_dim=3,
                                 add_self_loops=False, use_pallas=True)
        v = ell.init(jax.random.PRNGKey(5), g, x)

        def loss(mod, params, *extra):
            return jnp.sum(jnp.tanh(mod.apply({"params": params}, g,
                                              *extra, x)))

        g_ref = jax.grad(lambda p: loss(ell, p))(v["params"])
        g_out = jax.grad(lambda p: loss(fused, p, banded))(v["params"])
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(g_ref)[0],
                jax.tree_util.tree_flatten_with_path(g_out)[0]):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=5e-5,
                                       err_msg=str(pa))

    def test_dropout_grads_match_masked_oracle(self, knn_case):
        """Backward under dropout: grads of the fused kernel equal grads
        of a pure-XLA replay applying the SAME captured masks."""
        from bathymetric_gnn_tpu.models.conv_ell import (
            make_banded_dropout_masks)
        from bathymetric_gnn_tpu.ops.ell import ell_gather, \
            ell_masked_softmax

        g, banded, x = knn_case
        h_heads, cc, p = 2, 12, 0.3
        fused = GATConvEllBanded(out_channels=cc, heads=h_heads, edge_dim=3,
                                 use_pallas=True, dropout=p)
        v = fused.init(jax.random.PRNGKey(7), g, banded, x)
        rng = jax.random.PRNGKey(321)

        captured = {}
        import bathymetric_gnn_tpu.models.conv_ell as ce
        orig = ce.make_banded_dropout_masks

        def capture(rng_, *a, **kw):
            res = orig(rng_, *a, **kw)
            captured["masks"] = res
            return res

        n, k = g.nbr_src.shape
        rg = np.random.default_rng(13)
        w = jnp.asarray(rg.normal(size=(n, h_heads * cc))
                        .astype(np.float32))

        def loss_fused(params, xx):
            out = fused.apply({"params": params}, g, banded, xx, False,
                              rngs={"dropout": rng})
            return jnp.sum(out * w)

        ce.make_banded_dropout_masks = capture
        try:
            gp, gx = jax.grad(loss_fused, argnums=(0, 1))(v["params"], x)
        finally:
            ce.make_banded_dropout_masks = orig
        dm, dm_sp = captured["masks"]
        if np.asarray(dm).ndim == 3:  # round-5 wide layout -> oracle layout
            from bathymetric_gnn_tpu.models.conv_ell import \
                banded_masks_wide_to_khn
            dm = banded_masks_wide_to_khn(dm, g.nbr_src.shape[1], h_heads)

        # edge-level mask tensor (same mapping as the forward oracle test)
        dm_n = np.asarray(dm)
        dm_sp_n = np.asarray(dm_sp)
        mask_nk = np.empty((n, k, h_heads), np.float32)
        for kk in range(k):
            mask_nk[:, kk, :] = dm_n[kk * h_heads:(kk + 1) * h_heads, :].T
        sm = np.asarray(banded.spill_mask)
        sd = np.asarray(banded.spill_dst)[sm]
        sk = np.asarray(banded.spill_slot)[sm]
        r = banded.band_rows
        band_of = sd // r
        counts = np.bincount(band_of, minlength=banded.loc_t.shape[1] // r)
        starts = np.concatenate([[0], np.cumsum(counts)])
        pos_in_band = np.arange(len(sd)) - starts[band_of]
        mask_nk[sd, sk, :] = dm_sp_n[band_of, :, pos_in_band]
        mask_nk = jnp.asarray(mask_nk)
        mask_self = jnp.asarray(dm_n[k * h_heads:, :].T)

        def loss_oracle(params, xx):
            xh = (xx @ params["lin_src"]).reshape(n, h_heads, cc)
            a_src = jnp.sum(xh * params["att_src"], -1)
            a_dst = jnp.sum(xh * params["att_dst"], -1)
            m_edge = jnp.einsum(
                "fac,xac->fa", params["lin_edge"].reshape(3, h_heads, cc),
                params["att_edge"])
            logits = (ell_gather(a_src, g.nbr_src) + a_dst[:, None, :]
                      + g.edge_attr @ m_edge)
            cnt = jnp.maximum(
                jnp.sum(g.nbr_mask.astype(jnp.float32), 1), 1.0)
            mean_attr = jnp.sum(
                jnp.where(g.nbr_mask[..., None], g.edge_attr, 0.0), 1
            ) / cnt[:, None]
            self_logit = jax.nn.leaky_relu(
                a_src + a_dst + mean_attr @ m_edge, 0.2)
            logits = jax.nn.leaky_relu(logits, 0.2)
            wts, w_self = ell_masked_softmax(logits, g.nbr_mask, self_logit)
            wts = wts * mask_nk
            w_self = w_self * mask_self
            nbr_x = ell_gather(xh, g.nbr_src)
            out = (jnp.sum(nbr_x * wts[..., None], axis=1)
                   + xh * w_self[..., None])
            out = out.reshape(n, h_heads * cc) + params["bias"]
            out = jnp.where(g.node_mask[:, None], out, 0.0)
            return jnp.sum(out * w)

        gp_ref, gx_ref = jax.grad(loss_oracle, argnums=(0, 1))(
            v["params"], x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=1e-3, atol=1e-4)
        flat = dict(jax.tree_util.tree_flatten_with_path(gp)[0])
        for path, leaf in jax.tree_util.tree_flatten_with_path(gp_ref)[0]:
            np.testing.assert_allclose(
                np.asarray(flat[path]), np.asarray(leaf),
                rtol=1e-3, atol=1e-4,
                err_msg="/".join(str(p) for p in path))


class TestSmallBatchReducer:
    """Advisor r3 regressions: the sorted-segment reducer must work for
    merged batches smaller than the preferred 1024-node block, and
    data-parallel stacking must tolerate shards with different
    data-derived reducer depths."""

    @pytest.mark.parametrize("n_pad", [512, 256])
    def test_segment_reduce_small_n(self, n_pad):
        from bathymetric_gnn_tpu.ops.pallas.segment_reduce import (
            pick_node_blk, segment_reduce_sorted)

        assert pick_node_blk(512) == 512
        assert pick_node_blk(768) == 256
        g = make_knn_ell(n_points=n_pad - 30, n_pad=n_pad, seed=4)
        banded = band_ell(g, band_rows=128, spill_pad=64)
        ids = np.asarray(banded.spill_src_sorted)
        s = ids.shape[0]
        rg = np.random.default_rng(0)
        ct = rg.normal(size=(s, 16)).astype(np.float32)
        out = segment_reduce_sorted(
            jnp.asarray(ct), banded.spill_src_sorted,
            banded.spill_red_first, banded.spill_red_jcount,
            n=n_pad, max_j=banded.spill_red_maxj, interpret=True)
        ref = np.zeros((n_pad, 16), np.float32)
        for i in range(s):
            if ids[i] < n_pad:
                ref[ids[i]] += ct[i]
        np.testing.assert_allclose(np.asarray(out), ref,
                                   rtol=1e-5, atol=1e-5)

    def test_gather_reduce_bwd_small_n(self):
        """End-to-end: the custom-VJP gather whose backward runs the
        reducer, at a 512-node merged-batch size (previously asserted)."""
        from bathymetric_gnn_tpu.ops.ell_banded import gather_rows_reduce_bwd

        n_pad = 512
        g = make_knn_ell(n_points=470, n_pad=n_pad, seed=5)
        banded = band_ell(g, band_rows=128, spill_pad=64)
        rg = np.random.default_rng(1)
        table = jnp.asarray(rg.normal(size=(n_pad, 16)).astype(np.float32))
        idx = banded.spill_src_b.reshape(-1)
        # pad slots carry src 0; the production consumer masks them, and
        # the reducer drops their cotangents (sort key n) — mask here too
        live = jnp.asarray(
            np.asarray(banded.spill_dst_local_b)[:, 0, :].reshape(-1) >= 0,
            jnp.float32)[:, None]

        def f(t):
            got = gather_rows_reduce_bwd(
                banded.spill_red_maxj, t, idx, banded.spill_perm,
                banded.spill_src_sorted, banded.spill_red_first,
                banded.spill_red_jcount)
            return jnp.sum((got * live) ** 2)

        gref = jax.grad(lambda t: jnp.sum(
            (jnp.take(t, idx, axis=0) * live) ** 2))(table)
        gout = jax.grad(f)(table)
        np.testing.assert_allclose(np.asarray(gout), np.asarray(gref),
                                   rtol=1e-5, atol=1e-5)

    def test_stack_uneven_spill_densities(self):
        from bathymetric_gnn_tpu.parallel.data_parallel import (
            stack_banded_batches)

        pairs = []
        for seed in (0, 123):
            g = make_knn_ell(n_points=1500, n_pad=2048, seed=seed)
            pairs.append((g, band_ell(g, band_rows=128, s_max=512,
                                      spill_pad=8192)))
        b0, b1 = pairs[0][1], pairs[1][1]
        # the regression is only meaningful if the shards really differ;
        # if these seeds converge, force a difference via max_j
        if (b0.spill_red_maxj == b1.spill_red_maxj
                and b0.spill_red_maxj_d == b1.spill_red_maxj_d):
            pairs[1] = (pairs[1][0],
                        band_ell(pairs[1][0], band_rows=128, s_max=512,
                                 spill_pad=8192,
                                 max_j=b0.spill_red_maxj + 2,
                                 max_j_d=b0.spill_red_maxj_d + 1))
        g_st, banded_st = stack_banded_batches(pairs)
        assert banded_st.loc_t.shape[0] == 2
        assert (banded_st.spill_red_maxj
                == max(p[1].spill_red_maxj for p in pairs))


class TestBf16TrainingGrads:
    """compute_dtype=bfloat16 is the flagship TPU training mode for the
    sparse path (round 4): bf16 activation/cotangent streams end to end,
    f32 softmax recompute + f32 accumulation in-kernel. Gradients must
    track the f32 fused path within bf16 rounding."""

    def test_grad_close_to_f32(self, knn_case):
        g, banded, x = knn_case
        _, _, v = _init_pair(g, x, banded)
        band_f32 = GATConvEllBanded(out_channels=12, heads=2, edge_dim=3,
                                    use_pallas=True)
        band_bf = GATConvEllBanded(out_channels=12, heads=2, edge_dim=3,
                                   use_pallas=True,
                                   compute_dtype="bfloat16")
        w = jnp.asarray(np.random.default_rng(11).normal(
            size=(g.num_nodes_padded, 24)).astype(np.float32))

        def loss(mod):
            def f(params, xin):
                out = mod.apply({"params": params}, g, banded, xin)
                return jnp.sum(out.astype(jnp.float32) * w)
            return f

        g32 = jax.grad(loss(band_f32), argnums=(0, 1))(v["params"], x)
        g16 = jax.grad(loss(band_bf), argnums=(0, 1))(v["params"], x)

        def check(a, b, what, l2_tol, worst_tol):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            l2 = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-9)
            worst = np.abs(b - a).max() / (np.abs(a).max() + 1e-9)
            assert l2 < l2_tol, f"{what}: rel L2 {l2:.4f}"
            assert worst < worst_tol, f"{what}: worst-element {worst:.4f}"

        check(g32[1], g16[1], "dx", 0.02, 0.10)
        # param grads are sums of ~N bf16-rounded products with mixed
        # signs — cancellation amplifies the relative error (measured
        # ~6% rel L2 on att_dst with bf16 ACTIVATIONS alone); dx has no
        # such cancellation and stays within 2%
        flat32 = jax.tree_util.tree_leaves(g32[0])
        flat16 = jax.tree_util.tree_leaves(g16[0])
        for i, (a, b) in enumerate(zip(flat32, flat16)):
            check(a, b, f"param[{i}]", 0.08, 0.15)
