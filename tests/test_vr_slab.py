"""Slab-batched VR build (data/slab_build.py) vs the per-grid builder.

The slab path must reproduce the per-grid device builder exactly:
features (incl. the boundary gradient/curvature fixups), edge sets, and
end-to-end NativeVRProcessor outputs.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from bathymetric_gnn_tpu.config.config import BucketConfig, Config, GraphConfig
from bathymetric_gnn_tpu.data.graph_build import GraphBuilder
from bathymetric_gnn_tpu.data.slab_build import build_slab_ell, pack_slab
from bathymetric_gnn_tpu.inference.native_vr import NativeVRProcessor
from bathymetric_gnn_tpu.models.gnn import BathymetricGNN

SLAB = 56


def _random_grids(n, rng, with_unc=False):
    grids = []
    for i in range(n):
        # force coverage of slab-edge sizes and tiny grids
        if i == 0:
            h = w = SLAB
        elif i == 1:
            h, w = 3, 3
        else:
            h, w = rng.integers(3, SLAB + 1, 2)
        depth = (20 + 0.2 * np.arange(w)[None, :] + 0.1 * np.arange(h)[:, None]
                 + rng.normal(0, 0.3, (h, w))).astype(np.float32)
        valid = rng.random((h, w)) > 0.1
        # per-grid path requires >= 1 valid cell
        valid[h // 2, w // 2] = True
        unc = np.full((h, w), 0.3, np.float32) if with_unc else None
        res = (float(rng.uniform(0.5, 4)), float(rng.uniform(0.5, 4)))
        grids.append((depth, valid, unc, res))
    return grids


@pytest.mark.parametrize("connectivity", [4, 8])
def test_slab_features_and_edges_match_per_grid(connectivity):
    rng = np.random.default_rng(0)
    grids = _random_grids(6, rng)
    n_total = sum(int(v.sum()) for _, v, _, _ in grids)
    n_pad = 1 << int(np.ceil(np.log2(n_total + 1)))

    depth, valid, unc, hs, ws, res = pack_slab(grids, SLAB, len(grids), False)
    g, _, _, _ = build_slab_ell(
        jnp.asarray(depth), jnp.asarray(valid), None,
        jnp.asarray(hs), jnp.asarray(ws), jnp.asarray(res),
        connectivity=connectivity, n_pad=n_pad, with_uncertainty=False,
    )
    x = np.asarray(g.x)
    lstd = np.asarray(g.local_std)
    nbr_src = np.asarray(g.nbr_src)
    nbr_mask = np.asarray(g.nbr_mask)
    eattr = np.asarray(g.edge_attr)

    gb = GraphBuilder(GraphConfig(connectivity=connectivity),
                      BucketConfig(node_buckets=(64, 256, 1024, 4096)))
    offset = 0
    for depth_i, valid_i, _, res_i in grids:
        n = int(valid_i.sum())
        bg = gb.build_graph(np.where(valid_i, depth_i, np.nan), valid_i,
                            None, res_i)
        ref_x = np.asarray(bg.graph.x)[:n]
        # f32 reduction-order noise: the slab frame sums extra zero cells,
        # regrouping the mean/variance accumulations (~1e-5 relative)
        np.testing.assert_allclose(x[offset:offset + n], ref_x,
                                   rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(
            lstd[offset:offset + n],
            np.asarray(bg.graph.local_std)[:n], rtol=1e-4, atol=2e-5)

        # edge sets (directed, with attrs) must match
        em = np.asarray(bg.graph.edge_mask)
        ref_edges = {}
        src_r = np.asarray(bg.graph.edge_src)[em]
        dst_r = np.asarray(bg.graph.edge_dst)[em]
        attr_r = np.asarray(bg.graph.edge_attr)[em]
        for s, d, a in zip(src_r, dst_r, attr_r):
            ref_edges[(int(s), int(d))] = a
        slab_edges = {}
        for ni in range(offset, offset + n):
            for k in range(nbr_mask.shape[1]):
                if nbr_mask[ni, k]:
                    slab_edges[(int(nbr_src[ni, k]) - offset,
                                ni - offset)] = eattr[ni, k]
        assert set(slab_edges) == set(ref_edges)
        for key, a in slab_edges.items():
            np.testing.assert_allclose(a, ref_edges[key],
                                       rtol=1e-4, atol=1e-4)
        offset += n


def test_processor_slab_matches_noslab():
    rng = np.random.default_rng(1)
    grids = _random_grids(10, rng)

    model = BathymetricGNN(hidden_channels=32, num_layers=2, heads=4)
    cfg = Config()
    gb = GraphBuilder(cfg.graph, BucketConfig(node_buckets=(4096,)))
    d0 = 20.0 + rng.normal(0, 1, (16, 16)).astype(np.float32)
    bg = gb.build_graph(d0, np.ones((16, 16), bool))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), bg.graph)

    outs = {}
    # three build/forward paths must agree: dense grid fast path (slab ->
    # BatchedGridGNN), slab ELL, and the per-grid noslab ELL baseline
    modes = {
        "grid": dict(use_slab=True, use_grid=True),
        "ell": dict(use_slab=True, use_grid=False),
        "noslab": dict(use_slab=False, use_grid=False),
    }
    for name, kw in modes.items():
        proc = NativeVRProcessor(model, variables, node_budget=10 ** 9,
                                 use_ell=True, **kw)
        for depth, valid, unc, res in grids:
            d = np.where(valid, depth, np.float32(1.0e6))
            proc.add_to_batch(d, np.full(d.shape, 0.3, np.float32), res)
        outs[name] = proc.drain()

    for name in ("grid", "ell"):
        agree = total = 0
        for a, b in zip(outs[name], outs["noslab"]):
            assert a["classification"].shape == b["classification"].shape
            agree += int((a["classification"] == b["classification"]).sum())
            total += a["classification"].size
            np.testing.assert_allclose(a["confidence"], b["confidence"],
                                       atol=1e-3, err_msg=name)
            np.testing.assert_allclose(a["correction"], b["correction"],
                                       atol=4e-3, err_msg=name)
        assert agree / total > 0.99, name


def test_processor_mixed_slab_and_large_grids_preserve_order():
    rng = np.random.default_rng(2)
    model = BathymetricGNN(hidden_channels=32, num_layers=2, heads=4)
    cfg = Config()
    gb = GraphBuilder(cfg.graph, BucketConfig(node_buckets=(16384,)))
    d0 = 20.0 + rng.normal(0, 1, (16, 16)).astype(np.float32)
    bg = gb.build_graph(d0, np.ones((16, 16), bool))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), bg.graph)

    proc = NativeVRProcessor(model, variables, node_budget=10 ** 9,
                             use_ell=True, use_slab=True)
    shapes = [(10, 10), (80, 70), (5, 9)]  # small, large (>slab), small
    for h, w in shapes:
        depth = (20 + rng.normal(0, 0.5, (h, w))).astype(np.float32)
        proc.add_to_batch(depth, np.full((h, w), 0.3, np.float32), (1.0, 1.0))
    res = proc.drain()
    assert [r["classification"].shape for r in res] == shapes
    for r, (h, w) in zip(res, shapes):
        assert (r["classification"] >= 0).all()  # all cells valid here
