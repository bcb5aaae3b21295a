"""Graph construction tests: device edge enumeration vs independent NumPy.

The NumPy golden re-derives the reference's edge semantics
(reference: data/graph_construction.py:176-243) independently.
"""

import numpy as np

from bathymetric_gnn_tpu.config.config import BucketConfig, GraphConfig
from bathymetric_gnn_tpu.data.graph_build import GraphBuilder
from bathymetric_gnn_tpu.ops.graph import batch_graphs, make_padded_graph

from conftest import make_ramp_surface

OFFSETS_8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def numpy_golden_edges(valid, offsets):
    """Set of (src_node, dst_node) pairs for grid connectivity."""
    h, w = valid.shape
    rows, cols = np.where(valid)
    idx = -np.ones((h, w), np.int64)
    idx[rows, cols] = np.arange(len(rows))
    edges = set()
    for dr, dc in offsets:
        for i, (r, c) in enumerate(zip(rows, cols)):
            nr, nc = r + dr, c + dc
            if 0 <= nr < h and 0 <= nc < w and idx[nr, nc] >= 0:
                edges.add((i, idx[nr, nc]))
    return edges


def build(depth, valid, connectivity=8, **kw):
    gb = GraphBuilder(
        GraphConfig(connectivity=connectivity),
        BucketConfig(node_buckets=(256, 1024, 4096)),
    )
    return gb.build_graph(depth, valid, **kw)


class TestEdgeEnumeration:
    def test_full_grid_edge_set(self):
        depth = make_ramp_surface(16, 16)
        valid = np.ones((16, 16), bool)
        bg = build(depth, valid)
        g = bg.graph
        golden = numpy_golden_edges(valid, OFFSETS_8)
        em = np.asarray(g.edge_mask)
        got = set(zip(np.asarray(g.edge_src)[em].tolist(),
                      np.asarray(g.edge_dst)[em].tolist()))
        assert got == golden
        assert em.sum() == len(golden)

    def test_masked_grid_edge_set(self):
        depth = make_ramp_surface(20, 20)
        valid = np.ones((20, 20), bool)
        valid[3:7, 3:9] = False
        valid[0, :] = False
        depth[~valid] = np.nan
        bg = build(depth, valid)
        g = bg.graph
        golden = numpy_golden_edges(valid, OFFSETS_8)
        em = np.asarray(g.edge_mask)
        got = set(zip(np.asarray(g.edge_src)[em].tolist(),
                      np.asarray(g.edge_dst)[em].tolist()))
        assert got == golden

    def test_4_connectivity(self):
        depth = make_ramp_surface(12, 12)
        valid = np.ones((12, 12), bool)
        bg = build(depth, valid, connectivity=4)
        golden = numpy_golden_edges(valid, [(-1, 0), (1, 0), (0, -1), (0, 1)])
        g = bg.graph
        em = np.asarray(g.edge_mask)
        got = set(zip(np.asarray(g.edge_src)[em].tolist(),
                      np.asarray(g.edge_dst)[em].tolist()))
        assert got == golden

    def test_edges_sorted_by_dst(self):
        depth = make_ramp_surface(16, 16)
        valid = np.ones((16, 16), bool)
        g = build(depth, valid).graph
        em = np.asarray(g.edge_mask)
        dst = np.asarray(g.edge_dst)[em]
        assert (np.diff(dst) >= 0).all()
        # live edges are contiguous at the front
        assert em[: em.sum()].all()


class TestEdgeFeatures:
    def test_edge_feature_values(self):
        depth = make_ramp_surface(10, 10)
        valid = np.ones((10, 10), bool)
        res = (2.0, 0.5)
        bg = build(depth, valid, resolution=res)
        g = bg.graph
        em = np.asarray(g.edge_mask)
        src = np.asarray(g.edge_src)[em]
        dst = np.asarray(g.edge_dst)[em]
        attr = np.asarray(g.edge_attr)[em]
        rows, cols = np.where(valid)
        for i in range(0, len(src), 37):
            sr, sc = rows[src[i]], cols[src[i]]
            tr, tc = rows[dst[i]], cols[dst[i]]
            dx = (tc - sc) * res[0]
            dy = (tr - sr) * res[1]
            dist = np.sqrt(dx * dx + dy * dy)
            ddiff = depth[tr, tc] - depth[sr, sc]
            slope = np.degrees(np.arctan(ddiff / dist))
            np.testing.assert_allclose(attr[i, 0], dist, rtol=1e-5)
            np.testing.assert_allclose(attr[i, 1], ddiff, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(attr[i, 2], slope, rtol=1e-4, atol=1e-4)


class TestGraphToGrid:
    def test_roundtrip(self):
        depth = make_ramp_surface(24, 24)
        valid = np.ones((24, 24), bool)
        valid[5:11, 2:8] = False
        depth[~valid] = np.nan
        bg = build(depth, valid)
        vals = np.asarray(bg.graph.x)[:, 0]
        grid = bg.graph_to_grid(vals)
        np.testing.assert_allclose(grid[valid], depth[valid], rtol=1e-6)
        assert np.isnan(grid[~valid]).all()


class TestPaddedGraphBatching:
    def test_batch_offsets(self):
        g1 = (np.ones((3, 2), np.float32),
              np.array([[0, 1], [1, 2]]), np.ones((2, 1), np.float32))
        g2 = (2 * np.ones((4, 2), np.float32),
              np.array([[0, 3], [1, 0]]), 2 * np.ones((2, 1), np.float32))
        g, counts = batch_graphs([g1, g2], n_pad=16, e_pad=16)
        assert counts.tolist() == [3, 4]
        em = np.asarray(g.edge_mask)
        src = np.asarray(g.edge_src)[em]
        dst = np.asarray(g.edge_dst)[em]
        assert set(zip(src.tolist(), dst.tolist())) == {(0, 1), (1, 2), (3, 4), (6, 3)}
        gid = np.asarray(g.graph_id)
        assert gid[:3].tolist() == [0, 0, 0]
        assert gid[3:7].tolist() == [1, 1, 1, 1]

    def test_knn_builder(self):
        gb = GraphBuilder(GraphConfig(), BucketConfig(node_buckets=(256,)))
        rg = np.random.default_rng(0)
        pos = rg.uniform(0, 10, (50, 2)).astype(np.float32)
        x = rg.normal(size=(50, 7)).astype(np.float32)
        bg = gb.build_knn_graph(x, pos, k=8)
        g = bg.graph
        em = np.asarray(g.edge_mask)
        assert em.sum() == 50 * 8
        dst = np.asarray(g.edge_dst)[em]
        # every node has exactly k incoming edges
        assert (np.bincount(dst, minlength=50) == 8).all()


class TestMortonKnn:
    def test_spatial_sort_preserves_graph_semantics(self):
        from bathymetric_gnn_tpu.ops.edges import morton_order

        gb = GraphBuilder(GraphConfig(), BucketConfig(node_buckets=(256,)))
        rg = np.random.default_rng(0)
        pos = rg.uniform(0, 10, (60, 2)).astype(np.float32)
        x = rg.normal(size=(60, 7)).astype(np.float32)
        bg = gb.build_knn_graph(x, pos, k=5, spatial_sort=True)
        perm = bg.perm
        # features follow the permutation
        np.testing.assert_allclose(np.asarray(bg.graph.x)[:60], x[perm],
                                   rtol=1e-6)
        # neighbor sets invariant under reordering
        bg0 = gb.build_knn_graph(x, pos, k=5, spatial_sort=False)
        inv = np.argsort(perm)

        def edge_set(bg_, mapping):
            em = np.asarray(bg_.graph.edge_mask)
            src = np.asarray(bg_.graph.edge_src)[em]
            dst = np.asarray(bg_.graph.edge_dst)[em]
            return set(zip(mapping[src].tolist(), mapping[dst].tolist()))

        assert edge_set(bg, perm) == edge_set(bg0, np.arange(60))

    def test_morton_locality(self):
        from bathymetric_gnn_tpu.ops.edges import morton_order

        rg = np.random.default_rng(1)
        pos = rg.uniform(0, 100, (4000, 2)).astype(np.float32)
        order = morton_order(pos)
        sorted_pos = pos[order]
        # consecutive nodes much closer after sorting than before
        d_before = np.linalg.norm(np.diff(pos, axis=0), axis=1).mean()
        d_after = np.linalg.norm(np.diff(sorted_pos, axis=0), axis=1).mean()
        assert d_after < d_before / 5
