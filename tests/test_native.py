"""Native graphkit (C++ ctypes) tests vs NumPy brute force."""

import numpy as np
import pytest

from bathymetric_gnn_tpu import native


def brute_knn(pos, k):
    n = len(pos)
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    idx = np.argsort(d2, axis=1)[:, :k]
    return idx, np.sort(d2, axis=1)[:, :k]


class TestKnn2d:
    def test_native_lib_builds(self):
        assert native.native_available(), "libgraphkit.so should build here"

    @pytest.mark.parametrize("n,k", [(50, 4), (500, 8), (2000, 8)])
    def test_matches_brute_force_distances(self, n, k):
        rg = np.random.default_rng(0)
        pos = rg.uniform(0, 100, (n, 2)).astype(np.float32)
        got = native.knn2d(pos, k)
        _, want_d = brute_knn(pos, k)
        # compare by distance sets (ties may reorder indices)
        for i in range(0, n, 17):
            gd = np.sort(((pos[got[i]] - pos[i]) ** 2).sum(-1))
            np.testing.assert_allclose(gd, want_d[i], rtol=1e-5)

    def test_clustered_points(self):
        rg = np.random.default_rng(1)
        # highly non-uniform: two tight clusters + sparse noise
        a = rg.normal(0, 0.1, (400, 2))
        b = rg.normal(50, 0.1, (400, 2))
        c = rg.uniform(-100, 100, (100, 2))
        pos = np.concatenate([a, b, c]).astype(np.float32)
        got = native.knn2d(pos, 6)
        _, want_d = brute_knn(pos, 6)
        for i in range(0, len(pos), 41):
            gd = np.sort(((pos[got[i]] - pos[i]) ** 2).sum(-1))
            np.testing.assert_allclose(gd, want_d[i], rtol=1e-4)

    def test_small_n(self):
        pos = np.array([[0, 0], [1, 0], [2, 0]], np.float32)
        got = native.knn2d(pos, 5)
        assert got.shape == (3, 5)
        assert set(got[0][got[0] >= 0]) == {1, 2}
        assert (got[:, 2:] == -1).all()


class TestEllPack:
    def test_matches_python(self):
        rg = np.random.default_rng(0)
        n, e, k = 50, 300, 12
        dst = np.sort(rg.integers(0, n, e)).astype(np.int32)
        src = rg.integers(0, n, e).astype(np.int32)
        ns, nm, slot, maxdeg = native.ell_pack(src, dst, n, k)
        assert maxdeg == np.bincount(dst, minlength=n).max()
        # every live edge is represented
        cnt = 0
        for i in range(e):
            if slot[i] >= 0:
                assert ns[dst[i], slot[i]] == src[i]
                assert nm[dst[i], slot[i]]
                cnt += 1
        assert cnt == min(e, nm.sum())
