"""ELL layout parity tests: ELL layers must match COO layers exactly."""

import jax
import numpy as np
import pytest

from bathymetric_gnn_tpu.models.conv import (GATConv, GCNConv, GINConv,
                                             SAGEConv)
from bathymetric_gnn_tpu.models.conv_ell import (GATConvELL, GCNConvELL,
                                                 GINConvELL, SAGEConvELL)
from bathymetric_gnn_tpu.ops.ell import coo_to_ell
from bathymetric_gnn_tpu.ops.graph import make_padded_graph

from test_conv_parity import random_graph


def build_pair(seed=0):
    x, ei, attr = random_graph(seed=seed)
    g = make_padded_graph(x, ei, attr, n_pad=64, e_pad=512)
    ell = coo_to_ell(g)
    return g, ell


class TestEllConversion:
    def test_edge_set_preserved(self):
        g, ell = build_pair()
        em = np.asarray(g.edge_mask)
        coo_edges = set(zip(np.asarray(g.edge_src)[em].tolist(),
                            np.asarray(g.edge_dst)[em].tolist()))
        nm = np.asarray(ell.nbr_mask)
        src = np.asarray(ell.nbr_src)
        ell_edges = set()
        for i in range(nm.shape[0]):
            for kk in range(nm.shape[1]):
                if nm[i, kk]:
                    ell_edges.add((int(src[i, kk]), i))
        assert ell_edges == coo_edges

    def test_edge_attrs_preserved(self):
        g, ell = build_pair()
        em = np.asarray(g.edge_mask)
        src = np.asarray(g.edge_src)[em]
        dst = np.asarray(g.edge_dst)[em]
        attr = np.asarray(g.edge_attr)[em]
        esrc = np.asarray(ell.nbr_src)
        emask = np.asarray(ell.nbr_mask)
        eattr = np.asarray(ell.edge_attr)
        for i in range(0, len(src), 29):
            d = dst[i]
            slots = [kk for kk in range(emask.shape[1])
                     if emask[d, kk] and esrc[d, kk] == src[i]]
            assert any(np.allclose(eattr[d, kk], attr[i]) for kk in slots)


@pytest.mark.parametrize("coo_cls,ell_cls,kwargs", [
    (GATConv, GATConvELL, dict(out_channels=16, heads=4, concat=True,
                               edge_dim=3)),
    (GATConv, GATConvELL, dict(out_channels=8, heads=1, concat=False,
                               edge_dim=None)),
    (GCNConv, GCNConvELL, dict(out_channels=16)),
    (SAGEConv, SAGEConvELL, dict(out_channels=16)),
    (GINConv, GINConvELL, dict(out_channels=16)),
])
def test_ell_matches_coo(coo_cls, ell_cls, kwargs):
    g, ell = build_pair()
    layer_coo = coo_cls(**kwargs)
    params = layer_coo.init(jax.random.PRNGKey(0), g, g.x)["params"]
    out_coo = np.asarray(layer_coo.apply({"params": params}, g, g.x))
    layer_ell = ell_cls(**kwargs)
    out_ell = np.asarray(layer_ell.apply({"params": params}, ell, ell.x))
    np.testing.assert_allclose(out_ell[:40], out_coo[:40], rtol=2e-4,
                               atol=2e-5)


class TestEllFullModel:
    def test_ell_model_shares_coo_checkpoint(self):
        """EllBathymetricGNN consumes COO-trained variables unchanged."""
        from bathymetric_gnn_tpu.models.gnn import BathymetricGNN
        from bathymetric_gnn_tpu.models.gnn_ell import EllBathymetricGNN

        g, ell = build_pair()
        coo = BathymetricGNN(hidden_channels=16, num_layers=2, heads=2)
        variables = coo.init(jax.random.PRNGKey(0), g)
        out_coo = coo.apply(variables, g)

        ell_model = EllBathymetricGNN(hidden_channels=16, num_layers=2,
                                      heads=2)
        out_ell = ell_model.apply(variables, ell)
        for key in ("class_logits", "confidence", "correction"):
            np.testing.assert_allclose(
                np.asarray(out_ell[key])[:40], np.asarray(out_coo[key])[:40],
                rtol=2e-4, atol=2e-5, err_msg=key)
