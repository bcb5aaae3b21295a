"""Multi-scale pyramid and S-57 labeling tests."""

import json

import numpy as np

from bathymetric_gnn_tpu.config.config import BucketConfig, GraphConfig
from bathymetric_gnn_tpu.data.multiscale import (MultiScaleGraphBuilder,
                                                 downsample_depth)
from bathymetric_gnn_tpu.data import s57

from conftest import make_ramp_surface


class TestDownsample:
    def test_nanmean_pooling(self):
        depth = np.arange(16, dtype=np.float32).reshape(4, 4)
        valid = np.ones((4, 4), bool)
        d, v = downsample_depth(depth, valid, 2)
        assert d.shape == (2, 2)
        np.testing.assert_allclose(d[0, 0], np.mean([0, 1, 4, 5]))
        assert v.all()

    def test_majority_validity(self):
        depth = np.ones((4, 4), np.float32)
        valid = np.ones((4, 4), bool)
        valid[0, 0] = False  # 3/4 valid -> still valid
        valid[2:4, 0:2] = False  # 0/4 -> invalid
        d, v = downsample_depth(depth, valid, 2)
        assert v[0, 0]
        assert not v[1, 0]
        assert np.isnan(d[1, 0])


class TestMultiScale:
    def test_pyramid(self):
        depth = make_ramp_surface(64, 64)
        msb = MultiScaleGraphBuilder(
            scales=(1, 2, 4), bucket_config=BucketConfig(node_buckets=(4096,)))
        pyr = msb.build_multiscale_graph(depth)
        assert set(pyr.keys()) == {1, 2, 4}
        assert pyr[1].num_nodes == 64 * 64
        assert pyr[2].num_nodes == 32 * 32
        assert pyr[4].num_nodes == 16 * 16
        # coarser levels average the fine depths
        fine = np.asarray(pyr[1].graph.x)[: 64 * 64, 0].mean()
        coarse = np.asarray(pyr[4].graph.x)[: 16 * 16, 0].mean()
        np.testing.assert_allclose(fine, coarse, rtol=1e-3)


class TestS57:
    def make_features(self):
        return [
            s57.S57Feature("WRECKS", "Point", x=150.0, y=150.0, depth=12.0),
            s57.S57Feature("UWTROC", "Point", x=20.0, y=180.0),
            s57.S57Feature("SOUNDG", "Point", x=10.0, y=10.0),  # no label
        ]

    def test_label_rasterization(self):
        feats = self.make_features()
        gt = (0.0, 1.0, 0.0, 200.0, 0.0, -1.0)  # 1m cells, origin (0,200)
        labels = s57.create_feature_labels(feats, (200, 200), gt)
        # wreck at (150, 150) -> pixel (row 50, col 150), radius 50 px
        assert labels[50, 150] == 1
        assert labels[50, 199] == 1  # within 50 px
        assert labels[190, 10] == 0  # sounding not labeled
        # rock radius 25: at (20, 180) -> row 20, col 20
        assert labels[20, 20] == 1
        assert labels[20, 47] == 0   # beyond 25 px
        assert labels[120, 20] == 0  # far from everything

    def test_dedupe(self):
        f = s57.S57Feature("WRECKS", "Point", 1.0, 2.0)
        g = s57.S57Feature("WRECKS", "Point", 1.0, 2.0)
        h = s57.S57Feature("OBSTRN", "Point", 1.0, 2.0)
        assert len(s57.dedupe_by_position([f, g, h])) == 2

    def test_geojson_roundtrip(self, tmp_path):
        feats = self.make_features()
        p = tmp_path / "f.geojson"
        s57.features_to_geojson(feats, p)
        loaded = s57.load_features_geojson(p)
        assert len(loaded) == 3
        assert loaded[0].object_class == "WRECKS"
        assert loaded[0].x == 150.0

    def test_merge_labels(self):
        base = np.array([[-1, 0], [2, 0]], np.int32)
        feat = np.array([[1, 1], [0, 1]], np.int32)
        merged = s57.merge_feature_labels(base, feat)
        np.testing.assert_array_equal(merged, [[-1, 1], [2, 1]])

    def test_summary(self):
        s = s57.summarize_features(self.make_features())
        assert s["total"] == 3
        assert s["by_class"]["WRECKS"] == 1
        assert s["depth_range"] == [12.0, 12.0]


class TestS57NativeCell:
    """Native ISO 8211 / S-57 .000 parsing (io/s57_8211.py) — the
    reference needs OGR for this path (extract_s57_features.py:483)."""

    def write_cell(self, path):
        from bathymetric_gnn_tpu.io.s57_8211 import S57Writer

        w = S57Writer()
        wreck_node = w.add_node(-122.41, 37.81, depth=14.5)
        rock_node = w.add_node(-122.39, 37.79)
        edge = w.add_edge([(-122.40, 37.80), (-122.38, 37.80),
                           (-122.38, 37.82)])
        snd_node = w.add_node(0, 0, soundings=[
            (-122.405, 37.805, 9.3), (-122.404, 37.806, 9.7)])
        w.add_feature("WRECKS", [wreck_node],
                      attributes={"CATWRK": 2, "OBJNAM": "SS Test",
                                  "VALSOU": 15.2})
        w.add_feature("UWTROC", [rock_node], attributes={"WATLEV": 3})
        w.add_feature("OBSTRN", [edge], prim=2)
        w.add_feature("SOUNDG", [snd_node])
        w.save(path)

    def test_8211_record_walk(self, tmp_path):
        from bathymetric_gnn_tpu.io.s57_8211 import iter_8211_records

        p = tmp_path / "cell.000"
        self.write_cell(p)
        recs = list(iter_8211_records(p.read_bytes()))
        assert recs[0].leader_id == "L"          # DDR first
        assert all(r.leader_id == "D" for r in recs[1:])
        tags = [t for r in recs for t, _ in r.fields]
        for tag in ("DSPM", "VRID", "SG2D", "SG3D", "FRID", "ATTF", "FSPT"):
            assert tag in tags

    def test_cell_decode(self, tmp_path):
        from bathymetric_gnn_tpu.io.s57_8211 import read_s57_cell

        p = tmp_path / "cell.000"
        self.write_cell(p)
        cell = read_s57_cell(p)
        assert cell.comf == 10_000_000.0 and cell.somf == 10.0
        assert len(cell.features) == 4
        assert len(cell.spatials) == 4
        wreck = cell.features[0]
        assert wreck.object_class == "WRECKS"
        assert wreck.attributes["CATWRK"] == 2
        assert wreck.attributes["OBJNAM"] == "SS Test"
        key = wreck.spatial_refs[0]
        (x, y), = cell.spatials[key].coords
        assert abs(x - (-122.41)) < 1e-6 and abs(y - 37.81) < 1e-6
        assert abs(cell.spatials[key].depths[0] - 14.5) < 1e-9

    def test_extract_features(self, tmp_path):
        p = tmp_path / "cell.000"
        self.write_cell(p)
        feats = s57.extract_features_from_s57(p)
        by_cls = {}
        for f in feats:
            by_cls.setdefault(f.object_class, []).append(f)
        # VALSOU overrides the SG3D depth (reference :568-570)
        assert by_cls["WRECKS"][0].depth == 15.2
        assert by_cls["WRECKS"][0].geometry_type == "Point"
        assert by_cls["UWTROC"][0].depth is None
        # line feature -> vertex centroid
        ob = by_cls["OBSTRN"][0]
        assert ob.geometry_type == "LineString"
        assert abs(ob.x - (-122.38666666)) < 1e-6
        # SOUNDG multipoint -> one feature per sounding with its depth
        snd = by_cls["SOUNDG"]
        assert len(snd) == 2
        assert {s.depth for s in snd} == {9.3, 9.7}

    def test_extract_filters(self, tmp_path):
        p = tmp_path / "cell.000"
        self.write_cell(p)
        only_wrecks = s57.extract_features_from_s57(
            p, object_classes=["WRECKS"])
        assert {f.object_class for f in only_wrecks} == {"WRECKS"}
        # bounds excluding the rock at (-122.39, 37.79)
        filtered = s57.extract_features_from_s57(
            p, bounds=(-122.42, 37.795, -122.37, 37.83))
        assert "UWTROC" not in {f.object_class for f in filtered}

    def test_cli_enc_to_labels(self, tmp_path, capsys):
        import json

        from bathymetric_gnn_tpu.cli import extract_s57_features as cli

        p = tmp_path / "cell.000"
        self.write_cell(p)
        out = tmp_path / "f.geojson"
        cli.main(["--enc", str(p), "--output-geojson", str(out)])
        summary = json.loads(capsys.readouterr().out)
        assert summary["by_class"]["WRECKS"] == 1
        assert out.exists()
        loaded = s57.load_features_geojson(out)
        assert len(loaded) == len(s57.extract_features_from_s57(p))

    def test_cli_enc_with_bounds_filter(self, tmp_path, capsys):
        """--bounds combines with --enc as a spatial filter (the
        reference supports both together)."""
        import json

        from bathymetric_gnn_tpu.cli import extract_s57_features as cli

        p = tmp_path / "cell.000"
        self.write_cell(p)
        # envelope containing only the wreck node (-122.41, 37.81)
        cli.main(["--enc", str(p),
                  "--bounds", "-122.42", "37.805", "-122.405", "37.815"])
        summary = json.loads(capsys.readouterr().out)
        assert summary["by_class"].get("WRECKS") == 1
        assert "UWTROC" not in summary["by_class"]

    def test_vrpt_straight_edge_endpoints(self, tmp_path):
        """A straight edge (no SG2D of its own) must still yield geometry
        via its VRPT connected-node endpoints (ADVICE r1: VRPT was
        undecoded, silently dropping such features)."""
        from bathymetric_gnn_tpu.io.s57_8211 import (S57Writer,
                                                     feature_points,
                                                     read_s57_cell)

        w = S57Writer()
        a = w.add_connected_node(-122.50, 37.70)
        b = w.add_connected_node(-122.40, 37.76)
        straight = w.add_edge([], begin_node=a, end_node=b)
        curved = w.add_edge([(-122.45, 37.72)], begin_node=a, end_node=b)
        w.add_feature("OBSTRN", [straight], prim=2)
        w.add_feature("OBSTRN", [curved], prim=2)
        p = tmp_path / "edge.000"
        w.save(p)

        cell = read_s57_cell(p)
        f_straight, f_curved = cell.features
        cs, ds = feature_points(cell, f_straight)
        assert len(cs) == 2 and len(ds) == 2
        np.testing.assert_allclose(cs[0], (-122.50, 37.70), atol=1e-6)
        np.testing.assert_allclose(cs[1], (-122.40, 37.76), atol=1e-6)
        assert ds == [None, None]
        cs2, _ = feature_points(cell, f_curved)
        # begin, interior vertex, end — in order
        assert len(cs2) == 3
        np.testing.assert_allclose(cs2[1], (-122.45, 37.72), atol=1e-6)

        feats = s57.extract_features_from_s57(p)
        assert len(feats) == 2  # straight edge no longer dropped
        np.testing.assert_allclose((feats[0].x, feats[0].y),
                                   (-122.45, 37.73), atol=1e-6)

    def test_soundg_depth_alignment_mixed_refs(self, tmp_path):
        """SOUNDG mixing an SG2D node and an SG3D node keeps depths
        aligned per point (ADVICE r1: positional misalignment)."""
        from bathymetric_gnn_tpu.io.s57_8211 import S57Writer

        w = S57Writer()
        flat = w.add_node(-122.30, 37.90)                      # SG2D first
        snd = w.add_node(0, 0, soundings=[(-122.31, 37.91, 7.5)])
        w.add_feature("SOUNDG", [flat, snd])
        p = tmp_path / "snd.000"
        w.save(p)
        feats = s57.extract_features_from_s57(p)
        by_xy = {(round(f.x, 4), round(f.y, 4)): f.depth for f in feats}
        assert by_xy[(-122.30, 37.90)] is None
        assert abs(by_xy[(-122.31, 37.91)] - 7.5) < 1e-6
        # attribute dicts are independent per sounding
        feats[0].attributes["marker"] = 1
        assert "marker" not in feats[1].attributes

    def test_8211_leader_reuse(self):
        """Records after an 'R' leader omit leader+directory and reuse
        its layout (ISO 8211 leader-reuse)."""
        from bathymetric_gnn_tpu.io.s57_8211 import (FT, _record_bytes,
                                                     iter_8211_records)

        first = _record_bytes("R", [("VRID", b"payload-1")])
        # a bare field area with the same layout
        area = b"payload-2" + bytes([FT])
        recs = list(iter_8211_records(first + area + area))
        assert [r.leader_id for r in recs] == ["R", "R", "R"]
        assert recs[0].first("VRID") == b"payload-1"
        assert recs[1].first("VRID") == b"payload-2"
        assert recs[2].first("VRID") == b"payload-2"
