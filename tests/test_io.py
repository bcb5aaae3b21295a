"""I/O layer tests: GeoTIFF codec, ASC, BAG handlers/writers, sidecar."""

import numpy as np
import pytest

from bathymetric_gnn_tpu.config.constants import BAG_NODATA
from bathymetric_gnn_tpu.io.bag import (RefinementGrid, SidecarBuilder,
                                        SRBagHandler, VRBagHandler,
                                        detect_bag_type, process_bag_native,
                                        write_sr_bag, write_vr_bag)
from bathymetric_gnn_tpu.io.geotiff import read_geotiff, write_geotiff
from bathymetric_gnn_tpu.io.loaders import (BathymetricGrid,
                                            BathymetricLoader,
                                            BathymetricWriter,
                                            read_raster_bands)

from conftest import make_ramp_surface


class TestGeoTiff:
    def test_roundtrip_multiband(self, tmp_path):
        rg = np.random.default_rng(0)
        a = rg.normal(size=(5, 40, 60)).astype(np.float32)
        p = tmp_path / "x.tif"
        write_geotiff(p, a, pixel_scale=(0.5, 0.5), origin=(100.0, 200.0),
                      nodata=-9999.0, crs_wkt="TEST CRS",
                      band_descriptions=list("abcde"))
        b, info = read_geotiff(p)
        np.testing.assert_array_equal(a, b)
        assert info.geotransform == (100.0, 0.5, 0.0, 200.0, 0.0, -0.5)
        assert info.nodata == -9999.0
        assert info.bands == 5

    def test_uncompressed_and_pil_compat(self, tmp_path):
        a = make_ramp_surface(33, 47)
        p = tmp_path / "u.tif"
        write_geotiff(p, a, compress=False)
        b, _ = read_geotiff(p)
        np.testing.assert_array_equal(b[0], a)
        from PIL import Image
        np.testing.assert_array_equal(np.array(Image.open(p)), a)

    def test_read_raster_bands(self, tmp_path):
        a = np.stack([np.full((8, 9), i, np.float32) for i in range(5)])
        p = tmp_path / "b.tif"
        write_geotiff(p, a, pixel_scale=(2.0, 2.0), origin=(0, 0))
        bands, meta = read_raster_bands(p, bands=[1, 3])
        assert (bands[0] == 0).all() and (bands[1] == 2).all()
        assert meta["resolution"] == (2.0, 2.0)


class TestAsc:
    def test_roundtrip(self, tmp_path):
        depth = make_ramp_surface(12, 15)
        grid = BathymetricGrid(depth=depth,
                               geotransform=(500.0, 2.0, 0, 800.0, 0, -2.0),
                               nodata=-9999.0, resolution=(2.0, 2.0))
        p = tmp_path / "g.asc"
        BathymetricWriter().save(grid, p)
        g2 = BathymetricLoader().load(p)
        np.testing.assert_allclose(g2.depth, depth, atol=1e-4)
        assert g2.geotransform[0] == 500.0
        assert abs(g2.geotransform[1] - 2.0) < 1e-9


class TestSRBag:
    def test_create_detect_load(self, tmp_path):
        depth = make_ramp_surface(30, 40) + 0
        depth[0, 0] = BAG_NODATA
        p = tmp_path / "s.bag"
        write_sr_bag(p, depth, None, resolution=2.0, origin=(1000.0, 5000.0))
        assert detect_bag_type(p) == "SR"
        h = SRBagHandler(p)
        assert h.resolution == 2.0
        assert h.base_shape == (30, 40)
        grids = list(h.iterate_refinements())
        assert len(grids) == 1
        np.testing.assert_array_equal(grids[0].depth, depth)

        # loader view: north-up flip
        g = BathymetricLoader().load(p)
        np.testing.assert_array_equal(g.depth, np.flipud(depth))
        assert not g.valid_mask[-1, 0]  # nodata moved to bottom-left

    def test_sr_writer(self, tmp_path):
        depth = make_ramp_surface(10, 10)
        p = tmp_path / "s.bag"
        write_sr_bag(p, depth, None, 1.0)
        h = SRBagHandler(p)
        w = h.copy_and_open_for_writing(tmp_path / "out.bag")
        grid = next(h.iterate_refinements())
        w.update_refinement_batch(grid, depth + 1.0, grid.uncertainty)
        w.close()
        h2 = SRBagHandler(tmp_path / "out.bag")
        np.testing.assert_allclose(h2._depth, depth + 1.0, rtol=1e-6)


def make_test_vr(tmp_path, n=3):
    refinements = []
    rg = np.random.default_rng(0)
    sizes = [(3, 3), (5, 4), (8, 8), (16, 16)]
    base = (2, 2)
    base_res = 16.0
    k = 0
    for r in range(base[0]):
        for c in range(base[1]):
            if k >= n:
                break
            dy, dx = sizes[k % len(sizes)]
            depth = (20 + rg.normal(0, 1, (dy, dx))).astype(np.float32)
            depth[0, 0] = BAG_NODATA
            res = base_res / dx
            refinements.append((r, c, depth, None, res))
            k += 1
    p = tmp_path / "v.bag"
    write_vr_bag(p, base, base_res, refinements, origin=(100.0, 200.0))
    return p, refinements


class TestVRBag:
    def test_create_detect_iterate(self, tmp_path):
        p, refs = make_test_vr(tmp_path)
        assert detect_bag_type(p) == "VR"
        h = VRBagHandler(p)
        assert h.num_refinement_cells == 3
        grids = list(h.iterate_refinements())
        assert len(grids) == 3
        for g, (r, c, depth, _, res) in zip(grids, refs):
            assert (g.base_row, g.base_col) == (r, c)
            np.testing.assert_array_equal(g.depth, depth)
            assert abs(g.resolution[0] - res) < 1e-6
        assert h.base_cell_size[0] == 16.0
        assert h.total_refinement_nodes == sum(
            d.size for _, _, d, _, _ in refs)

    def test_vr_writer_batch(self, tmp_path):
        p, refs = make_test_vr(tmp_path)
        h = VRBagHandler(p)
        w = h.copy_and_open_for_writing(tmp_path / "o.bag")
        for g in h.iterate_refinements():
            w.update_refinement_batch(g, g.depth + 0.5, g.uncertainty)
        w.close()
        h2 = VRBagHandler(tmp_path / "o.bag")
        for g, g2 in zip(h.iterate_refinements(), h2.iterate_refinements()):
            np.testing.assert_allclose(g2.depth, g.depth + 0.5, rtol=1e-6)

    def test_resampled_load(self, tmp_path):
        p, refs = make_test_vr(tmp_path)
        g = BathymetricLoader(vr_bag_mode="resampled").load(p)
        assert g.depth.shape[0] > 2  # finer than base
        # valid cells carry refinement values
        assert g.valid_mask.sum() > 0
        vals = g.depth[g.valid_mask]
        src = np.concatenate([d[d != BAG_NODATA].ravel()
                              for _, _, d, _, _ in refs])
        assert vals.min() >= src.min() - 1e-5
        assert vals.max() <= src.max() + 1e-5

    def test_vr_mode_matrix(self, tmp_path):
        """The three VR load modes are distinct surfaces
        (reference: data/loaders.py:98-107): 'refinements' mosaics at
        finest res, 'resampled' honors a target resolution, 'base' reads
        the coarse grid; load_refinement_grids yields per-refinement
        georeferenced grids."""
        p, refs = make_test_vr(tmp_path)
        g_ref = BathymetricLoader(vr_bag_mode="refinements").load(p)
        g_base = BathymetricLoader(vr_bag_mode="base").load(p)
        assert g_base.depth.shape == (2, 2)
        assert g_ref.depth.shape[0] > g_base.depth.shape[0]

        # resampled with an explicit coarser target resolution
        g_coarse = BathymetricLoader(vr_bag_mode="resampled").load(
            p, vr_target_resolution=4.0)
        assert g_coarse.resolution == (4.0, 4.0)
        assert g_coarse.depth.shape == (8, 8)  # 32m extent / 4m
        v = g_coarse.depth[g_coarse.valid_mask]
        src = np.concatenate([d[d != BAG_NODATA].ravel()
                              for _, _, d, _, _ in refs])
        assert v.size > 0 and v.min() >= src.min() - 1e-5
        assert v.max() <= src.max() + 1e-5

        # per-refinement generator: one georeferenced grid per refinement
        grids = list(BathymetricLoader().load_refinement_grids(p))
        assert len(grids) == len(refs)
        for g, (r, c, depth, _, res) in zip(grids, refs):
            assert g.depth.shape == depth.shape
            np.testing.assert_array_equal(g.depth, np.flipud(depth))
            assert abs(g.resolution[0] - res) < 1e-5  # f32 in BAG metadata
            assert g.geotransform is not None
            # sw corner of refinement cell (r, c) in base coordinates
            assert abs(g.geotransform[0] - (100.0 + c * 16.0)) < 1e-6
        # min_valid_ratio filter drops fully-invalid refinements
        assert len(list(BathymetricLoader().load_refinement_grids(
            p, min_valid_ratio=1.0))) == 0


class TestSidecar:
    def test_sidecar_placement(self, tmp_path):
        p, refs = make_test_vr(tmp_path)
        h = VRBagHandler(p)
        sb = SidecarBuilder(h)
        for g in h.iterate_refinements():
            cls = np.full(g.depth.shape, 2.0, np.float32)
            conf = np.full(g.depth.shape, 0.9, np.float32)
            corr = np.full(g.depth.shape, 0.1, np.float32)
            sb.add_refinement_results(g, cls, conf, corr)
        out = tmp_path / "side.tif"
        sb.save(out)
        bands, info = read_geotiff(out)
        assert bands.shape[0] == 4
        placed = bands[3] > 0
        assert placed.sum() > 0
        assert (bands[0][placed] == 2.0).all()
        assert np.allclose(bands[1][placed], 0.9)


class TestProcessBagNative:
    def test_subtract_convention(self, tmp_path):
        p, refs = make_test_vr(tmp_path)

        def proc(depth, unc, res):
            # classify everything valid as confident noise, correction +1
            return {
                "classification": np.full(depth.shape, 2, np.int64),
                "confidence": np.full(depth.shape, 0.95, np.float32),
                "correction": np.ones(depth.shape, np.float32),
            }

        out = tmp_path / "c.bag"
        stats = process_bag_native(p, out, proc,
                                   sidecar_path=tmp_path / "sc.tif")
        assert stats["grids"] == 3
        assert stats["cells_corrected"] > 0
        h0 = VRBagHandler(p)
        h1 = VRBagHandler(out)
        for g0, g1 in zip(h0.iterate_refinements(), h1.iterate_refinements()):
            m = g0.valid_mask
            # clean = noisy - correction  (SUBTRACT, SURVEY Q1)
            np.testing.assert_allclose(g1.depth[m], g0.depth[m] - 1.0,
                                       rtol=1e-6)
            np.testing.assert_array_equal(g1.depth[~m], g0.depth[~m])
        assert (tmp_path / "sc.tif").exists()


class TestBagRoundTripViaWriter:
    def test_save_bag_copy_modify(self, tmp_path):
        depth = make_ramp_surface(20, 20)
        src = tmp_path / "src.bag"
        write_sr_bag(src, np.flipud(depth), None, 1.0, origin=(0.0, 0.0))
        g = BathymetricLoader().load(src)
        g.depth = g.depth + 2.0
        out = tmp_path / "out.bag"
        BathymetricWriter().save(g, out, source_bag=str(src),
                                 extra_bands={"confidence":
                                              np.ones_like(depth)})
        g2 = BathymetricLoader().load(out)
        np.testing.assert_allclose(g2.depth[g2.valid_mask],
                                   (depth + 2.0)[g2.valid_mask], rtol=1e-6)
        assert (tmp_path / "out_gnn_outputs.tif").exists()


class TestBigTiff:
    """BigTIFF (version 43) round trips: required beyond the classic-TIFF
    4 GB offset limit (a 5-band f32 16384^2 output is 5.4 GB; the 60k^2
    flagship survey is 14 GB/band). Forced small here via bigtiff=True."""

    def test_streaming_writer_bigtiff_roundtrip(self, tmp_path):
        from bathymetric_gnn_tpu.io.geotiff import (GeoTiffWindowReader,
                                                    StreamingGeoTiffWriter,
                                                    read_geotiff)

        rg = np.random.default_rng(0)
        data = rg.normal(20, 3, (2, 130, 96)).astype(np.float32)
        p = tmp_path / "big.tif"
        w = StreamingGeoTiffWriter(p, 130, 96, 2, pixel_scale=(2.0, 2.0),
                                   origin=(10.0, 260.0), nodata=-9999.0,
                                   rows_per_strip=64, bigtiff=True)
        assert w.bigtiff
        for b in range(2):
            for r0 in range(0, 130, 64):
                w.write_rows(b, r0, data[b, r0:r0 + 64])
        w.close()
        # magic must be 43
        with open(p, "rb") as f:
            hdr = f.read(4)
        assert hdr[:2] == b"II" and hdr[2] == 43

        arr, info = read_geotiff(p)
        np.testing.assert_array_equal(arr, data)
        assert info.pixel_scale[:2] == (2.0, 2.0)
        assert info.nodata == -9999.0

        with GeoTiffWindowReader(p) as r:
            assert r.bigtiff
            np.testing.assert_array_equal(r.read_rows(1, 64, 130),
                                          data[1, 64:130])

    def test_auto_threshold_selects_classic_for_small(self, tmp_path):
        from bathymetric_gnn_tpu.io.geotiff import StreamingGeoTiffWriter

        w = StreamingGeoTiffWriter(tmp_path / "small.tif", 32, 32, 1)
        assert not w.bigtiff
        w.write_rows(0, 0, np.zeros((32, 32), np.float32))
        w.close()
