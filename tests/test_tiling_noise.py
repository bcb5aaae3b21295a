"""Tiling round-trip / stitching tests and synthetic-noise behavior tests."""

import numpy as np
import pytest

from bathymetric_gnn_tpu.config.config import SyntheticNoiseConfig
from bathymetric_gnn_tpu.data.synthetic_noise import (NoiseAugmentor,
                                                      SyntheticNoiseGenerator)
from bathymetric_gnn_tpu.data.tiling import TileManager, TileMerger

from conftest import make_ramp_surface


class TestTileGrid:
    def test_counts_and_coverage(self):
        tm = TileManager(tile_size=128, overlap=16)
        nrows, ncols, specs = tm.compute_tile_grid((300, 500))
        cover = np.zeros((300, 500), bool)
        for s in specs:
            assert s.row_end - s.row_start <= 128
            cover[s.row_start:s.row_end, s.col_start:s.col_end] = True
        assert cover.all()

    def test_edge_tiles_pulled_back(self):
        tm = TileManager(tile_size=128, overlap=16)
        _, _, specs = tm.compute_tile_grid((300, 300))
        for s in specs:
            if s.row_start > 0:
                assert s.row_end - s.row_start == 128
            if s.col_start > 0:
                assert s.col_end - s.col_start == 128

    def test_small_grid_single_tile(self):
        tm = TileManager(tile_size=128, overlap=16)
        _, _, specs = tm.compute_tile_grid((64, 64))
        assert len(specs) == 1
        assert specs[0].shape == (64, 64)

    def test_min_valid_ratio_skip(self):
        tm = TileManager(tile_size=64, overlap=8, min_valid_ratio=0.5)
        depth = make_ramp_surface(128, 128)
        valid = np.zeros((128, 128), bool)
        valid[:, :40] = True  # left strip valid
        depth[~valid] = np.nan
        tiles = list(tm.iterate_tiles(depth, valid_mask=valid))
        assert len(tiles) > 0
        for t in tiles:
            assert t.valid_ratio >= 0.5


class TestStitching:
    def test_constant_field_reconstructed_exactly(self):
        tm = TileManager(tile_size=64, overlap=16, min_valid_ratio=0.0)
        merger = TileMerger(tm)
        shape = (150, 170)
        merger.initialize(shape, ["cleaned_depth"])
        _, _, specs = tm.compute_tile_grid(shape)
        for s in specs:
            merger.add_tile(s, {"cleaned_depth": np.full(s.shape, 7.5, np.float32)},
                            tile_valid=np.ones(s.shape, bool))
        out = merger.finalize()["cleaned_depth"]
        np.testing.assert_allclose(out, 7.5, rtol=1e-5)

    def test_smooth_field_seamless(self):
        tm = TileManager(tile_size=64, overlap=16, min_valid_ratio=0.0)
        merger = TileMerger(tm)
        depth = make_ramp_surface(200, 200)
        merger.initialize(depth.shape, ["cleaned_depth"])
        _, _, specs = tm.compute_tile_grid(depth.shape)
        for s in specs:
            sl = np.s_[s.row_start:s.row_end, s.col_start:s.col_end]
            merger.add_tile(s, {"cleaned_depth": depth[sl]},
                            tile_valid=np.ones(s.shape, bool))
        out = merger.finalize()["cleaned_depth"]
        np.testing.assert_allclose(out, depth, rtol=1e-4, atol=1e-4)

    def test_discrete_channel_keeps_highest_confidence(self):
        tm = TileManager(tile_size=64, overlap=32, min_valid_ratio=0.0)
        merger = TileMerger(tm)
        merger.initialize((64, 96), ["classification", "confidence"])
        ones = np.ones((64, 64), bool)
        # tile A: class 1, confidence 0.9 over cols 0..64
        sA = type(tm.compute_tile_grid((64, 96))[2][0])(0, 0, 64, 64, 0, 0)
        merger.add_tile(sA, {"classification": np.full((64, 64), 1.0, np.float32),
                             "confidence": np.full((64, 64), 0.9, np.float32)},
                        tile_valid=ones)
        # tile B: class 2, confidence 0.3 over cols 32..96
        sB = type(sA)(0, 32, 64, 96, 0, 1)
        merger.add_tile(sB, {"classification": np.full((64, 64), 2.0, np.float32),
                             "confidence": np.full((64, 64), 0.3, np.float32)},
                        tile_valid=ones)
        cls = merger.finalize()["classification"]
        # overlap region keeps class 1 (higher confidence), never fractional
        assert set(np.unique(cls[:, 32:64])) == {1.0}
        assert set(np.unique(cls[:, 64:])) == {2.0}
        assert np.isin(cls[np.isfinite(cls)], [1.0, 2.0]).all()


class TestSyntheticNoise:
    def test_generates_labels_and_preserves_clean(self):
        gen = SyntheticNoiseGenerator(seed=0)
        clean = make_ramp_surface(96, 96)
        lbl = gen.generate(clean)
        assert lbl.noisy_depth.shape == clean.shape
        np.testing.assert_array_equal(lbl.clean_depth, clean)
        assert lbl.noise_mask.any()
        assert set(np.unique(lbl.classification)) <= {0, 2}
        assert (lbl.classification[lbl.noise_mask] == 2).all()
        # noise actually changed the depths where masked
        changed = lbl.noisy_depth != clean
        assert (changed[lbl.noise_mask].mean()) > 0.9

    def test_reproducible_with_seed(self):
        clean = make_ramp_surface(64, 64)
        a = SyntheticNoiseGenerator(seed=7).generate(clean)
        b = SyntheticNoiseGenerator(seed=7).generate(clean)
        np.testing.assert_array_equal(a.noisy_depth, b.noisy_depth)

    def test_respects_valid_mask(self):
        clean = make_ramp_surface(64, 64)
        valid = np.ones((64, 64), bool)
        valid[:, 32:] = False
        lbl = SyntheticNoiseGenerator(seed=1).generate(clean, valid)
        np.testing.assert_array_equal(lbl.noisy_depth[~valid], clean[~valid])
        assert not lbl.noise_mask[~valid].any()

    def test_empty_mask(self):
        clean = make_ramp_surface(32, 32)
        lbl = SyntheticNoiseGenerator(seed=1).generate(clean,
                                                       np.zeros((32, 32), bool))
        np.testing.assert_array_equal(lbl.noisy_depth, clean)
        assert not lbl.noise_mask.any()

    def test_augmentor_varies_intensity(self):
        gen = SyntheticNoiseGenerator(seed=3)
        aug = NoiseAugmentor(gen, seed=4)
        clean = make_ramp_surface(64, 64)
        a = aug(clean)
        b = aug(clean)
        assert not np.array_equal(a.noisy_depth, b.noisy_depth)

    def test_disable_all_types(self):
        cfg = SyntheticNoiseConfig(
            gaussian_enabled=False, spike_enabled=False,
            blob_enabled=False, systematic_enabled=False,
        )
        lbl = SyntheticNoiseGenerator(cfg, seed=0).generate(make_ramp_surface(32, 32))
        assert not lbl.noise_mask.any()
        np.testing.assert_array_equal(lbl.noisy_depth, lbl.clean_depth)


class TestSyntheticFeatures:
    """Round-4 class-1 training signal (the reference generator emits
    only 0/2 — reference data/synthetic_noise.py:165-168)."""

    def _gen(self, seed=3):
        from bathymetric_gnn_tpu.config.config import SyntheticNoiseConfig
        from bathymetric_gnn_tpu.data.synthetic_noise import \
            SyntheticNoiseGenerator

        cfg = SyntheticNoiseConfig(feature_enabled=True,
                                   feature_count_range=(2, 4))
        return SyntheticNoiseGenerator(cfg, seed=seed)

    def test_feature_labels_present(self):
        clean = (30 + np.random.default_rng(0)
                 .normal(0, 0.1, (128, 128))).astype(np.float32)
        lbl = self._gen().generate(clean.copy())
        u = set(np.unique(lbl.classification))
        assert 1 in u
        assert lbl.feature_mask is not None and lbl.feature_mask.any()
        # label arbitration: LARGE corruption wins over the feature
        # label; small ripples (<= feature_noise_override_m) keep it
        thr = 0.25  # default feature_noise_override_m
        big_noise = np.asarray(lbl.noise_mask) & (lbl.noise_magnitude > thr)
        assert not ((lbl.classification == 1) & big_noise).any()
        small_noise = (np.asarray(lbl.noise_mask)
                       & (lbl.noise_magnitude <= thr) & lbl.feature_mask)
        if small_noise.any():  # ripple-hit feature cells stay features
            assert (lbl.classification[small_noise] == 1).all()

    def test_features_shoal_the_clean_surface(self):
        clean = np.full((96, 96), 30.0, np.float32)
        lbl = self._gen(seed=5).generate(clean.copy())
        fm = lbl.feature_mask
        assert fm.any()
        # depth DECREASES (shoals) at features, in the CLEAN surface
        assert (lbl.clean_depth[fm] < 30.0 - 1e-6).all()
        # bumps only ever shoal (never deepen), and the Gaussian tails
        # die off: far-field cells are untouched
        assert (lbl.clean_depth <= 30.0 + 1e-6).all()
        from scipy import ndimage

        far = ~ndimage.binary_dilation(fm, iterations=40)
        if far.any():
            assert np.allclose(lbl.clean_depth[far], 30.0, atol=1e-3)

    def test_default_config_unchanged(self):
        from bathymetric_gnn_tpu.data.synthetic_noise import \
            SyntheticNoiseGenerator

        clean = np.full((64, 64), 25.0, np.float32)
        lbl = SyntheticNoiseGenerator(seed=1).generate(clean)
        assert lbl.feature_mask is None
        assert set(np.unique(lbl.classification)) <= {0, 2}
