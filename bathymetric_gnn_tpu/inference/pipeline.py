"""Tiled end-to-end inference pipeline (flagship dense-grid path).

Re-design of the reference's BathymetricPipeline
(reference: models/pipeline.py:36-383): tiles run through the dense
shifted-window GAT entirely on device (featurization included), corrections
are denormalized by per-cell local_std, tiles are Hann-stitched with
confidence-argmax classification, unprocessed valid cells are back-filled
as seafloor/conf-0, and corrections are applied with the subtract
convention to confident noise (SURVEY Q1/Q6/Q7).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.config import Config
from ..config.constants import (CLASS_NOISE, CLASS_SEAFLOOR,
                                CORRECTION_NORM_FLOOR)
from ..data.graph_build import build_grid_inputs
from ..data.tiling import TileManager, TileMerger
from ..io.loaders import BathymetricGrid, BathymetricLoader, BathymetricWriter
from ..models.grid_gat import GridBathymetricGNN, params_from_coo

logger = logging.getLogger(__name__)


def load_checkpoint_variables(checkpoint_dir) -> Tuple[Dict, Dict, Config, Dict]:
    """Load (params, batch_stats, config, meta) from a Trainer checkpoint
    (reference analogue: models/pipeline.py:92-132). in_channels/edge_dim
    are recovered from parameter shapes (SURVEY Q2); meta records the
    param layout ('coo' from the graph trainer, 'grid' from GridTrainer)."""
    import orbax.checkpoint as ocp

    path = Path(checkpoint_dir).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    cfg_path = path.parent / "config.yaml"
    cfg = Config.load(cfg_path) if cfg_path.exists() else Config()
    meta = restored.get("meta", {}) or {}
    # round-5 confidence calibration: the Trainer writes calibration.json
    # beside each checkpoint (see Trainer.calibrate_confidence); loading
    # it here makes every inference surface apply it by default. A
    # non-default temperature in config.yaml wins (explicit user choice,
    # mapped to scale = 1/T, bias = 0).
    cal = load_confidence_calibration(path)
    meta.setdefault("confidence_calibration", (cal["scale"], cal["bias"]))
    inf = cfg.inference
    if inf.confidence_temperature != 1.0:
        inf.confidence_scale = 1.0 / inf.confidence_temperature
        inf.confidence_bias = 0.0
    elif inf.confidence_scale == 1.0 and inf.confidence_bias == 0.0:
        inf.confidence_scale = cal["scale"]
        inf.confidence_bias = cal["bias"]
    return restored["params"], restored.get("batch_stats", {}), cfg, meta


def load_confidence_calibration(checkpoint_dir) -> Dict:
    """Platt parameters {"scale", "bias"} from calibration.json in the
    checkpoint dir (or its parent run dir); identity when absent
    (uncalibrated head). Legacy files carrying only
    ``confidence_temperature`` map to scale = 1/T, bias = 0."""
    import json

    for d in (Path(checkpoint_dir), Path(checkpoint_dir).parent):
        f = d / "calibration.json"
        if f.exists():
            try:
                info = json.loads(f.read_text())
                if "confidence_scale" in info:
                    return {"scale": float(info["confidence_scale"]),
                            "bias": float(info.get("confidence_bias", 0.0))}
                t = float(info.get("confidence_temperature", 1.0))
                return {"scale": 1.0 / t, "bias": 0.0}
            except (ValueError, OSError, ZeroDivisionError):
                logger.warning("unreadable calibration.json at %s", f)
    return {"scale": 1.0, "bias": 0.0}


def apply_confidence_calibration(conf: "np.ndarray", scale: float,
                                 bias: float = 0.0):
    """conf' = sigmoid(scale * logit(conf) + bias) — Platt scaling of
    the confidence head. Monotone for scale > 0, so ranking and any
    threshold sweep's trade-off curve are unchanged; only the absolute
    scale moves (scale > 1 sharpens an underconfident head, bias shifts
    the operating point). Identity at (1, 0)."""
    if scale == 1.0 and bias == 0.0:
        return conf
    c = np.clip(conf, 1e-6, 1.0 - 1e-6)
    z = np.log(c / (1.0 - c))
    return (1.0 / (1.0 + np.exp(-(scale * z + bias)))).astype(conf.dtype)


def apply_confidence_temperature(conf: "np.ndarray", t: float):
    """Legacy single-temperature form: conf' = sigmoid(logit(conf) / t)."""
    return apply_confidence_calibration(conf, 1.0 / t, 0.0)


def _pack_channels(out: Dict, corr) -> jax.Array:
    """Pack (classification, confidence, correction) into ONE f16 array
    ([3, H, W] / [3, B, H, W]) so each batch costs a single device->host
    fetch. Tunneled TPU links pay ~25 ms fixed latency per fetch plus
    ~18 ms/MB, so one packed f16 fetch beats three f32 fetches ~3x.
    Classification values {0, 1, 2} are exact in f16; f16 correction
    rel-err (~1e-3 of the correction VALUE, not the depth) is far below
    hydrographic uncertainty."""
    corr = (corr if corr is not None
            else jnp.zeros_like(out["confidence"]))
    return jnp.stack([
        out["predicted_class"].astype(jnp.float16),
        out["confidence"].astype(jnp.float16),
        corr.astype(jnp.float16),
    ])


def _unpack_channels(arr: "np.ndarray") -> Dict[str, "np.ndarray"]:
    """Host-side inverse of _pack_channels for one tile."""
    return {
        "classification": arr[0].astype(np.float32),
        "confidence": arr[1].astype(np.float32),
        "correction": arr[2].astype(np.float32),
    }


def infer_in_channels(params: Dict) -> int:
    """First extractor Linear input width (reference probes the first
    torch Linear the same way — scripts/inference_native.py:147)."""
    k = params["MLPFeatureExtractor_0"]["TorchLinear_0"]["kernel"]
    return int(k.shape[0])


class BathymetricPipeline:
    """Load model -> tile -> dense-grid forward -> stitch -> write."""

    def __init__(self, config: Optional[Config] = None,
                 vr_bag_mode: str = "resampled", tile_batch: int = 8):
        self.config = config or Config()
        self.loader = BathymetricLoader(vr_bag_mode)
        self.writer = BathymetricWriter(compress_level=1)  # write speed
        # is on the survey wall-clock path; level 1 is ~3x faster
        t = self.config.tile
        self.tm = TileManager(t.tile_size, t.overlap, t.min_valid_ratio)
        self.tile_batch = max(1, tile_batch)
        self.params: Optional[Dict] = None
        self.batch_stats: Optional[Dict] = None
        self.model: Optional[GridBathymetricGNN] = None
        self._forward = None
        self._forward_batch = None
        self.in_channels = 7

    # -- model -------------------------------------------------------------

    def load_model(self, checkpoint_dir):
        params, bs, ckpt_cfg, meta = load_checkpoint_variables(checkpoint_dir)
        self.config.model = ckpt_cfg.model
        n_layers = ckpt_cfg.model.num_layers
        if meta.get("param_layout") == "grid":
            self.params, self.batch_stats = params, bs
        else:
            self.params = params_from_coo(params, n_layers)
            self.batch_stats = params_from_coo(bs, n_layers)
        self.in_channels = infer_in_channels(self.params)
        self._build_model()

    def use_variables(self, params: Dict, batch_stats: Dict,
                      from_coo: bool = True):
        """Wire in-memory training variables (for tests / same-process use)."""
        n_layers = self.config.model.num_layers
        if from_coo:
            params = params_from_coo(params, n_layers)
            batch_stats = params_from_coo(batch_stats, n_layers)
        self.params = params
        self.batch_stats = batch_stats
        self.in_channels = infer_in_channels(params)
        self._build_model()

    def _build_model(self):
        mc = self.config.model
        flag = getattr(mc, "use_pallas", "auto")
        # the fused kernel serves both f32 and bf16 inference (bf16 streams
        # activations through HBM at half width; class/confidence parity
        # verified in tests/test_pallas_fused.py)
        use_pallas = (flag == "on") or (
            flag == "auto" and jax.default_backend() == "tpu")
        self.model = GridBathymetricGNN(
            hidden_channels=mc.hidden_channels, num_layers=mc.num_layers,
            heads=mc.heads, num_classes=mc.num_classes,
            dropout=0.0,  # inference (reference: models/pipeline.py:119)
            predict_correction=mc.predict_correction,
            feature_extractor_layers=mc.feature_extractor_layers,
            edge_dim=3, connectivity=self.config.graph.connectivity,
            compute_dtype=mc.compute_dtype,
            use_pallas=use_pallas,
        )
        model = self.model
        conn = self.config.graph.connectivity
        win = self.config.graph.local_stats_window

        @partial(jax.jit, static_argnames=("resolution", "with_unc"))
        def forward(variables, depth, valid, uncertainty, *, resolution,
                    with_unc):
            feats, v, nbr, eattr, local_std = build_grid_inputs(
                depth, valid, uncertainty if with_unc else None,
                resolution=resolution, connectivity=conn, stats_window=win,
                with_uncertainty=with_unc,
            )
            out = model.apply(variables, feats, v, nbr, eattr)
            # denormalize correction by local_std
            # (reference: models/pipeline.py:290-307)
            corr = out.get("correction")
            if corr is not None:
                corr = corr * jnp.maximum(local_std, CORRECTION_NORM_FLOOR)
            return _pack_channels(out, corr)

        self._forward = forward

        @partial(jax.jit, static_argnames=("resolution", "with_unc"))
        def forward_batch(variables, depth, valid, uncertainty, *, resolution,
                          with_unc):
            """Batched tile forward: [B, H, W] stacks vmapped through
            featurization + model (uniform tile shapes only)."""

            def one(d, v_, u_):
                return build_grid_inputs(
                    d, v_, u_ if with_unc else None, resolution=resolution,
                    connectivity=conn, stats_window=win,
                    with_uncertainty=with_unc,
                )

            if with_unc:
                feats, v, nbr, eattr, local_std = jax.vmap(one)(
                    depth, valid, uncertainty)
            else:
                feats, v, nbr, eattr, local_std = jax.vmap(
                    lambda d, v_: one(d, v_, None))(depth, valid)
            out = jax.vmap(
                lambda f_, vv, nn, ee: model.apply(variables, f_, vv, nn, ee)
            )(feats, v, nbr, eattr)
            corr = out.get("correction")
            if corr is not None:
                corr = corr * jnp.maximum(local_std, CORRECTION_NORM_FLOOR)
            return _pack_channels(out, corr)

        self._forward_batch = forward_batch

    # -- processing --------------------------------------------------------

    def process(self, input_path, output_path,
                export_extras: bool = True) -> Dict:
        """Full-survey tiled inference (reference: models/pipeline.py:134-241)."""
        if self._forward is None:
            raise RuntimeError("load_model() first")
        t0 = time.time()
        grid = self.loader.load(input_path)
        valid = grid.valid_mask
        use_unc = (grid.uncertainty is not None
                   and self.in_channels >= 8)

        merger = TileMerger(self.tm)
        merger.initialize(grid.depth.shape,
                          ["classification", "confidence", "correction"])
        variables = {"params": self.params, "batch_stats": self.batch_stats}
        resolution = (float(grid.resolution[0]), float(grid.resolution[1]))
        n_tiles = 0

        # Device dispatches are queued asynchronously; results merge on the
        # host only once a window of batches is in flight, overlapping
        # device compute / tunnel round trips with numpy stitching.
        inflight: list = []
        MAX_INFLIGHT = 4

        def merge_ready(force=False):
            nonlocal n_tiles
            while inflight and (force or len(inflight) > MAX_INFLIGHT):
                tiles, res = inflight.pop(0)
                arr = np.asarray(res)  # ONE fetch: [3, H, W] / [3, B, H, W]
                for bi, t in enumerate(tiles):
                    one = _unpack_channels(
                        arr[:, bi] if arr.ndim == 4 else arr)
                    merger.add_tile(t.spec, one, tile_valid=t.valid_mask)
                    n_tiles += 1
                if n_tiles and n_tiles % 50 < len(tiles):
                    logger.info("processed %d tiles", n_tiles)

        def dispatch_single(tile):
            res = self._forward(
                variables,
                jnp.asarray(np.nan_to_num(tile.data), jnp.float32),
                jnp.asarray(tile.valid_mask),
                jnp.asarray(np.nan_to_num(tile.uncertainty), jnp.float32)
                if use_unc and tile.uncertainty is not None else None,
                resolution=resolution, with_unc=use_unc,
            )
            inflight.append(([tile], res))
            merge_ready()

        def dispatch_batch(tiles):
            depth_b = jnp.asarray(np.stack(
                [np.nan_to_num(t.data) for t in tiles]), jnp.float32)
            valid_b = jnp.asarray(np.stack([t.valid_mask for t in tiles]))
            unc_b = (jnp.asarray(np.stack(
                [np.nan_to_num(t.uncertainty) for t in tiles]), jnp.float32)
                if use_unc else None)
            res = self._forward_batch(variables, depth_b, valid_b, unc_b,
                                      resolution=resolution, with_unc=use_unc)
            inflight.append((tiles, res))
            merge_ready()

        full_shape = (self.tm.tile_size, self.tm.tile_size)
        pending: list = []
        for tile in self.tm.iterate_tiles(grid.depth, grid.uncertainty, valid):
            if self.tile_batch > 1 and tile.shape == full_shape:
                pending.append(tile)
                if len(pending) == self.tile_batch:
                    dispatch_batch(pending)
                    pending = []
            else:
                dispatch_single(tile)
        for t in pending:  # ragged tail runs single to avoid a new compile
            dispatch_single(t)
        merge_ready(force=True)

        final = merger.finalize()
        # back-fill unprocessed valid cells as seafloor / confidence 0
        # (reference: models/pipeline.py:198-207)
        unproc = valid & ~np.isfinite(final["classification"])
        final["classification"][unproc] = CLASS_SEAFLOOR
        final["confidence"][unproc] = 0.0
        final["correction"][unproc] = 0.0
        for ch in ("confidence", "correction"):
            final[ch] = np.nan_to_num(final[ch], nan=0.0)
        final["confidence"] = apply_confidence_calibration(
            final["confidence"], self.config.inference.confidence_scale,
            self.config.inference.confidence_bias)

        cleaned, n_corrected = self._apply_corrections(grid, final, valid)
        out_grid = BathymetricGrid(
            depth=cleaned,
            uncertainty=self._scale_uncertainty(grid, final, valid),
            geotransform=grid.geotransform, crs=grid.crs,
            resolution=grid.resolution, nodata=grid.nodata,
        )
        extra = None
        if export_extras:
            extra = {
                "classification": final["classification"],
                "confidence": final["confidence"],
                "correction": final["correction"],
                "valid_mask": valid.astype(np.float32),
            }
        src_bag = (grid.source_path
                   if str(output_path).lower().endswith(".bag") else None)
        self.writer.save(out_grid, output_path, extra_bands=extra,
                         source_bag=src_bag)

        stats = self._summary(grid, final, valid, n_tiles, n_corrected,
                              time.time() - t0)
        logger.info("inference summary: %s", stats)
        return stats

    def _apply_corrections(self, grid, final, valid):
        """cleaned = original - correction on confident noise
        (reference: models/pipeline.py:316-349; subtract — SURVEY Q1)."""
        thr = self.config.inference.auto_correct_threshold
        cleaned = grid.depth.astype(np.float32).copy()
        m = (valid & (final["classification"] == CLASS_NOISE)
             & (final["confidence"] > thr))
        cleaned[m] -= final["correction"][m]
        return cleaned, int(m.sum())

    def _scale_uncertainty(self, grid, final, valid):
        """uncertainty *= (2 - confidence) on corrected cells
        (reference: scripts/inference_native.py:495-496)."""
        if grid.uncertainty is None:
            return None
        thr = self.config.inference.auto_correct_threshold
        unc = grid.uncertainty.astype(np.float32).copy()
        m = (valid & (final["classification"] == CLASS_NOISE)
             & (final["confidence"] > thr))
        unc[m] *= (2.0 - final["confidence"][m])
        return unc

    def _summary(self, grid, final, valid, n_tiles, n_corrected, dt):
        nv = max(int(valid.sum()), 1)
        cls = final["classification"][valid]
        return {
            "tiles_processed": n_tiles,
            "valid_cells": nv,
            "seafloor_pct": float((cls == 0).mean() * 100),
            "feature_pct": float((cls == 1).mean() * 100),
            "noise_pct": float((cls == 2).mean() * 100),
            "mean_confidence": float(final["confidence"][valid].mean()),
            "cells_corrected": n_corrected,
            "elapsed_s": round(dt, 2),
        }
