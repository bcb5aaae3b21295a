"""Staged pipeline smoke test (re-design of scripts/test_pipeline.py:35-464):
runs each component in dependency order against synthetic (or real) data and
aborts on the first failure. 'Run this before full training to verify.'"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .common import setup_logging


def stage(name):
    def deco(fn):
        fn._stage_name = name
        return fn
    return deco


@stage("imports")
def check_imports(ctx):
    import jax

    from .. import config, data, inference, io, models, ops, parallel, training  # noqa

    ctx["backend"] = jax.default_backend()
    return f"jax backend: {ctx['backend']}, devices: {len(jax.devices())}"


@stage("data loading")
def test_data_loading(ctx):
    from ..io.loaders import BathymetricGrid, BathymetricLoader

    if ctx["survey"]:
        grid = BathymetricLoader(ctx["vr_bag_mode"]).load(ctx["survey"])
    else:
        h = w = 128
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        depth = 30 + 0.05 * xx + 0.3 * np.sin(yy / 5)
        grid = BathymetricGrid(depth=depth)
    ctx["grid"] = grid
    s = grid.get_statistics()
    return (f"{grid.depth.shape} grid, {s.get('count', 0):,} valid cells, "
            f"depth {s.get('min', 0):.1f}..{s.get('max', 0):.1f}")


@stage("tiling")
def test_tiling(ctx):
    from ..data.tiling import TileManager

    grid = ctx["grid"]
    ts = min(64, min(grid.depth.shape))
    tm = TileManager(ts, ts // 8, 0.05)
    tiles = list(tm.iterate_tiles(grid.depth, valid_mask=grid.valid_mask))
    ctx["tile"] = tiles[0]
    return f"{len(tiles)} tiles of {ts}x{ts}"


@stage("graph construction")
def test_graph_construction(ctx):
    from ..data.graph_build import GraphBuilder

    t = ctx["tile"]
    bg = GraphBuilder().build_graph(np.nan_to_num(t.data), t.valid_mask)
    x = np.asarray(bg.graph.x)
    assert np.isfinite(x).all(), "non-finite node features"
    ctx["built_graph"] = bg
    return (f"{bg.num_nodes} nodes, "
            f"{int(np.asarray(bg.graph.edge_mask).sum())} edges, "
            f"{bg.graph.num_node_features} features")


@stage("synthetic noise")
def test_synthetic_noise(ctx):
    from ..data.synthetic_noise import SyntheticNoiseGenerator

    t = ctx["tile"]
    lbl = SyntheticNoiseGenerator(seed=0).generate(
        np.nan_to_num(t.data), t.valid_mask)
    pct = 100.0 * lbl.noise_mask.sum() / max(t.valid_mask.sum(), 1)
    assert lbl.noise_mask.any(), "no noise generated"
    return f"{lbl.noise_mask.sum()} noisy cells ({pct:.1f}% of valid)"


@stage("model forward")
def test_model_forward(ctx):
    import jax

    from ..models.gnn import BathymetricGNN, predict_with_thresholds

    bg = ctx["built_graph"]
    model = BathymetricGNN(hidden_channels=16, num_layers=2, heads=2)
    variables = model.init(jax.random.PRNGKey(0), bg.graph)
    out = predict_with_thresholds(model.apply(variables, bg.graph))
    n = bg.num_nodes
    cls = np.asarray(out["predicted_class"])[:n]
    dist = {int(c): int((cls == c).sum()) for c in np.unique(cls)}
    assert np.isfinite(np.asarray(out["class_logits"])).all()
    return f"untrained class distribution: {dist}"


@stage("dense grid path")
def test_grid_path(ctx):
    import jax

    from ..data.graph_build import build_grid_inputs
    from ..models.grid_gat import GridBathymetricGNN

    t = ctx["tile"]
    feats, v, nbr, eattr, _ = build_grid_inputs(
        np.nan_to_num(t.data).astype(np.float32), t.valid_mask)
    model = GridBathymetricGNN(hidden_channels=16, num_layers=2, heads=2)
    variables = model.init(jax.random.PRNGKey(0), feats, v, nbr, eattr)
    out = model.apply(variables, feats, v, nbr, eattr)
    assert np.isfinite(np.asarray(out["class_logits"])).all()
    return f"grid forward ok: {out['class_logits'].shape}"


@stage("memory estimate")
def test_memory_estimate(ctx):
    grid = ctx["grid"]
    n = int(grid.valid_mask.sum())
    edges = n * 8
    feat_bytes = n * 8 * 4
    model_act = n * 64 * 4 * 4 * 4  # hidden*heads*layers*f32
    total_mb = (feat_bytes + edges * 3 * 4 + model_act) / 1e6
    return f"~{total_mb:.0f} MB activations for full survey at once"


STAGES = [check_imports, test_data_loading, test_tiling,
          test_graph_construction, test_synthetic_noise, test_model_forward,
          test_grid_path, test_memory_estimate]


def main(argv=None):
    p = argparse.ArgumentParser(description="Staged pipeline smoke test")
    p.add_argument("--survey", help="optional real survey file")
    p.add_argument("--vr-bag-mode", default="resampled")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    setup_logging(args.verbose)

    ctx = {"survey": args.survey, "vr_bag_mode": args.vr_bag_mode}
    for fn in STAGES:
        name = fn._stage_name
        t0 = time.time()
        try:
            msg = fn(ctx)
        except Exception as e:  # abort on failure like the reference
            print(f"[FAIL] {name}: {e}")
            sys.exit(1)
        print(f"[ ok ] {name} ({time.time() - t0:.1f}s): {msg}")
    print("all stages passed")


if __name__ == "__main__":
    main()
