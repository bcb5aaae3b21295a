"""k-NN sparse-path TRAIN STEP benchmark (VERDICT r2 item 2's metric).

BASELINE config #1 workload at flagship scale: 65,536 Hilbert-ordered
nodes, k=8 k-NN graph, full EllBathymetricGNN (4 layers, 64 hidden,
4 heads), 5-component combined loss, AdamW + clip, attention dropout 0.1
ACTIVE. Paths:

  xla            — plain ELL gathers, jax.grad through everything
  banded_pallas  — fused banded kernel fwd + custom-VJP backward kernel,
                   streamed dropout masks

Timing: scan-marginal (see bench.py methodology) over chained train
steps — params thread through the scan, a host checksum ends the chain.

Usage: python benchmarks/knn_train_bench.py [--nodes 65536] [--band 128]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS_SHORT = 4
ITERS_LONG = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=65536)
    ap.add_argument("--band", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--paths", default="xla,banded_pallas")
    ap.add_argument("--profile", action="store_true",
                    help="trace the first path and print per-fusion "
                         "device times instead of timing")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bathymetric_gnn_tpu.config.config import (BucketConfig, Config,
                                                   GraphConfig,
                                                   TrainingConfig)
    from bathymetric_gnn_tpu.config.constants import (CLASS_NOISE,
                                                      CORRECTION_NORM_CAP,
                                                      CORRECTION_NORM_FLOOR)
    from bathymetric_gnn_tpu.data.graph_build import GraphBuilder
    from bathymetric_gnn_tpu.models.gnn_ell import EllBathymetricGNN
    from bathymetric_gnn_tpu.ops.ell import coo_to_ell
    from bathymetric_gnn_tpu.ops.ell_banded import band_ell
    from bathymetric_gnn_tpu.training import losses as L

    n = args.nodes
    rg = np.random.default_rng(0)
    side = int(np.sqrt(n))
    yy, xx = np.mgrid[0:side, 0:side].astype(np.float32)
    depth_grid = (30 + 6 * np.sin(xx / 11) + 4 * np.cos(yy / 9)
                  + rg.normal(0, 0.05, (side, side))).astype(np.float32)
    spikes = rg.random((side, side)) < 0.05
    noisy = np.where(spikes,
                     depth_grid + rg.uniform(1, 8, (side, side))
                     * rg.choice([-1, 1], (side, side)),
                     depth_grid).astype(np.float32)

    gb = GraphBuilder(GraphConfig(knn_k=args.k),
                      BucketConfig(node_buckets=(n,)))
    bg = gb.build_graph(noisy, np.ones((side, side), bool))
    g = coo_to_ell(bg.graph, max_degree=args.k)
    banded = band_ell(g, band_rows=args.band)
    n_edges = int(np.asarray(g.nbr_mask).sum())

    # targets in graph (Hilbert) order
    perm_rows, perm_cols = bg.rows, bg.cols
    labels_grid = np.where(spikes, CLASS_NOISE, 0).astype(np.int32)
    labels = np.zeros(g.num_nodes_padded, np.int32)
    labels[: len(perm_rows)] = labels_grid[perm_rows, perm_cols]
    raw_corr = np.zeros(g.num_nodes_padded, np.float32)
    raw_corr[: len(perm_rows)] = (noisy - depth_grid)[perm_rows, perm_cols]

    lstd = np.asarray(g.local_std)
    denom = np.maximum(lstd, CORRECTION_NORM_FLOOR)
    corr_t = np.clip(raw_corr / denom, -CORRECTION_NORM_CAP,
                     CORRECTION_NORM_CAP).astype(np.float32)
    targets = {
        "labels": jnp.asarray(labels),
        "correction": jnp.asarray(corr_t),
        "noise_mask": jnp.asarray(labels == CLASS_NOISE),
    }
    cw = jnp.ones(3)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-3, weight_decay=1e-4))

    results = {"nodes": g.num_nodes_padded, "edges": n_edges,
               "band_rows": args.band,
               "spill_fraction": round(banded.spill_fraction(g), 5),
               "backend": jax.default_backend(), "dropout": 0.1}

    def build(kernel):
        # flagship TPU training mode: bf16 kernel I/O + bf16 activation
        # streams (f32 softmax/accumulation in-kernel, f32 master weights
        # in optax) — same contract as the grid train headline (bench.py)
        on_tpu = jax.default_backend() == "tpu"
        cd = ("bfloat16" if on_tpu and kernel == "banded_pallas"
              else "float32")
        model = EllBathymetricGNN(hidden_channels=64, num_layers=4,
                                  heads=4, dropout=0.1,
                                  sparse_kernel=kernel, compute_dtype=cd)
        kw = dict(banded=banded) if kernel != "xla" else {}
        variables = model.init(jax.random.PRNGKey(0), g, **kw)

        def loss_fn(p, bs, rng):
            out, upd = model.apply(
                {"params": p, "batch_stats": bs}, g, False,
                rngs={"dropout": rng}, mutable=["batch_stats"], **kw)
            losses = L.combined_loss(out, targets, g.node_mask,
                                     class_weights=cw)
            return losses["total"], upd["batch_stats"]

        def step(p, bs, o, rng):
            (tot, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, bs, rng)
            updates, no = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), nbs, no, tot

        from bathymetric_gnn_tpu.training.trainer import make_dropout_key

        base_key = make_dropout_key(7)  # production default (rbg on TPU)

        def scan_steps(p, bs, o, iters):
            def body(carry, i):
                p, bs, o = carry
                p, bs, o, tot = step(p, bs, o,
                                     jax.random.fold_in(base_key, i))
                return (p, bs, o), tot

            (p, bs, o), tots = jax.lax.scan(
                body, (p, bs, o), jnp.arange(iters))
            return p, tots[-1]

        fns = {}
        for it in (ITERS_SHORT, ITERS_LONG):
            fns[it] = jax.jit(lambda p, bs, o, it=it: scan_steps(
                p, bs, o, it))
        p = variables["params"]
        bs = variables.get("batch_stats", {})
        o = tx.init(p)
        return fns, p, bs, o

    if args.profile:
        import glob
        import gzip
        import tempfile
        from collections import defaultdict

        kernel = args.paths.split(",")[0]
        fns, p, bs, o = build(kernel)
        fn = fns[ITERS_LONG]
        float(fn(p, bs, o)[1])
        trace_dir = tempfile.mkdtemp(prefix="prof_knn_")
        with jax.profiler.trace(trace_dir):
            float(fn(p, bs, o)[1])
        files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
        with gzip.open(sorted(files)[-1], "rt") as f:
            tr = json.load(f)
        pid_names = {}
        for ev in tr["traceEvents"]:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        spans = defaultdict(lambda: [0.0, 0])
        total = 0.0
        for ev in tr["traceEvents"]:
            if ev.get("ph") != "X":
                continue
            pname = pid_names.get(ev.get("pid"), "")
            if "TPU" not in pname and "/device" not in pname.lower():
                continue
            name = ev.get("name", "")
            if name.startswith("jit_"):
                continue
            spans[name][0] += ev.get("dur", 0)
            spans[name][1] += 1
            total += ev.get("dur", 0)
        print(f"# total leaf device us/iter: {total / ITERS_LONG:.1f}")
        for name, (dur, cnt) in sorted(spans.items(),
                                       key=lambda kv: -kv[1][0])[:40]:
            print(f"{dur / ITERS_LONG:9.1f} us/iter  x{cnt:5d}  {name[:100]}")
        return

    for kernel in args.paths.split(","):
        fns, p, bs, o = build(kernel)
        # warm both compiles
        for it in (ITERS_SHORT, ITERS_LONG):
            _, tot = fns[it](p, bs, o)
            float(tot)
        ts, tl = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fns[ITERS_SHORT](p, bs, o)[1])
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(fns[ITERS_LONG](p, bs, o)[1])
            tl.append(time.perf_counter() - t0)
        dt = (min(tl) - min(ts)) / (ITERS_LONG - ITERS_SHORT)
        results[kernel + "_step_ms"] = round(dt * 1e3, 3)
        results[kernel + "_Medges_per_s"] = round(
            n_edges * 4 / dt / 1e6, 1)   # 4 GAT layers

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
