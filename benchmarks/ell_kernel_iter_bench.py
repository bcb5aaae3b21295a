"""Fast iteration harness for the fused banded-ELL GAT Pallas kernels.

Times the fused kernel call (ell_gat_fused_pallas: band kernel + spill
gather glue) forward-only and forward+backward on the BASELINE config #1
workload shape (65,536 Hilbert-ordered nodes, k=8 k-NN), with all layer
streams (el_t incl. the round-5 dead-slot premask, a_cat_mat, spill
tables) prebuilt OUTSIDE the timed function — so kernel work is isolated
from conv-layer glue. Scan-marginal timing (see bench.py methodology).

Used to iterate on the round-5 [K*H, R] batched-chain restructuring
without paying a full layer/train bench cycle per experiment.

Usage: python benchmarks/ell_kernel_iter_bench.py [--nodes 65536]
       [--band 128] [--hc 256] [--dropout] [--dtype bf16] [--what fwd,bwd]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS_SHORT = 6
ITERS_LONG = 24


def marginal_time(fn, x0):
    """Two-point scan-marginal seconds/iter for x -> fn(x) chained."""
    import jax

    def make(n):
        @jax.jit
        def scan_steps(x):
            def body(carry, _):
                return fn(carry), ()

            y, _ = jax.lax.scan(body, x, None, length=n)
            return y

        return scan_steps

    f_short, f_long = make(ITERS_SHORT), make(ITERS_LONG)
    jax.block_until_ready(f_short(x0))
    jax.block_until_ready(f_long(x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f_short(x0))
        t1 = time.perf_counter()
        jax.block_until_ready(f_long(x0))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (ITERS_LONG - ITERS_SHORT))
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=65536)
    ap.add_argument("--band", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--hc", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--kernel", default="wide", choices=["v2", "wide"])
    ap.add_argument("--layers", type=int, default=1,
                    help="chain N layers (distinct el streams) per step "
                         "to reproduce in-model behavior")
    ap.add_argument("--fresh-streams", action="store_true",
                    help="regenerate el/dropout streams inside the step "
                         "(as the model does) instead of hoisting them")
    ap.add_argument("--dropout", action="store_true")
    ap.add_argument("--what", default="fwd,bwd")
    ap.add_argument("--profile", action="store_true",
                    help="trace one scan and print per-fusion device "
                         "times (profile_layer.py methodology)")
    ap.add_argument("--top", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bathymetric_gnn_tpu.config.config import BucketConfig, GraphConfig
    from bathymetric_gnn_tpu.data.graph_build import GraphBuilder
    from bathymetric_gnn_tpu.models.conv_ell import make_banded_dropout_masks
    from bathymetric_gnn_tpu.ops.ell import coo_to_ell
    from bathymetric_gnn_tpu.ops.ell_banded import NEG_BIG, band_ell
    from bathymetric_gnn_tpu.ops.pallas.ell_gat_fused import (
        ell_gat_fused_pallas, ell_gat_fused_wide_pallas)

    n, k, h = args.nodes, args.k, args.heads
    c = args.hc // h
    hc = args.hc
    cd = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rg = np.random.default_rng(0)
    side = int(np.sqrt(n))
    depth = (30 + 6 * np.sin(np.arange(side) / 11)[None, :]
             + 4 * np.cos(np.arange(side) / 9)[:, None]
             + rg.normal(0, 0.05, (side, side))).astype(np.float32)
    gb = GraphBuilder(GraphConfig(knn_k=k), BucketConfig(node_buckets=(n,)))
    bg = gb.build_graph(depth, np.ones((side, side), bool))
    g = coo_to_ell(bg.graph, max_degree=k)
    banded = band_ell(g, band_rows=args.band)
    n_edges = int(np.asarray(g.nbr_mask).sum())
    n_pad = g.num_nodes_padded

    xh = jnp.asarray(rg.normal(size=(n_pad, h, c)).astype(np.float32) * 0.3
                     ).astype(cd)
    a_cat = jnp.asarray(
        rg.normal(size=(hc, 2 * h)).astype(np.float32) * 0.05)
    m_edge = jnp.asarray(
        rg.normal(size=(g.edge_attr.shape[-1], h)).astype(np.float32) * 0.1)
    negmask_t = jnp.repeat(
        jnp.where(banded.loc_t < 0, jnp.float32(NEG_BIG), 0.0), h, axis=0)
    el_t = (jnp.einsum("kfn,fh->khn", banded.eattr_t, m_edge)
            .reshape(k * h, n_pad) + negmask_t)
    el_self_t = jnp.zeros((h, n_pad), jnp.float32)

    dropout_masks = None
    if args.dropout:
        dropout_masks = make_banded_dropout_masks(
            jax.random.PRNGKey(0), 0.1, n_pad, k, h,
            banded.spill_dst_local_b.shape, wide=args.kernel == "wide")
    t_count = n_pad // args.band
    el_w_b = (jnp.einsum("tfl,fh->thl", banded.eattr_wide_t, m_edge)
              + banded.negmask_wide[:, None, :])

    # attention dots as conv_ell computes them
    def dots(xh_in):
        x2 = xh_in.reshape(n_pad, hc)
        a_src = (x2 @ a_cat[:, :h].astype(x2.dtype)).astype(jnp.float32)
        a_dst = (x2 @ a_cat[:, h:].astype(x2.dtype)).astype(jnp.float32)
        return a_src, a_dst

    cd_name = "bfloat16" if args.dtype == "bf16" else "float32"

    def layer1(xh_in, li, seed_val):
        dms = dropout_masks
        elw = el_w_b
        elt = el_t if args.kernel != "wide" else None
        if args.fresh_streams:
            # regenerate streams per step like the in-model path does
            m_e = m_edge * (1.0 + 1e-6 * seed_val)
            elw = (jnp.einsum("tfl,fh->thl", banded.eattr_wide_t, m_e)
                   + banded.negmask_wide[:, None, :])
            if args.dropout:
                dms = make_banded_dropout_masks(
                    jax.random.fold_in(jax.random.PRNGKey(0),
                                       seed_val + li), 0.1, n_pad, k, h,
                    banded.spill_dst_local_b.shape,
                    wide=args.kernel == "wide")
        if args.kernel == "wide":
            return ell_gat_fused_wide_pallas(
                xh_in, a_cat, elw + 0.001 * li, el_self_t, m_edge,
                banded, compute_dtype=cd_name, dropout_masks=dms)
        a_src, a_dst = dots(xh_in)
        return ell_gat_fused_pallas(
            xh_in, a_src, a_dst, a_cat, elt + 0.001 * li, el_self_t,
            m_edge, banded, compute_dtype=cd_name, dropout_masks=dms)

    def layer(xh_in):
        seed_val = (xh_in.reshape(-1)[0] * 0).astype(jnp.int32)
        y = layer1(xh_in, 0, seed_val)
        for li in range(1, args.layers):
            y = layer1(y.reshape(n_pad, h, c), li, seed_val)
        return y

    out = {"backend": jax.default_backend(), "edges": n_edges,
           "band": args.band, "hc": hc, "dtype": args.dtype,
           "dropout": bool(args.dropout)}

    what = args.what.split(",")

    if args.profile:
        import glob
        import gzip
        import tempfile
        from collections import defaultdict

        iters = 12
        if "bwd" in what:
            def loss(z):
                return jnp.sum(layer(z).astype(jnp.float32) ** 2)

            body_fn = lambda z: (z + 1e-10 * jax.grad(loss)(z)).astype(cd)
        else:
            body_fn = lambda z: (z.reshape(n_pad, hc) + 1e-20 * layer(z)
                                 ).reshape(n_pad, h, c).astype(cd)

        @jax.jit
        def run(z):
            def body(zc, _):
                return body_fn(zc), ()

            return jax.lax.scan(body, z, None, length=iters)[0]

        jax.block_until_ready(run(xh))
        trace_dir = tempfile.mkdtemp(prefix="prof_ell_")
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(run(xh))
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
        print(f"# total leaf device us/iter: {total / iters:.1f}")
        for name, (dur, cnt) in sorted(spans.items(),
                                       key=lambda kv: -kv[1][0]
                                       )[:args.top]:
            print(f"{dur / iters:9.1f} us/iter  x{cnt:4d}  {name[:110]}")
        return
    if "fwd" in what:
        def step_f(xh_in):
            y = layer(xh_in)
            return (xh_in.reshape(n_pad, hc) + 1e-20 * y).reshape(
                n_pad, h, c).astype(cd)

        s = marginal_time(step_f, xh)
        out["fwd_ms"] = round(s * 1e3, 3)
        out["fwd_Medges_per_s"] = round(n_edges / s / 1e6, 1)

    if "bwd" in what:
        def step_b(xh_in):
            def loss(z):
                return jnp.sum(layer(z).astype(jnp.float32) ** 2)

            gx = jax.grad(loss)(xh_in)
            return (xh_in + 1e-10 * gx).astype(cd)

        s = marginal_time(step_b, xh)
        out["fwdbwd_ms"] = round(s * 1e3, 3)
        out["fwdbwd_Medges_per_s"] = round(n_edges / s / 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
