"""Fast iteration harness for the fused grid-GAT Pallas kernels.

Times ONE mid-stack flagship layer (F=256 -> HC=256, heads=4, tile 256,
bf16 streams) forward-only and forward+backward, scan-marginal (see
bench.py methodology) so kernel work is isolated from model glue. Used to
iterate on the round-5 [batched-chain] kernel restructuring without
paying a full bench.py cycle per experiment.

Usage: python benchmarks/kernel_iter_bench.py [--tile 256] [--dropout rng]
       [--dtype bf16] [--what fwd,bwd]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS_SHORT = 10
ITERS_LONG = 60


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--dropout", default="rng",
                    choices=["none", "rng", "streamed"])
    ap.add_argument("--what", default="fwd,bwd")
    ap.add_argument("--block-rows", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bathymetric_gnn_tpu.ops.edges import offsets_for_connectivity
    from bathymetric_gnn_tpu.ops.pallas.grid_gat_fused import fused_grid_gat

    h = w = args.tile
    heads, c = 4, 64
    hc = heads * c
    f_in = hc  # mid-stack layer: F == HC == 256
    ed = 3
    conn = 8
    k = len(offsets_for_connectivity(conn))
    cd = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rg = np.random.default_rng(0)
    x0 = jnp.asarray(rg.normal(size=(h, w, f_in)).astype(np.float32) * 0.1
                     ).astype(cd)
    w_lin = jnp.asarray(rg.normal(size=(f_in, hc)).astype(np.float32) * 0.05)
    a_src = jnp.asarray(rg.normal(size=(hc, heads)).astype(np.float32) * 0.05)
    a_dst = jnp.asarray(rg.normal(size=(hc, heads)).astype(np.float32) * 0.05)
    m_edge = jnp.asarray(rg.normal(size=(ed, heads)).astype(np.float32) * 0.1)
    eattr = jnp.asarray(rg.normal(size=(k, h, w, ed)).astype(np.float32))
    nbr = np.ones((k, h, w), np.float32)
    nbr[:, 0, :] = 0.0  # some invalid edges, like real tiles
    nbr = jnp.asarray(nbr)
    valid = jnp.ones((h, w), jnp.float32)
    bias = jnp.zeros(hc)

    drop_seed = (jnp.asarray([123, 456], jnp.int32)
                 if args.dropout == "rng" else None)
    keep_prob = 0.9 if args.dropout == "rng" else 1.0
    if args.dropout == "streamed":
        keep = jax.random.bernoulli(jax.random.PRNGKey(0), 0.9,
                                    (k + 1, heads, h, w))
        dmask = keep.astype(jnp.float32) / 0.9
    else:
        dmask = None

    def layer(x):
        return fused_grid_gat(x, w_lin, a_src, a_dst, m_edge, eattr, nbr,
                              valid, bias, dmask, conn, 0.2, True, args.block_rows, None,
                              cd, drop_seed, keep_prob)

    results = {"tile": args.tile, "dtype": args.dtype,
               "dropout": args.dropout, "block_rows": args.block_rows}

    def marginal(make_fn, tag):
        fns = {n: make_fn(n) for n in (ITERS_SHORT, ITERS_LONG)}
        for f in fns.values():
            float(jnp.sum(f(x0)))  # compile + settle
        ts, tl = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(fns[ITERS_SHORT](x0)))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(fns[ITERS_LONG](x0)))
            tl.append(time.perf_counter() - t0)
        dt = (min(tl) - min(ts)) / (ITERS_LONG - ITERS_SHORT)
        results[tag + "_us"] = round(dt * 1e6, 1)

    what = args.what.split(",")
    if "fwd" in what:
        def make_fwd(n):
            @jax.jit
            def run(x):
                def body(xc, _):
                    out = layer(xc)
                    return (xc + 1e-20 * out).astype(cd), ()
                xf, _ = jax.lax.scan(body, x, None, length=n)
                return xf
            return run
        marginal(make_fwd, "fwd")

    if "bwd" in what:
        def make_bwd(n):
            def loss(x):
                return jnp.sum(layer(x).astype(jnp.float32) ** 2)

            @jax.jit
            def run(x):
                def body(xc, _):
                    g = jax.grad(loss)(xc)
                    return (xc + 1e-12 * g).astype(cd), ()
                xf, _ = jax.lax.scan(body, x, None, length=n)
                return xf
            return run
        marginal(make_bwd, "fwd_bwd")
        if "fwd" in what:
            results["bwd_only_us"] = round(
                results["fwd_bwd_us"] - results["fwd_us"], 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
