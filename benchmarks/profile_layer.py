"""Per-fusion device-time breakdown of ONE fused grid-GAT layer fwd+bwd.

Traces the same jitted step as kernel_iter_bench and prints every XLA
fusion / custom-call span on the device track with its per-iteration
mean, so kernel-vs-glue composition claims are measured, not estimated.

Usage: python benchmarks/profile_layer.py [--what bwd|fwd] [--dropout rng]
"""

import argparse
import glob
import gzip
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS = 12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--dropout", default="rng",
                    choices=["none", "rng", "streamed"])
    ap.add_argument("--what", default="bwd", choices=["fwd", "bwd"])
    ap.add_argument("--top", type=int, default=28)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bathymetric_gnn_tpu.ops.edges import offsets_for_connectivity
    from bathymetric_gnn_tpu.ops.pallas.grid_gat_fused import fused_grid_gat

    h = w = args.tile
    heads, c = 4, 64
    hc = heads * c
    f_in = hc
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
    nbr[:, 0, :] = 0.0
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
                              valid, bias, dmask, conn, 0.2, True, 16, None,
                              cd, drop_seed, keep_prob)

    if args.what == "fwd":
        @jax.jit
        def run(x):
            def body(xc, _):
                return (xc + 1e-20 * layer(xc)).astype(cd), ()
            return jax.lax.scan(body, x, None, length=ITERS)[0]
    else:
        def loss(x):
            return jnp.sum(layer(x).astype(jnp.float32) ** 2)

        @jax.jit
        def run(x):
            def body(xc, _):
                return (xc + 1e-12 * jax.grad(loss)(xc)).astype(cd), ()
            return jax.lax.scan(body, x, None, length=ITERS)[0]

    float(jnp.sum(run(x0)))  # compile
    trace_dir = tempfile.mkdtemp(prefix="prof_layer_")
    with jax.profiler.trace(trace_dir):
        float(jnp.sum(run(x0)))

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)
    pid_names = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    # take only LEAF spans on the device track (fusions/kernels), skip the
    # enclosing jit_run module span
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
    print(f"# total leaf device us/iter: {total / ITERS:.1f}")
    for name, (dur, cnt) in sorted(spans.items(), key=lambda kv: -kv[1][0]
                                   )[:args.top]:
        print(f"{dur / ITERS:9.1f} us/iter  x{cnt:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
