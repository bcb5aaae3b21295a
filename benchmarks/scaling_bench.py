"""Multi-device scaling benchmark for the halo-sharded grid model.

Measures edges/s for the row-sharded forward at 1, 2, 4, ... devices
(BASELINE: >=80% edges/s efficiency multi-chip). On real pods the devices
are TPU chips over ICI; in this environment it also runs on virtual CPU
devices to validate the harness (perf numbers only meaningful on real
hardware).

Run: python benchmarks/scaling_bench.py [--height 1024] [--width 512]
     [--devices 8 --virtual-cpu]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--devices", type=int, default=0,
                    help="max devices (0 = all available)")
    ap.add_argument("--virtual-cpu", action="store_true",
                    help="force 8 virtual CPU devices (harness validation)")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    if args.virtual_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")

    import jax

    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
    from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN
    from bathymetric_gnn_tpu.parallel.halo import (HaloGridGNN,
                                                   make_sharded_grid_forward)
    from bathymetric_gnn_tpu.parallel.mesh import (initialize_distributed,
                                                   make_mesh)

    # pod-ready: on a multi-host slice each host runs this script once
    # (e.g. via the TPU VM launcher); initialize_distributed() is a no-op
    # single-process
    dist = initialize_distributed()
    if dist["processes"] > 1 and jax.process_index() == 0:
        print(f"# multi-host: {dist}", file=sys.stderr)

    n_avail = len(jax.devices())
    max_dev = args.devices or n_avail
    h, w = args.height, args.width
    rg = np.random.default_rng(0)
    depth = (30 + rg.normal(0, 0.5, (h, w))).astype(np.float32)
    valid = np.ones((h, w), bool)
    n_edges = 2 * (h - 1) * w + 2 * h * (w - 1) + 4 * (h - 1) * (w - 1)

    model = HaloGridGNN(hidden_channels=args.hidden, num_layers=args.layers,
                        heads=4, dropout=0.0)
    # init via the single-device twin (identical parameter tree)
    twin = GridBathymetricGNN(hidden_channels=args.hidden,
                              num_layers=args.layers, heads=4, dropout=0.0)
    f0, v0, n0, e0, _ = build_grid_inputs(depth[:64], valid[:64])
    vs = twin.init(jax.random.PRNGKey(0), f0, v0, n0, e0)

    results = {"device_kind": str(jax.devices()[0]).split(":")[0],
               "grid": [h, w], "runs": []}
    base_rate = None
    nd = 1
    while nd <= max_dev:
        if h % nd != 0:
            nd *= 2
            continue
        mesh = make_mesh(nd, graph_axis=nd)
        fwd = make_sharded_grid_forward(model, mesh)
        out = fwd(vs, jnp.asarray(depth), jnp.asarray(valid))
        jax.block_until_ready(out)
        times = []
        for i in range(args.iters):
            d = jnp.asarray(depth + i * 1e-3)
            t0 = time.perf_counter()
            jax.block_until_ready(fwd(vs, d, jnp.asarray(valid)))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        rate = n_edges * args.layers / dt
        if base_rate is None:
            base_rate = rate
        results["runs"].append({
            "devices": nd,
            "ms": round(dt * 1e3, 2),
            "Gedges_per_s": round(rate / 1e9, 3),
            "efficiency_pct": round(100 * rate / (base_rate * nd), 1),
        })
        nd *= 2

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
