"""Benchmark: flagship GAT end-to-end forward throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full dense-grid pipeline on a 256x256 tile — on-device
featurization + 4-layer/64-hidden/4-head GAT with the fused Pallas layer
kernel — in edges/s.

Timing methodology (benchmarks/RESULTS.md): data-dependent chained
iterations inside ONE compiled lax.scan, ending in a host-fetched
checksum — un-fakeable (every iteration feeds the next; the fetch forces
completion). Two scan lengths are timed and the MARGINAL per-iteration
cost reported: the remote-tunnel runtime adds a fixed ~20 ms
dispatch+fetch cost per execution that has nothing to do with the chip;
the marginal cost equals the profiler-reported device busy time
(validated 2026-08-19: marginal 1.41 ms/iter vs 1.40 ms/iter device).

The reference publishes no throughput numbers (BASELINE.md);
``vs_baseline`` is measured against NOMINAL_EDGES_PER_S = 1e8 edges/s, a
fixed yardstick chosen at round 1 so cross-round progress is comparable.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

NOMINAL_EDGES_PER_S = 1.0e8

TILE = 256          # 256x256 tile -> 65536 nodes, ~783k live edges
LAYERS = 4          # flagship: 4-layer GAT, 64 hidden, 4 heads
ITERS_SHORT = 20    # two-point marginal timing (see module docstring)
ITERS_LONG = 220


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
    from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN

    h = w = TILE
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 30.0 + 0.05 * xx + 0.02 * yy + 0.5 * np.sin(xx / 7.0)
    valid = np.ones((h, w), bool)
    num_edges = 2 * (h - 1) * w + 2 * h * (w - 1) + 4 * (h - 1) * (w - 1)

    # flagship TPU serving mode: fused Pallas layers with bf16 HBM streams
    # (f32 softmax/accumulation in-kernel; class/confidence parity vs f32
    # verified in tests/test_pallas_fused.py::TestFusedBf16)
    on_tpu = jax.default_backend() == "tpu"
    model = GridBathymetricGNN(hidden_channels=64, num_layers=LAYERS, heads=4,
                               use_pallas=on_tpu,
                               compute_dtype="bfloat16" if on_tpu
                               else "float32")

    feats, v, nbr, eattr, _ = build_grid_inputs(base, valid)
    variables = model.init(jax.random.PRNGKey(0), feats, v, nbr, eattr)

    def make_scan(n_iters):
        @jax.jit
        def scan_steps(depth, valid):
            def body(d, _):
                f, v_, n_, e_, _ = build_grid_inputs(d, valid)
                out = model.apply(variables, f, v_, n_, e_)["class_logits"]
                # data-dependent chain: next input depends on this output
                return d + 1e-20 * out[:, :, 0], ()

            d, _ = jax.lax.scan(body, depth, None, length=n_iters)
            return d

        return scan_steps

    d0 = jax.device_put(jnp.asarray(base))
    vj = jax.device_put(valid)
    short, long_ = make_scan(ITERS_SHORT), make_scan(ITERS_LONG)
    float(jnp.sum(short(d0, vj)))   # compile + settle
    float(jnp.sum(long_(d0, vj)))

    t_short, t_long = [], []
    for _ in range(3):              # best-of-3 guards tunnel transients
        t0 = time.perf_counter()
        float(jnp.sum(short(d0, vj)))   # fetch forces the whole chain
        t_short.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jnp.sum(long_(d0, vj)))
        t_long.append(time.perf_counter() - t0)
    # marginal per-iteration cost = device time (fixed dispatch+fetch
    # overhead of the remote tunnel cancels)
    dt = (min(t_long) - min(t_short)) / (ITERS_LONG - ITERS_SHORT)

    edges_per_s = num_edges * LAYERS / dt
    print(json.dumps({
        "metric": "grid_gat_e2e_forward_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / NOMINAL_EDGES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
