"""Benchmark: flagship GAT end-to-end forward throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full dense-grid pipeline on a 256x256 tile — on-device
featurization + 4-layer/64-hidden/4-head GAT with the fused Pallas layer
kernel — in edges/s.

Timing methodology (benchmarks/RESULTS.md): chained iterations with a
host-fetched checksum at the end. On this remote TPU platform,
block_until_ready does not reliably wait and per-call timings include
transfer artifacts; only a data-dependent chain ending in a host fetch is
un-fakeable.

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
ITERS = 30


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

    @jax.jit
    def step(depth, valid):
        f, v_, n_, e_, _ = build_grid_inputs(depth, valid)
        out = model.apply(variables, f, v_, n_, e_)["class_logits"]
        # data-dependent chain: next input depends on this output
        return depth + 1e-20 * out[:, :, 0]

    d = jax.device_put(base)
    vj = jax.device_put(valid)
    d = step(d, vj)
    float(jnp.sum(d))  # compile + settle

    t0 = time.perf_counter()
    for _ in range(ITERS):
        d = step(d, vj)
    float(jnp.sum(d))  # forces completion of the whole chain
    dt = (time.perf_counter() - t0) / ITERS

    edges_per_s = num_edges * LAYERS / dt
    print(json.dumps({
        "metric": "grid_gat_e2e_forward_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / NOMINAL_EDGES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
