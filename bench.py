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

The same JSON line also carries the TRAINING headline (BASELINE names
"fwd/bwd"): ``train_step_edges_per_s`` — one full train step (on-device
featurization, Pallas fwd+bwd GAT kernels, 5-component loss, AdamW,
attention dropout 0.1 active) measured as PROFILER DEVICE BUSY TIME per
step (scan-marginal and profiler agree to 0.2%, RESULTS.md; the scan
variant's Mosaic compile takes ~25 min for the fwd+bwd body, so the
profiler path keeps bench.py driver-friendly).
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


def _train_step_device_time(base, valid, num_edges):
    """Profiler-measured device seconds per full train step (fwd+bwd)."""
    import glob
    import gzip
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bathymetric_gnn_tpu.config.constants import (CLASS_NOISE,
                                                      CORRECTION_NORM_CAP,
                                                      CORRECTION_NORM_FLOOR)
    from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
    from bathymetric_gnn_tpu.models.grid_batched import BatchedGridGNN
    from bathymetric_gnn_tpu.training import losses as L

    # flagship TPU training mode mirrors the forward headline: bf16 kernel
    # I/O + bf16 backward-kernel matmul inputs (f32 softmax recompute,
    # f32 master weights in optax; grad parity vs f32/torch in
    # tests/test_pallas_fused.py and tests/test_model.py::TestMaskedBNLowp)
    on_tpu = jax.default_backend() == "tpu"
    model = BatchedGridGNN(hidden_channels=64, num_layers=LAYERS, heads=4,
                           dropout=0.1, use_pallas=on_tpu,
                           compute_dtype="bfloat16" if on_tpu
                           else "float32")
    rng = np.random.default_rng(0)
    noisy = base + rng.normal(0, 0.1, base.shape).astype(np.float32)
    labels = (rng.random(base.shape) < 0.2).astype(np.int32) * 2
    batch = {
        "noisy": jnp.asarray(noisy)[None],
        "valid": jnp.asarray(valid)[None],
        "labels": jnp.asarray(labels)[None],
        "raw_correction": jnp.asarray((noisy - base).astype(np.float32)
                                      )[None],
    }
    cw = jnp.ones(3)

    def prepare(n_, v_):
        return jax.vmap(lambda d, v: build_grid_inputs(d, v))(n_, v_)

    feats, v, nbr, eattr, _ = prepare(batch["noisy"], batch["valid"])
    variables = model.init(jax.random.PRNGKey(0), feats, v, nbr, eattr)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-3, weight_decay=1e-4))

    def loss_fn(p, bs, rng_):
        f_, v_, n_, e_, lstd = prepare(batch["noisy"], batch["valid"])
        out, upd = model.apply(
            {"params": p, "batch_stats": bs}, f_, v_, n_, e_,
            deterministic=False, rngs={"dropout": rng_},
            mutable=["batch_stats"])
        denom = jnp.maximum(lstd, CORRECTION_NORM_FLOOR)
        corr_t = jnp.clip(batch["raw_correction"] / denom,
                          -CORRECTION_NORM_CAP, CORRECTION_NORM_CAP)
        outputs = {k: (o.reshape(-1, o.shape[-1])
                       if k in ("class_logits", "class_probs")
                       else o.reshape(-1)) for k, o in out.items()}
        lab = batch["labels"].reshape(-1)
        targets = {"labels": lab, "correction": corr_t.reshape(-1),
                   "noise_mask": lab == CLASS_NOISE}
        return L.combined_loss(outputs, targets, batch["valid"].reshape(-1),
                               class_weights=cw)["total"], upd["batch_stats"]

    @jax.jit
    def step(p, bs, o, rng_):
        (_, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, bs, rng_)
        updates, no = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), nbs, no

    from bathymetric_gnn_tpu.training.trainer import make_dropout_key

    key = make_dropout_key(0)  # production default (rbg on TPU)
    p, bs = variables["params"], variables.get("batch_stats", {})
    o = tx.init(p)
    for i in range(2):  # compile + settle
        p, bs, o = step(p, bs, o, jax.random.fold_in(key, i))
    jax.block_until_ready(p)

    n_steps = 8
    trace_dir = tempfile.mkdtemp(prefix="bench_train_trace_")
    try:
        with jax.profiler.trace(trace_dir):
            for i in range(n_steps):
                p, bs, o = step(p, bs, o, jax.random.fold_in(key, 10 + i))
            jax.block_until_ready(p)

        files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
        if not files:
            return None
        import json as _json

        with gzip.open(sorted(files)[-1], "rt") as f:
            tr = _json.load(f)
    finally:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)
    pid_names = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    # the device track NESTS events (jit_step -> module spans -> fusions/
    # kernels); summing everything multi-counts ~3x. The top-level
    # `jit_step(...)` spans are the executable's device occupancy — they
    # match scan-marginal timing to 0.3% (validated 2026-08-21).
    total_us = 0.0
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        if not ev.get("name", "").startswith("jit_step"):
            continue
        total_us += ev.get("dur", 0)
    if total_us <= 0:
        return None
    return total_us / 1e6 / n_steps


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

    result = {
        "metric": "grid_gat_e2e_forward_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / NOMINAL_EDGES_PER_S, 4),
    }
    try:
        t_step = _train_step_device_time(base, valid, num_edges)
    except Exception as e:  # the forward headline must still print
        import traceback

        print(f"# train_step bench failed: {e!r}", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)
        t_step = None
    if t_step:
        result["train_step_edges_per_s"] = round(
            num_edges * LAYERS / t_step, 1)
        result["train_step_ms"] = round(t_step * 1e3, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
