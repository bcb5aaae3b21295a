"""Per-fusion device-time breakdown of the FULL flagship train step.

Same step as bench.py's _train_step_device_time (bf16 Pallas fwd+bwd,
5-component loss, AdamW, rng attention dropout), but prints the top
device spans so train-step composition claims are measured.

Usage: python benchmarks/profile_train_step.py [--top 30]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

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
    from bathymetric_gnn_tpu.training.trainer import make_dropout_key

    h = w = 256
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 30.0 + 0.05 * xx + 0.02 * yy + 0.5 * np.sin(xx / 7.0)
    valid = np.ones((h, w), bool)
    on_tpu = jax.default_backend() == "tpu"
    model = BatchedGridGNN(hidden_channels=64, num_layers=4, heads=4,
                           dropout=0.1, use_pallas=on_tpu,
                           compute_dtype="bfloat16" if on_tpu else "float32")
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

    key = make_dropout_key(0)
    p, bs = variables["params"], variables.get("batch_stats", {})
    o = tx.init(p)
    for i in range(2):
        p, bs, o = step(p, bs, o, jax.random.fold_in(key, i))
    jax.block_until_ready(p)

    n_steps = 8
    trace_dir = tempfile.mkdtemp(prefix="prof_train_")
    with jax.profiler.trace(trace_dir):
        for i in range(n_steps):
            p, bs, o = step(p, bs, o, jax.random.fold_in(key, 10 + i))
        jax.block_until_ready(p)

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)
    pid_names = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    spans = defaultdict(lambda: [0.0, 0])
    total_step = 0.0
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "")
        if name.startswith("jit_step"):
            total_step += ev.get("dur", 0)
            continue
        spans[name][0] += ev.get("dur", 0)
        spans[name][1] += 1
    print(f"# jit_step device us/step: {total_step / n_steps:.1f}")
    for name, (dur, cnt) in sorted(spans.items(), key=lambda kv: -kv[1][0]
                                   )[:args.top]:
        print(f"{dur / n_steps:9.1f} us/step  x{cnt:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
