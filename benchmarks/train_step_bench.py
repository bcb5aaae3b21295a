"""Train-step (fwd+bwd+optimizer) throughput on the flagship grid model.

Measures the full GridTrainer-equivalent train step — on-device
featurization, 4-layer/64/4-head GAT forward, 5-component loss, backward,
AdamW update — in edges/s with the scan-marginal methodology (bench.py).

Usage: python benchmarks/train_step_bench.py [--tile 256] [--batch 1]
       [--dropout 0.1] [--pallas {auto,on,off}] [--dtype f32|bf16]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS_SHORT = 5
ITERS_LONG = 25


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--pallas", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
    from bathymetric_gnn_tpu.models.grid_batched import BatchedGridGNN
    from bathymetric_gnn_tpu.training import losses as L
    from bathymetric_gnn_tpu.config.constants import (
        CORRECTION_NORM_FLOOR, CORRECTION_NORM_CAP, CLASS_NOISE)

    h = w = args.tile
    use_pallas = (jax.default_backend() == "tpu" if args.pallas == "auto"
                  else args.pallas == "on")
    model = BatchedGridGNN(
        hidden_channels=64, num_layers=4, heads=4, dropout=args.dropout,
        use_pallas=use_pallas,
        compute_dtype="bfloat16" if args.dtype == "bf16" else "float32")

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 30.0 + 0.05 * xx + 0.02 * yy + 0.5 * np.sin(xx / 7.0)
    noisy = base + rng.normal(0, 0.1, base.shape).astype(np.float32)
    labels = (rng.random(base.shape) < 0.2).astype(np.int32) * 2
    valid = np.ones((h, w), bool)
    num_edges = (2 * (h - 1) * w + 2 * h * (w - 1) + 4 * (h - 1) * (w - 1)
                 ) * args.batch

    def stack(a):
        return jnp.asarray(np.stack([a] * args.batch))

    batch = {
        "noisy": stack(noisy), "valid": stack(valid),
        "labels": stack(labels),
        "raw_correction": stack((noisy - base).astype(np.float32)),
    }
    cw = jnp.ones(3)

    def prepare(noisy_, valid_):
        return jax.vmap(lambda d, v: build_grid_inputs(d, v))(noisy_, valid_)

    feats, v, nbr, eattr, _ = prepare(batch["noisy"], batch["valid"])
    variables = model.init(jax.random.PRNGKey(0), feats, v, nbr, eattr)
    params, batch_stats = variables["params"], variables.get(
        "batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-3, weight_decay=1e-4))
    opt_state = tx.init(params)

    def loss_fn(params_, bs, batch_, rng_):
        feats_, v_, nbr_, eattr_, lstd = prepare(batch_["noisy"],
                                                 batch_["valid"])
        out, upd = model.apply(
            {"params": params_, "batch_stats": bs}, feats_, v_, nbr_, eattr_,
            deterministic=args.dropout == 0.0, rngs={"dropout": rng_},
            mutable=["batch_stats"])
        denom = jnp.maximum(lstd, CORRECTION_NORM_FLOOR)
        corr_t = jnp.clip(batch_["raw_correction"] / denom,
                          -CORRECTION_NORM_CAP, CORRECTION_NORM_CAP)
        outputs = {k: (o.reshape(-1, o.shape[-1])
                       if k in ("class_logits", "class_probs")
                       else o.reshape(-1)) for k, o in out.items()}
        lab = batch_["labels"].reshape(-1)
        targets = {"labels": lab, "correction": corr_t.reshape(-1),
                   "noise_mask": lab == CLASS_NOISE}
        losses = L.combined_loss(outputs, targets,
                                 batch_["valid"].reshape(-1),
                                 class_weights=cw)
        return losses["total"], upd["batch_stats"]

    def train_step(carry, _):
        params_, bs, opt_state_, rng_ = carry
        rng_, sub = jax.random.split(rng_)
        (_, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params_, bs, batch, sub)
        updates, new_opt = tx.update(grads, opt_state_, params_)
        new_params = optax.apply_updates(params_, updates)
        return (new_params, new_bs, new_opt, rng_), ()

    def make(n):
        @jax.jit
        def run(carry):
            out, _ = jax.lax.scan(train_step, carry, None, length=n)
            return out
        return run

    carry0 = (params, batch_stats, opt_state, jax.random.PRNGKey(1))
    short, long_ = make(ITERS_SHORT), make(ITERS_LONG)
    c = short(carry0)
    jax.block_until_ready(c)
    c = long_(carry0)
    jax.block_until_ready(c)

    ts, tl = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(short(carry0))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(long_(carry0))
        tl.append(time.perf_counter() - t0)
    dt = (min(tl) - min(ts)) / (ITERS_LONG - ITERS_SHORT)

    print(json.dumps({
        "metric": "grid_gat_train_step_edges_per_s_per_chip",
        "tile": args.tile, "batch": args.batch, "dropout": args.dropout,
        "pallas": use_pallas, "dtype": args.dtype,
        "sec_per_step": round(dt, 6),
        "value": round(num_edges * 4 / dt, 1), "unit": "edges/s",
    }))


if __name__ == "__main__":
    main()
