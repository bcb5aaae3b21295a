"""Checkpoint migration CLI: reference .pt -> framework orbax checkpoint.

Allows users of the reference implementation to carry their trained models
over directly (activation parity guaranteed by tests/test_torch_import.py).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from .common import setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert a reference PyTorch checkpoint")
    p.add_argument("--input", required=True, help="reference .pt checkpoint")
    p.add_argument("--output-dir", required=True,
                   help="orbax checkpoint directory to create")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    setup_logging(args.verbose)

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from ..config.config import Config
    from ..config.constants import (CORRECTION_NORM_CAP,
                                    CORRECTION_NORM_FLOOR)
    from ..utils.torch_import import import_torch_checkpoint

    params, batch_stats, meta = import_torch_checkpoint(args.input)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    cfg = Config()
    cfg.model.num_layers = meta["num_layers"]
    cfg.model.gnn_type = meta["gnn_type"]
    cfg.model.hidden_channels = meta["hidden_channels"]
    cfg.model.heads = meta["heads"]
    cfg.save(out / "config.yaml")

    ckpt = {
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": {},
        "step": jnp.int32(0),
        "meta": {
            "epoch": 0,
            "best_val": float("nan"),
            "param_layout": "coo",
            "imported_from": str(args.input),
            "correction_norm_floor": CORRECTION_NORM_FLOOR,
            "correction_norm_cap": CORRECTION_NORM_CAP,
            "class_weights": np.ones(cfg.model.num_classes, np.float32),
            "huber_delta": 1.0,
        },
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save((out / "imported").absolute(), ckpt, force=True)
    n = sum(int(np.prod(np.asarray(v).shape))
            for v in _leaves(params))
    print(f"imported {n:,} parameters -> {out / 'imported'}")
    print(f"use with: --model {out / 'imported'}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
