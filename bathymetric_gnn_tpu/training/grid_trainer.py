"""Training on the flagship dense-grid path: [B, H, W] tile stacks.

Grid training runs the whole step on device — featurization, batched
shifted-window GAT, masked losses — with no per-tile graph construction in
the input pipeline at all (the host only slices clean tiles and adds
noise). This is the fast path for tile-shaped training data; the COO
Trainer remains for arbitrary graphs.

Checkpoints record param_layout='grid'; the inference pipeline consumes
them without translation.
"""

from __future__ import annotations

import json
import logging
import time
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.config import Config
from ..config.constants import (CLASS_NOISE, CORRECTION_NORM_CAP,
                                CORRECTION_NORM_FLOOR)
from ..data.graph_build import build_grid_inputs
from ..data.synthetic_noise import NoiseAugmentor, SyntheticNoiseGenerator
from ..data.tiling import TileManager
from ..models.grid_batched import BatchedGridGNN
from . import losses as L
from .datasets import normalize_correction
from .trainer import PlateauScheduler, TrainState, cosine_warm_restarts

logger = logging.getLogger(__name__)


class SyntheticGridDataset:
    """Clean tiles + synthetic noise, yielding raw grids (no graphs)."""

    def __init__(
        self,
        clean_grids: Sequence[np.ndarray],
        config: Optional[Config] = None,
        tile_size: int = 256,
        overlap: int = 32,
        min_valid_ratio: float = 0.3,
        seed: int = 0,
    ):
        self.config = config or Config()
        self.tm = TileManager(tile_size, overlap, min_valid_ratio)
        self.tile_size = tile_size
        gen = SyntheticNoiseGenerator(self.config.synthetic_noise, seed=seed)
        self.augmentor = NoiseAugmentor(gen, seed=seed + 1)
        self.tiles: List[np.ndarray] = []
        for grid in clean_grids:
            for t in self.tm.iterate_tiles(np.asarray(grid, np.float32)):
                if t.shape == (tile_size, tile_size):
                    self.tiles.append(t.data.copy())
        logger.info("SyntheticGridDataset: %d tiles", len(self.tiles))

    def __len__(self):
        return len(self.tiles)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        clean = self.tiles[idx]
        valid = np.isfinite(clean)
        lbl = self.augmentor(clean, valid)
        return {
            "noisy": np.nan_to_num(lbl.noisy_depth).astype(np.float32),
            "valid": valid,
            "labels": lbl.classification.astype(np.int32),
            "raw_correction": (lbl.noisy_depth - lbl.clean_depth
                               ).astype(np.float32),
        }

    def class_counts(self, sample_limit: int = 50) -> np.ndarray:
        rg = np.random.default_rng(0)
        counts = np.zeros(3, np.int64)
        for i in rg.choice(len(self), min(sample_limit, len(self)), False):
            s = self[int(i)]
            counts += np.bincount(s["labels"][s["valid"]], minlength=3)[:3]
        return counts


class GroundTruthGridDataset:
    """5-band GT rasters -> raw training grids (labels/diff/noisy/unc)."""

    def __init__(self, gt_files: Sequence[str], tile_size: int = 256,
                 overlap: int = 32, min_valid_ratio: float = 0.1):
        from ..io.loaders import read_raster_bands

        self.tm = TileManager(tile_size, overlap, min_valid_ratio)
        self.tile_size = tile_size
        self._read = read_raster_bands
        self.index: List[Tuple[str, object]] = []
        for path in gt_files:
            bands, _ = self._read(path, bands=[1])
            labels = bands[0]
            _, _, specs = self.tm.compute_tile_grid(labels.shape)
            for spec in specs:
                if spec.shape != (tile_size, tile_size):
                    continue
                sl = np.s_[spec.row_start:spec.row_end,
                           spec.col_start:spec.col_end]
                if (labels[sl] >= 0).mean() >= self.tm.min_valid_ratio:
                    self.index.append((path, spec))
        logger.info("GroundTruthGridDataset: %d tiles", len(self.index))

    def __len__(self):
        return len(self.index)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        path, spec = self.index[idx]
        bands, _ = self._read(path)
        sl = np.s_[spec.row_start:spec.row_end, spec.col_start:spec.col_end]
        labels = bands[0][sl]
        valid = labels >= 0
        return {
            "noisy": np.nan_to_num(bands[2][sl]).astype(np.float32),
            "valid": valid,
            "labels": np.maximum(labels, 0).astype(np.int32),
            "raw_correction": np.nan_to_num(bands[1][sl]).astype(np.float32),
        }

    def class_counts(self, sample_limit: int = 50) -> np.ndarray:
        counts = np.zeros(3, np.int64)
        for i in range(min(sample_limit, len(self))):
            s = self[i]
            counts += np.bincount(s["labels"][s["valid"]], minlength=3)[:3]
        return counts


def collate_grids(samples: Sequence[Dict[str, np.ndarray]]
                  ) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class GridTrainer:
    """Trainer over the batched dense-grid model."""

    def __init__(
        self,
        config: Config,
        train_dataset,
        val_dataset=None,
        output_dir: str = "checkpoints_grid",
        resolution: Tuple[float, float] = (1.0, 1.0),
    ):
        self.config = config
        mc = config.model
        self.model = BatchedGridGNN(
            hidden_channels=mc.hidden_channels, num_layers=mc.num_layers,
            heads=mc.heads, num_classes=mc.num_classes, dropout=mc.dropout,
            predict_correction=mc.predict_correction,
            feature_extractor_layers=mc.feature_extractor_layers,
            edge_dim=3, connectivity=config.graph.connectivity,
            compute_dtype=mc.compute_dtype,
            # matches inference (inference/pipeline.py): the Pallas fwd+bwd
            # kernels are the default TPU training path since round 3 (the
            # grad-parity suite in tests/test_pallas_fused.py soaked a full
            # round); "off" forces the XLA formulation
            use_pallas=(getattr(mc, "use_pallas", "auto") == "on") or (
                getattr(mc, "use_pallas", "auto") == "auto"
                and jax.default_backend() == "tpu"),
        )
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.resolution = resolution
        tc = config.training
        self.rng = np.random.default_rng(tc.seed)
        from .trainer import make_dropout_key
        self.jax_rng = make_dropout_key(tc.seed,
                                        getattr(tc, 'rng_impl', 'auto'))

        if getattr(tc, "class_weights", None) is not None:
            if len(tc.class_weights) != mc.num_classes:
                raise ValueError(
                    f"training.class_weights has {len(tc.class_weights)}"
                    f" entries but model.num_classes is {mc.num_classes}")
            cw = np.asarray(tc.class_weights, np.float32)
        else:
            try:
                cw = L.compute_class_weights(train_dataset.class_counts())
            except Exception:
                logger.exception("class-count estimation failed")
                cw = np.ones(mc.num_classes, np.float32)
        self.class_weights = jnp.asarray(cw)
        self.huber_delta = 1.0

        self.optimizer = optax.chain(
            optax.clip_by_global_norm(tc.grad_clip_norm),
            optax.inject_hyperparams(optax.adamw)(
                learning_rate=tc.learning_rate, weight_decay=tc.weight_decay
            ),
        )
        self.plateau = PlateauScheduler(tc.learning_rate)
        self.history: Dict[str, list] = {"train_loss": [], "val_loss": [],
                                         "train_acc": [], "val_acc": [],
                                         "lr": []}
        self._build_steps()

    # -- jitted steps ------------------------------------------------------

    def _build_steps(self):
        tc = self.config.training
        model = self.model
        cw = self.class_weights
        delta = self.huber_delta
        conn = self.config.graph.connectivity
        res = (float(self.resolution[0]), float(self.resolution[1]))

        def prepare(noisy, valid):
            def one(d, v):
                return build_grid_inputs(d, v, resolution=res,
                                         connectivity=conn)
            return jax.vmap(one)(noisy, valid)

        def loss_fn(params, batch_stats, batch, dropout_rng, train):
            feats, v, nbr, eattr, local_std = prepare(batch["noisy"],
                                                      batch["valid"])
            variables = {"params": params, "batch_stats": batch_stats}
            if train:
                out, upd = model.apply(
                    variables, feats, v, nbr, eattr, deterministic=False,
                    rngs={"dropout": dropout_rng}, mutable=["batch_stats"],
                )
                new_bs = upd["batch_stats"]
            else:
                out = model.apply(variables, feats, v, nbr, eattr)
                new_bs = batch_stats

            # normalized correction targets on device (SURVEY Q6)
            denom = jnp.maximum(local_std, CORRECTION_NORM_FLOOR)
            corr_t = jnp.clip(batch["raw_correction"] / denom,
                              -CORRECTION_NORM_CAP, CORRECTION_NORM_CAP)
            flat = lambda a: a.reshape(-1)
            outputs = {k: (v_.reshape(-1, v_.shape[-1])
                           if k in ("class_logits", "class_probs")
                           else flat(v_))
                       for k, v_ in out.items()}
            labels = flat(batch["labels"])
            targets = {
                "labels": labels,
                "correction": flat(corr_t),
                "noise_mask": labels == CLASS_NOISE,
            }
            node_mask = flat(batch["valid"])
            losses = L.combined_loss(
                outputs, targets, node_mask,
                class_weights=cw,
                classification_weight=tc.classification_weight,
                correction_weight=tc.correction_weight,
                confidence_weight=tc.confidence_weight,
                feature_preservation_weight=tc.feature_preservation_weight,
                shoal_safety_weight=tc.shoal_safety_weight,
                label_smoothing=tc.label_smoothing,
                correction_delta=delta,
            )
            m = node_mask.astype(jnp.float32)
            acc = jnp.sum((outputs["predicted_class"] == labels) * m
                          ) / jnp.maximum(jnp.sum(m), 1.0)
            return losses["total"], (losses, acc, new_bs)

        @jax.jit
        def train_step(state: TrainState, batch, rng, lr):
            (_, (losses, acc, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, rng, True)
            inj = state.opt_state[1]
            inj = inj._replace(
                hyperparams={**inj.hyperparams, "learning_rate": lr})
            updates, new_opt = self.optimizer.update(
                grads, (state.opt_state[0], inj), state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (TrainState(new_params, new_bs, new_opt, state.step + 1),
                    losses, acc)

        @jax.jit
        def eval_step(state: TrainState, batch):
            _, (losses, acc, _) = loss_fn(state.params, state.batch_stats,
                                          batch, jax.random.PRNGKey(0), False)
            return losses, acc

        self._train_step = train_step
        self._eval_step = eval_step
        self._prepare = prepare

    def init_state(self) -> TrainState:
        sample = collate_grids([self.train_dataset[0]])
        feats, v, nbr, eattr, _ = self._prepare(
            jnp.asarray(sample["noisy"]), jnp.asarray(sample["valid"]))
        variables = self.model.init(
            jax.random.PRNGKey(self.config.training.seed), feats, v, nbr,
            eattr)
        opt_state = self.optimizer.init(variables["params"])
        n = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(variables["params"]))
        logger.info("grid model initialized: %d params", n)
        return TrainState(variables["params"],
                          variables.get("batch_stats", {}), opt_state,
                          jnp.int32(0))

    # -- loop --------------------------------------------------------------

    def _batches(self, dataset, batch_size, shuffle=True):
        order = np.arange(len(dataset))
        if shuffle:
            self.rng.shuffle(order)
        for s in range(0, len(order) - batch_size + 1, batch_size):
            yield collate_grids([dataset[int(i)]
                                 for i in order[s:s + batch_size]])

    def train(self, resume: bool = False) -> TrainState:
        tc = self.config.training
        state = self.init_state()
        start_epoch, best_val, patience = 0, float("inf"), 0
        if resume:
            loaded = self.load_checkpoint(self.output_dir / "last", state)
            if loaded is not None:
                state, start_epoch, best_val = loaded

        epoch = start_epoch
        for epoch in range(start_epoch, tc.epochs):
            t0 = time.time()
            if tc.scheduler == "cosine_warm_restarts":
                lr = cosine_warm_restarts(epoch, tc.learning_rate,
                                          tc.cosine_t0, tc.cosine_t_mult)
            elif tc.scheduler == "plateau":
                lr = self.plateau.lr
            else:
                lr = tc.learning_rate
            tl = ta = 0.0
            nb = 0
            from ..utils.prefetch import prefetch_iterator

            for batch in prefetch_iterator(
                    self._batches(self.train_dataset, tc.batch_size)):
                self.jax_rng, sub = jax.random.split(self.jax_rng)
                state, losses, acc = self._train_step(
                    state, batch, sub, jnp.float32(lr))
                tl += float(losses["total"])
                ta += float(acc)
                nb += 1
            tl /= max(nb, 1)
            ta /= max(nb, 1)
            vl, va = self.evaluate(state)
            for k, v_ in (("train_loss", tl), ("val_loss", vl),
                          ("train_acc", ta), ("val_acc", va), ("lr", lr)):
                self.history[k].append(v_)
            logger.info("epoch %d: train %.4f/%.3f val %.4f/%.3f (%.1fs)",
                        epoch, tl, ta, vl, va, time.time() - t0)
            if tc.scheduler == "plateau":
                self.plateau.step(vl)
            if vl < best_val - tc.early_stop_min_delta:
                best_val = vl
                patience = 0
                self.save_checkpoint(state, epoch, best_val, "best")
            else:
                patience += 1
            self.save_checkpoint(state, epoch, best_val, "last")
            if patience >= tc.early_stop_patience:
                break
        self.save_checkpoint(state, epoch, best_val, "final")
        with open(self.output_dir / "history.json", "w") as f:
            json.dump(self.history, f)
        return state

    def evaluate(self, state) -> Tuple[float, float]:
        ds = self.val_dataset or self.train_dataset
        tot = acc = 0.0
        nb = 0
        for batch in self._batches(ds, self.config.training.batch_size,
                                   shuffle=False):
            losses, a = self._eval_step(state, batch)
            tot += float(losses["total"])
            acc += float(a)
            nb += 1
        return tot / max(nb, 1), acc / max(nb, 1)

    # -- checkpointing -----------------------------------------------------

    def save_checkpoint(self, state, epoch, best_val, name):
        import orbax.checkpoint as ocp

        ckpt = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "meta": {
                "epoch": epoch, "best_val": best_val,
                "param_layout": "grid",
                "correction_norm_floor": CORRECTION_NORM_FLOOR,
                "correction_norm_cap": CORRECTION_NORM_CAP,
                "class_weights": np.asarray(self.class_weights),
                "huber_delta": self.huber_delta,
            },
        }
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save((self.output_dir / name).absolute(), ckpt, force=True)
        self.config.save(self.output_dir / "config.yaml")

    def load_checkpoint(self, path, template_state):
        import orbax.checkpoint as ocp

        path = Path(path).absolute()
        if not path.exists():
            return None
        template = {
            "params": template_state.params,
            "batch_stats": template_state.batch_stats,
            "opt_state": template_state.opt_state,
            "step": template_state.step,
            "meta": {
                "epoch": 0, "best_val": 0.0, "param_layout": "grid",
                "correction_norm_floor": CORRECTION_NORM_FLOOR,
                "correction_norm_cap": CORRECTION_NORM_CAP,
                "class_weights": np.asarray(self.class_weights),
                "huber_delta": self.huber_delta,
            },
        }
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(path, item=template)
        state = TrainState(restored["params"], restored["batch_stats"],
                           restored["opt_state"],
                           jnp.int32(restored["step"]))
        meta = restored["meta"]
        return state, int(meta["epoch"]) + 1, float(meta["best_val"])
