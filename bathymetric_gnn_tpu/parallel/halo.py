"""Spatial (halo-exchange) partitioning of the dense-grid model.

Stage B of the distribution design (SURVEY §5 "long-context analogue",
BASELINE north star): one survey grid too large for a chip is row-sharded
across the mesh ``graph`` axis. Featurization exchanges a 3-row halo of
raw depth/valid once; each GNN layer then refreshes a 1-row halo of
activations via ``lax.ppermute`` over ICI — the ring-neighbor-exchange
analogue of sequence parallelism. BatchNorm moments are psum'd so results
are bitwise-equivalent in structure to the single-chip path (verified by
parity tests on a virtual mesh).

**Overlap (default)**: only the first and last local row of a shard
depend on the halo, so each layer is decomposed as

    launch ppermutes of the two boundary rows        (ICI, async)
    aggregate the full local block                   (compute, no halo dep)
    finish the 2 boundary rows from the landed halo  (two 3-row strip convs)

The interior aggregation has no data dependency on the collectives, so
XLA's latency-hiding scheduler runs the ppermutes concurrently with it on
real hardware (collective-permute-start/done pairs); the per-layer ICI
cost is hidden behind O(L·W) local work. Set ``overlap=False`` for the
serial exchange-then-aggregate formulation (identical math).

The reference has no distributed runtime at all (SURVEY §2.2); this module
is new TPU-native capability.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.grid_gat import GridGATConv
from ..models.layers import (ClassificationHead, ConfidenceHead,
                             CorrectionHead, MaskedBatchNorm,
                             MLPFeatureExtractor)

GRAPH_AXIS = "graph"


def _check_inject_opt_state(opt_state) -> None:
    """The halo train steps inject the learning rate into the optimizer
    state each step, which requires ``optimizer`` to be built as
    ``optax.chain(optax.clip_by_global_norm(...),
    optax.inject_hyperparams(...)(...))`` (the Trainer's construction).
    Any other structure would fail deep inside the traced step with an
    opaque AttributeError — fail loudly at trace time instead."""
    ok = (isinstance(opt_state, (tuple, list)) and len(opt_state) >= 2
          and hasattr(opt_state[1], "hyperparams")
          and "learning_rate" in getattr(opt_state[1], "hyperparams", {}))
    if not ok:
        raise TypeError(
            "halo train steps require optimizer = optax.chain(clip, "
            "inject_hyperparams(opt)(learning_rate=...)); got an opt_state "
            f"of structure {jax.tree_util.tree_structure(opt_state)} with "
            "no injectable 'learning_rate' at opt_state[1]")


def halo_rows_split(x: jax.Array, halo: int,
                    axis_name: str = GRAPH_AXIS):
    """Fetch neighbor boundary rows: (from_above, from_below), each
    [halo, ...]. Missing neighbors (global borders) contribute zeros
    (masked out downstream by the validity halo)."""
    n = jax.lax.axis_size(axis_name)
    down_perm = [(i, i + 1) for i in range(n - 1)]  # send towards larger idx
    up_perm = [(i + 1, i) for i in range(n - 1)]
    from_above = jax.lax.ppermute(x[-halo:], axis_name, down_perm)
    from_below = jax.lax.ppermute(x[:halo], axis_name, up_perm)
    return from_above, from_below


def exchange_halo_rows(x: jax.Array, halo: int,
                       axis_name: str = GRAPH_AXIS) -> jax.Array:
    """Extend local rows [L, ...] to [L+2*halo, ...] with neighbor rows.

    Device d receives the last `halo` interior rows of d-1 above and the
    first `halo` rows of d+1 below; missing neighbors contribute zeros
    (masked out downstream by the validity halo).
    """
    from_above, from_below = halo_rows_split(x, halo, axis_name)
    return jnp.concatenate([from_above, x, from_below], axis=0)


class HaloGridGNN(nn.Module):
    """Row-sharded flagship model. Parameter layout matches
    GridBathymetricGNN exactly (same submodule names), so single-chip
    checkpoints run multi-chip unchanged. Must be applied inside
    shard_map over the ``graph`` mesh axis."""

    hidden_channels: int = 64
    num_layers: int = 4
    heads: int = 4
    num_classes: int = 3
    dropout: float = 0.1
    predict_correction: bool = True
    feature_extractor_layers: int = 2
    edge_dim: Optional[int] = 3
    connectivity: int = 8
    axis_name: str = GRAPH_AXIS
    overlap: bool = True          # hide per-layer halo ICI behind compute
    use_pallas: bool = False      # fused Pallas kernel for the interior block
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        depth_local: jax.Array,   # [L, W] this shard's rows
        valid_local: jax.Array,   # [L, W] bool
        resolution: Tuple[float, float] = (1.0, 1.0),
        deterministic: bool = True,
        use_running_average: Optional[bool] = None,
    ) -> Dict[str, jax.Array]:
        from ..data.graph_build import build_grid_inputs

        if use_running_average is None:
            use_running_average = deterministic
        ax = self.axis_name
        halo_feat = 4  # 5x5 stats (2) + gradient/curvature (1) + one
        # extra ring so halo-row features (consumed by layer 0) are exact
        # even where boundary-filled cells feed gradients

        # --- featurization on a halo-extended block, then trim -----------
        d_ext = exchange_halo_rows(depth_local, halo_feat, ax)
        v_ext = exchange_halo_rows(valid_local, halo_feat, ax)
        # suppress wrap garbage at global borders
        idx = jax.lax.axis_index(ax)
        nsh = jax.lax.axis_size(ax)
        row = jax.lax.broadcasted_iota(jnp.int32, v_ext.shape, 0)
        top_ok = (idx > 0) | (row >= halo_feat)
        bot_ok = (idx < nsh - 1) | (row < v_ext.shape[0] - halo_feat)
        v_ext = v_ext & top_ok & bot_ok

        feats_e, _, nbr_e, eattr_e, local_std_e = build_grid_inputs(
            d_ext, v_ext, resolution=resolution,
            connectivity=self.connectivity,
        )
        # NOTE: features within rows [halo_feat-1, L+halo_feat+1) are exact;
        # we keep a 1-row activation halo for the first conv layer.
        tr = halo_feat - 1  # trim to halo=1 extended block
        feats = feats_e[tr:-tr]
        valid1 = v_ext[tr:-tr]
        nbr1 = nbr_e[:, tr:-tr]
        eattr1 = eattr_e[:, tr:-tr]
        local_std = local_std_e[halo_feat:-halo_feat]

        x = MLPFeatureExtractor(
            self.hidden_channels, self.feature_extractor_layers, self.dropout
        )(feats, deterministic)  # [L+2, W, hid] (halo 1)

        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            conv = GridGATConv(
                out_channels=self.hidden_channels,
                heads=self.heads if not last else 1,
                concat=not last,
                dropout=self.dropout,
                edge_dim=self.edge_dim,
                connectivity=self.connectivity,
                compute_dtype=self.compute_dtype,
                use_pallas=self.use_pallas,
            )
            if i == 0:
                # layer 0's 1-row halo is free (left over from the
                # featurization exchange); x is [L+2, W, hid]
                y = conv(x, valid1, nbr1, eattr1, deterministic)[1:-1]
            elif self.overlap and x.shape[0] >= 2:
                # --- overlapped halo refresh (module docstring) ---------
                # 1) launch boundary-row ppermutes; 2) aggregate the full
                # local block (rows 0 / L-1 use wrap garbage — discarded);
                # 3) finish the two boundary rows from the landed halo via
                # 3-row strip convs sharing this layer's parameters.
                fa, fb = halo_rows_split(x, 1, ax)
                y_loc = conv(x, valid1[1:-1], nbr1[:, 1:-1],
                             eattr1[:, 1:-1], deterministic)
                top = jnp.concatenate([fa, x[:2]], axis=0)
                bot = jnp.concatenate([x[-2:], fb], axis=0)
                y_top = conv(top, valid1[:3], nbr1[:, :3], eattr1[:, :3],
                             deterministic)[1:2]
                y_bot = conv(bot, valid1[-3:], nbr1[:, -3:], eattr1[:, -3:],
                             deterministic)[1:2]
                y = jnp.concatenate(
                    [y_top, y_loc[1:-1], y_bot], axis=0)
            else:
                # serial: refresh 1-row activation halo, then aggregate
                xh = exchange_halo_rows(x, 1, ax)
                y = conv(xh, valid1, nbr1, eattr1, deterministic)[1:-1]
            width = self.hidden_channels * (self.heads if not last else 1)
            lw = y.shape[0] * y.shape[1]
            yf = MaskedBatchNorm(width, axis_name=ax)(
                y.reshape(lw, width), valid1[1:-1].reshape(-1),
                use_running_average,
            )
            x = yf.reshape(y.shape[0], y.shape[1], width)
            if not last:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)

        logits = ClassificationHead(self.hidden_channels, self.num_classes,
                                    self.dropout)(x, deterministic)
        out = {
            "class_logits": logits,
            "class_probs": nn.softmax(logits, -1),
            "predicted_class": jnp.argmax(logits, -1),
            "confidence": ConfidenceHead(self.hidden_channels, self.dropout)(
                x, deterministic),
            "local_std": local_std,
        }
        if self.predict_correction:
            out["correction"] = CorrectionHead(self.hidden_channels,
                                               self.dropout)(x, deterministic)
        return out

    def param_name_note(self):
        """Param layout intentionally equals GridBathymetricGNN:
        MLPFeatureExtractor_0, GridGATConv_i, MaskedBatchNorm_i, heads."""


def make_sharded_grid_forward(
    model: HaloGridGNN,
    mesh: Mesh,
    resolution: Tuple[float, float] = (1.0, 1.0),
):
    """jit'd sharded forward: full [H, W] arrays in, full outputs out.

    Rows are sharded over the ``graph`` axis; XLA keeps every shard's
    compute local and rides ICI only for the halo ppermutes + BatchNorm
    psums.
    """
    axis = model.axis_name

    def fwd(variables, depth, valid):
        def local(params_bs, d, v):
            return model.apply(params_bs, d, v, resolution=resolution)

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(), variables),
                      P(axis, None), P(axis, None)),
            out_specs=P(axis, None),
            check_vma=False,
        )(variables, depth, valid)

    return jax.jit(fwd)


def make_halo_train_step(
    model: HaloGridGNN,
    optimizer,
    training_cfg,
    class_weights,
    huber_delta,
    mesh: Mesh,
    resolution: Tuple[float, float] = (1.0, 1.0),
):
    """dp x sp training step on the product mesh (``data`` x ``graph``).

    The tile batch [B, H, W] is sharded over ``data`` and each tile's rows
    over ``graph``: every device owns a [B/nd, H/ng, W] block. Each shard
    runs the halo forward (per-layer ppermute row refresh over ICI,
    BatchNorm moments psum'd over ``graph``), computes the masked
    multi-task loss on its local rows, and grads are pmean'd over both
    axes — the GNN analogue of DP x sequence parallelism
    (SURVEY §2.2 SP row, §7.1 step 8 stage B).

    Loss semantics are EXACT for deterministic forwards (dropout 0):
    every component's masked-mean numerator and denominator (valid
    counts, noise counts, FP counts, CE weight sums) are psum'd over the
    ``graph`` axis before dividing, so the sharded objective equals the
    single-chip one even on masked surveys whose valid nodes distribute
    unevenly across row shards. With dropout > 0 the per-shard RNG
    geometry differs from a single chip (halo rows reuse the neighbor
    shard's draw; draw shapes differ), so the objective is stochastically
    equivalent rather than bit-identical; the equivalence tests run
    dropout 0. See the gradient-
    reduction note inside shard_fn for why grads then pmean (not psum)
    over ``graph``. Verified by the single-vs-sharded train-step
    equivalence test (tests/test_halo.py).
    """
    from ..training import losses as L
    from ..config.constants import (CLASS_NOISE, CORRECTION_NORM_CAP,
                                    CORRECTION_NORM_FLOOR)

    tc = training_cfg
    data_axis = "data"
    axis = model.axis_name

    def local_loss(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}

        def one(noisy, valid, labels, raw_corr, rng1):
            out, upd = model.apply(
                variables, noisy, valid, resolution=resolution,
                deterministic=False, rngs={"dropout": rng1},
                mutable=["batch_stats"],
            )
            denom = jnp.maximum(out["local_std"], CORRECTION_NORM_FLOOR)
            corr_t = jnp.clip(raw_corr / denom,
                              -CORRECTION_NORM_CAP, CORRECTION_NORM_CAP)
            flat = lambda a: a.reshape(-1)
            outputs = {k: (v_.reshape(-1, v_.shape[-1])
                           if k in ("class_logits", "class_probs")
                           else flat(v_))
                       for k, v_ in out.items()}
            lbl = flat(labels)
            targets = {"labels": lbl, "correction": flat(corr_t),
                       "noise_mask": lbl == CLASS_NOISE}
            node_mask = flat(valid)
            terms = L.combined_loss_terms(
                outputs, targets, node_mask,
                class_weights=class_weights,
                label_smoothing=tc.label_smoothing,
                correction_delta=huber_delta,
            )
            m = node_mask.astype(jnp.float32)
            acc_num = jnp.sum((outputs["predicted_class"] == lbl) * m)
            acc_den = jnp.sum(m)
            return terms, (acc_num, acc_den), upd["batch_stats"]

        bsz = batch["noisy"].shape[0]
        rngs = jax.random.split(rng, bsz)
        terms, acc_nd, new_bs = jax.vmap(one)(
            batch["noisy"], batch["valid"], batch["labels"],
            batch["raw_correction"], rngs)
        # EXACT sharded objective: psum each per-tile numerator/denominator
        # over the graph axis before dividing (module docstring).
        terms = jax.lax.psum(terms, axis)
        acc_num, acc_den = jax.lax.psum(acc_nd, axis)
        losses = jax.vmap(partial(
            L.finalize_loss_terms,
            classification_weight=tc.classification_weight,
            correction_weight=tc.correction_weight,
            confidence_weight=tc.confidence_weight,
            feature_preservation_weight=tc.feature_preservation_weight,
            shoal_safety_weight=tc.shoal_safety_weight,
        ))(terms)
        acc = jnp.mean(acc_num / jnp.maximum(acc_den, 1.0))
        losses = jax.tree.map(lambda a: jnp.mean(a, 0), losses)
        new_bs = jax.tree.map(lambda a: jnp.mean(a, 0), new_bs)
        return losses["total"], (losses, acc, new_bs)

    def shard_fn(params, batch_stats, opt_state, batch, rng, lr):
        _check_inject_opt_state(opt_state)
        # distinct dropout per data-shard; identical within a graph row-group
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        (_, (losses, acc, new_bs)), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, batch_stats, batch, rng)
        # The differentiated loss is the graph-global objective (terms
        # psum'd in forward). psum's transpose under shard_map is psum, so
        # each shard's backward already carries an n_graph x factor on
        # every path (seed 1 on each replica -> ct = n after the
        # transpose); pmean over graph therefore yields exactly the true
        # total gradient. Pinned by the single-vs-sharded equivalence
        # test in tests/test_halo.py.
        grads = jax.lax.pmean(jax.lax.pmean(grads, axis), data_axis)
        losses = jax.lax.pmean(losses, data_axis)
        acc = jax.lax.pmean(acc, data_axis)
        new_bs = jax.lax.pmean(new_bs, data_axis)  # graph-psum'd in-model
        inj = opt_state[1]
        inj = inj._replace(hyperparams={**inj.hyperparams,
                                        "learning_rate": lr})
        updates, new_opt = optimizer.update(grads, (opt_state[0], inj),
                                            params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, losses, acc

    def _spec_like(tree, spec):
        return jax.tree.map(lambda _: spec, tree)

    batch_spec = P(data_axis, axis, None)  # [B, rows, W]

    def step(state, batch, rng, lr):
        sharded = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(
                _spec_like(state.params, P()),
                _spec_like(state.batch_stats, P()),
                jax.tree.map(lambda _: P(), state.opt_state),
                jax.tree.map(lambda _: batch_spec, batch),
                P(), P(),
            ),
            out_specs=(
                _spec_like(state.params, P()),
                _spec_like(state.batch_stats, P()),
                jax.tree.map(lambda _: P(), state.opt_state),
                P(), P(),
            ),
            check_vma=False,
        )
        new_params, new_bs, new_opt, losses, acc = sharded(
            state.params, state.batch_stats, state.opt_state, batch, rng, lr)
        from ..training.trainer import TrainState
        return (TrainState(new_params, new_bs, new_opt, state.step + 1),
                losses, acc)

    return jax.jit(step)


def pad_rows_to_multiple(a, n: int, fill=0.0):
    """Pad leading dim to a multiple of n (host-side helper)."""
    import numpy as np

    h = a.shape[0]
    target = ((h + n - 1) // n) * n
    if target == h:
        return a, h
    pad = np.full((target - h,) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], 0), h
