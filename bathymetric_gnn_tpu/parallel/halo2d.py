"""2-D (row x col) halo partitioning of the dense-grid model.

Extends parallel/halo.py's 1-D row sharding to row x col blocks so the
flagship 60k x 60k survey config can spread over 2-D chip meshes (a 60k-
wide row shard is ~60 MB of f32 activations per layer at 256 channels;
2-D blocks bound BOTH dims). Each device owns an [Lr, Lc] block of the
survey; halos are exchanged with the standard two-step scheme:

    1. ppermute row halos along the ``row`` mesh axis      [Lr+2h, Lc]
    2. ppermute col halos of the row-extended block along
       the ``col`` axis                                    [Lr+2h, Lc+2h]

Step 2 carries the corner blocks automatically: the column neighbor's
row-extended block already contains the rows it received from the
diagonal device, so no explicit corner sends are needed.

Featurization runs once on a 4-cell halo extension (5x5 masked stats +
gradient ring, as the 1-D module); each GNN layer refreshes a 1-cell
activation halo. BatchNorm moments are psum'd over BOTH spatial axes so
the sharded statistics equal the single-chip ones; the dp x row x col
train step psums every loss term's numerator/denominator over both
spatial axes (exact objective, as the 1-D path).

The reference has no distributed runtime (SURVEY §2.2/§2.4); this module
is new TPU-native capability, required for BASELINE config #5 at pod
scale (VERDICT round-1 item 8).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.grid_gat import GridGATConv
from ..models.layers import (ClassificationHead, ConfidenceHead,
                             CorrectionHead, MaskedBatchNorm,
                             MLPFeatureExtractor)
from .halo import _check_inject_opt_state

ROW_AXIS = "row"
COL_AXIS = "col"


def _exchange_axis0(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Extend dim 0 with `halo` neighbor slices along a mesh axis."""
    n = jax.lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i + 1, i) for i in range(n - 1)]
    from_above = jax.lax.ppermute(x[-halo:], axis_name, down)
    from_below = jax.lax.ppermute(x[:halo], axis_name, up)
    return jnp.concatenate([from_above, x, from_below], axis=0)


def exchange_halo_2d(x: jax.Array, halo: int,
                     row_axis: str = ROW_AXIS,
                     col_axis: str = COL_AXIS) -> jax.Array:
    """[Lr, Lc, ...] -> [Lr+2h, Lc+2h, ...] with neighbor blocks; corners
    arrive via the second (column) exchange of the row-extended block.
    Missing neighbors at the global border contribute zeros (masked out
    downstream by the validity halo)."""
    x1 = _exchange_axis0(x, halo, row_axis)
    x2 = jnp.moveaxis(
        _exchange_axis0(jnp.moveaxis(x1, 1, 0), halo, col_axis), 0, 1)
    return x2


def _suppress_border_wrap(v_ext: jax.Array, halo: int,
                          row_axis: str, col_axis: str) -> jax.Array:
    """Zero the validity halo at the global survey border (where ppermute
    has no source and zeros/garbage would otherwise leak in)."""
    ri = jax.lax.axis_index(row_axis)
    ci = jax.lax.axis_index(col_axis)
    nr = jax.lax.axis_size(row_axis)
    nc = jax.lax.axis_size(col_axis)
    rows = jax.lax.broadcasted_iota(jnp.int32, v_ext.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, v_ext.shape, 1)
    ok = (((ri > 0) | (rows >= halo))
          & ((ri < nr - 1) | (rows < v_ext.shape[0] - halo))
          & ((ci > 0) | (cols >= halo))
          & ((ci < nc - 1) | (cols < v_ext.shape[1] - halo)))
    return v_ext & ok


class HaloGrid2DGNN(nn.Module):
    """Row x col block-sharded flagship model. Parameter layout matches
    GridBathymetricGNN exactly, so single-chip checkpoints run multi-chip
    unchanged. Apply inside shard_map over the (row, col) mesh axes."""

    hidden_channels: int = 64
    num_layers: int = 4
    heads: int = 4
    num_classes: int = 3
    dropout: float = 0.1
    predict_correction: bool = True
    feature_extractor_layers: int = 2
    edge_dim: Optional[int] = 3
    connectivity: int = 8
    row_axis: str = ROW_AXIS
    col_axis: str = COL_AXIS
    use_pallas: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        depth_local: jax.Array,   # [Lr, Lc] this shard's block
        valid_local: jax.Array,   # [Lr, Lc] bool
        resolution: Tuple[float, float] = (1.0, 1.0),
        deterministic: bool = True,
        use_running_average: Optional[bool] = None,
    ) -> Dict[str, jax.Array]:
        from ..data.graph_build import build_grid_inputs

        if use_running_average is None:
            use_running_average = deterministic
        rax, cax = self.row_axis, self.col_axis
        halo_feat = 4   # one ring beyond the 5x5-stat + gradient reach so
        # halo-cell features consumed by layer 0 are exact (as 1-D path)

        d_ext = exchange_halo_2d(depth_local, halo_feat, rax, cax)
        v_ext = exchange_halo_2d(valid_local, halo_feat, rax, cax)
        v_ext = _suppress_border_wrap(v_ext, halo_feat, rax, cax)

        feats_e, _, nbr_e, eattr_e, local_std_e = build_grid_inputs(
            d_ext, v_ext, resolution=resolution,
            connectivity=self.connectivity,
        )
        tr = halo_feat - 1  # keep a 1-cell activation halo for layer 0
        feats = feats_e[tr:-tr, tr:-tr]
        valid1 = v_ext[tr:-tr, tr:-tr]
        nbr1 = nbr_e[:, tr:-tr, tr:-tr]
        eattr1 = eattr_e[:, tr:-tr, tr:-tr]
        local_std = local_std_e[halo_feat:-halo_feat,
                                halo_feat:-halo_feat]

        x = MLPFeatureExtractor(
            self.hidden_channels, self.feature_extractor_layers, self.dropout
        )(feats, deterministic)  # [Lr+2, Lc+2, hid]

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
            if i > 0:
                x = exchange_halo_2d(x, 1, rax, cax)
            y = conv(x, valid1, nbr1, eattr1, deterministic)[1:-1, 1:-1]
            width = self.hidden_channels * (self.heads if not last else 1)
            yf = MaskedBatchNorm(width, axis_name=(rax, cax))(
                y.reshape(-1, width), valid1[1:-1, 1:-1].reshape(-1),
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


def make_sharded_grid2d_forward(
    model: HaloGrid2DGNN,
    mesh: Mesh,
    resolution: Tuple[float, float] = (1.0, 1.0),
):
    """jit'd 2-D sharded forward: full [H, W] arrays in, full outputs out.
    Rows shard over ``row``, columns over ``col``."""
    rax, cax = model.row_axis, model.col_axis

    def fwd(variables, depth, valid):
        def local(params_bs, d, v):
            return model.apply(params_bs, d, v, resolution=resolution)

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(), variables),
                      P(rax, cax), P(rax, cax)),
            out_specs=P(rax, cax),
            check_vma=False,
        )(variables, depth, valid)

    return jax.jit(fwd)


def make_halo2d_train_step(
    model: HaloGrid2DGNN,
    optimizer,
    training_cfg,
    class_weights,
    huber_delta,
    mesh: Mesh,
    resolution: Tuple[float, float] = (1.0, 1.0),
    data_axis: str = "data",
):
    """dp x row x col training step on the product mesh.

    Tile batches shard over ``data``; each tile's rows/cols over
    ``row``/``col``. Loss semantics are EXACT for deterministic forwards
    (dropout 0): every component's masked numerator/denominator is psum'd
    over BOTH spatial axes before dividing, so the sharded objective
    equals the single-chip one (same scheme as
    parallel/halo.make_halo_train_step, which documents the
    psum-transpose/pmean gradient-reduction argument). With dropout > 0
    the per-shard RNG geometry differs from single-chip (halo cells reuse
    the neighbor shard's draw and the draw shapes differ), so the
    objective is stochastically equivalent, not bit-identical — the
    grad-equivalence gates in __graft_entry__/tests run dropout 0."""
    from ..training import losses as L
    from ..config.constants import (CLASS_NOISE, CORRECTION_NORM_CAP,
                                    CORRECTION_NORM_FLOOR)

    tc = training_cfg
    rax, cax = model.row_axis, model.col_axis

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
        terms = jax.lax.psum(jax.lax.psum(terms, rax), cax)
        acc_num, acc_den = jax.lax.psum(jax.lax.psum(acc_nd, rax), cax)
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
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        (_, (losses, acc, new_bs)), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, batch_stats, batch, rng)
        # psum's transpose is psum: each shard's backward carries the
        # (n_row * n_col) factor, so pmean over the spatial axes recovers
        # the exact total gradient (see parallel/halo.py).
        grads = jax.lax.pmean(
            jax.lax.pmean(jax.lax.pmean(grads, rax), cax), data_axis)
        losses = jax.lax.pmean(losses, data_axis)
        acc = jax.lax.pmean(acc, data_axis)
        new_bs = jax.lax.pmean(new_bs, data_axis)
        inj = opt_state[1]
        inj = inj._replace(hyperparams={**inj.hyperparams,
                                        "learning_rate": lr})
        updates, new_opt = optimizer.update(grads, (opt_state[0], inj),
                                            params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, losses, acc

    def _spec_like(tree, spec):
        return jax.tree.map(lambda _: spec, tree)

    batch_spec = P(data_axis, rax, cax)   # [B, rows, cols]

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
