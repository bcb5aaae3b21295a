"""Data-parallel training over the mesh ``data`` axis (shard_map + psum).

Stage A of the distribution design (SURVEY §7.1 step 8): each device owns
B/n_dev tile graphs of the stacked batch, merges them locally (no cross-
device edges by construction), computes loss/grads locally, and pmeans
grads + metrics over ICI. BatchNorm batch statistics are also pmean'd so
every replica applies identical parameter updates.

The reference has no distributed training at all (SURVEY §2.2); this module
is new TPU-native capability, not a port.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.graph import PaddedGraph, merge_stacked
from ..training.trainer import TrainState, make_loss_fn


def _spec_like(tree, spec):
    return jax.tree.map(lambda _: spec, tree)


def make_dp_train_step(
    model,
    optimizer,
    training_cfg,
    class_weights,
    huber_delta,
    mesh: Mesh,
    exact: bool = True,
) -> Callable:
    """Build a jitted data-parallel train step.

    Inputs: state (replicated), graph/targets stacked [B, ...] with B
    divisible by the data-axis size, dropout rng, lr scalar.

    ``exact=True`` (default) makes the sharded step numerically equal to
    the single-device step on the same batch: every loss component's
    numerator/denominator is psum'd over ``data`` before dividing (the
    single-device objective is one joint masked mean over the merged
    batch, NOT a mean of per-shard means), and BatchNorm moments are
    psum'd across replicas (sync-BN; requires the model to expose
    ``bn_axis_name``). Verified by dryrun_multichip's grad-equivalence
    assertions. ``exact=False`` keeps per-shard BN statistics (torch-DDP-
    style local BN), trading exactness for one less collective per layer.
    """
    data_axis = "data"
    if exact and hasattr(model, "bn_axis_name"):
        model = model.clone(bn_axis_name=data_axis)
    loss_fn = make_loss_fn(model, training_cfg, class_weights, huber_delta,
                           train=True,
                           terms_axis=data_axis if exact else None)

    def shard_fn(params, batch_stats, opt_state, graph, targets, rng, lr):
        # per-shard rng so dropout differs across devices
        idx = jax.lax.axis_index(data_axis)
        rng = jax.random.fold_in(rng, idx)
        merged = merge_stacked(graph)
        flat_targets = jax.tree.map(
            lambda t: t.reshape((-1,) + t.shape[2:]), targets
        )
        (total, (losses, acc, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, merged, flat_targets, rng)

        # with exact=True the differentiated loss is the replicated global
        # objective; psum's transpose under shard_map is psum, so each
        # shard's backward already carries an n x factor and pmean yields
        # the true total gradient (see parallel/halo.py for the same
        # argument). With exact=False this is the classic grad average.
        grads = jax.lax.pmean(grads, data_axis)
        losses = jax.lax.pmean(losses, data_axis)
        acc = jax.lax.pmean(acc, data_axis)
        # keep replicas consistent: average batch-stat updates too
        new_bs = jax.lax.pmean(new_bs, data_axis)

        inj = opt_state[1]
        inj = inj._replace(hyperparams={**inj.hyperparams, "learning_rate": lr})
        opt_state = (opt_state[0], inj)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, losses, acc

    graph_specs = PaddedGraph(
        x=P(data_axis), edge_src=P(data_axis), edge_dst=P(data_axis),
        edge_attr=P(data_axis), node_mask=P(data_axis), edge_mask=P(data_axis),
        pos=P(data_axis), local_std=P(data_axis), graph_id=P(data_axis),
    )

    def step(state: TrainState, graph, targets, rng, lr):
        target_specs = jax.tree.map(lambda _: P(data_axis), targets)
        sharded = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                _spec_like(state.params, P()),
                _spec_like(state.batch_stats, P()),
                jax.tree.map(lambda _: P(), state.opt_state),
                graph_specs,
                target_specs,
                P(),
                P(),
            ),
            out_specs=(
                _spec_like(state.params, P()),
                _spec_like(state.batch_stats, P()),
                jax.tree.map(lambda _: P(), state.opt_state),
                P(),
                P(),
            ),
            check_vma=False,
        )
        new_params, new_bs, new_opt, losses, acc = sharded(
            state.params, state.batch_stats, state.opt_state, graph, targets,
            rng, lr,
        )
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            losses,
            acc,
        )

    return jax.jit(step)


def make_dp_eval_step(model, training_cfg, class_weights, huber_delta,
                      mesh: Mesh) -> Callable:
    data_axis = "data"
    # eval uses running BN averages (no batch moments), so only the loss
    # terms need the exact cross-shard reduction
    loss_fn = make_loss_fn(model, training_cfg, class_weights, huber_delta,
                           train=False, terms_axis=data_axis)

    def shard_fn(params, batch_stats, graph, targets):
        merged = merge_stacked(graph)
        flat_targets = jax.tree.map(
            lambda t: t.reshape((-1,) + t.shape[2:]), targets
        )
        _, (losses, acc, _) = loss_fn(params, batch_stats, merged,
                                      flat_targets, jax.random.PRNGKey(0))
        return losses, acc  # already replicated by the psum'd terms

    graph_specs = PaddedGraph(
        x=P(data_axis), edge_src=P(data_axis), edge_dst=P(data_axis),
        edge_attr=P(data_axis), node_mask=P(data_axis), edge_mask=P(data_axis),
        pos=P(data_axis), local_std=P(data_axis), graph_id=P(data_axis),
    )

    def step(state: TrainState, graph, targets):
        target_specs = jax.tree.map(lambda _: P(data_axis), targets)
        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(_spec_like(state.params, P()),
                      _spec_like(state.batch_stats, P()),
                      graph_specs, target_specs),
            out_specs=(P(), P()),
            check_vma=False,
        )(state.params, state.batch_stats, graph, targets)

    return jax.jit(step)


def stack_banded_batches(pairs):
    """[(EllGraph, BandedEll)] per shard -> leading-dim-stacked pytrees.

    Shards must be built with identical bucket/s_max/spill_pad shapes
    (band_ell(s_max=...) + shared node buckets). The data-derived static
    reducer depths (spill_red_maxj / _d) are normalized to the max across
    shards here — extra grid steps are jcount-gated no-ops, and without
    this uneven spill densities would make the pytrees un-stackable
    (mismatched static aux data). Used by the sparse dp step: each
    device owns one merged k-NN sub-batch."""
    import dataclasses

    gs, bs = zip(*pairs)
    mj = max(b.spill_red_maxj for b in bs)
    mjd = max(b.spill_red_maxj_d for b in bs)
    bs = [dataclasses.replace(b, spill_red_maxj=mj, spill_red_maxj_d=mjd)
          for b in bs]
    g = jax.tree.map(lambda *xs: jnp.stack(xs), *gs)
    banded = jax.tree.map(lambda *xs: jnp.stack(xs), *bs)
    return g, banded


def make_dp_sparse_train_step(
    ell_model,
    optimizer,
    training_cfg,
    class_weights,
    huber_delta,
    mesh: Mesh,
    exact: bool = True,
) -> Callable:
    """Data-parallel train step for the banded-ELL sparse (k-NN) path.

    Inputs: state (replicated); (g, banded) stacked [D, ...] from
    stack_banded_batches with D == the data-axis size; targets stacked
    [D, n_pad]; rng; lr. Each shard runs the fused banded kernels
    (fwd + custom-VJP bwd + streamed dropout) on its own merged
    sub-batch; grads/metrics pmean over ``data``. ``exact=True`` psums
    loss numerators/denominators and BN moments so the sharded objective
    equals the single-device step on the concatenated batch (same
    argument as make_dp_train_step)."""
    data_axis = "data"
    if exact:
        ell_model = ell_model.clone(bn_axis_name=data_axis)
    loss_fn = make_loss_fn(ell_model, training_cfg, class_weights,
                           huber_delta, train=True,
                           terms_axis=data_axis if exact else None)

    def shard_fn(params, batch_stats, opt_state, g, banded, targets,
                 rng, lr):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        g = jax.tree.map(lambda x: x[0], g)
        banded = jax.tree.map(lambda x: x[0], banded)
        # targets arrive stacked [1, B/D, n_pad]: drop the shard dim and
        # flatten samples to match the merged graph's node axis
        flat_targets = jax.tree.map(
            lambda t: t[0].reshape((-1,) + t.shape[3:]), targets
        )
        (total, (losses, acc, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, g, flat_targets, rng, banded)
        grads = jax.lax.pmean(grads, data_axis)
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

    def step(state: TrainState, g, banded, targets, rng, lr):
        sharded = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                _spec_like(state.params, P()),
                _spec_like(state.batch_stats, P()),
                jax.tree.map(lambda _: P(), state.opt_state),
                jax.tree.map(lambda _: P(data_axis), g),
                jax.tree.map(lambda _: P(data_axis), banded),
                jax.tree.map(lambda _: P(data_axis), targets),
                P(),
                P(),
            ),
            out_specs=(
                _spec_like(state.params, P()),
                _spec_like(state.batch_stats, P()),
                jax.tree.map(lambda _: P(), state.opt_state),
                P(),
                P(),
            ),
            check_vma=False,
        )
        new_params, new_bs, new_opt, losses, acc = sharded(
            state.params, state.batch_stats, state.opt_state, g, banded,
            targets, rng, lr,
        )
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            losses,
            acc,
        )

    return jax.jit(step)
