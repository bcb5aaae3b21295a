"""Worker process for the REAL 2-process jax.distributed test.

Spawned by tests/test_distributed.py (2 processes x 4 virtual CPU devices
= 8 global devices, Gloo collectives over a localhost coordinator). This
is the first genuine exercise of the multi-host code path in
parallel/mesh.py (initialize_distributed / make_host_mesh /
host_local_batch_to_global): every collective crosses a real process
boundary. The reference has no distributed runtime at all (SURVEY §2.4);
equivalence is judged against the SAME dp step run single-process on the
same 8 devices by the parent.

Usage: python distributed_worker.py <process_id> <port> <out.npz>
"""

import os
import sys

if __name__ == "__main__":
    # must precede any jax import — and must NOT run when the parent test
    # imports this module (it would clobber the parent's 8-device flags)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_PROCESSES = 2
LOCAL_DEVICES = 4


def build_global_batch():
    """Deterministic batch, identical in every process and in the parent."""
    from conftest import make_ramp_surface

    from bathymetric_gnn_tpu.config.config import (BucketConfig, Config,
                                                   ModelConfig,
                                                   TrainingConfig)
    from bathymetric_gnn_tpu.training.datasets import (SyntheticTileDataset,
                                                       collate_samples)

    cfg = Config(
        # dropout 0 so the 1-process and 2-process steps are bit-comparable
        model=ModelConfig(hidden_channels=8, num_layers=2, heads=2,
                          dropout=0.0),
        bucket=BucketConfig(node_buckets=(4096,)),
        training=TrainingConfig(batch_size=8, seed=0),
    )
    grids = [make_ramp_surface(96, 96, seed=i) for i in range(2)]
    ds = SyntheticTileDataset(grids, cfg, tile_size=48, overlap=8,
                              min_valid_ratio=0.0, seed=0)
    samples = [ds[i % len(ds)] for i in range(8)]
    graph, targets = collate_samples(samples)
    return cfg, ds, graph, targets


def run_step_on_mesh(mesh, cfg, ds, graph, targets, local_slice=None):
    """One dp train step; returns (params pytree, losses, acc).

    ``local_slice``: when set (multi-process), each process feeds only its
    local [B_local] shard through host_local_batch_to_global; when None
    (single-process parent), the full batch is placed directly.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bathymetric_gnn_tpu.models.gnn import make_model
    from bathymetric_gnn_tpu.parallel.data_parallel import make_dp_train_step
    from bathymetric_gnn_tpu.parallel.mesh import (host_local_batch_to_global,
                                                   shard_batch_pytree)
    from bathymetric_gnn_tpu.training.trainer import Trainer

    import optax

    model = make_model(cfg.model, in_channels=7, edge_dim=3)
    trainer = Trainer(cfg, model, ds, output_dir="/tmp/dist_worker_ckpt")
    state = trainer.init_state(ds[0].graph)
    # SGD (not AdamW) so new_params - init = -lr * clipped grads: linear in
    # the gradients. AdamW's first step is ~ -lr * sign(g), which amplifies
    # Gloo-vs-XLA reduction-order noise (~1e-10) on near-zero grads to a
    # full +-lr flip and makes the comparison meaningless.
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3),
    )
    state = dataclasses.replace(state,
                                opt_state=optimizer.init(state.params))
    dp_step = make_dp_train_step(
        model, optimizer, cfg.training, trainer.class_weights,
        trainer.huber_delta, mesh,
    )
    if local_slice is None:
        graph_g = shard_batch_pytree(graph, mesh)
        targets_g = shard_batch_pytree(targets, mesh)
    else:
        take = lambda t: jax.tree.map(lambda a: a[local_slice], t)
        graph_g = host_local_batch_to_global(take(graph), mesh)
        targets_g = host_local_batch_to_global(take(targets), mesh)
    new_state, losses, acc = dp_step(state, graph_g, targets_g,
                                     jax.random.PRNGKey(0), jnp.float32(1e-3))
    return new_state.params, losses, acc


def build_halo_batch(data_ax=4, h=32, w=32):
    """Deterministic dp x sp tile batch (identical in every process)."""
    import numpy as np

    from conftest import make_ramp_surface

    from bathymetric_gnn_tpu.config.config import Config, ModelConfig, \
        TrainingConfig

    cfg = Config(
        model=ModelConfig(hidden_channels=16, num_layers=2, heads=2,
                          dropout=0.0),
        training=TrainingConfig(batch_size=data_ax, seed=0),
    )
    depth = make_ramp_surface(h, w, seed=0)
    valid = np.isfinite(depth).copy()
    valid[2:11, 4:28] = False   # uneven valid rows across graph shards
    rg = np.random.default_rng(1)
    labels = (rg.random((data_ax, h, w)) < 0.2).astype(np.int32) * 2
    batch = {
        "noisy": np.stack([np.nan_to_num(depth).astype(np.float32)]
                          * data_ax),
        "valid": np.stack([valid] * data_ax),
        "labels": labels,
        "raw_correction": (rg.normal(0, 0.3, (data_ax, h, w))
                           .astype(np.float32) * (labels == 2)),
    }
    return cfg, batch, valid


def run_halo_step_on_mesh(mesh, cfg, batch, local_slice=None):
    """One dp x sp halo train step; returns (params, losses, acc).

    The batch is sharded P(data, graph, None): tiles over ``data``
    (ACROSS processes in the 2-process test), each tile's rows over
    ``graph`` (always within one process — asserted by the caller)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from jax.sharding import PartitionSpec as P

    from bathymetric_gnn_tpu.parallel.halo import (HaloGridGNN,
                                                   make_halo_train_step)
    from bathymetric_gnn_tpu.parallel.mesh import host_local_batch_to_global
    from bathymetric_gnn_tpu.training.trainer import TrainState

    mc = cfg.model
    kw = dict(hidden_channels=mc.hidden_channels, num_layers=mc.num_layers,
              heads=mc.heads, dropout=0.0)

    from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
    from bathymetric_gnn_tpu.models.grid_gat import GridBathymetricGNN

    noisy0 = np.asarray(batch["noisy"][0])
    valid0 = np.asarray(batch["valid"][0])
    feats, v, nbr, eattr, _ = build_grid_inputs(noisy0, valid0)
    variables = GridBathymetricGNN(**kw).init(
        jax.random.PRNGKey(0), feats, v, nbr, eattr)

    halo = HaloGridGNN(**kw)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3),
    )
    hstep = make_halo_train_step(halo, optimizer, cfg.training,
                                 jnp.ones(3), 1.0, mesh)
    state = TrainState(variables["params"], variables["batch_stats"],
                       optimizer.init(variables["params"]), jnp.int32(0))
    spec_fn = lambda x: P("data", "graph", *([None] * (x.ndim - 2)))
    if local_slice is not None:
        local = {k: np.asarray(a)[local_slice] for k, a in batch.items()}
    else:
        local = {k: np.asarray(a) for k, a in batch.items()}
    batch_g = host_local_batch_to_global(local, mesh, spec_fn=spec_fn)
    new_state, losses, acc = hstep(state, batch_g, jax.random.PRNGKey(0),
                                   jnp.float32(1e-3))
    return new_state.params, losses, acc


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "dp"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from bathymetric_gnn_tpu.parallel.mesh import (initialize_distributed,
                                                   make_host_mesh)

    info = initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NUM_PROCESSES, process_id=pid,
    )
    assert info["processes"] == NUM_PROCESSES, info
    assert info["process_id"] == pid, info
    assert info["local_devices"] == LOCAL_DEVICES, info
    assert info["global_devices"] == NUM_PROCESSES * LOCAL_DEVICES, info

    # graph (halo) axis stays host-local: with graph_axis == the per-host
    # device count, each graph group must live entirely on one process —
    # the process-major device-ordering assumption (parallel/mesh.py),
    # exercised here with a REAL 2-process topology for the first time.
    import numpy as np

    mesh_g = make_host_mesh(graph_axis=LOCAL_DEVICES)
    assert mesh_g.devices.shape == (NUM_PROCESSES, LOCAL_DEVICES)
    for row in mesh_g.devices:
        owners = {d.process_index for d in row}
        assert len(owners) == 1, f"graph group spans hosts: {owners}"

    if mode == "halo":
        # dp x sp: data axis ACROSS the 2 processes (Gloo pmean), graph
        # (halo ppermute) axis within each — the first cross-process
        # exercise of the halo path's mesh assumptions (VERDICT r3 #6)
        mesh_h = make_host_mesh(graph_axis=2)
        assert mesh_h.devices.shape == (4, 2)
        for row in mesh_h.devices:
            owners = {d.process_index for d in row}
            assert len(owners) == 1, f"halo group spans hosts: {owners}"
        # and the data axis really does cross processes
        col_owners = {d.process_index for d in mesh_h.devices[:, 0]}
        assert len(col_owners) == NUM_PROCESSES, col_owners
        cfg, batch, _ = build_halo_batch(data_ax=4)
        params, losses, acc = run_halo_step_on_mesh(
            mesh_h, cfg, batch, local_slice=slice(pid * 2, (pid + 1) * 2))
    else:
        # one dp train step over the global (data=8, graph=1) mesh, each
        # process contributing its local half of the batch
        cfg, ds, graph, targets = build_global_batch()
        mesh = make_host_mesh(graph_axis=1)
        local = slice(pid * 4, (pid + 1) * 4)
        params, losses, acc = run_step_on_mesh(mesh, cfg, ds, graph,
                                               targets, local_slice=local)

    # replicated outputs are addressable on every process
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {"/".join(str(k) for k in path): np.asarray(leaf)
           for path, leaf in flat}
    out["__loss_total"] = np.asarray(losses["total"])
    out["__acc"] = np.asarray(acc)
    if pid == 0:
        np.savez(out_path, **out)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
