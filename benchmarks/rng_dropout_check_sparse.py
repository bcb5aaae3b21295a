"""TPU bit-exactness check for the sparse wide kernels' in-kernel rng
attention dropout (ops/pallas/ell_gat_fused.py v3).

Methodology (same as the grid check, benchmarks/rng_dropout_check.py):
a dumper Pallas kernel extracts the EXACT per-band draw the kernels
regenerate from (seed, band); the streamed-mask path is then fed that
extracted draw and must match the rng path BIT-FOR-BIT in the forward
output and in every input/stream gradient. Also reports the realized
drop rate (catches uint32-threshold sign bugs).

Run on a real TPU (exit 0, prints `sparse rng-dropout check OK`).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bathymetric_gnn_tpu.config.config import BucketConfig, GraphConfig
    from bathymetric_gnn_tpu.data.graph_build import GraphBuilder
    from bathymetric_gnn_tpu.ops.ell import coo_to_ell
    from bathymetric_gnn_tpu.ops.ell_banded import band_ell
    from bathymetric_gnn_tpu.ops.pallas.ell_gat_fused import (
        _gen_band_drops, _seed_tile, ell_gat_fused_wide_pallas)

    assert jax.default_backend() == "tpu", "TPU-only check"

    n, k, h, c = 16384, 8, 4, 16
    hc = h * c
    keep_prob = 0.8
    rg = np.random.default_rng(0)
    side = int(np.sqrt(n))
    depth = (30 + 5 * np.sin(np.arange(side) / 7)[None, :]
             + 3 * np.cos(np.arange(side) / 5)[:, None]
             + rg.normal(0, 0.05, (side, side))).astype(np.float32)
    gb = GraphBuilder(GraphConfig(knn_k=k), BucketConfig(node_buckets=(n,)))
    bg = gb.build_graph(depth, np.ones((side, side), bool))
    g = coo_to_ell(bg.graph, max_degree=k)
    banded = band_ell(g, band_rows=128)
    n_pad = g.num_nodes_padded
    r = banded.band_rows
    t_count = n_pad // r
    s_max = banded.spill_dst_local_b.shape[-1]

    seed = jnp.asarray([1234, 5678], jnp.int32)
    seed_tile = _seed_tile(seed)

    # ---- dumper kernel: extract the exact per-band draw ---------------
    in_cols = (k + 1) * r

    def dump_kernel(seed_ref, dm_ref, dm_sp_ref):
        dm, dm_sp = _gen_band_drops(seed_ref, pl.program_id(0), h,
                                    in_cols, s_max, keep_prob)
        dm_ref[:] = dm[None]
        dm_sp_ref[:] = dm_sp[None]

    dm_w, dm_sp = pl.pallas_call(
        dump_kernel,
        grid=(t_count,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, h, in_cols), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s_max), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_count, h, in_cols), jnp.float32),
            jax.ShapeDtypeStruct((t_count, h, s_max), jnp.float32),
        ),
    )(seed_tile)

    drop = 1.0 - float(jnp.mean(dm_w > 0))
    print(f"realized in-band drop rate {drop:.4f} (target "
          f"{1.0 - keep_prob:.2f})")
    assert abs(drop - (1.0 - keep_prob)) < 0.01, "threshold bug"

    # ---- layer inputs --------------------------------------------------
    xh = jnp.asarray(rg.normal(size=(n_pad, h, c)).astype(np.float32)
                     * 0.3).astype(jnp.bfloat16)
    a_cat = jnp.asarray(rg.normal(size=(hc, 2 * h)).astype(np.float32)
                        * 0.05)
    m_edge = jnp.asarray(
        rg.normal(size=(g.edge_attr.shape[-1], h)).astype(np.float32)
        * 0.1)
    el_w_b = (jnp.einsum("tfl,fh->thl", banded.eattr_wide_t, m_edge)
              + banded.negmask_wide[:, None, :])
    el_self_t = jnp.zeros((h, n_pad), jnp.float32)
    w = jnp.asarray(rg.normal(size=(n_pad, hc)).astype(np.float32))

    def run(mode):
        def loss(xh_in, a_cat_in, el_in):
            kw = (dict(drop_seed=seed, keep_prob=keep_prob)
                  if mode == "rng" else
                  dict(dropout_masks=(dm_w, dm_sp)))
            y = ell_gat_fused_wide_pallas(
                xh_in, a_cat_in, el_in, el_self_t, m_edge, banded,
                compute_dtype="bfloat16", **kw)
            return jnp.sum(y.astype(jnp.float32) * w), y

        (val, y), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(xh, a_cat, el_w_b)
        return y, val, grads

    y_r, v_r, g_r = jax.tree.map(np.asarray, run("rng"))
    y_s, v_s, g_s = jax.tree.map(np.asarray, run("streamed"))

    assert np.array_equal(y_r, y_s), "forward outputs differ"
    assert v_r == v_s, "loss values differ"
    for a, b, name in [(g_r[0], g_s[0], "dxh"), (g_r[1], g_s[1], "da_cat"),
                       (g_r[2], g_s[2], "del_w")]:
        assert np.array_equal(a, b), f"{name} gradients differ"
    print("sparse rng-dropout check OK (fwd + grads bit-exact vs "
          "streamed path fed the extracted draw)")


if __name__ == "__main__":
    main()
