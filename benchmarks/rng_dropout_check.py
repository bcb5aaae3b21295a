"""TPU-side verification of in-kernel rng attention dropout (round 4).

The CPU test suite cannot exercise this path (no prng lowering in
interpret mode), so this standalone check runs on the real TPU:

1. DRAW CONSISTENCY (the strong check): a dumper kernel extracts the
   exact in-kernel draw for a seed via the shared `_gen_drop_mults`,
   and the rng path must match the streamed-mask path fed that
   extracted mask BIT-FOR-BIT — forward output and gradient. This
   catches any fwd/bwd regeneration mismatch, indexing skew, or
   threshold error exactly.
2. drop-rate statistics — realized drop fraction matches p.
3. determinism — same seed same output; different seed different.

(A naive finite-difference grad check is NOT used: on real TPUs the
compiled forward carries MXU rounding whose directional derivative
deviates a few % from the ideal-math gradient — the identical plateau
appears on the long-trusted streamed path, CPU FD is clean at 0.1%.)

Run: python benchmarks/rng_dropout_check.py   (exit 0 = all pass)
"""
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    assert jax.default_backend() == "tpu", "TPU-only check"
    from bathymetric_gnn_tpu.data.graph_build import build_grid_inputs
    from bathymetric_gnn_tpu.ops.pallas.grid_gat_fused import (
        _gen_drop_mults, _seed_tile, fused_grid_gat)

    h = w = 128
    heads, c, nk, R = 4, 16, 8, 16
    rg = np.random.default_rng(0)
    base = (30 + 4 * np.sin(np.arange(w) / 9)[None]
            + rg.normal(0, 0.2, (h, w))).astype(np.float32)
    valid = np.ones((h, w), bool)
    feats, v, nbr, eattr, _ = build_grid_inputs(base, valid)
    F = feats.shape[-1]
    rngp = np.random.default_rng(5)
    w_lin = jnp.asarray(rngp.normal(0, .2, (F, heads * c)), jnp.float32)
    a_src = jnp.asarray(rngp.normal(0, .2, (heads * c, heads)), jnp.float32)
    a_dst = jnp.asarray(rngp.normal(0, .2, (heads * c, heads)), jnp.float32)
    m_edge = jnp.asarray(rngp.normal(0, .2, (3, heads)), jnp.float32)
    bias = jnp.zeros(heads * c)
    probe = jnp.asarray(rg.normal(0, 1, (h, w, heads * c)), jnp.float32)
    nbrf = nbr.astype(jnp.float32)
    vf = jnp.asarray(valid).astype(jnp.float32)
    seed = jnp.array([123, 456], jnp.int32)
    kp = 0.8
    nkh = (nk + 1) * heads
    nb = h // R

    # --- extract the exact in-kernel draw ---
    def dump_kernel(seed_ref, out_ref, *, R, nkh, W, keep_prob):
        dm = _gen_drop_mults(seed_ref, pl.program_id(0), R, nkh, W,
                             keep_prob)   # round-5 layout: [nkh, R, W]
        out_ref[:] = dm

    mask = pl.pallas_call(
        functools.partial(dump_kernel, R=R, nkh=nkh, W=w, keep_prob=kp),
        grid=(nb,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nkh, R, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nkh, h, w), jnp.float32),
    )(_seed_tile(seed))
    dmask_ext = mask.reshape(nk + 1, heads, h, w)

    # 2. drop-rate statistics (binomial: ~4.7M draws, 3 sigma ~ 0.0006)
    frac = float(jnp.mean(dmask_ext == 0.0))
    assert abs(frac - (1 - kp)) < 2e-3, f"drop fraction {frac} vs {1-kp}"

    def loss_rng(x):
        out = fused_grid_gat(x, w_lin, a_src, a_dst, m_edge, eattr, nbrf,
                             vf, bias, None, 8, 0.2, True, 16, None,
                             jnp.float32, seed, kp)
        return jnp.sum(out * probe)

    def loss_streamed(x):
        out = fused_grid_gat(x, w_lin, a_src, a_dst, m_edge, eattr, nbrf,
                             vf, bias, dmask_ext, 8, 0.2, True, 16, None,
                             jnp.float32, None, 1.0)
        return jnp.sum(out * probe)

    # 1. bit-exact equivalence of fwd + grad with the extracted mask
    l1 = float(jax.jit(loss_rng)(feats))
    l2 = float(jax.jit(loss_streamed)(feats))
    assert l1 == l2, f"fwd mismatch: {l1} vs {l2}"
    g1 = jax.jit(jax.grad(loss_rng))(feats)
    g2 = jax.jit(jax.grad(loss_streamed))(feats)
    dmax = float(jnp.abs(g1 - g2).max())
    assert dmax == 0.0, f"grad mismatch: max abs {dmax}"

    # 3. determinism / seed sensitivity
    assert float(jax.jit(loss_rng)(feats)) == l1
    seed2 = jnp.array([123, 457], jnp.int32)

    def loss_rng2(x):
        out = fused_grid_gat(x, w_lin, a_src, a_dst, m_edge, eattr, nbrf,
                             vf, bias, None, 8, 0.2, True, 16, None,
                             jnp.float32, seed2, kp)
        return jnp.sum(out * probe)

    assert float(jax.jit(loss_rng2)(feats)) != l1, "seed had no effect"

    print(f"rng-dropout check OK: draw extraction bit-exact (fwd+grad), "
          f"drop fraction {frac:.4f} (target {1-kp}), deterministic, "
          f"seed-sensitive")


if __name__ == "__main__":
    main()
