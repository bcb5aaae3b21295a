"""Fused Pallas band kernel for the sparse (banded-ELL) GAT layer.

Replaces the XLA-gather ELL path (~29-36 M edges/s on the 65k-node k=8
k-NN bench — benchmarks/RESULTS.md) for the BASELINE.json k-NN configs.
Reference capability replaced: PyG's scatter/gather GATConv kernels
(reference: models/gnn.py:120-143).

Design (see ops/ell_banded.py for the layout):

* grid = one program per destination band of ``R`` Hilbert-ordered rows;
  a 3-chunk source window ``[W=3R, HC]`` of transformed features rides
  along as three BlockSpec views of the same array (chunks t-1, t, t+1,
  clamped), so the window is VMEM-resident with normal Pallas
  pipelining — no HBM gathers anywhere.
* per ELL slot k, a comparison mask ``onehot_k[r, c] = (c == loc[r, k])``
  doubles as (a) the gather operator — attention-dot gathers are
  ``onehot_k @ ac_window`` on the MXU (one-hot matmul; padded/spilled
  slots have loc -1 and gather exact zeros) — and (b) the aggregation
  matrix: the softmax-weighted sum over in-band neighbors is
  ``(Σ_k e_k ⊙ onehot_k) @ xh_window``, an [R, W] x [W, C] MXU matmul
  per head.
* softmax runs over in-band slots (+ self) only, masked from the local
  index (-1 = dead/spilled); the kernel emits each row's logsumexp
  statistics (m, denom) and the XLA spill pass folds out-of-window
  edges in exactly by renormalization (ops/ell_banded.py).
* attention dots (a_src/a_dst) are computed IN-KERNEL from the resident
  window (one [W, HC] x [HC, 2H] matmul) — streaming them would either
  tile-pad 4 lanes to 128 in HBM or need a big XLA transpose.
* dtype discipline mirrors the grid kernel: streams/matmul operands in
  ``compute_dtype`` (bf16 for the bench path), logits/softmax/
  accumulation in f32.

Layout discipline (benchmarks/RESULTS.md "Lane-clean"): every stream is
minor-dim-N ([K, N] loc, [K*H, N] edge logits from the STATIC transposed
eattr table, [2H, N] output stats); the handful of [rows, R] -> [R, ...]
transposes are one small VPU transpose per band.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ell_banded import BandedEll


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    xw_a,        # [R, HC] window chunk t-1 (clamped)
    xw_b,        # [R, HC] window chunk t   (also the destination block)
    xw_c,        # [R, HC] window chunk t+1 (clamped)
    a_cat_mat,   # [HC, 2H] block-diag [att_src | att_dst] matrix
    loc,         # [K, R] int32 local window index (-1 dead/spill)
    el,          # [K*H, R] raw edge-attr logits (masked from loc)
    el_self,     # [H, R] self-loop edge logit part
    y_ref,       # [R, HC] out
    stats_ref,   # [2H, R] out: rows 0..H-1 = m, H..2H-1 = denom
    *,
    R: int,
    K: int,
    heads: int,
    C: int,
    negative_slope: float,
    has_self: bool,
    upcast_dots: bool,
):
    """Lane-clean formulation (2026-08-21 rework): ALL softmax math runs
    on [H, R] arrays (R = minor/lane dim) — the first cut sliced [R, 1]
    columns per (slot, head) and measured 9.3 ms/layer, issue-bound at
    ~1% lane utilization. Attention-dot gathers come out transposed
    ([2H, R]) directly from a dot_general against the one-hot masks, so
    no column slicing ever happens; the only per-slot heavy op is the
    feature gather matmul [R, W] x [W, HC] on the MXU."""
    W = 3 * R
    f32 = jnp.float32
    HC = heads * C

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    xw = jnp.concatenate([xw_a[:], xw_b[:], xw_c[:]], axis=0)   # [W, HC]
    a_mat = a_cat_mat[:]
    if upcast_dots:
        # interpret mode (CPU): XLA CPU can't run bf16 dots with f32
        # accumulation; upcast to reproduce MXU semantics
        xw = xw.astype(f32)
        a_mat = a_mat.astype(f32)

    # attention dots for the whole window, TRANSPOSED: [2H, W]
    ac_t = jax.lax.dot_general(a_mat, xw, (((0,), (1,)), ((), ())),
                               preferred_element_type=f32)
    ac_t_cd = ac_t.astype(xw.dtype)
    a_dst_t = ac_t[heads:, R:2 * R]                             # [H, R]

    loc_v = loc[:]                                              # [K, R]
    el_v = el[:].astype(f32)                                    # [K*H, R]
    # TRANSPOSED one-hots [W, R]: oh_t[c, r] = (c == loc[k, r]). Built by
    # broadcasting loc's native [1, R] lane layout against a dim-0 iota —
    # no relayout — and consumed by NN/TN dot_generals only (an [R, W]
    # one-hot needs either a per-slot [R,1] transpose to build or an NT
    # contraction to use; both forced Mosaic relayouts and measured
    # ~30 us/band).
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)

    # pass 1: one-hot masks + transposed attention-dot gathers + logits
    onehots_t = []
    lgs = []                                                    # [H, R] x K
    for k in range(K):
        oh_t = (rows_w == loc_v[k:k + 1, :]).astype(xw.dtype)   # [W, R]
        onehots_t.append(oh_t)
        g_ac = jnp.dot(ac_t_cd, oh_t,
                       preferred_element_type=f32)              # [2H, R]
        lg = leaky(g_ac[:heads] + a_dst_t + el_v[k * heads:(k + 1) * heads])
        lgs.append(jnp.where(loc_v[k:k + 1, :] >= 0, lg, -1e30))

    if has_self:
        self_lg = leaky(ac_t[:heads, R:2 * R] + a_dst_t + el_self[:])
        m = self_lg
    else:
        m = jnp.full((heads, R), -1e4, f32)
    for k in range(K):
        m = jnp.maximum(m, lgs[k])
    denom = jnp.zeros((heads, R), f32)
    exps = []
    for k in range(K):
        e = jnp.exp(lgs[k] - m)
        exps.append(e)
        denom = denom + e
    if has_self:
        e_self = jnp.exp(self_lg - m)
        denom = denom + e_self
    denom = jnp.maximum(denom, 1e-16)

    # head expansion (one-hot matmul, as the grid kernel): [H, R]->[R, HC]
    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 1) // C
    head_row = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 0)
    expand_mat = (head_of_col == head_row).astype(f32)

    def expand_heads(w_hr):                       # [H, R] -> [R, HC]
        return jax.lax.dot_general(
            w_hr, expand_mat, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    # pass 2: feature gathers + softmax-weighted accumulation (TN form:
    # contract the W axis of the transposed one-hot with the window).
    # y is emitted UNNORMALIZED (sum of e*x, not divided by denom): the
    # spill fold divides once by the final denominator, so normalizing
    # here would just cost an extra expand-multiply there.
    if has_self:
        y = expand_heads(e_self) * xw_b[:].astype(f32)
    else:
        y = jnp.zeros((R, HC), f32)
    for k in range(K):
        g_x = jax.lax.dot_general(onehots_t[k], xw,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)   # [R, HC]
        y = y + expand_heads(exps[k]) * g_x

    y_ref[:] = y.astype(y_ref.dtype)
    stats_ref[:] = jnp.concatenate([m, denom], axis=0).astype(
        stats_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("band_rows", "heads", "negative_slope", "has_self",
                     "compute_dtype", "interpret"),
)
def _band_part_call(xh_flat, a_cat_mat, loc_t, el_t, el_self_t, *,
                    band_rows: int, heads: int, negative_slope: float,
                    has_self: bool, compute_dtype: str,
                    interpret: bool):
    n, hc = xh_flat.shape
    r = band_rows
    t_count = n // r
    k = loc_t.shape[0]
    c = hc // heads
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def clampm1(t):
        return jnp.maximum(t - 1, 0)

    def clampp1(t):
        return jnp.minimum(t + 1, t_count - 1)

    kern = functools.partial(
        _kernel, R=r, K=k, heads=heads, C=c,
        negative_slope=negative_slope, has_self=has_self,
        upcast_dots=interpret and compute_dtype == "bfloat16",
    )
    xcd = xh_flat.astype(cd)
    y, stats = pl.pallas_call(
        kern,
        grid=(t_count,),
        in_specs=[
            pl.BlockSpec((r, hc), lambda t: (clampm1(t), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, hc), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, hc), lambda t: (clampp1(t), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((k, r), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * heads, r), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, r), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((r, hc), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * heads, r), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, hc), jnp.float32),
            jax.ShapeDtypeStruct((2 * heads, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xcd, xcd, xcd, a_cat_mat.astype(cd), loc_t, el_t, el_self_t)
    return y, stats


def ell_gat_band_part_pallas(
    xh: jax.Array,          # [N, H, C]
    a_cat_mat: jax.Array,   # [HC, 2H] block-diag [att_src | att_dst]
    el_t: jax.Array,        # [K*H, N] raw edge-attr logits (lane-clean)
    el_self_t: Optional[jax.Array],     # [H, N] or None
    banded: BandedEll,
    negative_slope: float = 0.2,
    compute_dtype: str = "float32",
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pallas band pass. Returns (y_flat [N, HC], m [N, H], denom [N, H])
    — y stays FLAT so the lane-clean spill fold
    (ops.ell_banded.banded_gat_spill_pass_flat) avoids [N, H, C]
    relayout copies."""
    if interpret is None:
        interpret = _interpret_default()
    n, h_dim, c = xh.shape
    xh_flat = xh.reshape(n, h_dim * c)
    has_self = el_self_t is not None
    if el_self_t is None:
        el_self_t = jnp.zeros((h_dim, n), xh.dtype)

    y, stats = _band_part_call(
        xh_flat, a_cat_mat, banded.loc_t, el_t, el_self_t,
        band_rows=banded.band_rows, heads=h_dim,
        negative_slope=float(negative_slope), has_self=has_self,
        compute_dtype=compute_dtype, interpret=bool(interpret),
    )
    m = stats[:h_dim].T                                     # [N, H]
    denom = stats[h_dim:].T
    return y, m, denom                                      # y flat [N, HC]
