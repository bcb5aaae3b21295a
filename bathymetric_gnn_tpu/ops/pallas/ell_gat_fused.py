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
    W = 3 * R
    f32 = jnp.float32

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    xw = jnp.concatenate([xw_a[:], xw_b[:], xw_c[:]], axis=0)   # [W, HC]
    a_mat = a_cat_mat[:]
    if upcast_dots:
        # interpret mode (CPU): XLA CPU can't run bf16 dots with f32
        # accumulation; upcast to reproduce MXU semantics
        xw = xw.astype(f32)
        a_mat = a_mat.astype(f32)

    # attention dots for the whole window: [W, 2H]
    ac_w = jnp.dot(xw, a_mat, preferred_element_type=f32)
    a_cT = ac_w[R:2 * R]                            # center rows [R, 2H]

    locT = loc[:].T                                 # [R, K] small transpose
    elT = el[:].astype(f32).T                       # [R, K*H]
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)

    onehots = []
    gathers = []
    ac_w_cd = ac_w.astype(xw.dtype)
    for k in range(K):
        oh = (cols == locT[:, k:k + 1]).astype(xw.dtype)        # [R, W]
        onehots.append(oh)
        gathers.append(jnp.dot(oh, ac_w_cd,
                               preferred_element_type=f32))     # [R, 2H]

    if has_self:
        el_sT = el_self[:].astype(f32).T                        # [R, H]

    # in-band mask per slot (loc == -1 means dead or spilled)
    in_band = [locT[:, k:k + 1] >= 0 for k in range(K)]         # [R, 1] x K

    y_parts = []
    m_parts = []
    d_parts = []
    for h in range(heads):
        a_dst_h = a_cT[:, heads + h:heads + h + 1]              # [R, 1]
        lgs = []
        for k in range(K):
            a_src_kh = gathers[k][:, h:h + 1]
            lg = leaky(a_src_kh + a_dst_h + elT[:, k * heads + h:
                                                k * heads + h + 1])
            lgs.append(jnp.where(in_band[k], lg, -1e30))
        L_h = jnp.concatenate(lgs, axis=1)                      # [R, K]
        m_h = jnp.max(L_h, axis=1, keepdims=True)               # [R, 1]
        if has_self:
            self_lg = leaky(a_cT[:, h:h + 1] + a_dst_h
                            + el_sT[:, h:h + 1])
            m_h = jnp.maximum(m_h, self_lg)
        else:
            # all-masked rows: keep m finite so exp() stays 0 for masked
            # slots and the spill renormalization stays well-defined
            m_h = jnp.maximum(m_h, -1e4)
        e_h = jnp.exp(L_h - m_h)                                # [R, K]
        denom_h = jnp.sum(e_h, axis=1, keepdims=True)
        if has_self:
            e_self = jnp.exp(self_lg - m_h)
            denom_h = denom_h + e_self
        denom_h = jnp.maximum(denom_h, 1e-16)
        inv = 1.0 / denom_h                                     # [R, 1]

        # aggregation matrix over in-band slots only (spill slots are
        # loc==-1: their onehot rows are all-zero already, so masking is
        # free — e_h columns for them still fed the denominator above)
        A_h = jnp.zeros((R, W), f32)
        for k in range(K):
            A_h = A_h + e_h[:, k:k + 1] * onehots[k].astype(f32)
        xw_h = xw[:, h * C:(h + 1) * C]                         # [W, C]
        y_h = jnp.dot(A_h.astype(xw.dtype), xw_h,
                      preferred_element_type=f32) * inv
        if has_self:
            y_h = y_h + (e_self * inv) * xw_b[:, h * C:(h + 1) * C
                                              ].astype(f32)
        y_parts.append(y_h)
        m_parts.append(m_h)
        d_parts.append(denom_h)

    y = jnp.concatenate(y_parts, axis=1)                        # [R, HC]
    y_ref[:] = y.astype(y_ref.dtype)
    stats = jnp.concatenate(m_parts + d_parts, axis=1)          # [R, 2H]
    stats_ref[:] = stats.T.astype(stats_ref.dtype)


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
    """Drop-in Pallas replacement for
    ops.ell_banded.banded_gat_band_part_xla (same output contract)."""
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
    return y.reshape(n, h_dim, c), m, denom
