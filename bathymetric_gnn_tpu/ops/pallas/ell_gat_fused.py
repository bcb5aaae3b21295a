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


def _tile_sub(a, times):
    """[H, R] -> [times*H, R] by doubling sublane concats (log2 steps)."""
    if times == 1:
        return a
    half = _tile_sub(a, times // 2)
    out = jnp.concatenate([half, half], axis=0)
    if times % 2:
        out = jnp.concatenate([out, a], axis=0)
    return out


def _reduce_sub(arr, heads, op):
    """[K*H, R] -> [H, R]: pairwise tree over the K sublane groups.

    With K*H a multiple of 8 the first splits land on vreg boundaries, so
    the reduction is ~log2(K) full-vreg ops instead of K-1 half-vreg ones
    (round-5 batched-chain rework)."""
    k = arr.shape[0] // heads
    tails = []
    while k > 1:
        if k % 2:
            tails.append(arr[(k - 1) * heads:])
            arr = arr[:(k - 1) * heads]
            k -= 1
        half = k // 2
        arr = op(arr[:half * heads], arr[half * heads:])
        k = half
    for t in tails:
        arr = op(arr, t)
    return arr


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


def _kernel_v2(
    xw_a,        # [R, HC] window chunk t-1 (clamped)
    xw_b,        # [R, HC] window chunk t   (also the destination block)
    xw_c,        # [R, HC] window chunk t+1 (clamped)
    a_cat_mat,   # [HC, 2H] block-diag [att_src | att_dst] matrix
    loc,         # [K, R] int32 local window index (-1 dead/spill)
    el,          # [K*H, R] raw edge-attr logits (masked from loc)
    el_self,     # [H, R] self-loop edge logit part
    l_spill,     # [1, H, S] leaky'd spill logits (-1e30 dead slots)
    xh_spill,    # [1, S, HC] gathered spill source features
    dst_loc,     # [1, 1, S] int32 local dst row of each spill (-1 dead)
    *rest,       # optional ([(K+1)*H, R], [1, H, S]) dropout multipliers,
                 # then out_ref [R, HC]
    R: int,
    K: int,
    heads: int,
    C: int,
    negative_slope: float,
    has_self: bool,
    upcast_dots: bool,
    has_dropout: bool,
    lowp: bool = False,
):
    """Round-3 kernel: spill edges fold IN-KERNEL (VERDICT r2 item 3).

    Differences from _kernel: (a) per-band compacted spill tables stream
    in and join the softmax by renormalization against the in-band stats
    — no XLA segment-scatter / renorm pass exists anymore; (b) the output
    is the NORMALIZED aggregation (one division in-kernel); (c) optional
    streamed dropout multipliers apply to the post-softmax weights
    (PyG semantics: the denominator uses undropped weights), shared with
    the backward kernel so fwd/bwd see the identical draw.

    Round-5 batched chains: all per-(slot, head) logit/softmax math runs
    on full-sublane [K*H, R] stacks (the r4 per-slot [H=4, R] op chains
    used half the sublanes and dominated issue slots); dead/spilled slots
    arrive PREMASKED at ~NEG_BIG in the el stream (models/conv_ell.py),
    so no per-slot where(loc >= 0) select survives. The one-hot gather
    dots stay per-slot (MXU) but the attention-dot gather is slimmed to
    the a_src half."""
    W = 3 * R
    f32 = jnp.float32
    HC = heads * C

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    xw = jnp.concatenate([xw_a[:], xw_b[:], xw_c[:]], axis=0)   # [W, HC]
    a_mat = a_cat_mat[:]
    if upcast_dots:
        xw = xw.astype(f32)
        a_mat = a_mat.astype(f32)

    ac_t = jax.lax.dot_general(a_mat, xw, (((0,), (1,)), ((), ())),
                               preferred_element_type=f32)      # [2H, W]
    ac_t_cd = ac_t.astype(xw.dtype)                             # [2H, W]
    a_dst_t = ac_t[heads:, R:2 * R]                             # [H, R]
    KH = K * heads

    loc_v = loc[:]                                              # [K, R]
    el_v = el[:].astype(f32)                                    # [KH, R]
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)

    onehots_t = []
    g_rows = []                                                 # [H, R] x K
    for k in range(K):
        oh_t = (rows_w == loc_v[k:k + 1, :]).astype(xw.dtype)   # [W, R]
        onehots_t.append(oh_t)
        g_rows.append(jnp.dot(ac_t_cd, oh_t,
                              preferred_element_type=f32)[:heads])  # [H, R]
    g_all = jnp.concatenate(g_rows, axis=0)                     # [KH, R]
    # dead/spilled slots ride el_v at ~NEG_BIG (premasked upstream);
    # leaky keeps them ~0.2*NEG_BIG, exp() flushes them to exact 0
    lg_all = leaky(g_all + _tile_sub(a_dst_t, K) + el_v)        # [KH, R]

    if has_self:
        self_lg = leaky(ac_t[:heads, R:2 * R] + a_dst_t + el_self[:])
        floor = self_lg
    else:
        floor = jnp.full((heads, R), -1e4, f32)
    m = jnp.maximum(_reduce_sub(lg_all, heads, jnp.maximum), floor)
    e_all = jnp.exp(lg_all - _tile_sub(m, K))                   # [KH, R]
    denom = _reduce_sub(e_all, heads, jnp.add)
    if has_self:
        e_self = jnp.exp(self_lg - m)
        denom = denom + e_self
    denom = jnp.maximum(denom, 1e-16)

    # ---- spill fold (exact joint softmax by renormalization) ----------
    dloc = dst_loc[0, 0, :]                                     # [S]
    s_dim = dloc.shape[0]
    # oh_rs[r, s] = (dst_loc[s] == r): dst_loc is lane-native [1, S]
    rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, s_dim), 0)
    oh_rs = (rows_r == dloc[None, :]).astype(f32)               # [R, S]
    # m at each spill's destination row: [H, S] (dead slots gather 0;
    # their l_spill is -1e30 so e_s underflows to 0 regardless)
    m_s = jax.lax.dot_general(m, oh_rs, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)       # [H, S]
    l_s = l_spill[0].astype(f32)                                # [H, S]
    # clamp guards the all-spilled-row corner (see banded_gat_spill_pass)
    e_s = jnp.exp(jnp.minimum(l_s - m_s, 60.0))                 # [H, S]
    denom_sp = jax.lax.dot_general(e_s, oh_rs, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)  # [H, R]
    denom_tot = denom + denom_sp

    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 1) // C
    head_row = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 0)
    expand_mat = (head_of_col == head_row).astype(f32)

    def expand_heads(w_hr):                       # [H, n] -> [n, HC]
        return jax.lax.dot_general(
            w_hr, expand_mat, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    ew_all = e_all
    if has_dropout:
        dm = rest[0][:].astype(f32)               # [(K+1)*H, R]
        dm_sp = rest[1][0].astype(f32)            # [H, S]
        e_s = e_s * dm_sp
        ew_all = e_all * dm[:KH]                  # one [KH, R] multiply
    out_ref = rest[-1]
    # weighted aggregation (dropout applies to weights, not the denom)
    if has_self:
        w_self = e_self * dm[KH:] if has_dropout else e_self
        y = expand_heads(w_self) * xw_b[:].astype(f32)
    else:
        y = jnp.zeros((R, HC), f32)
    for k in range(K):
        g_x = jax.lax.dot_general(onehots_t[k], xw,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)   # [R, HC]
        y = y + expand_heads(ew_all[k * heads:(k + 1) * heads]) * g_x
    # spill messages: [R, S] @ ([S, HC] weighted) — MXU, no scatter.
    # lowp: bf16 inputs + f32 accumulation (one MXU pass instead of ~4)
    if lowp and not upcast_dots:
        spcast = lambda t: t.astype(jnp.bfloat16)
    elif lowp:
        spcast = lambda t: t.astype(jnp.bfloat16).astype(f32)
    else:
        spcast = lambda t: t
    msg_sp = expand_heads(e_s) * xh_spill[0].astype(f32)        # [S, HC]
    y = y + jax.lax.dot_general(spcast(oh_rs), spcast(msg_sp),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)     # [R, HC]

    out_ref[:] = (y * expand_heads(1.0 / denom_tot)).astype(out_ref.dtype)


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


@functools.partial(
    jax.jit,
    static_argnames=("band_rows", "heads", "negative_slope", "has_self",
                     "has_dropout", "compute_dtype", "interpret"),
)
def _fused_call_v2(xh_flat, a_cat_mat, loc_t, el_t, el_self_t,
                   l_spill_b, xh_spill_b, dst_loc_b, dmask_t, dmask_sp_b, *,
                   band_rows: int, heads: int, negative_slope: float,
                   has_self: bool, has_dropout: bool, compute_dtype: str,
                   interpret: bool):
    statics = (band_rows, heads, negative_slope, has_self, has_dropout,
               compute_dtype, interpret)
    if dmask_t is None:  # custom_vjp needs concrete (dummy) mask args
        dmask_t = jnp.zeros((1, 1), jnp.float32)
        dmask_sp_b = jnp.zeros((1, 1), jnp.float32)
    return _fused_v2(statics, xh_flat, a_cat_mat, loc_t, el_t, el_self_t,
                     l_spill_b, xh_spill_b, dst_loc_b, dmask_t, dmask_sp_b)


def _run_fused_v2_forward(statics, xh_flat, a_cat_mat, loc_t, el_t,
                          el_self_t, l_spill_b, xh_spill_b, dst_loc_b,
                          dmask_t, dmask_sp_b):
    (band_rows, heads, negative_slope, has_self, has_dropout,
     compute_dtype, interpret) = statics
    n, hc = xh_flat.shape
    r = band_rows
    t_count = n // r
    k = loc_t.shape[0]
    c = hc // heads
    s_max = dst_loc_b.shape[-1]
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def clampm1(t):
        return jnp.maximum(t - 1, 0)

    def clampp1(t):
        return jnp.minimum(t + 1, t_count - 1)

    kern = functools.partial(
        _kernel_v2, R=r, K=k, heads=heads, C=c,
        negative_slope=negative_slope, has_self=has_self,
        has_dropout=has_dropout,
        upcast_dots=interpret and compute_dtype == "bfloat16",
        lowp=compute_dtype == "bfloat16",
    )
    xcd = xh_flat.astype(cd)
    in_specs = [
        pl.BlockSpec((r, hc), lambda t: (clampm1(t), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r, hc), lambda t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, hc), lambda t: (clampp1(t), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((k, r), lambda t: (0, t), memory_space=pltpu.VMEM),
        pl.BlockSpec((k * heads, r), lambda t: (0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, r), lambda t: (0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, s_max), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_max, hc), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s_max), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xcd, xcd, xcd, a_cat_mat.astype(cd), loc_t, el_t, el_self_t,
            l_spill_b, xh_spill_b.astype(cd), dst_loc_b]
    if has_dropout:
        in_specs.append(pl.BlockSpec(((k + 1) * heads, r), lambda t: (0, t),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, heads, s_max), lambda t: (t, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.extend([dmask_t, dmask_sp_b])
    out = pl.pallas_call(
        kern,
        grid=(t_count,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r, hc), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        # emit in the stream dtype: a bf16 layer output keeps the whole
        # inter-layer chain (bias, BN, next projection) in bf16 —
        # softmax/accumulation inside the kernel stay f32 (round 4)
        out_shape=jax.ShapeDtypeStruct((n, hc), cd),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out


def ell_gat_fused_pallas(
    xh: jax.Array,          # [N, H, C] transformed features
    a_src: jax.Array,       # [N, H] attention dots (for spill logits)
    a_dst: jax.Array,       # [N, H]
    a_cat_mat: jax.Array,   # [HC, 2H] block-diag [att_src | att_dst]
    el_t: jax.Array,        # [K*H, N] raw edge-attr logits (lane-clean)
    el_self_t: Optional[jax.Array],     # [H, N] or None
    m_edge: Optional[jax.Array],        # [Fe, H] edge-logit matrix
    banded: BandedEll,
    negative_slope: float = 0.2,
    compute_dtype: str = "float32",
    dropout_masks: Optional[Tuple[jax.Array, jax.Array]] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Round-3 fused banded GAT layer: ONE kernel, normalized output.

    Spill edges are folded inside the kernel from per-band compacted
    tables (BandedEll.spill_*_b); the only XLA work left is the spill
    gather (one combined [xh | a_src] row gather) + tiny logit math.
    Replaces band kernel + banded_gat_spill_pass_flat (VERDICT r2 item 3:
    the scatter + renorm pass was ~half of the 3.2 ms layer).

    ``dropout_masks``: optional ([(K+1)*H, N], [T, H, S_max]) post-softmax
    weight multipliers (0 or 1/(1-p)); generated OUTSIDE with jax.random
    so forward/backward/XLA-replay see the identical draw (same scheme as
    the grid kernel, ops/pallas/grid_gat_fused.py).
    """
    if interpret is None:
        interpret = _interpret_default()
    n, h_dim, c = xh.shape
    hc = h_dim * c
    xh_flat = xh.reshape(n, hc)
    has_self = el_self_t is not None
    if el_self_t is None:
        el_self_t = jnp.zeros((h_dim, n), xh.dtype)

    # spill tables: separate row gathers (a concat([xh | a_src]) table
    # costs a full [N, HC+H] HBM round trip + a slice-apart copy per
    # layer — profiled at ~400 us of the 2.6 ms layer; the split gathers
    # read only what they fetch)
    from ..ell_banded import gather_rows_reduce_bwd

    t_count, s_max = banded.spill_src_b.shape
    flat_src = banded.spill_src_b.reshape(-1)
    flat_dst = banded.spill_dst_b.reshape(-1)
    # gather in the compute dtype: S_max padding makes the spill table
    # ~2x the live spill rows, so halving its bytes matters (bf16 path).
    # All three gathers route their BACKWARD through the Pallas
    # sorted-segment reducer (one-hot matmuls over contiguous permuted
    # cotangent ranges) — XLA lowers even sorted segment_sum to
    # scatter-add, ~1.2 ms per [65k, 256] cotangent on v5e.
    gather_src = (xh_flat.astype(jnp.bfloat16)
                  if compute_dtype == "bfloat16" else xh_flat)
    xh_spill_b = gather_rows_reduce_bwd(
        banded.spill_red_maxj, gather_src, flat_src, banded.spill_perm,
        banded.spill_src_sorted, banded.spill_red_first,
        banded.spill_red_jcount).reshape(t_count, s_max, hc)
    a_src_s = gather_rows_reduce_bwd(
        banded.spill_red_maxj, a_src, flat_src, banded.spill_perm,
        banded.spill_src_sorted, banded.spill_red_first,
        banded.spill_red_jcount)
    a_dst_s = gather_rows_reduce_bwd(
        banded.spill_red_maxj_d, a_dst, flat_dst, banded.spill_perm_d,
        banded.spill_dst_sorted, banded.spill_red_first_d,
        banded.spill_red_jcount_d)
    el_sp = (banded.spill_eattr_b.reshape(-1, banded.spill_eattr_b.shape[-1])
             @ m_edge if m_edge is not None else 0.0)
    l_s = jax.nn.leaky_relu(a_src_s + a_dst_s + el_sp, negative_slope)
    dead = banded.spill_dst_local_b.reshape(-1) < 0
    l_s = jnp.where(dead[:, None], -1e30, l_s)
    l_spill_b = l_s.reshape(t_count, s_max, h_dim).transpose(0, 2, 1)

    dmask_t, dmask_sp_b = (dropout_masks if dropout_masks is not None
                           else (None, None))
    return _fused_call_v2(
        xh_flat, a_cat_mat, banded.loc_t, el_t, el_self_t,
        l_spill_b, xh_spill_b, banded.spill_dst_local_b,
        dmask_t, dmask_sp_b,
        band_rows=banded.band_rows, heads=h_dim,
        negative_slope=float(negative_slope), has_self=has_self,
        has_dropout=dropout_masks is not None,
        compute_dtype=compute_dtype, interpret=bool(interpret),
    )


def _bwd_kernel_v2(
    xw_a, xw_b, xw_c,       # [R, HC] window chunks (as forward)
    a_cat_mat,              # [HC, 2H]
    loc,                    # [K, R]
    el,                     # [K*H, R]
    el_self,                # [H, R]
    l_spill,                # [1, H, S]
    xh_spill,               # [1, S, HC]
    dst_loc,                # [1, 1, S]
    *rest,                  # optional (dmask [(K+1)*H, R], dmask_sp
                            # [1, H, S]), then dout [R, HC], then the 8
                            # output refs (dxa, dxb, dxc, del, del_self,
                            # dl_spill, dxh_spill, da_mat)
    R: int,
    K: int,
    heads: int,
    C: int,
    negative_slope: float,
    has_self: bool,
    upcast_dots: bool,
    has_dropout: bool,
    lowp: bool = False,
):
    """Backward of _kernel_v2, flash-style: residuals are just the layer
    inputs; the attention softmax (incl. the in-kernel spill fold) is
    recomputed per band, then the kernel emits

    ``lowp`` (compute_dtype=bfloat16): the one-hot scatter dots and the
    dx/da epilogue matmuls run with bf16 inputs + f32 accumulation — the
    same contract as the grid backward kernel (f32 MXU passes cost ~4x
    bf16; softmax recompute and the attention-gradient chains stay f32).
    ``upcast_dots`` emulates the MXU semantics in CPU interpret mode.

      * dxw split into center + two halo partials (dxa/dxb/dxc) — band t
        touches window chunks t-1..t+1, so XLA shift-adds the three
        streams (clamped windows contribute exact zeros at the edges),
      * cotangents for the el / el_self / l_spill logit streams and the
        gathered spill features (XLA's own vjps route them to params and
        the spill-gather scatter-add),
      * per-band partial d(a_cat_mat), accumulated in-place across the
        sequential grid.

    Dropout masks stream back in unchanged, so fwd/bwd see the identical
    draw (VERDICT r2 item 2). m is treated as a constant: scaling every
    exp term by e^delta leaves the normalized output invariant, so its
    gradient is exactly zero (the min(l-m, 60) clamp gradient is dropped;
    it only binds when spill terms dominate astronomically, where the
    normalized gradient underflows anyway)."""
    W = 3 * R
    f32 = jnp.float32
    HC = heads * C

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    def dleaky(v):
        return jnp.where(v >= 0, 1.0, negative_slope)

    if has_dropout:
        dm_all = rest[0][:].astype(f32)
        dm_sp = rest[1][0].astype(f32)
        rest = rest[2:]
    dout = rest[0]
    (dxa_ref, dxb_ref, dxc_ref, del_ref, del_self_ref, dl_spill_ref,
     dxh_spill_ref, da_mat_ref) = rest[1:9]

    xw = jnp.concatenate([xw_a[:], xw_b[:], xw_c[:]], axis=0)   # [W, HC]
    a_mat = a_cat_mat[:]
    if upcast_dots:
        xw = xw.astype(f32)
        a_mat = a_mat.astype(f32)

    # ---- forward recompute (identical to _kernel_v2) -------------------
    ac_t = jax.lax.dot_general(a_mat, xw, (((0,), (1,)), ((), ())),
                               preferred_element_type=f32)      # [2H, W]
    ac_src_cd = ac_t[:heads].astype(xw.dtype)                   # [H, W]
    a_dst_t = ac_t[heads:, R:2 * R]
    KH = K * heads

    loc_v = loc[:]
    el_v = el[:].astype(f32)
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)

    onehots_t = []
    g_rows = []
    for k in range(K):
        oh_t = (rows_w == loc_v[k:k + 1, :]).astype(xw.dtype)
        onehots_t.append(oh_t)
        g_rows.append(jnp.dot(ac_src_cd, oh_t,
                              preferred_element_type=f32))      # [H, R]
    g_all = jnp.concatenate(g_rows, axis=0)                     # [KH, R]
    pre_all = g_all + _tile_sub(a_dst_t, K) + el_v              # [KH, R]
    lg_all = leaky(pre_all)

    if has_self:
        pre_self = ac_t[:heads, R:2 * R] + a_dst_t + el_self[:]
        self_lg = leaky(pre_self)
        floor = self_lg
    else:
        floor = jnp.full((heads, R), -1e4, f32)
    m = jnp.maximum(_reduce_sub(lg_all, heads, jnp.maximum), floor)
    e_all = jnp.exp(lg_all - _tile_sub(m, K))                   # [KH, R]
    denom = _reduce_sub(e_all, heads, jnp.add)
    if has_self:
        e_self = jnp.exp(self_lg - m)
        denom = denom + e_self
    denom = jnp.maximum(denom, 1e-16)

    dloc = dst_loc[0, 0, :]
    s_dim = dloc.shape[0]
    rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, s_dim), 0)
    oh_rs = (rows_r == dloc[None, :]).astype(f32)               # [R, S]
    m_s = jax.lax.dot_general(m, oh_rs, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)       # [H, S]
    l_s = l_spill[0].astype(f32)
    e_s = jnp.exp(jnp.minimum(l_s - m_s, 60.0))                 # [H, S]
    denom_sp = jax.lax.dot_general(e_s, oh_rs, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)
    denom_tot = denom + denom_sp
    inv_d = 1.0 / denom_tot                                     # [H, R]

    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 1) // C
    head_row = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 0)
    expand_mat = (head_of_col == head_row).astype(f32)

    def expand_heads(w_hr):                       # [H, n] -> [n, HC]
        return jax.lax.dot_general(
            w_hr, expand_mat, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def contract_heads(v_nhc):                    # [n, HC] -> [H, n]
        return jax.lax.dot_general(
            expand_mat, v_nhc, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    if has_dropout:
        dmk_all = dm_all[:KH]                                   # [KH, R]
        dms = dm_all[KH:]
        dmsp = dm_sp
    else:
        dmk_all = None
        dms = jnp.ones((heads, R), f32)
        dmsp = jnp.ones((heads, s_dim), f32)
    ew_all = e_all * dmk_all if has_dropout else e_all          # [KH, R]

    # ---- gradient math (round-5 batched [KH, R] chains) ---------------
    if lowp and not upcast_dots:
        cast = lambda t: t.astype(jnp.bfloat16)
    elif lowp:  # interpret emulation: round like the MXU would
        cast = lambda t: t.astype(jnp.bfloat16).astype(f32)
    else:
        cast = lambda t: t
    u = dout[:].astype(f32)                                     # [R, HC]
    dy = u * expand_heads(inv_d)                                # [R, HC]
    xw_f32 = xw.astype(f32)
    xw_b32 = xw_b[:].astype(f32)
    xh_sp = xh_spill[0].astype(f32)                             # [S, HC]

    # per-slot feature gathers + A_k stack
    gxs, a_rows = [], []
    for k in range(K):
        g_x = jax.lax.dot_general(onehots_t[k], xw,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)   # [R, HC]
        gxs.append(g_x)
        a_rows.append(contract_heads(dy * g_x))                 # [H, R]
    A_all = jnp.concatenate(a_rows, axis=0)                     # [KH, R]
    sum_eA = _reduce_sub(ew_all * A_all, heads, jnp.add)        # [H, R]
    if has_self:
        b_self = contract_heads(dy * xw_b32)                    # [H, R]
        sum_eA = sum_eA + e_self * dms * b_self
    # spill pieces
    dM = jax.lax.dot_general(cast(oh_rs), cast(dy),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=f32)        # [S, HC]
    c_s = contract_heads(dM * xh_sp)                            # [H, S]
    sc_sp = jax.lax.dot_general(e_s * dmsp * c_s, oh_rs,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)     # [H, R]
    sum_eA = sum_eA + sc_sp

    ddenom = -sum_eA * inv_d                                    # [H, R]

    # in-band slots: one [KH, R] chain for the attention-weight gradients
    de_all = (dmk_all * A_all if has_dropout else A_all) \
        + _tile_sub(ddenom, K)
    dl_all = (e_all * de_all) * dleaky(pre_all)                 # [KH, R]
    dl_sum = _reduce_sub(dl_all, heads, jnp.add)
    dac_src = jnp.zeros((heads, W), f32)
    dxw = jnp.zeros((W, HC), f32)
    for k in range(K):
        dac_src = dac_src + jax.lax.dot_general(
            dl_all[k * heads:(k + 1) * heads], onehots_t[k].astype(f32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                         # [H, W]
        dgx_k = expand_heads(ew_all[k * heads:(k + 1) * heads]) * dy
        dxw = dxw + jax.lax.dot_general(
            cast(onehots_t[k].astype(f32)), cast(dgx_k),
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                         # [W, HC]

    zeros_hr = jnp.zeros((heads, R), f32)
    if has_self:
        de_self = dms * b_self + ddenom
        dlg_self = e_self * de_self
        dl_self = dlg_self * dleaky(pre_self)                   # [H, R]
        del_self_ref[:] = dl_self.astype(del_self_ref.dtype)
        dac_src = dac_src + jnp.concatenate(
            [zeros_hr, dl_self, zeros_hr], axis=1)
        dl_sum_c = dl_sum + dl_self
        # self feature term
        dxw = dxw + jnp.concatenate(
            [jnp.zeros((R, HC), f32),
             expand_heads(e_self * dms) * dy,
             jnp.zeros((R, HC), f32)], axis=0)
    else:
        del_self_ref[:] = jnp.zeros((heads, R), del_self_ref.dtype)
        dl_sum_c = dl_sum

    dac_dst = jnp.concatenate([zeros_hr, dl_sum_c, zeros_hr], axis=1)
    dac = jnp.concatenate([dac_src, dac_dst], axis=0)           # [2H, W]

    # attention-dot backward: dxw += a_mat @ dac; da_mat partial
    dxw = dxw + jax.lax.dot_general(
        cast(dac), cast(a_mat.astype(f32)), (((0,), (1,)), ((), ())),
        preferred_element_type=f32)                             # [W, HC]
    # (da_mat stays f32: a tiny [HC, W]x[W, 2H] dot, but its cross-band
    # accumulation is cancellation-prone — bf16 inputs cost 6% rel-L2 on
    # the attention-dot grads for no measurable speed win)
    da_mat_part = jax.lax.dot_general(
        xw_f32, dac, (((0,), (1,)), ((), ())),
        preferred_element_type=f32)                             # [HC, 2H]

    # spill cotangents
    de_s = dmsp * c_s + jax.lax.dot_general(
        ddenom, oh_rs, (((1,), (0,)), ((), ())),
        preferred_element_type=f32)                             # [H, S]
    dl_s = e_s * de_s
    dl_spill_ref[:] = dl_s[None].astype(dl_spill_ref.dtype)
    dxh_spill_ref[:] = (expand_heads(e_s * dmsp) * dM)[None].astype(
        dxh_spill_ref.dtype)

    del_ref[:] = dl_all.astype(del_ref.dtype)
    dxa_ref[:] = dxw[:R].astype(dxa_ref.dtype)
    dxb_ref[:] = dxw[R:2 * R].astype(dxb_ref.dtype)
    dxc_ref[:] = dxw[2 * R:].astype(dxc_ref.dtype)

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        da_mat_ref[:] = da_mat_part.astype(da_mat_ref.dtype)

    @pl.when(t != 0)
    def _():
        da_mat_ref[:] = da_mat_ref[:] + da_mat_part.astype(da_mat_ref.dtype)


def _float0_zeros(x):
    import numpy as _np

    return _np.zeros(x.shape, jax.dtypes.float0)


def _run_fused_v2_bwd(statics, res, g):
    (band_rows, heads, negative_slope, has_self, has_dropout,
     compute_dtype, interpret) = statics
    (xh_flat, a_cat_mat, loc_t, el_t, el_self_t,
     l_spill_b, xh_spill_b, dst_loc_b, dmask_t, dmask_sp_b) = res
    n, hc = xh_flat.shape
    r = band_rows
    t_count = n // r
    k = loc_t.shape[0]
    c = hc // heads
    s_max = dst_loc_b.shape[-1]
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def clampm1(t):
        return jnp.maximum(t - 1, 0)

    def clampp1(t):
        return jnp.minimum(t + 1, t_count - 1)

    kern = functools.partial(
        _bwd_kernel_v2, R=r, K=k, heads=heads, C=c,
        negative_slope=negative_slope, has_self=has_self,
        has_dropout=has_dropout,
        upcast_dots=interpret and compute_dtype == "bfloat16",
        lowp=compute_dtype == "bfloat16",
    )
    xcd = xh_flat.astype(cd)
    in_specs = [
        pl.BlockSpec((r, hc), lambda t: (clampm1(t), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r, hc), lambda t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, hc), lambda t: (clampp1(t), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((k, r), lambda t: (0, t), memory_space=pltpu.VMEM),
        pl.BlockSpec((k * heads, r), lambda t: (0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, r), lambda t: (0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, s_max), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_max, hc), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s_max), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xcd, xcd, xcd, a_cat_mat.astype(cd), loc_t, el_t, el_self_t,
            l_spill_b, xh_spill_b.astype(cd), dst_loc_b]
    if has_dropout:
        in_specs.append(pl.BlockSpec(((k + 1) * heads, r), lambda t: (0, t),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, heads, s_max), lambda t: (t, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.extend([dmask_t, dmask_sp_b])
    in_specs.append(pl.BlockSpec((r, hc), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM))
    # stream the output cotangent in compute dtype — the kernel upcasts
    # to f32 internally; upcasting HERE materialized an extra [N, HC] f32
    # copy per layer in bf16 mode (same finding as the grid path, r4)
    args.append(g.astype(cd))

    f32 = jnp.float32
    out_specs = (
        pl.BlockSpec((r, hc), lambda t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, hc), lambda t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, hc), lambda t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k * heads, r), lambda t: (0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, r), lambda t: (0, t), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, s_max), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_max, hc), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hc, 2 * heads), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        # the three dxw streams are the bwd's biggest HBM writes
        # (3x [N, HC] + the shift-combine reads); emitting them in the
        # stream dtype halves that traffic in bf16 mode — each is a
        # partial sum of distinct contributions, so bf16 rounding here
        # matches the mixed-precision contract of the rest of the path
        jax.ShapeDtypeStruct((n, hc), cd),             # dxa (halo t-1)
        jax.ShapeDtypeStruct((n, hc), cd),             # dxb (center)
        jax.ShapeDtypeStruct((n, hc), cd),             # dxc (halo t+1)
        jax.ShapeDtypeStruct((k * heads, n), f32),     # del_t
        jax.ShapeDtypeStruct((heads, n), f32),         # del_self_t
        jax.ShapeDtypeStruct((t_count, heads, s_max), f32),   # dl_spill
        jax.ShapeDtypeStruct((t_count, s_max, hc), f32),      # dxh_spill
        jax.ShapeDtypeStruct((hc, 2 * heads), f32),    # da_cat_mat
    )
    dxa, dxb, dxc, del_t, del_self_t, dl_spill_b, dxh_spill_b, da_mat = (
        pl.pallas_call(
            kern,
            grid=(t_count,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)
    )
    zero_rhc = jnp.zeros((r, hc), cd)
    # band t's dxa belongs to chunk t-1 and dxc to chunk t+1; block 0 of
    # dxa / block T-1 of dxc are exact zeros (clamped windows have no
    # in-band slots there) and drop out of the shifts
    dxh = (dxb
           + jnp.concatenate([dxa[r:], zero_rhc], axis=0)
           + jnp.concatenate([zero_rhc, dxc[:-r]], axis=0))
    return (dxh.astype(xh_flat.dtype), da_mat.astype(a_cat_mat.dtype),
            _float0_zeros(loc_t), del_t.astype(el_t.dtype),
            del_self_t.astype(el_self_t.dtype),
            dl_spill_b.astype(l_spill_b.dtype),
            dxh_spill_b.astype(xh_spill_b.dtype),
            _float0_zeros(dst_loc_b),
            jnp.zeros_like(dmask_t), jnp.zeros_like(dmask_sp_b))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_v2(statics, xh_flat, a_cat_mat, loc_t, el_t, el_self_t,
              l_spill_b, xh_spill_b, dst_loc_b, dmask_t, dmask_sp_b):
    return _run_fused_v2_forward(
        statics, xh_flat, a_cat_mat, loc_t, el_t, el_self_t,
        l_spill_b, xh_spill_b, dst_loc_b, dmask_t, dmask_sp_b)


def _fused_v2_fwd(statics, *args):
    return _run_fused_v2_forward(statics, *args), args


_fused_v2.defvjp(_fused_v2_fwd, _run_fused_v2_bwd)


# ---------------------------------------------------------------------------
# Round-5 WIDE kernels (v3): one [K*R, ...] stack per band instead of K
# per-slot op groups.
#
# The v2 kernels issue ~46 small MXU dots per band in the backward (K each
# of: attention-dot gathers, feature gathers, dac scatters, dxw scatters,
# head contractions/expansions) — profiled dispatch-bound, not FLOP-bound
# (3.34 ms bwd vs a ~1.2 ms MXU floor on the 65k/k=8 workload). v3 builds
# ONE transposed one-hot [K*R, W] per band (row-stacked from the natural
# [N, K] loc layout, so the stack is a free aligned concat) and runs the
# gather, scatter, attention-projection and head-contraction as single
# wide MXU dots; softmax/gradient chains run on [H, K*R] lane stacks.
#
# The spill path is also folded further (VERDICT r4 item 5): a_src of
# spill sources is computed IN-KERNEL from the already-streamed xh_spill
# rows (a_src = xh @ a_mat is linear, so gather-then-project ==
# project-then-gather), and a_dst of spill destinations is gathered
# in-kernel from the band's own attention dots via the dst one-hot — the
# two narrow [N->S, 4-lane] XLA row gathers and their backward
# segment-reduce scatters disappear entirely; the only XLA-side spill
# work left is the wide xh row gather and the el-logit einsum.
# ---------------------------------------------------------------------------


def _seed_tile(drop_seed):
    """Embed the (2,) int32 seed into an (8, 128) i32 tile at [0, :2]
    (same convention as the grid kernels)."""
    return jnp.zeros((8, 128), jnp.int32).at[0, :2].set(
        drop_seed.astype(jnp.int32))


def _gen_band_drops(seed_ref, band, heads, in_cols, s_cols, keep_prob):
    """In-kernel attention-dropout multipliers for ONE band: the draw is
    a pure function of (layer seed, band index) — band t's masks are
    only ever consumed by band t's forward and backward, so fwd/bwd
    regenerate the identical stream with no halo logic (simpler than the
    grid kernels' neighbor-block regeneration). One `prng_seed` + two
    `prng_random_bits` per band. prng_random_bits yields SIGNED int32 —
    compare in the uint32 domain (grid round-4 lesson: the signed
    comparison realized 0.70 drop at p=0.2)."""
    import numpy as _np

    thresh = _np.uint32(min(2 ** 32 - 1,
                            int(round((1.0 - keep_prob) * 2 ** 32))))
    inv = _np.float32(1.0 / keep_prob)
    pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] + band)
    bits_in = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits((heads, in_cols)), jnp.uint32)
    bits_sp = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits((heads, s_cols)), jnp.uint32)
    dm_in = jnp.where(bits_in >= thresh, inv, 0.0)
    dm_sp = jnp.where(bits_sp >= thresh, inv, 0.0)
    return dm_in, dm_sp


def _tile_lane(a, times):
    """[H, R] -> [H, times*R] by doubling lane concats."""
    if times == 1:
        return a
    half = _tile_lane(a, times // 2)
    out = jnp.concatenate([half, half], axis=1)
    if times % 2:
        out = jnp.concatenate([out, a], axis=1)
    return out


def _reduce_lane(arr, r, op):
    """[H, K*R] -> [H, R]: pairwise tree over the K lane groups."""
    k = arr.shape[1] // r
    tails = []
    while k > 1:
        if k % 2:
            tails.append(arr[:, (k - 1) * r:])
            arr = arr[:, :(k - 1) * r]
            k -= 1
        half = k // 2
        arr = op(arr[:, :half * r], arr[:, half * r:])
        k = half
    for t in tails:
        arr = op(arr, t)
    return arr


def _kernel_v3(
    xw_a,        # [R, HC] window chunk t-1 (clamped)
    xw_b,        # [R, HC] window chunk t   (also the destination block)
    xw_c,        # [R, HC] window chunk t+1 (clamped)
    a_cat_mat,   # [HC, 2H] block-diag [att_src | att_dst] matrix
    loc_nb,      # [R, K] int32 local window index (-1 dead/spill)
    el_w,        # [1, H, K*R] edge-attr logits, band-wide lane order,
                 # dead/spilled slots premasked at ~NEG_BIG
    el_self,     # [H, R] self-loop edge logit part
    el_sp,       # [1, H, S] spill edge-attr logits (-1e30 dead slots)
    xh_spill,    # [1, S, HC] gathered spill source features
    dst_loc,     # [1, 1, S] int32 local dst row of each spill (-1 dead)
    *rest,       # dropout streams — ([1, H, (K+1)*R], [1, H, S])
                 # multipliers (streamed mode) or an [8, 128] i32 seed
                 # tile (rng mode) — then out_ref [R, HC]
    R: int,
    K: int,
    heads: int,
    C: int,
    negative_slope: float,
    has_self: bool,
    upcast_dots: bool,
    has_dropout: bool,
    rng_drop: bool = False,
    keep_prob: float = 1.0,
    lowp: bool = False,
):
    W = 3 * R
    f32 = jnp.float32
    HC = heads * C
    KR = K * R

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    xw = jnp.concatenate([xw_a[:], xw_b[:], xw_c[:]], axis=0)   # [W, HC]
    a_mat = a_cat_mat[:]
    if upcast_dots:
        xw = xw.astype(f32)
        a_mat = a_mat.astype(f32)
    a_mat32 = a_mat.astype(f32)

    # center attention dots (self a_src + all a_dst): [2H, R]
    ac_c = jax.lax.dot_general(a_mat, xw_b[:].astype(xw.dtype),
                               (((0,), (1,)), ((), ())),
                               preferred_element_type=f32)
    a_dst_t = ac_c[heads:]                                      # [H, R]

    # transposed one-hot stack [K*R, W]: row k*R+r selects window column
    # loc[r, k]; rows for dead/spilled slots (-1) are all-zero
    loc_v = loc_nb[:]                                           # [R, K]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    ohT = jnp.concatenate(
        [(loc_v[:, k:k + 1] == iota_w).astype(xw.dtype) for k in range(K)],
        axis=0)                                                 # [KR, W]
    # ALL K feature gathers as one wide MXU dot
    g_x_all = jax.lax.dot_general(ohT, xw, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)   # [KR, HC]
    # a_src of every gathered neighbor: project the gathered rows (linear,
    # so identical to gathering precomputed dots) — [2H, KR], src half used
    g2 = jax.lax.dot_general(a_mat32, g_x_all, (((0,), (1,)), ((), ())),
                             preferred_element_type=f32)
    lg_w = leaky(g2[:heads] + _tile_lane(a_dst_t, K)
                 + el_w[0].astype(f32))                         # [H, KR]

    if has_self:
        self_lg = leaky(ac_c[:heads] + a_dst_t + el_self[:])
        floor = self_lg
    else:
        floor = jnp.full((heads, R), -1e4, f32)
    m = jnp.maximum(_reduce_lane(lg_w, R, jnp.maximum), floor)  # [H, R]
    e_w = jnp.exp(lg_w - _tile_lane(m, K))                      # [H, KR]
    denom = _reduce_lane(e_w, R, jnp.add)
    if has_self:
        e_self = jnp.exp(self_lg - m)
        denom = denom + e_self
    denom = jnp.maximum(denom, 1e-16)

    # ---- spill fold: logits fully in-kernel ---------------------------
    dloc = dst_loc[0, 0, :]                                     # [S]
    s_dim = dloc.shape[0]
    rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, s_dim), 0)
    oh_rs = (rows_r == dloc[None, :]).astype(f32)               # [R, S]
    xh_sp_cd = xh_spill[0]                                      # [S, HC] cd
    if upcast_dots:
        xh_sp_cd = xh_sp_cd.astype(f32)
    a_sp2 = jax.lax.dot_general(a_mat, xh_sp_cd, (((0,), (1,)), ((), ())),
                                preferred_element_type=f32)     # [2H, S]
    a_dst_sp = jax.lax.dot_general(a_dst_t, oh_rs, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)  # [H, S]
    pre_sp = a_sp2[:heads] + a_dst_sp + el_sp[0].astype(f32)    # [H, S]
    l_s = leaky(pre_sp)
    m_s = jax.lax.dot_general(m, oh_rs, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)       # [H, S]
    e_s = jnp.exp(jnp.minimum(l_s - m_s, 60.0))                 # [H, S]
    denom_sp = jax.lax.dot_general(e_s, oh_rs, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)  # [H, R]
    denom_tot = denom + denom_sp

    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 1) // C
    head_row = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 0)
    expand_mat = (head_of_col == head_row).astype(f32)

    def expand_heads(w_hr):                       # [H, n] -> [n, HC]
        return jax.lax.dot_general(
            w_hr, expand_mat, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    ew = e_w
    if rng_drop:
        dm, dm_sp = _gen_band_drops(rest[0], pl.program_id(0), heads,
                                    (K + 1) * R, s_dim, keep_prob)
        e_s = e_s * dm_sp
        ew = e_w * dm[:, :KR]
    elif has_dropout:
        dm = rest[0][0].astype(f32)               # [H, (K+1)*R]
        dm_sp = rest[1][0].astype(f32)            # [H, S]
        e_s = e_s * dm_sp
        ew = e_w * dm[:, :KR]
    out_ref = rest[-1]
    if has_self:
        w_self = e_self * dm[:, KR:] if has_dropout else e_self
        y = expand_heads(w_self) * xw_b[:].astype(f32)
    else:
        y = jnp.zeros((R, HC), f32)
    # y accumulation: at wide HC one expand dot + multiply + pairwise
    # tree wins (per-slot expand dots were ~half the fwd dispatches); at
    # narrow HC the [KR, HC] msgs materialization costs more than the
    # saved dispatches (measured 949 -> 1110 us at HC=64), so keep the
    # fused per-slot multiply-accumulate there.
    if HC >= 128:
        msgs = expand_heads(ew) * g_x_all                       # [KR, HC]
        y = y + _reduce_sub(msgs, R, jnp.add)
    else:
        for k in range(K):
            y = y + (expand_heads(ew[:, k * R:(k + 1) * R])
                     * g_x_all[k * R:(k + 1) * R])
    if lowp and not upcast_dots:
        spcast = lambda t: t.astype(jnp.bfloat16)
    elif lowp:
        spcast = lambda t: t.astype(jnp.bfloat16).astype(f32)
    else:
        spcast = lambda t: t
    msg_sp = expand_heads(e_s) * xh_spill[0].astype(f32)        # [S, HC]
    y = y + jax.lax.dot_general(spcast(oh_rs), spcast(msg_sp),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)     # [R, HC]

    out_ref[:] = (y * expand_heads(1.0 / denom_tot)).astype(out_ref.dtype)


def _bwd_kernel_v3(
    xw_a, xw_b, xw_c,       # [R, HC] window chunks (as forward)
    a_cat_mat,              # [HC, 2H]
    loc_nb,                 # [R, K]
    el_w,                   # [1, H, K*R]
    el_self,                # [H, R]
    el_sp,                  # [1, H, S]
    xh_spill,               # [1, S, HC]
    dst_loc,                # [1, 1, S]
    *rest,                  # dropout streams (streamed: dm [1, H,
                            # (K+1)*R] + dm_sp [1, H, S]; rng: [8, 128]
                            # i32 seed tile), then dout [R, HC], then
                            # the 6 output refs (dxh, del_w, del_self,
                            # del_sp, dxh_spill, da_mat) and 2 VMEM
                            # scratch refs (pend, cxc_hold)
    R: int,
    K: int,
    heads: int,
    C: int,
    negative_slope: float,
    has_self: bool,
    upcast_dots: bool,
    has_dropout: bool,
    T: int = 0,
    rng_drop: bool = False,
    keep_prob: float = 1.0,
    lowp: bool = False,
):
    """Backward of _kernel_v3, flash-style recompute. m is constant (see
    _bwd_kernel_v2 docstring); the attention-projection gradients flow
    through g_x_all/xh_spill instead of a window-level dac_src — v3
    computes a_src by projecting gathered rows, so d(a_src-path) lands on
    the gathered features and rides the SAME wide scatter dot as the
    message-path cotangent."""
    W = 3 * R
    f32 = jnp.float32
    HC = heads * C
    KR = K * R

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    def dleaky(v):
        return jnp.where(v >= 0, 1.0, negative_slope)

    if rng_drop:
        dm_in, dm_sp = _gen_band_drops(
            rest[0], pl.program_id(0), heads, (K + 1) * R,
            dst_loc.shape[-1], keep_prob)
        rest = rest[1:]
    elif has_dropout:
        dm_in = rest[0][0].astype(f32)            # [H, (K+1)*R]
        dm_sp = rest[1][0].astype(f32)            # [H, S]
        rest = rest[2:]
    dout = rest[0]
    (dxh_ref, del_w_ref, del_self_ref, del_sp_ref,
     dxh_spill_ref, da_mat_ref, pend_ref, cxc_ref) = rest[1:9]

    xw = jnp.concatenate([xw_a[:], xw_b[:], xw_c[:]], axis=0)   # [W, HC]
    a_mat = a_cat_mat[:]
    if upcast_dots:
        xw = xw.astype(f32)
        a_mat = a_mat.astype(f32)
    a_mat32 = a_mat.astype(f32)

    # ---- forward recompute (identical to _kernel_v3) -------------------
    ac_c = jax.lax.dot_general(a_mat, xw_b[:].astype(xw.dtype),
                               (((0,), (1,)), ((), ())),
                               preferred_element_type=f32)      # [2H, R]
    a_dst_t = ac_c[heads:]

    loc_v = loc_nb[:]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    ohT = jnp.concatenate(
        [(loc_v[:, k:k + 1] == iota_w).astype(xw.dtype) for k in range(K)],
        axis=0)                                                 # [KR, W]
    g_x_all = jax.lax.dot_general(ohT, xw, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)   # [KR, HC]
    g2 = jax.lax.dot_general(a_mat32, g_x_all, (((0,), (1,)), ((), ())),
                             preferred_element_type=f32)        # [2H, KR]
    pre_w = g2[:heads] + _tile_lane(a_dst_t, K) + el_w[0].astype(f32)
    lg_w = leaky(pre_w)

    if has_self:
        pre_self = ac_c[:heads] + a_dst_t + el_self[:]
        self_lg = leaky(pre_self)
        floor = self_lg
    else:
        floor = jnp.full((heads, R), -1e4, f32)
    m = jnp.maximum(_reduce_lane(lg_w, R, jnp.maximum), floor)
    e_w = jnp.exp(lg_w - _tile_lane(m, K))
    denom = _reduce_lane(e_w, R, jnp.add)
    if has_self:
        e_self = jnp.exp(self_lg - m)
        denom = denom + e_self
    denom = jnp.maximum(denom, 1e-16)

    dloc = dst_loc[0, 0, :]
    s_dim = dloc.shape[0]
    rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, s_dim), 0)
    oh_rs = (rows_r == dloc[None, :]).astype(f32)               # [R, S]
    xh_sp_cd = xh_spill[0]
    if upcast_dots:
        xh_sp_cd = xh_sp_cd.astype(f32)
    a_sp2 = jax.lax.dot_general(a_mat, xh_sp_cd, (((0,), (1,)), ((), ())),
                                preferred_element_type=f32)     # [2H, S]
    a_dst_sp = jax.lax.dot_general(a_dst_t, oh_rs, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)
    pre_sp = a_sp2[:heads] + a_dst_sp + el_sp[0].astype(f32)
    l_s = leaky(pre_sp)
    m_s = jax.lax.dot_general(m, oh_rs, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    e_s = jnp.exp(jnp.minimum(l_s - m_s, 60.0))                 # [H, S]
    denom_sp = jax.lax.dot_general(e_s, oh_rs, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)
    denom_tot = denom + denom_sp
    inv_d = 1.0 / denom_tot                                     # [H, R]

    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 1) // C
    head_row = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 0)
    expand_mat = (head_of_col == head_row).astype(f32)

    def expand_heads(w_hr):                       # [H, n] -> [n, HC]
        return jax.lax.dot_general(
            w_hr, expand_mat, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def contract_heads(v_nhc):                    # [n, HC] -> [H, n]
        return jax.lax.dot_general(
            expand_mat, v_nhc, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    if not has_dropout:
        dm_in = jnp.ones((heads, (K + 1) * R), f32)
        dm_sp = jnp.ones((heads, s_dim), f32)
    dmk = dm_in[:, :KR]
    dms = dm_in[:, KR:]
    ew = e_w * dmk                                              # [H, KR]

    # ---- gradient math -------------------------------------------------
    if lowp and not upcast_dots:
        cast = lambda t: t.astype(jnp.bfloat16)
        cdt = jnp.bfloat16
    elif lowp:
        cast = lambda t: t.astype(jnp.bfloat16).astype(f32)
        cdt = f32
    else:
        cast = lambda t: t
        cdt = f32

    def contract_heads_cd(v_nhc):                 # cd inputs, f32 accum
        return jax.lax.dot_general(
            expand_mat.astype(v_nhc.dtype), v_nhc,
            (((1,), (1,)), ((), ())), preferred_element_type=f32)

    def expand_heads_cd(w_hr):                    # [H, n] -> [n, HC] cd
        # (Mosaic matmuls accumulate f32; emit f32 and round once)
        return jax.lax.dot_general(
            w_hr.astype(cdt), expand_mat.astype(cdt),
            (((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(cdt)
    u = dout[:].astype(f32)                                     # [R, HC]
    dy = u * expand_heads(inv_d)                                # [R, HC]
    xw_b32 = xw_b[:].astype(f32)
    xh_sp32 = xh_spill[0].astype(f32)

    # [KR, HC]-scale intermediates ride in the compute dtype (bf16 in
    # lowp mode): they only feed cast() dots anyway, and at HC=256 the
    # f32 versions were ~1200 vregs of VPU traffic per band
    dy_rep = _tile_sub(cast(dy), K)                             # [KR, HC]
    # A[h, k*R+r] = sum_c dy[r, hC+c] * g_x_all[kR+r, hC+c]
    A2 = contract_heads_cd(dy_rep * cast(g_x_all))              # [H, KR]
    sum_eA = _reduce_lane(ew * A2, R, jnp.add)                  # [H, R]
    if has_self:
        b_self = contract_heads(dy * xw_b32)                    # [H, R]
        sum_eA = sum_eA + e_self * dms * b_self
    dM = jax.lax.dot_general(cast(oh_rs), cast(dy),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=f32)        # [S, HC]
    c_s = contract_heads(dM * xh_sp32)                          # [H, S]
    sum_eA = sum_eA + jax.lax.dot_general(
        e_s * dm_sp * c_s, oh_rs, (((1,), (1,)), ((), ())),
        preferred_element_type=f32)

    ddenom = -sum_eA * inv_d                                    # [H, R]

    de_w = dmk * A2 + _tile_lane(ddenom, K)
    dl_w = (e_w * de_w) * dleaky(pre_w)                         # [H, KR]
    dl_sum = _reduce_lane(dl_w, R, jnp.add)                     # [H, R]

    # spill logit cotangents (leaky now lives in-kernel)
    de_s = dm_sp * c_s + jax.lax.dot_general(
        ddenom, oh_rs, (((1,), (0,)), ((), ())),
        preferred_element_type=f32)                             # [H, S]
    dl_pre_sp = (e_s * de_s) * dleaky(pre_sp)                   # [H, S]
    ddst_sp = jax.lax.dot_general(dl_pre_sp, oh_rs,
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)   # [H, R]
    dl_sum = dl_sum + ddst_sp

    # feature-path cotangents for the gathered rows: message path
    # (softmax-weighted dy) + attention path (a_src projection backward)
    dgx = expand_heads_cd(ew) * dy_rep                          # [KR, HC]
    dgx = dgx + cast(jax.lax.dot_general(
        dl_w, a_mat32[:, :heads], (((0,), (1,)), ((), ())),
        preferred_element_type=f32))                            # [KR, HC]
    dxw = jax.lax.dot_general(ohT, dgx.astype(ohT.dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)       # [W, HC]

    # center-row extras: ac_c backward + self message
    if has_self:
        de_self = dms * b_self + ddenom
        dl_self = (e_self * de_self) * dleaky(pre_self)         # [H, R]
        dl_sum_c = dl_sum + dl_self
        dxb_extra = expand_heads(e_self * dms) * dy             # [R, HC]
    else:
        dl_self = jnp.zeros((heads, R), f32)
        dl_sum_c = dl_sum
        dxb_extra = jnp.zeros((R, HC), f32)
    dac_c = jnp.concatenate([dl_self, dl_sum_c], axis=0)        # [2H, R]
    dxb_extra = dxb_extra + jax.lax.dot_general(
        cast(dac_c), cast(a_mat32), (((0,), (1,)), ((), ())),
        preferred_element_type=f32)                             # [R, HC]

    # spill feature cotangent: message path + a_src projection path
    dxh_sp = expand_heads(e_s * dm_sp) * dM + jax.lax.dot_general(
        dl_pre_sp, a_mat32[:, :heads], (((0,), (1,)), ((), ())),
        preferred_element_type=f32)                             # [S, HC]

    # da_mat: center-dot part + src-projection parts (g_x_all / xh_spill)
    da_mat_part = jax.lax.dot_general(
        xw_b32, dac_c, (((0,), (1,)), ((), ())),
        preferred_element_type=f32)                             # [HC, 2H]
    da_src = jax.lax.dot_general(
        g_x_all, dl_w, (((0,), (1,)), ((), ())),
        preferred_element_type=f32) + jax.lax.dot_general(
        xh_sp32, dl_pre_sp, (((0,), (1,)), ((), ())),
        preferred_element_type=f32)                             # [HC, H]
    da_mat_part = da_mat_part + jnp.concatenate(
        [da_src, jnp.zeros((HC, heads), f32)], axis=1)

    # ---- lagged dxh accumulation (round 5) ----------------------------
    # Band s contributes to window chunks s-1 / s / s+1; instead of
    # emitting three [N, HC] streams and paying an XLA shift-add fusion
    # (~300 us/layer at 65k), the sequential grid runs ONE extra step and
    # emits dxh[s-1] = cxc(band s-2) + cxb(band s-1) + cxa(band s) from
    # two VMEM scratch buffers. Chunk 0 gets no cxa from band 0 (its
    # window clamps: j=0 slots can't exist) so the s=0 write into block 0
    # is placeholder data, overwritten at s=1 before the block's DMA-out.
    # All other output blocks revisit their s=T-1 index at the final step
    # and are simply not rewritten (VMEM content is retained).
    s = pl.program_id(0)
    cxa = dxw[:R]
    cxb = dxw[R:2 * R] + dxb_extra
    cxc = dxw[2 * R:]

    @pl.when(s < T)
    def _():
        del_w_ref[:] = dl_w[None].astype(del_w_ref.dtype)
        del_sp_ref[:] = dl_pre_sp[None].astype(del_sp_ref.dtype)
        if has_self:
            del_self_ref[:] = dl_self.astype(del_self_ref.dtype)
        else:
            del_self_ref[:] = jnp.zeros((heads, R), del_self_ref.dtype)
        dxh_spill_ref[:] = dxh_sp[None].astype(dxh_spill_ref.dtype)

    @pl.when(s == 0)
    def _():
        dxh_ref[:] = cxa.astype(dxh_ref.dtype)
        pend_ref[:] = cxb
        cxc_ref[:] = cxc
        da_mat_ref[:] = da_mat_part.astype(da_mat_ref.dtype)

    @pl.when(jnp.logical_and(s > 0, s < T))
    def _():
        dxh_ref[:] = (pend_ref[:] + cxa).astype(dxh_ref.dtype)
        pend_ref[:] = cxb + cxc_ref[:]
        cxc_ref[:] = cxc
        da_mat_ref[:] = da_mat_ref[:] + da_mat_part.astype(da_mat_ref.dtype)

    @pl.when(s == T)
    def _():
        dxh_ref[:] = pend_ref[:].astype(dxh_ref.dtype)


def _v3_specs_args(xcd, a_cat_mat, loc_nb, el_w_b, el_self_t, el_sp_b,
                   xh_spill_b, dst_loc_b, dm_w, dm_sp_b, *, r, hc, k,
                   heads, s_max, t_count, cd, has_dropout,
                   pad_grid=False, seed_tile=None, rng_drop=False):
    # pad_grid: the backward grid runs one EXTRA step for the lagged dxh
    # combine; every input index map clamps to the last band there (the
    # loaded block is unused).
    if pad_grid:
        gi = lambda t: jnp.minimum(t, t_count - 1)
    else:
        gi = lambda t: t

    def clampm1(t):
        return jnp.maximum(gi(t) - 1, 0)

    def clampp1(t):
        return jnp.minimum(gi(t) + 1, t_count - 1)

    in_specs = [
        pl.BlockSpec((r, hc), lambda t: (clampm1(t), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r, hc), lambda t: (gi(t), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r, hc), lambda t: (clampp1(t), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((r, k), lambda t: (gi(t), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, k * r), lambda t: (gi(t), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, r), lambda t: (0, gi(t)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, s_max), lambda t: (gi(t), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_max, hc), lambda t: (gi(t), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s_max), lambda t: (gi(t), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xcd, xcd, xcd, a_cat_mat.astype(cd), loc_nb, el_w_b,
            el_self_t, el_sp_b, xh_spill_b.astype(cd), dst_loc_b]
    if rng_drop:
        # the whole (8, 128) seed tile rides along unblocked
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(seed_tile)
    elif has_dropout:
        in_specs.append(pl.BlockSpec((1, heads, (k + 1) * r),
                                     lambda t: (gi(t), 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, heads, s_max),
                                     lambda t: (gi(t), 0, 0),
                                     memory_space=pltpu.VMEM))
        args.extend([dm_w, dm_sp_b])
    return in_specs, args


def _run_fused_v3_forward(statics, xh_flat, a_cat_mat, loc_nb, el_w_b,
                          el_self_t, el_sp_b, xh_spill_b, dst_loc_b,
                          dm_w, dm_sp_b, seed_tile):
    (band_rows, heads, negative_slope, has_self, has_dropout,
     compute_dtype, interpret, rng_drop, keep_prob) = statics
    n, hc = xh_flat.shape
    r = band_rows
    t_count = n // r
    k = loc_nb.shape[1]
    c = hc // heads
    s_max = dst_loc_b.shape[-1]
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    kern = functools.partial(
        _kernel_v3, R=r, K=k, heads=heads, C=c,
        negative_slope=negative_slope, has_self=has_self,
        has_dropout=has_dropout, rng_drop=rng_drop, keep_prob=keep_prob,
        upcast_dots=interpret and compute_dtype == "bfloat16",
        lowp=compute_dtype == "bfloat16",
    )
    xcd = xh_flat.astype(cd)
    in_specs, args = _v3_specs_args(
        xcd, a_cat_mat, loc_nb, el_w_b, el_self_t, el_sp_b, xh_spill_b,
        dst_loc_b, dm_w, dm_sp_b, r=r, hc=hc, k=k, heads=heads,
        s_max=s_max, t_count=t_count, cd=cd, has_dropout=has_dropout,
        seed_tile=seed_tile, rng_drop=rng_drop)
    out = pl.pallas_call(
        kern,
        grid=(t_count,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r, hc), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hc), cd),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out


def _run_fused_v3_bwd(statics, res, g):
    (band_rows, heads, negative_slope, has_self, has_dropout,
     compute_dtype, interpret, rng_drop, keep_prob) = statics
    (xh_flat, a_cat_mat, loc_nb, el_w_b, el_self_t, el_sp_b,
     xh_spill_b, dst_loc_b, dm_w, dm_sp_b, seed_tile) = res
    n, hc = xh_flat.shape
    r = band_rows
    t_count = n // r
    k = loc_nb.shape[1]
    c = hc // heads
    s_max = dst_loc_b.shape[-1]
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    kern = functools.partial(
        _bwd_kernel_v3, R=r, K=k, heads=heads, C=c,
        negative_slope=negative_slope, has_self=has_self,
        has_dropout=has_dropout, rng_drop=rng_drop, keep_prob=keep_prob,
        upcast_dots=interpret and compute_dtype == "bfloat16",
        T=t_count,
        lowp=compute_dtype == "bfloat16",
    )
    xcd = xh_flat.astype(cd)
    in_specs, args = _v3_specs_args(
        xcd, a_cat_mat, loc_nb, el_w_b, el_self_t, el_sp_b, xh_spill_b,
        dst_loc_b, dm_w, dm_sp_b, r=r, hc=hc, k=k, heads=heads,
        s_max=s_max, t_count=t_count, cd=cd, has_dropout=has_dropout,
        pad_grid=True, seed_tile=seed_tile, rng_drop=rng_drop)
    in_specs.append(pl.BlockSpec(
        (r, hc), lambda t: (jnp.minimum(t, t_count - 1), 0),
        memory_space=pltpu.VMEM))
    args.append(g.astype(cd))

    f32 = jnp.float32
    gi = lambda t: jnp.minimum(t, t_count - 1)
    out_specs = (
        # dxh: lagged by one step (block s-1 emitted at step s)
        pl.BlockSpec((r, hc), lambda t: (jnp.maximum(t - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, k * r), lambda t: (gi(t), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, r), lambda t: (0, gi(t)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, heads, s_max), lambda t: (gi(t), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_max, hc), lambda t: (gi(t), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hc, 2 * heads), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((n, hc), cd),             # dxh (combined)
        jax.ShapeDtypeStruct((t_count, heads, k * r), f32),   # del_w
        jax.ShapeDtypeStruct((heads, n), f32),         # del_self_t
        jax.ShapeDtypeStruct((t_count, heads, s_max), f32),   # del_sp
        jax.ShapeDtypeStruct((t_count, s_max, hc), f32),      # dxh_spill
        jax.ShapeDtypeStruct((hc, 2 * heads), f32),    # da_cat_mat
    )
    dxh, del_w, del_self_t, del_sp_b, dxh_spill_b, da_mat = (
        pl.pallas_call(
            kern,
            grid=(t_count + 1,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((r, hc), f32),
                            pltpu.VMEM((r, hc), f32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)
    )
    return (dxh.astype(xh_flat.dtype), da_mat.astype(a_cat_mat.dtype),
            _float0_zeros(loc_nb), del_w.astype(el_w_b.dtype),
            del_self_t.astype(el_self_t.dtype),
            del_sp_b.astype(el_sp_b.dtype),
            dxh_spill_b.astype(xh_spill_b.dtype),
            _float0_zeros(dst_loc_b),
            jnp.zeros_like(dm_w), jnp.zeros_like(dm_sp_b),
            _float0_zeros(seed_tile))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_v3(statics, xh_flat, a_cat_mat, loc_nb, el_w_b, el_self_t,
              el_sp_b, xh_spill_b, dst_loc_b, dm_w, dm_sp_b, seed_tile):
    return _run_fused_v3_forward(
        statics, xh_flat, a_cat_mat, loc_nb, el_w_b, el_self_t,
        el_sp_b, xh_spill_b, dst_loc_b, dm_w, dm_sp_b, seed_tile)


def _fused_v3_fwd(statics, *args):
    return _run_fused_v3_forward(statics, *args), args


_fused_v3.defvjp(_fused_v3_fwd, _run_fused_v3_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("band_rows", "heads", "negative_slope", "has_self",
                     "has_dropout", "compute_dtype", "interpret",
                     "rng_drop", "keep_prob"),
)
def _fused_call_v3(xh_flat, a_cat_mat, loc_nb, el_w_b, el_self_t,
                   el_sp_b, xh_spill_b, dst_loc_b, dm_w, dm_sp_b,
                   seed_tile, *,
                   band_rows: int, heads: int, negative_slope: float,
                   has_self: bool, has_dropout: bool, compute_dtype: str,
                   interpret: bool, rng_drop: bool = False,
                   keep_prob: float = 1.0):
    statics = (band_rows, heads, negative_slope, has_self, has_dropout,
               compute_dtype, interpret, rng_drop, keep_prob)
    if dm_w is None:  # custom_vjp needs concrete (dummy) mask args
        dm_w = jnp.zeros((1, 1, 1), jnp.float32)
        dm_sp_b = jnp.zeros((1, 1, 1), jnp.float32)
    if seed_tile is None:
        seed_tile = jnp.zeros((8, 128), jnp.int32)
    return _fused_v3(statics, xh_flat, a_cat_mat, loc_nb, el_w_b,
                     el_self_t, el_sp_b, xh_spill_b, dst_loc_b,
                     dm_w, dm_sp_b, seed_tile)


def ell_gat_fused_wide_pallas(
    xh: jax.Array,          # [N, H, C] transformed features
    a_cat_mat: jax.Array,   # [HC, 2H] block-diag [att_src | att_dst]
    el_w_b: jax.Array,      # [T, H, K*R] edge logits, wide lane order,
                            # dead/spilled slots premasked at ~NEG_BIG
    el_self_t: Optional[jax.Array],     # [H, N] or None
    m_edge: Optional[jax.Array],        # [Fe, H] edge-logit matrix
    banded: BandedEll,
    negative_slope: float = 0.2,
    compute_dtype: str = "float32",
    dropout_masks: Optional[Tuple[jax.Array, jax.Array]] = None,
    drop_seed: Optional[jax.Array] = None,
    keep_prob: float = 1.0,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Round-5 WIDE fused banded GAT layer (see the v3 kernel banner).

    Only ONE XLA-side gather remains (the spill rows' features); spill
    attention logits are assembled in-kernel from that gather and the
    band's own attention dots. ``dropout_masks``: optional
    ([T, H, (K+1)*R], [T, H, S_max]) wide-layout post-softmax weight
    multipliers (make_banded_dropout_masks(..., wide=True)).
    ``drop_seed``: (2,) int32 — TPU-only in-kernel rng dropout instead
    of streamed masks; band t's draw is a pure function of (seed, t), so
    forward and backward regenerate it identically (mutually exclusive
    with dropout_masks; bit-exactness vs the streamed path is checked by
    benchmarks/rng_dropout_check_sparse.py).

    Replaces reference capability: PyG GATConv scatter/gather kernels
    (reference: models/gnn.py:120-143)."""
    if interpret is None:
        interpret = _interpret_default()
    if drop_seed is not None and dropout_masks is not None:
        raise ValueError("pass dropout_masks OR drop_seed, not both")
    n, h_dim, c = xh.shape
    hc = h_dim * c
    xh_flat = xh.reshape(n, hc)
    has_self = el_self_t is not None
    if el_self_t is None:
        el_self_t = jnp.zeros((h_dim, n), xh.dtype)

    from ..ell_banded import NEG_BIG, gather_rows_reduce_bwd

    t_count, s_max = banded.spill_src_b.shape
    flat_src = banded.spill_src_b.reshape(-1)
    gather_src = (xh_flat.astype(jnp.bfloat16)
                  if compute_dtype == "bfloat16" else xh_flat)
    xh_spill_b = gather_rows_reduce_bwd(
        banded.spill_red_maxj, gather_src, flat_src, banded.spill_perm,
        banded.spill_src_sorted, banded.spill_red_first,
        banded.spill_red_jcount).reshape(t_count, s_max, hc)
    # spill el logits + dead mask (attention parts are added in-kernel)
    dead = banded.spill_dst_local_b.reshape(-1) < 0
    if m_edge is not None:
        el_sp = (banded.spill_eattr_b.reshape(-1, banded.spill_eattr_b
                                              .shape[-1]) @ m_edge)
        el_sp = jnp.where(dead[:, None], NEG_BIG, el_sp)
    else:
        el_sp = jnp.where(dead[:, None], NEG_BIG,
                          jnp.zeros((t_count * s_max, h_dim), jnp.float32))
    el_sp_b = el_sp.reshape(t_count, s_max, h_dim).transpose(0, 2, 1)

    dm_w, dm_sp_b = (dropout_masks if dropout_masks is not None
                     else (None, None))
    rng_drop = drop_seed is not None
    seed_tile = _seed_tile(drop_seed) if rng_drop else None
    return _fused_call_v3(
        xh_flat, a_cat_mat, banded.loc_nb, el_w_b, el_self_t,
        el_sp_b, xh_spill_b, banded.spill_dst_local_b, dm_w, dm_sp_b,
        seed_tile,
        band_rows=banded.band_rows, heads=h_dim,
        negative_slope=float(negative_slope), has_self=has_self,
        has_dropout=dropout_masks is not None or rng_drop,
        compute_dtype=compute_dtype, interpret=bool(interpret),
        rng_drop=rng_drop, keep_prob=float(keep_prob))
