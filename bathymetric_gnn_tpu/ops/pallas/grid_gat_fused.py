"""Fused grid-GAT layer as a single Pallas TPU kernel.

One kernel performs, per row-block of the tile:
  MXU matmul (x @ W) on the block + a 1-row halo    (xh never touches HBM)
  -> per-offset attention logits + LeakyReLU
  -> masked softmax over <=K offsets + injected self-loop
  -> shifted-window weighted aggregation
  -> bias + validity mask -> output block.

The layer is HBM-bandwidth-bound, so the design minimizes traffic:

  * x is passed reshaped [H/R, R, W, F] so input windows tile it EXACTLY
    (no overlapping-window re-reads), with the 1-row top/bottom halos
    delivered as two tiny [H/R, 1, W, F] side arrays built by XLA strided
    slices. Pallas double-buffers all three streams; no manual DMA.
  * attention-dot matrices are folded into the input matmul:
    a_src = (x @ W) @ a == x @ (W @ a), so one [*, F] @ [F, 2*heads]
    matmul replaces two [*, HC] @ [HC, heads] matmuls.
  * per-edge logit contributions (eattr @ M_edge, incl. the self-loop's
    mean-edge-attr term) are precomputed by XLA outside the kernel and
    pre-masked to NEG on missing neighbors, removing 9 tiny matmuls and
    all mask traffic from the kernel. They are laid out heads-MAJOR
    ([K, heads, H, W]) so W stays the minor dim: a trailing heads=4 dim
    tile-pads 4 lanes to 128 (32x physical HBM inflation; measured ~9x
    slower to produce and stream).
  * all attention/softmax math runs on per-(offset, head) 2-D [R, W]
    arrays (minor dim W = full lane utilization); the per-head attention
    dots come from one small transpose of the [rows, 2*heads] matmul
    output.

Math is identical to models/grid_gat.GridGATConv (PyG-exact, SURVEY Q3)
and is verified against it by parity tests. (On real TPUs the XLA path
runs matmuls at bf16 MXU precision by default, so kernel-vs-XLA deltas
there are dominated by XLA's own matmul rounding; interpret-mode CPU
parity is tight.)

Backward: custom_vjp whose residuals are the layer inputs; the backward
pass re-runs the XLA reference formulation under jax.vjp (rematerialized —
same recompute-vs-stash tradeoff as flash attention).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _offsets(connectivity: int):
    from ..edges import offsets_for_connectivity

    return offsets_for_connectivity(connectivity)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    x_blk,        # [1, R, W, F] block (exact tiling of x)
    halo_top,     # [1, 1, W, F] block — grid row i*R - 1 (zeros at i=0)
    halo_bot,     # [1, 1, W, F] block — grid row i*R + R (zeros at end)
    w_lin,        # [F, HC] VMEM
    wa_cat,       # [F, 2*heads] VMEM  (W @ [a_src | a_dst])
    el,           # [K, heads, R, W] block — premasked edge logits
    el_self,      # [heads, R, W] block — self-loop edge logit term
    valid,        # [R, W] float block
    bias,         # [1, HC]
    bn_scale,     # [1, HC] fused BatchNorm scale*rsqrt(var+eps) (or ones)
    bn_bias,      # [1, HC] fused BatchNorm bias - mean*scale2 (or zeros)
    out_ref,      # [R, W, HC] block
    *,
    offsets,
    R: int,
    W: int,
    heads: int,
    C: int,
    negative_slope: float,
    fuse_bn: bool,
    fuse_relu: bool,
    upcast_dots: bool = False,
):
    HC = heads * C
    nk = len(offsets)
    # halo-extended block: row r of xe is grid row i*R + r - 1
    # (inputs may be bf16 — MXU-native; accumulation stays f32)
    xe = jnp.concatenate([halo_top[0], x_blk[0], halo_bot[0]], axis=0)
    xe = xe.reshape((R + 2) * W, xe.shape[-1])
    if upcast_dots:
        # interpret mode (CPU): the XLA CPU DotThunk can't execute bf16
        # dots with f32 accumulation; upcasting reproduces the TPU MXU's
        # bf16-inputs/f32-accumulate semantics exactly.
        xe = xe.astype(jnp.float32)
        w_mat, wa_mat = w_lin[:].astype(jnp.float32), wa_cat[:].astype(
            jnp.float32)
    else:
        w_mat, wa_mat = w_lin[:], wa_cat[:]
    xh_e = jnp.dot(xe, w_mat, preferred_element_type=jnp.float32)
    ad = jnp.dot(xe, wa_mat, preferred_element_type=jnp.float32)
    xh_e = xh_e.reshape(R + 2, W, HC)
    # (NEGATIVE RESULT 2026-08-19: running the aggregation loop on bf16
    # operands — and even fully-packed bf16 accumulate — measures 2-6%
    # SLOWER than f32 (1425/1480 us vs 1401 us marginal). The VPU has no
    # packed-bf16 ALU win here and the casts + bf16-safe rolls cost more
    # than the saved VMEM traffic; the loop is ALU/issue-bound, not
    # bandwidth-bound.)

    # attention dots per head as lane-clean [R(+2), W] 2-D arrays: one small
    # transpose of the [(R+2)W, 2*heads] matmul output, then major-dim
    # slices. Everything downstream (logits, softmax) runs on 2-D arrays
    # whose minor dim is W — full lane utilization instead of a padded
    # heads-minor layout.
    adT = ad.T.reshape(2 * heads, R + 2, W)
    elb = el[:].astype(jnp.float32)
    els = el_self[:].astype(jnp.float32)

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    # per (offset, head) logits; missing neighbors arrive premasked at ~NEG
    # via el (LeakyReLU keeps them at 0.2*NEG, which exp() flushes to 0)
    wts = [[None] * heads for _ in range(nk)]   # softmax weights [R, W]
    w_self = [None] * heads
    for h in range(heads):
        a_src_h = adT[h]                        # [R+2, W]
        a_dst_h = adT[heads + h][1:R + 1]       # [R, W]
        self_lg = leaky(a_src_h[1:R + 1] + a_dst_h + els[h])
        lgs = []
        m = self_lg
        for k, (dr, dc) in enumerate(offsets):
            a_n = a_src_h[1 + dr:1 + dr + R]
            a_n = pltpu.roll(a_n, (-dc) % W, 1)  # pltpu.roll: shift >= 0
            lg = leaky(a_n + a_dst_h + elb[k, h])
            lgs.append(lg)
            m = jnp.maximum(m, lg)
        e_self = jnp.exp(self_lg - m)
        denom = e_self
        exps = []
        for lg in lgs:
            e = jnp.exp(lg - m)
            exps.append(e)
            denom = denom + e
        inv = 1.0 / jnp.maximum(denom, 1e-16)
        w_self[h] = e_self * inv
        for k in range(nk):
            wts[k][h] = exps[k] * inv

    # head expansion: list of heads x [R, W] -> [R, W, HC] as one MXU
    # matmul per offset with a constant one-hot matrix, fed heads-major:
    # stack on axis 0 + major-collapse reshape are layout no-ops, and the
    # TN dot_general contracts the heads axis directly. (Broadcast+concat
    # and jnp.stack(axis=-1) both force W-lanes->sublanes relayouts that
    # measure 3x slower end to end.)
    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 1) // C
    head_row = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 0)
    expand_mat = (head_of_col == head_row).astype(jnp.float32)

    def expand_heads(per_head):
        ws_t = jnp.stack(per_head, axis=0).reshape(heads, R * W)
        return jax.lax.dot_general(
            ws_t, expand_mat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(R, W, HC)

    acc = xh_e[1:R + 1] * expand_heads(w_self)
    for k, (dr, dc) in enumerate(offsets):
        xn = xh_e[1 + dr:1 + dr + R]
        xn = pltpu.roll(xn, (-dc) % W, 1)
        acc = acc + xn * expand_heads(wts[k])
        # (factoring the column rolls into 2 shared full-height rolled
        # copies measures ~7% SLOWER end to end — per-offset row-sliced
        # rolls pipeline better)

    acc = acc + bias[:].reshape(1, 1, HC)
    if fuse_bn:
        acc = acc * bn_scale[:].reshape(1, 1, HC) + bn_bias[:].reshape(
            1, 1, HC)
    if fuse_relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = (acc * (valid[:][..., None] > 0)).astype(out_ref.dtype)


def _reference_forward(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                       nbr_mask, valid, bias, *, offsets, negative_slope,
                       use_edge):
    """XLA formulation (identical math) — used for backward + CPU checks."""
    hgt, wid, _ = x.shape
    heads = a_src_mat.shape[1]
    hc = w_lin.shape[1]
    c = hc // heads
    xh = (x @ w_lin)
    a_src = (xh @ a_src_mat)
    a_dst = (xh @ a_dst_mat)

    def shift2(a, dr, dc):
        return jnp.roll(jnp.roll(a, -dr, 0), -dc, 1)

    logits = []
    for k, (dr, dc) in enumerate(offsets):
        lg = shift2(a_src, dr, dc) + a_dst
        if use_edge:
            lg = lg + eattr[k] @ m_edge
        lg = jnp.where(lg >= 0, lg, negative_slope * lg)
        lg = jnp.where(nbr_mask[k][..., None] > 0, lg, NEG)
        logits.append(lg)
    self_lg = a_src + a_dst
    if use_edge:
        cnt = jnp.maximum(jnp.sum(nbr_mask, 0), 1.0)[..., None]
        mean_attr = jnp.sum(eattr * nbr_mask[..., None], 0) / cnt
        self_lg = self_lg + mean_attr @ m_edge
    self_lg = jnp.where(self_lg >= 0, self_lg, negative_slope * self_lg)

    m = self_lg
    for lg in logits:
        m = jnp.maximum(m, lg)
    denom = jnp.exp(self_lg - m)
    exps = []
    for k, lg in enumerate(logits):
        e = jnp.exp(lg - m) * (nbr_mask[k][..., None] > 0)
        exps.append(e)
        denom = denom + e
    denom = jnp.maximum(denom, 1e-16)

    def eh(wts):
        return jnp.repeat(wts, c, axis=-1)

    acc = xh * eh(jnp.exp(self_lg - m) / denom)
    for k, (dr, dc) in enumerate(offsets):
        acc = acc + shift2(xh, dr, dc) * eh(exps[k] / denom)
    acc = acc + bias.reshape(1, 1, hc)
    return acc * (valid[..., None] > 0)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(9, 10, 11, 12, 13))
def fused_grid_gat(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask,
                   valid, bias, connectivity, negative_slope, use_edge,
                   block_rows, interpret):
    """Fused GAT layer: returns [H, W, heads*C] (pre-BatchNorm, pre-concat
    semantics already applied — caller reshapes/means heads)."""
    return _fused_forward(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                          nbr_mask, valid, bias, connectivity,
                          negative_slope, use_edge, block_rows, interpret)


def fused_grid_gat_infer(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                         nbr_mask, valid, bias, connectivity, negative_slope,
                         use_edge, block_rows, interpret, *,
                         bn_scale=None, bn_bias=None, fuse_relu=False,
                         compute_dtype=jnp.float32):
    """Inference-only fused layer with an optional fused epilogue: the
    following BatchNorm's running-stats affine (scale*rsqrt(var+eps),
    bias-mean*scale) and ReLU applied in-kernel before the single HBM
    write, saving a full read+write round trip of the activation per
    layer. No custom VJP — do not differentiate through this.

    compute_dtype=bfloat16 streams x/halos/weights/edge-logits through HBM
    and the MXU in bf16 (halving the dominant traffic) while keeping all
    softmax math and matmul accumulation in f32; the output is written
    bf16 so consecutive layers chain without recasting."""
    return _fused_forward(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                          nbr_mask, valid, bias, connectivity,
                          negative_slope, use_edge, block_rows, interpret,
                          bn_scale=bn_scale, bn_bias=bn_bias,
                          fuse_relu=fuse_relu, compute_dtype=compute_dtype)


def _fused_forward(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask,
                   valid, bias, connectivity, negative_slope, use_edge,
                   block_rows, interpret, bn_scale=None, bn_bias=None,
                   fuse_relu=False, compute_dtype=jnp.float32):
    offsets = _offsets(connectivity)
    hgt, wid, f_in = x.shape
    heads = a_src_mat.shape[1]
    hc = w_lin.shape[1]
    c = hc // heads
    k = len(offsets)
    # downgrade the row-block size rather than falling back outright: the
    # fused kernel needs hgt to tile exactly with at least two blocks
    r = block_rows
    while r > 8 and (hgt % r != 0 or hgt < 2 * r):
        r //= 2
    fuse_bn = bn_scale is not None
    lowp = compute_dtype != jnp.float32
    if hgt % r != 0 or hgt < 2 * r:  # ragged/small tiles: XLA formulation
        # fall back to the XLA formulation for odd shapes; in low precision,
        # emulate the kernel's rounding (bf16 inputs, f32 accumulation)
        if lowp:
            x = x.astype(compute_dtype).astype(jnp.float32)
            w_lin = w_lin.astype(compute_dtype).astype(jnp.float32)
        out = _reference_forward(
            x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask, valid,
            bias, offsets=offsets, negative_slope=negative_slope,
            use_edge=use_edge)
        if fuse_bn:
            out = out * bn_scale + bn_bias
        if fuse_relu:
            out = jnp.maximum(out, 0.0)
        if fuse_bn or fuse_relu:
            out = out * (valid[..., None] > 0)
        return out.astype(compute_dtype)

    # --- XLA-side precompute (tiny vs the kernel body, fused by XLA) ---
    # el layouts are heads-MAJOR [K, heads, H, W] / [heads, H, W]: W stays
    # the minor dim, so the HBM arrays are lane-clean. The trailing-heads
    # layout tile-pads 4 lanes to 128 (32x physical inflation) and measures
    # ~9x slower to produce and stream (benchmarks/RESULTS.md).
    nbm4 = nbr_mask[:, None] > 0                          # [K, 1, H, W]
    if use_edge:
        ea32 = eattr.astype(jnp.float32)
        me32 = m_edge.astype(jnp.float32)
        el = jnp.einsum("khwf,fa->kahw", ea32, me32)      # [K, heads, H, W]
        el = jnp.where(nbm4, el, NEG)
        cnt = jnp.maximum(jnp.sum(nbr_mask, 0), 1.0)[..., None]
        mean_attr = jnp.sum(
            jnp.where(nbr_mask[..., None] > 0, ea32, 0.0), 0) / cnt
        el_self = jnp.einsum("hwf,fa->ahw", mean_attr,
                             me32)                        # [heads, H, W]
    else:
        el = jnp.where(nbm4, 0.0, NEG) * jnp.ones((1, heads, 1, 1))
        el_self = jnp.zeros((heads, hgt, wid), jnp.float32)
    wa_cat = jnp.concatenate(
        [w_lin @ a_src_mat, w_lin @ a_dst_mat], axis=1)   # [F, 2*heads]

    x = x.astype(compute_dtype)
    w_lin = w_lin.astype(compute_dtype)
    wa_cat = wa_cat.astype(compute_dtype)
    el = el.astype(compute_dtype)
    el_self = el_self.astype(compute_dtype)
    nb = hgt // r
    xr = x.reshape(nb, r, wid, f_in)
    z = jnp.zeros((1, wid, f_in), compute_dtype)
    halo_top = jnp.concatenate([z, x[r - 1::r][:-1]], 0).reshape(
        nb, 1, wid, f_in)
    halo_bot = jnp.concatenate([x[r::r], z], 0).reshape(nb, 1, wid, f_in)

    if interpret is None:
        interpret = _interpret_default()
    kern = functools.partial(
        _kernel, offsets=offsets, R=r, W=wid, heads=heads, C=c,
        negative_slope=negative_slope, fuse_bn=fuse_bn, fuse_relu=fuse_relu,
        upcast_dots=bool(interpret) and lowp,
    )
    sc2 = (bn_scale if fuse_bn else jnp.ones(hc)).reshape(1, hc)
    bi2 = (bn_bias if fuse_bn else jnp.zeros(hc)).reshape(1, hc)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, r, wid, f_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wid, f_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wid, f_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((k, heads, r, wid), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, r, wid), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, wid), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, wid, hc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hgt, wid, hc), compute_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xr, halo_top, halo_bot, w_lin, wa_cat, el, el_self,
      valid.astype(jnp.float32), bias.reshape(1, -1), sc2, bi2)


def _fwd(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask, valid,
         bias, connectivity, negative_slope, use_edge, block_rows,
         interpret):
    out = _fused_forward(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                         nbr_mask, valid, bias, connectivity,
                         negative_slope, use_edge, block_rows, interpret)
    return out, (x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask,
                 valid, bias)


def _bwd(connectivity, negative_slope, use_edge, block_rows, interpret,
         residuals, g):
    x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask, valid, bias = (
        residuals)
    offsets = _offsets(connectivity)

    def ref(x_, w_, as_, ad_, me_, b_):
        return _reference_forward(
            x_, w_, as_, ad_, me_, eattr, nbr_mask, valid, b_,
            offsets=offsets, negative_slope=negative_slope,
            use_edge=use_edge)

    _, vjp = jax.vjp(ref, x, w_lin, a_src_mat, a_dst_mat, m_edge, bias)
    dx, dw, das, dad, dme, db = vjp(g)
    return (dx, dw, das, dad, dme, jnp.zeros_like(eattr),
            jnp.zeros_like(nbr_mask), jnp.zeros_like(valid), db)


fused_grid_gat.defvjp(_fwd, _bwd)


def gat_param_matrices(params: dict, heads: int, out_channels: int,
                       edge_dim: Optional[int]):
    """Convert GridGATConv params into the kernel's matrix forms:
    A_src/A_dst [HC, heads] block-diagonal per head, M_edge [ed, heads]."""
    hc = heads * out_channels
    c = out_channels
    w_lin = params["lin_src"]
    a_src = jnp.zeros((hc, heads))
    a_dst = jnp.zeros((hc, heads))
    att_src = params["att_src"].reshape(heads, c)
    att_dst = params["att_dst"].reshape(heads, c)
    for a in range(heads):
        a_src = a_src.at[a * c:(a + 1) * c, a].set(att_src[a])
        a_dst = a_dst.at[a * c:(a + 1) * c, a].set(att_dst[a])
    if edge_dim is not None and "lin_edge" in params:
        we = params["lin_edge"].reshape(edge_dim, heads, c)
        m_edge = jnp.einsum("fac,ac->fa", we,
                            params["att_edge"].reshape(heads, c))
    else:
        m_edge = jnp.zeros((edge_dim or 3, heads))
    bias = params.get("bias", jnp.zeros(hc))
    return w_lin, a_src, a_dst, m_edge, bias
