"""Fused grid-GAT layer as a single Pallas TPU kernel.

One kernel performs, per row-block of the tile:
  HBM->VMEM DMA of the input block with a 1-row halo
  -> MXU matmul (x @ W)                      (xh never touches HBM)
  -> per-offset attention logits + LeakyReLU
  -> masked softmax over <=K offsets + injected self-loop
  -> shifted-window weighted aggregation
  -> bias + validity mask -> HBM write of the output block.

HBM traffic: read x once (+halo overlap) + tiny edge logits, write out
once — versus the XLA path which materializes xh and the attention
weights. Math is identical to models/grid_gat.GridGATConv (PyG-exact,
SURVEY Q3) and is verified against it by parity tests.

Backward: custom_vjp whose residuals are the layer inputs; the backward
pass re-runs the XLA reference formulation under jax.vjp (rematerialized —
same recompute-vs-stash tradeoff as flash attention).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

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
    x_hbm,        # [H+2, W, F_pad] HBM (caller zero-pads rows + features)
    w_lin,        # [F_pad, HC] VMEM
    a_src_mat,    # [HC, heads]
    a_dst_mat,    # [HC, heads]
    m_edge,       # [edge_dim, heads] (zeros if unused)
    eattr,        # [K, R, W, edge_dim] block
    nbr_mask,     # [K, R, W] float block
    valid,        # [R, W] float block
    bias,         # [1, HC]
    out_ref,      # [R, W, HC] block
    xe_scratch,   # VMEM [R+2, W, F_pad]
    sem,          # DMA semaphore
    *,
    offsets,
    R: int,
    H: int,
    W: int,
    heads: int,
    C: int,
    negative_slope: float,
    use_edge: bool,
):
    i = pl.program_id(0)
    # x_hbm is pre-padded: padded row r maps to grid row r-1, so block i's
    # halo window is simply rows [i*R, i*R + R + 2). F_pad is a multiple of
    # 128 (DMA minor-dim alignment); padding contributes exact zeros.
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * R, R + 2)], xe_scratch.at[:], sem)
    cp.start()
    cp.wait()

    HC = heads * C
    xe = xe_scratch[:].reshape((R + 2) * W, xe_scratch.shape[-1])
    xh_e = jnp.dot(xe, w_lin[:], preferred_element_type=jnp.float32)
    a_src_e = jnp.dot(xh_e, a_src_mat[:],
                      preferred_element_type=jnp.float32).reshape(R + 2, W,
                                                                  heads)
    a_dst_e = jnp.dot(xh_e, a_dst_mat[:],
                      preferred_element_type=jnp.float32).reshape(R + 2, W,
                                                                  heads)
    xh_e = xh_e.reshape(R + 2, W, HC)

    a_dst_i = a_dst_e[1:R + 1]
    a_src_i = a_src_e[1:R + 1]

    nm = nbr_mask[:]
    ea = eattr[:]

    # per-offset logits
    logits = []
    for k, (dr, dc) in enumerate(offsets):
        a_n = a_src_e[1 + dr:1 + dr + R]
        a_n = pltpu.roll(a_n, (-dc) % W, 1)  # pltpu.roll needs shift >= 0
        lg = a_n + a_dst_i
        if use_edge:
            lg = lg + jnp.dot(ea[k].reshape(R * W, -1), m_edge[:],
                              preferred_element_type=jnp.float32
                              ).reshape(R, W, heads)
        lg = jnp.where(lg >= 0, lg, negative_slope * lg)  # leaky relu
        lg = jnp.where(nm[k][..., None] > 0, lg, NEG)
        logits.append(lg)

    # self logit (mean incoming edge attr)
    self_lg = a_src_i + a_dst_i
    if use_edge:
        cnt = jnp.maximum(jnp.sum(nm, 0), 1.0)[..., None]
        mean_attr = jnp.sum(ea * nm[..., None], 0) / cnt
        self_lg = self_lg + jnp.dot(mean_attr.reshape(R * W, -1), m_edge[:],
                                    preferred_element_type=jnp.float32
                                    ).reshape(R, W, heads)
    self_lg = jnp.where(self_lg >= 0, self_lg, negative_slope * self_lg)

    # stable softmax over offsets + self; exps recomputed in the
    # aggregation pass to keep the VMEM stack small
    m = self_lg
    for lg in logits:
        m = jnp.maximum(m, lg)
    denom = jnp.exp(self_lg - m)
    for k, lg in enumerate(logits):
        denom = denom + jnp.exp(lg - m) * (nm[k][..., None] > 0)
    denom = jnp.maximum(denom, 1e-16)

    # head expansion [R, W, heads] -> [R, W, HC] as a tiny MXU matmul with
    # a constant one-hot matrix (jnp.repeat's 4D reshape is unsupported by
    # Mosaic's layout inference)
    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 1) // C
    head_row = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 0)
    expand_mat = (head_of_col == head_row).astype(jnp.float32)

    def expand_heads(wts):  # [R, W, heads] -> [R, W, HC]
        return jnp.dot(wts.reshape(R * W, heads), expand_mat,
                       preferred_element_type=jnp.float32
                       ).reshape(R, W, HC)

    w_self = expand_heads(jnp.exp(self_lg - m) / denom)
    acc = xh_e[1:R + 1] * w_self
    for k, (dr, dc) in enumerate(offsets):
        xn = xh_e[1 + dr:1 + dr + R]
        xn = pltpu.roll(xn, (-dc) % W, 1)
        e_k = jnp.exp(logits[k] - m) * (nm[k][..., None] > 0)
        acc = acc + xn * expand_heads(e_k / denom)

    acc = acc + bias[:].reshape(1, 1, HC)
    out_ref[:] = acc * (valid[:][..., None] > 0)


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


def _fused_forward(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask,
                   valid, bias, connectivity, negative_slope, use_edge,
                   block_rows, interpret):
    offsets = _offsets(connectivity)
    hgt, wid, f_in = x.shape
    heads = a_src_mat.shape[1]
    hc = w_lin.shape[1]
    c = hc // heads
    k = len(offsets)
    ed = eattr.shape[-1]
    r = block_rows
    if hgt % r != 0 or hgt < 2 * r:
        # fall back to the XLA formulation for odd shapes
        return _reference_forward(
            x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask, valid,
            bias, offsets=offsets, negative_slope=negative_slope,
            use_edge=use_edge)

    kern = functools.partial(
        _kernel, offsets=offsets, R=r, H=hgt, W=wid, heads=heads, C=c,
        negative_slope=negative_slope, use_edge=use_edge,
    )
    if interpret is None:
        interpret = _interpret_default()
    # pad feature dim to a 128 multiple (DMA minor-dim alignment) and add
    # one zero halo row top/bottom so the kernel's DMA is unconditional
    f_pad = ((f_in + 127) // 128) * 128
    x_p = jnp.pad(x.astype(jnp.float32),
                  ((1, 1), (0, 0), (0, f_pad - f_in)))
    w_p = jnp.pad(w_lin, ((0, f_pad - f_in), (0, 0)))
    return pl.pallas_call(
        kern,
        grid=(hgt // r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((k, r, wid, ed), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, r, wid), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, wid), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, wid, hc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hgt, wid, hc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r + 2, wid, f_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_p, w_p, a_src_mat, a_dst_mat, m_edge, eattr,
      nbr_mask.astype(jnp.float32), valid.astype(jnp.float32),
      bias.reshape(1, -1))


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
