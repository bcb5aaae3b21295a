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

Backward: custom_vjp with a dedicated Pallas backward kernel
(_bwd_kernel): softmax weights are RECOMPUTED in-kernel from the streamed
inputs (flash-attention-style remat — residuals are just the layer
inputs), then the kernel emits dx plus per-row-block partial sums of the
weight gradients (dW, d(W@[a_src|a_dst]), dM_edge, dbias) that XLA
reduces across blocks. Ragged shapes fall back to jax.vjp of the XLA
reference formulation.

Attention dropout (training) is a STREAMED multiplier mask
[K+1, heads, H, W] (bernoulli(keep)/keep, self-loop at index K) applied
to the post-softmax weights in both kernels — generated outside with
jax.random so fwd/bwd agree exactly and parity tests can pin the mask.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _resolve_block_rows(hgt: int, block_rows: int, wid: int = 0):
    """Single source of truth for kernel eligibility (shared by
    _fused_forward, _fused_backward, and _bwd so forward and backward can
    never drift onto different paths): downgrade the row-block size
    rather than falling back outright — the fused kernel needs hgt to
    tile exactly with at least two blocks, and (round 4) the width must
    be lane-aligned: W is the minor/lane dim of every in-kernel 2-D
    array, and Mosaic rejects the [.., W]-major reshapes for W % 128
    != 0 ("unsupported shape cast" at tile 48 — found driving `train
    --tile-size 48`). Such shapes take the XLA fallback instead of
    failing to compile. Returns (r, tiles_ok)."""
    r = block_rows
    while r > 8 and (hgt % r != 0 or hgt < 2 * r):
        r //= 2
    ok = hgt % r == 0 and hgt >= 2 * r and wid % 128 == 0
    return r, ok


def _offsets(connectivity: int):
    from ..edges import offsets_for_connectivity

    return offsets_for_connectivity(connectivity)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _seed_tile(drop_seed):
    """Embed the (2,) int32 seed into an (8, 128) i32 tile at [0, :2]
    (see the vmap note at the rng_drop BlockSpecs)."""
    return jnp.zeros((8, 128), jnp.int32).at[0, :2].set(
        drop_seed.astype(jnp.int32))


def _gen_drop_block(seed_ref, block, rblk, nkh, w, keep_prob):
    """One row-BLOCK of in-kernel attention-dropout multipliers
    [nkh, rblk, w] (f32) — the draw is a pure function of
    (seed, block index), one `prng_seed` + one `prng_random_bits` per
    block (per-ROW reseeding measured ~15 us/kernel of serial VPU
    overhead; bits themselves are vector-parallel and ~free).

    Round 5: the layout is (slot*head)-LEADING so the batched softmax
    chains can consume it as [K+1, heads, rblk, w] with a free leading
    reshape (the r4 [rblk, nkh, w] layout needed a sublane relayout).

    Mosaic caps prng_seed at 2 scalars, so the block index folds into
    the second word (blocks are distinct within a layer; layers draw
    independent seed pairs). prng_random_bits yields SIGNED int32 —
    compare in the uint32 domain or the threshold is wildly wrong
    (measured 0.70 realized drop at p=0.2 before the bitcast).
    """
    thresh = np.uint32(min(2 ** 32 - 1,
                           int(round((1.0 - keep_prob) * 2 ** 32))))
    inv = np.float32(1.0 / keep_prob)
    pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] + block)
    bits = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits((nkh * rblk, w)), jnp.uint32)
    return jnp.where(bits >= thresh, inv, 0.0).reshape(nkh, rblk, w)


def _gen_drop_mults(seed_ref, block, rblk, nkh, w, keep_prob,
                    halo: bool = False):
    """In-kernel attention-dropout multipliers for the forward
    ([nkh, rblk, w], rows [i*R, i*R+R)) or the backward
    (halo=True: [nkh, rblk+2, w], rows [i*R-1, i*R+R]) of row-block
    ``block``. The backward regenerates the neighbor blocks' streams and
    slices their edge rows, so fwd/bwd see the IDENTICAL draw per global
    row — no [K+1, heads, H, W] mask tensor is generated, written, or
    streamed. Out-of-range blocks (-1, nb) produce arbitrary-but-finite
    values; the backward multiplies them only into zero-context terms
    (zero cotangent / NEG logits), exactly like the streamed path's OOB
    ones. Not available in interpret mode (no prng lowering on CPU) —
    the streamed-mask path remains for parity tests and CPU runs."""
    cur = _gen_drop_block(seed_ref, block, rblk, nkh, w, keep_prob)
    if not halo:
        return cur
    prev = _gen_drop_block(seed_ref, block - 1, rblk, nkh, w,
                           keep_prob)[:, rblk - 1:]
    nxt = _gen_drop_block(seed_ref, block + 1, rblk, nkh, w,
                          keep_prob)[:, :1]
    return jnp.concatenate([prev, cur, nxt], axis=1)


def _kernel(
    x_blk,        # [1, R, W, F] block (exact tiling of x)
    halo_top,     # [1, 1, W, F] block — grid row i*R - 1 (zeros at i=0)
    halo_bot,     # [1, 1, W, F] block — grid row i*R + R (zeros at end)
    w_lin,        # [F, HC] VMEM
    wa_t,         # [2*heads, F] VMEM (W @ [a_src | a_dst], transposed —
                  # the attention dots are computed pre-transposed via an
                  # NT dot, avoiding the r4 per-block ad.T big relayout)
    el,           # [K, heads, R, W] block — premasked edge logits
    el_self,      # [heads, R, W] block — self-loop edge logit term
    valid,        # [R, W] float block
    *rest,        # [dmask [K+1, heads, R, W] if has_dropout,] bias [1, HC],
                  # bn_scale [1, HC], bn_bias [1, HC], out_ref [R, W, HC]
    offsets,
    R: int,
    W: int,
    heads: int,
    C: int,
    negative_slope: float,
    fuse_bn: bool,
    fuse_relu: bool,
    has_dropout: bool = False,
    upcast_dots: bool = False,
    rng_drop: bool = False,
    keep_prob: float = 1.0,
):
    dmask = seed_ref = None
    if rng_drop:
        seed_ref, bias, bn_scale, bn_bias, out_ref = rest
    elif has_dropout:
        dmask, bias, bn_scale, bn_bias, out_ref = rest
    else:
        bias, bn_scale, bn_bias, out_ref = rest
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
        w_mat, wa_t_mat = w_lin[:].astype(jnp.float32), wa_t[:].astype(
            jnp.float32)
    else:
        w_mat, wa_t_mat = w_lin[:], wa_t[:]
    xh_e = jnp.dot(xe, w_mat, preferred_element_type=jnp.float32)
    adT0 = jax.lax.dot_general(wa_t_mat, xe, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    xh_e = xh_e.reshape(R + 2, W, HC)
    # (NEGATIVE RESULT 2026-08-19: running the aggregation loop on bf16
    # operands — and even fully-packed bf16 accumulate — measures 2-6%
    # SLOWER than f32 (1425/1480 us vs 1401 us marginal). The VPU has no
    # packed-bf16 ALU win here and the casts + bf16-safe rolls cost more
    # than the saved VMEM traffic; the loop is ALU/issue-bound, not
    # bandwidth-bound.)

    # attention dots per head as lane-clean [H, R(+2), W] arrays: one small
    # transpose of the [(R+2)W, 2*heads] matmul output, then major-dim
    # slices. Everything downstream (logits, softmax) runs on arrays
    # whose minor dim is W — full lane utilization instead of a padded
    # heads-minor layout.
    adT = adT0.reshape(2 * heads, R + 2, W)
    elb = el[:].astype(jnp.float32)             # [K, heads, R, W]
    els = el_self[:].astype(jnp.float32)        # [heads, R, W]

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    # ---- batched softmax (round 5): ALL per-(offset, head) chains run as
    # single ops on [K, H, R, W] / [H, R, W] stacks — the r4 per-pair
    # [R, W] loops issued ~40 small VPU op chains per block and were
    # issue-bound, not bandwidth-bound. Only the column rolls stay
    # per-offset (each offset rolls by a different dc); they batch the
    # head axis. Missing neighbors arrive premasked at ~NEG via el
    # (LeakyReLU keeps them at 0.2*NEG, which exp() flushes to 0).
    a_src_all = adT[:heads]                     # [H, R+2, W]
    a_dst_all = adT[heads:2 * heads][:, 1:R + 1]   # [H, R, W]
    self_lg = leaky(a_src_all[:, 1:R + 1] + a_dst_all + els)
    a_n_all = jnp.stack(
        [pltpu.roll(a_src_all[:, 1 + dr:1 + dr + R], (-dc) % W, 2)
         for dr, dc in offsets], axis=0)        # [K, H, R, W]
    lg_all = leaky(a_n_all + a_dst_all[None] + elb)
    m = jnp.maximum(jnp.max(lg_all, axis=0), self_lg)   # [H, R, W]
    e_all = jnp.exp(lg_all - m[None])
    e_self = jnp.exp(self_lg - m)
    inv = 1.0 / jnp.maximum(jnp.sum(e_all, axis=0) + e_self, 1e-16)
    w_self = e_self * inv                       # [H, R, W]
    wts_all = e_all * inv[None]                 # [K, H, R, W]
    if rng_drop:
        # regenerate the per-row dropout draw in-kernel (see
        # _gen_drop_mults) instead of streaming a [K+1, heads, H, W] mask
        dm = _gen_drop_mults(seed_ref, pl.program_id(0), R,
                             (nk + 1) * heads, W, keep_prob
                             ).reshape(nk + 1, heads, R, W)
        w_self = w_self * dm[nk]
        wts_all = wts_all * dm[:nk]
    elif has_dropout:
        dm = dmask[:].astype(jnp.float32)       # [K+1, heads, R, W]
        w_self = w_self * dm[nk]
        wts_all = wts_all * dm[:nk]

    # head expansion: [H, R, W] -> [R, W, HC] as one MXU matmul per
    # offset with a constant one-hot matrix, fed heads-major: the
    # major-collapse reshape is a layout no-op, and the TN dot_general
    # contracts the heads axis directly. (Broadcast+concat and
    # jnp.stack(axis=-1) both force W-lanes->sublanes relayouts that
    # measure 3x slower end to end.)
    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 1) // C
    head_row = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 0)
    expand_mat = (head_of_col == head_row).astype(jnp.float32)

    def expand_heads(w_hrw):                    # [H, R, W] -> [R, W, HC]
        return jax.lax.dot_general(
            w_hrw.reshape(heads, R * W), expand_mat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(R, W, HC)

    acc = xh_e[1:R + 1] * expand_heads(w_self)
    for k, (dr, dc) in enumerate(offsets):
        xn = xh_e[1 + dr:1 + dr + R]
        xn = pltpu.roll(xn, (-dc) % W, 1)
        acc = acc + xn * expand_heads(wts_all[k])
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
                       use_edge, dmask=None):
    """XLA formulation (identical math) — used for backward + CPU checks.

    ``dmask`` [K+1, heads, H, W] multiplies the post-softmax attention
    weights (attention dropout; self-loop at index K)."""
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

    w_self_ = jnp.exp(self_lg - m) / denom
    wts_ = [exps[k] / denom for k in range(len(offsets))]
    if dmask is not None:
        w_self_ = w_self_ * jnp.moveaxis(dmask[len(offsets)], 0, -1)
        wts_ = [wk * jnp.moveaxis(dmask[k], 0, -1)
                for k, wk in enumerate(wts_)]
    acc = xh * eh(w_self_)
    for k, (dr, dc) in enumerate(offsets):
        acc = acc + shift2(xh, dr, dc) * eh(wts_[k])
    acc = acc + bias.reshape(1, 1, hc)
    return acc * (valid[..., None] > 0)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 13, 14, 15, 17))
def fused_grid_gat(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask,
                   valid, bias, dmask, connectivity, negative_slope,
                   use_edge, block_rows, interpret,
                   compute_dtype=jnp.float32, drop_seed=None,
                   keep_prob=1.0):
    """Fused GAT layer: returns [H, W, heads*C] (pre-BatchNorm, pre-concat
    semantics already applied — caller reshapes/means heads).

    ``dmask`` (or None): [K+1, heads, H, W] attention-dropout multipliers
    applied to the post-softmax weights; streamed into both kernels.

    ``compute_dtype=bfloat16`` streams activations/operands through HBM in
    bf16 with f32 softmax/accumulation (round-3: now available to the
    TRAINING path too, not just the fused-epilogue inference path). The
    backward kernel recomputes the softmax in f32 — gradients treat the
    bf16 rounding as identity (standard mixed-precision practice; master
    weights stay f32 in optax)."""
    return _fused_forward(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                          nbr_mask, valid, bias, connectivity,
                          negative_slope, use_edge, block_rows, interpret,
                          dmask=dmask, compute_dtype=compute_dtype,
                          drop_seed=drop_seed, keep_prob=keep_prob)


def fused_grid_gat_infer(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                         nbr_mask, valid, bias, dmask, connectivity,
                         negative_slope, use_edge, block_rows, interpret, *,
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
    assert dmask is None, "dropout is a training-only feature"
    return _fused_forward(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                          nbr_mask, valid, bias, connectivity,
                          negative_slope, use_edge, block_rows, interpret,
                          bn_scale=bn_scale, bn_bias=bn_bias,
                          fuse_relu=fuse_relu, compute_dtype=compute_dtype)


def _edge_precompute(w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask,
                     use_edge, heads, hgt, wid, compute_dtype):
    """XLA-side per-layer precompute shared by the fwd and bwd kernels.

    el layouts are heads-MAJOR [K, heads, H, W] / [heads, H, W]: W stays
    the minor dim, so the HBM arrays are lane-clean. The trailing-heads
    layout tile-pads 4 lanes to 128 (32x physical inflation) and measures
    ~9x slower to produce and stream (benchmarks/RESULTS.md).

    Returned as a tuple so the custom VJP can stash it in the residuals:
    recomputing el/ea_t in the backward costs a second set of einsums +
    [K, heads, H, W]-scale converts per layer (round-4 profiling).
    """
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
        ea_t = jnp.einsum("khwf->kfhw", ea32).astype(compute_dtype)
        ma_t = jnp.einsum("hwf->fhw", mean_attr).astype(compute_dtype)
    else:
        el = jnp.where(nbm4, 0.0, NEG) * jnp.ones((1, heads, 1, 1))
        el_self = jnp.zeros((heads, hgt, wid), jnp.float32)
        ed = m_edge.shape[0]
        ea_t = jnp.zeros((nbr_mask.shape[0], ed, hgt, wid), compute_dtype)
        ma_t = jnp.zeros((ed, hgt, wid), compute_dtype)
    wa_cat = jnp.concatenate(
        [w_lin @ a_src_mat, w_lin @ a_dst_mat], axis=1)   # [F, 2*heads]
    return (wa_cat.astype(compute_dtype), el.astype(compute_dtype),
            el_self.astype(compute_dtype), ea_t, ma_t)


def _fused_forward(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask,
                   valid, bias, connectivity, negative_slope, use_edge,
                   block_rows, interpret, bn_scale=None, bn_bias=None,
                   fuse_relu=False, compute_dtype=jnp.float32, dmask=None,
                   pre=None, drop_seed=None, keep_prob=1.0):
    offsets = _offsets(connectivity)
    hgt, wid, f_in = x.shape
    heads = a_src_mat.shape[1]
    hc = w_lin.shape[1]
    c = hc // heads
    k = len(offsets)
    r, tiles_ok = _resolve_block_rows(hgt, block_rows, wid)
    fuse_bn = bn_scale is not None
    lowp = compute_dtype != jnp.float32
    if not tiles_ok:  # ragged/small tiles: XLA formulation
        # fall back to the XLA formulation for odd shapes; in low precision,
        # emulate the kernel's rounding (bf16 inputs, f32 accumulation)
        assert drop_seed is None, (
            "in-kernel rng dropout requires the fused-kernel shape rules; "
            "callers must use the streamed dmask on ragged tiles")
        if lowp:
            x = x.astype(compute_dtype).astype(jnp.float32)
            w_lin = w_lin.astype(compute_dtype).astype(jnp.float32)
        out = _reference_forward(
            x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask, valid,
            bias, offsets=offsets, negative_slope=negative_slope,
            use_edge=use_edge, dmask=dmask)
        if fuse_bn:
            out = out * bn_scale + bn_bias
        if fuse_relu:
            out = jnp.maximum(out, 0.0)
        if fuse_bn or fuse_relu:
            out = out * (valid[..., None] > 0)
        return out.astype(compute_dtype)

    if pre is None:
        pre = _edge_precompute(w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                               nbr_mask, use_edge, heads, hgt, wid,
                               compute_dtype)
    wa_cat, el, el_self, _, _ = pre

    x = x.astype(compute_dtype)
    w_lin = w_lin.astype(compute_dtype)
    nb = hgt // r
    xr = x.reshape(nb, r, wid, f_in)
    # halos as plain slices of the block-reshaped view: the r4 strided
    # slices (x[r-1::r]) lowered to index-computed XLA gather fusions
    # (round-5 HLO finding — a large share of the per-layer glue time)
    z = jnp.zeros((1, 1, wid, f_in), compute_dtype)
    halo_top = jnp.concatenate([z, xr[:-1, r - 1:]], 0)
    halo_bot = jnp.concatenate([xr[1:, :1], z], 0)

    if interpret is None:
        interpret = _interpret_default()
    has_dropout = dmask is not None
    rng_drop = drop_seed is not None
    assert not (has_dropout and rng_drop), \
        "streamed dmask and in-kernel rng dropout are mutually exclusive"
    kern = functools.partial(
        _kernel, offsets=offsets, R=r, W=wid, heads=heads, C=c,
        negative_slope=negative_slope, fuse_bn=fuse_bn, fuse_relu=fuse_relu,
        has_dropout=has_dropout,
        upcast_dots=bool(interpret) and lowp,
        rng_drop=rng_drop, keep_prob=float(keep_prob),
    )
    sc2 = (bn_scale if fuse_bn else jnp.ones(hc)).reshape(1, hc)
    bi2 = (bn_bias if fuse_bn else jnp.zeros(hc)).reshape(1, hc)
    dm_specs, dm_args = [], []
    if has_dropout:
        dm_specs = [pl.BlockSpec((k + 1, heads, r, wid),
                                 lambda i: (0, 0, i, 0),
                                 memory_space=pltpu.VMEM)]
        dm_args = [dmask.astype(compute_dtype)]
    elif rng_drop:
        # the seed rides as a tile-shaped VMEM block, not SMEM: vmapped
        # pallas_calls block SMEM inputs at batch size 1, which Mosaic
        # rejects ("divisible by 8 and 128") — an (8, 128) i32 tile is
        # the smallest vmap-legal carrier (found driving the batched
        # grid trainer, round 4)
        dm_specs = [pl.BlockSpec((8, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)]
        dm_args = [_seed_tile(drop_seed)]
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
            *dm_specs,
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
    )(xr, halo_top, halo_bot, w_lin, wa_cat.T, el, el_self,
      valid.astype(jnp.float32), *dm_args, bias.reshape(1, -1), sc2, bi2)


def _bwd_kernel(
    x_blk,       # [1, R, W, F]
    x_top,       # [1, 2, W, F]  x rows iR-2, iR-1 (zero-filled OOB)
    x_bot,       # [1, 2, W, F]  x rows iR+R, iR+R+1
    g_blk,       # [1, R, W, HC] output cotangent
    g_top,       # [1, 1, W, HC]
    g_bot,       # [1, 1, W, HC]
    w_lin,       # [F, HC]
    w_t,         # [HC, F]   (transposed copies: every epilogue dot then
    wa_cat,      # [F, 2*heads]           runs in native NN/TN form — the
    wa_t,        # [2*heads, F]           r4 TT-form d_ad dot paid an
                 #                        [2H, RW] relayout per block,
                 #                        ~135 us/layer, round-5 bisect)
    el,          # [K, heads, R, W] premasked edge logits (center rows)
    el_top,      # [1, K, heads, W] (NEG-filled OOB) — nb-leading layouts
    el_bot,      # [1, K, heads, W]    keep block last-two dims full-size
    el_self,     # [heads, R, W]       (Mosaic tiling rule)
    els_top,     # [1, heads, W] (zero-filled OOB)
    els_bot,     # [1, heads, W]
    valid_blk,   # [R, W] float
    v_top,       # [1, 1, W] (zero OOB)
    v_bot,       # [1, 1, W]
    ea_t,        # [K, ED, R, W] transposed edge attrs (center rows)
    ma_t,        # [ED, R, W] transposed self-loop mean attrs
    *rest,       # [dmask/dm_top/dm_bot if has_dropout,] then outputs:
                 # dx_ref [R, W, F], dw_ref [1, F, HC],
                 # dwa_t_ref [1, 2*heads, F], dme_ref [1, ED, heads],
                 # db_ref [1, 1, HC]
    offsets,
    R: int,
    W: int,
    heads: int,
    C: int,
    ED: int,
    negative_slope: float,
    has_dropout: bool,
    upcast_dots: bool = False,
    lowp: bool = False,
    rng_drop: bool = False,
    keep_prob: float = 1.0,
):
    """Backward of the fused layer for one row block.

    Recomputes the attention softmax on the extended dst domain
    [-1, R+1) (one halo row each side — those rows' weights gate
    cross-block cotangent flow into this block's rows), then emits the
    complete dx for the center rows plus per-block partial weight grads.

    ``lowp`` (compute_dtype=bfloat16 training): streams arrive bf16 and
    ALL matmuls run with bf16 inputs + f32 accumulation — the backward
    has ~3x the forward's large-matmul FLOPs (xh recompute, dx, dW
    epilogues), and f32 MXU passes cost ~4x bf16, so this is the round-4
    train-step lever (softmax math and the wide aggregation chains stay
    f32 — the round-1 negative result showed bf16 *elementwise* operands
    are ALU-bound and slightly slower). ``upcast_dots`` emulates the MXU
    bf16-in/f32-acc semantics on CPU interpret mode by rounding operands
    to bf16 and upcasting.
    """
    dmask = dm_top = dm_bot = seed_ref = None
    if rng_drop:
        seed_ref, dx_ref, dw_ref, dwa_t_ref, dme_ref, db_ref = rest
    elif has_dropout:
        (dmask, dm_top, dm_bot, dx_ref, dw_ref, dwa_t_ref, dme_ref,
         db_ref) = rest
    else:
        dx_ref, dw_ref, dwa_t_ref, dme_ref, db_ref = rest

    HC = heads * C
    nk = len(offsets)
    Rh = R + 2                       # dst rows -1 .. R+1 (relative)
    # xe row r <-> grid row i*R + r - 2;  dst row d <-> xe row d + 2
    xe = jnp.concatenate([x_top[0], x_blk[0], x_bot[0]], axis=0)
    xe2 = xe.reshape((R + 4) * W, xe.shape[-1])
    if upcast_dots:
        xe2 = xe2.astype(jnp.float32)
        w_mat, wa_mat = w_lin[:].astype(jnp.float32), wa_cat[:].astype(
            jnp.float32)
        w_t_mat, wa_t_mat = w_t[:].astype(jnp.float32), wa_t[:].astype(
            jnp.float32)
    else:
        w_mat, wa_mat = w_lin[:], wa_cat[:]
        w_t_mat, wa_t_mat = w_t[:], wa_t[:]
    xh_e = jnp.dot(xe2, w_mat, preferred_element_type=jnp.float32
                   ).reshape(R + 4, W, HC)
    # attention dots computed TRANSPOSED directly (NT dot against the
    # pre-transposed wa_t) — the r4 `ad.T` relayout of [(R+4)W, 2H] cost
    # a per-block big-array transpose
    adT = jax.lax.dot_general(wa_t_mat, xe2, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32
                              ).reshape(2 * heads, R + 4, W)

    ge = jnp.concatenate([g_top[0], g_blk[0], g_bot[0]], axis=0)  # [Rh,W,HC]
    ve = jnp.concatenate([v_top[0], valid_blk[:], v_bot[0]],
                         axis=0)                                  # [Rh, W]
    g_eff = ge.astype(jnp.float32) * (ve[..., None] > 0)

    def leaky(v):
        return jnp.where(v >= 0, v, negative_slope * v)

    def dleaky(v):
        return jnp.where(v >= 0, 1.0, negative_slope)

    # ---- recompute logits + softmax, batched over (offset, head) ----
    # Round 5: every per-(offset, head) [Rh, W] chain of r4 now runs as
    # one op on [K, H, Rh, W] / [H, Rh, W] stacks (the loops were
    # issue-bound — ~200 small VPU ops per block); only the column rolls
    # stay per-offset, batched over heads.
    a_src_all = adT[:heads]                         # [H, R+4, W]
    a_dst_all = adT[heads:2 * heads][:, 1:R + 3]    # [H, Rh, W]
    els_all = jnp.concatenate(
        [els_top[0][:, None], el_self[:], els_bot[0][:, None]],
        axis=1).astype(jnp.float32)                 # [H, Rh, W]
    lg_self = leaky(a_src_all[:, 1:R + 3] + a_dst_all + els_all)
    el_all = jnp.concatenate(
        [el_top[0][:, :, None], el[:], el_bot[0][:, :, None]],
        axis=2).astype(jnp.float32)                 # [K, H, Rh, W]
    a_n_all = jnp.stack(
        [pltpu.roll(a_src_all[:, 1 + dr:1 + dr + Rh], (-dc) % W, 2)
         for dr, dc in offsets], axis=0)            # [K, H, Rh, W]
    lg_all = leaky(a_n_all + a_dst_all[None] + el_all)
    m = jnp.maximum(jnp.max(lg_all, axis=0), lg_self)
    e_all = jnp.exp(lg_all - m[None])
    e_self = jnp.exp(lg_self - m)
    inv = 1.0 / jnp.maximum(jnp.sum(e_all, axis=0) + e_self, 1e-16)
    w_self = e_self * inv                           # [H, Rh, W]
    wts_all = e_all * inv[None]                     # [K, H, Rh, W]

    if rng_drop:
        # regenerate the identical per-row draw as the forward kernel,
        # extended one halo row each side (rows iR-1 .. iR+R); OOB rows
        # (-1, H) multiply only zero-context terms — any finite value ok
        dm_all = _gen_drop_mults(seed_ref, pl.program_id(0),
                                 R, (nk + 1) * heads, W, keep_prob,
                                 halo=True).reshape(nk + 1, heads, Rh, W)
    elif has_dropout:
        dm_all = jnp.concatenate(
            [dm_top[0][:, :, None], dmask[:], dm_bot[0][:, :, None]],
            axis=2).astype(jnp.float32)             # [K+1, H, Rh, W]
    else:
        dm_all = None

    # ---- d(softmax weights) from the aggregation: dwts'_kh = xh_n . g ----
    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 1) // C
    head_row = jax.lax.broadcasted_iota(jnp.int32, (heads, HC), 0)
    expand_mat = (head_of_col == head_row).astype(jnp.float32)

    def expand_heads(w_hrw, rows):    # [H, rows, W] -> [rows, W, HC]
        return jax.lax.dot_general(
            w_hrw.reshape(heads, rows * W), expand_mat,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(rows, W, HC)

    # Round 5: both offset loops below share TWO pre-rolled g copies
    # (dc in {-1, 0, +1}) instead of one [Rh, W, HC]-scale roll per
    # offset; the per-offset residual rolls act on small [H, *, W]
    # arrays. (dwk: collapse(roll(xh) * g) == roll_back(collapse(
    # xh_rows * roll(g, dc))), the column substitution w' = w + dc.)
    g_roll = {dc: (g_eff if dc == 0 else pltpu.roll(g_eff, dc % W, 1))
              for dc in sorted({o[1] for o in offsets})}

    def collapse_heads(p3):           # [Rh, W, HC] -> [heads, Rh, W]
        p2 = p3.reshape(Rh * W, HC)
        r2 = jax.lax.dot_general(expand_mat, p2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return r2.reshape(heads, Rh, W)

    dws_self = collapse_heads(xh_e[1:R + 3] * g_eff)     # [H, Rh, W]
    dwk_all = jnp.stack(
        [pltpu.roll(collapse_heads(
            xh_e[1 + dr:1 + dr + Rh] * g_roll[dc]), (-dc) % W, 2)
         for dr, dc in offsets], axis=0)                 # [K, H, Rh, W]
    if dm_all is not None:
        dws_self_m = dws_self * dm_all[nk]
        dwk_all_m = dwk_all * dm_all[:nk]
    else:
        dws_self_m, dwk_all_m = dws_self, dwk_all

    # ---- softmax + LeakyReLU backward -> d(raw logits) ----
    s_all = w_self * dws_self_m + jnp.sum(wts_all * dwk_all_m, axis=0)
    d_raw_self = w_self * (dws_self_m - s_all) * dleaky(lg_self)
    d_raw_all = (wts_all * (dwk_all_m - s_all[None])
                 * dleaky(lg_all))                       # [K, H, Rh, W]

    # ---- dM_edge partial (center rows only) ----
    # ONE dot over the concatenation of all (offset, self) blocks: Mosaic
    # lowers tiny-output dots to multi_reductions and rejects chained
    # `acc + dot(...)` adds ("only constant accumulators supported"), so
    # the per-offset contributions must share a single zero-initialized
    # contraction.
    d_cat = jnp.concatenate(
        [d_raw_all[k, :, 1:R + 1].reshape(heads, R * W) for k in range(nk)]
        + [d_raw_self[:, 1:R + 1].reshape(heads, R * W)], axis=1)
    ea_all = jnp.concatenate(
        [ea_t[k].astype(jnp.float32).reshape(ED, R * W) for k in range(nk)]
        + [ma_t[:].astype(jnp.float32).reshape(ED, R * W)], axis=1)
    dme_acc = jax.lax.dot_general(ea_all, d_cat, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    # ---- d(a_src), d(a_dst) for center rows ----
    # dst d used a_src at j = d + dr  ->  j's cotangent pulls from
    # d = j - dr (Rh index j + 1 - dr), columns rolled back by +dc
    acc_s = d_raw_self[:, 1:R + 1]
    for k, (dr, dc) in enumerate(offsets):
        acc_s = acc_s + pltpu.roll(
            d_raw_all[k][:, 1 - dr:1 - dr + R], dc % W, 2)
    acc_d = d_raw_self[:, 1:R + 1] + jnp.sum(
        d_raw_all[:, :, 1:R + 1], axis=0)
    d_ad_st = jnp.concatenate([acc_s, acc_d], axis=0).reshape(
        2 * heads, R * W)

    # ---- d(xh) from the aggregation (center rows) ----
    if dm_all is not None:
        w_self_eff = w_self * dm_all[nk]
        wts_eff = wts_all * dm_all[:nk]
    else:
        w_self_eff, wts_eff = w_self, wts_all
    dxh = expand_heads(w_self_eff[:, 1:R + 1], R) * g_eff[1:R + 1]
    for k, (dr, dc) in enumerate(offsets):
        # dxh += shift_k(expand(wts) * g): roll the small weight array
        # and reuse the shared rolled g; expand/multiply on R rows only
        w_r = pltpu.roll(wts_eff[k], dc % W, 2)[:, 1 - dr:1 - dr + R]
        dxh = dxh + expand_heads(w_r, R) * g_roll[dc][1 - dr:1 - dr + R]

    # ---- matmul epilogue: dx and per-block weight-grad partials ----
    # In lowp mode the f32 cotangent intermediates are rounded to bf16
    # at the dot inputs (f32 accumulation): the three [RW, 256]-scale
    # contractions here plus the xh/ad recompute are the kernel's MXU
    # bill, and bf16 inputs run them in one MXU pass instead of ~4.
    if lowp and not upcast_dots:
        cast = lambda t: t.astype(jnp.bfloat16)
    elif lowp:  # interpret emulation: round like the MXU would
        cast = lambda t: t.astype(jnp.bfloat16).astype(jnp.float32)
    else:
        cast = lambda t: t
    dxh2 = cast(dxh.reshape(R * W, HC))
    d_ad_c = cast(d_ad_st)
    # NN / TN contraction forms only (round 5): the r4 NT/TT forms made
    # Mosaic relayout a big operand per block — the d_ad TT dot alone was
    # ~135 us/layer; the pre-transposed w_t/wa_t side inputs are tiny.
    dx = jax.lax.dot_general(dxh2, w_t_mat, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx = dx + jax.lax.dot_general(d_ad_c, wa_t_mat, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dx_ref[:] = dx.reshape(R, W, -1).astype(dx_ref.dtype)

    xe_c2 = xe2.reshape(R + 4, W, -1)[2:R + 2].reshape(R * W, -1)
    if upcast_dots:
        xe_c2 = xe_c2.astype(jnp.float32)
    dw_ref[0] = jax.lax.dot_general(xe_c2, dxh2, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    # dwa emitted TRANSPOSED [2H, F] (NN form); the XLA side re-transposes
    # the tiny cross-block-reduced result once
    dwa_t_ref[0] = jax.lax.dot_general(d_ad_c, xe_c2,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    dme_ref[0] = dme_acc
    db_ref[0] = jnp.sum(g_eff.reshape(Rh, W, HC)[1:R + 1].reshape(R * W, HC),
                        axis=0, keepdims=True)


def _fused_backward(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask,
                    valid, bias, dmask, g, connectivity, negative_slope,
                    use_edge, block_rows, interpret,
                    compute_dtype=jnp.float32, pre=None, drop_seed=None,
                    keep_prob=1.0):
    """Pallas backward: returns (dx, dw_lin, da_src_mat, da_dst_mat,
    dm_edge, dbias). Caller guarantees the shape tiles (same rule as the
    forward kernel).

    ``compute_dtype=bfloat16``: streams (x, g, el, edge attrs, dropout
    masks) and matmul inputs run bf16 with f32 accumulation — see
    _bwd_kernel's ``lowp``. Softmax recompute and the wide aggregation
    chains stay f32, and the per-block weight-grad partials are emitted
    and cross-block-reduced in f32."""
    offsets = _offsets(connectivity)
    hgt, wid, f_in = x.shape
    heads = a_src_mat.shape[1]
    hc = w_lin.shape[1]
    c = hc // heads
    ed = m_edge.shape[0]
    k = len(offsets)
    r, _ = _resolve_block_rows(hgt, block_rows)
    nb = hgt // r

    lowp = compute_dtype != jnp.float32
    cd = compute_dtype
    x32 = x.astype(cd)
    g32 = g.astype(cd)
    valid_f = valid.astype(jnp.float32)

    # el precompute — identical to the forward; normally handed over from
    # the forward's residuals (pre) so it is NOT recomputed here
    if pre is None:
        pre = _edge_precompute(w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                               nbr_mask, use_edge, heads, hgt, wid, cd)
    wa_cat, el, el_self, ea_t, ma_t = pre

    # ALL halo side arrays are plain slices of block-reshaped views +
    # leading-axis moves — the r4 strided slices (x[r-2::r] etc.) lowered
    # to index-computed XLA gather fusions that dominated the per-layer
    # glue (round-5 HLO finding). They carry the block index LEADING so
    # every block's last-two dims stay full-size (Mosaic tiling rule).
    xr = x32.reshape(nb, r, wid, f_in)
    z2 = jnp.zeros((1, 2, wid, f_in), cd)
    # 2-row x halos: rows (iR-2, iR-1) and (iR+R, iR+R+1)
    x_top = jnp.concatenate([z2, xr[:-1, r - 2:]], 0)      # [nb, 2, W, F]
    x_bot = jnp.concatenate([xr[1:, :2], z2], 0)

    zg = jnp.zeros((1, 1, wid, hc), cd)
    gr = g32.reshape(nb, r, wid, hc)
    g_top = jnp.concatenate([zg, gr[:-1, r - 1:]], 0)
    g_bot = jnp.concatenate([gr[1:, :1], zg], 0)

    negrow = jnp.full((1, k, heads, wid), NEG, cd)
    el5 = el.reshape(k, heads, nb, r, wid)
    el_top = jnp.concatenate(
        [negrow, jnp.moveaxis(el5[:, :, :nb - 1, r - 1], 2, 0)],
        0)                                                # [nb, K, heads, W]
    el_bot = jnp.concatenate(
        [jnp.moveaxis(el5[:, :, 1:, 0], 2, 0), negrow], 0)
    zs = jnp.zeros((1, heads, wid), cd)
    els5 = el_self.reshape(heads, nb, r, wid)
    els_top = jnp.concatenate(
        [zs, jnp.moveaxis(els5[:, :nb - 1, r - 1], 1, 0)], 0)
    els_bot = jnp.concatenate(
        [jnp.moveaxis(els5[:, 1:, 0], 1, 0), zs], 0)      # [nb, heads, W]
    zv = jnp.zeros((1, 1, wid), jnp.float32)
    vr5 = valid_f.reshape(nb, r, wid)
    v_top = jnp.concatenate([zv, vr5[:-1, r - 1:]], 0)    # [nb, 1, W]
    v_bot = jnp.concatenate([vr5[1:, :1], zv], 0)

    has_dropout = dmask is not None
    rng_drop = drop_seed is not None
    dm_args, dm_specs = [], []
    if rng_drop:
        dm_specs = [pl.BlockSpec((8, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)]
        dm_args = [_seed_tile(drop_seed)]
    if has_dropout:
        dm32 = dmask.astype(cd)
        onerow = jnp.ones((1, k + 1, heads, wid), cd)
        dm5 = dm32.reshape(k + 1, heads, nb, r, wid)
        dm_top = jnp.concatenate(
            [onerow, jnp.moveaxis(dm5[:, :, :nb - 1, r - 1], 2, 0)], 0)
        dm_bot = jnp.concatenate(
            [jnp.moveaxis(dm5[:, :, 1:, 0], 2, 0), onerow], 0)
        dm_args = [dm32, dm_top, dm_bot]
        dm_specs = [
            pl.BlockSpec((k + 1, heads, r, wid), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k + 1, heads, wid), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k + 1, heads, wid), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    if interpret is None:
        interpret = _interpret_default()
    kern = functools.partial(
        _bwd_kernel, offsets=offsets, R=r, W=wid, heads=heads, C=c, ED=ed,
        negative_slope=negative_slope, has_dropout=has_dropout,
        upcast_dots=bool(interpret) and lowp, lowp=lowp,
        rng_drop=rng_drop, keep_prob=float(keep_prob),
    )
    dx, dw_p, dwa_p, dme_p, db_p = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, r, wid, f_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, wid, f_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, wid, f_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, wid, hc), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wid, hc), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wid, hc), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w_lin
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w_t
            pl.BlockSpec(memory_space=pltpu.VMEM),     # wa_cat
            pl.BlockSpec(memory_space=pltpu.VMEM),     # wa_t
            pl.BlockSpec((k, heads, r, wid), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, heads, wid), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, heads, wid), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, r, wid), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, wid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, wid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, wid), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ed, r, wid), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ed, r, wid), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            *dm_specs,
        ],
        out_specs=[
            pl.BlockSpec((r, wid, f_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_in, hc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * heads, f_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ed, heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hgt, wid, f_in), cd),
            jax.ShapeDtypeStruct((nb, f_in, hc), jnp.float32),
            jax.ShapeDtypeStruct((nb, 2 * heads, f_in), jnp.float32),
            jax.ShapeDtypeStruct((nb, ed, heads), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, hc), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xr, x_top, x_bot, gr, g_top, g_bot, w_lin.astype(cd),
      w_lin.T.astype(cd),
      wa_cat.astype(cd), wa_cat.T.astype(cd), el.astype(cd),
      el_top.astype(cd),
      el_bot.astype(cd), el_self.astype(cd), els_top.astype(cd),
      els_bot.astype(cd), valid_f, v_top, v_bot, ea_t.astype(cd),
      ma_t.astype(cd), *dm_args)

    dw = jnp.sum(dw_p, 0)
    dwa = jnp.sum(dwa_p, 0).T                # kernel emits [2H, F] partials
    dme = jnp.sum(dme_p, 0)
    db = jnp.sum(db_p, 0)[0]
    a_cat = jnp.concatenate([a_src_mat, a_dst_mat], axis=1)   # [HC, 2H]
    dw_lin = dw + dwa @ a_cat.T
    d_a = w_lin.T @ dwa                                       # [HC, 2H]
    das, dad = d_a[:, :heads], d_a[:, heads:]
    return (dx.astype(x.dtype), dw_lin.astype(w_lin.dtype),
            das.astype(a_src_mat.dtype), dad.astype(a_dst_mat.dtype),
            dme.astype(m_edge.dtype), db.astype(bias.dtype))


def _fwd(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask, valid,
         bias, dmask, connectivity, negative_slope, use_edge, block_rows,
         interpret, compute_dtype=jnp.float32, drop_seed=None,
         keep_prob=1.0):
    hgt, wid = x.shape[0], x.shape[1]
    _, tiles_ok = _resolve_block_rows(hgt, block_rows, wid)
    pre = None
    if tiles_ok:
        # share the el/wa_cat precompute between fwd and bwd kernels via
        # the residuals (saves a full recompute of the [K, heads, H, W]
        # einsums + converts in the backward)
        pre = _edge_precompute(w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                               nbr_mask, use_edge, a_src_mat.shape[1],
                               hgt, wid, compute_dtype)
    out = _fused_forward(x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr,
                         nbr_mask, valid, bias, connectivity,
                         negative_slope, use_edge, block_rows, interpret,
                         dmask=dmask, compute_dtype=compute_dtype, pre=pre,
                         drop_seed=drop_seed, keep_prob=keep_prob)
    return out, (x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask,
                 valid, bias, dmask, pre, drop_seed)


def _bwd(connectivity, negative_slope, use_edge, block_rows, interpret,
         compute_dtype, keep_prob, residuals, g):
    (x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask, valid, bias,
     dmask, pre, drop_seed) = residuals
    offsets = _offsets(connectivity)
    hgt, wid = x.shape[0], x.shape[1]
    _, tiles_ok = _resolve_block_rows(hgt, block_rows, wid)
    dmask_ct = None if dmask is None else jnp.zeros_like(dmask)
    seed_ct = (None if drop_seed is None
               else np.zeros(drop_seed.shape, jax.dtypes.float0))

    # `use_edge` gates the bwd kernel only (it assumes the edge-logit
    # path); when False, forward may run Pallas while backward takes the
    # XLA vjp of the parity-tested reference — numerically equivalent.
    if tiles_ok and use_edge:
        # cotangent goes to the kernel in compute_dtype: upcasting a bf16 g
        # to f32 here just to re-round it to bf16 inside _fused_backward
        # materialized an extra [H, W, HC] f32 copy per layer (profiled
        # ~0.2 ms/layer round 4)
        dx, dw, das, dad, dme, db = _fused_backward(
            x, w_lin, a_src_mat, a_dst_mat, m_edge, eattr, nbr_mask, valid,
            bias, dmask, g, connectivity, negative_slope, use_edge,
            block_rows, interpret, compute_dtype=compute_dtype, pre=pre,
            drop_seed=drop_seed, keep_prob=keep_prob)
        return (dx, dw, das, dad, dme, jnp.zeros_like(eattr),
                jnp.zeros_like(nbr_mask), jnp.zeros_like(valid), db,
                dmask_ct, seed_ct)

    # XLA-vjp fallback recomputes in f32 regardless of the forward's
    # stream dtype (bf16 rounding treated as identity)
    g = g.astype(jnp.float32)

    def ref(x_, w_, as_, ad_, me_, b_):
        return _reference_forward(
            x_, w_, as_, ad_, me_, eattr, nbr_mask, valid, b_,
            offsets=offsets, negative_slope=negative_slope,
            use_edge=use_edge, dmask=dmask).astype(jnp.float32)

    _, vjp = jax.vjp(ref, x, w_lin, a_src_mat, a_dst_mat, m_edge, bias)
    dx, dw, das, dad, dme, db = vjp(g)
    return (dx, dw, das, dad, dme, jnp.zeros_like(eattr),
            jnp.zeros_like(nbr_mask), jnp.zeros_like(valid), db, dmask_ct,
            seed_ct)


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
