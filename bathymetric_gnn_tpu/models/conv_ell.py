"""Message-passing layers on EllGraph (gather-only sparse path).

Same math and parameter names as models/conv (PyG-exact) so one checkpoint
drives COO, ELL, and dense-grid paths. ELL is the production sparse layout
on TPU (see ops/ell.py); COO remains as the reference implementation and
for degree-unbounded graphs.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.ell import EllGraph, ell_gather, ell_masked_softmax
from .conv import _glorot


def make_banded_dropout_masks(rng, dropout: float, n: int, k: int,
                              heads: int, spill_shape, wide: bool = False):
    """Streamed post-softmax attention-dropout multipliers for the fused
    banded kernel: ([(K+1)*H, N] in-band+self, [T, H, S_max] spill), each
    0 or 1/(1-p). Generated OUTSIDE the kernel with jax.random so the
    forward kernel, backward kernel, and any XLA replay all see the
    identical draw (same scheme as the grid kernel's streamed masks).

    ``wide``: emit the round-5 wide-kernel layout instead —
    ([T, H, (K+1)*R] with lane index k*R + r and the self slot as the
    last R segment, [T, H, S_max]). Draws are iid, so the layout choice
    only changes stream addressing, not semantics."""
    t_count, _, s_max = spill_shape
    r1, r2 = jax.random.split(rng)
    scale = 1.0 / (1.0 - dropout)
    if wide:
        r_band = n // t_count
        dm = jax.random.bernoulli(
            r1, 1.0 - dropout,
            (t_count, heads, (k + 1) * r_band)).astype(jnp.float32)
    else:
        dm = jax.random.bernoulli(r1, 1.0 - dropout,
                                  ((k + 1) * heads, n)).astype(jnp.float32)
    dm_sp = jax.random.bernoulli(r2, 1.0 - dropout,
                                 (t_count, heads, s_max)).astype(jnp.float32)
    return dm * scale, dm_sp * scale


def banded_masks_wide_to_khn(dm_w: jax.Array, k: int, heads: int):
    """[T, H, (K+1)*R] wide mask -> [(K+1)*H, N] (v2/test-oracle layout):
    element (t, h, kk*R + r) maps to (kk*H + h, t*R + r)."""
    t_count, h_dim, _ = dm_w.shape
    r_band = dm_w.shape[-1] // (k + 1)
    return (dm_w.reshape(t_count, h_dim, k + 1, r_band)
            .transpose(2, 1, 0, 3).reshape((k + 1) * heads, t_count * r_band))


class GATConvELL(nn.Module):
    """PyG-exact GAT on the ELL layout (cf. models/conv.GATConv)."""

    out_channels: int
    heads: int = 4
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    edge_dim: Optional[int] = None
    add_self_loops: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: EllGraph, x: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        h, c = self.heads, self.out_channels
        n, k = g.nbr_src.shape

        w = self.param("lin_src", _glorot, (x.shape[-1], h * c))
        xh = (x @ w).reshape(n, h, c)

        att_src = self.param("att_src", _glorot, (1, h, c))
        att_dst = self.param("att_dst", _glorot, (1, h, c))
        a_src = jnp.sum(xh * att_src, -1)  # [N, H]
        a_dst = jnp.sum(xh * att_dst, -1)

        logits = ell_gather(a_src, g.nbr_src) + a_dst[:, None, :]  # [N,K,H]

        self_logit = None
        if self.edge_dim is not None and g.edge_attr.shape[-1] > 0:
            we = self.param("lin_edge", _glorot, (self.edge_dim, h * c))
            att_edge = self.param("att_edge", _glorot, (1, h, c))
            # collapse att_edge . (We e) to e @ M (tiny [edge_dim, heads])
            m_edge = jnp.einsum("fac,xac->fa",
                                we.reshape(self.edge_dim, h, c), att_edge)
            logits = logits + g.edge_attr @ m_edge
            if self.add_self_loops:
                cnt = jnp.maximum(
                    jnp.sum(g.nbr_mask.astype(jnp.float32), 1), 1.0)
                mean_attr = jnp.sum(
                    jnp.where(g.nbr_mask[..., None], g.edge_attr, 0.0), 1
                ) / cnt[:, None]
                self_logit = a_src + a_dst + mean_attr @ m_edge
        elif self.add_self_loops:
            self_logit = a_src + a_dst

        logits = nn.leaky_relu(logits, self.negative_slope)
        if self_logit is not None:
            self_logit = nn.leaky_relu(self_logit, self.negative_slope)

        wts, w_self = ell_masked_softmax(logits, g.nbr_mask, self_logit)
        if self.dropout > 0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, wts.shape)
            wts = jnp.where(keep, wts / (1.0 - self.dropout), 0.0)
            if w_self is not None:
                rng2 = self.make_rng("dropout")
                ks = jax.random.bernoulli(rng2, 1.0 - self.dropout,
                                          w_self.shape)
                w_self = jnp.where(ks, w_self / (1.0 - self.dropout), 0.0)

        nbr_x = ell_gather(xh, g.nbr_src)            # [N, K, H, C]
        out = jnp.sum(nbr_x * wts[..., None], axis=1)
        if w_self is not None:
            out = out + xh * w_self[..., None]

        out = out.reshape(n, h * c) if self.concat else out.mean(1)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (h * c if self.concat else c,))
            # keep the producer's stream dtype (bf16 stays bf16 end to end)
            out = out + b.astype(out.dtype)
        return jnp.where(g.node_mask[:, None], out, 0.0)


class GATConvEllBanded(nn.Module):
    """PyG-exact GAT on the banded ELL decomposition (ops/ell_banded.py).

    Identical math and parameter names to GATConvELL, so one checkpoint
    drives the plain-ELL, banded-XLA, and banded-Pallas paths; outputs
    are parity-tested against GATConvELL. ``use_pallas`` swaps the band
    part for the fused TPU kernel (ops/pallas/ell_gat_fused.py).

    With ``spill_in_kernel`` (round-3 default) the kernel folds spill
    edges from per-band compacted tables and emits the normalized
    output directly — no XLA scatter/renorm pass — and attention
    dropout streams in as post-softmax multiplier masks (the same
    fwd/bwd-shared-draw scheme as the grid kernel), making this path
    training-capable. The legacy path (spill_in_kernel=False) keeps the
    band kernel + XLA spill fold and supports no dropout.
    """

    out_channels: int
    heads: int = 4
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    edge_dim: Optional[int] = None
    add_self_loops: bool = True
    use_bias: bool = True
    use_pallas: bool = False
    # round-3 kernel: spill edges fold in-kernel from per-band compacted
    # tables; supports streamed attention dropout (training-capable)
    spill_in_kernel: bool = True
    # round-5 kernel: per-band [K*R, ...] wide stacks — one MXU dot per
    # gather/scatter instead of K, spill attention logits in-kernel (the
    # v2 per-slot kernels were dispatch-bound; see ell_gat_fused.py v3
    # banner). Requires spill_in_kernel.
    wide_kernel: bool = True
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, g: EllGraph, banded, x: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        from ..ops.ell_banded import (banded_gat_band_part_xla,
                                      banded_gat_spill_pass,
                                      banded_gat_spill_pass_flat)

        if (self.dropout > 0 and not deterministic
                and not (self.use_pallas and self.spill_in_kernel)):
            raise NotImplementedError(
                "attention dropout on the banded path needs the fused "
                "kernel (use_pallas=True, spill_in_kernel=True); train "
                "with GATConvELL otherwise (same parameters)")

        h, c = self.heads, self.out_channels
        n, k = g.nbr_src.shape

        # compute_dtype=bfloat16: the projection runs on the MXU with bf16
        # inputs (f32 passes cost ~4x) and the layer's activations stream
        # through HBM in bf16 end to end — the kernels already run bf16
        # I/O; keeping xh/bias/output f32 made every surrounding XLA pass
        # (BN, spill gathers, loss heads) pay doubled traffic (round 4)
        cd = (jnp.bfloat16 if self.compute_dtype == "bfloat16"
              else jnp.float32)
        w = self.param("lin_src", _glorot, (x.shape[-1], h * c))
        xh2 = jnp.dot(x.astype(cd), w.astype(cd),
                      preferred_element_type=cd)  # [N, HC] flat (lane-clean)
        xh = xh2.reshape(n, h, c)

        att_src = self.param("att_src", _glorot, (1, h, c))
        att_dst = self.param("att_dst", _glorot, (1, h, c))
        if self.use_pallas and self.spill_in_kernel and deterministic:
            # INFERENCE: fold W into the attention dots, a = x @ (W.att)
            # — exactly sum(xh * att, -1) but keeps xh2's ONLY consumers
            # the Pallas kernel + the spill row gather, so XLA emits it
            # row-major (the [n, h, c] einsum consumer made it pick a
            # column-major dot layout + two relayout copies,
            # ~0.2 ms/layer: 236 -> 257 M edges/s on the 65k bench).
            # Training keeps the xh form — the folded version adds a
            # second dx path in the backward and measured 6% SLOWER.
            w3 = w.reshape(x.shape[-1], h, c)
            a_src = x @ jnp.einsum("fhc,xhc->fh", w3, att_src)   # [N, H]
            a_dst = x @ jnp.einsum("fhc,xhc->fh", w3, att_dst)
        else:
            a_src = jnp.sum(xh * att_src, -1)  # [N, H]
            a_dst = jnp.sum(xh * att_dst, -1)
        wide = (self.use_pallas and self.spill_in_kernel
                and self.wide_kernel)

        m_edge = None
        if self.edge_dim is not None and g.edge_attr.shape[-1] > 0:
            we = self.param("lin_edge", _glorot, (self.edge_dim, h * c))
            att_edge = self.param("att_edge", _glorot, (1, h, c))
            m_edge = jnp.einsum("fac,xac->fa",
                                we.reshape(self.edge_dim, h, c), att_edge)

        if self.use_pallas and wide:
            # round-5 WIDE kernel: attention dots, spill logits and the
            # leaky/softmax all live in-kernel; a_src/a_dst above are
            # DCE'd. Streams: wide-lane el table + self logits only.
            from ..ops.pallas.ell_gat_fused import ell_gat_fused_wide_pallas

            t_count = banded.negmask_wide.shape[0]
            if m_edge is not None:
                el_w_b = (jnp.einsum("tfl,fh->thl", banded.eattr_wide_t,
                                     m_edge)
                          + banded.negmask_wide[:, None, :])
                el_self_t = (m_edge.T @ banded.mean_attr_t
                             if self.add_self_loops else None)
            else:
                el_w_b = jnp.broadcast_to(
                    banded.negmask_wide[:, None, :],
                    (t_count, h, banded.negmask_wide.shape[1]))
                el_self_t = (jnp.zeros((h, n), x.dtype)
                             if self.add_self_loops else None)
            hoc = jax.lax.broadcasted_iota(jnp.int32, (h * c, h), 0) // c
            hcol = jax.lax.broadcasted_iota(jnp.int32, (h * c, h), 1)
            diag = (hoc == hcol).astype(x.dtype)
            a_cat_mat = jnp.concatenate(
                [diag * att_src.reshape(h * c)[:, None],
                 diag * att_dst.reshape(h * c)[:, None]], axis=1)
            dropout_masks = drop_seed = None
            if self.dropout > 0 and not deterministic:
                rng = self.make_rng("dropout")
                if jax.default_backend() == "tpu":
                    # in-kernel rng dropout: fwd/bwd regenerate the same
                    # per-band draw from this seed — no mask tensors are
                    # generated or streamed. CPU/interpret keeps streamed
                    # masks so parity tests can pin the draw.
                    drop_seed = jax.lax.bitcast_convert_type(
                        jax.random.bits(rng, (2,), jnp.uint32), jnp.int32)
                else:
                    dropout_masks = make_banded_dropout_masks(
                        rng, self.dropout, n, k, h,
                        banded.spill_dst_local_b.shape, wide=True)
            out2 = ell_gat_fused_wide_pallas(
                xh, a_cat_mat, el_w_b, el_self_t, m_edge, banded,
                negative_slope=self.negative_slope,
                compute_dtype=self.compute_dtype,
                dropout_masks=dropout_masks, drop_seed=drop_seed,
                keep_prob=1.0 - self.dropout,
            )
            out = out2.reshape(n, h, c)
        elif self.use_pallas:
            from ..ops.pallas.ell_gat_fused import (ell_gat_band_part_pallas,
                                                    ell_gat_fused_pallas)

            # lane-clean streams from the STATIC transposed edge-attr
            # tables (N minor everywhere; an [N, K, H] el tensor would
            # tile-pad 4 lanes to 128 — 32x physical HBM traffic).
            # Dead/spilled slots (loc -1) arrive PREMASKED at ~NEG_BIG in
            # the el stream itself (round 5): LeakyReLU keeps them at
            # 0.2*NEG_BIG, which exp() flushes to 0 — so the kernels'
            # batched [K*H, R] softmax chains need no per-slot
            # where(loc >= 0) select, and the mask add fuses into the el
            # einsum epilogue here.  The additive-constant vjp routes the
            # (exactly zero) dead-slot cotangents straight to m_edge.
            from ..ops.ell_banded import NEG_BIG

            if banded.negmask_t.shape[0] == k * h:
                negmask_t = banded.negmask_t.astype(x.dtype)
            else:  # banded built for a different head count — rebuild
                negmask_t = jnp.repeat(
                    jnp.where(banded.loc_t < 0, jnp.float32(NEG_BIG), 0.0),
                    h, axis=0).astype(x.dtype)              # [K*H, N]
            if m_edge is not None:
                el_t = jnp.einsum("kfn,fh->khn", banded.eattr_t,
                                  m_edge).reshape(k * h, n) + negmask_t
                el_self_t = (m_edge.T @ banded.mean_attr_t
                             if self.add_self_loops else None)
            else:
                el_t = negmask_t
                el_self_t = (jnp.zeros((h, n), x.dtype)
                             if self.add_self_loops else None)
            hoc = jax.lax.broadcasted_iota(jnp.int32, (h * c, h), 0) // c
            hcol = jax.lax.broadcasted_iota(jnp.int32, (h * c, h), 1)
            diag = (hoc == hcol).astype(x.dtype)
            a_cat_mat = jnp.concatenate(
                [diag * att_src.reshape(h * c)[:, None],
                 diag * att_dst.reshape(h * c)[:, None]], axis=1)
            if self.spill_in_kernel:
                dropout_masks = None
                if self.dropout > 0 and not deterministic:
                    dropout_masks = make_banded_dropout_masks(
                        self.make_rng("dropout"), self.dropout, n, k, h,
                        banded.spill_dst_local_b.shape)
                out2 = ell_gat_fused_pallas(
                    xh, a_src, a_dst, a_cat_mat, el_t, el_self_t, m_edge,
                    banded, negative_slope=self.negative_slope,
                    compute_dtype=self.compute_dtype,
                    dropout_masks=dropout_masks,
                )
            else:
                y2, m, denom = ell_gat_band_part_pallas(
                    xh, a_cat_mat, el_t, el_self_t, banded,
                    negative_slope=self.negative_slope,
                    compute_dtype=self.compute_dtype,
                )
                # lane-clean spill fold on flat [N, HC] arrays (avoids the
                # [N, H, C] relayout copies + broadcasts that dominated the
                # first banded bench — benchmarks/RESULTS.md round 2)
                out2 = banded_gat_spill_pass_flat(
                    y2, m, denom, xh2,
                    jnp.concatenate([a_src, a_dst], axis=1), m_edge, banded,
                    heads=h, negative_slope=self.negative_slope,
                )
            out = out2.reshape(n, h, c)
        else:
            if m_edge is not None:
                el_e = g.edge_attr @ m_edge                   # [N, K, H]
                el_self = (banded.mean_attr_t.T @ m_edge
                           if self.add_self_loops else None)
            else:
                el_e = jnp.zeros((n, k, h), x.dtype)
                el_self = (jnp.zeros((n, h), x.dtype)
                           if self.add_self_loops else None)
            y, m, denom = banded_gat_band_part_xla(
                xh, a_src, a_dst, el_e, el_self, banded,
                negative_slope=self.negative_slope,
            )
            out = banded_gat_spill_pass(
                y, m, denom, xh, a_src, a_dst, m_edge, banded,
                negative_slope=self.negative_slope,
            )

        out = out.reshape(n, h * c) if self.concat else out.mean(1)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (h * c if self.concat else c,))
            # keep the producer's stream dtype (bf16 stays bf16 end to end)
            out = out + b.astype(out.dtype)
        return jnp.where(g.node_mask[:, None], out, 0.0)


class GCNConvELL(nn.Module):
    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: EllGraph, x: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        n = x.shape[0]
        w = self.param("kernel", _glorot, (x.shape[-1], self.out_channels))
        xw = x @ w
        deg = jnp.sum(g.nbr_mask.astype(jnp.float32), 1) + g.node_mask
        dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        nbr = ell_gather(xw, g.nbr_src)
        nbr_dinv = ell_gather(dinv, g.nbr_src)
        msgs = nbr * (nbr_dinv * g.nbr_mask)[..., None] * dinv[:, None, None]
        out = jnp.sum(msgs, 1) + xw * (dinv * dinv)[:, None]
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_channels,))
        return jnp.where(g.node_mask[:, None], out, 0.0)


class SAGEConvELL(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, g: EllGraph, x: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        nbr = ell_gather(x, g.nbr_src)
        m = g.nbr_mask.astype(x.dtype)
        agg = jnp.sum(nbr * m[..., None], 1) / jnp.maximum(
            jnp.sum(m, 1), 1.0)[:, None]
        wl = self.param("lin_l", _glorot, (x.shape[-1], self.out_channels))
        bl = self.param("bias_l", nn.initializers.zeros, (self.out_channels,))
        wr = self.param("lin_r", _glorot, (x.shape[-1], self.out_channels))
        out = agg @ wl + bl + x @ wr
        return jnp.where(g.node_mask[:, None], out, 0.0)


class GINConvELL(nn.Module):
    out_channels: int
    eps: float = 0.0

    @nn.compact
    def __call__(self, g: EllGraph, x: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        from .layers import TorchLinear

        nbr = ell_gather(x, g.nbr_src)
        agg = jnp.sum(nbr * g.nbr_mask[..., None].astype(x.dtype), 1)
        z = (1.0 + self.eps) * x + agg
        z = TorchLinear(self.out_channels)(z)
        z = nn.relu(z)
        z = TorchLinear(self.out_channels)(z)
        return jnp.where(g.node_mask[:, None], z, 0.0)
