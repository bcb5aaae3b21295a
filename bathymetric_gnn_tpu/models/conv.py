"""Message-passing layers on PaddedGraph (sparse COO path).

TPU-native re-implementations of the four conv families the reference uses
through PyTorch Geometric (reference: models/gnn.py:120-143). Semantics are
PyG-exact — including GATConv's internally injected self-loops with
mean-filled edge attributes (SURVEY §2.5 Q3) — but expressed as masked
segment reductions over dst-sorted padded edges, which XLA lowers to
TPU-friendly sorted-segment ops. The Pallas fused kernels in
``ops/pallas`` swap in behind ``segment`` for the hot path.

Self-loops are never materialized: each node's self contribution is a dense
[N, ...] term folded into the segment softmax / sums directly.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import segment as seg
from ..ops.graph import PaddedGraph


def _glorot(key, shape, dtype=jnp.float32):
    return nn.initializers.glorot_uniform()(key, shape, dtype)


class GATConv(nn.Module):
    """Graph attention layer, PyG-GATConv-exact.

    For edge j->i (message flows src j to dst i):
      e_ij = LeakyReLU(a_src . W x_j + a_dst . W x_i + a_edge . W_e e_attr)
      alpha_ij = softmax over {j in N(i)} U {i}   (injected self-loop)
      out_i = sum_j alpha_ij W x_j (+ alpha_ii W x_i) ; concat or mean heads
    Self-loop edge attr = per-destination mean of incoming edge attrs
    (PyG add_self_loops fill_value='mean').
    """

    out_channels: int
    heads: int = 4
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    edge_dim: Optional[int] = None
    add_self_loops: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        g: PaddedGraph,
        x: jax.Array,  # [N, F_in]
        deterministic: bool = True,
    ) -> jax.Array:
        h, c = self.heads, self.out_channels
        n = x.shape[0]

        w = self.param("lin_src", _glorot, (x.shape[-1], h * c))
        xh = (x @ w).reshape(n, h, c)  # [N, H, C]

        att_src = self.param("att_src", _glorot, (1, h, c))
        att_dst = self.param("att_dst", _glorot, (1, h, c))
        alpha_src = jnp.sum(xh * att_src, -1)  # [N, H]
        alpha_dst = jnp.sum(xh * att_dst, -1)

        e_src, e_dst, e_mask = g.edge_src, g.edge_dst, g.edge_mask
        alpha_e = seg.gather(alpha_src, e_src) + seg.gather(alpha_dst, e_dst)

        alpha_self = None
        if self.edge_dim is not None and g.edge_attr.shape[-1] > 0:
            we = self.param("lin_edge", _glorot, (self.edge_dim, h * c))
            att_edge = self.param("att_edge", _glorot, (1, h, c))
            # collapse att_edge . (We e) to e @ M (tiny [edge_dim, heads])
            m_edge = jnp.einsum("fac,xac->fa",
                                we.reshape(self.edge_dim, h, c), att_edge)
            alpha_e = alpha_e + g.edge_attr @ m_edge
            if self.add_self_loops:
                # self-loop attr = mean of incoming edge attrs per dst node
                mean_attr = seg.segment_mean(g.edge_attr, e_dst, n, e_mask)
                alpha_self = alpha_src + alpha_dst + mean_attr @ m_edge
        elif self.add_self_loops:
            alpha_self = alpha_src + alpha_dst

        alpha_e = nn.leaky_relu(alpha_e, self.negative_slope)
        if alpha_self is not None:
            alpha_self = nn.leaky_relu(alpha_self, self.negative_slope)

        w_e, w_self = seg.segment_softmax(
            alpha_e, e_dst, n, e_mask, self_logits=alpha_self
        )
        if self.dropout > 0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, w_e.shape)
            w_e = jnp.where(keep, w_e / (1.0 - self.dropout), 0.0)
            if w_self is not None:
                rng2 = self.make_rng("dropout")
                keep_s = jax.random.bernoulli(rng2, 1.0 - self.dropout, w_self.shape)
                w_self = jnp.where(keep_s, w_self / (1.0 - self.dropout), 0.0)

        msgs = seg.gather(xh, e_src) * w_e[..., None]  # [E, H, C]
        out = seg.segment_sum(msgs, e_dst, n, e_mask)
        if w_self is not None:
            out = out + xh * w_self[..., None]

        out = out.reshape(n, h * c) if self.concat else out.mean(1)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (h * c if self.concat else c,))
            out = out + b
        return jnp.where(g.node_mask[:, None], out, 0.0)


class GCNConv(nn.Module):
    """PyG-exact GCN layer: sym-normalized aggregation with self-loops.

    out_i = sum_{j->i} (W x_j) / sqrt(d_i d_j) + (W x_i) / d_i + bias,
    d = 1 + in-degree.
    """

    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: PaddedGraph, x: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        n = x.shape[0]
        w = self.param("kernel", _glorot, (x.shape[-1], self.out_channels))
        xw = x @ w

        ones = g.edge_mask.astype(jnp.float32)
        deg = seg.segment_sum(ones, g.edge_dst, n) + g.node_mask.astype(jnp.float32)
        dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        norm = seg.gather(dinv, g.edge_src) * seg.gather(dinv, g.edge_dst)

        msgs = seg.gather(xw, g.edge_src) * norm[:, None]
        out = seg.segment_sum(msgs, g.edge_dst, n, g.edge_mask)
        out = out + xw * (dinv * dinv)[:, None]  # self-loop term
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_channels,))
        return jnp.where(g.node_mask[:, None], out, 0.0)


class SAGEConv(nn.Module):
    """PyG-exact GraphSAGE (mean aggregator):
    out_i = W_l mean_{j->i} x_j + b_l + W_r x_i."""

    out_channels: int

    @nn.compact
    def __call__(self, g: PaddedGraph, x: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        n = x.shape[0]
        agg = seg.segment_mean(seg.gather(x, g.edge_src), g.edge_dst, n,
                               g.edge_mask)
        wl = self.param("lin_l", _glorot, (x.shape[-1], self.out_channels))
        bl = self.param("bias_l", nn.initializers.zeros, (self.out_channels,))
        wr = self.param("lin_r", _glorot, (x.shape[-1], self.out_channels))
        out = agg @ wl + bl + x @ wr
        return jnp.where(g.node_mask[:, None], out, 0.0)


class GINConv(nn.Module):
    """PyG-exact GIN: mlp((1+eps) x_i + sum_{j->i} x_j), eps=0 fixed,
    inner MLP = Linear-ReLU-Linear (reference: models/gnn.py:138-143)."""

    out_channels: int
    eps: float = 0.0

    @nn.compact
    def __call__(self, g: PaddedGraph, x: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        from .layers import TorchLinear

        n = x.shape[0]
        agg = seg.segment_sum(seg.gather(x, g.edge_src), g.edge_dst, n,
                              g.edge_mask)
        z = (1.0 + self.eps) * x + agg
        z = TorchLinear(self.out_channels)(z)
        z = nn.relu(z)
        z = TorchLinear(self.out_channels)(z)
        return jnp.where(g.node_mask[:, None], z, 0.0)
