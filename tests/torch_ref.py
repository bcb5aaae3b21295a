"""Hand-written torch implementations of PyG conv semantics.

Independent re-derivation of the message-passing math the reference relies
on through PyTorch Geometric (reference: models/gnn.py:120-143) — used as
the activation-parity oracle (BASELINE "allclose" gate) since PyG itself is
not installed. Mirrors PyG's documented forward definitions including
GATConv's internal self-loop injection with fill_value='mean'.
"""

import math

import torch
import torch.nn.functional as TF
from torch import nn


def scatter_sum(src, index, dim_size):
    out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    return out.index_add(0, index, src)


def scatter_mean(src, index, dim_size):
    s = scatter_sum(src, index, dim_size)
    cnt = scatter_sum(torch.ones(len(index)), index, dim_size).clamp(min=1)
    return s / cnt.view(-1, *([1] * (src.dim() - 1)))


def segment_softmax(alpha, index, dim_size):
    m = torch.full((dim_size,) + alpha.shape[1:], -torch.inf)
    m = m.index_reduce(0, index, alpha, "amax", include_self=True)
    m = torch.where(torch.isfinite(m), m, 0.0)
    e = torch.exp(alpha - m[index])
    denom = scatter_sum(e, index, dim_size).clamp(min=1e-16)
    return e / denom[index]


class RefGATConv(nn.Module):
    """PyG GATConv semantics: shared lin, self-loops with mean edge fill."""

    def __init__(self, in_c, out_c, heads=1, concat=True, edge_dim=None,
                 negative_slope=0.2):
        super().__init__()
        self.h, self.c, self.concat = heads, out_c, concat
        self.negative_slope = negative_slope
        self.lin = nn.Linear(in_c, heads * out_c, bias=False)
        self.att_src = nn.Parameter(torch.randn(1, heads, out_c) * 0.3)
        self.att_dst = nn.Parameter(torch.randn(1, heads, out_c) * 0.3)
        self.edge_dim = edge_dim
        if edge_dim is not None:
            self.lin_edge = nn.Linear(edge_dim, heads * out_c, bias=False)
            self.att_edge = nn.Parameter(torch.randn(1, heads, out_c) * 0.3)
        self.bias = nn.Parameter(torch.randn(heads * out_c if concat else out_c) * 0.1)

    def forward(self, x, edge_index, edge_attr=None):
        n = x.shape[0]
        src, dst = edge_index[0], edge_index[1]
        # inject self loops (PyG add_self_loops, fill_value='mean')
        loop = torch.arange(n)
        if edge_attr is not None:
            loop_attr = scatter_mean(edge_attr, dst, n)
            edge_attr = torch.cat([edge_attr, loop_attr], 0)
        src = torch.cat([src, loop])
        dst = torch.cat([dst, loop])

        xh = self.lin(x).view(n, self.h, self.c)
        a_src = (xh * self.att_src).sum(-1)  # [N, H]
        a_dst = (xh * self.att_dst).sum(-1)
        alpha = a_src[src] + a_dst[dst]
        if edge_attr is not None:
            eh = self.lin_edge(edge_attr).view(-1, self.h, self.c)
            alpha = alpha + (eh * self.att_edge).sum(-1)
        alpha = TF.leaky_relu(alpha, self.negative_slope)
        alpha = segment_softmax(alpha, dst, n)
        out = scatter_sum(xh[src] * alpha.unsqueeze(-1), dst, n)
        out = out.reshape(n, self.h * self.c) if self.concat else out.mean(1)
        return out + self.bias


class RefGCNConv(nn.Module):
    def __init__(self, in_c, out_c):
        super().__init__()
        self.lin = nn.Linear(in_c, out_c, bias=False)
        self.bias = nn.Parameter(torch.randn(out_c) * 0.1)

    def forward(self, x, edge_index):
        n = x.shape[0]
        src, dst = edge_index[0], edge_index[1]
        loop = torch.arange(n)
        src = torch.cat([src, loop])
        dst = torch.cat([dst, loop])
        deg = scatter_sum(torch.ones(len(dst)), dst, n)
        dinv = deg.pow(-0.5)
        dinv[torch.isinf(dinv)] = 0
        norm = dinv[src] * dinv[dst]
        xw = self.lin(x)
        return scatter_sum(xw[src] * norm.unsqueeze(-1), dst, n) + self.bias


class RefSAGEConv(nn.Module):
    def __init__(self, in_c, out_c):
        super().__init__()
        self.lin_l = nn.Linear(in_c, out_c, bias=True)
        self.lin_r = nn.Linear(in_c, out_c, bias=False)

    def forward(self, x, edge_index):
        n = x.shape[0]
        agg = scatter_mean(x[edge_index[0]], edge_index[1], n)
        return self.lin_l(agg) + self.lin_r(x)


class RefGINConv(nn.Module):
    def __init__(self, in_c, out_c, eps=0.0):
        super().__init__()
        self.eps = eps
        self.mlp = nn.Sequential(
            nn.Linear(in_c, out_c), nn.ReLU(), nn.Linear(out_c, out_c)
        )

    def forward(self, x, edge_index):
        n = x.shape[0]
        agg = scatter_sum(x[edge_index[0]], edge_index[1], n)
        return self.mlp((1 + self.eps) * x + agg)
