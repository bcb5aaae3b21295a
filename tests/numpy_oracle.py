"""Second independent PyG-GATConv oracle: scalar per-edge loops in float64.

VERDICT round-1 weak-point 1: the BASELINE "allclose vs reference PyG"
gate rested on ONE hand-written oracle (tests/torch_ref.py). PyG cannot be
installed here (zero-egress environment), so this module provides a second
derivation that shares NOTHING with the first implementation-wise: no
torch, no vectorized scatter/segment ops — just explicit Python loops over
edges/heads/channels with float64 accumulation, transcribed directly from
PyG's *documented* GATConv forward definition
(reference usage: /root/reference/models/gnn.py:120-143):

    1. x' = x @ W (shared lin for src/dst; no bias)
    2. self-loops appended for every node; their edge_attr is the MEAN of
       the node's incoming real edge_attrs (fill_value='mean'; zero
       vector if the node has no incoming edges)
    3. per-edge logit  e_ij = LeakyReLU(a_src . x'_j + a_dst . x'_i
                                         + a_edge . (W_e eattr_ij))
    4. alpha = softmax over each destination's incoming edges (self-loop
       included)
    5. out_i = sum_j alpha_ij x'_j  per head; heads concat (or mean when
       concat=False); + bias.

Agreement of BOTH oracles with the JAX layers (tests/test_oracles.py)
bounds the chance that a shared misreading of PyG passes the gate.
"""

import math

import numpy as np


def gat_forward_scalar(x, edge_index, edge_attr, params, heads, out_c,
                       concat=True, negative_slope=0.2):
    """Scalar-loop GATConv forward.

    x: [N, F] float; edge_index: [2, E] (src, dst); edge_attr: [E, ED] or
    None. params dict: lin [F, H*C], att_src/att_dst [H, C],
    lin_edge [ED, H*C], att_edge [H, C], bias [H*C or C].
    Returns [N, H*C] (concat) or [N, C].
    """
    x = np.asarray(x, np.float64)
    n, _ = x.shape
    h, c = heads, out_c
    lin = np.asarray(params["lin"], np.float64)
    att_src = np.asarray(params["att_src"], np.float64).reshape(h, c)
    att_dst = np.asarray(params["att_dst"], np.float64).reshape(h, c)
    use_edge = edge_attr is not None
    if use_edge:
        lin_edge = np.asarray(params["lin_edge"], np.float64)
        att_edge = np.asarray(params["att_edge"], np.float64).reshape(h, c)

    xp = (x @ lin).reshape(n, h, c)

    # build per-destination incoming edge lists (real edges)
    src = [int(s) for s in edge_index[0]]
    dst = [int(d) for d in edge_index[1]]
    incoming = {i: [] for i in range(n)}
    for e in range(len(src)):
        incoming[dst[e]].append(e)

    # self-loop edge_attr: mean of incoming real edge_attrs (or zeros)
    loop_attr = {}
    if use_edge:
        ea = np.asarray(edge_attr, np.float64)
        for i in range(n):
            if incoming[i]:
                s = np.zeros(ea.shape[1])
                for e in incoming[i]:
                    s = s + ea[e]
                loop_attr[i] = s / len(incoming[i])
            else:
                loop_attr[i] = np.zeros(ea.shape[1])

    def leaky(v):
        return v if v >= 0 else negative_slope * v

    out = np.zeros((n, h, c))
    for i in range(n):
        # neighbor list: real incoming edges + the self loop (j = i)
        neigh = [(src[e], (ea[e] if use_edge else None))
                 for e in incoming[i]]
        neigh.append((i, (loop_attr[i] if use_edge else None)))
        for a in range(h):
            logits = []
            for j, attr in neigh:
                lg = 0.0
                for ch in range(c):
                    lg += att_src[a, ch] * xp[j, a, ch]
                    lg += att_dst[a, ch] * xp[i, a, ch]
                if use_edge:
                    we = (attr @ lin_edge).reshape(h, c)
                    for ch in range(c):
                        lg += att_edge[a, ch] * we[a, ch]
                logits.append(leaky(lg))
            m = max(logits)
            exps = [math.exp(v - m) for v in logits]
            z = sum(exps)
            for (j, _), e_ in zip(neigh, exps):
                alpha = e_ / z
                for ch in range(c):
                    out[i, a, ch] += alpha * xp[j, a, ch]

    if concat:
        res = out.reshape(n, h * c)
    else:
        res = out.mean(axis=1)
    if "bias" in params and params["bias"] is not None:
        res = res + np.asarray(params["bias"], np.float64)
    return res
