"""On-device edge enumeration for grid graphs.

TPU-native replacement for the reference's vectorized NumPy edge builder
(reference: data/graph_construction.py:176-243). Two representations:

1. Offset-aligned ("structured") form: for each neighbor offset, a dense
   [H, W] validity/neighbor map — no compaction, fixed shapes, feeds the
   dense shifted-window message-passing path.
2. Compacted COO form via ``jnp.nonzero(size=...)`` — static-shape
   compaction for the sparse (PaddedGraph) path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .features import edge_features_for_offset

# Offset enumeration order matches the reference
# (data/graph_construction.py:78-89) so edge ordering — and therefore
# float summation order in parity tests — lines up.
OFFSETS_4 = ((-1, 0), (1, 0), (0, -1), (0, 1))
OFFSETS_8 = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def offsets_for_connectivity(connectivity: int) -> Tuple[Tuple[int, int], ...]:
    if connectivity == 4:
        return OFFSETS_4
    if connectivity == 8:
        return OFFSETS_8
    raise ValueError(f"connectivity must be 4 or 8, got {connectivity}")


def neighbor_valid_mask(
    valid_mask: jax.Array, dr: int, dc: int
) -> jax.Array:
    """[H, W] bool: cell (r, c) has a valid neighbor at (r+dr, c+dc)."""
    h, w = valid_mask.shape
    shifted = jnp.roll(jnp.roll(valid_mask, -dr, 0), -dc, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_bounds = (
        (rows + dr >= 0) & (rows + dr < h) & (cols + dc >= 0) & (cols + dc < w)
    )
    return valid_mask & shifted & in_bounds


def build_node_index_grid(
    valid_mask: jax.Array, rows: jax.Array, cols: jax.Array, node_valid: jax.Array
) -> jax.Array:
    """[H, W] int32 grid mapping cell -> node index (-1 invalid).

    The on-device analogue of the reference's node_index_grid
    (data/graph_construction.py:125-126).
    """
    h, w = valid_mask.shape
    flat = jnp.full(h * w, -1, jnp.int32)
    lin = rows * w + cols
    ids = jnp.arange(rows.shape[0], dtype=jnp.int32)
    # padding slots all write to lin=0 with -1, which is then fixed by the
    # real node at (0,0) if any — use masked scatter: write ids where valid,
    # and scatter padding writes to a dump slot past the end.
    lin = jnp.where(node_valid, lin, h * w)
    flat = jnp.zeros(h * w + 1, jnp.int32) - 1
    flat = flat.at[lin].set(ids, mode="drop")
    return flat[: h * w].reshape(h, w)


def enumerate_nodes(
    valid_mask: jax.Array, n_pad: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compact valid cells to node slots (row-major order, like np.where).

    Returns (rows, cols, node_valid): [n_pad] each.
    """
    rows, cols = jnp.nonzero(valid_mask, size=n_pad, fill_value=0)
    n = jnp.sum(valid_mask.astype(jnp.int32))
    node_valid = jnp.arange(n_pad, dtype=jnp.int32) < n
    return rows.astype(jnp.int32), cols.astype(jnp.int32), node_valid


def enumerate_edges_coo(
    valid_mask: jax.Array,
    rows: jax.Array,
    cols: jax.Array,
    node_valid: jax.Array,
    depth_filled: jax.Array,
    resolution: Tuple[float, float],
    connectivity: int,
    include_self_loops: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Offset-major COO edges with per-edge features, fully on device.

    Edge slot layout: offset o's edges occupy slots [o*n_pad, (o+1)*n_pad),
    aligned with source-node slots — edge (o, i) connects node i to its
    neighbor in direction o when that neighbor exists. This matches the
    reference's offset-major enumeration order after masking/compaction
    (data/graph_construction.py:196-223).

    Returns (src, dst, edge_attr, edge_mask) with E_pad = n_offsets * n_pad
    (+ n_pad when include_self_loops).
    """
    offsets = offsets_for_connectivity(connectivity)
    n_pad = rows.shape[0]
    h, w = valid_mask.shape
    idx_grid = build_node_index_grid(valid_mask, rows, cols, node_valid)
    idx_flat = idx_grid.reshape(-1)

    srcs, dsts, attrs, masks = [], [], [], []
    node_ids = jnp.arange(n_pad, dtype=jnp.int32)
    for dr, dc in offsets:
        nr = rows + dr
        nc = cols + dc
        in_bounds = (nr >= 0) & (nr < h) & (nc >= 0) & (nc < w)
        nr_s = jnp.clip(nr, 0, h - 1)
        nc_s = jnp.clip(nc, 0, w - 1)
        nbr = jnp.take(idx_flat, nr_s * w + nc_s)
        ok = node_valid & in_bounds & (nbr >= 0)
        dense_attr = edge_features_for_offset(depth_filled, dr, dc, resolution)
        ea = dense_attr[rows, cols]  # [n_pad, 3] gathered at source cells
        srcs.append(jnp.where(ok, node_ids, 0))
        dsts.append(jnp.where(ok, nbr, 0))
        attrs.append(jnp.where(ok[:, None], ea, 0.0))
        masks.append(ok)

    if include_self_loops:
        srcs.append(jnp.where(node_valid, node_ids, 0))
        dsts.append(jnp.where(node_valid, node_ids, 0))
        attrs.append(jnp.zeros((n_pad, 3), jnp.float32))
        masks.append(node_valid)

    return (
        jnp.concatenate(srcs),
        jnp.concatenate(dsts),
        jnp.concatenate(attrs),
        jnp.concatenate(masks),
    )


def compact_edges(
    src: jax.Array,
    dst: jax.Array,
    attr: jax.Array,
    mask: jax.Array,
    e_pad: int,
    n_pad: int,
    sort_by_dst: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Compact masked offset-major edges into e_pad slots (device-side).

    Padded edge slots point at the LAST node slot (n_pad - 1) so the
    dst array stays globally non-decreasing — segment reductions rely on
    ``indices_are_sorted=True``. Padded contributions are masked to zero
    everywhere, so the target slot never observes them.
    """
    (idx,) = jnp.nonzero(mask, size=e_pad, fill_value=0)
    n = jnp.sum(mask.astype(jnp.int32))
    keep = jnp.arange(e_pad, dtype=jnp.int32) < n
    src_c = jnp.where(keep, jnp.take(src, idx), 0)
    dst_c = jnp.where(keep, jnp.take(dst, idx), 0)
    attr_c = jnp.where(keep[:, None], jnp.take(attr, idx, axis=0), 0.0)
    if sort_by_dst:
        # stable sort by dst; padded slots sort with key pushed to the end
        # so live edges stay contiguous.
        key = jnp.where(keep, dst_c, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(key, stable=True)
        src_c = jnp.take(src_c, order)
        dst_c = jnp.take(dst_c, order)
        attr_c = jnp.take(attr_c, order, axis=0)
        keep = jnp.take(keep, order)
    src_c = jnp.where(keep, src_c, 0)
    dst_c = jnp.where(keep, dst_c, n_pad - 1)
    return src_c, dst_c, attr_c, keep


def morton_order(pos: np.ndarray, bits: int = 16) -> np.ndarray:
    """Permutation sorting 2-D points along a Z-order (Morton) curve.

    Spatially-close nodes get close indices, so k-NN gathers hit nearby
    HBM rows — the sparse-path analogue of the grid layout's locality.
    """
    p = np.asarray(pos, np.float64)
    lo = p.min(0)
    span = np.maximum(p.max(0) - lo, 1e-12)
    q = ((p - lo) / span * ((1 << bits) - 1)).astype(np.uint64)

    def spread(v):
        v = v & np.uint64((1 << bits) - 1)
        out = np.zeros_like(v)
        for b in range(bits):
            out |= ((v >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b)
        return out

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
    return np.argsort(code, kind="stable")


def hilbert_order(pos: np.ndarray, bits: int = 16) -> np.ndarray:
    """Permutation sorting 2-D points along a Hilbert curve.

    Strictly better locality than Morton for the banded-ELL layout: the
    Hilbert curve has no quadrant-boundary jumps, so k-NN neighbors land
    in closer index bands (measured: ~2-3x lower spill fraction than
    Morton at band_rows=256 on jittered-grid point clouds)."""
    p = np.asarray(pos, np.float64)
    lo = p.min(0)
    span = np.maximum(p.max(0) - lo, 1e-12)
    q = ((p - lo) / span * ((1 << bits) - 1)).astype(np.int64)
    x, y = q[:, 0].copy(), q[:, 1].copy()
    d = np.zeros(len(x), np.int64)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant (vectorized form of the classic d2xy rotation)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return np.argsort(d, kind="stable")


def knn_edges(
    pos: np.ndarray,
    k: int,
    node_valid: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Host-side k-NN edge list from node coordinates.

    Supports the k=8 k-NN graph configs in BASELINE.json. Uses the native
    spatial-hash kit (C++, multithreaded — bathymetric_gnn_tpu.native)
    with a NumPy fallback. Returns [2, N*k] (src=neighbor -> dst=node,
    matching message flow into the node).
    """
    from ..native import knn2d

    n = pos.shape[0]
    if node_valid is None:
        node_valid = np.ones(n, bool)
    live = np.where(node_valid)[0]
    p = np.asarray(pos, np.float32)[live]
    k_eff = min(k, len(live) - 1)
    if k_eff <= 0:
        return np.zeros((2, 0), np.int64)
    nbrs = knn2d(p, k_eff)  # [n_live, k_eff], -1 pads
    ok = nbrs >= 0
    dst = np.repeat(live, k_eff)[ok.reshape(-1)]
    src = live[nbrs.reshape(-1)[ok.reshape(-1)]]
    return np.stack([src, dst], 0)
