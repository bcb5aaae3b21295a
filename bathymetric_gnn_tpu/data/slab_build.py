"""Slab-batched graph building for VR refinement grids.

The native VR path (reference: scripts/inference_native.py:249-342)
processes thousands of tiny refinement grids with ~2300 distinct shapes
(3x3..50x50 — reference: data/vr_bag.py:243). Building each grid's graph
through the per-shape jitted builder would trigger one XLA compile per
shape and one device round-trip per grid; both are ruinous.

TPU-native answer: pad every refinement grid host-side into one static
S x S frame, stack a whole batch into a [B, S, S] slab, and run
featurization + edge extraction + cross-grid node compaction as ONE
jitted program that directly emits the bucketed ELL batch graph for the
forward pass. Static shapes everywhere: one compile per (B bucket,
node bucket), a handful total.

Boundary semantics: featurization (masked local stats) is unaffected by
the invalid padding, but np.gradient's one-sided differences and the
Laplacian's symmetric boundary fire at the SLAB edge, not the true grid
edge. Two node-level fixups restore per-grid-exact values at the true
bottom/right borders (the top/left borders coincide with the slab's),
so slab features match the per-grid builder bit-for-bit in f32.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.edges import offsets_for_connectivity
from ..ops.ell import EllGraph
from ..ops.features import _box_filter_sum, compute_grid_features


def _boundary_fixups(
    feats: jax.Array,      # [B, S, S, F] from vmapped compute_grid_features
    depth_filled: jax.Array,  # [B, S, S]
    valid: jax.Array,      # [B, S, S] bool
    hs: jax.Array,         # [B] true grid heights
    ws: jax.Array,         # [B] true grid widths
) -> jax.Array:
    """Restore per-grid gradient/curvature semantics at true borders.

    np.gradient uses one-sided differences at the array edge
    (reference: data/graph_construction.py:285 via np.gradient); on the
    slab the true bottom/right rows sit mid-array, so the central
    difference reads the local-mean fill instead. Same story for the
    Laplacian's symmetric (edge-duplicating) boundary
    (reference: data/graph_construction.py:447).
    """
    B, S, _, F = feats.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (B, S, S), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (B, S, S), 2)
    h = hs.reshape(B, 1, 1)
    w = ws.reshape(B, 1, 1)
    df = depth_filled
    up = jnp.roll(df, 1, axis=1)      # df[r-1]
    down = jnp.roll(df, -1, axis=1)   # df[r+1]
    left = jnp.roll(df, 1, axis=2)    # df[c-1]
    right = jnp.roll(df, -1, axis=2)  # df[c+1]

    gx = feats[..., 3]
    gy = feats[..., 4]
    curv = feats[..., 6]

    # One-sided gradient at the true last row/col (h >= 2 guaranteed by
    # callers; h == S already one-sided at the slab edge — the fixup
    # formula reduces to the same value there, so apply unconditionally).
    last_r = (r == h - 1) & (h >= 2)
    last_c = (c == w - 1) & (w >= 2)
    gy = jnp.where(last_r, df - up, gy)
    gx = jnp.where(last_c, df - left, gx)
    gmag = jnp.sqrt(gx * gx + gy * gy)

    # Laplacian symmetric boundary: the out-of-true-grid neighbor should
    # mirror to the border cell itself (weight 1), replacing the slab's
    # local-mean fill value. Only when the true border is interior to the
    # slab (h < S / w < S) — at the slab edge the pad already mirrors.
    curv = curv + jnp.where(last_r & (h < S), df - down, 0.0)
    curv = curv + jnp.where(last_c & (w < S), df - right, 0.0)
    # re-apply the <3-valid-neighbors curvature gate the fixup may have
    # broken (reference: data/graph_construction.py:449-456)
    count3 = jax.vmap(lambda v: _box_filter_sum(v.astype(jnp.float32), 3)
                      )(valid)
    curv = jnp.where(count3 < 3, 0.0, curv)

    return feats.at[..., 3].set(gx).at[..., 4].set(gy) \
                .at[..., 5].set(gmag).at[..., 6].set(curv)


def _slab_features(depth, valid, uncertainty, hs, ws, stats_window,
                   with_uncertainty):
    """Shared slab featurization: per-grid features with true-boundary
    fixups. Derives the valid mask from NODATA depth when not given."""
    B, S, _ = depth.shape
    if valid is None:
        # BAG NODATA convention (reference: data/vr_bag.py:108) + frame
        rr = jax.lax.broadcasted_iota(jnp.int32, (B, S, S), 1)
        cc = jax.lax.broadcasted_iota(jnp.int32, (B, S, S), 2)
        valid = (jnp.isfinite(depth) & (jnp.abs(depth) < 1.0e5)
                 & (rr < hs.reshape(B, 1, 1)) & (cc < ws.reshape(B, 1, 1)))
    depth0 = jnp.where(valid, jnp.nan_to_num(depth.astype(jnp.float32)), 0.0)

    if with_uncertainty:
        gf = jax.vmap(
            lambda d, v, u: compute_grid_features(d, v, u, stats_window)
        )(depth0, valid, uncertainty)
    else:
        gf = jax.vmap(
            lambda d, v: compute_grid_features(d, v, None, stats_window)
        )(depth0, valid)

    df = jnp.where(valid, depth0, gf.local_mean)
    feats = _boundary_fixups(gf.features, df, valid, hs, ws)
    return feats, df, valid, gf


@partial(jax.jit, static_argnames=("connectivity",
                                   "with_uncertainty", "stats_window"))
def build_slab_grid_inputs(
    depth: jax.Array,        # [B, S, S] f32; NODATA (>=1e5/NaN) at invalid
    valid: Optional[jax.Array],
    uncertainty: Optional[jax.Array],
    hs: jax.Array,
    ws: jax.Array,
    res: jax.Array,          # [B, 2] f32 (res_x, res_y)
    *,
    connectivity: int,
    with_uncertainty: bool,
    stats_window: int = 5,
):
    """Slab -> dense batched-grid model inputs (features/valid/nbr/eattr/
    local_std), per-grid resolutions traced (no per-resolution recompile).

    Feeds BatchedGridGNN directly: the flagship shifted-window fast path
    for VR refinement batches — no compaction, no gathers."""
    from ..models.grid_gat import neighbor_masks, shift

    feats, df, valid, gf = _slab_features(
        depth, valid, uncertainty, hs, ws, stats_window, with_uncertainty)
    offsets = offsets_for_connectivity(connectivity)
    nbr = jax.vmap(lambda v: neighbor_masks(v, offsets))(valid)

    def eattrs(dfb, rxy):
        planes = []
        for dr, dc in offsets:
            dist = jnp.sqrt((dc * rxy[0]) ** 2 + (dr * rxy[1]) ** 2)
            ddiff = dfb - shift(dfb, dr, dc)
            slope = jnp.degrees(jnp.arctan(ddiff / jnp.maximum(dist, 1e-12)))
            planes.append(jnp.stack(
                [jnp.broadcast_to(dist, dfb.shape), ddiff, slope], -1))
        return jnp.stack(planes)

    eattr = jax.vmap(eattrs)(df, res)
    eattr = jnp.where(nbr[..., None], eattr, 0.0)
    return feats, valid, nbr, eattr, gf.local_std


@partial(jax.jit, static_argnames=("connectivity", "n_pad",
                                   "with_uncertainty", "stats_window"))
def build_slab_ell(
    depth: jax.Array,        # [B, S, S] f32; NODATA (>=1e5/NaN) at invalid
    valid: Optional[jax.Array],  # [B, S, S] bool, or None to derive from
                                 # depth + true bounds (saves the transfer)
    uncertainty: Optional[jax.Array],  # [B, S, S] f32 or None
    hs: jax.Array,           # [B] int32 true heights
    ws: jax.Array,           # [B] int32 true widths
    res: jax.Array,          # [B, 2] f32 (res_x, res_y) per grid
    *,
    connectivity: int,
    n_pad: int,
    with_uncertainty: bool,
    stats_window: int = 5,
) -> Tuple[EllGraph, jax.Array, jax.Array, jax.Array]:
    """One-shot batched build: slab -> bucketed ELL graph.

    Node order is row-major per grid, grids in slab order — identical to
    np.where(valid) per grid, so hosts can un-batch with their own
    np.where and per-grid counts.

    Returns (graph, rows, cols, batch_ids) — the latter three [n_pad],
    for callers that want device-side placement.
    """
    B, S, _ = depth.shape
    cells = S * S
    feats, df, valid, gf = _slab_features(
        depth, valid, uncertainty, hs, ws, stats_window, with_uncertainty)
    F = feats.shape[-1]

    # -- cross-grid node compaction ------------------------------------
    flat_valid = valid.reshape(-1)
    (lin,) = jnp.nonzero(flat_valid, size=n_pad, fill_value=0)
    lin = lin.astype(jnp.int32)
    n = jnp.sum(flat_valid.astype(jnp.int32))
    node_valid = jnp.arange(n_pad, dtype=jnp.int32) < n
    b = lin // cells
    rc = lin - b * cells
    r = rc // S
    c = rc - r * S

    # cell -> node-slot lookup (padding writes go to a dump slot)
    lin_w = jnp.where(node_valid, lin, B * cells)
    idx_flat = jnp.full(B * cells + 1, -1, jnp.int32)
    idx_flat = idx_flat.at[lin_w].set(
        jnp.arange(n_pad, dtype=jnp.int32), mode="drop")

    df_flat = df.reshape(-1)
    d_ctr = jnp.take(df_flat, lin)
    res_x = jnp.take(res[:, 0], b)
    res_y = jnp.take(res[:, 1], b)

    offsets = offsets_for_connectivity(connectivity)
    srcs, masks, attrs = [], [], []
    for dr, dc in offsets:
        nr = r + dr
        nc = c + dc
        inb = (nr >= 0) & (nr < S) & (nc >= 0) & (nc < S)
        nbr_lin = b * cells + jnp.clip(nr, 0, S - 1) * S + jnp.clip(nc, 0, S - 1)
        nbr = jnp.take(idx_flat, nbr_lin)
        ok = node_valid & inb & (nbr >= 0)
        # incoming edge src=(r+dr, c+dc) -> dst=(r, c):
        # ddiff = depth(dst) - depth(src) (reference: data/
        # graph_construction.py:346-364, tgt - src convention)
        ddiff = d_ctr - jnp.take(df_flat, nbr_lin)
        dist = jnp.sqrt((dc * res_x) ** 2 + (dr * res_y) ** 2)
        slope = jnp.degrees(jnp.arctan(ddiff / jnp.maximum(dist, 1e-12)))
        ea = jnp.stack([dist, ddiff, slope], -1)
        srcs.append(jnp.where(ok, nbr, 0))
        masks.append(ok)
        attrs.append(jnp.where(ok[:, None], ea, 0.0))

    nbr_src = jnp.stack(srcs, 1)
    nbr_mask = jnp.stack(masks, 1)
    edge_attr = jnp.stack(attrs, 1)

    x = jnp.take(feats.reshape(B * cells, F), lin, axis=0)
    x = jnp.where(node_valid[:, None], x, 0.0)
    local_std = jnp.where(
        node_valid, jnp.take(gf.local_std.reshape(-1), lin), 0.0)
    pos = jnp.stack([c.astype(jnp.float32), r.astype(jnp.float32)], -1)
    graph_id = jnp.where(node_valid, b, -1).astype(jnp.int32)

    g = EllGraph(
        x=x, nbr_src=nbr_src, nbr_mask=nbr_mask, edge_attr=edge_attr,
        node_mask=node_valid, pos=pos, local_std=local_std,
        graph_id=graph_id,
    )
    return g, r, c, b


def pack_slab(
    grids,                   # list of (depth, valid, uncertainty|None, (rx, ry))
    slab_size: int,
    b_pad: int,
    with_uncertainty: bool,
    implicit_valid: bool = False,
):
    """Host-side packing of refinement grids into slab arrays.

    With ``implicit_valid`` the valid mask is NOT materialized for
    transfer: invalid cells are written as NODATA (1e6) into the depth
    slab and the device derives the mask (halves the upload)."""
    S = slab_size
    B = len(grids)
    fill = np.float32(1.0e6) if implicit_valid else np.float32(0.0)
    depth = np.full((b_pad, S, S), fill, np.float32)
    valid = None if implicit_valid else np.zeros((b_pad, S, S), bool)
    unc = np.zeros((b_pad, S, S), np.float32) if with_uncertainty else None
    hs = np.ones(b_pad, np.int32)
    ws = np.ones(b_pad, np.int32)
    res = np.ones((b_pad, 2), np.float32)
    for i, (d, v, u, rxy) in enumerate(grids):
        h, w = d.shape
        if implicit_valid:
            depth[i, :h, :w] = np.where(v, np.nan_to_num(d.astype(np.float32)),
                                        np.float32(1.0e6))
        else:
            depth[i, :h, :w] = np.nan_to_num(d.astype(np.float32))
            valid[i, :h, :w] = v
        if with_uncertainty and u is not None:
            unc[i, :h, :w] = np.nan_to_num(u.astype(np.float32))
        hs[i], ws[i] = h, w
        res[i] = rxy
    return depth, valid, unc, hs, ws, res
