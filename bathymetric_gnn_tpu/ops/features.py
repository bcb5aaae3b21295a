"""On-device grid featurization (jit-able, dense [H, W] form).

TPU-native replacement for the reference's SciPy/NumPy host featurization
(reference: data/graph_construction.py:245-456). All local statistics are
boundary-aware: only valid cells contribute (masked sums / counts), matching
the reference's V7 fix (docs/LESSONS_LEARNED.md:79-91 — SURVEY Q6).

Numerics: the reference accumulates in float64; on TPU we stay float32 but
subtract the tile's global mean before forming E[x^2]-E[x]^2, which removes
the catastrophic cancellation for deep, flat water (variance is shift
invariant).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Canonical feature order (reference: data/graph_construction.py:60-68);
# uncertainty is appended as channel 8 when present (:303-316).
NODE_FEATURE_NAMES = (
    "depth",
    "local_mean",
    "local_std",
    "gradient_x",
    "gradient_y",
    "gradient_magnitude",
    "curvature",
)


class GridFeatures(NamedTuple):
    """Dense per-cell features of one tile."""

    features: jax.Array  # [H, W, F] float32, zero where invalid
    local_std: jax.Array  # [H, W] float32 (correction normalizer)
    local_mean: jax.Array  # [H, W]
    valid_count: jax.Array  # [H, W] float32 (# valid cells in window)


def _box_filter_sum(x: jax.Array, size: int) -> jax.Array:
    """Sum over a size x size window, zero outside the array boundary.

    Matches ``ndimage.uniform_filter(mode='constant', cval=0) * size**2``
    (reference: data/graph_construction.py:398-432). Separable shift-adds:
    single-channel conv_general_dilated lowers terribly on TPU (C=1 starves
    the MXU), while 2*(size-1) slice-adds of the padded plane fuse into two
    VPU passes.
    """
    pad = size // 2
    h, w = x.shape
    xp = jnp.pad(x, ((pad, size - 1 - pad), (0, 0)))
    xr = xp[0:h]
    for i in range(1, size):
        xr = xr + xp[i:i + h]
    xp = jnp.pad(xr, ((0, 0), (pad, size - 1 - pad)))
    xc = xp[:, 0:w]
    for i in range(1, size):
        xc = xc + xp[:, i:i + w]
    return xc


def _conv3x3(x: jax.Array, kernel: jax.Array, pad_mode: str) -> jax.Array:
    """3x3 stencil with explicit edge handling, as fused shift-adds."""
    import numpy as _np

    h, w = x.shape
    xp = jnp.pad(x, 1, mode=pad_mode)
    out = jnp.zeros_like(x)
    kv = _np.asarray(kernel)  # static stencil weights
    for i in range(3):
        for j in range(3):
            if kv[i, j] != 0.0:
                out = out + float(kv[i, j]) * xp[i:i + h, j:j + w]
    return out


def masked_local_stats(
    depth: jax.Array,
    valid_mask: jax.Array,
    size: int = 5,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Boundary-aware local mean/std/count over a size x size window.

    Mirrors GraphBuilder._masked_local_stats
    (reference: data/graph_construction.py:378-432): masked sums divided by
    valid-neighbor counts; E[x^2]-E[x]^2 variance clamped at 0.
    """
    vf = valid_mask.astype(jnp.float32)
    # Shift-invariance trick replaces the reference's float64 accumulation.
    n_valid = jnp.maximum(jnp.sum(vf), 1.0)
    center = jnp.sum(jnp.where(valid_mask, depth, 0.0)) / n_valid
    d0 = jnp.where(valid_mask, depth - center, 0.0)

    sum_vals = _box_filter_sum(d0, size)
    count = _box_filter_sum(vf, size)
    safe_count = jnp.maximum(count, 1.0)
    mean0 = sum_vals / safe_count

    sum_sq = _box_filter_sum(jnp.where(valid_mask, d0 * d0, 0.0), size)
    variance = jnp.maximum(sum_sq / safe_count - mean0 * mean0, 0.0)
    local_std = jnp.sqrt(variance)
    local_mean = mean0 + center
    # Cells with zero valid neighbours report mean 0 like the reference
    # (sum=0/1 -> 0); keep that convention (mean0 is already 0 there, but the
    # +center shift must be suppressed).
    local_mean = jnp.where(count > 0, local_mean, 0.0)
    return local_mean, local_std, count


def gradients(depth_filled: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """np.gradient semantics: central differences, one-sided at borders.

    Returns (grad_y, grad_x) — matching ``np.gradient(depth_filled)``
    (reference: data/graph_construction.py:285).
    """

    def grad_axis(a: jax.Array, axis: int) -> jax.Array:
        upper = jnp.roll(a, -1, axis)
        lower = jnp.roll(a, 1, axis)
        g = (upper - lower) / 2.0
        n = a.shape[axis]
        idx = lax.broadcasted_iota(jnp.int32, a.shape, axis)
        first = jnp.take(a, jnp.array([1]), axis=axis) - jnp.take(
            a, jnp.array([0]), axis=axis
        )
        last = jnp.take(a, jnp.array([n - 1]), axis=axis) - jnp.take(
            a, jnp.array([n - 2]), axis=axis
        )
        g = jnp.where(idx == 0, jnp.broadcast_to(first, a.shape), g)
        g = jnp.where(idx == n - 1, jnp.broadcast_to(last, a.shape), g)
        return g

    return grad_axis(depth_filled, 0), grad_axis(depth_filled, 1)


def curvature(depth_filled: jax.Array, valid_mask: jax.Array) -> jax.Array:
    """Laplacian curvature, zeroed where <3 valid cells in the 3x3 window.

    Matches ``ndimage.laplace`` (symmetric boundary) + the reference's
    valid-neighbor gate (reference: data/graph_construction.py:434-456).
    """
    import numpy as _np

    lap_kernel = _np.array(
        [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], _np.float32
    )
    lap = _conv3x3(depth_filled, lap_kernel, "symmetric")
    # reference uses ndimage.convolve(mode='constant') for the count
    count = _box_filter_sum(valid_mask.astype(jnp.float32), 3)
    return jnp.where(count < 3, 0.0, lap)


def compute_grid_features(
    depth: jax.Array,
    valid_mask: jax.Array,
    uncertainty: Optional[jax.Array] = None,
    stats_window: int = 5,
) -> GridFeatures:
    """Full dense featurization of a tile.

    Produces the reference's 7 node features (+uncertainty as channel 8)
    in canonical order (reference: data/graph_construction.py:245-316),
    dense over the grid; invalid cells carry zeros.
    """
    depth = depth.astype(jnp.float32)
    valid_mask = valid_mask.astype(bool)
    depth_c = jnp.where(valid_mask, depth, 0.0)  # NaN-safe

    local_mean, local_std, count = masked_local_stats(depth_c, valid_mask, stats_window)

    # Fill invalid cells with the local mean before differential ops so
    # boundaries see the local trend, not nodata spikes
    # (reference: data/graph_construction.py:277-286).
    depth_filled = jnp.where(valid_mask, depth_c, local_mean)

    gy, gx = gradients(depth_filled)
    gmag = jnp.sqrt(gx * gx + gy * gy)
    curv = curvature(depth_filled, valid_mask)

    feats = [depth_c, local_mean, local_std, gx, gy, gmag, curv]
    if uncertainty is not None:
        unc = jnp.where(
            valid_mask & jnp.isfinite(uncertainty), uncertainty.astype(jnp.float32), 0.0
        )
        feats.append(unc)
    f = jnp.stack(feats, axis=-1)
    f = jnp.where(valid_mask[..., None], f, 0.0)
    f = jnp.nan_to_num(f, nan=0.0)
    return GridFeatures(
        features=f,
        local_std=jnp.where(valid_mask, local_std, 0.0),
        local_mean=local_mean,
        valid_count=count,
    )


def edge_features_for_offset(
    depth_filled: jax.Array,
    dr: int,
    dc: int,
    resolution: Tuple[float, float],
) -> jax.Array:
    """Dense per-cell edge features for the (dr, dc) neighbor direction.

    For a source cell (r, c) with target (r+dr, c+dc):
    distance, depth_difference (tgt - src), slope degrees
    (reference: data/graph_construction.py:329-369). Returns [H, W, 3];
    out-of-bounds targets give arbitrary values to be masked by the caller.
    """
    import math

    res_x, res_y = resolution
    dx = dc * res_x
    dy = dr * res_y
    dist = float(math.sqrt(dx * dx + dy * dy))  # static per offset
    tgt = jnp.roll(jnp.roll(depth_filled, -dr, 0), -dc, 1)
    ddiff = tgt - depth_filled
    if dist > 0:
        slope = jnp.degrees(jnp.arctan(ddiff / dist))
    else:
        slope = jnp.zeros_like(ddiff)
    h, w = depth_filled.shape
    return jnp.stack(
        [jnp.full((h, w), dist, jnp.float32), ddiff, slope], axis=-1
    )
