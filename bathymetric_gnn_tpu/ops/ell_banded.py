"""Banded ELL layout: the TPU-kernel-friendly sparse graph format.

The plain ELL path (ops/ell.py) is gather-bound: XLA TPU gathers run at
a few percent of HBM peak regardless of locality (benchmarks/RESULTS.md,
Morton A/B). The banded layout makes the sparse GAT layer MXU-friendly
instead:

* Nodes are Morton-ordered (data/graph_build.build_knn_graph does this),
  so almost every k-NN edge connects nodes whose indices differ by less
  than one band of ``R`` rows.
* Destinations are processed in bands of ``R`` rows. Each band's kernel
  invocation holds a 3-band source *window* ``[3R, F]`` resident in VMEM
  (chunks t-1, t, t+1 of the node features).
* An edge is **in-band** iff its source chunk is within +-1 of its
  destination chunk. In-band sources are addressed by a *local window
  index* ``loc = (src_chunk - dst_chunk + 1) * R + src % R`` in
  ``[0, 3R)``; gathering becomes a one-hot matmul against the resident
  window (MXU work, no HBM gather at all).
* The few out-of-window edges (**spill**, ~1% after Hilbert ordering)
  are compacted to a COO list and folded in by a cheap XLA segment pass.
  Softmax stays EXACT across the split by renormalization: the band part
  computes softmax over in-band slots (+ self) only and emits each row's
  logsumexp statistics (max ``m``, denominator ``D``); the spill pass
  then rescales ``y = (y_band * D + Σ e_s · xh_s) / (D + Σ e_s)`` with
  ``e_s = exp(l_s − m)`` — the exact joint softmax, no pre-scatter of
  spill logits into the streamed arrays (profiling showed that scatter
  cost more than the band kernel itself).

This replaces the PyG scatter/gather conv kernels for the k-NN configs
(reference: models/gnn.py:120-143; BASELINE.json "SpMM+SDDMM ... static
edge-count bucketing").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ell import EllGraph

NEG_BIG = -1e30  # pre-LeakyReLU "minus infinity" for dead slots


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BandedEll:
    """Band/spill decomposition of an EllGraph's incidence structure.

    Attributes:
      loc_t:      [K, N] int32 — in-band local window index in [0, 3R),
                  or -1 for dead/spilled slots. Transposed (slot-major,
                  node-minor) so the Pallas stream is lane-clean.
      spill_src:  [S] int32 source node of each spilled edge (0-padded).
      spill_dst:  [S] int32 destination node.
      spill_slot: [S] int32 ELL slot of the spilled edge in its dst row.
      spill_mask: [S] bool live-spill mask.
      band_rows:  R (static).
    """

    loc_t: jax.Array
    spill_src: jax.Array
    spill_dst: jax.Array
    spill_slot: jax.Array
    spill_mask: jax.Array
    # static (per-graph) edge features in kernel-friendly layouts:
    # transposed so N stays the minor dim (an [N, K, H] tensor tile-pads
    # its 4 lanes to 128 = 32x physical HBM traffic — round-1 lesson)
    eattr_t: jax.Array      # [K, Fe, N]
    mean_attr_t: jax.Array  # [Fe, N] masked mean of incoming edge attrs
    spill_eattr: jax.Array  # [S, Fe] edge attrs of spilled edges
    # per-band COMPACTED spill lists (round-3: the Pallas kernel folds
    # spill edges in-kernel — one XLA gather feeds [T, S_max] tables and
    # the segment-scatter + renormalization pass disappears entirely):
    spill_src_b: jax.Array        # [T, S_max] int32 global src (0 pad)
    spill_dst_b: jax.Array        # [T, S_max] int32 global dst (0 pad)
    spill_dst_local_b: jax.Array  # [T, 1, S_max] int32 row-in-band, -1 pad
    spill_eattr_b: jax.Array      # [T, S_max, Fe]
    # source-sorted view of the flat spill list: the spill gathers'
    # backward becomes permute + segment-reduce over contiguous ranges
    # (XLA scatter-adds profiled at ~1.2 ms/layer on the 65k train step).
    # Dead/pad slots carry key N (out of range), sorting to the tail —
    # XLA segment_sum drops them; the Pallas reducer never matches them.
    spill_perm: jax.Array         # [T*S_max] int32 argsort of sort key
    spill_src_sorted: jax.Array   # [T*S_max] int32 key in sorted order
    # per-node-block reduction ranges for the Pallas reducer, block size
    # pick_node_blk(N) = largest pow2 <= 1024 dividing N
    # (src-sorted for xh/a_src cotangents; dst-sorted for a_dst):
    spill_red_first: jax.Array    # [N/blk] int32 first CT_BLK-row ct block
    spill_red_jcount: jax.Array   # [N/blk] int32 number of ct blocks
    spill_red_first_d: jax.Array  # [N/blk] int32 (dst side)
    spill_red_jcount_d: jax.Array
    spill_perm_d: jax.Array       # [T*S_max] int32 argsort of dst key
    spill_dst_sorted: jax.Array   # [T*S_max] int32 dst key sorted
    # dead/spilled slots premasked as an additive logit term (round 5):
    # el_t = einsum(eattr_t, m_edge) + negmask_t keeps the fused kernels
    # free of per-slot where(loc >= 0) selects — LeakyReLU maps NEG_BIG
    # to 0.2*NEG_BIG and exp() flushes it to exact 0. Precomputed here so
    # the per-step add fuses into the el einsum epilogue (computing the
    # repeat+where per step cost ~0.5 ms/layer inside scanned training).
    negmask_t: jax.Array          # [K*H, N] f32, 0 or NEG_BIG
    # round-5 WIDE-kernel streams (ops/pallas/ell_gat_fused.py v3): the
    # kernel works on per-band [K*R, ...] stacks, so the loc table is
    # ALSO kept untransposed ([N, K] — the transposed one-hot builds from
    # sublane-major loc columns), and the edge-attr table + dead mask are
    # pre-interleaved to the band-wide lane order l = k*R + r.
    loc_nb: jax.Array             # [N, K] int32 (= loc_t.T, contiguous)
    eattr_wide_t: jax.Array       # [T, Fe, K*R]
    negmask_wide: jax.Array       # [T, K*R] f32, 0 or NEG_BIG
    band_rows: int = dataclasses.field(metadata=dict(static=True))
    spill_red_maxj: int = dataclasses.field(default=1,
                                            metadata=dict(static=True))
    spill_red_maxj_d: int = dataclasses.field(default=1,
                                              metadata=dict(static=True))

    @property
    def num_bands(self) -> int:
        return self.loc_t.shape[1] // self.band_rows

    def spill_fraction(self, g: EllGraph) -> float:
        live = float(np.asarray(g.nbr_mask).sum())
        return float(np.asarray(self.spill_mask).sum()) / max(live, 1.0)


def band_ell(g: EllGraph, band_rows: int = 128,
             spill_pad: int = 512,
             s_max: Optional[int] = None,
             max_j: Optional[int] = None,
             max_j_d: Optional[int] = None,
             heads: int = 4) -> BandedEll:
    """Host-side band/spill split of an EllGraph (Morton-ordered nodes).

    N must be a multiple of ``band_rows`` (EllGraphs are bucket-padded to
    powers of two, so R in {128, 256, 512} always divides N).
    ``s_max`` forces the per-band spill-table width and ``max_j`` /
    ``max_j_d`` force the reducer grid depths (src / dst side) — all
    three are data-derived statics, so data-parallel shards that must
    stack into one pytree (stack_banded_batches) have to share them.
    Forcing s_max alone usually suffices: stack_banded_batches also
    normalizes max_j across shards after the fact (raising a shard's
    max_j only adds jcount-gated no-op grid steps).
    """
    src = np.asarray(g.nbr_src)          # [N, K]
    mask = np.asarray(g.nbr_mask)
    n, k = src.shape
    r = int(band_rows)
    if n % r != 0:
        raise ValueError(f"N={n} not a multiple of band_rows={r}")

    dst_chunk = (np.arange(n) // r)[:, None]          # [N, 1]
    src_chunk = src // r                              # [N, K]
    j = src_chunk - dst_chunk + 1
    in_band = mask & (j >= 0) & (j <= 2)
    loc = np.where(in_band, j * r + src % r, -1).astype(np.int32)

    spill = mask & ~in_band
    sd, sk = np.nonzero(spill)
    s = len(sd)
    pad = max(int(spill_pad), 1)
    while pad < s:
        pad *= 2
    spill_src = np.zeros(pad, np.int32)
    spill_dst = np.zeros(pad, np.int32)
    spill_slot = np.zeros(pad, np.int32)
    spill_m = np.zeros(pad, bool)
    spill_src[:s] = src[sd, sk]
    spill_dst[:s] = sd
    spill_slot[:s] = sk
    spill_m[:s] = True

    eattr = np.asarray(g.edge_attr, np.float32)           # [N, K, Fe]
    fe = eattr.shape[-1]
    eattr_t = np.ascontiguousarray(eattr.transpose(1, 2, 0))
    cnt = np.maximum(mask.sum(1), 1.0)
    mean_attr = (eattr * mask[..., None]).sum(1) / cnt[:, None]
    spill_eattr = np.zeros((pad, fe), np.float32)
    spill_eattr[:s] = eattr[sd, sk]

    # band-major compacted spill lists (spill_dst==sd is sorted, so the
    # per-band runs are contiguous). S_max = max per-band count rounded
    # up to a sublane multiple; jittered-grid Morton orderings measure
    # max/avg ~ 1.6-2x, so the padding stays modest.
    t_count = n // r
    band_of = sd // r
    counts = np.bincount(band_of, minlength=t_count)
    if s_max is None:
        # power-of-two bucket (floor 64) so jitted consumers compile for
        # a bounded set of spill-table shapes across graph batches
        s_max = 64
        while s_max < int(counts.max() if len(counts) else 1):
            s_max *= 2
    elif len(counts) and int(counts.max()) > s_max:
        raise ValueError(f"forced s_max={s_max} < max per-band spill "
                         f"count {int(counts.max())}")
    spill_src_b = np.zeros((t_count, s_max), np.int32)
    spill_dst_b = np.zeros((t_count, s_max), np.int32)
    spill_dst_local_b = np.full((t_count, 1, s_max), -1, np.int32)
    spill_eattr_b = np.zeros((t_count, s_max, fe), np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    # vectorized band-major fill (this runs per TRAINING batch since the
    # Trainer's sparse path bands each merged batch graph)
    pos_in_band = np.arange(s) - starts[band_of]
    spill_src_b[band_of, pos_in_band] = src[sd, sk]
    spill_dst_b[band_of, pos_in_band] = sd
    spill_dst_local_b[band_of, 0, pos_in_band] = sd % r
    spill_eattr_b[band_of, pos_in_band] = eattr[sd, sk]

    # source-sorted reduction metadata. Sort key maps dead/pad slots to n
    # (out of range -> tail); contiguous per-node ranges let the backward
    # run as permuted loads + block reduction instead of scatter-add.
    dead = spill_dst_local_b[:, 0, :].reshape(-1) < 0

    def red_tables(ids_raw):
        from .pallas.segment_reduce import CT_BLK, pick_node_blk

        node_blk, ct_blk = pick_node_blk(n), CT_BLK
        key = np.where(dead, n, ids_raw).astype(np.int64)
        srt = np.sort(key).astype(np.int32)
        row_start = np.searchsorted(srt, np.arange(0, n + 1, node_blk))
        lo, hi = row_start[:-1], row_start[1:]
        first = np.where(hi > lo, lo // ct_blk, 0).astype(np.int32)
        last = np.where(hi > lo, (hi - 1) // ct_blk, -1)
        jcount = np.maximum(last - first + 1, 0).astype(np.int32)
        return key.astype(np.int32), srt, first, jcount, \
            max(int(jcount.max()) if len(jcount) else 1, 1)

    flat_src = spill_src_b.reshape(-1)
    _, spill_key_sorted, red_first, red_jcount, maxj = \
        red_tables(flat_src)
    if max_j is not None:
        if max_j < maxj:
            raise ValueError(f"forced max_j={max_j} < required {maxj}")
        maxj = max_j
    spill_perm = np.argsort(
        np.where(dead, n, flat_src).astype(np.int64),
        kind="stable").astype(np.int32)
    # dst side (a_dst cotangents): band-major compaction keeps dst ids
    # sorted WITHIN a band but each band's dead tail keys to n, so a
    # dst-side permutation is needed too
    _, dst_key_sorted, red_first_d, red_jcount_d, maxj_d = \
        red_tables(spill_dst_b.reshape(-1))
    if max_j_d is not None:
        if max_j_d < maxj_d:
            raise ValueError(f"forced max_j_d={max_j_d} < required {maxj_d}")
        maxj_d = max_j_d
    spill_perm_d = np.argsort(
        np.where(dead, n, spill_dst_b.reshape(-1)).astype(np.int64),
        kind="stable").astype(np.int32)

    return BandedEll(
        loc_t=jnp.asarray(np.ascontiguousarray(loc.T)),
        spill_src=jnp.asarray(spill_src),
        spill_dst=jnp.asarray(spill_dst),
        spill_slot=jnp.asarray(spill_slot),
        spill_mask=jnp.asarray(spill_m),
        eattr_t=jnp.asarray(eattr_t),
        mean_attr_t=jnp.asarray(np.ascontiguousarray(mean_attr.T)),
        spill_eattr=jnp.asarray(spill_eattr),
        spill_src_b=jnp.asarray(spill_src_b),
        spill_dst_b=jnp.asarray(spill_dst_b),
        spill_dst_local_b=jnp.asarray(spill_dst_local_b),
        spill_eattr_b=jnp.asarray(spill_eattr_b),
        spill_perm=jnp.asarray(spill_perm),
        spill_src_sorted=jnp.asarray(spill_key_sorted),
        spill_red_first=jnp.asarray(red_first),
        spill_red_jcount=jnp.asarray(red_jcount),
        spill_red_first_d=jnp.asarray(red_first_d),
        spill_red_jcount_d=jnp.asarray(red_jcount_d),
        spill_perm_d=jnp.asarray(spill_perm_d),
        spill_dst_sorted=jnp.asarray(dst_key_sorted),
        negmask_t=jnp.asarray(
            np.repeat(np.where(loc.T < 0, np.float32(NEG_BIG),
                               np.float32(0.0)), heads, axis=0)),
        loc_nb=jnp.asarray(np.ascontiguousarray(loc)),
        eattr_wide_t=jnp.asarray(np.ascontiguousarray(
            eattr.reshape(t_count, r, k, fe).transpose(0, 3, 2, 1)
            .reshape(t_count, fe, k * r))),
        negmask_wide=jnp.asarray(np.ascontiguousarray(
            np.where(loc < 0, np.float32(NEG_BIG), np.float32(0.0))
            .reshape(t_count, r, k).transpose(0, 2, 1)
            .reshape(t_count, k * r))),
        band_rows=r,
        spill_red_maxj=maxj,
        spill_red_maxj_d=maxj_d,
    )


def banded_window_source(banded: BandedEll) -> jax.Array:
    """[K, N] global source index each in-band slot refers to (for the
    XLA reference path): chunk (dst_chunk + j - 1), row loc % R."""
    k, n = banded.loc_t.shape
    r = banded.band_rows
    dst_chunk = jnp.arange(n, dtype=jnp.int32)[None, :] // r
    jj = banded.loc_t // r
    gsrc = (dst_chunk + jj - 1) * r + banded.loc_t % r
    return jnp.where(banded.loc_t >= 0, gsrc, 0)


def banded_gat_band_part_xla(
    xh: jax.Array,          # [N, H, C] transformed features
    a_src: jax.Array,       # [N, H]
    a_dst: jax.Array,       # [N, H]
    el_e: jax.Array,        # [N, K, H] raw edge-attr logits (0 if no
                            # edge features; garbage in dead slots is
                            # masked from loc)
    el_self: Optional[jax.Array],   # [N, H] self-loop logit part (edge
                            # mean-attr term), or None for no self loop
    banded: BandedEll,
    negative_slope: float = 0.2,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """XLA reference of the Pallas band kernel's contract.

    Returns (y_band [N, H, C], m [N, H], denom [N, H]): the softmax
    aggregation over IN-BAND slots + the injected self loop, and its
    logsumexp statistics. Spilled/dead slots are masked entirely (their
    local index is -1); banded_gat_spill_pass folds spilled edges in
    exactly by renormalizing with these statistics.
    """
    n, h_dim, c = xh.shape
    in_band = banded.loc_t.T >= 0                        # [N, K]
    gsrc = banded_window_source(banded).T                # [N, K]

    logits = el_e + a_dst[:, None, :] + jnp.take(a_src, gsrc, axis=0)
    logits = jax.nn.leaky_relu(logits, negative_slope)
    logits = jnp.where(in_band[..., None], logits, NEG_BIG)

    m = jnp.max(logits, axis=1)                          # [N, H]
    if el_self is not None:
        self_logit = jax.nn.leaky_relu(a_src + a_dst + el_self,
                                       negative_slope)
        m = jnp.maximum(m, self_logit)
    if el_self is None:
        # all-masked rows: keep m finite (see spill-pass renorm)
        m = jnp.maximum(m, -1e4)
    e = jnp.exp(logits - m[:, None, :])                  # masked -> 0
    e = jnp.where(in_band[..., None], e, 0.0)
    denom = jnp.sum(e, axis=1)
    if el_self is not None:
        e_self = jnp.exp(self_logit - m)
        denom = denom + e_self
    denom = jnp.maximum(denom, 1e-16)

    w_in = e / denom[:, None, :]
    nbr_x = jnp.take(xh, gsrc, axis=0)                   # [N, K, H, C]
    y = jnp.sum(nbr_x * w_in[..., None], axis=1)
    if el_self is not None:
        y = y + xh * (e_self / denom)[..., None]
    return y, m, denom


def banded_gat_spill_pass(
    y_band: jax.Array,      # [N, H, C]
    m: jax.Array,           # [N, H]
    denom: jax.Array,       # [N, H]
    xh: jax.Array,          # [N, H, C]
    a_src: jax.Array,
    a_dst: jax.Array,
    m_edge: Optional[jax.Array],    # [Fe, H] edge-logit matrix (None =
                            # no edge features); spilled edges' logits
                            # come from the static spill_eattr table
    banded: BandedEll,
    negative_slope: float = 0.2,
) -> jax.Array:
    """Fold the spilled edges into the band result EXACTLY by
    renormalization: with in-band stats (m, D) and spill terms
    e_s = exp(l_s − m),

        y = (y_band · D + Σ_s e_s · xh_s) / (D + Σ_s e_s)

    equals the softmax over ALL slots (m is just a shared reference
    point; e_s stays well-scaled because all logits come from the same
    attention distribution). S is tiny after Hilbert ordering and
    spill_dst is sorted by construction, so the two segment-sums are
    cheap."""
    s_src, s_dst = banded.spill_src, banded.spill_dst
    el_spill = (banded.spill_eattr @ m_edge if m_edge is not None
                else 0.0)                                # [S, H]
    logit = jax.nn.leaky_relu(
        jnp.take(a_src, s_src, axis=0)
        + jnp.take(a_dst, s_dst, axis=0)
        + el_spill, negative_slope)                      # [S, H]
    # clamp guards the (self-loop-free, all-edges-spilled) corner from
    # overflowing; e^60 already makes in-band terms negligible
    e_s = jnp.exp(jnp.minimum(logit - m[s_dst], 60.0))
    e_s = jnp.where(banded.spill_mask[:, None], e_s, 0.0)
    msg = jnp.take(xh, s_src, axis=0) * e_s[..., None]   # [S, H, C]
    n = xh.shape[0]
    sum_e = jax.ops.segment_sum(e_s, s_dst, num_segments=n,
                                indices_are_sorted=True)
    sum_msg = jax.ops.segment_sum(msg, s_dst, num_segments=n,
                                  indices_are_sorted=True)
    new_denom = denom + sum_e
    return (y_band * denom[..., None] + sum_msg) / new_denom[..., None]


def banded_gat_spill_pass_flat(
    y2: jax.Array,          # [N, HC] UNNORMALIZED band sums (flat): the
                            # Pallas band kernel emits sum(e*x) without
                            # dividing, so one division happens here
    m: jax.Array,           # [N, H]
    denom: jax.Array,       # [N, H]
    xh2: jax.Array,         # [N, HC] transformed features (flat)
    ac: jax.Array,          # [N, 2H]  [a_src | a_dst] dots
    m_edge: Optional[jax.Array],
    banded: "BandedEll",
    heads: int,
    negative_slope: float = 0.2,
) -> jax.Array:
    """Lane-clean spill fold (same math as banded_gat_spill_pass).

    The [N, H, C] formulation cost ~3 ms/layer in XLA glue on the 65k
    bench: two row-gathers, a scatter, and [N, H, C]-layout broadcasts
    (H=4 sublane-pads to 8, C=64 half-fills lanes) plus relayout copies.
    This variant keeps every wide array [*, HC] (256 lanes), gathers ONE
    combined [xh | a_src] table by spill source and one [a_dst | m] table
    by spill destination, and expands head scalars with one-hot matmuls.
    """
    n, hc = xh2.shape
    c = hc // heads
    s_src, s_dst = banded.spill_src, banded.spill_dst
    el_spill = (banded.spill_eattr @ m_edge if m_edge is not None
                else 0.0)                                    # [S, H]

    src_tab = jnp.concatenate([xh2, ac[:, :heads]], axis=1)  # [N, HC+H]
    sg = jnp.take(src_tab, s_src, axis=0)
    xh_s, a_src_s = sg[:, :hc], sg[:, hc:]
    dst_tab = jnp.concatenate([ac[:, heads:], m], axis=1)    # [N, 2H]
    dg = jnp.take(dst_tab, s_dst, axis=0)
    a_dst_s, m_s = dg[:, :heads], dg[:, heads:]

    logit = jax.nn.leaky_relu(a_src_s + a_dst_s + el_spill, negative_slope)
    e_s = jnp.exp(jnp.minimum(logit - m_s, 60.0))
    e_s = jnp.where(banded.spill_mask[:, None], e_s, 0.0)    # [S, H]

    hoc = jax.lax.broadcasted_iota(jnp.int32, (heads, hc), 1) // c
    hrow = jax.lax.broadcasted_iota(jnp.int32, (heads, hc), 0)
    expand = (hoc == hrow).astype(y2.dtype)                  # [H, HC]

    msg2 = xh_s * (e_s @ expand)                             # [S, HC]
    sum_e = jax.ops.segment_sum(e_s, s_dst, num_segments=n,
                                indices_are_sorted=True)
    sum_msg2 = jax.ops.segment_sum(msg2, s_dst, num_segments=n,
                                   indices_are_sorted=True)
    new_denom = denom + sum_e
    return (y2 + sum_msg2) / (new_denom @ expand)


@jax.custom_vjp
def gather_rows_sorted_bwd(table, idx, perm, sorted_idx):
    """jnp.take(table, idx, axis=0) whose BACKWARD is permute + SORTED
    segment_sum instead of XLA's scatter-add. ``perm``/``sorted_idx`` are
    the stable argsort of ``idx`` (host-precomputed, e.g.
    BandedEll.spill_perm); XLA lowers sorted segment reductions far
    better than random scatters (~1.2 ms -> ~0.3 ms per [65k, 256]
    cotangent on v5e)."""
    return jnp.take(table, idx, axis=0)


def _grs_fwd(table, idx, perm, sorted_idx):
    # zero-width probe carries the table's row count + dtype as JAX types
    probe = jnp.zeros((table.shape[0], 0), table.dtype)
    return jnp.take(table, idx, axis=0), (probe, perm, sorted_idx)


def _grs_bwd(res, ct):
    probe, perm, sorted_idx = res
    ct_sorted = jnp.take(ct, perm, axis=0)
    d_table = jax.ops.segment_sum(ct_sorted, sorted_idx,
                                  num_segments=probe.shape[0],
                                  indices_are_sorted=True)
    import numpy as _np

    f0 = lambda a: _np.zeros(a.shape, jax.dtypes.float0)
    return (d_table.astype(probe.dtype), f0(sorted_idx), f0(perm),
            f0(sorted_idx))


gather_rows_sorted_bwd.defvjp(_grs_fwd, _grs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gather_rows_reduce_bwd(max_j, table, idx, perm, sorted_idx, first,
                           jcount):
    """jnp.take(table, idx, axis=0) whose backward runs the Pallas
    sorted-segment reducer (ops/pallas/segment_reduce.py) — one-hot
    matmuls over contiguous cotangent ranges instead of XLA scatter-add
    (which segment_sum lowers to even for sorted ids; ~1.2 ms per
    [65k, 256] cotangent on v5e). The reducer pads a ragged T*S_max tail
    to CT_BLK itself and derives its node block as pick_node_blk(N) (the
    largest power of two <= 1024 dividing N) — first/jcount must come
    from band_ell so both sides agree on that rule."""
    return jnp.take(table, idx, axis=0)


def _grr_fwd(max_j, table, idx, perm, sorted_idx, first, jcount):
    probe = jnp.zeros((table.shape[0], 0), table.dtype)
    return (jnp.take(table, idx, axis=0),
            (probe, perm, sorted_idx, first, jcount))


def _grr_bwd(max_j, res, ct):
    from .pallas.segment_reduce import segment_reduce_sorted

    probe, perm, sorted_idx, first, jcount = res
    interpret = jax.default_backend() != "tpu"
    ct_sorted = jnp.take(ct, perm, axis=0)
    d_table = segment_reduce_sorted(
        ct_sorted, sorted_idx, first, jcount,
        n=probe.shape[0], max_j=max_j, interpret=interpret)
    import numpy as _np

    f0 = lambda a: _np.zeros(a.shape, jax.dtypes.float0)
    return (d_table.astype(probe.dtype), f0(sorted_idx), f0(perm),
            f0(sorted_idx), f0(first), f0(jcount))


gather_rows_reduce_bwd.defvjp(_grr_fwd, _grr_bwd)
