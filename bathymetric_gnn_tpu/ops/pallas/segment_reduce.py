"""Pallas sorted-segment reducer: the spill-gather backward without
scatters.

XLA lowers ``segment_sum`` to scatter-add even over sorted ids —
profiled at ~1.2 ms per [65k, 256] spill cotangent on the k-NN train
step (benchmarks/RESULTS.md round 3). With the cotangent rows PERMUTED
into source-sorted order, every 128-node output block receives a
CONTIGUOUS row range, so the reduction becomes a handful of one-hot
matmuls per block:

    d_table[128b : 128b+128] = Σ_j onehot(ids_block_j) @ ct_block_j

* grid = (node_blocks, max_j); scalar-prefetched ``first[b]`` selects
  which 512-row cotangent block the (b, j) step streams; ``jcount[b]``
  gates steps past the block's range (the index map clamps, and a
  revisited block would double-count without the gate).
* the one-hot compare (ids == 128b + r) self-masks rows belonging to
  other node blocks and the id==N tail (dead/pad slots), so ranges can
  overlap block boundaries freely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NODE_BLK = 1024   # preferred; shrinks to the largest power of two
CT_BLK = 256      # dividing n when n < 1024 (see pick_node_blk)


def pick_node_blk(n: int) -> int:
    """Largest power of two <= NODE_BLK dividing ``n``.

    Bucketed graphs guarantee n is a multiple of band_rows (>= 128), but
    merged training batches can be e.g. 2 x 256 = 512 < NODE_BLK — the
    reducer and the host-side range tables (ell_banded.band_ell) must
    agree on the block size, so both call this."""
    blk = NODE_BLK
    while blk > 1 and n % blk != 0:
        blk //= 2
    if blk < 8:
        raise ValueError(
            f"segment_reduce_sorted needs n divisible by a power of two "
            f">= 8 (got n={n}); bucket node counts to multiples of 128")
    return blk


def _reduce_kernel(first_ref, jcount_ref, ids_ref, ct_ref, out_ref, *,
                   node_blk: int):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j < jcount_ref[b])
    def _():
        ids = ids_ref[0]                                    # [CT_BLK]
        rows = jax.lax.broadcasted_iota(jnp.int32,
                                        (node_blk, ids.shape[0]), 0)
        oh = (rows + b * node_blk == ids[None, :]).astype(jnp.float32)
        out_ref[:] = out_ref[:] + jax.lax.dot_general(
            oh, ct_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "max_j", "interpret"))
def segment_reduce_sorted(ct_sorted, ids_sorted, first, jcount, *,
                          n: int, max_j: int, interpret: bool = False):
    """Σ of ``ct_sorted`` rows into their (sorted) segment ids.

    ct_sorted: [S, F] cotangents permuted to id-sorted order (any S; a
    ragged tail is zero-padded to CT_BLK here, pad ids key to n and
    reduce to nowhere). ids_sorted: [S] int32. first/jcount:
    [n/node_blk] int32 with node_blk = pick_node_blk(n) (host
    precomputed, e.g. BandedEll.spill_red_*; the block size is derived
    back from len(first)). Returns [n, F] f32.
    """
    s, f = ct_sorted.shape
    node_blk = n // first.shape[0]
    if n % node_blk or node_blk != pick_node_blk(n):
        raise ValueError(
            f"first/jcount tables (len {first.shape[0]}) don't match "
            f"n={n}: expected n/pick_node_blk(n)={n // pick_node_blk(n)} "
            f"entries — rebuild them with the same block rule")
    if s % CT_BLK:
        pad = CT_BLK - s % CT_BLK
        ct_sorted = jnp.pad(ct_sorted, ((0, pad), (0, 0)))
        ids_sorted = jnp.pad(ids_sorted, (0, pad), constant_values=n)
        s += pad
    n_ct_blocks = s // CT_BLK
    grid = (n // node_blk, max(max_j, 1))

    def ct_index(b, j, first_ref, jcount_ref):
        return (jnp.minimum(first_ref[b] + j, n_ct_blocks - 1), 0)

    def ids_index(b, j, first_ref, jcount_ref):
        return (0, jnp.minimum(first_ref[b] + j, n_ct_blocks - 1))

    kern = functools.partial(_reduce_kernel, node_blk=node_blk)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, CT_BLK), ids_index),
                pl.BlockSpec((CT_BLK, f), ct_index),
            ],
            out_specs=pl.BlockSpec((node_blk, f),
                                   lambda b, j, fr, jr: (b, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(first, jcount, ids_sorted.reshape(1, -1), ct_sorted)
