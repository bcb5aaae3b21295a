"""Shared neural building blocks (flax.linen).

Re-designs the reference's torch modules (reference: models/gnn.py:34-71,
191-260) with a TPU-critical change: BatchNorm moments are computed over
*live* nodes only, so bucket padding never pollutes statistics
(SURVEY §2.5 Q4).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _bn_lowp(x, mask_f, scale, bias, keep, eps, relu, keep_prob):
    """Low-precision masked BatchNorm (+ optional fused ReLU and feature
    dropout) with a hand-written backward.

    Autodiff of the straightforward formulation accumulates three
    cotangent contributions into x (normalize, s1, s2) as separate
    [N, F] add passes — profiled at ~1.1 ms/step across 4 layers on the
    256² train step (round 4). The textbook BN backward is a single
    elementwise pass plus one fused two-output reduce; this custom VJP
    emits exactly that. Forward stats are one-pass (E[x²]−mean², f32
    accumulation from bf16 reads — cuDNN-style), the normalize computes
    (x−mean) in f32 *inside* the fusion (no materialized f32 copy, and no
    bf16 cancellation between x·g and the folded bias when |mean|≫σ).

    ``relu``/``keep_prob`` fold the layer's activation + feature dropout
    into the same pass: the standalone dropout multiply-select was a full
    [N, F] read+write round trip per layer (~0.08 ms each). ``keep`` is
    the pre-drawn bernoulli keep mask (bool [N, F]; any [1, 1] dummy when
    keep_prob == 1): a bool residual streams 4 bytes/elem less than
    regenerating bits in the backward — key-replay was measured SLOWER
    (rng-bit-generator cannot fuse, so replayed bits materialize as u32).

    Returns (y, mean, var): y in x.dtype, moments f32 for the running-
    stats update. Gradient flows through the batch moments exactly as in
    torch BatchNorm1d training mode (parity: tests/test_model.py).
    """
    y, mean, var, _, _ = _bn_lowp_impl(x, mask_f, scale, bias, keep,
                                       eps, relu, keep_prob)
    return y, mean, var


def _bn_lowp_impl(x, mask_f, scale, bias, keep, eps, relu, keep_prob):
    m = mask_f[:, None] > 0
    n = jnp.maximum(jnp.sum(mask_f), 1.0)
    xz = jnp.where(m, x, jnp.zeros((), x.dtype))
    s1 = jnp.sum(xz, axis=0, dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(xz.astype(jnp.float32)), axis=0)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    r = jax.lax.rsqrt(var + eps)
    y32 = (x.astype(jnp.float32) - mean) * (r * scale) + bias
    if relu:
        y32 = jnp.maximum(y32, 0.0)
    if keep_prob < 1.0:
        y32 = jnp.where(keep, y32 / keep_prob, 0.0)
    y = jnp.where(m, y32, 0.0).astype(x.dtype)
    return y, mean, var, r, n


def _bn_lowp_fwd(x, mask_f, scale, bias, keep, eps, relu, keep_prob):
    y, mean, var, r, n = _bn_lowp_impl(x, mask_f, scale, bias, keep,
                                       eps, relu, keep_prob)
    return (y, mean, var), (x, mask_f, scale, bias, mean, r, n, keep)


def _bn_lowp_bwd(eps, relu, keep_prob, res, cts):
    dy, _, _ = cts                      # moments feed the (undifferentiated)
    (x, mask_f, scale, bias, mean, r, n,
     keep) = res                        # running-stats update only
    # the barrier stops XLA CSE-ing this convert with the forward's — CSE
    # here makes XLA *materialize* the f32 upcast of x in the forward as a
    # saved residual (67 MB HBM write/read on the 256² step, profiled
    # 0.2 ms/layer); recomputing the convert inside the backward fusions
    # is free
    x = jax.lax.optimization_barrier(x)
    m = mask_f[:, None] > 0
    dy32 = jnp.where(m, dy, 0).astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * r
    xhat = jnp.where(m, xhat, 0.0)
    if keep_prob < 1.0:
        dy32 = jnp.where(keep, dy32 / keep_prob, 0.0)
    if relu:
        # recompute the ReLU gate with the forward's exact factoring
        # ((x32 - mean) * (r*scale) + bias) — the algebraically equal
        # xhat*scale + bias rounds differently and can flip the gate for
        # pre-activations exactly at the f32 rounding boundary
        gate = (x.astype(jnp.float32) - mean) * (r * scale) + bias
        dy32 = jnp.where(gate > 0, dy32, 0.0)
    db = jnp.sum(dy32, axis=0)               # [F]
    ds = jnp.sum(dy32 * xhat, axis=0)        # [F]
    # dxhat = dy*scale; dx = (r/n)*(n*dxhat - sum(dxhat) - xhat*sum(dxhat·xhat))
    #       = r*scale*(dy - (db + xhat*ds)/n)   (scale is per-feature const)
    dx32 = (r * scale) * (dy32 - (db + xhat * ds) / n)
    dx = jnp.where(m, dx32, 0.0).astype(x.dtype)
    import numpy as np
    dkeep = np.zeros(keep.shape, dtype=jax.dtypes.float0)
    return dx, jnp.zeros_like(mask_f), ds, db, dkeep


_bn_lowp.defvjp(_bn_lowp_fwd, _bn_lowp_bwd)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over nodes with padding-masked statistics.

    Matches torch BatchNorm1d semantics (eps 1e-5, momentum 0.1, affine,
    running stats; biased variance for normalization, unbiased for the
    running update) as used via PyG BatchNorm
    (reference: models/gnn.py:151-154,181).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None  # psum moments across this mesh axis

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [N, F]
        mask: jax.Array,  # [N] bool
        use_running_average: bool = False,
        return_affine: bool = False,
        fuse_relu: bool = False,
        drop_rate: float = 0.0,
        drop_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        # ``fuse_relu``/``drop_rate`` apply the layer's activation and
        # feature dropout inside the normalize pass (identical math to a
        # separate relu + dropout; on the bf16 fast path this saves a full
        # [N, F] read+write round trip per layer). Dropout is active only
        # when drop_rng is provided.
        do_drop = drop_rate > 0.0 and drop_rng is not None
        keep_prob = 1.0 - drop_rate if do_drop else 1.0
        # bf16 producers (Pallas kernel I/O) hand activations over in bf16;
        # batch moments over tens of thousands of nodes must accumulate in
        # f32 or the running statistics drift. ``lowp`` keeps the ACTIVATION
        # in bf16 (stats accumulate f32 inside fused convert+reduce ops;
        # the normalize reads bf16 and writes bf16) — upcasting first
        # materializes an f32 copy of a [65536, 256] tensor that round-4
        # profiling measured at ~2.1 ms/step across the 4 layers' fwd+bwd,
        # 28% of the whole train step.
        lowp = x.dtype != jnp.float32
        if not lowp:
            x = x.astype(jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features)
        )

        if return_affine:
            # fold the running-stats normalization into (scale2, bias2) so
            # a producer kernel can fuse y = x*scale2 + bias2 (inference)
            scale2 = scale * jax.lax.rsqrt(ra_var.value + self.eps)
            bias2 = bias - ra_mean.value * scale2
            return scale2, bias2

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if lowp and self.axis_name is None:
                # custom-VJP fast path (module docstring of _bn_lowp): one
                # fused normalize pass fwd, textbook single-pass backward.
                # The sharded (axis_name) path keeps the autodiff
                # formulation — its psum transposes are collective-correct
                # by construction and halo training runs f32 today.
                keep = (jax.random.bernoulli(drop_rng, keep_prob, x.shape)
                        if do_drop else jnp.ones((1, 1), bool))
                y, mean, var = _bn_lowp(x, mask.astype(jnp.float32),
                                        scale, bias, keep, self.eps,
                                        fuse_relu, keep_prob)
                n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
                if not self.is_initializing():
                    unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                    ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                     + self.momentum * mean)
                    ra_var.value = ((1 - self.momentum) * ra_var.value
                                    + self.momentum * unbiased)
                return y
            if lowp:  # sharded bf16: moments must accumulate in f32
                x = x.astype(jnp.float32)
                lowp = False
            m = mask.astype(x.dtype)[:, None]
            n = jnp.sum(m)
            s1 = jnp.sum(x * m, axis=0)
            if self.axis_name is not None:
                # global moments across spatial shards (halo partition)
                n = jax.lax.psum(n, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = s1 / n
            s2 = jnp.sum(((x - mean) ** 2) * m, axis=0)
            if self.axis_name is not None:
                s2 = jax.lax.psum(s2, self.axis_name)
            var = s2 / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        def _act(y32):  # shared fused-activation epilogue (any path)
            if fuse_relu:
                y32 = jnp.maximum(y32, 0.0)
            if do_drop:
                keep = jax.random.bernoulli(drop_rng, keep_prob, y32.shape)
                y32 = jnp.where(keep, y32 / keep_prob, 0.0)
            return y32

        if lowp:
            # affine-folded normalize: one fused elementwise pass that
            # reads bf16 and writes bf16 (next layer consumes bf16 anyway)
            g2 = jax.lax.rsqrt(var + self.eps) * scale
            b2 = bias - mean * g2
            y = _act(x.astype(jnp.float32) * g2 + b2)
            return jnp.where(mask[:, None], y, 0.0).astype(x.dtype)
        y = _act((x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias)
        return jnp.where(mask[:, None], y, 0.0)


class TorchLinear(nn.Module):
    """Dense layer with torch's default init (kaiming-uniform fan_in).

    Keeps init distributions comparable to the reference's nn.Linear so
    training dynamics start from the same regime.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        bound = 1.0 / jnp.sqrt(in_f)

        def kaiming_uniform(key, shape, dtype=jnp.float32):
            # torch: U(-sqrt(6/fan_in)/sqrt(3)... simplified to U(-b, b),
            # b = sqrt(6 / fan_in) / sqrt(2)  -> torch uses gain for
            # leaky_relu(sqrt(5)): bound = sqrt(6/((1+5)*fan_in)) = 1/sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", kaiming_uniform, (in_f, self.features))
        y = x @ kernel
        if self.use_bias:
            b = self.param("bias", kaiming_uniform, (self.features,))
            y = y + b
        return y


class MLPFeatureExtractor(nn.Module):
    """Per-node pre-GNN MLP matching the reference LocalFeatureExtractor
    exactly (models/gnn.py:34-71): Linear-ReLU-Dropout x (num_layers-1),
    then a final Linear with NO activation."""

    hidden_channels: int
    num_layers: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        for _ in range(max(self.num_layers - 1, 0)):
            x = TorchLinear(self.hidden_channels)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return TorchLinear(self.hidden_channels)(x)


class ClassificationHead(nn.Module):
    """hidden -> hidden//2 -> num_classes logits
    (reference: models/gnn.py:191-213)."""

    hidden_channels: int
    num_classes: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = TorchLinear(self.hidden_channels // 2)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return TorchLinear(self.num_classes)(x)


class ConfidenceHead(nn.Module):
    """hidden -> hidden//2 -> 1 sigmoid (reference: models/gnn.py:215-237)."""

    hidden_channels: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = TorchLinear(self.hidden_channels // 2)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.sigmoid(TorchLinear(1)(x))[..., 0]


class CorrectionHead(nn.Module):
    """hidden -> hidden//2 -> 1 linear (reference: models/gnn.py:239-260)."""

    hidden_channels: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = TorchLinear(self.hidden_channels // 2)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return TorchLinear(1)(x)[..., 0]
