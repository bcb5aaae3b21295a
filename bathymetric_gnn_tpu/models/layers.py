"""Shared neural building blocks (flax.linen).

Re-designs the reference's torch modules (reference: models/gnn.py:34-71,
191-260) with a TPU-critical change: BatchNorm moments are computed over
*live* nodes only, so bucket padding never pollutes statistics
(SURVEY §2.5 Q4).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


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
    ) -> jax.Array:
        # bf16 producers (Pallas kernel I/O) hand activations over in bf16;
        # batch moments over tens of thousands of nodes must accumulate in
        # f32 or the running statistics drift
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
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
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
