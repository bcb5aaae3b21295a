"""Batched dense-grid model: [B, H, W] tile stacks through the flagship
shifted-window path.

Per-tile ops (extractor, GridGATConv, heads) vmap over the batch; BatchNorm
runs OUTSIDE the vmap on all B*H*W cells so statistics cover the whole
batch — matching the reference's PyG-Batch semantics (SURVEY Q4) and the
COO trainer exactly. Parameter layout equals GridBathymetricGNN, so grid
checkpoints interchange freely between single-tile inference, batched
training, and the halo-sharded multi-chip path.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .grid_gat import GridGATConv
from .layers import (ClassificationHead, ConfidenceHead, CorrectionHead,
                     MaskedBatchNorm, MLPFeatureExtractor)


class BatchedGridGNN(nn.Module):
    """GridBathymetricGNN over a leading batch dimension."""

    hidden_channels: int = 64
    num_layers: int = 4
    heads: int = 4
    num_classes: int = 3
    dropout: float = 0.1
    predict_correction: bool = True
    feature_extractor_layers: int = 2
    edge_dim: Optional[int] = 3
    connectivity: int = 8
    compute_dtype: str = "float32"
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        features: jax.Array,    # [B, H, W, F]
        valid: jax.Array,       # [B, H, W]
        nbr_mask: jax.Array,    # [B, K, H, W]
        edge_attr: jax.Array,   # [B, K, H, W, 3]
        deterministic: bool = True,
        use_running_average: Optional[bool] = None,
    ) -> Dict[str, jax.Array]:
        if use_running_average is None:
            use_running_average = deterministic
        b, hgt, wid, _ = features.shape
        flat_valid = valid.reshape(-1)

        x = MLPFeatureExtractor(
            self.hidden_channels, self.feature_extractor_layers, self.dropout
        )(features, deterministic)

        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            conv = GridGATConv(
                out_channels=self.hidden_channels,
                heads=self.heads if not last else 1,
                concat=not last,
                dropout=self.dropout,
                edge_dim=self.edge_dim,
                connectivity=self.connectivity,
                compute_dtype=self.compute_dtype,
                use_pallas=self.use_pallas,
            )
            # vmap the conv over the batch; params broadcast, dropout rng
            # split per sample
            x = nn.vmap(
                lambda mdl, *a: mdl(*a, deterministic),
                in_axes=(0, 0, 0, 0), out_axes=0,
                variable_axes={"params": None},
                split_rngs=({"params": False, "dropout": True}
                            if not deterministic else {"params": False}),
            )(conv, x, valid, nbr_mask, edge_attr)
            width = self.hidden_channels * (self.heads if not last else 1)
            # relu + feature dropout fold into the norm's fused pass
            # (saves a [B*N, F] read+write round trip on the bf16 path)
            do_drop = (not last and self.dropout > 0 and not deterministic)
            xf = MaskedBatchNorm(width)(
                x.reshape(-1, width), flat_valid, use_running_average,
                fuse_relu=not last,
                drop_rate=self.dropout if do_drop else 0.0,
                drop_rng=self.make_rng("dropout") if do_drop else None,
            )
            x = xf.reshape(b, hgt, wid, width)

        logits = ClassificationHead(self.hidden_channels, self.num_classes,
                                    self.dropout)(x, deterministic)
        out = {
            "class_logits": logits,
            "class_probs": nn.softmax(logits, -1),
            "predicted_class": jnp.argmax(logits, -1),
            "confidence": ConfidenceHead(self.hidden_channels, self.dropout)(
                x, deterministic),
        }
        if self.predict_correction:
            out["correction"] = CorrectionHead(self.hidden_channels,
                                               self.dropout)(x, deterministic)
        return out
