"""TPU-native bathymetric GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
grant-froelich/Bathymetric-GNN: denoising hydrographic survey grids with a
multi-task graph neural network, built TPU-first (static shapes, device
featurization, shifted-window dense message passing for grid graphs, padded
sparse kernels for arbitrary graphs, pjit/shard_map multi-chip scaling).
"""

__version__ = "0.1.0"
