"""GSPMD mesh + sharding helpers (DP-dominant layout).

Both models fit on one chip (SURVEY §2.9), so the strategy is pure data
parallelism: one mesh axis ``data``; batches shard along it, parameters
replicate, and XLA inserts the psum for gradients.  The same axis doubles as
the fold axis for sequence-parallel batched WaveRNN generation.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the mesh spans all processes' devices; gradient psum rides ICI within a
slice and DCN across hosts — no NCCL-style plumbing (the reference's latent
equivalent: wavernn/utils/__init__.py:19-36).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch / folds) across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Device-put every array leaf with dim-0 sharded over the mesh."""
    sh = batch_sharding(mesh, axis)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sh)
        return x

    return jax.tree_util.tree_map(put, tree)


def shard_stacked_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Device-put [K, B, ...] step-stacked batches (train_step_many): the
    step dim replicates, the batch dim (1) shards over the mesh."""
    sh = NamedSharding(mesh, P(None, axis))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 2:
            return jax.device_put(x, sh)
        return x

    return jax.tree_util.tree_map(put, tree)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
