"""Tensor-parallel (DP x TP) sharding for WaveRNN training via GSPMD.

The models are small enough that pure DP is the primary axis (SURVEY §2.9),
but the mesh keeps a ``model`` axis available: WaveRNN's widest matmuls —
fc3's [fc_dims, 2**bits] class projection and the GRU gate kernels
[*, 3*rnn_dims] — shard column-wise over ``model`` and GSPMD inserts the
collectives (all-gather on the activations' contracting uses, psum-scatter
on the grads), while everything else stays replicated.  This is annotation-
driven SPMD: the train_step code is untouched; only the placement of the
state/batch changes.

Column-sharding is chosen because every sharded weight's OUTPUT axis is
the sharded one, so the fc-layer forward matmuls are shard-local.  NOTE on
the GRU kernels: the [*, 3H] gate axis shards into tp contiguous pieces,
whose boundaries align with the (r, z, n) gate splits only when tp is a
multiple of 3 — at other tp (e.g. the power-of-2 meshes v5e slices use)
GSPMD inserts reshard collectives around the per-gate splits inside the
scan.  Results are identical either way (GSPMD is semantics-preserving;
tests assert loss parity); treat non-multiple-of-3 tp as a capability/
memory-sharding demonstration rather than a locality optimization.

Usage (see __graft_entry__.dryrun_multichip and tests):
    mesh = make_mesh_2d(devices, dp, tp)
    state = place_wavernn_state(mesh, state)
    batch = shard_batch(mesh, batch)           # 'data' axis, unchanged
    state, metrics = wavernn_task.train_step(state, batch, cfg)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-tree keys whose ndim>=2 leaves shard their LAST axis over 'model'
TP_MODULES = ("gru1", "gru2", "fc1", "fc2", "fc3", "I")


def make_mesh_2d(devices=None, dp: int | None = None, tp: int = 2) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    assert dp * tp == len(devices), (dp, tp, len(devices))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


def tp_divisible(cfg, tp: int) -> bool:
    """All column-sharded output axes must divide evenly by tp (shape
    requirement only; see the module note — gate-boundary ALIGNMENT
    additionally needs tp % 3 == 0)."""
    wc = cfg.wavernn
    n_classes = 2 ** cfg.audio.bits if wc.mode == "RAW" else 30
    return (
        wc.rnn_dims % tp == 0
        and wc.fc_dims % tp == 0
        and n_classes % tp == 0
    )


def _leaf_spec(path_keys, leaf) -> P:
    named = [getattr(k, "key", getattr(k, "name", None)) for k in path_keys]
    if any(k in TP_MODULES for k in named) and getattr(leaf, "ndim", 0) >= 2:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def wavernn_state_shardings(mesh: Mesh, state) -> Any:
    """NamedSharding tree for a WaveRNNTrainState: params AND the matching
    optimizer moments shard identically; step/counters replicate.

    Raises a clear ValueError when a column-sharded leaf's output axis does
    not divide by the ``model`` axis size (otherwise the failure surfaces as
    an opaque GSPMD/device_put error — see tp_divisible for the config-level
    check)."""
    tp = mesh.shape["model"]

    def spec_checked(path, leaf):
        spec = _leaf_spec(path, leaf)
        if "model" in spec and leaf.shape[-1] % tp != 0:
            name = "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)
            raise ValueError(
                f"TP axis size {tp} does not divide the sharded output axis "
                f"{leaf.shape[-1]} of {name}; pick tp with tp_divisible(cfg, tp)"
            )
        return NamedSharding(mesh, spec)

    # opt_state mirrors the param tree inside optax's ScaleByAdamState etc.;
    # tree_map_with_path over the WHOLE state works because the param-tree
    # key names (gru1/fc3/...) appear on the moment paths too
    return jax.tree_util.tree_map_with_path(spec_checked, state)


def place_wavernn_state(mesh: Mesh, state):
    """device_put the train state with TP shardings over ``mesh``."""
    return jax.device_put(state, wavernn_state_shardings(mesh, state))
