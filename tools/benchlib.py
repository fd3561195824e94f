"""Shared timing helpers for the TPU bench/experiment tools.

``sync`` forces a real device round-trip via a 4-byte scalar transfer —
``jax.block_until_ready`` does NOT block through the axon relay.  ``timed``
returns min-of-reps wall time; pair two repetition counts and difference
them for marginal rates (every single dispatch carries a ~31 ms tunnel
constant — see CLAUDE.md).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> float:
    return float(np.asarray(jnp.sum(x)))


def timed(f, key, reps: int = 3) -> float:
    sync(f(key))
    ts = []
    for i in range(reps):
        t0 = time.time()
        sync(f(jax.random.fold_in(key, i + 1)))
        ts.append(time.time() - t0)
    return min(ts)
