"""Sequence-parallel vocoder generation: folds sharded across the mesh.

The reference's ``fold_with_overlap`` (fatchord_version.py:293-340) turns one
utterance's time axis into a batch of overlapping segments; here that fold
axis is sharded over the device mesh with ``shard_map`` so N chips generate
N fold-groups concurrently — time-axis (sequence) parallelism for the
autoregressive vocoder (SURVEY §2.9).  Each device runs the fused sample
loop (Pallas kernel on TPU, scan elsewhere) on its local folds; the
overlap-crossfade stitch runs on host after a gather.

No boundary state is exchanged: folds are *overlapped* by construction
(2*overlap conditioning frames), which is exactly how the reference keeps
folds independent; the crossfade masks the warmup region.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..config import WaveRNNGenConfig, WaveRNNModelConfig
from ..utils import is_tpu_backend


def pad_folds_to_multiple(folds: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """Pad the fold axis up to a multiple of the mesh size (extra folds are
    generated then dropped)."""
    from ..models.wavernn import bucket_folds

    return bucket_folds(folds, n), folds.shape[0]


def generate_folds_sharded(
    params: Any,
    model_cfg: WaveRNNModelConfig,
    mesh: Mesh,
    folds: jax.Array,  # [B, T_mel_fold, M] (B divisible by mesh size)
    rng: jax.Array,
    bits: int = 10,
    apply_mu_law: bool = True,
    axis: str = "data",
    generate_fn: Callable | None = None,
    use_pallas: bool = True,
) -> jax.Array:
    """Run fold generation with the fold axis sharded over ``axis``."""
    if generate_fn is None:
        from ..models.wavernn import generate_scan

        generate_fn = generate_scan
        if use_pallas and is_tpu_backend():
            from ..ops import wavernn_kernel as K

            if K.supported(model_cfg, folds.shape[-1]):
                generate_fn = K.generate_pallas

    def local(f, k):
        # decorrelate sampling noise across shards
        k = jax.random.fold_in(k, jax.lax.axis_index(axis))
        return generate_fn(params, model_cfg, f, k, bits, apply_mu_law)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
    )
    sharded = jax.device_put(folds, NamedSharding(mesh, P(axis)))
    return fn(sharded, rng)


def generate_distributed(
    params: Any,
    model_cfg: WaveRNNModelConfig,
    gen_cfg: WaveRNNGenConfig,
    mesh: Mesh,
    mel: np.ndarray,  # [T_mel, M] unit mel, ONE utterance
    rng: jax.Array,
    bits: int = 10,
    apply_mu_law: bool = True,
    axis: str = "data",
) -> np.ndarray:
    """Full batched-fold generation with folds sharded over the mesh.

    Reuses ``wavernn.generate`` for the fold/bucket/crossfade pipeline and
    injects a mesh-sharded ``generate_fn`` that pads the fold batch to the
    mesh size and drops the extras."""
    import dataclasses

    from ..models import wavernn as W

    def sharded_fn(p, cfg_, folds, key, bits_, mu_law):
        padded, n_orig = pad_folds_to_multiple(np.asarray(folds), mesh.devices.size)
        out = generate_folds_sharded(
            p, cfg_, mesh, jnp.asarray(padded), key, bits_, mu_law, axis,
            use_pallas=gen_cfg.use_pallas,
        )
        return out[:n_orig]

    gen_cfg = dataclasses.replace(gen_cfg, batched=True)
    return W.generate(
        params, model_cfg, gen_cfg, mel, rng, bits=bits,
        apply_mu_law=apply_mu_law, generate_fn=sharded_fn,
    )
