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


def pad_folds_to_multiple(folds: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """Pad the fold axis up to a multiple of the mesh size (extra folds are
    generated then dropped)."""
    B = folds.shape[0]
    rem = (-B) % n
    if rem:
        folds = np.concatenate([folds, np.repeat(folds[-1:], rem, axis=0)], axis=0)
    return folds, B


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
) -> jax.Array:
    """Run fold generation with the fold axis sharded over ``axis``."""
    if generate_fn is None:
        from ..models.wavernn import generate_scan

        generate_fn = generate_scan
        if jax.default_backend() not in ("cpu",):
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
    """Full batched-fold generation with folds sharded over the mesh;
    mirrors ``wavernn.generate`` but multi-device."""
    from ..models import wavernn as W

    hop = model_cfg.total_upsample
    if gen_cfg.target % hop or gen_cfg.overlap % hop:
        raise ValueError("target and overlap must be multiples of the hop size")
    T_mel = mel.shape[0]
    wave_len = T_mel * hop

    t_frames = gen_cfg.target // hop
    ov_frames = gen_cfg.overlap // hop
    folds, n_folds = W.fold_with_overlap(mel, t_frames, ov_frames)
    folds = np.stack([W.pad_mel_for_generation(f, model_cfg.pad) for f in folds])
    folds, _ = pad_folds_to_multiple(folds, mesh.devices.size)

    wav_folds = np.asarray(
        generate_folds_sharded(
            params, model_cfg, mesh, jnp.asarray(folds), rng, bits, apply_mu_law, axis
        )
    )[:n_folds]
    wav = W.xfade_and_unfold(wav_folds, gen_cfg.overlap)[:wave_len]
    wav = np.array(wav, np.float32, copy=True)
    fade_len = 20 * hop
    if wave_len > fade_len:
        wav[-fade_len:] *= np.linspace(1.0, 0.0, fade_len, dtype=np.float32)
    return wav
