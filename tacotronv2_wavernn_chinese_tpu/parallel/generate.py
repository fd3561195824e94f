"""Sequence-parallel vocoder generation: folds sharded across the mesh.

The reference's ``fold_with_overlap`` (fatchord_version.py:293-340) turns one
utterance's time axis into a batch of overlapping segments; here that fold
axis is sharded over the device mesh with ``shard_map`` so N chips generate
N fold-groups concurrently — time-axis (sequence) parallelism for the
autoregressive vocoder (SURVEY §2.9).  Each device runs the fused sample
loop (Pallas kernel on TPU, scan elsewhere) on its local folds; the
overlap-crossfade stitch runs on host after a gather.

No boundary state is exchanged for *generation*: folds are overlapped by
construction (2*overlap conditioning frames), which is exactly how the
reference keeps folds independent; the crossfade masks the warmup region.
The crossfade-unfold itself runs ON DEVICE (``xfade_and_unfold_sharded``):
each shard overlap-adds its local folds and the single boundary tail rides
ICI to the next shard via ``ppermute``, so only the stitched waveform ever
crosses to host.
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
        from ..models.wavernn import select_generate_fn

        generate_fn = select_generate_fn(model_cfg, folds.shape[-1], use_pallas)

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


def xfade_and_unfold_sharded(
    wav_folds: jax.Array,  # [B, target + 2*overlap] (B divisible by mesh size)
    overlap: int,
    n_folds: int,
    mesh: Mesh,
    axis: str = "data",
) -> np.ndarray:
    """On-device equal-power crossfade of mesh-sharded folds.

    Same math as ``models.wavernn.xfade_and_unfold`` (reference
    fatchord_version.py:342-405) but the overlap-add stays sharded: every
    shard fades + overlap-adds its local folds into a contiguous chunk, and
    the one boundary tail (the last local fold's faded ``overlap`` samples)
    is sent to the next shard over ICI with ``lax.ppermute``.  Folds past
    ``n_folds`` (bucketing pads) are zeroed on device so pads never bleed
    into the audible tail.  Returns the stitched waveform
    ``[B*(target+overlap) + overlap]`` on host.
    """
    B, L = wav_folds.shape
    target = L - 2 * overlap
    stride = target + overlap
    n_dev = mesh.shape[axis]
    if B % n_dev:
        raise ValueError(f"fold count {B} not divisible by mesh size {n_dev}")

    silence_len = overlap // 2
    fade_len = overlap - silence_len
    t = np.linspace(-1.0, 1.0, fade_len, dtype=np.float32)
    fin = jnp.asarray(np.concatenate([np.zeros(silence_len, np.float32), np.sqrt(0.5 * (1.0 + t))]))
    fout = jnp.asarray(np.concatenate([np.ones(silence_len, np.float32), np.sqrt(0.5 * (1.0 - t))]))

    def local(yl, nf):  # yl [B/n_dev, L], nf scalar
        Bl = yl.shape[0]
        gi = jax.lax.axis_index(axis) * Bl + jnp.arange(Bl)
        yl = yl * (gi < nf)[:, None]  # silence bucketing pads
        if overlap:
            yl = yl.at[:, :overlap].mul(fin).at[:, L - overlap :].mul(fout)
        bodies = yl[:, :stride]
        tails = yl[:, stride:]  # [Bl, overlap]
        if overlap:
            # fold i's tail overlaps fold i+1's head; across the shard
            # boundary the last local tail rides ICI (shard 0 receives zeros)
            prev = jax.lax.ppermute(
                tails[-1], axis, [(i, i + 1) for i in range(n_dev - 1)]
            )
            prev_tails = jnp.concatenate([prev[None], tails[:-1]], axis=0)
            bodies = bodies.at[:, :overlap].add(prev_tails)
        return bodies.reshape(-1), tails[-1]

    chunks, tails = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis)),
    )(wav_folds, jnp.int32(n_folds))
    # the global final tail: when bucketing padded past n_folds the real
    # tail was ppermuted into the first pad fold's chunk (inside `chunks`)
    # and this appended region is zeros; without pads it is the last fold's
    # faded tail.  Either way concatenation yields [B*stride + overlap].
    last_tail = np.asarray(tails).reshape(n_dev, overlap)[-1] if overlap else np.zeros(0, np.float32)
    return np.concatenate([np.asarray(chunks), last_tail]).astype(np.float32)


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
    device_crossfade: bool = True,
) -> np.ndarray:
    """Full batched-fold generation with folds sharded over the mesh.

    With ``device_crossfade`` (default) the overlap-add stitch also runs
    sharded on device (``xfade_and_unfold_sharded``), so the boundary tails
    ride ICI and only the final waveform crosses to host.  Otherwise it
    reuses ``wavernn.generate`` for the fold/bucket/host-crossfade pipeline
    and injects a mesh-sharded ``generate_fn``."""
    import dataclasses

    from ..models import wavernn as W

    if device_crossfade:
        hop = model_cfg.total_upsample
        if gen_cfg.target % hop or gen_cfg.overlap % hop:
            raise ValueError("target and overlap must be multiples of the hop size")
        wave_len = mel.shape[0] * hop
        folds, n_folds = W.fold_with_overlap(
            np.asarray(mel, np.float32), gen_cfg.target // hop, gen_cfg.overlap // hop
        )
        folds = np.stack([W.pad_mel_for_generation(f, model_cfg.pad) for f in folds])
        # one bucketing serves both constraints: compiled-shape reuse (8) and
        # an even split over the mesh
        import math

        folds = W.bucket_folds(folds, multiple=math.lcm(8, mesh.shape[axis]))
        # zero pad-fold conditioning is unnecessary: xfade_and_unfold_sharded
        # silences outputs past n_folds on device
        wav_folds = generate_folds_sharded(
            params, model_cfg, mesh, jnp.asarray(folds), rng, bits,
            apply_mu_law, axis, use_pallas=gen_cfg.use_pallas,
        )
        wav = xfade_and_unfold_sharded(
            wav_folds, gen_cfg.overlap, n_folds, mesh, axis
        )[:wave_len]
        # 20-hop linear fade-out tail (reference fatchord_version.py:255-258)
        wav = np.array(wav, np.float32, copy=True)
        fade_len = 20 * hop
        if wave_len > fade_len:
            wav[-fade_len:] *= np.linspace(1.0, 0.0, fade_len, dtype=np.float32)
        return wav

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
