"""Jittable Griffin-Lim phase reconstruction (``lax.fori_loop``).

The reference runs 60 numpy iterations on the host CPU per eval sample
(audio.py:176-189) — its second hot loop; here the whole loop compiles to a
single on-device program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import AudioConfig
from .spectrogram import MelPipeline, istft, stft


@partial(jax.jit, static_argnames=("n_fft", "hop_size", "win_size", "iters"))
def griffin_lim(
    S: jax.Array,
    key: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    iters: int = 60,
) -> jax.Array:
    """Magnitude spectrogram [frames, bins] -> waveform.

    Random phase init + iterative phase refinement, mirroring the librosa
    recipe the reference uses (audio.py:176-182).
    """
    S = jnp.abs(S)
    phase = jax.random.uniform(key, S.shape, minval=0.0, maxval=2.0 * jnp.pi)
    angles = jnp.exp(1j * phase).astype(jnp.complex64)
    y = istft(S.astype(jnp.complex64) * angles, n_fft, hop_size, win_size)

    def body(_, y):
        D = stft(y, n_fft, hop_size, win_size)
        ang = D / jnp.maximum(jnp.abs(D), 1e-8)
        return istft(S.astype(jnp.complex64) * ang.astype(jnp.complex64),
                     n_fft, hop_size, win_size)

    return jax.lax.fori_loop(0, iters, body, y)


def inv_preemphasis_scan(wav: jax.Array, k: float) -> jax.Array:
    """IIR y[t] = x[t] + k*y[t-1] as a ``lax.scan`` (reference audio.py:55)."""

    def step(carry, x):
        y = x + k * carry
        return y, y

    _, out = jax.lax.scan(step, jnp.float32(0.0), wav)
    return out


def preemphasis_fir(wav: jax.Array, k: float) -> jax.Array:
    """FIR y[t] = x[t] - k*x[t-1] (reference audio.py:50)."""
    return wav - k * jnp.pad(wav, (1, 0))[:-1]


def inv_mel_spectrogram(
    mel_norm: jax.Array, pipeline: MelPipeline, key: jax.Array | None = None
) -> jax.Array:
    """Normalized mel -> waveform via Griffin-Lim (reference audio.py:123-137)."""
    c: AudioConfig = pipeline.cfg
    if key is None:
        key = jax.random.PRNGKey(0)
    mag = pipeline.mel_to_linear_mag(mel_norm)
    y = griffin_lim(
        mag**c.power, key, c.n_fft, c.hop_size, c.win_size, c.griffin_lim_iters
    )
    if c.preemphasize:
        y = inv_preemphasis_scan(y, c.preemphasis)
    return y


def inv_linear_spectrogram(
    lin_norm: jax.Array, pipeline: MelPipeline, key: jax.Array | None = None
) -> jax.Array:
    c: AudioConfig = pipeline.cfg
    if key is None:
        key = jax.random.PRNGKey(0)
    mag = pipeline.linear_to_mag(lin_norm)
    y = griffin_lim(
        mag**c.power, key, c.n_fft, c.hop_size, c.win_size, c.griffin_lim_iters
    )
    if c.preemphasize:
        y = inv_preemphasis_scan(y, c.preemphasis)
    return y
