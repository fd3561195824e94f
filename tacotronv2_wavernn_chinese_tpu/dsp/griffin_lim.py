"""Jittable Griffin-Lim phase reconstruction (``lax.fori_loop``).

The reference runs 60 numpy iterations on the host CPU per eval sample
(audio.py:176-189) — its second hot loop; here the whole loop compiles to a
single on-device program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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


@partial(jax.jit, static_argnames=("n_fft", "hop_size", "win_size", "iters"))
def griffin_lim_matmul(
    S: jax.Array,
    key: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    iters: int = 60,
) -> jax.Array:
    """Griffin-Lim with the (i)DFT expressed as MXU matmuls.

    XLA's TPU FFT lowering ran the 60-iteration loop in ~0.92 s on v5e;
    as real [frames, n_fft] x [n_fft, bins] contractions the same loop is
    ~260 GFLOP of pure matmul — the systolic array is where TPU FLOPs
    live, so the transform IS a matmul here.  Overlap-add and framing are
    block-structured (frames padded to ``segs`` hop-size blocks, one
    static pad+add / slice per block offset) instead of scatter/gather:
    a [F, n_fft] ``at[idx].add`` serializes ~0.5M scatter element-ops per
    iteration on TPU and dominated the first cut of this kernel.  Same
    math as ``griffin_lim`` (windowing, overlap-add, squared-window
    normalization) within matmul-pass rounding; the FFT path remains the
    CPU/parity implementation."""
    from .spectrogram import padded_window

    S = jnp.abs(S)
    K = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(K)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    fwd_cos = jnp.asarray(np.cos(ang), jnp.float32)          # [n_fft, K]
    fwd_sin = jnp.asarray(-np.sin(ang), jnp.float32)
    w_k = np.where((k == 0) | (k == n_fft // 2), 1.0, 2.0) / n_fft
    inv_cos = jnp.asarray((np.cos(ang) * w_k).T, jnp.float32)  # [K, n_fft]
    inv_sin = jnp.asarray((-np.sin(ang) * w_k).T, jnp.float32)
    win = jnp.asarray(padded_window(win_size, n_fft))

    h = hop_size
    F = S.shape[0]
    segs = -(-n_fft // h)          # hop-size blocks per frame
    L_pad = segs * h
    nb = F + segs - 1              # hop-size blocks in the padded signal
    total = n_fft + h * (F - 1)
    total_pad = nb * h

    def ola(frames):  # [F, n_fft] -> [total_pad] overlap-add, dense
        fp = jnp.pad(frames, ((0, 0), (0, L_pad - n_fft))).reshape(F, segs, h)
        y = jnp.zeros((nb, h), frames.dtype)
        for s in range(segs):
            y = y + jnp.pad(fp[:, s, :], ((s, segs - 1 - s), (0, 0)))
        return y.reshape(-1)

    def frame(y):  # [total_pad] -> [F, n_fft] framing, dense
        yb = y.reshape(nb, h)
        parts = [yb[s : s + F] for s in range(segs)]
        return jnp.stack(parts, axis=1).reshape(F, L_pad)[:, :n_fft]

    wsq = ola(jnp.broadcast_to(win * win, (F, n_fft)))
    wsq = jnp.maximum(wsq, 1e-10)
    pad = n_fft // 2

    def synth(re, im):
        frames = (
            jnp.dot(re, inv_cos, preferred_element_type=jnp.float32)
            + jnp.dot(im, inv_sin, preferred_element_type=jnp.float32)
        ) * win
        return ola(frames) / wsq

    def analyze(y):
        frames = frame(y) * win
        re = jnp.dot(frames, fwd_cos, preferred_element_type=jnp.float32)
        im = jnp.dot(frames, fwd_sin, preferred_element_type=jnp.float32)
        return re, im

    # the FFT path trims the center padding after each istft and stft
    # re-pads with zeros; masking the edge regions replicates that exactly
    pos = jnp.arange(total_pad)
    edge_mask = ((pos >= pad) & (pos < total - pad)).astype(jnp.float32)

    phase = jax.random.uniform(key, S.shape, minval=0.0, maxval=2.0 * jnp.pi)
    y = synth(S * jnp.cos(phase), S * jnp.sin(phase))

    def body(_, y):
        re, im = analyze(y * edge_mask)
        mag = jnp.maximum(jnp.sqrt(re * re + im * im), 1e-8)
        return synth(S * re / mag, S * im / mag)

    y = jax.lax.fori_loop(0, iters, body, y)
    return y[pad : total - pad]


def inv_preemphasis_assoc(wav: jax.Array, k: float) -> jax.Array:
    """IIR y[t] = x[t] + k*y[t-1] as a log-depth ``associative_scan``.

    The first-order recurrence is the composition of affine maps
    ``f_t(y) = x_t + k*y``; representing each as ``(A, b)`` with
    ``(A2,b2)∘(A1,b1) = (A1*A2, b2 + A2*b1)`` makes it associative, so the
    whole filter runs in ~log2(T) vectorized passes instead of T serial
    scan steps (a ~70k-sample ``lax.scan`` cost ~80 ms on v5e; this is
    ~1 ms).  ``k**t`` underflows gradually to 0 past t~1200 — harmless.
    Same math as :func:`inv_preemphasis_scan` (reference audio.py:55)."""
    A = jnp.full_like(wav, k)
    A = A.at[0].set(0.0)  # y[-1] = 0

    def compose(l, r):
        return l[0] * r[0], r[1] + r[0] * l[1]

    _, y = jax.lax.associative_scan(compose, (A, wav))
    return y


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
    """Normalized mel -> waveform via Griffin-Lim (reference audio.py:123-137).

    On TPU the DFTs run as MXU matmuls (griffin_lim_matmul: ~0.92 s -> ~ms
    for the 60-iteration loop); elsewhere the FFT path is used."""
    from ..utils import is_tpu_backend

    c: AudioConfig = pipeline.cfg
    if key is None:
        key = jax.random.PRNGKey(0)
    mag = pipeline.mel_to_linear_mag(mel_norm)
    on_tpu = is_tpu_backend()
    gl = griffin_lim_matmul if on_tpu else griffin_lim
    y = gl(mag**c.power, key, c.n_fft, c.hop_size, c.win_size, c.griffin_lim_iters)
    if c.preemphasize:
        inv = inv_preemphasis_assoc if on_tpu else inv_preemphasis_scan
        y = inv(y, c.preemphasis)
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
