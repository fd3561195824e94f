"""Jittable STFT / mel spectrogram pipeline.

Replaces the reference's librosa/numpy feature extraction
(tacotron/datasets/audio.py:86-102, 203-295) with pure-JAX ops so feature
extraction runs at speed-of-light on TPU: framing is a gather, the DFT is
``jnp.fft.rfft`` (XLA-fused), and the mel projection is a single matmul on
the MXU.

Conventions pinned to the reference:
* hann window (periodic) of ``win_size`` centered inside ``n_fft``;
* signal center-padded by ``n_fft//2`` with zeros (librosa ``pad_mode='constant'``);
* mel filterbank: Slaney scale, Slaney area normalization (librosa defaults);
* ``amp_to_db(|D|**2)`` with a -100 dB floor, 20 dB reference subtraction;
* symmetric [-4, 4] clipped normalization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig

# ---------------------------------------------------------------------------
# Static (trace-time) constructors — plain numpy, folded into the jaxpr.
# ---------------------------------------------------------------------------


def hann_window(win_size: int) -> np.ndarray:
    """Periodic Hann window (scipy ``get_window('hann', n, fftbins=True)``)."""
    n = np.arange(win_size)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)).astype(np.float32)


def padded_window(win_size: int, n_fft: int) -> np.ndarray:
    """Window centered inside the FFT frame (librosa ``util.pad_center``)."""
    win = hann_window(win_size)
    lpad = (n_fft - win_size) // 2
    out = np.zeros(n_fft, dtype=np.float32)
    out[lpad : lpad + win_size] = win
    return out


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    log_region = m >= min_log_mel
    return np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


def mel_basis(
    sample_rate: int, n_fft: int, num_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape [num_mels, 1+n_fft/2].

    Matches ``librosa.filters.mel`` defaults (htk=False, norm='slaney'), the
    basis the reference builds at audio.py:290-293.
    """
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), num_mels + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : num_mels + 2] - hz_pts[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def num_frames(n_samples: int, n_fft: int, hop_size: int) -> int:
    """Frame count for a center-padded signal (librosa convention)."""
    return 1 + (n_samples + 2 * (n_fft // 2) - n_fft) // hop_size


# ---------------------------------------------------------------------------
# Jittable transforms
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_fft", "hop_size", "win_size"))
def stft(y: jax.Array, n_fft: int, hop_size: int, win_size: int) -> jax.Array:
    """Complex STFT of a 1-D signal -> [frames, 1 + n_fft//2]."""
    pad = n_fft // 2
    ypad = jnp.pad(y, (pad, pad))
    n_fr = num_frames(y.shape[0], n_fft, hop_size)
    idx = jnp.arange(n_fr)[:, None] * hop_size + jnp.arange(n_fft)[None, :]
    frames = ypad[idx] * jnp.asarray(padded_window(win_size, n_fft))
    return jnp.fft.rfft(frames, axis=-1)


@partial(jax.jit, static_argnames=("n_fft", "hop_size", "win_size", "length"))
def istft(
    spec: jax.Array, n_fft: int, hop_size: int, win_size: int, length: int | None = None
) -> jax.Array:
    """Inverse STFT with windowed overlap-add + squared-window normalization.

    ``spec`` is [frames, 1 + n_fft//2]; output trims the ``n_fft//2`` center
    padding, matching ``librosa.istft`` (reference audio.py:209-210).
    """
    win = jnp.asarray(padded_window(win_size, n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * win
    n_fr = spec.shape[0]
    total = n_fft + hop_size * (n_fr - 1)
    idx = jnp.arange(n_fr)[:, None] * hop_size + jnp.arange(n_fft)[None, :]
    y = jnp.zeros(total, dtype=frames.dtype).at[idx.reshape(-1)].add(frames.reshape(-1))
    wsq = jnp.zeros(total, dtype=frames.dtype).at[idx.reshape(-1)].add(
        jnp.broadcast_to(win * win, (n_fr, n_fft)).reshape(-1)
    )
    y = y / jnp.maximum(wsq, 1e-10)
    pad = n_fft // 2
    y = y[pad : total - pad]
    if length is not None:
        y = y[:length]
    return y


def amp_to_db(x: jax.Array, min_level_db: float) -> jax.Array:
    min_level = jnp.exp(min_level_db / 20.0 * jnp.log(10.0))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x: jax.Array) -> jax.Array:
    return jnp.power(10.0, x * 0.05)


def normalize(S: jax.Array, cfg: AudioConfig) -> jax.Array:
    """dB spectrogram -> normalized range ([-4,4] symmetric by default)."""
    scaled = (S - cfg.min_level_db) / (-cfg.min_level_db)
    if cfg.symmetric_mels:
        out = 2.0 * cfg.max_abs_value * scaled - cfg.max_abs_value
        lo, hi = -cfg.max_abs_value, cfg.max_abs_value
    else:
        out = cfg.max_abs_value * scaled
        lo, hi = 0.0, cfg.max_abs_value
    if cfg.allow_clipping_in_normalization:
        out = jnp.clip(out, lo, hi)
    return out


def denormalize(D: jax.Array, cfg: AudioConfig) -> jax.Array:
    if cfg.symmetric_mels:
        if cfg.allow_clipping_in_normalization:
            D = jnp.clip(D, -cfg.max_abs_value, cfg.max_abs_value)
        return (D + cfg.max_abs_value) * (-cfg.min_level_db) / (
            2.0 * cfg.max_abs_value
        ) + cfg.min_level_db
    if cfg.allow_clipping_in_normalization:
        D = jnp.clip(D, 0.0, cfg.max_abs_value)
    return D * (-cfg.min_level_db) / cfg.max_abs_value + cfg.min_level_db


def mel_to_unit(mel: jax.Array, cfg: AudioConfig, xp=jnp) -> jax.Array:
    """Acoustic-model mels ([-4,4]) -> vocoder contract ([0,1]).

    The explicit adapter that replaces the reference's scattered rescaling
    (wavernn_preprocess.py:105-106,156-157; tacotron_synthesize.py:115).
    ``xp=numpy`` keeps host-side per-example loops off the device tunnel.
    """
    m = cfg.max_abs_value
    return xp.clip((mel + m) / (2.0 * m), 0.0, 1.0)


def unit_to_mel(unit: jax.Array, cfg: AudioConfig) -> jax.Array:
    m = cfg.max_abs_value
    return unit * 2.0 * m - m


class MelPipeline:
    """Wav -> normalized mel/linear spectrograms, all jit-compiled.

    One mel convention for the whole framework (reference had two:
    audio.py [-4,4] vs wavernn dsp.py [0,1]); the vocoder boundary uses
    ``mel_to_unit``/``unit_to_mel``.
    """

    def __init__(self, cfg: AudioConfig):
        self.cfg = cfg
        w = mel_basis(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax)
        self._mel_w = jnp.asarray(w)
        self._inv_mel_w = jnp.asarray(np.linalg.pinv(w))

    def stft_mag(self, wav: jax.Array) -> jax.Array:
        c = self.cfg
        D = stft(wav, c.n_fft, c.hop_size, c.win_size)
        return jnp.abs(D) ** c.magnitude_power

    def melspectrogram(self, wav: jax.Array) -> jax.Array:
        """[T] wav -> [frames, num_mels] normalized mel (reference audio.py:95)."""
        c = self.cfg
        mag = self.stft_mag(wav)  # [F, bins]
        mel = mag @ self._mel_w.T
        S = amp_to_db(mel, c.min_level_db) - c.ref_level_db
        return normalize(S, c)

    def linearspectrogram(self, wav: jax.Array) -> jax.Array:
        c = self.cfg
        S = amp_to_db(self.stft_mag(wav), c.min_level_db) - c.ref_level_db
        return normalize(S, c)

    def mel_to_linear_mag(self, mel_norm: jax.Array) -> jax.Array:
        """Normalized mel -> linear magnitude (for Griffin-Lim)."""
        c = self.cfg
        S = denormalize(mel_norm, c)
        amp = db_to_amp(S + c.ref_level_db) ** (1.0 / c.magnitude_power)
        return jnp.maximum(1e-10, amp @ self._inv_mel_w.T)

    def linear_to_mag(self, lin_norm: jax.Array) -> jax.Array:
        c = self.cfg
        S = denormalize(lin_norm, c)
        return db_to_amp(S + c.ref_level_db) ** (1.0 / c.magnitude_power)
