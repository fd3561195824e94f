"""Mu-law companding and n-bit label conversion (jnp, works on host or device).

Reference: tacotron/datasets/audio.py:8-11 (encode used for WaveRNN targets)
and wavernn/utils/dsp.py:8-45 (label/float conversions, decode).
"""

from __future__ import annotations

import jax.numpy as jnp


def encode_mu_law(x, mu: int = 1024, xp=jnp):
    """[-1,1] float -> integer label in [0, mu-1] (reference audio.py:8-11).

    ``xp=numpy`` runs the same formula on host — per-example preprocessing
    loops must not dispatch elementwise jnp ops through the device tunnel."""
    m = mu - 1
    fx = xp.sign(x) * xp.log1p(m * xp.abs(x)) / xp.log1p(xp.float32(m))
    return xp.floor((fx + 1) / 2 * m + 0.5).astype(xp.int32)


def decode_mu_law(y, mu: int = 1024, from_labels: bool = True):
    """Labels (or [-1,1] floats) -> linear waveform (reference dsp.py:38-45)."""
    m = mu - 1
    if from_labels:
        y = label_2_float(y, bits_from_mu(mu))
    x = jnp.sign(y) / m * ((1 + m) ** jnp.abs(y) - 1)
    return x


def bits_from_mu(mu: int) -> int:
    return int(mu).bit_length() - 1


def label_2_float(x, bits: int):
    """Integer label [0, 2^bits-1] -> float [-1, 1] (reference dsp.py:8-9)."""
    return 2.0 * x.astype(jnp.float32) / (2**bits - 1.0) - 1.0


def float_2_label(x, bits: int):
    """Float [-1, 1] -> integer label (reference dsp.py:12-14)."""
    peak = jnp.maximum(jnp.max(jnp.abs(x)), 1.0)
    x = x / peak
    return jnp.round((x + 1.0) * (2**bits - 1) / 2.0).astype(jnp.int32)
