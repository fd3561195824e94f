"""DSP tests: STFT parity vs torch, mel basis, round-trips, mu-law."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import AudioConfig
from tacotronv2_wavernn_chinese_tpu.dsp import (
    MelPipeline,
    decode_mu_law,
    encode_mu_law,
    float_2_label,
    griffin_lim,
    inv_preemphasis_scan,
    istft,
    label_2_float,
    mel_basis,
    mel_to_unit,
    num_frames,
    preemphasis_fir,
    stft,
    trim_silence,
    unit_to_mel,
)

CFG = AudioConfig()
RNG = np.random.RandomState(0)


def _test_signal(n=22050):
    t = np.arange(n) / CFG.sample_rate
    sig = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1760 * t)
        + 0.05 * RNG.randn(n)
    )
    return sig.astype(np.float32)


def test_stft_matches_torch():
    """librosa-convention STFT == torch.stft(center, constant pad, periodic hann)."""
    torch = pytest.importorskip("torch")
    y = _test_signal()
    ours = np.asarray(stft(jnp.asarray(y), CFG.n_fft, CFG.hop_size, CFG.win_size))
    ref = torch.stft(
        torch.from_numpy(y),
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_size,
        win_length=CFG.win_size,
        window=torch.hann_window(CFG.win_size, periodic=True),
        center=True,
        pad_mode="constant",
        return_complex=True,
    ).numpy().T  # torch gives [bins, frames]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.abs(ours), np.abs(ref), atol=2e-2, rtol=1e-3)


def test_num_frames():
    y = _test_signal(22050)
    D = stft(jnp.asarray(y), CFG.n_fft, CFG.hop_size, CFG.win_size)
    assert D.shape[0] == num_frames(22050, CFG.n_fft, CFG.hop_size)
    assert D.shape[1] == CFG.n_fft // 2 + 1


def test_istft_roundtrip():
    y = _test_signal()
    D = stft(jnp.asarray(y), CFG.n_fft, CFG.hop_size, CFG.win_size)
    y2 = np.asarray(istft(D, CFG.n_fft, CFG.hop_size, CFG.win_size))
    n = min(len(y), len(y2))  # istft covers hop*(n_frames-1) samples
    # interior must reconstruct near-exactly (COLA)
    np.testing.assert_allclose(
        y2[CFG.n_fft : n - CFG.n_fft], y[CFG.n_fft : n - CFG.n_fft], atol=1e-4
    )


def test_mel_basis_properties():
    w = mel_basis(CFG.sample_rate, CFG.n_fft, CFG.num_mels, CFG.fmin, CFG.fmax)
    assert w.shape == (80, 1025)
    assert (w >= 0).all()
    # each filter is nonzero somewhere; band edges respected
    assert (w.sum(axis=1) > 0).all()
    freqs = np.linspace(0, CFG.sample_rate / 2, 1025)
    active = w.sum(axis=0) > 0
    assert freqs[active].min() >= CFG.fmin - 25
    assert freqs[active].max() <= CFG.fmax + 25
    # Slaney normalization: peak of each triangle ~ 2/(bandwidth)
    # monotonic center frequencies
    centers = freqs[w.argmax(axis=1)]
    assert (np.diff(centers) > 0).all()


def test_melspectrogram_range_and_shape():
    pipe = MelPipeline(CFG)
    y = _test_signal()
    mel = np.asarray(pipe.melspectrogram(jnp.asarray(y)))
    assert mel.shape == (num_frames(len(y), CFG.n_fft, CFG.hop_size), 80)
    assert mel.min() >= -CFG.max_abs_value - 1e-5
    assert mel.max() <= CFG.max_abs_value + 1e-5
    # a tonal signal must have energy well above the floor
    assert mel.max() > 0


def test_mel_unit_adapters():
    x = jnp.linspace(-4, 4, 33)
    u = mel_to_unit(x, CFG)
    assert float(u.min()) == 0.0 and float(u.max()) == 1.0
    np.testing.assert_allclose(np.asarray(unit_to_mel(u, CFG)), np.asarray(x), atol=1e-6)


def test_griffin_lim_reconstruction():
    """G&L from the true magnitude must correlate strongly with the source."""
    y = _test_signal(11025)
    D = stft(jnp.asarray(y), CFG.n_fft, CFG.hop_size, CFG.win_size)
    mag = jnp.abs(D)
    y2 = np.asarray(
        griffin_lim(mag, jax.random.PRNGKey(0), CFG.n_fft, CFG.hop_size, CFG.win_size, iters=32)
    )
    n = min(len(y), len(y2))
    a, b = y[:n], y2[:n]
    corr = np.abs(np.dot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert corr > 0.55, corr


def test_griffin_lim_matmul_parity():
    """The MXU matmul-DFT variant must match the FFT path (same math)."""
    from tacotronv2_wavernn_chinese_tpu.dsp.griffin_lim import griffin_lim_matmul

    rng = np.random.RandomState(0)
    K = CFG.n_fft // 2 + 1
    S = jnp.asarray(rng.uniform(0.0, 2.0, (48, K)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    args = (CFG.n_fft, CFG.hop_size, CFG.win_size)
    y_fft = np.asarray(griffin_lim(S, key, *args, iters=12))
    y_mm = np.asarray(griffin_lim_matmul(S, key, *args, iters=12))
    assert y_fft.shape == y_mm.shape
    scale = max(float(np.abs(y_fft).max()), 1e-9)
    np.testing.assert_allclose(y_mm / scale, y_fft / scale, atol=2e-4)


def test_inv_preemphasis_assoc_parity():
    """Log-depth associative-scan IIR must match the serial lax.scan."""
    from tacotronv2_wavernn_chinese_tpu.dsp.griffin_lim import (
        inv_preemphasis_assoc,
        inv_preemphasis_scan,
    )

    x = jnp.asarray(np.random.RandomState(3).randn(7001).astype(np.float32))
    y_scan = np.asarray(inv_preemphasis_scan(x, 0.97))
    y_assoc = np.asarray(inv_preemphasis_assoc(x, 0.97))
    np.testing.assert_allclose(y_assoc, y_scan, atol=2e-4, rtol=1e-5)


def test_preemphasis_roundtrip():
    y = jnp.asarray(_test_signal(4096))
    z = preemphasis_fir(y, 0.97)
    y2 = inv_preemphasis_scan(z, 0.97)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-3)


def test_mulaw_roundtrip():
    x = jnp.asarray(np.linspace(-0.99, 0.99, 1001, dtype=np.float32))
    labels = encode_mu_law(x, mu=1024)
    assert int(labels.min()) >= 0 and int(labels.max()) <= 1023
    x2 = decode_mu_law(labels, mu=1024, from_labels=True)
    # 10-bit mu-law step near full scale is ~ln(1024)*|x|*2/1023 ~ 7e-3
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1.5e-2)


def test_mulaw_and_mel_unit_numpy_backend_parity():
    """xp=np (the host path used by per-utterance loops, e.g. infer/gta.py)
    must agree exactly with the jnp path."""
    x = np.linspace(-1, 1, 257, dtype=np.float32)
    np.testing.assert_array_equal(
        encode_mu_law(x, mu=1024, xp=np), np.asarray(encode_mu_law(jnp.asarray(x), mu=1024))
    )
    mel = np.linspace(-5, 5, 41, dtype=np.float32).reshape(-1, 1)
    got = mel_to_unit(mel, CFG, xp=np)
    assert isinstance(got, np.ndarray)
    np.testing.assert_allclose(got, np.asarray(mel_to_unit(jnp.asarray(mel), CFG)), atol=1e-7)


def test_mulaw_matches_reference_formula():
    """Spot-check vs the reference encode (audio.py:8-11) recomputed in numpy."""
    x = np.linspace(-1, 1, 101, dtype=np.float32)
    mu = 1024 - 1
    fx = np.sign(x) * np.log(1 + mu * np.abs(x)) / np.log(1 + mu)
    ref = np.floor((fx + 1) / 2 * mu + 0.5)
    ours = np.asarray(encode_mu_law(jnp.asarray(x), mu=1024))
    np.testing.assert_array_equal(ours, ref.astype(np.int32))


def test_label_float_roundtrip():
    labels = jnp.arange(1024)
    f = label_2_float(labels, 10)
    assert float(f.min()) == -1.0 and float(f.max()) == 1.0
    back = float_2_label(f, 10)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(labels))


def test_trim_silence():
    sr = CFG.sample_rate
    sig = np.concatenate(
        [np.zeros(sr // 2), 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr), np.zeros(sr // 2)]
    ).astype(np.float32)
    trimmed = trim_silence(sig, top_db=25.0)
    assert len(trimmed) < len(sig)
    assert len(trimmed) >= sr - 4096  # kept the tone
    assert np.abs(trimmed).max() > 0.4
