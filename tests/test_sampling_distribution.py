"""Sampling-distribution tests for WaveRNN generation (CPU-testable paths).

Complements tools/check_kernel_sampling.py (the on-TPU check of the Pallas
kernel's pltpu-PRNG Gumbel sampling, which interpret mode cannot emulate):
here the scan path's categorical sampling and the MOL sampler are checked
statistically with the same zeroed-params trick — all weights zero, fc3 bias
set to known logits, so every emitted sample is an iid draw from a known
distribution.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import make_tiny_cfg

from tacotronv2_wavernn_chinese_tpu.models import wavernn as W
from tools.check_kernel_sampling import chi_square, target_logits, zeroed_params_with_bias


@pytest.fixture(scope="module")
def cfg():
    return make_tiny_cfg()  # bits 8, hop 20, upsample (2,2,5)


def test_scan_sampling_matches_softmax(cfg):
    bits = cfg.audio.bits
    n_classes = 2 ** bits
    lo, k = 40, 8
    logits = target_logits(n_classes, lo, k)
    params = zeroed_params_with_bias(cfg, bits, logits)
    pad = cfg.wavernn.pad
    mels = jnp.zeros((8, 50 + 2 * pad, 80), jnp.float32)  # 8 x 1000 samples
    out = W.generate_scan(params, cfg.wavernn, mels, jax.random.PRNGKey(3), bits,
                          apply_mu_law=False)
    labels = np.rint((np.asarray(out) + 1.0) * (n_classes - 1) / 2.0).astype(np.int64)
    stat, crit, df = chi_square(labels, logits, lo, k)
    assert np.isin(labels, np.arange(lo, lo + k)).mean() > 0.999
    assert stat < crit, (stat, crit, df)


def test_scan_greedy_is_argmax(cfg):
    bits = cfg.audio.bits
    n_classes = 2 ** bits
    logits = target_logits(n_classes, 40, 8)
    params = zeroed_params_with_bias(cfg, bits, logits)
    pad = cfg.wavernn.pad
    mels = jnp.zeros((2, 4 + 2 * pad, 80), jnp.float32)
    out = W.generate_scan(params, cfg.wavernn, mels, jax.random.PRNGKey(0), bits,
                          apply_mu_law=False, greedy=True)
    labels = np.rint((np.asarray(out) + 1.0) * (n_classes - 1) / 2.0).astype(np.int64)
    assert np.all(labels == int(np.argmax(logits)))


def test_mol_sampling_statistics(cfg):
    """MOL scan path: dominant mixture with known mean/scale -> sample
    moments match the logistic distribution."""
    mol_cfg = dataclasses.replace(
        cfg, wavernn=dataclasses.replace(cfg.wavernn, mode="MOL")
    )
    K = 10
    mean, log_scale = 0.3, -4.0
    bias = np.concatenate([
        np.r_[10.0, np.full(K - 1, -10.0)],     # logit_probs: mixture 0 wins
        np.r_[mean, np.zeros(K - 1)],           # means
        np.r_[log_scale, np.zeros(K - 1)],      # log_scales
    ]).astype(np.float32)
    params = zeroed_params_with_bias(mol_cfg, 8, bias)
    # MOL fc3 emits 3*K params, not 2**bits classes
    assert params["fc3"]["b"].shape == (3 * K,)
    pad = mol_cfg.wavernn.pad
    mels = jnp.zeros((8, 50 + 2 * pad, 80), jnp.float32)
    out = np.asarray(
        W.generate_scan(params, mol_cfg.wavernn, mels, jax.random.PRNGKey(5), 8)
    )
    # logistic(mean, s): std = s * pi / sqrt(3)
    want_std = np.exp(log_scale) * np.pi / np.sqrt(3.0)
    assert abs(out.mean() - mean) < 5e-3, out.mean()
    assert abs(out.std() - want_std) / want_std < 0.1, (out.std(), want_std)


def test_tpu_kernel_sampling_gate():
    """The Pallas kernel's sampling branch is validated on hardware by
    tools/check_kernel_sampling.py (SAMPLING_r2.json); under the CPU test
    platform this only asserts the tool is importable and its helpers are
    consistent."""
    logits = target_logits(256, 40, 8)
    p = np.exp(logits - logits.max())
    p /= p.sum()
    assert abs(p[40:48].sum() - 1.0) < 1e-4
    rng = np.random.default_rng(0)
    fake = rng.choice(256, size=20000, p=p)
    stat, crit, _ = chi_square(fake, logits, 40, 8)
    assert stat < crit
