"""Pallas WaveRNN generation kernel: interpret-mode parity vs the scan path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import wavernn as W
from tacotronv2_wavernn_chinese_tpu.ops import wavernn_kernel as K


@pytest.fixture(scope="module")
def setup():
    """Real conditioning geometry (80 mels, aux 32 => res_out 128) with small
    recurrent dims and hop 20 so interpret mode stays fast."""
    cfg = default_config()
    mcfg = dataclasses.replace(
        cfg.wavernn,
        upsample_factors=(2, 2, 5),
        rnn_dims=64,
        fc_dims=64,
        compute_dims=32,
        res_out_dims=128,
        res_blocks=2,
    )
    params = W.init_wavernn(jax.random.PRNGKey(0), mcfg, num_mels=80, bits=8)
    mels = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 80))
    return mcfg, params, mels


def _labels(wav, bits=8):
    return np.round((np.asarray(wav) + 1.0) * (2 ** bits - 1) / 2.0).astype(int)


def test_greedy_parity_with_scan(setup):
    """f32 interpret-mode kernel must reproduce the scan path exactly under
    greedy (noise-free) decoding."""
    mcfg, params, mels = setup
    rng = jax.random.PRNGKey(2)
    ref = W.generate_scan(params, mcfg, mels, rng, bits=8, apply_mu_law=False, greedy=True)
    out = K.generate_pallas(
        params, mcfg, mels, rng, bits=8, apply_mu_law=False, greedy=True,
        chunk=16, interpret=True, dtype=jnp.float32,
    )
    assert out.shape == ref.shape
    np.testing.assert_array_equal(_labels(out), _labels(ref))


def test_chunk_size_invariance(setup):
    """Chunked pipelining must not change results (state carries across
    grid steps)."""
    mcfg, params, mels = setup
    rng = jax.random.PRNGKey(3)
    a = K.generate_pallas(params, mcfg, mels, rng, bits=8, apply_mu_law=False,
                          greedy=True, chunk=16, interpret=True, dtype=jnp.float32)
    b = K.generate_pallas(params, mcfg, mels, rng, bits=8, apply_mu_law=False,
                          greedy=True, chunk=8, interpret=True, dtype=jnp.float32)
    np.testing.assert_array_equal(_labels(a), _labels(b))


def test_non_multiple_chunk_padding(setup):
    """T not divisible by chunk -> padded internally, trimmed on return."""
    mcfg, params, mels = setup
    rng = jax.random.PRNGKey(4)
    out = K.generate_pallas(params, mcfg, mels, rng, bits=8, apply_mu_law=False,
                            greedy=True, chunk=13, interpret=True, dtype=jnp.float32)
    T = (mels.shape[1] - 2 * mcfg.pad) * mcfg.total_upsample
    assert out.shape == (2, T)


def test_pack_weights_layout(setup):
    mcfg, params, _ = setup
    w = K.pack_weights(params, mcfg, dtype=jnp.float32)
    # conditioning consumers are COND_W rows with zeros outside their slice
    assert w["wi_cond"].shape == (K.COND_W, mcfg.rnn_dims)
    np.testing.assert_array_equal(np.asarray(w["wi_cond"][K._A2:]), 0.0)
    np.testing.assert_array_equal(np.asarray(w["wi2_cond"][: K._A2]), 0.0)
    np.testing.assert_array_equal(np.asarray(w["wi2_cond"][K._A3:]), 0.0)
    # round-trip: packed rows equal original weights
    aux = mcfg.res_out_dims // 4
    np.testing.assert_allclose(
        np.asarray(w["wi2_cond"][K._A2 : K._A2 + aux]),
        np.asarray(params["gru2"]["wi"][mcfg.rnn_dims :]),
    )


def test_supported_gate():
    cfg = default_config()
    assert K.supported(cfg.wavernn, 80)
    tiny = dataclasses.replace(cfg.wavernn, res_out_dims=16)
    assert not K.supported(tiny, 80)
    assert not K.supported(cfg.wavernn, 40)


def test_sampled_mode_interpret(setup):
    """PRNG path produces diverse, key-dependent labels (skipped where the
    interpreter lacks the TPU PRNG primitives; the TPU path is exercised by
    bench.py on real hardware)."""
    mcfg, params, mels = setup
    try:
        out = K.generate_pallas(params, mcfg, mels, jax.random.PRNGKey(5), bits=8,
                                apply_mu_law=False, chunk=16, interpret=True,
                                dtype=jnp.float32)
    except NotImplementedError:
        pytest.skip("pltpu PRNG not implemented in interpret mode")
    labels = _labels(out)
    assert np.unique(labels).size > 3
    out2 = K.generate_pallas(params, mcfg, mels, jax.random.PRNGKey(6), bits=8,
                             apply_mu_law=False, chunk=16, interpret=True,
                             dtype=jnp.float32)
    assert not np.array_equal(labels, _labels(out2))


def test_bits_fc3_mismatch_raises(setup):
    """bits must agree with the fc3 class count — a silent mismatch would
    feed wrongly-rescaled samples back into the AR loop (garbage audio)."""
    mcfg, params, mels = setup
    with pytest.raises(ValueError, match="mu-law classes"):
        K.generate_pallas(params, mcfg, mels, jax.random.PRNGKey(0), bits=10,
                          interpret=True, dtype=jnp.float32)


def test_fold_grouping_matches_single_call(setup, monkeypatch):
    """Fold batches beyond MAX_FOLDS run as sequential groups; greedy output
    must equal the ungrouped call exactly."""
    mcfg, params, _ = setup
    mels = jax.random.uniform(jax.random.PRNGKey(4), (5, 8, 80))
    whole = K.generate_pallas(params, mcfg, mels, jax.random.PRNGKey(5), bits=8,
                              apply_mu_law=False, greedy=True, chunk=16,
                              interpret=True, dtype=jnp.float32)
    monkeypatch.setattr(K, "MAX_FOLDS", 2)
    grouped = K.generate_pallas(params, mcfg, mels, jax.random.PRNGKey(5), bits=8,
                                apply_mu_law=False, greedy=True, chunk=16,
                                interpret=True, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(grouped))


def test_pack_weights_rejects_non_reference_geometry():
    cfg = default_config()
    mcfg = dataclasses.replace(
        cfg.wavernn, upsample_factors=(2, 2, 5), rnn_dims=64, fc_dims=64,
        compute_dims=32, res_out_dims=64, res_blocks=2,  # aux_d=16
    )
    params = W.init_wavernn(jax.random.PRNGKey(0), mcfg, num_mels=96, bits=8)
    with pytest.raises(AssertionError):
        K.pack_weights(params, mcfg)
    assert not K.supported(mcfg, 96)
