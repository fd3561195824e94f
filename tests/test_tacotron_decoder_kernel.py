"""Fused Tacotron decoder kernel: interpret-mode parity with the XLA path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
from tacotronv2_wavernn_chinese_tpu.ops import tacotron_decoder_kernel as DK


@pytest.fixture(scope="module")
def setup():
    cfg = default_config().tacotron
    cfg = dataclasses.replace(
        cfg,
        embedding_dim=32, enc_conv_channels=32, enc_conv_layers=1,
        encoder_lstm_units=32, attention_dim=16, attention_filters=8,
        attention_kernel=7, prenet_layers=(32, 32), decoder_lstm_units=32,
        postnet_channels=32, postnet_layers=1,
        dropout_rate=0.0,  # deterministic prenet for exact parity
    )
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg)
    B, T_in = 2, 16
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.asarray([16, 11], jnp.int32)
    memory, _ = T.encode(params, cfg, inputs, lens, False, jax.random.PRNGKey(1))
    mask = (jnp.arange(T_in)[None, :] < lens[:, None]).astype(jnp.float32)
    return cfg, params, memory, mask


def test_supported_gate():
    cfg = default_config().tacotron
    # ALL FOUR reference attention variants run in the kernel
    assert DK.supported(cfg)
    for mode in ("lsa", "gmm", "graves"):
        assert DK.supported(dataclasses.replace(cfg, attention_mode=mode))
    assert DK.supported(dataclasses.replace(cfg, smoothing=True))
    # r>1 (the reference's outputs_per_step speed knob) runs in-kernel
    assert DK.supported(dataclasses.replace(cfg, outputs_per_step=2))
    assert DK.supported(dataclasses.replace(cfg, outputs_per_step=3))
    assert not DK.supported(dataclasses.replace(cfg, outputs_per_step=7))
    # genuinely unsupported: oversized vector state
    assert not DK.supported(
        dataclasses.replace(cfg, attention_mode="gmm", num_attn_mixtures=200)
    )
    assert not DK.supported(
        dataclasses.replace(cfg, attention_mode="graves", graves_heads=200)
    )
    # the long-sentence anti-repeat machinery runs IN the kernel
    assert DK.supported(dataclasses.replace(cfg, anti_repeat=True))
    # conv subtile vreg bound: taps-1 + 64 <= 128  =>  attention_kernel <= 65
    assert DK.supported(dataclasses.replace(cfg, attention_kernel=65))
    assert not DK.supported(dataclasses.replace(cfg, attention_kernel=67))


def test_parity_at_max_attention_kernel(setup):
    """taps=65 sits exactly on the kernel's vreg bound (offset 64 + width 64
    = 128); parity here exercises the widest admissible conv window."""
    cfg, _, _, _ = setup
    cfg = dataclasses.replace(cfg, attention_kernel=65)
    assert DK.supported(cfg)
    params = T.init_tacotron(jax.random.PRNGKey(3), cfg)
    B, T_in = 2, 100
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.asarray([100, 73], jnp.int32)
    memory, _ = T.encode(params, cfg, inputs, lens, False, jax.random.PRNGKey(1))
    mask = (jnp.arange(T_in)[None, :] < lens[:, None]).astype(jnp.float32)
    rng = jax.random.PRNGKey(9)
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(params, cfg, memory, mask, rng, 16)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        params, cfg, memory, mask, rng, 16, chunk=8, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    n = int(np.asarray(sl_r).min())
    np.testing.assert_allclose(np.asarray(fr_r[:, :n]), np.asarray(fr_k[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_r[:, :n]), np.asarray(al_k[:, :n]), atol=1e-5)


def test_parity_with_xla_decode(setup):
    cfg, params, memory, mask = setup
    rng = jax.random.PRNGKey(5)
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(params, cfg, memory, mask, rng, 24)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        params, cfg, memory, mask, rng, 24, chunk=8, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    n = int(np.asarray(sl_r).min())
    np.testing.assert_allclose(np.asarray(fr_r[:, :n]), np.asarray(fr_k[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_r[:, :n]), np.asarray(al_k[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_r[:, :n]), np.asarray(st_k[:, :n]), atol=1e-5)


def test_chunk_invariance(setup):
    cfg, params, memory, mask = setup
    rng = jax.random.PRNGKey(6)
    a = DK.decode_autoregressive_pallas(
        params, cfg, memory, mask, rng, 24, chunk=8, interpret=True, dtype=jnp.float32
    )
    b = DK.decode_autoregressive_pallas(
        params, cfg, memory, mask, rng, 24, chunk=24, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))
    n = int(np.asarray(a[3]).min())
    np.testing.assert_allclose(np.asarray(a[0][:, :n]), np.asarray(b[0][:, :n]), atol=1e-6)


def test_parity_beyond_one_lane_tile(setup):
    """T_in > 128 exercises the kernel's <=128-wide encoder tiling (the
    Mosaic expansion constraint) and the scratch-based alpha shift."""
    cfg, params, _, _ = setup
    B, T_in = 2, 200
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.asarray([200, 137], jnp.int32)
    memory, _ = T.encode(params, cfg, inputs, lens, False, jax.random.PRNGKey(1))
    mask = (jnp.arange(T_in)[None, :] < lens[:, None]).astype(jnp.float32)
    assert DK.supported_shape(B, T_in)
    rng = jax.random.PRNGKey(7)
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(params, cfg, memory, mask, rng, 20)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        params, cfg, memory, mask, rng, 20, chunk=10, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    n = int(np.asarray(sl_r).min())
    np.testing.assert_allclose(np.asarray(fr_r[:, :n]), np.asarray(fr_k[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_r[:, :n]), np.asarray(al_k[:, :n]), atol=1e-5)


def test_weight_packing_shapes(setup):
    cfg, params, memory, _ = setup
    w = DK.pack_weights(params, cfg, dtype=jnp.float32)
    V = memory.shape[-1]
    u = cfg.decoder_lstm_units
    assert w["l1_pre"].shape == (cfg.prenet_layers[-1], 4 * u)
    assert w["l1_ctx"].shape == (V, 4 * u)
    assert w["l1_h"].shape == (u, 4 * u)
    assert w["att_conv"].shape == (cfg.attention_kernel, cfg.attention_filters)
    assert w["fp_h"].shape == (u, 80) and w["fp_c"].shape == (V, 80)
    # split kernels reassemble the originals
    l1 = np.concatenate([w["l1_pre"], w["l1_ctx"], w["l1_h"]], axis=0)
    np.testing.assert_allclose(l1, np.asarray(params["dec_lstm1"]["w"]), atol=0)


def test_post_stop_frames_match_xla(setup):
    """When batch examples stop at different steps the kernel must keep
    advancing finished examples with REAL frames/state — the reference runs
    dynamic_decode(impute_finished=False, tacotron.py:101) — so the full
    untrimmed buffers (which the postnet convolves) match the XLA decode."""
    cfg, params, memory, mask = setup
    # bias the stop projection so examples stop early at different steps
    p2 = dict(params)
    p2["stop_projection"] = dict(
        params["stop_projection"],
        b=params["stop_projection"]["b"] + 4.0,
    )
    rng = jax.random.PRNGKey(11)
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(p2, cfg, memory, mask, rng, 24)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        p2, cfg, memory, mask, rng, 24, chunk=8, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    # FULL buffers (not trimmed to min stop) must agree: finished examples
    # keep producing real frames until the whole batch stops, zeros after
    np.testing.assert_allclose(np.asarray(fr_r), np.asarray(fr_k), atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_r), np.asarray(al_k), atol=1e-5)
    n = int(np.asarray(sl_r).max()) + 1
    np.testing.assert_allclose(np.asarray(st_r[:, :n]), np.asarray(st_k[:, :n]), atol=1e-5)


def test_supported_shape_accounts_for_config_dims():
    import jax.numpy as jnp

    cfg = default_config().tacotron
    assert DK.supported_shape(1, 384)
    assert DK.supported_shape(1, 384, cfg)
    # bf16 keys/values roughly double the old f32 384 ceiling
    assert DK.supported_shape(8, 768, cfg)
    assert not DK.supported_shape(8, 800, cfg)  # hard cap
    # a double-width encoder (V=1024) blows the VMEM budget at f32 kv
    big = dataclasses.replace(cfg, encoder_lstm_units=512)
    assert not DK.supported_shape(8, 384, big, dtype=jnp.float32)
    assert DK.supported_shape(8, 64, big, dtype=jnp.float32)  # small fits
    # f32-weight debug/parity mode shrinks the envelope (weights double AND
    # kv rides f32) but the parity shapes (T_in<=128) stay well inside it
    f32w = dataclasses.replace(cfg, kernel_weights_dtype="f32")
    assert DK.supported_shape(8, 128, f32w)
    assert not DK.supported_shape(8, 768, f32w)


def test_bf16_serving_drift_is_bounded(setup):
    """The serving default (bf16 weights + bf16 VMEM keys/values,
    cfg.kernel_kv_dtype='bf16') must track the f32 XLA decode closely:
    measured max |mel delta| ~9e-4 with 100% alignment-argmax agreement in
    interpret mode (same arithmetic as the TPU path minus Mosaic-internal
    rounding) — inside the 1e-3 mel-allclose north-star tolerance."""
    import dataclasses as dc

    cfg, params, memory, mask = setup
    p2 = dict(params)
    p2["stop_projection"] = dict(
        params["stop_projection"], b=params["stop_projection"]["b"] - 8.0
    )
    rng = jax.random.PRNGKey(5)
    for anti in (False, True):
        c = dc.replace(cfg, anti_repeat=anti)
        fr_r, _, al_r, sl_r = T.decode_autoregressive(p2, c, memory, mask, rng, 30)
        fr_k, _, al_k, sl_k = DK.decode_autoregressive_pallas(
            p2, c, memory, mask, rng, 30, chunk=6, interpret=True, dtype=jnp.bfloat16
        )
        np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
        assert np.abs(np.asarray(fr_r) - np.asarray(fr_k)).max() < 5e-3
        agree = np.mean(
            np.asarray(al_r).argmax(-1) == np.asarray(al_k).argmax(-1)
        )
        assert agree > 0.98, agree


def test_kv_f32_escape_hatch(setup):
    """cfg.kernel_kv_dtype='f32' keeps keys/values exact under bf16 weights
    and shrinks the supported_shape envelope accordingly."""
    import dataclasses as dc

    cfg, params, memory, mask = setup
    full = default_config().tacotron
    cfg_f32kv = dc.replace(full, kernel_kv_dtype="f32")
    assert DK.supported_shape(8, 384, cfg_f32kv)
    assert not DK.supported_shape(8, 768, cfg_f32kv)  # f32 kv halves it
    assert DK.supported_shape(8, 768, full)  # bf16 default keeps 768
    # and the kernel still runs (interpret) under the f32-kv config
    c = dc.replace(cfg, kernel_kv_dtype="f32")
    rng = jax.random.PRNGKey(6)
    fr_r, _, _, sl_r = T.decode_autoregressive(params, c, memory, mask, rng, 12)
    fr_k, _, _, sl_k = DK.decode_autoregressive_pallas(
        params, c, memory, mask, rng, 12, chunk=6, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    n = int(np.asarray(sl_r).min())
    np.testing.assert_allclose(np.asarray(fr_r[:, :n]), np.asarray(fr_k[:, :n]), atol=1e-5)


def test_parity_lsa(setup):
    """Vanilla location-sensitive attention (cumulative) through the kernel
    matches the XLA decode step-for-step."""
    cfg, _, _, _ = setup
    cfg_lsa = dataclasses.replace(cfg, attention_mode="lsa")
    assert DK.supported(cfg_lsa)
    params = T.init_tacotron(jax.random.PRNGKey(21), cfg_lsa)
    B, T_in = 2, 48
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.asarray([48, 31], jnp.int32)
    memory, _ = T.encode(params, cfg_lsa, inputs, lens, False, jax.random.PRNGKey(1))
    mask = (jnp.arange(T_in)[None, :] < lens[:, None]).astype(jnp.float32)
    rng = jax.random.PRNGKey(22)
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(params, cfg_lsa, memory, mask, rng, 20)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        params, cfg_lsa, memory, mask, rng, 20, chunk=10, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    n = int(np.asarray(sl_r).min())
    np.testing.assert_allclose(np.asarray(fr_r[:, :n]), np.asarray(fr_k[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_r[:, :n]), np.asarray(al_k[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_r[:, :n]), np.asarray(st_k[:, :n]), atol=1e-5)


@pytest.mark.parametrize("monotonic", [True, False])
def test_parity_lsa_synthesis_window(setup, monotonic):
    """LSA with the synthesis constraint ('monotonic' forward window /
    symmetric 'window' type) runs IN the kernel and matches XLA."""
    cfg, _, _, _ = setup
    cfg_lsa = dataclasses.replace(
        cfg, attention_mode="lsa", synthesis_constraint=True,
        synthesis_window=4, anti_repeat=monotonic,
    )
    assert DK.supported(cfg_lsa)
    params = T.init_tacotron(jax.random.PRNGKey(23), cfg_lsa)
    p2 = dict(params)
    p2["stop_projection"] = dict(
        params["stop_projection"], b=params["stop_projection"]["b"] - 8.0
    )
    B, T_in = 2, 40
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.asarray([40, 29], jnp.int32)
    memory, _ = T.encode(p2, cfg_lsa, inputs, lens, False, jax.random.PRNGKey(1))
    mask = (jnp.arange(T_in)[None, :] < lens[:, None]).astype(jnp.float32)
    rng = jax.random.PRNGKey(24)
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(p2, cfg_lsa, memory, mask, rng, 30)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        p2, cfg_lsa, memory, mask, rng, 30, chunk=10, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    np.testing.assert_allclose(np.asarray(fr_r), np.asarray(fr_k), atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_r), np.asarray(al_k), atol=1e-5)
    # the window actually constrains: alignment support is bounded by the
    # window geometry in BOTH modes — monotonic [prev, prev+w) has width w;
    # symmetric [prev - (w//2 + w%2), prev + w//2) also has width w
    n = int(np.asarray(sl_r).min())
    nz = (np.asarray(al_k)[:, 1:n] > 1e-6).sum(-1)
    assert nz.max() <= cfg_lsa.synthesis_window


@pytest.mark.parametrize("mode", ["gmm", "graves"])
def test_parity_gmm_graves(setup, mode):
    """GMM (v0) and Graves attention run IN the kernel (pure per-position
    elementwise; kappa / per-head mu ride the muS scratch columns) and match
    the XLA decode step-for-step."""
    cfg, _, _, _ = setup
    cfg_m = dataclasses.replace(cfg, attention_mode=mode)
    assert DK.supported(cfg_m)
    params = T.init_tacotron(jax.random.PRNGKey(31), cfg_m)
    B, T_in = 2, 40
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.asarray([40, 27], jnp.int32)
    memory, _ = T.encode(params, cfg_m, inputs, lens, False, jax.random.PRNGKey(1))
    mask = (jnp.arange(T_in)[None, :] < lens[:, None]).astype(jnp.float32)
    rng = jax.random.PRNGKey(32)
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(params, cfg_m, memory, mask, rng, 16)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        params, cfg_m, memory, mask, rng, 16, chunk=8, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    n = int(np.asarray(sl_r).min())
    np.testing.assert_allclose(np.asarray(fr_r[:, :n]), np.asarray(fr_k[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_r[:, :n]), np.asarray(al_k[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_r[:, :n]), np.asarray(st_k[:, :n]), atol=1e-5)


def test_parity_smoothing(setup):
    """Sigmoid-normalized attention (hparams.smoothing) in-kernel matches
    the XLA decode."""
    cfg, _, _, _ = setup
    cfg_s = dataclasses.replace(cfg, smoothing=True)
    assert DK.supported(cfg_s)
    params = T.init_tacotron(jax.random.PRNGKey(41), cfg_s)
    B, T_in = 2, 32
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.asarray([32, 21], jnp.int32)
    memory, _ = T.encode(params, cfg_s, inputs, lens, False, jax.random.PRNGKey(1))
    mask = (jnp.arange(T_in)[None, :] < lens[:, None]).astype(jnp.float32)
    rng = jax.random.PRNGKey(42)
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(params, cfg_s, memory, mask, rng, 14)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        params, cfg_s, memory, mask, rng, 14, chunk=7, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    n = int(np.asarray(sl_r).min())
    np.testing.assert_allclose(np.asarray(fr_r[:, :n]), np.asarray(fr_k[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_r[:, :n]), np.asarray(al_k[:, :n]), atol=1e-5)


def test_parity_anti_repeat(setup):
    """The in-kernel anti-repeat/dwell-limit branch (the reference's
    long-sentence lever, forward_attention.py:176-215) must match the XLA
    decode step-for-step; 40 steps cross the warm-up (5) and dwell (10)
    thresholds several times."""
    cfg, params, memory, mask = setup
    cfg_ar = dataclasses.replace(cfg, anti_repeat=True)
    assert DK.supported(cfg_ar)
    rng = jax.random.PRNGKey(13)
    # keep decoding past stop: compare the full buffers
    p2 = dict(params)
    p2["stop_projection"] = dict(
        params["stop_projection"], b=params["stop_projection"]["b"] - 8.0
    )
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(p2, cfg_ar, memory, mask, rng, 40)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        p2, cfg_ar, memory, mask, rng, 40, chunk=8, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    np.testing.assert_allclose(np.asarray(fr_r), np.asarray(fr_k), atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_r), np.asarray(al_k), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_r), np.asarray(st_k), atol=1e-5)
    # the constraint actually engaged: alignments are windowed (<=5 nonzero)
    nz = (np.asarray(al_k)[0] > 1e-9).sum(-1)
    assert nz.max() <= 5


def test_parity_t_in_512(setup):
    """T_in=512 exercises the extended (bf16-keys) envelope far past the old
    384 cap — 4 lane tiles, 8 conv subtiles — against the XLA decode."""
    cfg, params, _, _ = setup
    B, T_in = 1, 512
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.asarray([T_in], jnp.int32)
    memory, _ = T.encode(params, cfg, inputs, lens, False, jax.random.PRNGKey(1))
    mask = (jnp.arange(T_in)[None, :] < lens[:, None]).astype(jnp.float32)
    assert DK.supported_shape(B, T_in, cfg)
    rng = jax.random.PRNGKey(17)
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(params, cfg, memory, mask, rng, 8)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        params, cfg, memory, mask, rng, 8, chunk=8, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    n = int(np.asarray(sl_r).min())
    np.testing.assert_allclose(np.asarray(fr_r[:, :n]), np.asarray(fr_k[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_r[:, :n]), np.asarray(al_k[:, :n]), atol=1e-5)


@pytest.mark.parametrize("r", [2, 3])
def test_parity_outputs_per_step(setup, r):
    """r>1 (reference outputs_per_step, tacotron_hparams.py:124) runs
    in-kernel: [B, 80r]/[B, r] projections, last-frame feedback via the
    pre-sliced fpl_* columns, per-step any-frame stop policy — and matches
    the XLA while_loop decode frame-for-frame."""
    cfg, _, _, _ = setup
    cfg_r = dataclasses.replace(cfg, outputs_per_step=r)
    assert DK.supported(cfg_r)
    params = T.init_tacotron(jax.random.PRNGKey(51 + r), cfg_r)
    B, T_in = 2, 24
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.asarray([24, 17], jnp.int32)
    memory, _ = T.encode(params, cfg_r, inputs, lens, False, jax.random.PRNGKey(1))
    mask = (jnp.arange(T_in)[None, :] < lens[:, None]).astype(jnp.float32)
    rng = jax.random.PRNGKey(52)
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(params, cfg_r, memory, mask, rng, 12)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        params, cfg_r, memory, mask, rng, 12, chunk=6, interpret=True, dtype=jnp.float32
    )
    assert fr_k.shape == (B, 12 * r, 80) and st_k.shape == (B, 12 * r)
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    n = int(np.asarray(sl_r).min())
    np.testing.assert_allclose(np.asarray(fr_r[:, :n]), np.asarray(fr_k[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_r[:, :n]), np.asarray(st_k[:, :n]), atol=1e-5)
    n_steps = max(n // r, 1)
    np.testing.assert_allclose(
        np.asarray(al_r[:, :n_steps]), np.asarray(al_k[:, :n_steps]), atol=1e-5
    )


def test_parity_outputs_per_step_stop_all(setup):
    """The stop_at_any=False (ALL frames past 0.5) policy also matches."""
    cfg, _, _, _ = setup
    cfg_r = dataclasses.replace(cfg, outputs_per_step=2, stop_at_any=False)
    assert DK.supported(cfg_r)
    params = T.init_tacotron(jax.random.PRNGKey(61), cfg_r)
    # bias the stop projection so some steps fire one-frame-only (policy
    # actually discriminates)
    params["stop_projection"] = dict(
        params["stop_projection"], b=params["stop_projection"]["b"] - 2.0
    )
    B, T_in = 2, 16
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.asarray([16, 11], jnp.int32)
    memory, _ = T.encode(params, cfg_r, inputs, lens, False, jax.random.PRNGKey(1))
    mask = (jnp.arange(T_in)[None, :] < lens[:, None]).astype(jnp.float32)
    rng = jax.random.PRNGKey(62)
    fr_r, st_r, al_r, sl_r = T.decode_autoregressive(params, cfg_r, memory, mask, rng, 10)
    fr_k, st_k, al_k, sl_k = DK.decode_autoregressive_pallas(
        params, cfg_r, memory, mask, rng, 10, chunk=5, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(sl_r), np.asarray(sl_k))
    n = int(np.asarray(sl_r).min())
    np.testing.assert_allclose(np.asarray(fr_r[:, :n]), np.asarray(fr_k[:, :n]), atol=1e-5)
