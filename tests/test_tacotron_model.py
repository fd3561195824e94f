"""Tacotron model tests: shapes, attention variants, decode paths, loss."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import TacotronModelConfig
from tacotronv2_wavernn_chinese_tpu.models import attention as A
from tacotronv2_wavernn_chinese_tpu.models import layers as L
from tacotronv2_wavernn_chinese_tpu.models import tacotron as T

CFG = TacotronModelConfig(vocab_size=191)
B, T_IN, T_OUT, M = 2, 11, 20, 80


def _tiny_cfg(**kw):
    return dataclasses.replace(CFG, **kw)


@pytest.fixture(scope="module")
def params():
    return T.init_tacotron(jax.random.PRNGKey(0), CFG)


def _inputs():
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randint(2, 100, size=(B, T_IN)), jnp.int32)
    lengths = jnp.asarray([T_IN, T_IN - 3], jnp.int32)
    mels = jnp.asarray(rng.randn(B, T_OUT, M) * 0.5, jnp.float32)
    return inputs, lengths, mels


def test_encoder_shapes_and_masking(params):
    inputs, lengths, _ = _inputs()
    memory, _ = T.encode(params, CFG, inputs, lengths, False, jax.random.PRNGKey(1))
    assert memory.shape == (B, T_IN, 512)
    # positions past length are zeroed
    assert float(jnp.abs(memory[1, T_IN - 3 :, :]).max()) == 0.0
    assert float(jnp.abs(memory[0]).max()) > 0.0


def test_lstm_step_shapes():
    p = L.lstm_init(jax.random.PRNGKey(0), 8, 16)
    c, h = L.lstm_step(p, jnp.ones((3, 8)), jnp.zeros((3, 16)), jnp.zeros((3, 16)))
    assert c.shape == h.shape == (3, 16)


def test_zoneout_train_vs_eval():
    new, prev = jnp.ones((4, 8)), jnp.zeros((4, 8))
    ev = L.zoneout(jax.random.PRNGKey(0), new, prev, 0.1, train=False)
    np.testing.assert_allclose(np.asarray(ev), 0.9)
    tr = np.asarray(L.zoneout(jax.random.PRNGKey(0), new, prev, 0.5, train=True))
    assert set(np.unique(tr)).issubset({0.0, 1.0})
    # precomputed-mask path matches the keyed path exactly
    mc, mh = L.zoneout_masks(jax.random.PRNGKey(0), 0.5, new.shape)
    tr_mask = np.asarray(L.zoneout(None, new, prev, 0.5, train=True, mask=mc))
    kc = jax.random.split(jax.random.PRNGKey(0))[0]
    np.testing.assert_array_equal(
        tr_mask, np.asarray(L.zoneout(kc, new, prev, 0.5, train=True))
    )
    # train mode with neither key nor mask is a clear error, not an opaque
    # bernoulli(None) crash deep inside a scan trace
    with pytest.raises(ValueError, match="zoneout in train mode"):
        L.zoneout(None, new, prev, 0.5, train=True)


@pytest.mark.parametrize("mode", ["forward", "lsa", "gmm", "graves"])
def test_attention_variants(mode):
    cfg = _tiny_cfg(attention_mode=mode)
    key = jax.random.PRNGKey(0)
    mem = jax.random.normal(key, (B, T_IN, 512))
    p = A.init_params(key, cfg, 512, cfg.decoder_lstm_units)
    keys = A.precompute_keys(p, cfg, mem)
    mask = jnp.ones((B, T_IN))
    state = A.init_state(cfg, B, T_IN, 512)
    q = jax.random.normal(key, (B, cfg.decoder_lstm_units))
    ctx, align, new_state = A.step(p, cfg, q, state, keys, mem, mask, False, key)
    assert ctx.shape == (B, 512)
    assert align.shape == (B, T_IN)
    assert np.isfinite(np.asarray(align)).all()
    if mode != "graves":  # graves alignments are CDF differences, not softmax
        np.testing.assert_allclose(np.asarray(align.sum(-1)), 1.0, atol=1e-4)
    # state advances
    assert new_state.alignments.shape == (B, T_IN)


def test_attention_respects_mask():
    cfg = _tiny_cfg(attention_mode="forward")
    key = jax.random.PRNGKey(0)
    mem = jax.random.normal(key, (B, T_IN, 512))
    p = A.init_params(key, cfg, 512, cfg.decoder_lstm_units)
    keys = A.precompute_keys(p, cfg, mem)
    mask = jnp.asarray(np.array([[1] * T_IN, [1] * 5 + [0] * (T_IN - 5)]), jnp.float32)
    state = A.init_state(cfg, B, T_IN, 512)
    q = jax.random.normal(key, (B, cfg.decoder_lstm_units))
    _, align, _ = A.step(p, cfg, q, state, keys, mem, mask, False, key)
    assert float(np.asarray(align)[1, 5:].max()) < 1e-6


def test_teacher_forced_forward(params):
    inputs, lengths, mels = _inputs()
    out, new_params = T.forward_teacher_forced(
        params, CFG, inputs, lengths, mels, True, jax.random.PRNGKey(2)
    )
    assert out.decoder_output.shape == (B, T_OUT, M)
    assert out.mel_outputs.shape == (B, T_OUT, M)
    assert out.stop_logits.shape == (B, T_OUT)
    assert out.alignments.shape == (B, T_OUT, T_IN)
    # mel clipping honored
    assert float(out.mel_outputs.max()) <= 4.0 + 1e-5
    assert float(out.mel_outputs.min()) >= -4.1 - 1e-5
    # BN stats updated in train mode
    pre = params["enc_convs"]["layers"][0]["bn"]["mean"]
    post = new_params["enc_convs"]["layers"][0]["bn"]["mean"]
    assert not np.allclose(np.asarray(pre), np.asarray(post))


def test_teacher_forced_deterministic_eval(params):
    """Eval forward must be reproducible given the same rng (prenet dropout
    is seeded, unlike the reference's hidden nondeterminism)."""
    inputs, lengths, mels = _inputs()
    out1, _ = T.forward_teacher_forced(params, CFG, inputs, lengths, mels, False, jax.random.PRNGKey(3))
    out2, _ = T.forward_teacher_forced(params, CFG, inputs, lengths, mels, False, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out1.mel_outputs), np.asarray(out2.mel_outputs))


def test_teacher_forcing_static_ratio_matches_traced(params):
    """The static ratio>=1.0 fast path (skips the per-step uniform draw,
    batches the prenet AND the frame/stop projections outside the scan)
    must match the traced ratio path at 1.0 — uniform() in [0,1) < 1.0
    always holds, and k_step is split the same way in both.  The dropout
    streams are bit-identical by construction; the batched projections
    contract the same rows, so outputs agree to matmul-reassociation
    rounding (a [T*B, K] matmul may tile K differently than [B, K])."""
    inputs, lengths, mels = _inputs()
    out_fast, _ = T.forward_teacher_forced(
        params, CFG, inputs, lengths, mels, True, jax.random.PRNGKey(4),
        teacher_forcing_ratio=1.0,
    )
    out_traced, _ = T.forward_teacher_forced(
        params, CFG, inputs, lengths, mels, True, jax.random.PRNGKey(4),
        teacher_forcing_ratio=jnp.asarray(1.0),
    )
    np.testing.assert_allclose(
        np.asarray(out_fast.mel_outputs), np.asarray(out_traced.mel_outputs),
        atol=1e-5,
    )
    # the stop-token stream (sigmoid-CE inputs) agrees too
    np.testing.assert_allclose(
        np.asarray(out_fast.stop_logits), np.asarray(out_traced.stop_logits),
        atol=1e-5,
    )


def test_autoregressive_decode(params):
    inputs, lengths, _ = _inputs()
    out = T.forward_inference(params, CFG, inputs, lengths, jax.random.PRNGKey(4), max_iters=12)
    assert out.decoder_output.shape == (B, 12, M)
    assert out.stop_lengths.shape == (B,)
    assert (np.asarray(out.stop_lengths) <= 12).all()


def test_autoregressive_jits(params):
    inputs, lengths, _ = _inputs()
    fn = jax.jit(
        lambda p, i, l, k: T.forward_inference(p, CFG, i, l, k, max_iters=10).mel_outputs
    )
    y = fn(params, inputs, lengths, jax.random.PRNGKey(0))
    assert y.shape == (B, 10, M)


@pytest.mark.parametrize("mode", ["forward", "lsa", "gmm", "graves"])
def test_all_variants_train_and_infer(mode):
    cfg = _tiny_cfg(attention_mode=mode)
    p = T.init_tacotron(jax.random.PRNGKey(0), cfg)
    inputs, lengths, mels = _inputs()
    out, _ = T.forward_teacher_forced(p, cfg, inputs, lengths, mels, True, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out.mel_outputs)).all()
    inf = T.forward_inference(p, cfg, inputs, lengths, jax.random.PRNGKey(2), max_iters=8)
    assert np.isfinite(np.asarray(inf.mel_outputs)).all()


def test_loss_and_grads(params):
    inputs, lengths, mels = _inputs()
    stop_targets = jnp.zeros((B, T_OUT)).at[:, -1].set(1.0)
    target_lengths = jnp.asarray([T_OUT, T_OUT - 4])

    def loss_fn(p):
        out, _ = T.forward_teacher_forced(p, CFG, inputs, lengths, mels, True, jax.random.PRNGKey(5))
        loss, aux = T.tacotron_loss(out, mels, stop_targets, target_lengths, p, CFG)
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert float(aux["reg"]) > 0
    # gradients flow to embedding and attention
    assert float(jnp.abs(grads["embedding"]).max()) > 0
    flat = jax.tree_util.tree_leaves(grads["attention"])
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_masked_loss(params):
    inputs, lengths, mels = _inputs()
    stop_targets = jnp.zeros((B, T_OUT)).at[:, -1].set(1.0)
    target_lengths = jnp.asarray([T_OUT, T_OUT - 4])
    out, _ = T.forward_teacher_forced(params, CFG, inputs, lengths, mels, False, jax.random.PRNGKey(6))
    loss, aux = T.tacotron_loss(
        out, mels, stop_targets, target_lengths, params, CFG,
        mask_decoder=True, stop_pos_weight=20.0,
    )
    assert np.isfinite(float(loss))


def test_cbhg_linear_head():
    cfg = _tiny_cfg(predict_linear=True)
    p = T.init_tacotron(jax.random.PRNGKey(0), cfg)
    inputs, lengths, mels = _inputs()
    out, _ = T.forward_teacher_forced(p, cfg, inputs, lengths, mels, False, jax.random.PRNGKey(1))
    assert out.linear_outputs.shape == (B, T_OUT, 1025)


def test_anti_repeat_constraint_runs():
    cfg = _tiny_cfg(anti_repeat=True)
    p = T.init_tacotron(jax.random.PRNGKey(0), cfg)
    inputs, lengths, _ = _inputs()
    out = T.forward_inference(p, cfg, inputs, lengths, jax.random.PRNGKey(2), max_iters=8)
    assert np.isfinite(np.asarray(out.mel_outputs)).all()


def test_long_sentence_anti_repeat_window_discipline():
    """The reference's headline long-sentence mode (forward_attention.py
    README.md:77-83): at T_in=300 with anti_repeat the alignments must stay
    windowed (<=5 nonzero bins per step) and the attended position must
    advance monotonically — even with random weights."""
    cfg = _tiny_cfg(anti_repeat=True)
    p = T.init_tacotron(jax.random.PRNGKey(1), cfg)
    # keep decoding past random-init stop firings
    p["stop_projection"]["b"] = p["stop_projection"]["b"] - 12.0
    T_in = 300
    rng = np.random.RandomState(7)
    inputs = jnp.asarray(rng.randint(2, 100, size=(1, T_in)), jnp.int32)
    lengths = jnp.asarray([T_in], jnp.int32)
    out = T.forward_inference(p, cfg, inputs, lengths, jax.random.PRNGKey(3), max_iters=40)
    aligns = np.asarray(out.alignments[0])  # [40, 300]
    nz = (aligns > 1e-9).sum(-1)
    assert nz.max() <= 5, nz.max()
    arg = aligns.argmax(-1)
    assert np.all(np.diff(arg) >= 0), arg  # monotone under the constraint
    assert np.isfinite(np.asarray(out.mel_outputs)).all()


@pytest.mark.parametrize("r", [2, 3])
def test_outputs_per_step_r(r):
    """r>1 decoding (reference outputs_per_step): r mel frames per decoder
    step — the decoder-latency lever (steps/frame drops by r)."""
    cfg = _tiny_cfg(outputs_per_step=r, max_iters=10)
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg)
    B, T_in = 2, 8
    T_out = 6 * r  # divisible by r
    inputs = jnp.ones((B, T_in), jnp.int32)
    lens = jnp.full((B,), T_in, jnp.int32)
    mels = jax.random.normal(jax.random.PRNGKey(1), (B, T_out, 80))

    out, _ = T.forward_teacher_forced(
        params, cfg, inputs, lens, mels, True, jax.random.PRNGKey(2)
    )
    assert out.mel_outputs.shape == (B, T_out, 80)
    assert out.stop_logits.shape == (B, T_out)
    assert out.alignments.shape[1] == T_out // r  # one align per decoder step

    stops = jnp.zeros((B, T_out)).at[:, -1].set(1.0)
    loss, _ = T.tacotron_loss(
        out, mels, stops, jnp.full((B,), T_out, jnp.int32), params, cfg
    )
    assert np.isfinite(float(loss))

    inf = T.forward_inference(params, cfg, inputs, lens, jax.random.PRNGKey(3), 10)
    assert inf.mel_outputs.shape == (B, 10 * r, 80)
    # frame-exact, exclusive trim (reference tacotron_synthesize.py:105):
    # any frame index in [0, 10*r] is legal, not just step multiples
    assert 0 <= int(inf.stop_lengths[0]) <= 10 * r
