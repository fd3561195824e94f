"""Fused teacher-forced TRAINING decoder: interpret-mode value AND gradient
parity with the XLA scan path (ops/tacotron_trainer_kernel.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
from tacotronv2_wavernn_chinese_tpu.ops import tacotron_trainer_kernel as TK


@pytest.fixture(scope="module")
def setup():
    cfg = default_config().tacotron
    cfg = dataclasses.replace(
        cfg,
        embedding_dim=32, enc_conv_channels=32, enc_conv_layers=1,
        encoder_lstm_units=32, attention_dim=16, attention_filters=8,
        attention_kernel=7, prenet_layers=(32, 32), decoder_lstm_units=32,
        postnet_channels=32, postnet_layers=1,
        dropout_rate=0.5,  # prenet dropout is OUTSIDE the core: identical both paths
    )
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg)
    B, T_in = 3, 20  # B=3 < 8: single group
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.asarray([20, 13, 17], jnp.int32)
    mels = jax.random.normal(jax.random.PRNGKey(2), (B, 24, 80))
    return cfg, params, inputs, lens, mels


def _run(params, cfg, inputs, lens, mels, train, fused, rng, wgrads="accum"):
    return T.forward_teacher_forced(
        params, cfg, inputs, lens, mels, train, rng,
        fused_core=fused, fused_interpret=True, fused_dtype=jnp.float32,
        fused_wgrads=wgrads,
    )


def test_supported_gate():
    cfg = default_config().tacotron
    assert TK.train_supported(cfg)
    assert not TK.train_supported(dataclasses.replace(cfg, attention_mode="lsa"))
    assert not TK.train_supported(dataclasses.replace(cfg, smoothing=True))
    assert TK.train_supported(dataclasses.replace(cfg, outputs_per_step=3))


def test_auto_routing_batch_crossover(monkeypatch):
    """fused_decoder='auto' routes by the measured crossover: fused for
    B <= fused_auto_max_batch on TPU (1.50x at B=8), the XLA scan above
    (the scan wins at B=32)."""
    from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as TT
    from tacotronv2_wavernn_chinese_tpu.utils import is_tpu_backend  # noqa: F401

    monkeypatch.setattr(
        "tacotronv2_wavernn_chinese_tpu.utils.is_tpu_backend", lambda: True
    )
    cfg = default_config()

    def batch_of(b):
        return {"inputs": np.zeros((b, 64), np.int32)}

    assert TT._use_fused_decoder(cfg, batch_of(8), 1.0)
    assert TT._use_fused_decoder(cfg, batch_of(16), 1.0)
    assert not TT._use_fused_decoder(cfg, batch_of(32), 1.0)  # scan wins
    # "on" forces regardless of batch; "off" disables
    assert TT._use_fused_decoder(cfg.override("tacotron_train.fused_decoder=on"), batch_of(32), 1.0)
    assert not TT._use_fused_decoder(cfg.override("tacotron_train.fused_decoder=off"), batch_of(8), 1.0)
    # dynamic scheduled-sampling ratio falls back to the scan
    import jax.numpy as jnp2

    assert not TT._use_fused_decoder(cfg, batch_of(8), jnp2.float32(0.9))


@pytest.mark.parametrize("train", [True, False])
def test_value_parity(setup, train):
    """Teacher-forced forward through the fused core matches the XLA scan
    (train: zoneout mask streams are bit-identical by construction; eval:
    the EMA branch — the GTA bridge's mode)."""
    cfg, params, inputs, lens, mels = setup
    rng = jax.random.PRNGKey(7)
    ref, _ = _run(params, cfg, inputs, lens, mels, train, False, rng)
    fus, _ = _run(params, cfg, inputs, lens, mels, train, True, rng)
    np.testing.assert_allclose(
        np.asarray(ref.decoder_output), np.asarray(fus.decoder_output), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref.stop_logits), np.asarray(fus.stop_logits), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref.alignments), np.asarray(fus.alignments), atol=1e-5
    )


@pytest.mark.parametrize("wgrads", ["stream", "accum"])
def test_gradient_parity(setup, wgrads):
    """jax.grad through the fused core matches jax.grad through the XLA
    scan for EVERY parameter leaf — including the encoder (via
    d_keys/d_values), the combined location conv chain, and the prenet
    (via d_p) — in BOTH weight-gradient layouts: 'stream' (adjoints to
    HBM + outside einsums) and 'accum' (per-chunk in-kernel MXU
    reductions, the default)."""
    cfg, params, inputs, lens, mels = setup
    rng = jax.random.PRNGKey(11)

    def loss(p, fused):
        out, _ = _run(p, cfg, inputs, lens, mels, True, fused, rng, wgrads)
        return (
            jnp.mean(out.decoder_output**2)
            + jnp.mean(out.stop_logits**2) * 0.1
            + jnp.mean(out.alignments * jnp.arange(out.alignments.shape[-1]))
        )

    v_ref, g_ref = jax.value_and_grad(lambda p: loss(p, False))(params)
    v_fus, g_fus = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v_ref), float(v_fus), rtol=1e-5)

    flat_ref, tree = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_fus = jax.tree_util.tree_leaves(g_fus)
    assert len(flat_ref) == len(flat_fus)
    for (path, a), b in zip(flat_ref, flat_fus):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, atol=5e-4 * scale + 1e-7,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )


def test_gradient_parity_multi_group(setup):
    """B=10 > 8 exercises the sequential-group path; weight cotangents from
    the groups must sum correctly."""
    cfg, params, _, _, _ = setup
    B, T_in = 10, 16
    inputs = jnp.arange(B * T_in).reshape(B, T_in) % 50
    lens = jnp.full((B,), T_in, jnp.int32).at[1].set(9)
    mels = jax.random.normal(jax.random.PRNGKey(3), (B, 12, 80))
    rng = jax.random.PRNGKey(13)

    def loss(p, fused):
        out, _ = _run(p, cfg, inputs, lens, mels, True, fused, rng)
        return jnp.mean(out.decoder_output**2) + jnp.mean(out.stop_logits**2)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fus = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fus)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=5e-4 * scale + 1e-7)


def test_bf16_perf_mode_grad_smoke(setup):
    """The TPU perf configuration (bf16 weights, bf16 residual saves,
    bf16 in-kernel weight-grad accumulators) must stay a faithful
    gradient estimator: every leaf within a few percent of the f32 XLA
    gradient, relative to the leaf's scale."""
    cfg, params, inputs, lens, mels = setup
    rng = jax.random.PRNGKey(17)

    def loss(p, fused, dtype):
        out, _ = T.forward_teacher_forced(
            p, cfg, inputs, lens, mels, True, rng,
            fused_core=fused, fused_interpret=True, fused_dtype=dtype,
            fused_wgrads="accum",
        )
        return jnp.mean(out.decoder_output**2) + jnp.mean(out.stop_logits**2)

    g_ref = jax.grad(lambda p: loss(p, False, None))(params)
    g_fus = jax.grad(lambda p: loss(p, True, jnp.bfloat16))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fus)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=5e-2 * scale)


def test_value_parity_r2(setup):
    """outputs_per_step=2: the projections live outside the core, so r>1
    works through the fused path unchanged."""
    cfg, _, inputs, lens, _ = setup
    cfg_r = dataclasses.replace(cfg, outputs_per_step=2)
    params = T.init_tacotron(jax.random.PRNGKey(21), cfg_r)
    B = inputs.shape[0]
    mels = jax.random.normal(jax.random.PRNGKey(22), (B, 24, 80))
    rng = jax.random.PRNGKey(23)
    ref, _ = _run(params, cfg_r, inputs, lens, mels, True, False, rng)
    fus, _ = _run(params, cfg_r, inputs, lens, mels, True, True, rng)
    np.testing.assert_allclose(
        np.asarray(ref.decoder_output), np.asarray(fus.decoder_output), atol=2e-4
    )
