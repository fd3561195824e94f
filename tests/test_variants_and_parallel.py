"""MOL mode, deepmind WaveRNN variant, scheduled sampling, and
mesh-sharded fold generation."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import wavernn as W
from tacotronv2_wavernn_chinese_tpu.models import wavernn_deepmind as D
from tacotronv2_wavernn_chinese_tpu.ops import distribution as DIST
from tacotronv2_wavernn_chinese_tpu.parallel.mesh import make_mesh
from tacotronv2_wavernn_chinese_tpu.parallel.generate import (
    generate_distributed,
    generate_folds_sharded,
    pad_folds_to_multiple,
    xfade_and_unfold_sharded,
)


def tiny_wavernn(mode="RAW"):
    cfg = default_config()
    return dataclasses.replace(
        cfg.wavernn,
        mode=mode,
        upsample_factors=(2, 2, 5),
        rnn_dims=32,
        fc_dims=32,
        compute_dims=16,
        res_out_dims=16,
        res_blocks=2,
    )


# ---------------------------------------------------------------------------
# MOL
# ---------------------------------------------------------------------------


def test_mol_loss_matches_torch_reference():
    """Spot-check discretized MOL NLL against an independent direct-sum
    computation of the mixture CDF difference."""
    rng = np.random.RandomState(0)
    B, T, M = 2, 5, 3
    y_hat = jnp.asarray(rng.randn(B, T, 3 * M).astype(np.float32))
    y = jnp.asarray(rng.uniform(-0.9, 0.9, (B, T)).astype(np.float32))
    nll = DIST.discretized_mix_logistic_loss(y_hat, y, num_classes=65536, reduce=False)
    assert nll.shape == (B, T)
    assert np.isfinite(np.asarray(nll)).all()

    # independent check at one point: probability mass in the bin around y
    probs = np.asarray(jax.nn.softmax(y_hat[..., :M], axis=-1))
    means = np.asarray(y_hat[..., M : 2 * M])
    scales = np.exp(np.asarray(jnp.maximum(y_hat[..., 2 * M :], -32.0)))
    half = 1.0 / 65535
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))
    yv = np.asarray(y)[..., None]
    mass = probs * (sig((yv + half - means) / scales) - sig((yv - half - means) / scales))
    expected = -np.log(mass.sum(-1))
    # rtol accommodates the pdf-midpoint approximation branch the loss takes
    # for near-zero-mass bins (reference distribution.py:55-58)
    np.testing.assert_allclose(np.asarray(nll), expected, rtol=5e-3, atol=1e-4)


def test_mol_loss_edge_bins():
    M = 2
    y_hat = jnp.zeros((1, 3, 3 * M))
    y = jnp.asarray([[-1.0, 0.0, 1.0]])
    nll = DIST.discretized_mix_logistic_loss(y_hat, y, reduce=False)
    assert np.isfinite(np.asarray(nll)).all()


def test_mol_sampling_stats():
    """Samples should concentrate near the selected mixture mean."""
    M = 1
    B, T = 1, 4000
    mean, log_scale = 0.3, -4.0
    y_hat = jnp.concatenate(
        [jnp.zeros((B, T, M)), jnp.full((B, T, M), mean), jnp.full((B, T, M), log_scale)],
        axis=-1,
    )
    s = np.asarray(DIST.sample_from_discretized_mix_logistic(y_hat, jax.random.PRNGKey(0)))
    assert abs(s.mean() - mean) < 0.01
    assert s.std() < 0.2


def test_mol_wavernn_forward_and_generate():
    mcfg = tiny_wavernn("MOL")
    params = W.init_wavernn(jax.random.PRNGKey(0), mcfg, num_mels=80, bits=8)
    assert params["fc3"]["w"].shape[1] == 30  # 10 mixtures x 3
    B, sf = 2, 3
    hop = mcfg.total_upsample
    mels = jax.random.uniform(jax.random.PRNGKey(1), (B, sf + 2 * mcfg.pad, 80))
    x = jax.random.uniform(jax.random.PRNGKey(2), (B, sf * hop), minval=-1, maxval=1)
    logits, _ = W.forward(params, mcfg, x, mels, train=True)
    loss = W.wavernn_loss(logits, x, mode="MOL")
    assert np.isfinite(float(loss))
    wav = W.generate_scan(params, mcfg, mels, jax.random.PRNGKey(3), bits=8)
    assert wav.shape == (B, sf * hop)
    assert np.abs(np.asarray(wav)).max() <= 1.0


# ---------------------------------------------------------------------------
# deepmind variant
# ---------------------------------------------------------------------------


def test_deepmind_split_combine_roundtrip():
    x = jnp.asarray(np.linspace(-1, 1, 100, dtype=np.float32))
    c, f = D.split_signal_16bit(x)
    assert float(c.min()) >= 0 and float(c.max()) <= 255
    assert float(f.min()) >= 0 and float(f.max()) < 256
    np.testing.assert_allclose(np.asarray(D.combine_signal(c, f)), np.asarray(x), atol=1e-4)


def test_deepmind_train_and_generate():
    params = D.init_deepmind_wavernn(jax.random.PRNGKey(0), hidden=64)
    B, T = 2, 12
    rng = np.random.RandomState(0)
    coarse = jnp.asarray(rng.randint(0, 256, (B, T + 1)).astype(np.float32))
    fine = jnp.asarray(rng.randint(0, 256, (B, T + 1)).astype(np.float32))
    loss = D.loss(params, coarse, fine)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: D.loss(p, coarse, fine))(params)
    leaves = [np.abs(np.asarray(x)).sum() for x in jax.tree_util.tree_leaves(g) if hasattr(x, "shape")]
    assert sum(leaves) > 0

    wav = D.generate(params, 50, jax.random.PRNGKey(1), batch=2)
    assert wav.shape == (2, 50)
    assert np.abs(np.asarray(wav)).max() <= 1.0 + 1e-5


def test_deepmind_generate_matches_forward():
    """The generation half-matmul trick must agree with the full forward:
    teacher-force the generated streams and check hidden-state evolution via
    logits equality at step 0 (zero history)."""
    params = D.init_deepmind_wavernn(jax.random.PRNGKey(0), hidden=32)
    B = 1
    h = jnp.zeros((B, 32))
    oc, of, h1 = D.forward(params, jnp.zeros((B,)), jnp.zeros((B,)), jnp.zeros((B,)), h)
    assert oc.shape == (B, 256) and of.shape == (B, 256)
    assert np.isfinite(np.asarray(h1)).all()


# ---------------------------------------------------------------------------
# scheduled sampling
# ---------------------------------------------------------------------------


def test_teacher_forcing_schedule():
    from tacotronv2_wavernn_chinese_tpu.train.tacotron_task import teacher_forcing_schedule

    cfg = default_config()
    assert float(teacher_forcing_schedule(cfg, jnp.asarray(0))) == 1.0
    # final-ratio mode (reference default final=0.3: decay floor = final/init)
    sched = cfg.override(
        "tacotron_train.teacher_forcing_mode=scheduled,"
        "tacotron_train.teacher_forcing_start_decay=100,"
        "tacotron_train.teacher_forcing_decay_steps=1000"
    )
    r0 = float(teacher_forcing_schedule(sched, jnp.asarray(0)))
    r_mid = float(teacher_forcing_schedule(sched, jnp.asarray(600)))
    r_end = float(teacher_forcing_schedule(sched, jnp.asarray(5000)))
    assert r0 == pytest.approx(1.0)
    assert 0.3 < r_mid < 1.0
    assert r_end == pytest.approx(0.3, abs=1e-6)
    # tf.train.cosine_decay closed form at the midpoint of the decay window
    frac = 0.5
    expect_mid = 1.0 * ((1 - 0.3) * 0.5 * (1 + math.cos(math.pi * frac)) + 0.3)
    assert float(teacher_forcing_schedule(sched, jnp.asarray(600))) == pytest.approx(
        expect_mid, abs=1e-6
    )
    # alpha mode (final_ratio=None + decay_alpha: floor = alpha * init)
    alpha_cfg = dataclasses.replace(
        sched,
        tacotron_train=dataclasses.replace(
            sched.tacotron_train,
            teacher_forcing_final_ratio=None,
            teacher_forcing_decay_alpha=0.25,
            teacher_forcing_init_ratio=0.8,
        ),
    )
    assert float(teacher_forcing_schedule(alpha_cfg, jnp.asarray(5000))) == pytest.approx(
        0.8 * 0.25, abs=1e-6
    )


def test_scheduled_sampling_changes_decode():
    from tacotronv2_wavernn_chinese_tpu.models import tacotron as T

    cfg = default_config().tacotron
    cfg = dataclasses.replace(
        cfg, embedding_dim=16, enc_conv_channels=16, enc_conv_layers=1,
        encoder_lstm_units=16, attention_dim=8, attention_filters=4,
        attention_kernel=5, prenet_layers=(16,), decoder_lstm_units=16,
        postnet_channels=16, postnet_layers=1,
    )
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg)
    B, T_in, T_out = 2, 6, 12
    inputs = jnp.ones((B, T_in), jnp.int32)
    lens = jnp.full((B,), T_in, jnp.int32)
    mels = jax.random.normal(jax.random.PRNGKey(1), (B, T_out, 80))
    full, _ = T.forward_teacher_forced(params, cfg, inputs, lens, mels, False,
                                       jax.random.PRNGKey(2), teacher_forcing_ratio=1.0)
    none, _ = T.forward_teacher_forced(params, cfg, inputs, lens, mels, False,
                                       jax.random.PRNGKey(2), teacher_forcing_ratio=0.0)
    assert not np.allclose(np.asarray(full.decoder_output), np.asarray(none.decoder_output))


# ---------------------------------------------------------------------------
# mesh-sharded generation
# ---------------------------------------------------------------------------


def test_pad_folds_to_multiple():
    folds = np.random.rand(5, 4, 3).astype(np.float32)
    padded, orig = pad_folds_to_multiple(folds, 8)
    assert padded.shape[0] == 8 and orig == 5
    np.testing.assert_array_equal(padded[:5], folds)


def test_generate_folds_sharded_matches_single_device():
    mcfg = tiny_wavernn()
    params = W.init_wavernn(jax.random.PRNGKey(0), mcfg, num_mels=80, bits=8)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    folds = jax.random.uniform(jax.random.PRNGKey(1), (8, 7, 80))
    rng = jax.random.PRNGKey(2)
    out = generate_folds_sharded(params, mcfg, mesh, folds, rng, bits=8)
    T = (7 - 2 * mcfg.pad) * mcfg.total_upsample
    assert out.shape == (8, T)
    # per-shard noise decorrelation: fold 0 on shard 0 == single-device result
    # with the same folded-in key
    single = W.generate_scan(
        params, mcfg, folds[0:1], jax.random.fold_in(rng, 0), 8, True
    )
    np.testing.assert_allclose(np.asarray(out[0:1]), np.asarray(single), atol=1e-5)


def test_generate_distributed_end_to_end():
    mcfg = tiny_wavernn()
    cfg = default_config()
    gen_cfg = dataclasses.replace(cfg.wavernn_gen, target=100, overlap=20)
    params = W.init_wavernn(jax.random.PRNGKey(0), mcfg, num_mels=80, bits=8)
    mesh = make_mesh()
    mel = np.random.RandomState(0).rand(60, 80).astype(np.float32)
    wav = generate_distributed(params, mcfg, gen_cfg, mesh, mel, jax.random.PRNGKey(1), bits=8)
    assert wav.shape == (60 * mcfg.total_upsample,)
    assert np.isfinite(wav).all()


def test_xfade_sharded_matches_host():
    """On-device ppermute crossfade == host xfade_and_unfold, including
    zeroing of bucketing pads past n_folds."""
    mesh = make_mesh()
    overlap, target = 40, 120
    L = target + 2 * overlap
    n_folds, B = 13, 16  # 3 pad folds spill onto the last shards
    y = np.random.RandomState(0).randn(B, L).astype(np.float32)
    got = xfade_and_unfold_sharded(jnp.asarray(y), overlap, n_folds, mesh)
    ref = W.xfade_and_unfold(y[:n_folds], overlap)
    assert got.shape == (B * (target + overlap) + overlap,)
    np.testing.assert_allclose(got[: ref.shape[0]], ref, atol=1e-5)
    # everything past the real folds' span must be silence
    np.testing.assert_array_equal(got[ref.shape[0] :], 0.0)


def test_xfade_sharded_no_pads_final_tail():
    """Without bucketing pads the global final tail comes from the last
    shard's ppermute output row."""
    mesh = make_mesh()
    overlap, target = 20, 60
    L = target + 2 * overlap
    B = 8
    y = np.random.RandomState(1).randn(B, L).astype(np.float32)
    got = xfade_and_unfold_sharded(jnp.asarray(y), overlap, B, mesh)
    ref = W.xfade_and_unfold(y, overlap)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_generate_distributed_device_crossfade_matches_host_path():
    mcfg = tiny_wavernn()
    cfg = default_config()
    gen_cfg = dataclasses.replace(cfg.wavernn_gen, target=100, overlap=20)
    params = W.init_wavernn(jax.random.PRNGKey(0), mcfg, num_mels=80, bits=8)
    mesh = make_mesh()
    mel = np.random.RandomState(0).rand(60, 80).astype(np.float32)
    a = generate_distributed(params, mcfg, gen_cfg, mesh, mel,
                             jax.random.PRNGKey(1), bits=8, device_crossfade=True)
    b = generate_distributed(params, mcfg, gen_cfg, mesh, mel,
                             jax.random.PRNGKey(1), bits=8, device_crossfade=False)
    assert a.shape == b.shape == (60 * mcfg.total_upsample,)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_generate_batch_multi_utterance():
    """Multi-utterance fused vocoding: one kernel call, per-utterance unfold."""
    mcfg = tiny_wavernn()
    cfg = default_config()
    gen_cfg = dataclasses.replace(cfg.wavernn_gen, target=100, overlap=20)
    params = W.init_wavernn(jax.random.PRNGKey(0), mcfg, num_mels=80, bits=8)
    rs = np.random.RandomState(0)
    mels = [rs.rand(40, 80).astype(np.float32), rs.rand(25, 80).astype(np.float32)]
    wavs = W.generate_batch(params, mcfg, gen_cfg, mels, jax.random.PRNGKey(1), bits=8)
    assert len(wavs) == 2
    assert wavs[0].shape == (40 * mcfg.total_upsample,)
    assert wavs[1].shape == (25 * mcfg.total_upsample,)
    for w in wavs:
        assert np.isfinite(w).all() and np.abs(w).max() <= 1.0 + 1e-6
