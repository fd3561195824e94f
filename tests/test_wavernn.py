"""WaveRNN vocoder tests: GRU parity vs torch, shapes, fold/unfold,
generation consistency, and training convergence on a tiny config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import layers as L
from tacotronv2_wavernn_chinese_tpu.models import wavernn as W


def tiny_config():
    """Small model + short hop so CPU scans stay fast."""
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        wavernn=dataclasses.replace(
            cfg.wavernn,
            upsample_factors=(2, 2, 5),  # hop 20
            rnn_dims=32,
            fc_dims=32,
            compute_dims=16,
            res_out_dims=16,
            res_blocks=2,
            pad=2,
        ),
        audio=dataclasses.replace(cfg.audio, hop_size=20, bits=8),
        wavernn_gen=dataclasses.replace(cfg.wavernn_gen, target=100, overlap=20),
    )
    return cfg


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


@pytest.fixture(scope="module")
def params(cfg):
    return W.init_wavernn(jax.random.PRNGKey(0), cfg.wavernn, num_mels=80, bits=cfg.audio.bits)


def test_gru_matches_torch():
    """Our GRU cell must match torch.nn.GRUCell (the reference's recurrence,
    fatchord_version.py:117-118)."""
    torch = pytest.importorskip("torch")
    H, D, B = 16, 8, 3
    p = L.gru_init(jax.random.PRNGKey(1), D, H)
    cell = torch.nn.GRUCell(D, H)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(np.asarray(p["wi"]).T))
        cell.weight_hh.copy_(torch.from_numpy(np.asarray(p["wh"]).T))
        cell.bias_ih.copy_(torch.from_numpy(np.asarray(p["bi"])))
        cell.bias_hh.copy_(torch.from_numpy(np.asarray(p["bh"])))
    x = np.random.RandomState(0).randn(B, D).astype(np.float32)
    h = np.random.RandomState(1).randn(B, H).astype(np.float32)
    ours = L.gru_step(p, jnp.asarray(x), jnp.asarray(h))
    theirs = cell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_gru_precomputed_scan_matches_plain(cfg, params):
    p = params["gru1"]
    B, T, H = 2, 7, cfg.wavernn.rnn_dims
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, H))
    plain = L.gru_scan(p, x)
    gi = x @ p["wi"] + p["bi"]
    pre = W._gru_scan_precomputed(p, gi)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(pre), atol=1e-6)


def test_upsample_shapes(cfg, params):
    B, T_mel, M = 2, 11, 80
    mels = jax.random.uniform(jax.random.PRNGKey(3), (B, T_mel, M))
    mels_up, aux, _ = W.upsample(params, cfg.wavernn, mels, train=False)
    T = (T_mel - 2 * cfg.wavernn.pad) * cfg.wavernn.total_upsample
    assert mels_up.shape == (B, T, M)
    assert aux.shape == (B, T, cfg.wavernn.res_out_dims)


def test_forward_shapes_and_grads(cfg, params):
    B = 2
    hop = cfg.wavernn.total_upsample
    seq_frames = 3
    T = seq_frames * hop
    mels = jax.random.uniform(jax.random.PRNGKey(4), (B, seq_frames + 2 * cfg.wavernn.pad, 80))
    x = jax.random.uniform(jax.random.PRNGKey(5), (B, T), minval=-1.0, maxval=1.0)
    logits, _ = W.forward(params, cfg.wavernn, x, mels, train=True)
    assert logits.shape == (B, T, 2 ** cfg.audio.bits)

    y = jax.random.randint(jax.random.PRNGKey(6), (B, T), 0, 2 ** cfg.audio.bits)

    def loss(p):
        lg, _ = W.forward(p, cfg.wavernn, x, mels, train=True)
        return W.wavernn_loss(lg, y)

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(a).sum()) for a in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms))
    assert sum(norms) > 0


def test_forward_matches_stepwise_generation_path(cfg, params):
    """The bulk teacher-forced forward and the per-step generation math must
    agree: feeding generation's own sampled outputs as teacher-forced inputs
    reproduces the same logits trajectory (eval mode, no BN drift)."""
    B, seq_frames = 1, 3
    hop = cfg.wavernn.total_upsample
    pad = cfg.wavernn.pad
    mels = jax.random.uniform(jax.random.PRNGKey(7), (B, seq_frames + 2 * pad, 80))
    T = seq_frames * hop
    n_classes = 2 ** cfg.audio.bits

    # generation with recorded samples
    rng = jax.random.PRNGKey(8)
    wav = W.generate_scan(params, cfg.wavernn, mels, rng, bits=cfg.audio.bits, apply_mu_law=False)
    assert wav.shape == (B, T)

    # teacher-forced pass on the shifted sample stream
    samples = np.round(np.asarray((wav + 1.0) * (n_classes - 1) / 2.0))
    x = np.concatenate([np.zeros((B, 1), np.float32), (2 * samples[:, :-1] / (n_classes - 1) - 1)], axis=1)
    logits, _ = W.forward(params, cfg.wavernn, jnp.asarray(x), mels, train=False)
    assert logits.shape == (B, T, n_classes)
    # greedy argmax of teacher-forced logits under the same gumbel draw ==
    # the generated samples (verify at least strong agreement of argmax path)
    keys = jax.random.split(rng, T)
    g = jnp.stack([jax.random.gumbel(k, (B, n_classes)) for k in keys])  # [T,B,C]
    resampled = jnp.argmax(jax.nn.log_softmax(logits) + jnp.swapaxes(g, 0, 1), axis=-1)
    np.testing.assert_array_equal(np.asarray(resampled[0]), samples[0].astype(np.int64))


def test_fold_and_unfold_lengths():
    target, overlap = 100, 20
    T = 437
    x = np.random.RandomState(0).rand(T, 3).astype(np.float32)
    folds, n = W.fold_with_overlap(x, target, overlap)
    assert folds.shape[1] == target + 2 * overlap
    wav_folds = np.ones((n, target + 2 * overlap), np.float32)
    out = W.xfade_and_unfold(wav_folds, overlap)
    assert out.shape[0] == n * (target + overlap) + overlap
    # interior of each fold passes through untouched
    assert np.allclose(out[overlap : target + overlap], 1.0)


def test_xfade_unit_gain_across_boundaries():
    # A constant-1 signal must come back ~1 EVERYWHERE between the initial
    # silent warmup and the final fade tail — in particular through every
    # fold boundary (regression: a [fade_out, zeros] tail envelope notched
    # the summed gain to ~0 at each boundary). Reference keeps gain 1 during
    # the next fold's warmup then equal-power crossfades.
    for target, overlap in [(100, 20), (96, 17), (200, 50)]:
        n = 4
        folds = np.ones((n, target + 2 * overlap), np.float32)
        out = W.xfade_and_unfold(folds, overlap)
        silence_len = overlap // 2
        # valid span: after the first fold's silent head, before the last tail
        valid = out[silence_len + (overlap - silence_len) : -(overlap)]
        # equal-power fades: amplitude sum stays in [1, sqrt(2)] — never a
        # notch below unity, and exactly 1 in fold interiors
        assert valid.min() >= 1.0 - 1e-6, (target, overlap, float(valid.min()))
        assert valid.max() <= np.sqrt(2.0) + 1e-6
        assert np.allclose(out[overlap : target + overlap], 1.0)


def test_fold_preserves_content():
    target, overlap = 100, 20
    x = np.arange(500, dtype=np.float32)[:, None]
    folds, n = W.fold_with_overlap(x, target, overlap)
    for i in range(n):
        start = i * (target + overlap)
        want = x[start : start + target + 2 * overlap, 0]
        np.testing.assert_array_equal(folds[i, : len(want), 0], want)


def test_generate_end_to_end(cfg, params):
    T_mel = 30
    mel = np.random.RandomState(0).rand(T_mel, 80).astype(np.float32)
    wav = W.generate(
        params, cfg.wavernn, cfg.wavernn_gen, mel, jax.random.PRNGKey(9), bits=cfg.audio.bits
    )
    assert wav.shape == (T_mel * cfg.wavernn.total_upsample,)
    assert np.all(np.abs(wav) <= 1.0 + 1e-6)
    # unbatched path agrees in shape
    gen_cfg = dataclasses.replace(cfg.wavernn_gen, batched=False)
    wav2 = W.generate(params, cfg.wavernn, gen_cfg, mel, jax.random.PRNGKey(9), bits=cfg.audio.bits)
    assert wav2.shape == wav.shape


def test_generate_batch_honors_unbatched(cfg, params):
    """generate_batch with batched=False must skip fold/crossfade: each
    utterance runs as ONE whole fold and is trimmed to its own length."""
    hop = cfg.wavernn.total_upsample
    rs = np.random.RandomState(1)
    mels = [rs.rand(27, 80).astype(np.float32), rs.rand(40, 80).astype(np.float32)]

    calls = {}

    def fake_gen(params, mcfg, folds, rng, bits, apply_mu_law):
        # deterministic "wav": repeat each (trimmed) conditioning frame's
        # mean over the hop — lets us detect any crossfade rescaling
        calls["shape"] = tuple(folds.shape)
        cond = jnp.mean(folds[:, mcfg.pad : folds.shape[1] - mcfg.pad, :], axis=-1)
        return jnp.repeat(cond, hop, axis=-1)

    gen_cfg = dataclasses.replace(cfg.wavernn_gen, batched=False)
    out = W.generate_batch(
        params, cfg.wavernn, gen_cfg, mels, jax.random.PRNGKey(0),
        bits=cfg.audio.bits, generate_fn=fake_gen,
    )
    assert len(out) == 2
    # one whole fold per utterance (bucketed up to 8 rows), no folding
    assert calls["shape"][0] == 8
    fade = 20 * hop
    for mel, wav in zip(mels, out):
        assert wav.shape == (mel.shape[0] * hop,)
        expect = np.repeat(mel.mean(axis=-1), hop)[: wav.shape[0]]
        # everything before the fade-out tail is the raw fold output —
        # no equal-power crossfade gain anywhere
        np.testing.assert_allclose(wav[:-fade], expect[:-fade], atol=1e-5)


def test_train_step_decreases_loss(cfg):
    from tacotronv2_wavernn_chinese_tpu.train import wavernn_task as WT

    state = WT.init_state(jax.random.PRNGKey(0), cfg)
    B, seq_frames = 4, 3
    hop = cfg.wavernn.total_upsample
    T = seq_frames * hop
    rs = np.random.RandomState(0)
    batch = {
        "x": jnp.asarray(rs.uniform(-1, 1, (B, T)).astype(np.float32)),
        "y": jnp.asarray(rs.randint(0, 2 ** cfg.audio.bits, (B, T)).astype(np.int32)),
        "mels": jnp.asarray(rs.rand(B, seq_frames + 2 * cfg.wavernn.pad, 80).astype(np.float32)),
    }
    state, m0 = WT.train_step(state, batch, cfg)
    for _ in range(10):
        state, m = WT.train_step(state, batch, cfg)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 11


def test_mu_law_expand_matches_dsp():
    from tacotronv2_wavernn_chinese_tpu.dsp import mulaw

    bits = 8
    labels = jnp.arange(0, 2 ** bits)
    ours = W.mu_law_expand(labels, bits)
    ref = mulaw.decode_mu_law(np.arange(0, 2 ** bits), mu=2 ** bits, from_labels=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_num_params_full_size():
    """Full-size model parameter count is in the expected ~4-5M range
    (reference num_params printout, fatchord_version.py:425-430)."""
    cfg = default_config()
    p = W.init_wavernn(jax.random.PRNGKey(0), cfg.wavernn, 80, cfg.audio.bits)
    n = W.num_params(p)
    assert 4_000_000 < n < 6_000_000


def test_fold_degenerate_short_input():
    """Inputs shorter than one fold (even shorter than the overlap) must
    still produce one zero-padded fold instead of crashing np.stack."""
    for T in (1, 2, 10):
        x = np.ones((T, 3), np.float32)
        folds, n = W.fold_with_overlap(x, target=100, overlap=20)
        assert n == 1 and folds.shape == (1, 140, 3)
        np.testing.assert_array_equal(folds[0, :T], x)


def test_generate_degenerate_short_mel(cfg, params):
    """A 1-frame mel (e.g. instant stop-token fire) must vocode cleanly."""
    mel = np.random.RandomState(0).rand(3, 80).astype(np.float32)
    wav = W.generate(params, cfg.wavernn, cfg.wavernn_gen, mel,
                     jax.random.PRNGKey(0), bits=cfg.audio.bits)
    assert wav.shape == (3 * cfg.wavernn.total_upsample,)
    assert np.isfinite(wav).all()
