"""Data pipeline + training-step tests, incl. 8-device DP mesh."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.io import wavfile

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.data.loader import TacotronDataset
from tacotronv2_wavernn_chinese_tpu.data.preprocess import (
    parse_biaobei,
    process_corpus,
    read_metadata,
    write_metadata,
)
from tacotronv2_wavernn_chinese_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as task

CFG = default_config().override(
    "tacotron_train.batch_size=2,tacotron_train.batches_per_group=2"
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Tiny synthetic Biaobei-style corpus: 6 utterances of tone bursts."""
    root = tmp_path_factory.mktemp("biaobei")
    wav_dir = root / "Wave"
    wav_dir.mkdir()
    sr = CFG.audio.sample_rate
    texts = ["你好。", "晚上好。", "谢谢你们。", "早上好。", "大家好。", "很高兴见到你。"]
    lines = []
    rng = np.random.RandomState(0)
    for i, text in enumerate(texts, start=1):
        idx = f"{i:06d}"
        n = sr // 2 + i * 1000
        t = np.arange(n) / sr
        sig = 0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t) + 0.01 * rng.randn(n)
        wavfile.write(str(wav_dir / f"{idx}.wav"), sr, (sig * 32767 * 0.6).astype(np.int16))
        lines.append(f"{idx}\t{text}")
        lines.append("\tfake pinyin line")
    (root / "000001-010000.txt").write_text("\n".join(lines), encoding="utf-8")
    return root


@pytest.fixture(scope="module")
def training_data(corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("training_data")
    rows = process_corpus(
        CFG, str(corpus / "000001-010000.txt"), str(corpus / "Wave"), str(out), bucket_batch=4
    )
    write_metadata(rows, str(out / "train.txt"))
    return out


def test_parse_biaobei(corpus):
    utts = parse_biaobei(str(corpus / "000001-010000.txt"), str(corpus / "Wave"))
    assert len(utts) == 6
    assert utts[0].pyin == "n i3 h ao3 。"


def test_process_corpus(training_data):
    rows = read_metadata(str(training_data / "train.txt"))
    assert len(rows) == 6
    for r in rows:
        audio = np.load(training_data / r[0])
        mel = np.load(training_data / r[1])
        assert int(r[2]) == len(audio)
        assert int(r[3]) == mel.shape[0]
        # time-resolution contract: audio length = frames * hop
        assert len(audio) == mel.shape[0] * CFG.audio.hop_size
        assert mel.shape[1] == 80
        assert -4.0 - 1e-5 <= mel.min() and mel.max() <= 4.0 + 1e-5


def test_loader_batches(training_data):
    ds = TacotronDataset(read_metadata(str(training_data / "train.txt")), str(training_data), CFG)
    batches = list(ds.batches(epoch_seed=0))
    assert len(batches) == 3
    b = batches[0]
    assert b.inputs.shape[0] == 2
    assert b.inputs.shape[1] % CFG.tacotron_train.input_pad_multiple == 0
    assert b.mel_targets.shape[1] % CFG.tacotron_train.mel_pad_multiple == 0
    assert b.mel_targets.shape[2] == 80
    # stop targets: 0 before len-1, 1 from len-1 on
    i = 0
    L = int(b.target_lengths[i])
    assert b.stop_targets[i, L - 2] == 0.0
    assert b.stop_targets[i, L - 1] == 1.0
    assert (b.stop_targets[i, L:] == 1.0).all()
    # mel padding value
    assert np.allclose(b.mel_targets[i, L:], -4.0)


def test_batch_shapes_enumerates_real_stream(training_data):
    """batch_shapes (metadata-only replay) must cover EXACTLY the padded
    shapes the real batch stream produces — it's what the training driver
    pre-compiles, so a miss would reintroduce the mid-training compile
    tail and an over-enumeration would waste warm compiles."""
    ds = TacotronDataset(read_metadata(str(training_data / "train.txt")), str(training_data), CFG)
    seeds = [CFG.tacotron_train.data_seed + e for e in range(3)]
    predicted = set(ds.batch_shapes(seeds))
    actual = set()
    for s in seeds:
        for b in ds.batches(epoch_seed=s):
            actual.add((b.inputs.shape[1], b.mel_targets.shape[1]))
    assert actual == predicted, (actual, predicted)


def test_prewarm_survives_transient_compile_failure(training_data, monkeypatch):
    """A transient remote-compile crash during bucket pre-warm must never
    kill the training run: the driver retries once, then skips the shape
    (lazy compile).  Regression: a 'response body closed' helper crash on
    the 7th shape aborted a full training launch."""
    from tacotronv2_wavernn_chinese_tpu.train import tacotron_train as tt

    cfg = CFG
    ds = TacotronDataset(read_metadata(str(training_data / "train.txt")), str(training_data), cfg)
    state = task.init_state(jax.random.PRNGKey(0), cfg)
    real_train_step = task.train_step
    calls = {"n": 0}

    def flaky_train_step(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:  # first shape, first attempt: transient crash
            raise RuntimeError("remote_compile: response body closed")
        return real_train_step(*a, **kw)

    monkeypatch.setattr(task, "train_step", flaky_train_step)
    logs = []
    tt._prewarm_bucket_shapes(cfg, ds, state, None, 1, 4, 0, logs.append)
    text = "\n".join(logs)
    assert "retrying" in text, text
    assert "skipping" not in text, text  # retry succeeded; nothing dropped

    # persistent failure on every attempt: all shapes skipped, still no raise
    monkeypatch.setattr(
        task, "train_step",
        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("still down")),
    )
    logs2 = []
    tt._prewarm_bucket_shapes(cfg, ds, state, None, 1, 4, 0, logs2.append)
    assert "skipping" in "\n".join(logs2), logs2


def test_train_step_decreases_loss(training_data):
    cfg = CFG
    ds = TacotronDataset(read_metadata(str(training_data / "train.txt")), str(training_data), cfg)
    batch = next(ds.batches(epoch_seed=0))
    arrays = {
        "inputs": jnp.asarray(batch.inputs),
        "input_lengths": jnp.asarray(batch.input_lengths),
        "mel_targets": jnp.asarray(batch.mel_targets),
        "stop_targets": jnp.asarray(batch.stop_targets),
        "target_lengths": jnp.asarray(batch.target_lengths),
    }
    state = task.init_state(jax.random.PRNGKey(0), cfg)
    losses = []
    for i in range(8):
        state, metrics = task.train_step(state, arrays, jax.random.PRNGKey(i), cfg)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_bucket_padding_excluded_from_loss(training_data):
    """Shape-bucketing pad frames (beyond the batch max rounded to r — the
    length the REFERENCE pads to, feeder.py:49-57) must not dilute the
    unmasked loss: the loss on a 64-frame-bucketed batch must equal the loss
    on the same batch trimmed to the reference length."""
    cfg = CFG.override("tacotron.dropout_rate=0")  # rng-independent decode
    ds = TacotronDataset(read_metadata(str(training_data / "train.txt")), str(training_data), cfg)
    batch = next(ds.batches(epoch_seed=0))
    ref_T = int(batch.loss_frames[0])
    assert batch.mel_targets.shape[1] > ref_T, "fixture must exercise bucket padding"

    def arrays(trim):
        T = ref_T if trim else batch.mel_targets.shape[1]
        d = {
            "inputs": jnp.asarray(batch.inputs),
            "input_lengths": jnp.asarray(batch.input_lengths),
            "mel_targets": jnp.asarray(batch.mel_targets[:, :T]),
            "stop_targets": jnp.asarray(batch.stop_targets[:, :T]),
            "target_lengths": jnp.asarray(batch.target_lengths),
        }
        if not trim:
            d["loss_frames"] = jnp.asarray(batch.loss_frames)
        return d

    params = task.init_state(jax.random.PRNGKey(0), cfg).params
    loss_bucketed, (aux_b, _, _) = task.loss_fn(params, cfg, arrays(False), jax.random.PRNGKey(1), train=False)
    loss_ref, (aux_r, _, _) = task.loss_fn(params, cfg, arrays(True), jax.random.PRNGKey(1), train=False)
    # pre-postnet and stop streams are bit-exact in the prefix; the postnet's
    # +/-10-frame receptive field sees the bucket-pad decoder frames near the
    # boundary, leaving a small residual on "after" (documented in loader.py)
    np.testing.assert_allclose(float(aux_b["before"]), float(aux_r["before"]), rtol=2e-5)
    np.testing.assert_allclose(float(aux_b["stop"]), float(aux_r["stop"]), rtol=2e-5)
    np.testing.assert_allclose(float(aux_b["after"]), float(aux_r["after"]), rtol=5e-3)


def test_scale_regularization_rescales_l2(training_data):
    """tacotron_train.scale_regularization must rescale the L2 weight by
    1/(2*max_abs_value) for symmetric mels (reference tacotron.py:237-241)."""
    ds = TacotronDataset(read_metadata(str(training_data / "train.txt")), str(training_data), CFG)
    batch = next(ds.batches(epoch_seed=0))
    arrays = {
        "inputs": jnp.asarray(batch.inputs),
        "input_lengths": jnp.asarray(batch.input_lengths),
        "mel_targets": jnp.asarray(batch.mel_targets),
        "stop_targets": jnp.asarray(batch.stop_targets),
        "target_lengths": jnp.asarray(batch.target_lengths),
    }
    params = task.init_state(jax.random.PRNGKey(0), CFG).params
    cfg_on = CFG.override("tacotron_train.scale_regularization=true")
    _, (aux_off, _, _) = task.loss_fn(params, CFG, arrays, jax.random.PRNGKey(1), train=False)
    _, (aux_on, _, _) = task.loss_fn(params, cfg_on, arrays, jax.random.PRNGKey(1), train=False)
    scaler = 1.0 / (2.0 * CFG.audio.max_abs_value)  # 0.125 at the default +/-4
    np.testing.assert_allclose(float(aux_on["reg"]), float(aux_off["reg"]) * scaler, rtol=1e-6)


def test_lr_schedule():
    lr = task.lr_schedule(CFG)
    assert float(lr(jnp.asarray(0))) == pytest.approx(1e-3)
    assert float(lr(jnp.asarray(66000))) == pytest.approx(1e-3)
    assert float(lr(jnp.asarray(86000))) == pytest.approx(5e-4)
    assert float(lr(jnp.asarray(10_000_000))) == pytest.approx(1e-5)


def test_tf1_adam_matches_tf_semantics():
    """tf1_adam must reproduce tf.train.AdamOptimizer exactly:
    update = lr*sqrt(1-b2^t)/(1-b1^t) * m/(sqrt(v)+eps), eps OUTSIDE the
    bias correction (unlike optax.adam / torch)."""
    import optax

    b1, b2, eps, lr = 0.9, 0.999, 1e-6, 1e-3
    opt = task.tf1_adam(lr, b1=b1, b2=b2, eps=eps)
    params = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    state = opt.init(params)

    rng = np.random.RandomState(0)
    m = np.zeros(3)
    v = np.zeros(3)
    theta = np.asarray([1.0, -2.0, 3.0])
    for t in range(1, 6):
        g = rng.randn(3).astype(np.float32)
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        # numpy TF1 reference
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        theta = theta - lr_t * m / (np.sqrt(v) + eps)
        np.testing.assert_allclose(np.asarray(params["w"]), theta, rtol=1e-6)

    # and it differs from optax.adam at step 1 (the eps placement matters
    # when v is tiny): gradient ~eps-scale makes the difference visible
    opt2 = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    s2 = opt2.init({"w": jnp.asarray([0.0])})
    u_optax, _ = opt2.update({"w": jnp.asarray([1e-4])}, s2, {"w": jnp.asarray([0.0])})
    s1 = task.tf1_adam(lr, b1=b1, b2=b2, eps=eps).init({"w": jnp.asarray([0.0])})
    u_tf1, _ = task.tf1_adam(lr, b1=b1, b2=b2, eps=eps).update(
        {"w": jnp.asarray([1e-4])}, s1, {"w": jnp.asarray([0.0])}
    )
    assert not np.allclose(np.asarray(u_optax["w"]), np.asarray(u_tf1["w"]), rtol=1e-3)


def test_finetune_freezes_encoder(training_data):
    cfg = CFG.override("tacotron_train.fine_tune=true")
    ds = TacotronDataset(read_metadata(str(training_data / "train.txt")), str(training_data), cfg)
    batch = next(ds.batches(epoch_seed=0))
    arrays = {
        "inputs": jnp.asarray(batch.inputs),
        "input_lengths": jnp.asarray(batch.input_lengths),
        "mel_targets": jnp.asarray(batch.mel_targets),
        "stop_targets": jnp.asarray(batch.stop_targets),
        "target_lengths": jnp.asarray(batch.target_lengths),
    }
    state = task.init_state(jax.random.PRNGKey(0), cfg)
    emb0 = np.asarray(state.params["embedding"])
    enc0 = np.asarray(state.params["enc_lstm_fw"]["w"])
    pre0 = np.asarray(state.params["prenet"]["layers"][0]["w"])
    state, _ = task.train_step(state, arrays, jax.random.PRNGKey(0), cfg)
    np.testing.assert_array_equal(np.asarray(state.params["embedding"]), emb0)
    np.testing.assert_array_equal(np.asarray(state.params["enc_lstm_fw"]["w"]), enc0)
    assert not np.allclose(np.asarray(state.params["prenet"]["layers"][0]["w"]), pre0)


def test_data_parallel_mesh_step(training_data):
    """Full train step over an 8-device CPU mesh with batch sharded on data."""
    assert jax.device_count() == 8, jax.devices()
    cfg = CFG.override("tacotron_train.batch_size=8")
    ds = TacotronDataset(read_metadata(str(training_data / "train.txt")), str(training_data), cfg)
    # 6 utterances -> build an 8-batch by repetition
    idx = (ds.train_indices * 2)[:8]
    batch = ds._make_batch(idx, 16, 64)
    mesh = make_mesh()
    arrays = shard_batch(
        mesh,
        {
            "inputs": batch.inputs,
            "input_lengths": batch.input_lengths,
            "mel_targets": batch.mel_targets,
            "stop_targets": batch.stop_targets,
            "target_lengths": batch.target_lengths,
        },
    )
    state = task.init_state(jax.random.PRNGKey(0), cfg)
    state = replicate_tree(mesh, state)
    with mesh:
        state, metrics = task.train_step(state, arrays, jax.random.PRNGKey(0), cfg)
        loss_dp = float(metrics["loss"])
    assert np.isfinite(loss_dp)

    # single-device replica of the same step must agree closely
    state1 = task.init_state(jax.random.PRNGKey(0), cfg)
    arrays1 = {k: jnp.asarray(getattr(batch, k2)) for k, k2 in
               [("inputs", "inputs"), ("input_lengths", "input_lengths"),
                ("mel_targets", "mel_targets"), ("stop_targets", "stop_targets"),
                ("target_lengths", "target_lengths")]}
    _, metrics1 = task.train_step(state1, arrays1, jax.random.PRNGKey(0), cfg)
    assert abs(loss_dp - float(metrics1["loss"])) < 1e-3


def test_checkpoint_roundtrip(training_data, tmp_path):
    from tacotronv2_wavernn_chinese_tpu.utils.checkpoints import CheckpointManager

    state = task.init_state(jax.random.PRNGKey(0), CFG)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=3)
    mgr.save(5, jax.device_get(state))
    restored = mgr.restore(jax.device_get(state))
    assert restored is not None
    np.testing.assert_array_equal(
        np.asarray(restored.params["embedding"]), np.asarray(state.params["embedding"])
    )
    assert mgr.latest_step() == 5
    mgr.close()


def test_params_npz_roundtrip(tmp_path):
    from tacotronv2_wavernn_chinese_tpu.utils.checkpoints import (
        load_params_npz,
        save_params_npz,
    )

    params = task.init_state(jax.random.PRNGKey(0), CFG).params
    path = str(tmp_path / "params.npz")
    save_params_npz(path, jax.device_get(params))
    loaded = load_params_npz(path)
    orig_flat = jax.tree_util.tree_leaves(params)
    load_flat = jax.tree_util.tree_leaves(loaded)
    assert len(orig_flat) == len(load_flat)
    for a, b in zip(orig_flat, load_flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_padding_stats_matches_real_stream(training_data):
    """padding_stats (metadata-only replay) must equal the padding fractions
    of the batches the real stream produces — it's the number the trainer
    logs and the endurance/quality artifacts record."""
    ds = TacotronDataset(read_metadata(str(training_data / "train.txt")), str(training_data), CFG)
    stats = ds.padding_stats([0, 1])
    real_f = pad_f = real_t = pad_t = n = 0
    for seed in (0, 1):
        for b in ds.batches(epoch_seed=seed):
            n += 1
            pad_f += b.mel_targets.shape[0] * b.mel_targets.shape[1]
            real_f += int(b.target_lengths.sum())
            pad_t += b.inputs.shape[0] * b.inputs.shape[1]
            real_t += int(b.input_lengths.sum())
    assert stats["n_batches"] == n
    assert stats["frac_pad_mel"] == round(1.0 - real_f / pad_f, 4)
    assert stats["frac_pad_inputs"] == round(1.0 - real_t / pad_t, 4)
    # bucket-only waste is a subset of total waste
    assert 0.0 <= stats["frac_pad_mel_bucket"] <= stats["frac_pad_mel"]


def test_wavernn_prewarm_compiles_and_survives_crash(monkeypatch):
    """The vocoder trainer's pre-warm (new in round 5: RESUME_r4 measured a
    5.87 s p95 step from first-dispatch compiles landing in the timed loop)
    must compile both step variants up front and must NEVER abort a launch
    on a transient remote-compile crash."""
    from tacotronv2_wavernn_chinese_tpu.train import wavernn_task as wtask
    from tacotronv2_wavernn_chinese_tpu.train import wavernn_train as wt

    cfg = default_config().override(
        "wavernn.rnn_dims=32,wavernn.fc_dims=32,wavernn.compute_dims=16,"
        "wavernn.res_out_dims=16,wavernn.res_blocks=2,"
        "wavernn_train.batch_size=2,wavernn_train.seq_len_hops=2"
    )
    state = wtask.init_state(jax.random.PRNGKey(0), cfg)
    logs = []
    wt._prewarm_shapes(cfg, state, None, 2, logs.append)
    assert any("pre-compile done" in l for l in logs), logs

    real_step = wtask.train_step
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("remote_compile: response body closed")
        return real_step(*a, **kw)

    monkeypatch.setattr(wtask, "train_step", flaky)
    logs2 = []
    wt._prewarm_shapes(cfg, state, None, 1, logs2.append)
    assert "retrying" in "\n".join(logs2), logs2
    assert any("pre-compile done" in l for l in logs2), logs2

    monkeypatch.setattr(
        wtask, "train_step",
        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("still down")),
    )
    logs3 = []
    wt._prewarm_shapes(cfg, state, None, 1, logs3.append)  # must not raise
    assert "skipping" in "\n".join(logs3), logs3
