"""End-to-end pipeline test: corpus -> preprocess -> tacotron train ->
synthesize (Griffin-Lim) -> GTA -> vocoder dataset -> wavernn train ->
text -> wav through the WaveRNN vocoder.  Tiny model configs keep this
CPU-fast; it exercises every seam of the two-model pipeline."""

import dataclasses
import os

import jax
import numpy as np
import pytest
from scipy.io import wavfile

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.data.loader import TacotronDataset, VocoderDataset
from tacotronv2_wavernn_chinese_tpu.data.preprocess import (
    parse_biaobei,
    process_corpus,
    read_metadata,
    write_metadata,
)
from tacotronv2_wavernn_chinese_tpu.infer.gta import generate_gta, merge_shards
from tacotronv2_wavernn_chinese_tpu.infer.synthesizer import Synthesizer
from tacotronv2_wavernn_chinese_tpu.train import tacotron_task
from tacotronv2_wavernn_chinese_tpu.train import wavernn_task


def tiny_cfg():
    cfg = default_config()
    return dataclasses.replace(
        cfg,
        tacotron=dataclasses.replace(
            cfg.tacotron,
            embedding_dim=32,
            enc_conv_channels=32,
            enc_conv_layers=2,
            encoder_lstm_units=32,
            attention_dim=16,
            attention_filters=8,
            attention_kernel=7,
            prenet_layers=(32, 32),
            decoder_lstm_units=32,
            postnet_channels=32,
            postnet_layers=2,
            max_iters=40,
        ),
        wavernn=dataclasses.replace(
            cfg.wavernn,
            rnn_dims=32,
            fc_dims=32,
            compute_dims=16,
            res_out_dims=16,
            res_blocks=2,
        ),
        tacotron_train=dataclasses.replace(
            cfg.tacotron_train, batch_size=2, batches_per_group=2
        ),
        wavernn_train=dataclasses.replace(
            cfg.wavernn_train, batch_size=2, test_samples=1, seq_len_hops=3
        ),
        wavernn_gen=dataclasses.replace(
            cfg.wavernn_gen, target=2750, overlap=550
        ),
    )


CFG = tiny_cfg()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("biaobei_e2e")
    wav_dir = root / "Wave"
    wav_dir.mkdir()
    sr = CFG.audio.sample_rate
    texts = ["你好。", "晚上好。", "谢谢你们。", "早上好。"]
    lines = []
    rng = np.random.RandomState(0)
    for i, text in enumerate(texts, start=1):
        idx = f"{i:06d}"
        n = sr // 2 + i * 1000
        t = np.arange(n) / sr
        sig = 0.5 * np.sin(2 * np.pi * (200 + 40 * i) * t) + 0.01 * rng.randn(n)
        wavfile.write(str(wav_dir / f"{idx}.wav"), sr, (sig * 32767 * 0.6).astype(np.int16))
        lines.append(f"{idx}\t{text}")
        lines.append("\tpinyin line")
    (root / "000001-010000.txt").write_text("\n".join(lines), encoding="utf-8")
    return root


@pytest.fixture(scope="module")
def training_data(corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("td_e2e")
    rows = process_corpus(
        CFG, str(corpus / "000001-010000.txt"), str(corpus / "Wave"), str(out), bucket_batch=4
    )
    write_metadata(rows, str(out / "train.txt"))
    return out


@pytest.fixture(scope="module")
def taco_state(training_data):
    ds = TacotronDataset(read_metadata(str(training_data / "train.txt")), str(training_data), CFG)
    state = tacotron_task.init_state(jax.random.PRNGKey(0), CFG)
    rng = jax.random.PRNGKey(1)
    for i, batch in enumerate(ds.batches(epoch_seed=0)):
        arrays = {
            "inputs": batch.inputs,
            "input_lengths": batch.input_lengths,
            "mel_targets": batch.mel_targets,
            "stop_targets": batch.stop_targets,
            "target_lengths": batch.target_lengths,
        }
        state, _ = tacotron_task.train_step(state, arrays, jax.random.fold_in(rng, i), CFG)
    return state


def test_synthesize_griffin_lim(taco_state, tmp_path):
    synth = Synthesizer(CFG, taco_state.params, max_iters=40)
    r = synth.synthesize("你好。", out_dir=str(tmp_path))
    assert r["wav"].ndim == 1 and r["wav"].size > 0
    assert np.isfinite(r["wav"]).all()
    assert r["mel"].shape[1] == 80
    assert os.path.exists(r["paths"]["wav"])
    mel_unit = np.load(r["paths"]["mel"])
    assert mel_unit.min() >= -1e-6 and mel_unit.max() <= 1.0 + 1e-6
    assert r["pyin"].startswith("n i3")


def test_synthesize_batch_griffin_lim(taco_state):
    """Batched GL path: one vmapped dispatch, per-example trim; an example
    in the same 64-frame bucket matches the single-example path exactly."""
    # force the stop head off so both examples decode a full 40 frames
    # (the 60-step fixture model can fire stop at frame 0 in padded batches)
    params = dict(
        taco_state.params,
        stop_projection=jax.tree.map(
            lambda x: x - 20.0 if x.ndim == 1 else x,
            dict(taco_state.params["stop_projection"]),
        ),
    )
    synth = Synthesizer(CFG, params, max_iters=40)
    rs = synth.synthesize_batch(["你好。", "今天天气好。"])
    assert len(rs) == 2
    for r in rs:
        assert r["wav"].ndim == 1 and r["wav"].size > 0
        assert np.isfinite(r["wav"]).all()
        assert len(r["wav"]) == r["mel"].shape[0] * CFG.audio.hop_size
    # single-path equivalence on the same bucket: feed identical mels so
    # batch max == each example's own bucket
    mel = rs[0]["mel"]
    w1 = synth.mel_to_wav(mel)
    w2 = synth.mels_to_wavs_gl([mel, mel])
    np.testing.assert_allclose(w2[0], w1, atol=1e-5)
    np.testing.assert_allclose(w2[1], w1, atol=1e-5)


def test_per_example_seed_reproducibility(taco_state):
    """A request's decode depends ONLY on its own (text, seed): coalescing
    it with different-seed rows, reordering the batch, or padding B must
    not change its mel (what lets serving batch distinct-seed traffic)."""
    from tacotronv2_wavernn_chinese_tpu.infer.synthesizer import _keys_from_seeds

    # the host-built keys must BE jax.random.PRNGKey's layout
    np.testing.assert_array_equal(
        _keys_from_seeds([0, 7, 123456789])[1], np.asarray(jax.random.PRNGKey(7))
    )
    # negative seeds must not crash (numpy 2 uint64 rejects negatives) and
    # must stay deterministic + distinct
    neg = _keys_from_seeds([-1, -2])
    assert neg.shape == (2, 2) and not (neg[0] == neg[1]).all()
    params = dict(
        taco_state.params,
        stop_projection=jax.tree.map(
            lambda x: x - 20.0 if x.ndim == 1 else x,
            dict(taco_state.params["stop_projection"]),
        ),
    )
    synth = Synthesizer(CFG, params, max_iters=24)
    ids = synth.symbols.encode("n i3 h ao3 。")
    ids2 = synth.symbols.encode("j in1 t ian1 。")
    solo, _, _ = synth.mel_from_ids([ids], seed=[7])
    mixed, _, _ = synth.mel_from_ids([ids2, ids, ids2], seed=[0, 7, 3])
    np.testing.assert_allclose(mixed[1], solo[0], atol=1e-5)
    # padded-batch bucketing (serving) must agree too: same row, B 3 -> 4
    padded, _, _ = synth.mel_from_ids(
        [ids2, ids, ids2], seed=[0, 7, 3], pad_batch=True
    )
    np.testing.assert_allclose(padded[1], mixed[1], atol=1e-5)
    # and a scalar seed still means "every row uses that stream"
    s_scalar, _, _ = synth.mel_from_ids([ids], seed=7)
    np.testing.assert_allclose(s_scalar[0], solo[0], atol=1e-5)


@pytest.fixture(scope="module")
def gta_dir(taco_state, training_data, tmp_path_factory):
    out = tmp_path_factory.mktemp("gta_e2e")
    # two shards to exercise the multi-host sharding path
    for shard in range(2):
        generate_gta(
            CFG,
            taco_state.params,
            str(training_data / "train.txt"),
            str(training_data),
            str(out),
            batch_size=2,
            shard_index=shard,
            num_shards=2,
            log=lambda *a, **k: None,
        )
    merge_shards(str(out), 2)
    return out


def test_gta_outputs(gta_dir, training_data):
    rows = read_metadata(str(gta_dir / "wavernn_training_data.txt"))
    assert len(rows) == 4
    for r in rows:
        labels = np.load(gta_dir / r[0])
        gt = np.load(gta_dir / r[1])
        pred = np.load(gta_dir / r[2])
        assert labels.dtype == np.int16
        assert 0 <= labels.min() and labels.max() < 2 ** CFG.audio.bits
        assert gt.shape == pred.shape and gt.shape[1] == 80
        # unit-range contract at the vocoder boundary
        for m in (gt, pred):
            assert m.min() >= -1e-5 and m.max() <= 1.0 + 1e-5
        # mu-law labels cover the full audio (frames * hop samples)
        assert len(labels) == gt.shape[0] * CFG.audio.hop_size


def test_wavernn_trains_on_gta(gta_dir):
    rows = read_metadata(str(gta_dir / "wavernn_training_data.txt"))
    ds = VocoderDataset(rows, str(gta_dir), CFG)
    assert len(ds.train_indices) + len(ds.test_indices) == len(ds.rows)
    state = wavernn_task.init_state(jax.random.PRNGKey(0), CFG)
    losses = []
    for batch in ds.batches(epoch_seed=0):
        arrays = {"x": batch.x, "y": batch.y, "mels": batch.mels}
        state, m = wavernn_task.train_step(state, arrays, CFG)
        losses.append(float(m["loss"]))
    assert len(losses) >= 1 and all(np.isfinite(losses))


def test_full_tts_with_wavernn(taco_state, gta_dir, tmp_path):
    wstate = wavernn_task.init_state(jax.random.PRNGKey(0), CFG)
    synth = Synthesizer(CFG, taco_state.params, vocoder_params=wstate.params, max_iters=40)
    r = synth.synthesize("早上好。", out_dir=str(tmp_path))
    assert r["wav"].size > 0 and np.isfinite(r["wav"]).all()
    assert np.abs(r["wav"]).max() <= 1.0 + 1e-5


def test_training_driver_loop(training_data, tmp_path):
    """Exercise run_training end-to-end (few steps, no mesh, with render)."""
    from tacotronv2_wavernn_chinese_tpu.train.tacotron_train import run_training

    cfg = dataclasses.replace(
        CFG,
        tacotron_train=dataclasses.replace(CFG.tacotron_train, checkpoint_interval=2),
    )
    state = run_training(
        cfg,
        str(training_data / "train.txt"),
        str(training_data),
        str(tmp_path / "logs"),
        total_steps=3,
        use_mesh=False,
        render_eval=True,
        log=lambda *a, **k: None,
    )
    assert int(state.step) == 3
    ckpts = os.listdir(tmp_path / "logs" / "taco_pretrained")
    assert any("step" in c or c for c in ckpts)
    evals = os.listdir(tmp_path / "logs" / "eval")
    assert any(e.endswith(".wav") for e in evals)
    assert any(e.endswith(".png") for e in evals)


def test_training_driver_loop_fused_dispatch(training_data, tmp_path):
    """steps_per_dispatch>1: fused K-step dispatches, correct final step
    count (tail handled by single-step dispatches), checkpoint after the
    group that crossed the boundary."""
    from tacotronv2_wavernn_chinese_tpu.train.tacotron_train import run_training

    cfg = dataclasses.replace(
        CFG,
        tacotron_train=dataclasses.replace(
            CFG.tacotron_train, checkpoint_interval=3, steps_per_dispatch=2
        ),
    )
    state = run_training(
        cfg,
        str(training_data / "train.txt"),
        str(training_data),
        str(tmp_path / "logs_fused"),
        total_steps=5,
        use_mesh=False,
        render_eval=False,
        log=lambda *a, **k: None,
    )
    assert int(state.step) == 5
    assert os.listdir(tmp_path / "logs_fused" / "taco_pretrained")


def test_wavernn_training_driver_loop_fused_dispatch(gta_dir, tmp_path):
    from tacotronv2_wavernn_chinese_tpu.train.wavernn_train import run_training

    cfg = dataclasses.replace(
        CFG,
        wavernn_train=dataclasses.replace(
            CFG.wavernn_train, checkpoint_every=2, steps_per_dispatch=2
        ),
        wavernn_gen=dataclasses.replace(CFG.wavernn_gen, batched=False),
    )
    state = run_training(
        cfg,
        str(gta_dir / "wavernn_training_data.txt"),
        str(gta_dir),
        str(tmp_path / "logs_voc_fused"),
        total_steps=3,
        use_mesh=False,
        gen_at_checkpoint=False,
        log=lambda *a, **k: None,
    )
    assert int(state.step) == 3
    assert os.listdir(tmp_path / "logs_voc_fused" / "checkpoints")


def test_wavernn_training_driver_loop(gta_dir, tmp_path):
    from tacotronv2_wavernn_chinese_tpu.train.wavernn_train import run_training

    cfg = dataclasses.replace(
        CFG,
        wavernn_train=dataclasses.replace(CFG.wavernn_train, checkpoint_every=2),
        wavernn_gen=dataclasses.replace(CFG.wavernn_gen, batched=False),
    )
    state = run_training(
        cfg,
        str(gta_dir / "wavernn_training_data.txt"),
        str(gta_dir),
        str(tmp_path / "logs_voc"),
        total_steps=2,
        use_mesh=False,
        gen_at_checkpoint=False,
        log=lambda *a, **k: None,
    )
    assert int(state.step) == 2
    assert os.listdir(tmp_path / "logs_voc" / "checkpoints")


def test_synthesize_batch_with_wavernn(taco_state, tmp_path):
    wstate = wavernn_task.init_state(jax.random.PRNGKey(0), CFG)
    synth = Synthesizer(CFG, taco_state.params, vocoder_params=wstate.params, max_iters=40)
    results = synth.synthesize_batch(["你好。", "早上好。"])
    assert len(results) == 2
    for r in results:
        assert r["wav"].size > 0 and np.isfinite(r["wav"]).all()
        assert r["wav"].shape[0] == r["mel"].shape[0] * CFG.audio.hop_size


def test_max_iters_assignment_after_construction(taco_state):
    """`synth.max_iters = N` AFTER construction must take effect: the decode
    length cap is a static call argument read at call time, not a
    construction-time closure constant.  Regression: bench_serving assigned
    it on a restored checkpoint and the silent no-op compiled the
    full-length (cfg max_iters) program — a ~1 h remote compile for the
    B=16 fused decode+GL variant."""
    params = dict(
        taco_state.params,
        stop_projection=jax.tree.map(
            lambda x: x - 20.0 if x.ndim == 1 else x,
            taco_state.params["stop_projection"],
        ),
    )  # stop never fires -> decode runs to the cap
    synth = Synthesizer(CFG, params, max_iters=40)
    synth.max_iters = 12
    r = CFG.tacotron.outputs_per_step
    out = synth.synthesize("你好。")
    assert out["mel"].shape[0] <= 12 * r, out["mel"].shape
    synth.max_iters = 24
    out2 = synth.synthesize("你好。")
    assert 12 * r < out2["mel"].shape[0] <= 24 * r, out2["mel"].shape
