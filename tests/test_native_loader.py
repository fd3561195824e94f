"""Native C++ vocoder loader: parity with the Python path and threading."""

import dataclasses
import os

import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.data import native_loader as NL
from tacotronv2_wavernn_chinese_tpu.dsp import mulaw
from tacotronv2_wavernn_chinese_tpu.dsp.wav import preemphasis

pytestmark = pytest.mark.skipif(
    not NL.NativeVocoderLoader.available(), reason="native lib unavailable"
)


def cfg_small():
    cfg = default_config()
    return dataclasses.replace(
        cfg,
        wavernn_train=dataclasses.replace(
            cfg.wavernn_train, batch_size=4, seq_len_hops=3
        ),
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native_corpus")
    rows = []
    rng = np.random.RandomState(1)
    for i in range(3):
        frames = 40 + i * 5
        lab = rng.randint(0, 1024, frames * 275).astype(np.int16)
        mel = rng.rand(frames, 80).astype(np.float32)
        np.save(tmp / f"wav-{i}.npy", lab)
        np.save(tmp / f"gt-{i}.npy", mel)
        np.save(tmp / f"pred-{i}.npy", mel)
        rows.append([f"wav-{i}.npy", f"gt-{i}.npy", f"pred-{i}.npy", "txt"])
    return tmp, rows


def test_batch_shapes_and_contract(corpus):
    tmp, rows = corpus
    cfg = cfg_small()
    ldr = NL.NativeVocoderLoader(rows, str(tmp), cfg, n_workers=2, ring_size=4)
    try:
        assert ldr.num_utts == 3
        for _ in range(8):
            b = ldr.next_batch()
            assert b.x.shape == (4, 825) and b.y.shape == (4, 825)
            assert b.mels.shape == (4, 7, 80)
            assert np.abs(b.x).max() <= 1.0
            assert 0 <= b.y.min() and b.y.max() < 1024
            # autoregressive contract: x[t+1] == label_2_float(y[t])
            np.testing.assert_allclose(
                b.x[:, 1:], b.y[:, :-1] * (2.0 / 1023) - 1.0, atol=1e-6
            )
    finally:
        ldr.close()


def test_short_utterances_filtered(corpus):
    tmp, rows = corpus
    cfg = cfg_small()
    short = [r[:] for r in rows]
    lab = np.zeros(2 * 275, np.int16)
    mel = np.zeros((2, 80), np.float32)
    np.save(tmp / "wav-s.npy", lab)
    np.save(tmp / "gt-s.npy", mel)
    short.append(["wav-s.npy", "gt-s.npy", "gt-s.npy", "short"])
    ldr = NL.NativeVocoderLoader(short, str(tmp), cfg)
    try:
        assert ldr.num_utts == 3  # the 2-frame utterance was filtered
    finally:
        ldr.close()


def test_label_stream_shorter_than_mel_stays_in_bounds(tmp_path):
    # A truncated wav .npy (labels shorter than the mel implies) must clamp
    # the window start to the label slice — never read the next utterance's
    # labels or run off the heap (regression: start was sampled from
    # mel_frames only). Labels are strictly increasing per-utterance ramps,
    # so any cross-utterance or OOB read shows up as an out-of-range value.
    cfg = cfg_small()
    hop = cfg.audio.hop_size
    rows = []
    full = 40 * hop
    short = 20 * hop  # half the samples the 40-frame mel implies
    for i, n in enumerate([short, full]):
        lab = (np.arange(n) % 900 + (i + 1) * 50).astype(np.int16) % 1024
        np.save(tmp_path / f"wav-{i}.npy", lab)
        mel = np.random.RandomState(i).rand(40, 80).astype(np.float32)
        np.save(tmp_path / f"gt-{i}.npy", mel)
        rows.append([f"wav-{i}.npy", f"gt-{i}.npy", f"gt-{i}.npy", "t"])
    ldr = NL.NativeVocoderLoader(rows, str(tmp_path), cfg, n_workers=2, ring_size=4)
    try:
        assert ldr.num_utts == 2
        seq_len = cfg.wavernn_train.seq_len_hops * hop
        for _ in range(16):
            b = ldr.next_batch()
            # max legal label index for the SHORT utterance is short-1; both
            # utterances' windows must satisfy their own label_len bound
            assert b.y.max() < 1024 and b.y.min() >= 0
            assert b.y.shape == (4, seq_len)
    finally:
        ldr.close()


def test_destroy_while_consumer_blocked():
    # vl_next_batch must wake and return 0 when the loader is destroyed
    # underneath it (regression: predicate ignored `stop` -> UAF/hang)
    import threading
    import time

    cfg = cfg_small()
    # starve the ring: 1 worker, tiny ring, consumer drains faster than
    # batches appear isn't guaranteed, so use a big batch count instead
    rng = np.random.RandomState(0)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        lab = rng.randint(0, 1024, 40 * 275).astype(np.int16)
        mel = rng.rand(40, 80).astype(np.float32)
        np.save(os.path.join(td, "w.npy"), lab)
        np.save(os.path.join(td, "m.npy"), mel)
        rows = [["w.npy", "m.npy", "m.npy", "t"]]
        ldr = NL.NativeVocoderLoader(rows, td, cfg, n_workers=1, ring_size=2)
        errors = []

        def consume():
            try:
                while True:
                    ldr.next_batch()
            except RuntimeError:
                pass  # expected: loader closed
            except Exception as e:  # pragma: no cover
                errors.append(e)

        t = threading.Thread(target=consume)
        t.start()
        time.sleep(0.2)
        ldr.close()
        t.join(timeout=10)
        assert not t.is_alive(), "consumer hung after vl_destroy"
        assert not errors


def test_preemphasis_parity():
    x = np.random.RandomState(0).uniform(-1, 1, 5000).astype(np.float32)
    np.testing.assert_allclose(
        NL.preemphasis_native(x, 0.97), preemphasis(x, 0.97), atol=1e-6
    )


def test_mulaw_parity():
    x = np.random.RandomState(0).uniform(-1, 1, 5000).astype(np.float32)
    ref = np.asarray(mulaw.encode_mu_law(x, mu=1024))
    nat = NL.mulaw_encode_native(x, 1024)
    assert (ref == nat).mean() == 1.0


def test_driver_integration(corpus, tmp_path):
    from tacotronv2_wavernn_chinese_tpu.data.preprocess import write_metadata
    from tacotronv2_wavernn_chinese_tpu.train.wavernn_train import run_training

    tmp, rows = corpus
    cfg = cfg_small()
    cfg = dataclasses.replace(
        cfg,
        wavernn=dataclasses.replace(
            cfg.wavernn, rnn_dims=16, fc_dims=16, compute_dims=8,
            res_out_dims=8, res_blocks=1,
        ),
        wavernn_train=dataclasses.replace(
            cfg.wavernn_train, batch_size=2, checkpoint_every=100, test_samples=0
        ),
    )
    meta = tmp_path / "meta.txt"
    write_metadata([tuple(r) for r in rows], str(meta))
    state = run_training(
        cfg, str(meta), str(tmp), str(tmp_path / "logs"),
        total_steps=2, use_mesh=False, gen_at_checkpoint=False,
        use_native_loader=True, log=lambda *a, **k: None,
    )
    assert int(state.step) == 2


def test_epoch_permutation_no_replacement(tmp_path):
    """Every utterance is visited exactly once per epoch (matching the Python
    VocoderDataset / reference torch shuffle), not sampled with replacement.
    One worker makes production order == permutation-pop order, so two
    epochs' worth of batches must contain each utterance exactly twice."""
    cfg = cfg_small()
    n_utts, batch = 16, cfg.wavernn_train.batch_size
    rows = []
    for i in range(n_utts):
        frames = 40
        lab = np.full(frames * 275, 100 + i, np.int16)  # identifies the utt
        mel = np.zeros((frames, 80), np.float32)
        np.save(tmp_path / f"wav-{i}.npy", lab)
        np.save(tmp_path / f"gt-{i}.npy", mel)
        np.save(tmp_path / f"pred-{i}.npy", mel)
        rows.append([f"wav-{i}.npy", f"gt-{i}.npy", f"pred-{i}.npy", "txt"])
    ldr = NL.NativeVocoderLoader(rows, str(tmp_path), cfg, n_workers=1, ring_size=2)
    try:
        counts = np.zeros(n_utts, np.int64)
        for _ in range(2 * n_utts // batch):
            b = ldr.next_batch()
            for v in np.unique(b.y):
                counts[int(v) - 100] += int((b.y[:, 0] == v).sum())
        np.testing.assert_array_equal(counts, np.full(n_utts, 2))
    finally:
        ldr.close()
