"""Serving tests: real HTTP round-trips against the TTS server."""

import base64
import dataclasses
import io
import json
import threading
import urllib.request
import wave

import jax
import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.infer.synthesizer import Synthesizer
from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
from tacotronv2_wavernn_chinese_tpu.serving import server as srv


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
            max_iters=20,
        ),
    )


@pytest.fixture(scope="module")
def http_server():
    cfg = tiny_cfg()
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg.tacotron)
    synth = Synthesizer(cfg, params, max_iters=20)
    httpd = srv.serve(cfg, synth, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, payload, raw=None):
    req = urllib.request.Request(
        url,
        data=raw if raw is not None else json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_generate_tts_roundtrip(http_server):
    code, resp = _post(http_server + "/generate_tts", {"text": "你好。"})
    assert code == 200
    assert resp["status"] == 0
    assert resp["pyin"].startswith("n i3")
    assert resp["duration_s"] > 0
    # decode the WAV container
    pcm = base64.b64decode(resp["wav_b64"])
    with wave.open(io.BytesIO(pcm)) as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        assert w.getnframes() > 0
    # alignment PNG
    png = base64.b64decode(resp["align_b64"])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # reference wire fields (views.py:94-103)
    assert resp["txt"] == "你好。"
    assert resp["wav"].startswith("data:audio/wav;base64, ")
    assert resp["img"].startswith("data:image/png;base64, ")


def test_generate_tts_form_encoded(http_server):
    # a client written against the reference Flask app POSTs form field
    # `txt` (views.py:56) — must work unchanged
    from urllib.parse import urlencode

    req = urllib.request.Request(
        http_server + "/generate_tts",
        data=urlencode({"txt": "早上好。"}).encode(),
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        resp = json.loads(r.read())
    assert resp["status"] == 0
    assert resp["txt"] == "早上好。"
    assert resp["wav"].startswith("data:audio/wav;base64, ")


def test_healthz_and_demo_page(http_server):
    with urllib.request.urlopen(http_server + "/healthz") as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["vocoder"] == "griffin_lim"
    with urllib.request.urlopen(http_server + "/") as r:
        page = r.read().decode()
    assert "generate_tts" in page


def test_error_paths(http_server):
    code, resp = _post(http_server + "/generate_tts", {"text": ""})
    assert code == 400 and resp["status"] == 1
    code, resp = _post(http_server + "/generate_tts", {}, raw=b"not json{")
    assert code == 400 and "JSON" in resp["error"]
    code, resp = _post(http_server + "/generate_tts", {"text": "好" * 501})
    assert code == 400 and "long" in resp["error"]
    code, resp = _post(http_server + "/nope", {"text": "hi"})
    assert code == 404


def test_wav_b64_helper_roundtrip():
    # served audio goes through the reference save_wav chain (dc-notch,
    # normalize, 0.95-power compand, full-scale int16) — views.py:81-88
    wav = np.sin(np.linspace(0, 20, 1000)).astype(np.float32) * 0.05
    b64 = srv.wav_to_base64(wav, 22050)
    with wave.open(io.BytesIO(base64.b64decode(b64))) as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert pcm.shape == wav.shape
    # full-scale regardless of input peak (a 0.05-peak G&L wav must NOT be
    # served at 1.5% of int16 range)
    assert np.abs(pcm).max() > 0.9 * 32767
    # same processing as the files Synthesizer writes to disk
    from tacotronv2_wavernn_chinese_tpu.dsp.wav import postprocess_wav_int16

    np.testing.assert_array_equal(pcm, postprocess_wav_int16(wav))


def test_generate_tts_batch(http_server):
    code, resp = _post(http_server + "/generate_tts_batch", {"texts": ["你好。", "早上好。"]})
    assert code == 200 and resp["status"] == 0
    assert len(resp["results"]) == 2
    for r in resp["results"]:
        assert r["duration_s"] > 0
        with wave.open(io.BytesIO(base64.b64decode(r["wav_b64"]))) as w:
            assert w.getnframes() > 0
    code, resp = _post(http_server + "/generate_tts_batch", {"texts": []})
    assert code == 400
    code, resp = _post(http_server + "/generate_tts_batch", {"texts": ["好" * 501]})
    assert code == 400


class _StubSynth:
    """Deterministic slow synthesizer for micro-batching tests."""

    vocoder_params = None

    def __init__(self, delay=0.15):
        import time as _t

        self._t = _t
        self.delay = delay
        self.batch_sizes = []
        self.seen_seeds = []

    def _result(self, text):
        return {
            "wav": np.zeros(100, np.float32),
            "mel": np.zeros((4, 80), np.float32),
            "alignment": np.zeros((4, 4), np.float32),
            "pyin": text,
        }

    def synthesize(self, text, seed=0, out_dir=None):
        self._t.sleep(self.delay)
        self.batch_sizes.append(1)
        self.seen_seeds.append(seed)
        return self._result(text)

    def synthesize_batch(self, texts, seed=0, pad_batch=False):
        self._t.sleep(self.delay)
        self.batch_sizes.append(len(texts))
        self.seen_seeds.append(seed)
        return [self._result(t) for t in texts]


def test_microbatching_coalesces_concurrent_requests():
    """Requests arriving while the device is busy must ride ONE
    synthesize_batch call, not queue serially."""
    cfg = tiny_cfg()
    service = srv.TTSService(cfg, _StubSynth(), max_batch=8)
    results, errors = [], []

    def worker(i):
        try:
            results.append(service.generate(f"t{i}", seed=0))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(0,))]
    threads[0].start()
    import time

    time.sleep(0.05)  # let request 0 become the leader and hold the device
    for i in range(1, 4):
        threads.append(threading.Thread(target=worker, args=(i,)))
        threads[-1].start()
    for t in threads:
        t.join(timeout=10)
    assert not errors
    assert len(results) == 4 and all(r["status"] == 0 for r in results)
    # request 0 ran alone; 1-3 coalesced into one batch
    assert service.synth.batch_sizes == [1, 3], service.synth.batch_sizes
    assert service.n_requests == 4 and service.n_device_calls == 2


def test_microbatching_coalesces_distinct_seeds():
    """Distinct-seed requests MUST share a batch (per-example PRNG keys make
    each row's output a function of its own seed only — round 3 measured a
    2.4x throughput loss from the old same-seed-prefix rule), with the
    per-item seeds forwarded to synthesize_batch."""
    cfg = tiny_cfg()
    service = srv.TTSService(cfg, _StubSynth(), max_batch=8)

    def worker(i, seed):
        service.generate(f"t{i}", seed=seed)

    threads = [threading.Thread(target=worker, args=(0, 0))]
    threads[0].start()
    import time

    time.sleep(0.05)
    for i, seed in [(1, 1), (2, 1), (3, 2)]:
        threads.append(threading.Thread(target=worker, args=(i, seed)))
        threads[-1].start()
        time.sleep(0.01)  # keep FIFO order deterministic
    for t in threads:
        t.join(timeout=10)
    # leader ran alone; ALL three followers coalesced despite mixed seeds
    assert service.synth.batch_sizes == [1, 3], service.synth.batch_sizes
    assert service.n_device_calls == 2
    assert service.synth.seen_seeds[1] == [1, 1, 2]  # per-item seeds forwarded


def test_overload_queue_cap_rejects():
    """Past max_queue, generate raises OverloadedError with a Retry-After
    hint instead of queueing unboundedly (bounded p95 under overload)."""
    import time

    cfg = tiny_cfg()
    stub = _StubSynth(delay=0.0)
    service = srv.TTSService(cfg, stub, max_batch=2, max_queue=2)
    entered, hold = threading.Event(), threading.Event()
    orig_single = stub.synthesize

    def slow_single(text, seed=0, out_dir=None):
        entered.set()
        assert hold.wait(timeout=20)
        return orig_single(text, seed=seed)

    stub.synthesize = slow_single
    errors, oks = [], []

    def worker(i):
        try:
            oks.append(service.generate(f"t{i}", seed=0))
        except srv.OverloadedError as e:
            errors.append(e)

    leader = threading.Thread(target=worker, args=(0,))
    leader.start()
    assert entered.wait(timeout=20)  # leader holds the device, queue empty
    followers = [threading.Thread(target=worker, args=(i,)) for i in (1, 2)]
    for t in followers:
        t.start()
    for _ in range(2000):  # wait until the queue is at capacity
        with service._mutex:
            if len(service._queue) == 2:
                break
        time.sleep(0.005)
    else:
        raise AssertionError("followers never queued")
    # queue is full -> the next request must be shed, not queued
    rejected = threading.Thread(target=worker, args=(3,))
    rejected.start()
    rejected.join(timeout=10)
    assert len(errors) == 1 and errors[0].retry_after_s > 0
    assert service.n_rejected == 1
    hold.set()
    for t in [leader] + followers:
        t.join(timeout=20)
    assert len(oks) == 3


def test_overload_http_503_with_retry_after(http_server):
    """The HTTP layer maps OverloadedError to 503 + Retry-After."""
    # reach into the server's service object via a fresh tiny service:
    # simpler to exercise the mapping directly over HTTP with max_queue=0
    cfg = tiny_cfg()
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg.tacotron)
    synth = Synthesizer(cfg, params, max_iters=20)
    httpd = srv.serve(cfg, synth, host="127.0.0.1", port=0, max_queue=0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate_tts",
            data=json.dumps({"text": "你好。"}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected HTTP 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert int(e.headers["Retry-After"]) >= 1
            body = json.loads(e.read())
            assert body["error"] == "overloaded" and body["retry_after_s"] > 0
    finally:
        httpd.shutdown()


def test_microbatch_error_propagates_to_all_waiters():
    """Deterministic coalescing via events (sleep-based timing was flaky
    under full-suite load): the leader blocks inside its device call until
    BOTH followers are queued, so they must ride one synthesize_batch."""
    import time

    cfg = tiny_cfg()
    stub = _StubSynth(delay=0.0)
    service = srv.TTSService(cfg, stub, max_batch=8)
    entered, hold = threading.Event(), threading.Event()
    orig_single = stub.synthesize

    def slow_single(text, seed=0, out_dir=None):
        entered.set()
        assert hold.wait(timeout=20)
        return orig_single(text, seed=seed)

    def boom(texts, seed=0, pad_batch=False):
        raise RuntimeError("device on fire")

    stub.synthesize = slow_single
    stub.synthesize_batch = boom
    errors = []

    def worker(i):
        try:
            service.generate(f"t{i}", seed=0)
        except RuntimeError as e:
            errors.append(str(e))

    leader = threading.Thread(target=worker, args=(0,))
    leader.start()
    assert entered.wait(timeout=20)  # leader holds the device
    followers = [threading.Thread(target=worker, args=(i,)) for i in (1, 2)]
    for t in followers:
        t.start()
    for _ in range(2000):  # wait until both followers are queued
        with service._mutex:
            if len(service._queue) == 2:
                break
        time.sleep(0.005)
    else:
        raise AssertionError("followers never queued")
    hold.set()
    for t in [leader] + followers:
        t.join(timeout=20)
    # requests 1-2 batched -> both get the error; request 0 (single) succeeded
    assert errors == ["device on fire", "device on fire"]


def test_backlog_grows_batch_past_max_batch():
    """Depth-adaptive coalescing: once the queue is deeper than max_batch,
    a wave may take up to max_batch_hard (default 2x) so a backlog drains
    in fewer device waves — the round-4 conc-16 p95 knee came from a
    just-missed request always waiting one FULL fixed-size wave."""
    cfg = tiny_cfg()
    service = srv.TTSService(cfg, _StubSynth(delay=0.3), max_batch=4)
    assert service.max_batch_hard == 8
    errors = []

    def worker(i):
        try:
            service.generate(f"t{i}", seed=i)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(0,))]
    threads[0].start()
    import time

    time.sleep(0.1)  # request 0 leads and holds the device for 0.3 s
    for i in range(1, 13):  # 12 requests pile up behind the leader
        threads.append(threading.Thread(target=worker, args=(i,)))
        threads[-1].start()
    for t in threads:
        t.join(timeout=15)
    assert not errors
    sizes = service.synth.batch_sizes
    assert sizes[0] == 1, sizes
    assert max(sizes) > 4, f"backlog never grew a wave past max_batch: {sizes}"
    assert max(sizes) <= 8, sizes
    assert sum(sizes) == 13
