"""Serving export artifact round-trip + display helpers + reference-wav DSP
parity (uses the reference mount's demo wavs when present)."""

import dataclasses
import io
import os
import sys

import jax
import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
from tacotronv2_wavernn_chinese_tpu.serving.export import (
    _config_from_dict,
    export_artifact,
    load_exported,
)
from tacotronv2_wavernn_chinese_tpu.utils import display as D


def tiny_cfg():
    cfg = default_config()
    return dataclasses.replace(
        cfg,
        tacotron=dataclasses.replace(
            cfg.tacotron,
            embedding_dim=32, enc_conv_channels=32, enc_conv_layers=2,
            encoder_lstm_units=32, attention_dim=16, attention_filters=8,
            attention_kernel=7, prenet_layers=(32, 32), decoder_lstm_units=32,
            postnet_channels=32, postnet_layers=2, max_iters=20,
        ),
    )


def test_export_roundtrip(tmp_path):
    cfg = tiny_cfg()
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg.tacotron)
    out = export_artifact(cfg, params, str(tmp_path / "export"))
    for f in ("tacotron_params.npz", "config.json", "symbols.txt", "MANIFEST.json"):
        assert os.path.exists(os.path.join(out, f)), f

    synth = load_exported(out, max_iters=20)
    # restored config keeps the overridden architecture
    assert synth.cfg.tacotron.embedding_dim == 32
    assert synth.cfg.tacotron.prenet_layers == (32, 32)
    r = synth.synthesize("你好。")
    assert r["wav"].size > 0 and np.isfinite(r["wav"]).all()
    # exported params equal the originals
    np.testing.assert_array_equal(
        np.asarray(synth.params["embedding"]), np.asarray(params["embedding"])
    )


def test_export_pins_artifact_vocabulary(tmp_path):
    """The loaded Synthesizer must use the artifact's symbols.txt, not the
    installed package's default table (checkpoint <-> vocab pinning)."""
    cfg = tiny_cfg()
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg.tacotron)
    out = export_artifact(cfg, params, str(tmp_path / "export"))
    # simulate an artifact from an older package whose table had extra rows
    with open(os.path.join(out, "symbols.txt"), encoding="utf-8") as f:
        symbols = [line.rstrip("\n") for line in f if line.rstrip("\n")]
    symbols.append("zz9")
    with open(os.path.join(out, "symbols.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(symbols) + "\n")

    synth = load_exported(out, max_iters=20)
    assert len(synth.symbols) == len(symbols)
    assert synth.symbols.encode(["zz9"], append_eos=False) == [len(symbols) - 1]


def test_config_from_dict_tuple_coercion():
    cfg = tiny_cfg()
    d = cfg.to_dict()
    rebuilt = _config_from_dict(d)
    assert rebuilt.tacotron.prenet_layers == (32, 32)
    assert isinstance(rebuilt.wavernn.upsample_factors, tuple)
    assert rebuilt.audio.sample_rate == cfg.audio.sample_rate


def test_display_helpers(capsys):
    assert D.progbar(0, 10, size=10) == "|          |"
    assert D.progbar(10, 10, size=10) == "|██████████|"
    assert D.progbar(5, 10, size=10).count("█") == 5
    D.simple_table([("loss", 1.234), ("steps/s", 10)])
    out = capsys.readouterr().out
    assert "loss" in out and "1.234" in out and "+" in out
    D.stream("\rhello")
    assert D.time_since(__import__("time").time() - 61).startswith("1m")


REF_DEMO = "/root/reference/demo/02-forward-griffin_lim.wav"


@pytest.mark.skipif(not os.path.exists(REF_DEMO), reason="reference mount absent")
def test_dsp_parity_on_reference_demo_wav():
    """Run the reference's own demo audio through our DSP: mel in contract
    range, Griffin-Lim reconstruction correlates with the source."""
    from tacotronv2_wavernn_chinese_tpu.dsp.griffin_lim import inv_mel_spectrogram
    from tacotronv2_wavernn_chinese_tpu.dsp.spectrogram import MelPipeline, mel_to_unit
    from tacotronv2_wavernn_chinese_tpu.dsp.wav import load_wav, preemphasis

    cfg = default_config()
    y = load_wav(REF_DEMO, cfg.audio.sample_rate)[: cfg.audio.sample_rate * 3]
    pipe = MelPipeline(cfg.audio)
    mel = np.asarray(pipe.melspectrogram(preemphasis(y, cfg.audio.preemphasis)))
    assert mel.shape[1] == 80
    assert mel.min() >= -4.0 - 1e-4 and mel.max() <= 4.0 + 1e-4
    unit = np.asarray(mel_to_unit(mel, cfg.audio))
    assert 0.0 - 1e-6 <= unit.min() and unit.max() <= 1.0 + 1e-6
    # voiced content spans a reasonable dynamic range
    assert unit.max() - unit.min() > 0.5

    wav = np.asarray(inv_mel_spectrogram(mel, pipe))
    n = min(len(wav), len(y))
    # Griffin-Lim phase is random, so compare envelopes (frame RMS)
    hop = cfg.audio.hop_size
    frames = n // hop
    env = lambda x: np.sqrt(
        np.mean(x[: frames * hop].reshape(frames, hop) ** 2, axis=1)
    )
    c = np.corrcoef(env(wav[:n]), env(y[:n]))[0, 1]
    assert c > 0.8, f"envelope correlation {c}"
