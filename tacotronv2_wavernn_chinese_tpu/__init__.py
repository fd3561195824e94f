"""TPU-native Chinese TTS framework (Tacotron-2 + WaveRNN).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``lturing/tacotronv2_wavernn_chinese``:

* Chinese text frontend (hanzi -> pinyin-phoneme G2P with polyphone
  disambiguation, number verbalization, punctuation canonicalization).
* Tacotron-2 acoustic model (pinyin phonemes -> mel spectrogram) with four
  pluggable attention mechanisms (location-sensitive, forward/location
  hybrid, GMM, Graves) as pure functions under ``lax.scan``/``while_loop``.
* WaveRNN vocoder (mel -> waveform, RAW 10-bit mu-law) with a fused Pallas
  generation kernel and batched-fold sequence parallelism.
* DSP (STFT/mel/Griffin-Lim/mu-law) as jittable JAX ops.
* Data pipeline, pjit/GSPMD data-parallel training, Orbax checkpoints,
  GTA bridge, and an HTTP serving front-end.
"""

__version__ = "0.1.0"
