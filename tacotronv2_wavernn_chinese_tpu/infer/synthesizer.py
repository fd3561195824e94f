"""End-to-end synthesis: text -> pinyin -> mel -> wav.

Replaces the reference's Synthesizer (tacotron_synthesize.py:38-127,
tacotron/synthesizer.py:16-143): one jitted autoregressive decode with
static-shape buffers, host-side trim at the stop token, and either
Griffin-Lim (on device) or the WaveRNN vocoder for waveform reconstruction.

Inputs are padded to bucketed lengths so repeated calls hit a small, finite
set of compiled shapes instead of recompiling per sentence.
"""

from __future__ import annotations

import functools
import hashlib
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..utils import is_tpu_backend
from ..dsp import spectrogram as S
from ..dsp.griffin_lim import inv_mel_spectrogram
from ..dsp import wav as wavio
from ..frontend import default_symbols, get_pyin
from ..models import tacotron as T
from ..models import wavernn as W
from ..utils.checkpoints import CheckpointManager
from ..utils.plot import plot_alignment, plot_spectrogram


from ..utils import round_up as _round_up


def _seed_list(seed, n: int) -> list[int]:
    """Normalize a scalar seed or per-example seed sequence to a list[n]."""
    if isinstance(seed, (int, np.integer)):
        return [int(seed)] * n
    seeds = [int(s) for s in seed]
    if len(seeds) != n:
        raise ValueError(f"got {len(seeds)} seeds for {n} examples")
    return seeds


def _keys_from_seeds(seeds: Sequence[int]) -> np.ndarray:
    """Per-example PRNG keys [B, 2] built HOST-side.

    Matches ``jax.random.PRNGKey(seed)``'s threefry2x32 layout (hi, lo
    words) without issuing B device ops — through the axon tunnel each
    device op costs ~25 ms, so building keys with jnp would dominate a
    serving batch.  tests/test_pipeline_e2e.py pins equality against
    ``jax.random.PRNGKey``."""
    # int64 -> uint64 two's-complement so negative seeds are accepted
    # (numpy 2 rejects negative ints for uint64; jax.random.PRNGKey's own
    # negative-seed word split differs, but any deterministic injective
    # mapping is a valid key — equality with PRNGKey is pinned for the
    # non-negative range serving actually documents)
    a = np.asarray(list(seeds), np.int64).astype(np.uint64)
    return np.stack(
        [(a >> np.uint64(32)).astype(np.uint32), (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
        axis=-1,
    )


class Synthesizer:
    """Loads acoustic (and optionally vocoder) params and synthesizes speech.

    ``vocoder_params=None`` -> Griffin-Lim reconstruction (the reference's
    default path, tacotron_synthesize.py:110-112).
    """

    def __init__(
        self,
        cfg: Config,
        params: Any,
        vocoder_params: Any | None = None,
        max_iters: int | None = None,
        symbols: Any | None = None,
    ):
        self.cfg = cfg
        self.params = params
        self.vocoder_params = vocoder_params
        # ``symbols`` lets a serving artifact pin its own frozen vocabulary
        # (serving/export.py copies symbols.txt precisely so checkpoints
        # never depend on the installed package's table).
        self.symbols = symbols if symbols is not None else default_symbols()
        self.pipe = S.MelPipeline(cfg.audio)
        self.max_iters = max_iters or cfg.tacotron.max_iters
        # fully-jitted Griffin-Lim reconstruction (pipe is closure-static);
        # the vmapped form reconstructs a whole coalesced batch in ONE
        # dispatch (serving micro-batching: N serial ~32 ms RTT-bound calls
        # -> one batched MXU program)
        self._gl_jit = jax.jit(lambda m: inv_mel_spectrogram(m, self.pipe))
        self._gl_jit_batch = jax.jit(
            jax.vmap(lambda m: inv_mel_spectrogram(m, self.pipe))
        )
        mcfg = cfg.tacotron
        # fused decoder kernel on TPU when the config + call shape support it
        # (3x faster per decode step than the XLA while_loop); outside the
        # kernel's shape envelope the XLA path is used for that shape.
        from ..ops.tacotron_decoder_kernel import supported as _dk_supported
        from ..ops.tacotron_decoder_kernel import supported_shape as _dk_shape

        kernel_ok = _dk_supported(mcfg) and is_tpu_backend()
        # ``mi`` (max decode length) rides as a STATIC call argument read
        # from ``self.max_iters`` at call time, NOT a construction-time
        # closure constant: callers legitimately assign ``synth.max_iters``
        # after construction (bench_serving caps decode length on restored
        # checkpoints), and a baked-in value made that a silent no-op that
        # compiled the full-length (1000-frame) program instead — a ~1 h
        # remote compile for the B=16 fused decode+GL variant.
        _jit = {
            flag: jax.jit(
                lambda params, inputs, lens, rng, mi, f=flag: T.forward_inference(
                    params, mcfg, inputs, lens, rng, mi, use_pallas_decoder=f
                ),
                static_argnums=(4,),
            )
            for flag in (False, True)
        }

        def infer(params, inputs, lens, rng):
            use = kernel_ok and _dk_shape(inputs.shape[0], inputs.shape[1], mcfg)
            return _jit[use](params, inputs, lens, rng, int(self.max_iters))

        self._infer = infer

        # fused decode->Griffin-Lim: the mel never leaves the device (one
        # dispatch instead of decode + transfer + GL = ~2 RTTs + a mel copy
        # on the serving path).  Post-stop frames are masked to silence ON
        # DEVICE so the reconstruction matches the trimmed-mel semantics.
        def _infer_gl_impl(params, inputs, lens, rng, mi, f):
            out = T.forward_inference(
                params, mcfg, inputs, lens, rng, mi, use_pallas_decoder=f
            )
            mel = out.mel_outputs  # [B, T_max, 80], static T_max
            t = jnp.arange(mel.shape[1])[None, :, None]
            silence = -self.cfg.audio.max_abs_value
            mel = jnp.where(t < out.stop_lengths[:, None, None], mel, silence)
            # pad to the same 64-frame bucket convention as mel_to_wav (at
            # least one frame beyond T_max so stop_len*hop is always within
            # the reconstruction, whose length is hop*(T_pad-1))
            T_pad = _round_up(mel.shape[1] + 1, 64)
            mel = jnp.pad(
                mel, ((0, 0), (0, T_pad - mel.shape[1]), (0, 0)),
                constant_values=silence,
            )
            wavs = jax.vmap(lambda m: inv_mel_spectrogram(m, self.pipe))(mel)
            return wavs, out.mel_outputs, out.alignments, out.stop_lengths

        _jit_gl = {
            flag: jax.jit(functools.partial(_infer_gl_impl, f=flag),
                          static_argnums=(4,))
            for flag in (False, True)
        }

        def infer_gl(params, inputs, lens, rng):
            use = kernel_ok and _dk_shape(inputs.shape[0], inputs.shape[1], mcfg)
            return _jit_gl[use](params, inputs, lens, rng, int(self.max_iters))

        self._infer_gl = infer_gl

    @classmethod
    def from_checkpoints(
        cls,
        cfg: Config,
        tacotron_ckpt_dir: str,
        wavernn_ckpt_dir: str | None = None,
        step: int | None = None,
        **kw,
    ) -> "Synthesizer":
        """Restore params from step-keyed checkpoint dirs (``step`` picks a
        specific acoustic checkpoint — e.g. the best-held-out one — else
        latest)."""
        from ..train import tacotron_task as TT

        state = CheckpointManager(tacotron_ckpt_dir).restore(
            TT.init_state(jax.random.PRNGKey(0), cfg), step=step
        )
        if state is None:
            raise FileNotFoundError(f"no checkpoint under {tacotron_ckpt_dir}")
        voc_params = None
        if wavernn_ckpt_dir is not None:
            from ..train import wavernn_task as WT

            wstate = CheckpointManager(wavernn_ckpt_dir).restore(
                WT.init_state(jax.random.PRNGKey(0), cfg)
            )
            if wstate is None:
                raise FileNotFoundError(f"no checkpoint under {wavernn_ckpt_dir}")
            voc_params = wstate.params
        return cls(cfg, state.params, voc_params, **kw)

    # -- core ---------------------------------------------------------------

    @staticmethod
    def _pad_ids(ids_batch: Sequence[Sequence[int]], pad_batch: bool = False):
        """Pad a token-id batch to a 16-multiple T_in (and, with
        ``pad_batch``, a power-of-2 batch size).

        ``pad_batch`` is the SERVING knob: the coalescer produces arbitrary
        batch sizes 2..max_batch and every distinct (B, T_in) is a fresh
        XLA compile (~4 s through the tunnel), so padding B to powers of 2
        bounds the compile count.  Offline callers (eval/GTA) keep their
        exact B — a batch of 9 should not silently decode 16 rows.  Padding
        rows DUPLICATE the last real example so the batch's stop behavior
        matches real traffic."""
        B = len(ids_batch)
        B_pad = (1 << (B - 1).bit_length()) if pad_batch else B
        padded = list(ids_batch) + [ids_batch[-1]] * (B_pad - B)
        lens = [len(x) for x in padded]
        T_in = _round_up(max(lens), 16)
        inputs = np.zeros((B_pad, T_in), np.int32)
        for i, ids in enumerate(padded):
            inputs[i, : len(ids)] = ids
        return inputs, lens

    def mel_from_ids(
        self,
        ids_batch: Sequence[Sequence[int]],
        seed: int | Sequence[int] = 0,
        pad_batch: bool = False,
    ):
        """Padded-batch inference -> list of (mel [T,80], alignment [T,T_in],
        stop frame count) trimmed per example (reference
        tacotron_synthesize.py:104-108: trim at the first stop flag).

        ``seed`` may be one int (every row uses that stream) or one int per
        example: each row's decode noise derives ONLY from its own seed, so
        the serving coalescer can batch requests with distinct seeds and
        every request stays reproducible."""
        B = len(ids_batch)
        seeds = _seed_list(seed, B)
        inputs, lens = self._pad_ids(ids_batch, pad_batch)
        keys = _keys_from_seeds(seeds + [seeds[-1]] * (inputs.shape[0] - B))
        out = self._infer(
            self.params,
            jnp.asarray(inputs),
            jnp.asarray(np.asarray(lens, np.int32)),
            jnp.asarray(keys),
        )
        mels, aligns, stops = [], [], []
        # ONE device->host transfer per array: slicing out.mel_outputs[i]
        # per example issued 2B separate ~25 ms RTT-bound transfers through
        # the tunnel (0.4 s/batch at B=8; the bulk transfer is 0.08 s)
        stop_len = np.asarray(out.stop_lengths)
        mel_all = np.asarray(out.mel_outputs)
        align_all = np.asarray(out.alignments)
        for i in range(B):
            n = int(stop_len[i])
            mels.append(mel_all[i, :n])
            r = self.cfg.tacotron.outputs_per_step
            aligns.append(align_all[i, : -(-n // r), : lens[i]])
            stops.append(n)
        return mels, aligns, stops

    def text_to_mel(self, text: str, seed: int = 0):
        """text -> (mel [-4,4], alignment, pyin string)."""
        pyin, _ = get_pyin(text)
        ids = self.symbols.encode(pyin)
        mels, aligns, _ = self.mel_from_ids([ids], seed=seed)
        return mels[0], aligns[0], pyin

    def mel_to_wav(self, mel: np.ndarray, seed: int = 0) -> np.ndarray:
        """mel [-4,4] -> waveform via WaveRNN if loaded, else Griffin-Lim.

        The mel is padded to a 64-frame bucket before Griffin-Lim so repeated
        calls hit a handful of compiled shapes instead of recompiling per
        utterance length; the wav is trimmed back afterwards."""
        if self.vocoder_params is not None:
            unit = S.mel_to_unit(np.asarray(mel), self.cfg.audio, xp=np)
            return W.generate(
                self.vocoder_params,
                self.cfg.wavernn,
                self.cfg.wavernn_gen,
                unit,
                jax.random.PRNGKey(seed),
                bits=self.cfg.audio.bits,
                apply_mu_law=self.cfg.audio.mu_law,
            )
        T = mel.shape[0]
        # +1 frame: the reconstruction is hop*(T_pad-1) samples, so an
        # exact-64-multiple T needs the next bucket to cover T*hop
        T_pad = _round_up(max(T + 1, 64), 64)
        pad_val = -self.cfg.audio.max_abs_value  # silence
        mel_p = np.pad(mel, ((0, T_pad - T), (0, 0)), constant_values=pad_val)
        # ONE jitted dispatch for the whole mel->linear->Griffin-Lim->
        # de-emphasis chain: the un-jitted chain paid ~8 op-by-op dispatch
        # RTTs (~0.9 s through the axon tunnel; ~80 ms after)
        wav = np.asarray(self._gl_jit(jnp.asarray(mel_p)))
        return wav[: T * self.cfg.audio.hop_size]

    def mels_to_wavs_gl(self, mels: Sequence[np.ndarray]) -> list[np.ndarray]:
        """Batched Griffin-Lim: pad every mel to one 64-frame bucket and
        reconstruct the whole batch in ONE vmapped device dispatch, then
        trim per example.  Matches ``mel_to_wav`` exactly when the example
        would land in the same 64-frame bucket (same PRNGKey(0) phase
        init); examples shorter than the batch max see a different padded
        length, which only perturbs the random phase draw."""
        T_max = max(m.shape[0] for m in mels)
        # +1 frame like _infer_gl_impl: the reconstruction is hop*(T_pad-1)
        # samples, so an exact-64-multiple T_max would otherwise come back
        # one hop short of the T_max*hop trim below
        T_pad = _round_up(max(T_max + 1, 64), 64)
        pad_val = -self.cfg.audio.max_abs_value  # silence
        B = len(mels)
        B_pad = 1 << (B - 1).bit_length()  # power-of-2 batch buckets
        stacked = np.full((B_pad, T_pad, mels[0].shape[1]), pad_val, np.float32)
        for i, m in enumerate(mels):
            stacked[i, : m.shape[0]] = m
        wavs = np.asarray(self._gl_jit_batch(jnp.asarray(stacked)))
        hop = self.cfg.audio.hop_size
        return [w[: m.shape[0] * hop] for w, m in zip(wavs, mels)]

    def _synth_gl_batch(
        self,
        texts: Sequence[str],
        seed: int | Sequence[int] = 0,
        pad_batch: bool = False,
    ):
        """Fused text->wav for the Griffin-Lim path: ONE device dispatch
        runs decode AND reconstruction (the mel never round-trips to host
        between them — the split path paid an extra dispatch RTT plus a
        mel upload), then each array transfers once in bulk.  ``seed`` may
        be per-example (see ``mel_from_ids``)."""
        pyins, ids = [], []
        for t in texts:
            p, _ = get_pyin(t)
            pyins.append(p)
            ids.append(self.symbols.encode(p))
        seeds = _seed_list(seed, len(texts))
        inputs, lens = self._pad_ids(ids, pad_batch)
        keys = _keys_from_seeds(seeds + [seeds[-1]] * (inputs.shape[0] - len(texts)))
        wavs_d, mels_d, aligns_d, stops_d = self._infer_gl(
            self.params,
            jnp.asarray(inputs),
            jnp.asarray(np.asarray(lens, np.int32)),
            jnp.asarray(keys),
        )
        stops = np.asarray(stops_d)
        wav_all = np.asarray(wavs_d)
        mel_all = np.asarray(mels_d)
        align_all = np.asarray(aligns_d)
        hop = self.cfg.audio.hop_size
        r = self.cfg.tacotron.outputs_per_step
        results = []
        for i, (text, pyin) in enumerate(zip(texts, pyins)):
            n = int(stops[i])
            results.append({
                "wav": wav_all[i, : n * hop],
                "mel": mel_all[i, :n],
                "alignment": align_all[i, : -(-n // r), : len(ids[i])],
                "pyin": pyin,
            })
        return results

    def synthesize(self, text: str, out_dir: str | None = None, seed: int = 0):
        """Full pipeline; optionally writes artifacts like the reference CLI
        (tacotron_synthesize.py:186-197): wav, mel .npy rescaled to [0,1],
        mel + alignment PNGs, filenames keyed by md5(text)."""
        if self.vocoder_params is None:
            result = self._synth_gl_batch([text], seed=seed)[0]
        else:
            mel, align, pyin = self.text_to_mel(text, seed=seed)
            wav = self.mel_to_wav(mel, seed=seed)
            result = {"wav": wav, "mel": mel, "alignment": align, "pyin": pyin}
        if out_dir:
            wav, mel, align = result["wav"], result["mel"], result["alignment"]
            os.makedirs(out_dir, exist_ok=True)
            name = hashlib.md5(text.encode("utf-8")).hexdigest()[:16]
            wavio.save_wav(wav, os.path.join(out_dir, f"wav-{name}.wav"), self.cfg.audio.sample_rate)
            unit_mel = S.mel_to_unit(np.asarray(mel), self.cfg.audio, xp=np).astype(np.float32)
            np.save(os.path.join(out_dir, f"mel-{name}.npy"), unit_mel)
            plot_alignment(align, os.path.join(out_dir, f"align-{name}.png"), title=text)
            plot_spectrogram(mel, os.path.join(out_dir, f"mel-{name}.png"))
            result["paths"] = {
                "wav": os.path.join(out_dir, f"wav-{name}.wav"),
                "mel": os.path.join(out_dir, f"mel-{name}.npy"),
            }
        return result

    def synthesize_batch(
        self,
        texts: Sequence[str],
        seed: int | Sequence[int] = 0,
        pad_batch: bool = False,
    ):
        """Batched pipeline: ONE padded acoustic decode for all texts, then
        ONE fused vocoder call over all utterances' folds
        (models/wavernn.py generate_batch).  Returns a list of result dicts.

        The reference synthesizes batch mels (synthesizer.py:16-143) but
        vocodes one utterance at a time; here the fold axes concatenate so
        vocoder throughput scales with total batch audio.  The Griffin-Lim
        path fuses decode+reconstruction into one dispatch
        (``_synth_gl_batch``).

        ``seed`` may be one int or one per text: the acoustic decode is
        reproducible per example regardless of co-batching (per-example
        PRNG keys end-to-end).  The WaveRNN sampling noise is drawn from
        the first seed's stream over the concatenated fold batch — the
        category-sampling dither, not the prosody-bearing randomness.
        ``pad_batch`` pads B to a power of 2 (serving compile-count bound;
        offline callers keep exact B).
        """
        if self.vocoder_params is None:
            return self._synth_gl_batch(texts, seed=seed, pad_batch=pad_batch)
        pyins, ids = [], []
        for t in texts:
            p, _ = get_pyin(t)
            pyins.append(p)
            ids.append(self.symbols.encode(p))
        seeds = _seed_list(seed, len(texts))
        mels, aligns, _ = self.mel_from_ids(ids, seed=seeds, pad_batch=pad_batch)
        # xp=np: host-side per-utterance rescaling (un-jitted jnp here
        # would dispatch op-by-op through the device tunnel)
        units = [S.mel_to_unit(m, self.cfg.audio, xp=np) for m in mels]
        wavs = W.generate_batch(
            self.vocoder_params,
            self.cfg.wavernn,
            self.cfg.wavernn_gen,
            units,
            jax.random.PRNGKey(seeds[0]),
            bits=self.cfg.audio.bits,
            apply_mu_law=self.cfg.audio.mu_law,
        )
        return [
            {"wav": w, "mel": m, "alignment": a, "pyin": p}
            for w, m, a, p in zip(wavs, mels, aligns, pyins)
        ]

    def run_live(self):  # pragma: no cover - interactive
        """stdin REPL (reference synthesize.py run_live)."""
        import sys

        print("> ", end="", flush=True)
        for line in sys.stdin:
            text = line.strip()
            if not text:
                continue
            r = self.synthesize(text, out_dir="tacotron_inference_output")
            print(f"wrote {r['paths']['wav']}\n> ", end="", flush=True)
