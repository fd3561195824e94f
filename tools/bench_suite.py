"""Full benchmark suite (beyond the single-line driver bench.py).

Measures on the current backend and prints one JSON object per metric:
  - mel extraction throughput (batched on-device STFT/mel)
  - Tacotron teacher-forced train step time
  - Tacotron AR decoder steps/s (inference)
  - WaveRNN train step time
  - WaveRNN generation x-realtime (scan and, on TPU, Pallas)

Sync protocol for the axon tunnel: reduce outputs to a device scalar and
transfer 4 bytes; fresh seeds per timed call (see bench.py notes).

Usage: python -m tools.bench_suite [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.dsp.spectrogram import MelPipeline
from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
from tacotronv2_wavernn_chinese_tpu.models import wavernn as W


def sync(x) -> float:
    return float(np.asarray(jnp.sum(x)))


def timed(f, key, reps=3):
    sync(f(key))  # compile + warmup
    ts = []
    for i in range(reps):
        t0 = time.time()
        sync(f(jax.random.fold_in(key, i + 1)))
        ts.append(time.time() - t0)
    return min(ts)


# v5e (TPU v5 lite) MXU peak: 197 TFLOP/s bf16.  MFU here = XLA-counted
# FLOPs of the compiled step / wall time / bf16 peak — the standard
# how-to-scale-your-model definition (f32 matmuls also run as MXU passes,
# so one peak keeps rows comparable).
PEAK_FLOPS_BF16 = 197e12


def xla_flops(jitted, *args) -> float | None:
    """FLOPs of the compiled program per XLA's own cost model."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca["flops"])
    except Exception:
        return None


def mfu_extra(flops, dt) -> dict:
    if not flops or dt <= 0:
        return {}
    return {
        "flops_per_step": flops,
        "mfu": round(flops / dt / PEAK_FLOPS_BF16, 4),
        "peak_tflops_bf16": PEAK_FLOPS_BF16 / 1e12,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    cfg = default_config()
    sr, hop = cfg.audio.sample_rate, cfg.audio.hop_size
    base = int.from_bytes(os.urandom(4), "little")
    key = jax.random.PRNGKey(base)
    from tacotronv2_wavernn_chinese_tpu.utils import is_tpu_backend

    on_tpu = is_tpu_backend()  # Mosaic kernels only lower on TPU (not gpu/rocm)
    results = []

    def emit(metric, value, unit, **extra):
        row = {"metric": metric, "value": round(value, 3), "unit": unit, **extra}
        results.append(row)
        print(json.dumps(row))

    # ---- training-batch padding waste (metadata-only, no device) ----------
    # measured over the 10k-utterance campaign corpus when it exists
    # (VERDICT r4 #6; the trade-off table lives in config.py
    # mel_pad_multiple and CLAUDE.md)
    camp_meta = "/tmp/campaign_r5/training_data/train.txt"
    if os.path.exists(camp_meta):
        from tacotronv2_wavernn_chinese_tpu.data.loader import TacotronDataset
        from tacotronv2_wavernn_chinese_tpu.data.preprocess import read_metadata

        _rows = read_metadata(camp_meta)
        for mm in (64, 32):
            _cfg = cfg.override(f"tacotron_train.mel_pad_multiple={mm}")
            _ds = TacotronDataset(_rows, os.path.dirname(camp_meta), _cfg)
            st = _ds.padding_stats([1234, 1235, 1236, 1237])
            emit("tacotron_batch_padding_fraction", st["frac_pad_mel"],
                 "frac_mel_frames", mel_pad_multiple=mm,
                 bucket_multiple_only=st["frac_pad_mel_bucket"],
                 inputs=st["frac_pad_inputs"], n_batches=st["n_batches"],
                 default=(mm == cfg.tacotron_train.mel_pad_multiple))

    # ---- mel extraction ---------------------------------------------------
    pipe = MelPipeline(cfg.audio)
    B_mel, secs = (8, 2) if args.quick else (32, 5)
    wavs = jnp.asarray(
        np.random.RandomState(base % 997).uniform(-1, 1, (B_mel, secs * sr)).astype(np.float32)
    )
    mel_fn = jax.jit(
        lambda k: jax.vmap(pipe.melspectrogram)(
            wavs + 1e-6 * jax.random.normal(k, wavs.shape)
        )
    )
    dt = timed(mel_fn, key)
    emit("mel_extraction_audio_seconds_per_second", B_mel * secs / dt, "audio_s/s")

    # ---- tacotron train step ---------------------------------------------
    from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as TT

    B, T_in, T_out = (8, 32, 128) if args.quick else (32, 64, 512)
    state = TT.init_state(jax.random.PRNGKey(0), cfg)
    batch = {
        "inputs": jnp.ones((B, T_in), jnp.int32),
        "input_lengths": jnp.full((B,), T_in, jnp.int32),
        "mel_targets": jnp.zeros((B, T_out, 80), jnp.float32),
        "stop_targets": jnp.ones((B, T_out), jnp.float32),
        "target_lengths": jnp.full((B,), T_out, jnp.int32),
    }

    # train_step donates the state; thread it through across timed calls
    state_box = [state]

    def train_once(k):
        s2, metrics = TT.train_step(state_box[0], batch, k, cfg)
        state_box[0] = s2
        return metrics["loss"]

    dt = timed(train_once, key)
    taco_flops = xla_flops(TT.train_step, state_box[0], batch, key, cfg)
    emit("tacotron_train_step_seconds", dt, "s/step", batch_size=B, frames=T_out,
         **mfu_extra(taco_flops, dt))

    # mixed-precision (bf16 weights / f32 master) train step
    cfg_mp = cfg.override(
        "tacotron_train.mixed_precision=true,wavernn_train.mixed_precision=true"
    )
    mp_box = [TT.init_state(jax.random.PRNGKey(0), cfg_mp)]

    def train_mp(k):
        s2, metrics = TT.train_step(mp_box[0], batch, k, cfg_mp)
        mp_box[0] = s2
        return metrics["loss"]

    dt_mp = timed(train_mp, key)
    taco_flops_mp = xla_flops(TT.train_step, mp_box[0], batch, key, cfg_mp)
    emit("tacotron_train_step_mp_seconds", dt_mp, "s/step", batch_size=B,
         frames=T_out, speedup_vs_f32=round(dt / dt_mp, 3),
         **mfu_extra(taco_flops_mp, dt_mp))

    # large-batch throughput rows: batch is the free utilization lever for a
    # recurrence-bound step (the reference's batch 32 is a 2019-GPU
    # artifact, tacotron_hparams.py:191); B=128 is the measured v5e
    # sweet spot (B=256 regresses: 943 ex/s vs 1176)
    if not args.quick:
        for B_big in (64, 128):
            big = {
                "inputs": jnp.ones((B_big, T_in), jnp.int32),
                "input_lengths": jnp.full((B_big,), T_in, jnp.int32),
                "mel_targets": jnp.zeros((B_big, T_out, 80), jnp.float32),
                "stop_targets": jnp.ones((B_big, T_out), jnp.float32),
                "target_lengths": jnp.full((B_big,), T_out, jnp.int32),
            }
            cfg_big = cfg.override("tacotron_train.scan_unroll=4")
            big_box = [TT.init_state(jax.random.PRNGKey(0), cfg_big)]

            def train_big(k):
                s2, metrics = TT.train_step(big_box[0], big, k, cfg_big)
                big_box[0] = s2
                return metrics["loss"]

            dt_b = timed(train_big, key)
            fl_b = xla_flops(TT.train_step, big_box[0], big, key, cfg_big)
            emit("tacotron_train_step_seconds", dt_b, "s/step", batch_size=B_big,
                 frames=T_out, examples_per_s=round(B_big / dt_b, 1),
                 scan_unroll=4, **mfu_extra(fl_b, dt_b))

    # fused K-step dispatch (train_step_many): amortizes the per-dispatch
    # host RTT; the effective per-step time is dispatch/K
    K = 4 if args.quick else 8
    batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch
    )
    fused_state_box = [TT.init_state(jax.random.PRNGKey(0), cfg)]

    def train_fused(k):
        s2, metrics = TT.train_step_many(fused_state_box[0], batches, k, cfg)
        fused_state_box[0] = s2
        return metrics["loss"]

    dt_k = timed(train_fused, key)
    emit(
        "tacotron_train_step_fused_seconds",
        dt_k / K,
        "s/step",
        batch_size=B,
        frames=T_out,
        steps_per_dispatch=K,
        examples_per_s=round(B * K / dt_k, 1),
    )
    # MARGINAL per-step cost: (K-dispatch - single-dispatch)/(K-1) cancels
    # the ~31 ms axon dispatch constant that inflates every single-call
    # row above (round 4 finding; the true v5e B=32 step is ~31.7 ms, not
    # ~59 — see BASELINE.md "Training-throughput axis")
    dt_marg = max((dt_k - dt) / (K - 1), 1e-9)
    emit("tacotron_train_step_marginal_seconds", dt_marg, "s/step",
         batch_size=B, frames=T_out,
         examples_per_s=round(B / dt_marg, 1),
         **mfu_extra(taco_flops, dt_marg))

    # marginal mixed-precision row: the single-dispatch mp comparison above
    # is diluted by the same dispatch constant (a true 1.3x kernel win would
    # read as ~1.15x there) — this is the honest mp speedup
    def train_mp_many(k):
        s2, metrics = TT.train_step_many(mp_box[0], batches, k, cfg_mp)
        mp_box[0] = s2
        return metrics["loss"]

    dt_mp_k = timed(train_mp_many, key)
    dt_mp_marg = max((dt_mp_k - dt_mp) / (K - 1), 1e-9)
    emit("tacotron_train_step_mp_marginal_seconds", dt_mp_marg, "s/step",
         batch_size=B, frames=T_out,
         speedup_vs_f32_marginal=round(dt_marg / dt_mp_marg, 3),
         **mfu_extra(taco_flops_mp, dt_mp_marg))

    # small-batch fused-kernel regime (fused_decoder="auto" routes B<=16
    # through the Pallas trainer pair on TPU — the speaker-adaptation /
    # fine-tune regime; measured 1.50x over the scan at B=8)
    if on_tpu and not args.quick:
        try:
            B_s = 8
            small = {
                "inputs": jnp.ones((B_s, T_in), jnp.int32),
                "input_lengths": jnp.full((B_s,), T_in, jnp.int32),
                "mel_targets": jnp.zeros((B_s, T_out, 80), jnp.float32),
                "stop_targets": jnp.ones((B_s, T_out), jnp.float32),
                "target_lengths": jnp.full((B_s,), T_out, jnp.int32),
            }
            smalls = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), small
            )
            for fd, label in (("auto", "fused_kernel"), ("off", "xla_scan")):
                cfg_s = cfg.override(f"tacotron_train.fused_decoder={fd}")
                s_box = [TT.init_state(jax.random.PRNGKey(0), cfg_s)]

                def train_s(k, cfg_s=cfg_s, s_box=s_box):
                    s2, m = TT.train_step(s_box[0], small, k, cfg_s)
                    s_box[0] = s2
                    return m["loss"]

                def train_s_many(k, cfg_s=cfg_s, s_box=s_box):
                    s2, m = TT.train_step_many(s_box[0], smalls, k, cfg_s)
                    s_box[0] = s2
                    return m["loss"]

                dt1 = timed(train_s, key)
                dtk = timed(train_s_many, key)
                marg = max((dtk - dt1) / (K - 1), 1e-9)
                emit("tacotron_train_step_small_batch_marginal_seconds", marg,
                     "s/step", batch_size=B_s, path=label,
                     examples_per_s=round(B_s / marg, 1))
        except Exception as e:
            print(f"# small-batch fused train bench skipped: {e}")

    # the documented max-throughput training config: B=128, scan_unroll=4,
    # fused K=4 (measured 1450 ex/s on v5e — 2.3x round 2's best row)
    if not args.quick:
        cfg_max = cfg.override("tacotron_train.scan_unroll=4")
        B_max, K_max = 128, 4
        big = {
            "inputs": jnp.ones((B_max, T_in), jnp.int32),
            "input_lengths": jnp.full((B_max,), T_in, jnp.int32),
            "mel_targets": jnp.zeros((B_max, T_out, 80), jnp.float32),
            "stop_targets": jnp.ones((B_max, T_out), jnp.float32),
            "target_lengths": jnp.full((B_max,), T_out, jnp.int32),
        }
        bigs = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (K_max,) + x.shape), big
        )
        max_box = [TT.init_state(jax.random.PRNGKey(0), cfg_max)]

        def train_max(k):
            s2, metrics = TT.train_step_many(max_box[0], bigs, k, cfg_max)
            max_box[0] = s2
            return metrics["loss"]

        dt_m = timed(train_max, key)
        emit("tacotron_train_max_throughput_examples_per_s", B_max * K_max / dt_m,
             "examples/s", batch_size=B_max, steps_per_dispatch=K_max,
             scan_unroll=4, s_per_step=round(dt_m / K_max, 4))
        # marginal B=128 row (dispatch constant cancelled): dt_b is the
        # single-dispatch B=128 unroll-4 time from the loop above
        dt_marg128 = max((dt_m - dt_b) / (K_max - 1), 1e-9)
        emit("tacotron_train_step_marginal_seconds", dt_marg128, "s/step",
             batch_size=B_max, frames=T_out, scan_unroll=4,
             examples_per_s=round(B_max / dt_marg128, 1),
             **mfu_extra(fl_b, dt_marg128))

    # ---- tacotron AR decode ----------------------------------------------
    # Marginal-rate methodology: (a) random-init params fire the stop token
    # at step 1, so the stop projection bias is forced to -20 to make every
    # step really execute; (b) any single decode is comparable to the ~32 ms
    # tunnel dispatch jitter, so a device-side fori_loop runs REPS full
    # decodes in ONE dispatch and the rate is the time DELTA between two
    # iteration counts divided by the step delta (the RTT and the
    # encoder/postnet fixed cost both cancel).
    params = dict(state_box[0].params)
    params["stop_projection"] = dict(
        params["stop_projection"],
        b=jnp.full_like(params["stop_projection"]["b"], -20.0),
    )
    it_lo, it_hi = (48, 240) if args.quick else (96, 864)
    REPS = 2 if args.quick else 8

    def repeated_decode(it, i_, l_, use_pallas):
        def run(k):
            def body(i, acc):
                out = T.forward_inference(
                    params, cfg.tacotron, i_, l_,
                    jax.random.fold_in(k, i), it,
                    use_pallas_decoder=use_pallas,
                )
                return acc + jnp.sum(out.mel_outputs)

            return jax.lax.fori_loop(0, REPS, body, 0.0)

        return jax.jit(run)

    inputs = jnp.ones((1, T_in), jnp.int32)
    lens = jnp.full((1,), T_in, jnp.int32)
    dt_lo = timed(repeated_decode(it_lo, inputs, lens, False), key)
    dt_hi = timed(repeated_decode(it_hi, inputs, lens, False), key)
    per_step = max((dt_hi - dt_lo) / (REPS * (it_hi - it_lo)), 1e-9)
    emit("tacotron_decoder_steps_per_second", 1.0 / per_step, "steps/s", batch_size=1)
    emit(
        "tacotron_inference_x_realtime",
        (1.0 / per_step) * hop / sr,
        "x_realtime",
        batch_size=1,
    )

    # ---- fused Pallas decoder (the Synthesizer's default TPU path) --------
    # Same device-repeat marginal methodology; B=8 is the kernel's native
    # batch, so that row is the serving aggregate throughput per chip.
    from tacotronv2_wavernn_chinese_tpu.ops import tacotron_decoder_kernel as DK

    if on_tpu and DK.supported(cfg.tacotron) and DK.supported_shape(8, T_in):
        try:
            for Bd in (1, 8):
                ind = jnp.ones((Bd, T_in), jnp.int32)
                lnd = jnp.full((Bd,), T_in, jnp.int32)
                dt_lo = timed(repeated_decode(it_lo, ind, lnd, True), key)
                dt_hi = timed(repeated_decode(it_hi, ind, lnd, True), key)
                per_step = max((dt_hi - dt_lo) / (REPS * (it_hi - it_lo)), 1e-9)
                emit(
                    "tacotron_decoder_kernel_steps_per_second",
                    1.0 / per_step,
                    "steps/s",
                    batch_size=Bd,
                )
                emit(
                    "tacotron_inference_kernel_x_realtime",
                    (1.0 / per_step) * hop / sr * Bd,
                    "x_realtime",
                    batch_size=Bd,
                )
        except Exception as e:  # keep the suite robust on odd backends
            print(f"# pallas decoder bench skipped: {e}")

    # long-sentence mode: anti-repeat constraints ON, T_in=512 (past the old
    # 384 envelope) — the reference's headline feature stays on the kernel
    # path (forward_attention.py:171-215 in-kernel)
    import dataclasses as _dc

    cfg_ar = _dc.replace(cfg.tacotron, anti_repeat=True)
    if on_tpu and DK.supported(cfg_ar) and DK.supported_shape(1, 512, cfg_ar):
        try:
            T_long = 512

            def long_decode(it):
                def run(k):
                    mem = jax.random.normal(
                        jax.random.PRNGKey(0),
                        (1, T_long, 2 * cfg.tacotron.encoder_lstm_units),
                    )

                    def body(i, acc):
                        fr, st, al, sl = DK.decode_autoregressive_pallas(
                            params, cfg_ar, mem, jnp.ones((1, T_long)),
                            jax.random.fold_in(k, i), it,
                        )
                        return acc + jnp.sum(fr)

                    return jax.lax.fori_loop(0, REPS, body, 0.0)

                return jax.jit(run)

            dt_lo = timed(long_decode(it_lo), key)
            dt_hi = timed(long_decode(it_hi), key)
            per_step = max((dt_hi - dt_lo) / (REPS * (it_hi - it_lo)), 1e-9)
            emit(
                "tacotron_decoder_kernel_long_sentence_steps_per_second",
                1.0 / per_step,
                "steps/s",
                batch_size=1, t_in=T_long, anti_repeat=True,
            )
        except Exception as e:
            print(f"# long-sentence kernel bench skipped: {e}")

    # vanilla LSA attention with the synthesis window, in-kernel
    cfg_lsa = _dc.replace(
        cfg.tacotron, attention_mode="lsa", synthesis_constraint=True,
        synthesis_window=3, anti_repeat=True,
    )
    if on_tpu and DK.supported(cfg_lsa):
        try:
            from tacotronv2_wavernn_chinese_tpu.models.tacotron import init_tacotron

            lsa_params = init_tacotron(jax.random.PRNGKey(0), cfg_lsa)
            lsa_params["stop_projection"] = dict(
                lsa_params["stop_projection"],
                b=jnp.full_like(lsa_params["stop_projection"]["b"], -20.0),
            )

            def lsa_decode(it):
                def run(k):
                    mem = jax.random.normal(
                        jax.random.PRNGKey(0),
                        (1, T_in, 2 * cfg.tacotron.encoder_lstm_units),
                    )

                    def body(i, acc):
                        fr, st, al, sl = DK.decode_autoregressive_pallas(
                            lsa_params, cfg_lsa, mem, jnp.ones((1, T_in)),
                            jax.random.fold_in(k, i), it,
                        )
                        return acc + jnp.sum(fr)

                    return jax.lax.fori_loop(0, REPS, body, 0.0)

                return jax.jit(run)

            dt_lo = timed(lsa_decode(it_lo), key)
            dt_hi = timed(lsa_decode(it_hi), key)
            per_step = max((dt_hi - dt_lo) / (REPS * (it_hi - it_lo)), 1e-9)
            emit(
                "tacotron_decoder_kernel_lsa_steps_per_second",
                1.0 / per_step,
                "steps/s",
                batch_size=1, synthesis_window=True,
            )
        except Exception as e:
            print(f"# lsa kernel bench skipped: {e}")

    # r=2 (the reference's own speed knob, tacotron_hparams.py:124
    # outputs_per_step): each kernel step emits TWO mel frames, so the
    # x-realtime rate should beat r=1 even though the widened projections
    # make the step slightly heavier — this row proves the knob pays off
    # end-to-end on the kernel path, not just that r=2 has parity
    cfg_r2 = _dc.replace(cfg.tacotron, outputs_per_step=2)
    if on_tpu and DK.supported(cfg_r2) and DK.supported_shape(1, T_in, cfg_r2):
        try:
            from tacotronv2_wavernn_chinese_tpu.models.tacotron import init_tacotron

            r2_params = init_tacotron(jax.random.PRNGKey(0), cfg_r2)
            r2_params["stop_projection"] = dict(
                r2_params["stop_projection"],
                b=jnp.full_like(r2_params["stop_projection"]["b"], -20.0),
            )

            def r2_decode(it):
                def run(k):
                    mem = jax.random.normal(
                        jax.random.PRNGKey(0),
                        (1, T_in, 2 * cfg.tacotron.encoder_lstm_units),
                    )

                    def body(i, acc):
                        fr, st, al, sl = DK.decode_autoregressive_pallas(
                            r2_params, cfg_r2, mem, jnp.ones((1, T_in)),
                            jax.random.fold_in(k, i), it,
                        )
                        return acc + jnp.sum(fr)

                    return jax.lax.fori_loop(0, REPS, body, 0.0)

                return jax.jit(run)

            dt_lo = timed(r2_decode(it_lo), key)
            dt_hi = timed(r2_decode(it_hi), key)
            per_step = max((dt_hi - dt_lo) / (REPS * (it_hi - it_lo)), 1e-9)
            emit(
                "tacotron_decoder_kernel_r2_steps_per_second",
                1.0 / per_step,
                "steps/s",
                batch_size=1, outputs_per_step=2,
            )
            emit(
                "tacotron_inference_kernel_r2_x_realtime",
                (1.0 / per_step) * 2 * hop / sr,
                "x_realtime",
                batch_size=1, outputs_per_step=2,
            )
        except Exception as e:
            print(f"# r2 kernel bench skipped: {e}")

    # ---- wavernn train step ----------------------------------------------
    from tacotronv2_wavernn_chinese_tpu.train import wavernn_task as WT

    wstate = WT.init_state(jax.random.PRNGKey(0), cfg)
    sf = cfg.wavernn_train.seq_len_hops
    Bw = 8 if args.quick else cfg.wavernn_train.batch_size
    wbatch = {
        "x": jnp.zeros((Bw, sf * hop), jnp.float32),
        "y": jnp.zeros((Bw, sf * hop), jnp.int32),
        "mels": jnp.zeros((Bw, sf + 2 * cfg.wavernn.pad, 80), jnp.float32),
    }

    wstate_box = [wstate]

    def wtrain_once(k):
        s2, metrics = WT.train_step(wstate_box[0], wbatch, cfg)
        wstate_box[0] = s2
        return metrics["loss"]

    dt = timed(wtrain_once, key)
    voc_flops = xla_flops(WT.train_step, wstate_box[0], wbatch, cfg)
    emit("wavernn_train_step_seconds", dt, "s/step", batch_size=Bw,
         seq_len=sf * hop, **mfu_extra(voc_flops, dt))

    # large-batch rows (B=256 OOMs: the fwd+bwd scan saves ~7 GB of
    # activations at seq 1375; B=128 is the practical ceiling)
    if not args.quick:
        for B_big in (64, 128):
            wbig = {
                "x": jnp.zeros((B_big, sf * hop), jnp.float32),
                "y": jnp.zeros((B_big, sf * hop), jnp.int32),
                "mels": jnp.zeros((B_big, sf + 2 * cfg.wavernn.pad, 80), jnp.float32),
            }
            wbig_box = [WT.init_state(jax.random.PRNGKey(0), cfg)]

            def wtrain_big(k):
                s2, metrics = WT.train_step(wbig_box[0], wbig, cfg)
                wbig_box[0] = s2
                return metrics["loss"]

            dt_b = timed(wtrain_big, key)
            fl_b = xla_flops(WT.train_step, wbig_box[0], wbig, cfg)
            emit("wavernn_train_step_seconds", dt_b, "s/step", batch_size=B_big,
                 seq_len=sf * hop, examples_per_s=round(B_big / dt_b, 1),
                 **mfu_extra(fl_b, dt_b))

    wmp_box = [WT.init_state(jax.random.PRNGKey(0), cfg_mp)]

    def wtrain_mp(k):
        s2, metrics = WT.train_step(wmp_box[0], wbatch, cfg_mp)
        wmp_box[0] = s2
        return metrics["loss"]

    dt_mp = timed(wtrain_mp, key)
    voc_flops_mp = xla_flops(WT.train_step, wmp_box[0], wbatch, cfg_mp)
    emit("wavernn_train_step_mp_seconds", dt_mp, "s/step", batch_size=Bw,
         seq_len=sf * hop, speedup_vs_f32=round(dt / dt_mp, 3),
         **mfu_extra(voc_flops_mp, dt_mp))

    wbatches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), wbatch
    )
    wfused_box = [WT.init_state(jax.random.PRNGKey(0), cfg)]

    def wtrain_fused(k):
        s2, metrics = WT.train_step_many(wfused_box[0], wbatches, cfg)
        wfused_box[0] = s2
        return metrics["loss"]

    dt_k = timed(wtrain_fused, key)
    emit(
        "wavernn_train_step_fused_seconds",
        dt_k / K,
        "s/step",
        batch_size=Bw,
        seq_len=sf * hop,
        steps_per_dispatch=K,
        examples_per_s=round(Bw * K / dt_k, 1),
    )
    # marginal per-step (dispatch constant cancelled; see the tacotron row)
    wt_marg = max((dt_k - dt) / (K - 1), 1e-9)
    emit("wavernn_train_step_marginal_seconds", wt_marg, "s/step",
         batch_size=Bw, seq_len=sf * hop,
         examples_per_s=round(Bw / wt_marg, 1),
         **mfu_extra(voc_flops, wt_marg))

    # marginal mixed-precision row (dispatch constant cancelled — see the
    # tacotron mp marginal row)
    wmp_batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), wbatch
    )

    def wtrain_mp_many(k):
        s2, metrics = WT.train_step_many(wmp_box[0], wmp_batches, cfg_mp)
        wmp_box[0] = s2
        return metrics["loss"]

    dt_mp_k = timed(wtrain_mp_many, key)
    wt_mp_marg = max((dt_mp_k - dt_mp) / (K - 1), 1e-9)
    emit("wavernn_train_step_mp_marginal_seconds", wt_mp_marg, "s/step",
         batch_size=Bw, seq_len=sf * hop,
         speedup_vs_f32_marginal=round(wt_marg / wt_mp_marg, 3),
         **mfu_extra(voc_flops_mp, wt_mp_marg))

    # wavernn max-throughput config: B=128 fused K=4 (1070 ex/s measured)
    if not args.quick:
        B_max, K_max = 128, 4
        wbig = {
            "x": jnp.zeros((B_max, sf * hop), jnp.float32),
            "y": jnp.zeros((B_max, sf * hop), jnp.int32),
            "mels": jnp.zeros((B_max, sf + 2 * cfg.wavernn.pad, 80), jnp.float32),
        }
        wbigs = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (K_max,) + x.shape), wbig
        )
        wmax_box = [WT.init_state(jax.random.PRNGKey(0), cfg)]

        def wtrain_max(k):
            s2, metrics = WT.train_step_many(wmax_box[0], wbigs, cfg)
            wmax_box[0] = s2
            return metrics["loss"]

        dt_m = timed(wtrain_max, key)
        emit("wavernn_train_max_throughput_examples_per_s", B_max * K_max / dt_m,
             "examples/s", batch_size=B_max, steps_per_dispatch=K_max,
             s_per_step=round(dt_m / K_max, 4))
        wt_marg128 = max((dt_m - dt_b) / (K_max - 1), 1e-9)
        emit("wavernn_train_step_marginal_seconds", wt_marg128, "s/step",
             batch_size=B_max, seq_len=sf * hop,
             examples_per_s=round(B_max / wt_marg128, 1),
             **mfu_extra(fl_b, wt_marg128))

    # ---- wavernn generation ----------------------------------------------
    T_mel = 500 if args.quick else 3000
    mel = np.random.RandomState(base % 991).rand(T_mel, 80).astype(np.float32)
    folds, n_folds = W.fold_with_overlap(
        mel, cfg.wavernn_gen.target // hop, cfg.wavernn_gen.overlap // hop
    )
    folds = jnp.asarray(
        np.stack([W.pad_mel_for_generation(f, cfg.wavernn.pad) for f in folds])
    )
    audio_s = T_mel * hop / sr  # deliverable audio (overlaps/padding excluded)
    wp = wstate_box[0].params

    dt = timed(lambda k: W.generate_scan(wp, cfg.wavernn, folds, k, cfg.audio.bits), key)
    emit("wavernn_gen_scan_x_realtime", audio_s / dt, "x_realtime", folds=n_folds)

    # MOL output mode rides the same scan path (the fused kernel is
    # RAW-only — BASELINE.md scope note; the reference ships RAW,
    # wavernn_hparams.py:27-36).  This row puts a measured number on that
    # scope note (reference MOL sampling: wavernn/utils/distribution.py:72-123).
    if not args.quick:
        cfg_mol = cfg.override("wavernn.mode=MOL")
        wp_mol = WT.init_state(jax.random.PRNGKey(0), cfg_mol).params
        dt_mol = timed(
            lambda k: W.generate_scan(wp_mol, cfg_mol.wavernn, folds, k, cfg_mol.audio.bits),
            key,
        )
        emit("wavernn_gen_scan_mol_x_realtime", audio_s / dt_mol, "x_realtime",
             folds=n_folds)

    if on_tpu:
        try:
            from tacotronv2_wavernn_chinese_tpu.ops import wavernn_kernel as K

            dt = timed(
                lambda k: K.generate_pallas(wp, cfg.wavernn, folds, k, cfg.audio.bits), key
            )
            emit("wavernn_gen_pallas_x_realtime", audio_s / dt, "x_realtime", folds=n_folds)
        except Exception as e:  # non-TPU accelerators can't run the Mosaic kernel
            print(f"# pallas generation skipped: {e}")

    # ---- single-utterance TTS latency (time-to-audio) ---------------------
    # The interactive serving figure (reference tacotron_synthesize.py:200):
    # one ~3.7 s sentence end-to-end — AR decode (fused kernel on TPU, the
    # Synthesizer's default path) + postnet + WaveRNN at the reference's OWN
    # default fold geometry (target 11000 / overlap 550, wavernn_hparams
    # 55-57).  Wall-clock per call, dispatch RTT included (~32 ms/dispatch
    # through the axon tunnel; a colocated server would not pay it).
    lat_iters = 100 if args.quick else 300  # mel frames -> 300*275/22050=3.74 s
    lat_Tin = 64
    lat_inputs = jnp.ones((1, lat_Tin), jnp.int32)
    lat_lens = jnp.full((1,), lat_Tin, jnp.int32)
    use_kernel = on_tpu and DK.supported(cfg.tacotron) and DK.supported_shape(1, lat_Tin)

    lat_decode = jax.jit(
        lambda k: T.forward_inference(
            params, cfg.tacotron, lat_inputs, lat_lens, k, lat_iters,
            use_pallas_decoder=use_kernel,
        ).mel_outputs
    )
    from tacotronv2_wavernn_chinese_tpu.dsp.spectrogram import mel_to_unit

    def tts_once(k):
        mel = lat_decode(k)
        sync(mel)  # the Synthesizer's host boundary: trim-at-stop runs on host
        # the vocoder's unit-range contract (infer/synthesizer.py:154)
        m = np.asarray(mel_to_unit(mel[0], cfg.audio))
        lf, _ = W.fold_with_overlap(
            m, cfg.wavernn_gen.target // hop, cfg.wavernn_gen.overlap // hop
        )
        lf = jnp.asarray(np.stack([W.pad_mel_for_generation(f, cfg.wavernn.pad) for f in lf]))
        if on_tpu:
            from tacotronv2_wavernn_chinese_tpu.ops import wavernn_kernel as WK

            return WK.generate_pallas(wp, cfg.wavernn, lf, k, cfg.audio.bits)
        return W.generate_scan(wp, cfg.wavernn, lf, k, cfg.audio.bits)

    try:
        dt = timed(tts_once, jax.random.fold_in(key, 999))
        lat_audio_s = lat_iters * hop / sr
        emit("tts_latency_ms", dt * 1000.0, "ms", audio_seconds=round(lat_audio_s, 2),
             x_realtime=round(lat_audio_s / dt, 2), decoder="pallas" if use_kernel else "xla",
             fold_target=cfg.wavernn_gen.target, fold_overlap=cfg.wavernn_gen.overlap)
    except Exception as e:  # never lose the already-measured rows
        print(f"# tts latency bench skipped: {e}")

    # ---- Griffin-Lim reconstruction (the no-vocoder serving path) ---------
    # On TPU the 60-iteration loop runs as MXU matmul-DFTs with dense block
    # overlap-add + associative-scan de-emphasis (dsp/griffin_lim.py); XLA's
    # TPU FFT lowering took ~0.95 s for the same program.
    try:
        from tacotronv2_wavernn_chinese_tpu.dsp.griffin_lim import inv_mel_spectrogram

        pipe_gl = MelPipeline(cfg.audio)
        gl_jit = jax.jit(lambda m: inv_mel_spectrogram(m, pipe_gl))
        gl_mel = jnp.asarray(
            np.random.RandomState(5).uniform(-4, 4, (256, 80)).astype(np.float32)
        )
        dt = timed(lambda k: gl_jit(gl_mel + 1e-6 * jax.random.uniform(k, ())), key)
        gl_audio = 256 * hop / sr
        emit("griffin_lim_reconstruction_ms", dt * 1000.0, "ms", frames=256,
             iters=cfg.audio.griffin_lim_iters, audio_seconds=round(gl_audio, 2),
             x_realtime=round(gl_audio / dt, 2))
    except Exception as e:
        print(f"# griffin-lim bench skipped: {e}")

    out = "bench_suite_results.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
