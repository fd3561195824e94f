"""Device-repeat MARGINAL timing sweep for the fused trainer kernels.

Each row runs the workload R times inside one jitted fori_loop and reports
(t_R6 - t_R2)/4 — no dispatch-RTT pollution, no cross-call XLA overlap
ambiguity.  Sweeps accum_bwd_chunk x saves_dtype, with the XLA scan's
whole-step marginal as the target.

Usage: python -m tools.exp_tk_sweep
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache
from tools.benchlib import sync, timed






def main():
    enable_compile_cache()
    from tacotronv2_wavernn_chinese_tpu.models import attention as ATT
    from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
    from tacotronv2_wavernn_chinese_tpu.ops import tacotron_trainer_kernel as TK
    from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as TT

    cfg0 = default_config()
    cfg = cfg0.tacotron
    key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
    rows = []

    def emit(**row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    B, T_in, T_dec = 32, 64, 512
    u, V, A = cfg.decoder_lstm_units, 2 * cfg.encoder_lstm_units, cfg.attention_dim
    pre, taps = cfg.prenet_layers[-1], cfg.attention_kernel
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg)
    weights = TK.pack_core_weights(params, cfg)
    pre_seq = jax.random.normal(jax.random.PRNGKey(1), (T_dec, B, pre))
    masks = tuple(jnp.ones((T_dec, B, u)) for _ in range(4))
    memory = jax.random.normal(jax.random.PRNGKey(2), (B, T_in, V))
    keys_p = ATT.precompute_keys(params["attention"], cfg, memory)
    mm_full = jnp.ones((B, T_in))
    sl0 = slice(0, 8)

    def marginal(make_run, label, **tags):
        """make_run(R) -> jitted fn(key); report (t6 - t2)/4 per rep."""
        try:
            t2 = timed(make_run(2), key)
            t6 = timed(make_run(6), key)
        except Exception as e:
            emit(exp=label, error=str(e)[:160], **tags)
            return None
        ms = 1000 * (t6 - t2) / 4
        emit(exp=label, ms_marginal=round(ms, 2), ms_abs2=round(1000 * t2, 1), **tags)
        return ms

    # ---- whole-step XLA marginal (the target) -----------------------------
    batch = {
        "inputs": jnp.ones((B, T_in), jnp.int32),
        "input_lengths": jnp.full((B,), T_in, jnp.int32),
        "mel_targets": jnp.zeros((B, T_dec, 80), jnp.float32),
        "stop_targets": jnp.ones((B, T_dec), jnp.float32),
        "target_lengths": jnp.full((B,), T_dec, jnp.int32),
    }

    def make_whole(mode, wg):
        c = cfg0.override(
            "tacotron_train.fused_decoder=%s" % mode
            + (",tacotron_train.fused_wgrads=%s" % wg if wg != "-" else "")
        )
        state0 = TT.init_state(jax.random.PRNGKey(0), c)

        def make_run(R):
            def run(k):
                def body(i, st):
                    st2, m = TT.train_step.__wrapped__(
                        st, batch, jax.random.fold_in(k, i), c
                    )
                    return st2
                stF = jax.lax.fori_loop(0, R, body, state0)
                return stF.params["embedding"]
            return jax.jit(run)
        return make_run

    for mode, wg in (("off", "-"), ("on", "accum")):
        marginal(make_whole(mode, wg), "whole_step", fused=mode, wgrads=wg)

    # ---- kernel-stage marginals over the TUNE sweep -----------------------
    # wide-group rows: one 16/32-row group instead of 2-4 sequential 8-row
    # groups — the MXU K-streaming cycles are row-count-independent
    for nrows in (16, 32):
        TK.TUNE["saves_dtype"] = "kernel"
        TK.TUNE["accum_bwd_chunk"] = 4
        slg = slice(0, nrows)
        static_g = (
            nrows, T_in, T_dec, 8, pre, u, V, A, taps,
            float(cfg.zoneout_rate), True, False, "bf16", "accum",
        )

        def make_fwd_g(R, static=static_g, slg=slg):
            def run(k):
                def body(i, acc):
                    outs = TK._fwd_call(
                        static, weights,
                        pre_seq[:, slg] + jnp.float32(i) * 0,
                        tuple(m[:, slg] for m in masks),
                        keys_p[slg], memory[slg], mm_full[slg],
                    )
                    return acc + jnp.sum(outs[0])
                return jax.lax.fori_loop(0, R, body, 0.0)
            return jax.jit(run)

        marginal(make_fwd_g, "fwd_wide", rows=nrows)
        try:
            saves_g = tuple(
                jax.jit(lambda static=static_g, slg=slg: TK._fwd_call(
                    static, weights, pre_seq[:, slg],
                    tuple(m[:, slg] for m in masks),
                    keys_p[slg], memory[slg], mm_full[slg],
                ))()
            )
        except Exception as e:
            emit(exp="bwd_wide", rows=nrows, error=str(e)[:160])
            continue

        def make_bwd_g(R, static=static_g, slg=slg, saves=saves_g, rows=nrows):
            def run(k):
                def body(i, acc):
                    cots = (
                        jnp.full((T_dec, rows, u), 1e-3) + jnp.float32(i) * 0,
                        jnp.full((T_dec, rows, V), 1e-3),
                        jnp.full((T_dec, rows, T_in), 1e-3),
                    )
                    outs = TK._bwd_call(
                        static, weights, pre_seq[:, slg],
                        tuple(m[:, slg] for m in masks),
                        keys_p[slg], memory[slg], mm_full[slg], saves, cots,
                    )
                    return acc + jnp.sum(outs[2])
                return jax.lax.fori_loop(0, R, body, 0.0)
            return jax.jit(run)

        marginal(make_bwd_g, "bwd_wide", rows=nrows)

    for saves_dt in ("kernel", "f32"):
        for bwd_chunk in (4, 8):
            TK.TUNE["saves_dtype"] = saves_dt
            TK.TUNE["accum_bwd_chunk"] = bwd_chunk
            static = (
                8, T_in, T_dec, 8, pre, u, V, A, taps,
                float(cfg.zoneout_rate), True, False, "bf16", "accum",
            )

            def make_fwd(R, static=static):
                def run(k):
                    def body(i, acc):
                        outs = TK._fwd_call(
                            static, weights,
                            pre_seq[:, sl0] + jnp.float32(i) * 0,
                            tuple(m[:, sl0] for m in masks),
                            keys_p[sl0], memory[sl0], mm_full[sl0],
                        )
                        return acc + jnp.sum(outs[0])
                    return jax.lax.fori_loop(0, R, body, 0.0)
                return jax.jit(run)

            if bwd_chunk == 4:  # fwd doesn't depend on bwd_chunk
                marginal(make_fwd, "fwd_8row", saves=saves_dt)

            saves = tuple(
                jax.jit(lambda static=static: TK._fwd_call(
                    static, weights, pre_seq[:, sl0],
                    tuple(m[:, sl0] for m in masks),
                    keys_p[sl0], memory[sl0], mm_full[sl0],
                ))()
            )

            def make_bwd(R, static=static, saves=saves):
                def run(k):
                    def body(i, acc):
                        cots = (
                            jnp.full((T_dec, 8, u), 1e-3) + jnp.float32(i) * 0,
                            jnp.full((T_dec, 8, V), 1e-3),
                            jnp.full((T_dec, 8, T_in), 1e-3),
                        )
                        outs = TK._bwd_call(
                            static, weights, pre_seq[:, sl0],
                            tuple(m[:, sl0] for m in masks),
                            keys_p[sl0], memory[sl0], mm_full[sl0], saves, cots,
                        )
                        return acc + jnp.sum(outs[2])
                    return jax.lax.fori_loop(0, R, body, 0.0)
                return jax.jit(run)

            marginal(make_bwd, "bwd_accum_8row", saves=saves_dt, bwd_chunk=bwd_chunk)

    # stream-mode backward reference (chunk 8, f32 streams)
    TK.TUNE["saves_dtype"] = "kernel"
    TK.TUNE["accum_bwd_chunk"] = 4
    static_s = (
        8, T_in, T_dec, 8, pre, u, V, A, taps,
        float(cfg.zoneout_rate), True, False, "bf16", "stream",
    )
    saves_s = tuple(
        jax.jit(lambda: TK._fwd_call(
            static_s, weights, pre_seq[:, sl0],
            tuple(m[:, sl0] for m in masks),
            keys_p[sl0], memory[sl0], mm_full[sl0],
        ))()
    )

    def make_bwd_stream(R):
        def run(k):
            def body(i, acc):
                cots = (
                    jnp.full((T_dec, 8, u), 1e-3) + jnp.float32(i) * 0,
                    jnp.full((T_dec, 8, V), 1e-3),
                    jnp.full((T_dec, 8, T_in), 1e-3),
                )
                outs = TK._bwd_call(
                    static_s, weights, pre_seq[:, sl0],
                    tuple(m[:, sl0] for m in masks),
                    keys_p[sl0], memory[sl0], mm_full[sl0], saves_s, cots,
                )
                return acc + jnp.sum(outs[0])
            return jax.lax.fori_loop(0, R, body, 0.0)
        return jax.jit(run, compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"})
    marginal(make_bwd_stream, "bwd_stream_8row")

    with open("exp_tk_sweep.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("# wrote exp_tk_sweep.json", flush=True)


if __name__ == "__main__":
    main()
