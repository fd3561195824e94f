"""Round-4 experiment: where does the fused trainer-kernel time go?

Times, on the real chip (B=32, T_out=512, T_in=64 — the round-3 comparison
point where the XLA scan measured 59.4 ms/step and the fused path 74.7):

  - the XLA-scan whole train step (baseline)
  - the fused whole train step (current kernel pair)
  - the forward kernel ALONE (per group size x stream chunk)
  - the backward kernel ALONE (same sweep, dummy cotangents)
  - the outside weight-gradient einsums ALONE (dummy adjoint streams)

so the in-kernel weight-grad-accumulation redesign starts from measured
stage costs instead of the round-3 whole-step deltas.

Usage: python -m tools.exp_trainer_kernel [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache


def sync(x) -> float:
    return float(np.asarray(jnp.sum(x)))


def timed(f, key, reps=3):
    sync(f(key))
    ts = []
    for i in range(reps):
        t0 = time.time()
        sync(f(jax.random.fold_in(key, i + 1)))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="exp_trainer_kernel.json")
    args = ap.parse_args()
    enable_compile_cache()

    from tacotronv2_wavernn_chinese_tpu.models import attention as ATT
    from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
    from tacotronv2_wavernn_chinese_tpu.ops import tacotron_trainer_kernel as TK
    from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as TT

    cfg0 = default_config()
    mcfg = cfg0.tacotron
    key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
    rows = []

    def emit(**row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    B, T_in, T_out = 32, 64, 512
    T_dec = T_out  # r=1
    u = mcfg.decoder_lstm_units
    V = 2 * mcfg.encoder_lstm_units
    A = mcfg.attention_dim
    pre = mcfg.prenet_layers[-1]
    taps = mcfg.attention_kernel

    params = T.init_tacotron(jax.random.PRNGKey(0), mcfg)

    batch = {
        "inputs": jnp.ones((B, T_in), jnp.int32),
        "input_lengths": jnp.full((B,), T_in, jnp.int32),
        "mel_targets": jnp.zeros((B, T_out, 80), jnp.float32),
        "stop_targets": jnp.ones((B, T_out), jnp.float32),
        "target_lengths": jnp.full((B,), T_out, jnp.int32),
    }

    # the round-3 stream layout needs XLA's scoped-VMEM limit raised for
    # its [T, B, 4u] adjoint streams at 16-row groups; accum does not —
    # that is the point.  Applied per-jit (the env flag is rejected).
    OPTS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    step_scoped = jax.jit(
        TT.train_step.__wrapped__, static_argnames=("cfg",),
        donate_argnums=(0,), compiler_options=OPTS,
    )

    # ---- whole-step rows --------------------------------------------------
    for mode, wg in (("off", "-"), ("on", "stream"), ("on", "accum")):
        cfg = cfg0.override(
            f"tacotron_train.fused_decoder={mode}"
            + (f",tacotron_train.fused_wgrads={wg}" if wg != "-" else "")
        )
        state = TT.init_state(jax.random.PRNGKey(0), cfg)
        box = [state]
        step = step_scoped if wg == "stream" else TT.train_step

        def once(k, step=step, cfg=cfg):
            s2, m = step(box[0], batch, k, cfg)
            box[0] = s2
            return m["loss"]

        try:
            dt = timed(once, key)
        except Exception as e:
            emit(exp="whole_step", fused=mode, wgrads=wg, error=str(e)[:200])
            continue
        emit(exp="whole_step", fused=mode, wgrads=wg, batch=B, t_out=T_out,
             ms=round(1000 * dt, 2))

    # ---- kernel-stage rows ------------------------------------------------
    # inputs shaped like the real call: prenet sequence + zoneout masks
    kseq = jax.random.fold_in(key, 99)
    pre_seq = jax.random.normal(kseq, (T_dec, B, pre))
    masks = tuple(
        (jax.random.uniform(jax.random.fold_in(kseq, i), (T_dec, B, u)) > 0.1)
        .astype(jnp.float32)
        for i in range(4)
    )
    memory = jax.random.normal(jax.random.fold_in(kseq, 7), (B, T_in, V))
    keys_p = ATT.precompute_keys(params["attention"], mcfg, memory)
    mem_mask = jnp.ones((B, T_in))

    att = params["attention"]
    l1 = params["dec_lstm1"]["w"]
    l2 = params["dec_lstm2"]["w"]
    w_loc = att["location_layer"]["w"]
    w_conv = att["location_conv"]["w"][:, 0]
    ball = (jnp.matmul(att["location_conv"]["b"], w_loc) + att["b"])[None]
    weights = (
        l1[:pre], l1[pre : pre + V], l1[pre + V :], params["dec_lstm1"]["b"][None],
        l2[:u], l2[u:], params["dec_lstm2"]["b"][None],
        att["query_layer"]["w"], w_conv, w_loc, ball, att["v"][None],
        att["mu_layer"]["w"][:V], att["mu_layer"]["w"][V:], att["mu_layer"]["b"][None],
    )

    group_chunks = [(8, 8), (8, 16), (16, 4), (16, 8)] if not args.quick else [(16, 4)]
    for Bg, chunk in group_chunks:
        static = (
            Bg, T_in, T_dec, chunk, pre, u, V, A, taps,
            float(mcfg.zoneout_rate), True, False, "bf16",
        )
        n_groups = B // Bg
        g_slices = [slice(s, s + Bg) for s in range(0, B, Bg)]

        def fwd_only(k, static=static, g_slices=g_slices):
            # fold the key into the prenet stream so repeated timed calls
            # are distinct programs executions; distinct group slices keep
            # XLA from CSE-merging the sequential group calls
            eps = jax.random.uniform(k, ()) * 0.0
            acc = 0.0
            for sl in g_slices:
                outs = TK._fwd_call(
                    static, weights, pre_seq[:, sl] + eps,
                    tuple(m[:, sl] for m in masks),
                    keys_p[sl], memory[sl], mem_mask[sl],
                )
                acc = acc + jnp.sum(outs[0])
            return acc

        try:
            dt_f = timed(jax.jit(fwd_only, compiler_options=OPTS), key)
        except Exception as e:
            emit(exp="fwd_only", group=Bg, chunk=chunk, error=str(e)[:200])
            continue
        emit(exp="fwd_only", group=Bg, chunk=chunk, n_groups=n_groups,
             ms=round(1000 * dt_f, 2),
             us_per_group_step=round(1e6 * dt_f / (T_dec * n_groups), 2))

        # backward alone: saves from one forward per group, dummy cotangents
        sl0 = g_slices[0]
        saves = jax.jit(
            lambda static=static, sl=sl0: TK._fwd_call(
                static, weights, pre_seq[:, sl],
                tuple(m[:, sl] for m in masks),
                keys_p[sl], memory[sl], mem_mask[sl],
            )
        )()
        saves = tuple(saves)

        for wg in ("stream", "accum"):
            static_wg = static + (wg,)

            def bwd_only(k, static=static_wg, g_slices=g_slices):
                eps = jax.random.uniform(k, ()) * 0.0
                acc = 0.0
                for gi, sl in enumerate(g_slices):
                    cots = (
                        jnp.full((T_dec, Bg, u), 1e-3 * (gi + 1)) + eps,
                        jnp.full((T_dec, Bg, V), 1e-3),
                        jnp.full((T_dec, Bg, T_in), 1e-3),
                    )
                    outs = TK._bwd_call(
                        static, weights, pre_seq[:, sl],
                        tuple(m[:, sl] for m in masks),
                        keys_p[sl0], memory[sl0], mem_mask[sl0], saves, cots,
                    )
                    acc = acc + jnp.sum(outs[0])
                return acc

            try:
                opts = OPTS if wg == "stream" else None
                dt_b = timed(jax.jit(bwd_only, compiler_options=opts), key)
            except Exception as e:
                emit(exp="bwd_only", wg=wg, group=Bg, chunk=chunk, error=str(e)[:200])
                continue
            emit(exp="bwd_only", wg=wg, group=Bg, chunk=chunk, n_groups=n_groups,
                 ms=round(1000 * dt_b, 2),
                 us_per_group_step=round(1e6 * dt_b / (T_dec * n_groups), 2))

    # ---- outside einsums alone (the weight-gradient reduction) ------------
    Bg = 8
    T_pad = T_dec

    def einsums(k):
        d_g1 = jax.random.normal(k, (T_pad, Bg, 4 * u))
        d_g2 = d_g1 + 1.0
        d_q = jnp.ones((T_pad, Bg, A))
        d_mulin = jnp.ones((T_pad, Bg))
        d_ctx_tot = jnp.ones((T_pad, Bg, V))
        p_pad = pre_seq[:, :Bg]
        ctxp_s = jnp.ones((T_pad, Bg, V))
        h1p_s = jnp.ones((T_pad, Bg, u))
        out1_s = jnp.ones((T_pad, Bg, u))
        h2p_s = jnp.ones((T_pad, Bg, u))
        out2_s = jnp.ones((T_pad, Bg, u))
        ctx_s = jnp.ones((T_pad, Bg, V))
        align_s = jnp.ones((T_pad, Bg, T_in))
        hp = "highest"
        outs = [
            jnp.einsum("tbp,tbg->pg", p_pad, d_g1, precision=hp),
            jnp.einsum("tbv,tbg->vg", ctxp_s, d_g1, precision=hp),
            jnp.einsum("tbu,tbg->ug", h1p_s, d_g1, precision=hp),
            jnp.einsum("tbu,tbg->ug", out1_s, d_g2, precision=hp),
            jnp.einsum("tbu,tbg->ug", h2p_s, d_g2, precision=hp),
            jnp.einsum("tbu,tba->ua", out2_s, d_q, precision=hp),
            jnp.einsum("tbv,tb->v", ctx_s, d_mulin, precision=hp),
            jnp.einsum("tbg,pg->tbp", d_g1, weights[0].astype(jnp.float32), precision=hp),
            jnp.einsum("tbi,tbv->biv", align_s, d_ctx_tot, precision=hp),
        ]
        return sum(jnp.sum(o) for o in outs)

    dt_e = timed(jax.jit(einsums), key)
    emit(exp="outside_einsums", group=Bg, ms=round(1000 * dt_e, 2),
         note="per 8-row group; x(B/8) for the whole batch")

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"# wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
