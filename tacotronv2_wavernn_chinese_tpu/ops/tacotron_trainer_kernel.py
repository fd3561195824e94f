"""Pallas TPU kernels: fused teacher-forced Tacotron decoder TRAINING path.

The teacher-forced decoder scan dominates training wall-clock (the XLA scan
runs ~100 us per fwd+bwd step pair at B=32 on v5e; reference lifetime
compute is 300k such steps, tacotron_train.py:55).  This module runs the
serial per-step chain — 2x zoneout LSTM + forward/location-sensitive
attention — as TWO Pallas kernels (forward with activation saves, backward
over the reverse scan) wired together with ``jax.custom_vjp``:

  * The kernels own ONLY the serial dependence: per-step gate matmuls,
    attention energy (combined location conv, models/attention.py:138-157),
    softmax, the forward recursion, context/mu updates, and in backward the
    adjoint chain (LSTM/zoneout/softmax/recursion backward + the location
    conv transpose).  All recurrent state and adjoint state stays in VMEM.
  * Everything batchable is OUTSIDE the kernels, where XLA runs it as
    large MXU matmuls: the prenet (pre-scan) and the frame/stop
    projections (post-scan).  Weight gradients follow
    ``tacotron_train.fused_wgrads``: "accum" (default) reduces each
    chunk's gate/query adjoints against the activation blocks already in
    VMEM (one [chunk*B, in] x [chunk*B, 4u] MXU contraction per weight
    segment per chunk) so they never leave the kernel; "stream" (the
    round-3 layout) streams per-step adjoint vectors to HBM and reduces
    them outside as [T*B, in] x [T*B, out] einsums.

Scope (train_supported): 'forward' attention (the ACTIVE reference
configuration, tacotron/models/attention.py:66-231), softmax normalization
(no smoothing), full teacher forcing (ratio 1.0 — the reference's effective
behavior, helpers.py:136-142), any outputs_per_step (projections live
outside), train-mode zoneout masks streamed in (bit-identical streams to
the XLA path's StepRand) or eval-mode EMA (the GTA bridge).  Everything
else falls back to the XLA scan.

Batches beyond the Mosaic tile envelope (B > 8) run as sequential 8-row
groups (same constraint as ops/tacotron_decoder_kernel.py); group calls are
independent custom-vjp instances, so JAX sums their weight cotangents.

Parity: tests/test_tacotron_trainer_kernel.py checks interpret-mode value
AND gradient parity against the XLA scan (jax.grad through both paths).

MEASURED STATUS (round 4; v5e, T_out=512, T_in=64, MARGINAL whole-step
cost via device-side repetition — single-dispatch timings through the axon
tunnel carry a ~31.4 ms constant that inflated every round-3 number):

  whole train step, XLA scan vs fused (wgrads="accum"):
      B=8   18.2 ms  vs  12.1 ms   -> fused WINS 1.50x
      B=16  23.0 ms  vs  22.7 ms   -> parity
      B=32  31.7 ms  vs  43.6 ms   -> scan wins (4 sequential 8-row groups)

  ``fused_decoder`` therefore defaults to "auto": fused on TPU for
  B <= fused_auto_max_batch (16), the scan above.  The scan's per-step HBM
  weight restream is B-independent, so small batches (the reference's
  speaker-adaptation/fine-tune regime, tacotron.py:167-169) pay it
  undiluted and the VMEM-resident kernel wins; at B=32 the kernel's
  sequential Mosaic groups lose.  Per-group marginals: forward 2.16 ms
  (4.2 us/step — at the inference kernel's efficiency), backward 7.35 ms
  (3.4x forward: the attention backward's VPU/relayout work + skinny
  [8, .] matmuls at ~6% MXU row utilization).

  Structural attacks measured across rounds 3-4, for the record:
  * F-width conv factoring (r3): ~10% on the forward; VPU-bound.
  * im2col+MXU conv (r3): slower (per-lane staging relayouts).
  * In-kernel weight-grad accumulation (r4, wg="accum", this module):
    per-chunk [chunk*B, in] x [chunk*B, 4u] MXU reductions against
    in-VMEM activation blocks; bf16 residual saves/streams/accumulators.
    Whole-step ~equal to the stream layout at 8 rows (7.35 vs 7.27 ms/
    group backward — the streams were never the 8-row bottleneck) but
    structurally better: no [T, B, 4u] adjoint streams, no scoped-vmem
    compiler override, ~5 ms faster at B=32 whole-step.
  * Wider Mosaic groups (r4): forward is VPU-bound (16 rows = 2x the
    8-row cost, no amortization); accum backward at 16 rows needs 24.9 MB
    VMEM (> 16) from row-scaled temporaries.
  The serial recurrence floor (~3 us/step of chained matmul latency) is
  ~5x below BOTH paths; neither implementation is latency-bound, and no
  remaining single idea is sized to close the B=32 gap (see BASELINE.md
  "Training-throughput axis: closure").
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TacotronModelConfig

Params = Dict[str, Any]

# experiment knobs (read at trace time; defaults are the production tuning)
TUNE = {
    # accum-mode backward stream chunk; 4 has the most VMEM headroom,
    # 8 gives K=64 chunk reductions
    "accum_bwd_chunk": 4,
    # accum-mode Mosaic group rows: every [rows, .] matmul pays the same
    # K-streaming cycles regardless of rows <= 128, so wider groups
    # amortize the MXU chain across rows instead of serializing groups
    "accum_group": 8,
    # residual saves dtype: "kernel" follows the weight dtype (bf16 on the
    # perf path), "f32" forces full-precision saves
    "saves_dtype": "kernel",
}


def train_supported(cfg: TacotronModelConfig) -> bool:
    return (
        cfg.attention_mode == "forward"
        and not cfg.smoothing
        and len(cfg.prenet_layers) == 2
        and cfg.attention_kernel <= 65  # conv subtile vreg bound
        and cfg.attention_dim <= 128  # loc features accumulate in one lane tile
    )


def train_supported_shape(batch: int, t_in: int, cfg: TacotronModelConfig | None = None) -> bool:
    """VMEM envelope for the backward kernel (the bigger of the two): keys +
    values + d_keys + weights + chunked streams.  T_in <= 256 keeps the
    d_keys accumulator and kv residency comfortably under budget at the
    8-row group size."""
    return t_in <= 256


# weight tensors the core differentiates through, in kernel argument order.
# The location conv stays at F width ([taps, F], F=attention_filters) with a
# separate F->A location dense ([F, A]) applied as ONE MXU matmul per
# subtile — the inference kernel's layout.  The first cut folded conv∘dense
# into a combined [taps, A] kernel, which made every unrolled tap temporary
# A-wide: 4x the VPU work and the VMEM blow-up that kept B=32 single-group
# off the table (21.4 MB scoped at stream chunk 4).
CORE_WEIGHTS = (
    "l1_pre", "l1_ctx", "l1_h", "l1_b",
    "l2_x", "l2_h", "l2_b",
    "wq", "w_conv", "w_loc", "ball", "v",
    "mu_c", "mu_q", "mu_b",
)

def pack_core_weights(params: Params, cfg: TacotronModelConfig):
    """Build the CORE_WEIGHTS tuple from a params tree — shared by
    ``fused_core_apply`` and the bench/experiment tools so the segment
    slicing cannot diverge.  The location-conv bias rides through the F->A
    dense into one merged energy bias, built OUTSIDE the kernel so its
    cotangent chains to the original params."""
    pre = cfg.prenet_layers[-1]
    u = cfg.decoder_lstm_units
    att = params["attention"]
    l1 = params["dec_lstm1"]["w"]
    l2 = params["dec_lstm2"]["w"]
    V = l1.shape[0] - pre - u
    w_loc = att["location_layer"]["w"]           # [F, A]
    w_conv = att["location_conv"]["w"][:, 0]     # [taps, 1, F] -> [taps, F]
    ball = (
        jnp.matmul(att["location_conv"]["b"], w_loc, precision="highest") + att["b"]
    )[None]
    return (
        l1[:pre], l1[pre : pre + V], l1[pre + V :], params["dec_lstm1"]["b"][None],
        l2[:u], l2[u:], params["dec_lstm2"]["b"][None],
        att["query_layer"]["w"], w_conv, w_loc, ball, att["v"][None],
        att["mu_layer"]["w"][:V], att["mu_layer"]["w"][V:], att["mu_layer"]["b"][None],
    )


# forward kernel output order: primals then residual saves
FWD_OUTS = (
    "out2", "ctx", "align",  # primal outputs
    "align_sm", "out1", "c1p", "h1p", "c2p", "h2p", "ctxp", "alphap", "mup",
)


def _mm(x, wref):
    return jnp.dot(x.astype(wref.dtype), wref[:], preferred_element_type=jnp.float32)


def _mmT(x, wref):
    """x [B, out] . W^T for W [in, out] -> [B, in]."""
    return jax.lax.dot_general(
        x.astype(wref.dtype), wref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _lstm_gates_fwd(g, c_prev):
    u = c_prev.shape[-1]
    si = jax.nn.sigmoid(g[:, :u])
    tj = jnp.tanh(g[:, u : 2 * u])
    sf = jax.nn.sigmoid(g[:, 2 * u : 3 * u] + 1.0)
    so = jax.nn.sigmoid(g[:, 3 * u :])
    new_c = sf * c_prev + si * tj
    new_h = so * jnp.tanh(new_c)
    return si, tj, sf, so, new_c, new_h


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(p_ref, mc1_ref, mh1_ref, mc2_ref, mh2_ref, keys_ref, values_ref,
                mask_ref, *rest, chunk: int, dims: tuple):
    (B, T_in, pre, u, V, A, taps, zoneout, use_masks) = dims
    W = dict(zip(CORE_WEIGHTS, rest[: len(CORE_WEIGHTS)]))
    outs = dict(zip(FWD_OUTS, rest[len(CORE_WEIGHTS) : len(CORE_WEIGHTS) + len(FWD_OUTS)]))
    (c1S, h1S, c2S, h2S, ctxS, alphaS, cumS, muS, energyS, shiftS, winS) = rest[
        len(CORE_WEIGHTS) + len(FWD_OUTS) :
    ]
    f32 = jnp.float32
    padl = (taps - 1) // 2

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (c1S, h1S, c2S, h2S, ctxS):
            ref[:] = jnp.zeros_like(ref)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, T_in), 1)
        one_hot = jnp.where(col == 0, 1.0, 0.0).astype(f32)
        alphaS[:] = one_hot
        cumS[:] = one_hot
        muS[:] = jnp.zeros_like(muS)
        muS[:, 0] = jnp.full((B,), 0.5, f32)
        shiftS[:] = jnp.zeros_like(shiftS)

    def zmix(new, prev, m):
        # train: carry = mask*new + (1-mask)*prev (layers.zoneout masks);
        # eval: EMA (1-z)*new + z*prev (reference modules.py:131-142)
        if use_masks:
            return m.astype(f32) * new + (1.0 - m.astype(f32)) * prev
        if zoneout == 0.0:
            return new
        return (1.0 - zoneout) * new + zoneout * prev

    def save(name, s, val):
        # residual saves ride HBM in the kernel dtype (bf16 on the perf
        # path — halves the save/restream traffic; f32 in parity mode)
        outs[name][s] = val.astype(outs[name].dtype)

    def body(s, _):
        c1, h1, c2, h2 = c1S[:], h1S[:], c2S[:], h2S[:]
        ctx, alpha, cum, mu = ctxS[:], alphaS[:], cumS[:], muS[:, 0:1]
        # save pre-step state for the backward recompute
        save("c1p", s, c1)
        save("h1p", s, h1)
        save("c2p", s, c2)
        save("h2p", s, h2)
        save("ctxp", s, ctx)
        save("alphap", s, alpha)
        save("mup", s, jnp.broadcast_to(mu, (B, 128)))  # col 0 = mu

        p = p_ref[s].astype(f32)
        g1 = _mm(p, W["l1_pre"]) + _mm(ctx, W["l1_ctx"]) + _mm(h1, W["l1_h"]) + W["l1_b"][:].astype(f32)
        _, _, _, _, new_c1, new_h1 = _lstm_gates_fwd(g1, c1)
        c1n = zmix(new_c1, c1, mc1_ref[s] if use_masks else None)
        h1n = zmix(new_h1, h1, mh1_ref[s] if use_masks else None)
        out1 = new_h1

        g2 = _mm(out1, W["l2_x"]) + _mm(h2, W["l2_h"]) + W["l2_b"][:].astype(f32)
        _, _, _, _, new_c2, new_h2 = _lstm_gates_fwd(g2, c2)
        c2n = zmix(new_c2, c2, mc2_ref[s] if use_masks else None)
        h2n = zmix(new_h2, h2, mh2_ref[s] if use_masks else None)
        out2 = new_h2

        # --- location-sensitive energy over <=64-wide encoder subtiles ---
        # F-width conv taps (VPU) + ONE F->A MXU matmul per subtile
        # (models/attention.py:138-157; conv bias merged into ball)
        pq = _mm(out2, W["wq"])  # [B, A]
        conv_w = W["w_conv"][:].astype(f32)  # [taps, F]
        F = conv_w.shape[1]
        mask = mask_ref[:]
        for lo in range(0, T_in, 64):
            wdt = min(64, T_in - lo)
            d0 = max(0, padl - lo)
            d1 = min(wdt + taps - 1, T_in - lo + padl)
            if d0 > 0:
                winS[:, :d0] = jnp.zeros((B, d0), f32)
            if d1 < wdt + taps - 1:
                winS[:, d1 : wdt + taps - 1] = jnp.zeros((B, wdt + taps - 1 - d1), f32)
            winS[:, d0:d1] = cum[:, lo - padl + d0 : lo - padl + d1]
            # F-width broadcast-MAC conv.  (An im2col-staging + MXU-matmul
            # variant measured SLOWER — the 31 per-lane stores into a
            # [B, wdt, taps] scratch relayout heavily; see MEASURED STATUS.)
            f_tile = jnp.zeros((B, wdt, F), f32)
            for j in range(taps):
                win = winS[:, j : j + wdt]
                f_tile = f_tile + win[..., None] * conv_w[j][None, None, :]
            loc_t = jnp.dot(
                f_tile.reshape(B * wdt, F).astype(W["w_loc"].dtype),
                W["w_loc"][:],
                preferred_element_type=f32,
            ).reshape(B, wdt, A)
            e_t = jnp.tanh(
                keys_ref[:, lo : lo + wdt, :].astype(f32)
                + pq[:, None, :]
                + loc_t
                + W["ball"][:].astype(f32)[None]
            )
            energyS[:, lo : lo + wdt] = jnp.sum(
                e_t * W["v"][:].astype(f32)[None], axis=-1
            )
        energy = jnp.where(mask > 0, energyS[:], -1e9)
        energy = energy - jnp.max(energy, axis=-1, keepdims=True)
        exp_e = jnp.exp(energy)
        align_sm = exp_e / jnp.sum(exp_e, axis=-1, keepdims=True)
        cum_new = cum + align_sm

        # forward recursion (attention.py:156-167,218-220)
        shiftS[:, 1 : 1 + T_in] = alpha
        shift_alpha = shiftS[:, :T_in]
        pre_align = ((1.0 - mu) * alpha + mu * shift_alpha + 1e-10) * align_sm
        align = pre_align / jnp.sum(pre_align, axis=-1, keepdims=True)

        ctx_new = jnp.zeros((B, V), f32)
        for lo in range(0, T_in, 128):
            wdt = min(128, T_in - lo)
            a_t = jnp.expand_dims(align[:, lo : lo + wdt], -1)
            ctx_new = ctx_new + jnp.sum(
                a_t * values_ref[:, lo : lo + wdt, :].astype(f32), axis=1
            )
        mu_new = jax.nn.sigmoid(
            _mm(ctx_new, W["mu_c"]) + _mm(out2, W["mu_q"]) + W["mu_b"][:].astype(f32)
        )[:, 0:1]

        save("out1", s, out1)
        outs["out2"][s] = out2  # primal outputs stay f32
        outs["ctx"][s] = ctx_new
        outs["align"][s] = align
        save("align_sm", s, align_sm)
        c1S[:] = c1n
        h1S[:] = h1n
        c2S[:] = c2n
        h2S[:] = h2n
        ctxS[:] = ctx_new
        alphaS[:] = align
        cumS[:] = cum_new
        muS[:, 0:1] = mu_new
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

# wg="stream" (the round-3 layout): per-step adjoint vectors stream to HBM
# and the custom-vjp wrapper reduces them against saved activations as
# [T*B, in] x [T*B, out] einsums outside.  The two [T, B, 4u] gate-adjoint
# streams are what overflowed XLA's scoped VMEM at 16/32-row groups.
#
# wg="accum" (round 4): the gate/query adjoints never leave the kernel —
# each chunk's d_g1/d_g2/d_q collect in VMEM scratch and reduce against the
# SAME activation blocks the kernel already holds (one [chunk*B, in] x
# [chunk*B, 4u] MXU contraction per weight per chunk, K = chunk*B = 64),
# accumulating into VMEM-resident weight-gradient buffers written once at
# the end.  Only d_p (the prenet cotangent, computed in-kernel), d_mulin
# and d_ctx_tot still stream — together ~1/4 the bytes of one gate stream.
BWD_OUTS = ("d_g1", "d_g2", "d_q", "d_mulin", "d_ctx_tot")
# accum packs d_mulin into d_ctxmu's 128-column tail so NO 2D [chunk, B]
# output block remains — that block's div-8 sublane constraint is what
# pinned the backward chunk at 8; 3D blocks leave the leading (chunk) dim
# free, letting accum restream at chunk 4 for VMEM headroom
BWD_OUTS_ACCUM = ("d_p", "d_ctxmu")
BWD_ACCS = ("d_keys", "d_conv", "d_wloc", "d_v", "d_ball")
# weight-gradient accumulators (accum mode): segment layout mirrors
# CORE_WEIGHTS; biases collect [B, 4u] per-example partials like d_v
BWD_WACCS = ("d_l1pre", "d_l1ctx", "d_l1h", "d_g1b",
             "d_l2x", "d_l2h", "d_g2b", "d_wq")


def _bwd_kernel(p_ref, mc1_ref, mh1_ref, mc2_ref, mh2_ref, keys_ref, values_ref,
                mask_ref, cumT_ref, gout2_ref, gctx_ref, galign_ref, *rest,
                chunk: int, dims: tuple, wg: str = "stream"):
    (B, T_in, pre, u, V, A, taps, zoneout, use_masks) = dims
    n_w = len(CORE_WEIGHTS)
    W = dict(zip(CORE_WEIGHTS, rest[:n_w]))
    saves = dict(zip(FWD_OUTS[3:], rest[n_w : n_w + 9]))  # align_sm..mup
    out2_ref = rest[n_w + 9]  # re-fed primal outputs
    ctx_ref = rest[n_w + 10]
    align_ref = rest[n_w + 11]
    out_names = BWD_OUTS_ACCUM if wg == "accum" else BWD_OUTS
    acc_names = BWD_ACCS + (BWD_WACCS if wg == "accum" else ())
    k = n_w + 12
    outs = dict(zip(out_names, rest[k : k + len(out_names)]))
    k += len(out_names)
    accs = dict(zip(acc_names, rest[k : k + len(acc_names)]))
    k += len(acc_names)
    (
        ac1S, ah1S, ac2S, ah2S, actxS, aalphaS, acumS, amuS, cumS,
        dcumP, winS, wS, energyS, shiftS,
    ) = rest[k : k + 14]
    if wg == "accum":
        dg1C, dg2C, dqC = rest[k + 14 :]  # per-chunk adjoint collectors
    f32 = jnp.float32
    padl = (taps - 1) // 2

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (ac1S, ah1S, ac2S, ah2S, actxS, aalphaS, acumS, amuS):
            ref[:] = jnp.zeros_like(ref)
        cumS[:] = cumT_ref[:]
        for name in acc_names:
            accs[name][:] = jnp.zeros_like(accs[name])
        shiftS[:] = jnp.zeros_like(shiftS)

    def body(s_rev, _):
        s = chunk - 1 - s_rev
        # reconstruct cum_{t-1} (the conv input of this step); saves are
        # upcast from the kernel dtype (bf16 on the perf path)
        align_sm = saves["align_sm"][s].astype(f32)
        cum_prev = cumS[:] - align_sm
        cumS[:] = cum_prev

        out1, out2 = saves["out1"][s].astype(f32), out2_ref[s]
        ctx_t, align_t = ctx_ref[s], align_ref[s]
        c1p, h1p = saves["c1p"][s].astype(f32), saves["h1p"][s].astype(f32)
        c2p, h2p = saves["c2p"][s].astype(f32), saves["h2p"][s].astype(f32)
        ctxp, alphap = saves["ctxp"][s].astype(f32), saves["alphap"][s].astype(f32)
        mup = saves["mup"][s][:, 0:1].astype(f32)

        a_c1, a_h1 = ac1S[:], ah1S[:]
        a_c2, a_h2 = ac2S[:], ah2S[:]
        a_ctx, a_alpha, a_cum, a_mu = actxS[:], aalphaS[:], acumS[:], amuS[:, 0:1]

        d_out2 = gout2_ref[s].astype(f32)
        d_ctx_tot = gctx_ref[s].astype(f32) + a_ctx
        d_align_tot = galign_ref[s].astype(f32) + a_alpha

        # M: mu_t = sigmoid(ctx_t.mu_c + out2.mu_q + mu_b) — recompute
        mu_t = jax.nn.sigmoid(
            _mm(ctx_t, W["mu_c"]) + _mm(out2, W["mu_q"]) + W["mu_b"][:].astype(f32)
        )[:, 0:1]
        d_lin = a_mu * mu_t * (1.0 - mu_t)  # [B, 1]
        d_ctx_tot = d_ctx_tot + _mmT(d_lin, W["mu_c"])
        d_out2 = d_out2 + _mmT(d_lin, W["mu_q"])
        if wg == "accum":
            outs["d_ctxmu"][s, :, :V] = d_ctx_tot.astype(outs["d_ctxmu"].dtype)
            outs["d_ctxmu"][s, :, V:] = jnp.broadcast_to(
                d_lin, (B, 128)
            ).astype(outs["d_ctxmu"].dtype)
        else:
            outs["d_mulin"][s] = d_lin[:, 0]
            outs["d_ctx_tot"][s] = d_ctx_tot.astype(outs["d_ctx_tot"].dtype)

        # L: ctx = align . values -> d_align[b,t] += sum_v d_ctx[b,v]*values[b,t,v]
        # (assembled tile-by-tile via the energyS scratch, VPU mul+reduce —
        # the same structure as the forward context accumulation)
        for lo in range(0, T_in, 128):
            wdt = min(128, T_in - lo)
            v_t = values_ref[:, lo : lo + wdt, :].astype(f32)
            energyS[:, lo : lo + wdt] = jnp.sum(v_t * d_ctx_tot[:, None, :], axis=-1)
        d_align_tot = d_align_tot + energyS[:]

        # K: align = pre/S; recompute pre from saved alphap/mup/align_sm
        # (shiftS col 0 must be re-zeroed: the left-shift below writes it)
        shiftS[:, 0:1] = jnp.zeros((B, 1), f32)
        shiftS[:, 1 : 1 + T_in] = alphap
        shift_alpha = shiftS[:, :T_in]
        w_t = (1.0 - mup) * alphap + mup * shift_alpha + 1e-10
        pre_align = w_t * align_sm
        S = jnp.sum(pre_align, axis=-1, keepdims=True)
        d_pre = (d_align_tot - jnp.sum(d_align_tot * align_t, axis=-1, keepdims=True)) / S

        # J: pre = w * align_sm
        d_align_sm = d_pre * w_t + a_cum
        d_w = d_pre * align_sm
        d_mu_prev = jnp.sum(d_w * (shift_alpha - alphap), axis=-1, keepdims=True)
        # d_alpha_{t-1} = d_w*(1-mu) + leftshift(d_w*mu): stage d_w*mu at
        # cols [0, T_in) with col T_in zero, read [1, T_in+1)
        shiftS[:, T_in : T_in + 1] = jnp.zeros((B, 1), f32)
        shiftS[:, 0:T_in] = d_w * mup
        a_alpha_next = d_w * (1.0 - mup) + shiftS[:, 1 : 1 + T_in]

        # H: softmax backward (masked positions have align_sm = 0 -> d_e = 0)
        d_e = align_sm * (
            d_align_sm - jnp.sum(d_align_sm * align_sm, axis=-1, keepdims=True)
        )

        # G/F: energy recompute + adjoints, per 64-subtile
        pq = _mm(out2, W["wq"])
        conv_w = W["w_conv"][:].astype(f32)  # [taps, F]
        F = conv_w.shape[1]
        v_vec = W["v"][:].astype(f32)  # [1, A]
        d_q_acc = jnp.zeros((B, A), f32)
        dcumP[:] = jnp.zeros_like(dcumP)
        for lo in range(0, T_in, 64):
            wdt = min(64, T_in - lo)
            d0 = max(0, padl - lo)
            d1 = min(wdt + taps - 1, T_in - lo + padl)
            if d0 > 0:
                winS[:, :d0] = jnp.zeros((B, d0), f32)
            if d1 < wdt + taps - 1:
                winS[:, d1 : wdt + taps - 1] = jnp.zeros((B, wdt + taps - 1 - d1), f32)
            winS[:, d0:d1] = cum_prev[:, lo - padl + d0 : lo - padl + d1]
            f_tile = jnp.zeros((B, wdt, F), f32)
            for j in range(taps):
                win = winS[:, j : j + wdt]
                f_tile = f_tile + win[..., None] * conv_w[j][None, None, :]
                # stage the im2col window for the conv gradient
                wS[:, :wdt, j : j + 1] = win[..., None]
            f2 = f_tile.reshape(B * wdt, F)
            loc_t = jnp.dot(
                f2.astype(W["w_loc"].dtype), W["w_loc"][:],
                preferred_element_type=f32,
            ).reshape(B, wdt, A)
            th = jnp.tanh(
                keys_ref[:, lo : lo + wdt, :].astype(f32)
                + pq[:, None, :]
                + loc_t
                + W["ball"][:].astype(f32)[None]
            )
            d_e_t = d_e[:, lo : lo + wdt]
            d_th = d_e_t[..., None] * v_vec[None] * (1.0 - th * th)  # [B, wdt, A]
            # per-example [B, A] partials; the cross-example reduction
            # happens outside the kernel (a [1, A] write here would need
            # a sublane-replicated relayout Mosaic rejects)
            accs["d_v"][:, :] = accs["d_v"][:, :] + jnp.sum(
                th * d_e_t[..., None], axis=1
            )
            accs["d_ball"][:, :] = accs["d_ball"][:, :] + jnp.sum(d_th, axis=1)
            accs["d_keys"][:, lo : lo + wdt, :] = (
                accs["d_keys"][:, lo : lo + wdt, :] + d_th
            )
            d_q_acc = d_q_acc + jnp.sum(d_th, axis=1)
            d2 = d_th.reshape(B * wdt, A)
            # loc enters the tanh argument additively, so d_loc = d_th;
            # chain through the F->A dense: d_f = d_th . w_loc^T  [B*wdt, F]
            d_f = jax.lax.dot_general(
                d2, W["w_loc"][:], (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
            # conv transpose -> d_cum (anti-diagonal accumulate), F width
            G = jax.lax.dot_general(
                d_f, conv_w, (((1,), (1,)), ((), ())), preferred_element_type=f32
            ).reshape(B, wdt, taps)
            for j in range(taps):
                g_j = G[:, :, j]  # [B, wdt]
                dcumP[:, lo + j : lo + j + wdt] = dcumP[:, lo + j : lo + j + wdt] + g_j
            # conv-kernel gradient: im2col^T x d_f  [taps, F]
            accs["d_conv"][:] = accs["d_conv"][:] + jax.lax.dot_general(
                wS[:, :wdt, :].reshape(B * wdt, taps), d_f,
                (((0,), (0,)), ((), ())), preferred_element_type=f32,
            )
            # location-dense gradient: f_tile^T x d_th  [F, A]
            accs["d_wloc"][:] = accs["d_wloc"][:] + jax.lax.dot_general(
                f2, d2, (((0,), (0,)), ((), ())), preferred_element_type=f32,
            )
        # dcumP index = tau + padl; valid tau in [0, T_in).  cum_{t-1} gets
        # BOTH the identity pass-through of cum_t's adjoint (through
        # cum_t = cum_{t-1} + align_sm_t) and the conv-transpose term.
        a_cum_next = a_cum + dcumP[:, padl : padl + T_in]

        # E: d_out2 += d_q . wq^T
        d_out2 = d_out2 + _mmT(d_q_acc, W["wq"])
        if wg == "accum":
            dqC[s] = d_q_acc.astype(dqC.dtype)
        else:
            outs["d_q"][s] = d_q_acc

        # D: LSTM2 backward (recompute gates)
        g2 = _mm(out1, W["l2_x"]) + _mm(h2p, W["l2_h"]) + W["l2_b"][:].astype(f32)
        si, tj, sf, so, new_c2, new_h2 = _lstm_gates_fwd(g2, c2p)
        th_c2 = jnp.tanh(new_c2)
        if use_masks:
            m_c, m_h = mc2_ref[s].astype(f32), mh2_ref[s].astype(f32)
        elif zoneout == 0.0:
            m_c = m_h = 1.0
        else:
            m_c = m_h = 1.0 - zoneout
        d_new_h2 = a_h2 * m_h + d_out2
        d_new_c2 = a_c2 * m_c + d_new_h2 * so * (1.0 - th_c2 * th_c2)
        d_c2_prev = a_c2 * (1.0 - m_c) + d_new_c2 * sf
        d_i = d_new_c2 * tj * si * (1.0 - si)
        d_j = d_new_c2 * si * (1.0 - tj * tj)
        d_f = d_new_c2 * c2p * sf * (1.0 - sf)
        d_o = d_new_h2 * th_c2 * so * (1.0 - so)
        d_g2 = jnp.concatenate([d_i, d_j, d_f, d_o], axis=-1)
        if wg == "accum":
            dg2C[s] = d_g2.astype(dg2C.dtype)
            accs["d_g2b"][:, :] = accs["d_g2b"][:, :] + d_g2
        else:
            outs["d_g2"][s] = d_g2
        d_out1 = _mmT(d_g2, W["l2_x"])
        d_h2_prev = a_h2 * (1.0 - m_h) + _mmT(d_g2, W["l2_h"])

        # B: LSTM1 backward
        p = p_ref[s].astype(f32)
        g1 = _mm(p, W["l1_pre"]) + _mm(ctxp, W["l1_ctx"]) + _mm(h1p, W["l1_h"]) + W["l1_b"][:].astype(f32)
        si1, tj1, sf1, so1, new_c1, new_h1 = _lstm_gates_fwd(g1, c1p)
        th_c1 = jnp.tanh(new_c1)
        if use_masks:
            m_c1, m_h1 = mc1_ref[s].astype(f32), mh1_ref[s].astype(f32)
        elif zoneout == 0.0:
            m_c1 = m_h1 = 1.0
        else:
            m_c1 = m_h1 = 1.0 - zoneout
        d_new_h1 = a_h1 * m_h1 + d_out1
        d_new_c1 = a_c1 * m_c1 + d_new_h1 * so1 * (1.0 - th_c1 * th_c1)
        d_c1_prev = a_c1 * (1.0 - m_c1) + d_new_c1 * sf1
        d_i1 = d_new_c1 * tj1 * si1 * (1.0 - si1)
        d_j1 = d_new_c1 * si1 * (1.0 - tj1 * tj1)
        d_f1 = d_new_c1 * c1p * sf1 * (1.0 - sf1)
        d_o1 = d_new_h1 * th_c1 * so1 * (1.0 - so1)
        d_g1 = jnp.concatenate([d_i1, d_j1, d_f1, d_o1], axis=-1)
        if wg == "accum":
            dg1C[s] = d_g1.astype(dg1C.dtype)
            accs["d_g1b"][:, :] = accs["d_g1b"][:, :] + d_g1
            # the prenet cotangent leaves the kernel in place of the whole
            # gate adjoint: [B, pre] instead of [B, 4u]
            outs["d_p"][s] = _mmT(d_g1, W["l1_pre"]).astype(outs["d_p"].dtype)
        else:
            outs["d_g1"][s] = d_g1
        d_h1_prev = a_h1 * (1.0 - m_h1) + _mmT(d_g1, W["l1_h"])
        a_ctx_next = _mmT(d_g1, W["l1_ctx"])

        ac1S[:] = d_c1_prev
        ah1S[:] = d_h1_prev
        ac2S[:] = d_c2_prev
        ah2S[:] = d_h2_prev
        actxS[:] = a_ctx_next
        aalphaS[:] = a_alpha_next
        acumS[:] = a_cum_next
        amuS[:, 0:1] = d_mu_prev
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)

    if wg == "accum":
        # Per-CHUNK weight-gradient reduction: contract the chunk's
        # collected adjoints against the SAME activation blocks the kernel
        # already holds in VMEM — one [chunk*B, in] x [chunk*B, out] MXU
        # matmul per weight segment (K = chunk*B), accumulating into the
        # VMEM-resident gradient buffers.  This is what removes the
        # [T, B, 4u] gate-adjoint HBM streams and the outside einsums.
        mm_dt = W["l1_pre"].dtype  # bf16 on the perf path, f32 in parity
        dg1 = dg1C[...].reshape(chunk * B, 4 * u)
        dg2 = dg2C[...].reshape(chunk * B, 4 * u)
        dq = dqC[...].reshape(chunk * B, A)

        def red(acc_ref, x, d):
            acc_ref[:, :] = (
                acc_ref[:, :].astype(jnp.float32) + jax.lax.dot_general(
                    x.reshape(chunk * B, x.shape[-1]).astype(mm_dt),
                    d.astype(mm_dt),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            ).astype(acc_ref.dtype)

        red(accs["d_l1pre"], p_ref[...], dg1)
        red(accs["d_l1ctx"], saves["ctxp"][...], dg1)
        red(accs["d_l1h"], saves["h1p"][...], dg1)
        red(accs["d_l2x"], saves["out1"][...], dg2)
        red(accs["d_l2h"], saves["h2p"][...], dg2)
        red(accs["d_wq"], out2_ref[...], dq)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _pad_T(x, T_pad):
    T = x.shape[0]
    if T == T_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((T_pad - T,) + x.shape[1:], x.dtype)], axis=0
    )


def _specs_for(static):
    (B, T_in, T, chunk, pre, u, V, A, taps, zoneout, use_masks, interpret, dt) = static[:13]
    n_chunks = -(-T // chunk)
    # T_pad = n_chunks*chunk must tile under the backward's fixed chunk of
    # 8 as well, so round the chunk count up until it does
    while (n_chunks * chunk) % 8:
        n_chunks += 1
    full = lambda nd: pl.BlockSpec(memory_space=pltpu.VMEM)
    ck = lambda *shape: pl.BlockSpec((chunk,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM)
    rck = lambda *shape: pl.BlockSpec(
        (chunk,) + shape, lambda i, n=n_chunks: (n - 1 - i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    return n_chunks, full, ck, rck


def _weights_list(weights, dtype):
    return [w.astype(dtype) for w in weights]


def _fwd_call(static, weights, p_seq, masks, keys, values, mem_mask):
    (B, T_in, T, chunk, pre, u, V, A, taps, zoneout, use_masks, interpret, dt) = static[:13]
    dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
    n_chunks, full, ck, rck = _specs_for(static)
    T_pad = n_chunks * chunk
    f32 = jnp.float32

    p_pad = _pad_T(p_seq.astype(dtype), T_pad)
    if use_masks:
        # zoneout masks are exact 0/1 floats — bf16 loses nothing
        m_pad = [_pad_T(m.astype(dtype), T_pad) for m in masks]
        m_specs = [ck(B, u)] * 4
    else:
        m_pad = [jnp.zeros((1, 1, 1), f32)] * 4
        m_specs = [full(3)] * 4
    wl = _weights_list(weights, dtype)
    kv_dtype = dtype
    dims = (B, T_in, pre, u, V, A, taps, float(zoneout), bool(use_masks))

    # residual saves ride HBM in the kernel dtype (bf16 halves the fwd
    # save-write + bwd restream traffic AND the stream VMEM windows);
    # the three primal outputs stay f32
    sdt = dtype if TUNE["saves_dtype"] == "kernel" else f32
    out_shapes = [
        jax.ShapeDtypeStruct((T_pad, B, u), f32),      # out2
        jax.ShapeDtypeStruct((T_pad, B, V), f32),      # ctx
        jax.ShapeDtypeStruct((T_pad, B, T_in), f32),   # align
        jax.ShapeDtypeStruct((T_pad, B, T_in), sdt),   # align_sm
        jax.ShapeDtypeStruct((T_pad, B, u), sdt),      # out1
        jax.ShapeDtypeStruct((T_pad, B, u), sdt),      # c1p
        jax.ShapeDtypeStruct((T_pad, B, u), sdt),      # h1p
        jax.ShapeDtypeStruct((T_pad, B, u), sdt),      # c2p
        jax.ShapeDtypeStruct((T_pad, B, u), sdt),      # h2p
        jax.ShapeDtypeStruct((T_pad, B, V), sdt),      # ctxp
        jax.ShapeDtypeStruct((T_pad, B, T_in), sdt),   # alphap
        jax.ShapeDtypeStruct((T_pad, B, 128), sdt),    # mup (col 0)
    ]
    out_specs = [
        ck(B, u), ck(B, V), ck(B, T_in), ck(B, T_in), ck(B, u),
        ck(B, u), ck(B, u), ck(B, u), ck(B, u), ck(B, V), ck(B, T_in),
        ck(B, 128),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[ck(B, pre), *m_specs, full(3), full(3), full(2),
                  *[full(w.ndim) for w in wl]],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((B, u), f32),       # c1
            pltpu.VMEM((B, u), f32),       # h1
            pltpu.VMEM((B, u), f32),       # c2
            pltpu.VMEM((B, u), f32),       # h2
            pltpu.VMEM((B, V), f32),       # ctx
            pltpu.VMEM((B, T_in), f32),    # alpha
            pltpu.VMEM((B, T_in), f32),    # cum
            pltpu.VMEM((B, 128), f32),     # mu
            pltpu.VMEM((B, T_in), f32),    # energy
            pltpu.VMEM((B, T_in + 1), f32),  # shift
            pltpu.VMEM((B, 128), f32),     # win
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, dims=dims),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(p_pad, *m_pad, keys.astype(kv_dtype), values.astype(kv_dtype),
      mem_mask.astype(f32), *wl)
    return outs


def _bwd_call(static, weights, p_seq, masks, keys, values, mem_mask, saves, cots):
    (B, T_in, T, chunk, pre, u, V, A, taps, zoneout, use_masks, interpret, dt) = static[:13]
    wg = static[13] if len(static) > 13 else "stream"
    dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
    n_chunks, full, ck, rck = _specs_for(static)
    T_pad = n_chunks * chunk
    # the backward streams ~2x the forward's per-step tensors (saves in,
    # adjoints out); the stream chunk is the VMEM knob (windows scale with
    # chunk*B).  8 is the floor: the [chunk, B] d_mulin block needs its
    # sublane dim divisible by 8.  T_pad stays the FORWARD padding (the
    # saves' length), so the backward grid is T_pad // chunk.
    chunk_b = 8
    if chunk != chunk_b and T_pad % chunk_b == 0:
        chunk = chunk_b
    if wg == "accum" and T_pad % TUNE["accum_bwd_chunk"] == 0:
        # accum adds ~3 MB of VMEM weight-grad accumulators; the smaller
        # chunk shrinks the stream windows to stay under the 16 MB budget
        chunk = TUNE["accum_bwd_chunk"]
    n_chunks = T_pad // chunk
    rck = lambda *shape: pl.BlockSpec(
        (chunk,) + shape, lambda i, n=n_chunks: (n - 1 - i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    f32 = jnp.float32

    p_pad = _pad_T(p_seq.astype(dtype), T_pad)
    if use_masks:
        m_pad = [_pad_T(m.astype(dtype), T_pad) for m in masks]
        m_specs = [rck(B, u)] * 4
    else:
        m_pad = [jnp.zeros((1, 1, 1), f32)] * 4
        m_specs = [full(3)] * 4
    wl = _weights_list(weights, dtype)
    F_loc = weights[8].shape[1]  # w_conv [taps, F]
    dims = (B, T_in, pre, u, V, A, taps, float(zoneout), bool(use_masks))

    # saves: full FWD_OUTS tuple (already padded, [T_pad, ...])
    out2_s, ctx_s, align_s = saves[0], saves[1], saves[2]
    resid = saves[3:]  # align_sm..mup
    # cotangent streams ride the kernel dtype in accum mode (upcast on
    # read); padded steps stay exact zeros either way
    cdt = dtype if wg == "accum" else f32
    g_out2, g_ctx, g_align = [_pad_T(c.astype(cdt), T_pad) for c in cots]
    one_hot = (jax.lax.broadcasted_iota(jnp.int32, (B, T_in), 1) == 0).astype(f32)
    cum_T = one_hot + jnp.sum(resid[0].astype(f32), axis=0)  # init + sum(align_sm)

    const3 = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    if wg == "accum":
        out_shapes = [
            jax.ShapeDtypeStruct((T_pad, B, pre), dtype),  # d_p
            jax.ShapeDtypeStruct((T_pad, B, V + 128), dtype),  # d_ctxmu
            # d_keys accumulates across all T reverse steps — bf16
            # round-tripping would swallow early-step contributions once
            # the running sum grows; it stays f32 like d_v/d_ball/d_conv
            jax.ShapeDtypeStruct((B, T_in, A), f32),       # d_keys
            jax.ShapeDtypeStruct((taps, F_loc), f32),      # d_conv
            jax.ShapeDtypeStruct((F_loc, A), f32),         # d_wloc
            jax.ShapeDtypeStruct((B, A), f32),             # d_v (per-example rows)
            jax.ShapeDtypeStruct((B, A), f32),             # d_ball (per-example rows)
            jax.ShapeDtypeStruct((pre, 4 * u), dtype),     # d_l1pre
            jax.ShapeDtypeStruct((V, 4 * u), dtype),       # d_l1ctx
            jax.ShapeDtypeStruct((u, 4 * u), dtype),       # d_l1h
            jax.ShapeDtypeStruct((B, 4 * u), f32),         # d_g1b (rows)
            jax.ShapeDtypeStruct((u, 4 * u), dtype),       # d_l2x
            jax.ShapeDtypeStruct((u, 4 * u), dtype),       # d_l2h
            jax.ShapeDtypeStruct((B, 4 * u), f32),         # d_g2b (rows)
            jax.ShapeDtypeStruct((u, A), dtype),           # d_wq
        ]
        out_specs = [
            rck(B, pre), rck(B, V + 128),
            *[const3() for _ in range(13)],
        ]
        extra_scratch = [
            pltpu.VMEM((chunk, B, 4 * u), dtype),  # dg1C
            pltpu.VMEM((chunk, B, 4 * u), dtype),  # dg2C
            pltpu.VMEM((chunk, B, A), dtype),      # dqC
        ]
    else:
        out_shapes = [
            jax.ShapeDtypeStruct((T_pad, B, 4 * u), f32),  # d_g1
            jax.ShapeDtypeStruct((T_pad, B, 4 * u), f32),  # d_g2
            jax.ShapeDtypeStruct((T_pad, B, A), f32),      # d_q
            jax.ShapeDtypeStruct((T_pad, B), f32),         # d_mulin
            jax.ShapeDtypeStruct((T_pad, B, V), f32),      # d_ctx_tot
            jax.ShapeDtypeStruct((B, T_in, A), f32),       # d_keys
            jax.ShapeDtypeStruct((taps, F_loc), f32),      # d_conv
            jax.ShapeDtypeStruct((F_loc, A), f32),         # d_wloc
            jax.ShapeDtypeStruct((B, A), f32),             # d_v (per-example rows)
            jax.ShapeDtypeStruct((B, A), f32),             # d_ball (per-example rows)
        ]
        out_specs = [
            rck(B, 4 * u), rck(B, 4 * u), rck(B, A), rck(B), rck(B, V),
            const3(), const3(), const3(), const3(), const3(),
        ]
        extra_scratch = []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            rck(B, pre), *m_specs, full(3), full(3), full(2), full(2),
            rck(B, u), rck(B, V), rck(B, T_in),  # cotangents
            *[full(w.ndim) for w in wl],
            # residual saves (align_sm, out1, c1p, h1p, c2p, h2p, ctxp,
            # alphap, mup) then re-fed primals ctx, align
            rck(B, T_in), rck(B, u), rck(B, u), rck(B, u), rck(B, u),
            rck(B, u), rck(B, V), rck(B, T_in), rck(B, 128),
            rck(B, u), rck(B, V), rck(B, T_in),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((B, u), f32),                 # a_c1
            pltpu.VMEM((B, u), f32),                 # a_h1
            pltpu.VMEM((B, u), f32),                 # a_c2
            pltpu.VMEM((B, u), f32),                 # a_h2
            pltpu.VMEM((B, V), f32),                 # a_ctx
            pltpu.VMEM((B, T_in), f32),              # a_alpha
            pltpu.VMEM((B, T_in), f32),              # a_cum
            pltpu.VMEM((B, 128), f32),               # a_mu
            pltpu.VMEM((B, T_in), f32),              # cum (reconstruct)
            pltpu.VMEM((B, T_in + taps - 1), f32),   # dcumP
            pltpu.VMEM((B, 128), f32),               # win
            pltpu.VMEM((B, 64, taps), f32),          # wS (im2col)
            pltpu.VMEM((B, T_in), f32),              # energy scratch
            pltpu.VMEM((B, T_in + 1), f32),          # shift
            *extra_scratch,
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk, dims=dims, wg=wg),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(p_pad, *m_pad, keys.astype(dtype), values.astype(dtype),
      mem_mask.astype(f32), cum_T, g_out2, g_ctx, g_align, *wl,
      *resid, out2_s, ctx_s, align_s)


# ---------------------------------------------------------------------------
# custom_vjp core (per <=8-example group)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(static, weights, p_seq, masks, keys, values, mem_mask):
    T = static[2]
    outs = _fwd_call(static, weights, p_seq, masks, keys, values, mem_mask)
    return outs[0][:T], outs[1][:T], outs[2][:T]


def _core_fwd(static, weights, p_seq, masks, keys, values, mem_mask):
    T = static[2]
    outs = _fwd_call(static, weights, p_seq, masks, keys, values, mem_mask)
    res = (weights, p_seq, masks, keys, values, mem_mask, tuple(outs))
    return (outs[0][:T], outs[1][:T], outs[2][:T]), res


def _core_bwd(static, res, cots):
    weights, p_seq, masks, keys, values, mem_mask, saves = res
    T = static[2]
    wg = static[13] if len(static) > 13 else "stream"
    f32 = jnp.float32
    if wg == "accum":
        return _core_bwd_accum(static, res, cots)
    (d_g1, d_g2, d_q, d_mulin, d_ctx_tot, d_keys, d_conv, d_wloc, d_v,
     d_ball) = _bwd_call(
        static, weights, p_seq, masks, keys, values, mem_mask, saves, cots
    )
    # weight gradients as large batched einsums OUTSIDE the kernel (MXU):
    # contract the [T_pad*B] step axis of the streamed adjoints against the
    # saved activations.  Padded steps contribute exact zeros (their
    # cotangents are zero and the reverse scan enters them with zero
    # adjoint carries).
    (out2_s, ctx_s, align_s, align_sm_s, out1_s, c1p_s, h1p_s, c2p_s, h2p_s,
     ctxp_s, alphap_s, mup_s) = saves
    p_pad = _pad_T(p_seq.astype(f32), out2_s.shape[0])
    hp = "highest"
    dW = (
        jnp.einsum("tbp,tbg->pg", p_pad, d_g1, precision=hp),            # l1_pre
        jnp.einsum("tbv,tbg->vg", ctxp_s, d_g1, precision=hp),           # l1_ctx
        jnp.einsum("tbu,tbg->ug", h1p_s, d_g1, precision=hp),            # l1_h
        jnp.sum(d_g1, axis=(0, 1))[None],                                 # l1_b
        jnp.einsum("tbu,tbg->ug", out1_s, d_g2, precision=hp),           # l2_x
        jnp.einsum("tbu,tbg->ug", h2p_s, d_g2, precision=hp),            # l2_h
        jnp.sum(d_g2, axis=(0, 1))[None],                                 # l2_b
        jnp.einsum("tbu,tba->ua", out2_s, d_q, precision=hp),            # wq
        d_conv,                                                           # w_conv
        d_wloc,                                                           # w_loc
        jnp.sum(d_ball, axis=0, keepdims=True),                           # ball
        jnp.sum(d_v, axis=0, keepdims=True),                              # v
        jnp.einsum("tbv,tb->v", ctx_s, d_mulin, precision=hp)[:, None],  # mu_c
        jnp.einsum("tbu,tb->u", out2_s, d_mulin, precision=hp)[:, None], # mu_q
        jnp.sum(d_mulin)[None, None],                                     # mu_b
    )
    d_p = jnp.einsum("tbg,pg->tbp", d_g1, weights[0].astype(f32), precision=hp)[:T]
    d_values = jnp.einsum("tbi,tbv->biv", align_s, d_ctx_tot, precision=hp)
    d_masks = None
    if static[10]:  # use_masks
        d_masks = tuple(jnp.zeros_like(m) for m in masks)
    return (dW, d_p, d_masks, d_keys, d_values, jnp.zeros_like(mem_mask))


def _core_bwd_accum(static, res, cots):
    """wg='accum': every gate/attention weight gradient arrives FROM the
    kernel (per-chunk MXU reductions against in-VMEM activations); only the
    mu-layer gradients and d_values contract outside, against the tiny
    d_mulin / d_ctx_tot streams."""
    weights, p_seq, masks, keys, values, mem_mask, saves = res
    T = static[2]
    f32 = jnp.float32
    (d_p, d_ctxmu, d_keys, d_conv, d_wloc, d_v, d_ball,
     d_l1pre, d_l1ctx, d_l1h, d_g1b, d_l2x, d_l2h, d_g2b, d_wq) = _bwd_call(
        static, weights, p_seq, masks, keys, values, mem_mask, saves, cots
    )
    # streams/accumulators ride the kernel dtype; cotangents must match
    # their (f32) primals.  d_mulin rides d_ctxmu's column V (the tail is
    # its 128-wide broadcast).
    V = d_ctxmu.shape[-1] - 128
    d_p = d_p.astype(f32)
    d_ctx_tot = d_ctxmu[:, :, :V].astype(f32)
    d_mulin = d_ctxmu[:, :, V].astype(f32)
    d_keys = d_keys.astype(f32)
    (out2_s, ctx_s, align_s, *_rest) = saves
    hp = "highest"
    f32c = lambda x: x.astype(f32)  # accumulators ride the kernel dtype
    dW = (
        f32c(d_l1pre),                                                    # l1_pre
        f32c(d_l1ctx),                                                    # l1_ctx
        f32c(d_l1h),                                                      # l1_h
        jnp.sum(d_g1b, axis=0)[None],                                     # l1_b
        f32c(d_l2x),                                                      # l2_x
        f32c(d_l2h),                                                      # l2_h
        jnp.sum(d_g2b, axis=0)[None],                                     # l2_b
        f32c(d_wq),                                                       # wq
        d_conv,                                                           # w_conv
        d_wloc,                                                           # w_loc
        jnp.sum(d_ball, axis=0, keepdims=True),                           # ball
        jnp.sum(d_v, axis=0, keepdims=True),                              # v
        jnp.einsum("tbv,tb->v", ctx_s, d_mulin, precision=hp)[:, None],  # mu_c
        jnp.einsum("tbu,tb->u", out2_s, d_mulin, precision=hp)[:, None], # mu_q
        jnp.sum(d_mulin)[None, None],                                     # mu_b
    )
    d_values = jnp.einsum("tbi,tbv->biv", align_s, d_ctx_tot, precision=hp)
    d_masks = None
    if static[10]:  # use_masks
        d_masks = tuple(jnp.zeros_like(m) for m in masks)
    return (dW, d_p[:T], d_masks, d_keys, d_values, jnp.zeros_like(mem_mask))


_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def fused_core_apply(
    params: Params,
    cfg: TacotronModelConfig,
    pre_seq: jax.Array,   # [T, B, pre] prenet outputs (batched outside)
    masks,                # (mc1, mh1, mc2, mh2) [T, B, u] or None (eval EMA)
    keys: jax.Array,      # [B, T_in, A] projected memory
    values: jax.Array,    # [B, T_in, V] raw memory
    mem_mask: jax.Array,  # [B, T_in]
    chunk: int = 16,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    wgrads: str = "accum",
):
    """Run the fused teacher-forced decoder core; returns
    (out2_seq [T,B,u], ctx_seq [T,B,V], aligns [T,B,T_in]).

    Differentiable end-to-end via the custom VJP; batches beyond the 8-row
    Mosaic envelope run as sequential groups whose weight cotangents JAX
    sums automatically.

    ``wgrads``: "accum" (default) accumulates the gate/attention weight
    gradients INSIDE the backward kernel via per-chunk MXU reductions —
    no [T, B, 4u] adjoint streams, no outside einsums, no scoped-VMEM
    pressure; "stream" is the round-3 layout kept for comparison."""
    T, B, pre = pre_seq.shape
    T_in = keys.shape[1]
    u = cfg.decoder_lstm_units
    V = values.shape[2]
    A = cfg.attention_dim
    taps = cfg.attention_kernel

    weights = pack_core_weights(params, cfg)

    dt = "bf16" if dtype == jnp.bfloat16 else "f32"
    use_masks = masks is not None

    # Mosaic lowers the kernels up to 32 rows, but the unrolled conv-tap
    # temporaries put a 32-row body over the 16 MB scoped-VMEM budget even
    # at F width; 16-row groups fit.  Larger batches run as sequential
    # groups; the stream chunk shrinks with the group size to keep the
    # double-buffered windows under budget.  Accum mode adds ~6 MB of
    # weight-gradient accumulators to the backward kernel's VMEM, so it
    # stays at 8-row groups (the accumulators don't scale with rows).
    group = (16 if B >= 16 else B) if wgrads != "accum" else min(B, TUNE["accum_group"])
    outs = []
    for start in range(0, B, group):
        end = min(start + group, B)
        Bg = end - start
        # forward stream chunk: the VMEM knob (windows scale with chunk*Bg).
        # The backward always restreams at chunk 8 (its 2D [chunk, B]
        # d_mulin block needs a div-8 sublane dim); _fwd_call pads T_pad to
        # a multiple of 8 so both grids tile it.  Accum mode: chunk 8
        # measured faster than 16 on the forward (33.8 vs 37.8 ms at
        # B=32/T=512) and matches the backward's chunk.
        if wgrads == "accum":
            chunk_g = 8
        else:
            chunk_g = int(chunk) if Bg <= 8 else 4
        static = (
            Bg, T_in, T, chunk_g, pre, u, V, A, taps,
            float(cfg.zoneout_rate), use_masks, bool(interpret), dt,
            wgrads,
        )
        m_g = None
        if use_masks:
            m_g = tuple(m[:, start:end] for m in masks)
        outs.append(
            _core(
                static, weights, pre_seq[:, start:end], m_g,
                keys[start:end], values[start:end], mem_mask[start:end],
            )
        )
    if len(outs) == 1:
        return outs[0]
    return tuple(jnp.concatenate([o[i] for o in outs], axis=1) for i in range(3))
