"""Pallas TPU kernel: fused autoregressive Tacotron-2 decoder step.

Status: correct (bit-level parity with the XLA path at f32 — see
tests/test_tacotron_decoder_kernel.py) and **~8x faster per decode step**
than the XLA ``lax.while_loop``: 1.30 us/step vs ~11 us/step at B=1,
T_in=64 (5.1 us/step at the native B=8; BENCH_SUITE_r4) on v5e, measured
as the *marginal* rate between two iteration counts with the stop token
disabled, with REPS full decodes per dispatch via a device-side fori_loop
(tools/bench_suite.py).  (Naive single-call timing is floored at ~32 ms by
the axon tunnel's dispatch round-trip — one whole decode is SMALLER than
that jitter — and randomly-initialized params fire the stop token at step
1; both artifacts initially masked the speedup, and single-call marginals
without the device-side repetition once inflated this number to "7.3
us/step".  The ``ablate`` arg — "noconv"/"noatt"/"nornn"/"noexit" — exists
from that investigation and remains useful for stage-level timing.)  At
1.30 us/step one chip decodes ~769k mel frames/s: ~9600x realtime at batch
1, ~19,600x aggregate at batch 8, ~15,900x at r=2.  The Synthesizer routes inference
through this kernel on TPU whenever ``supported(cfg)`` holds.

This kernel runs the entire per-frame chain on-chip:

  prenet (always-on dropout via pltpu PRNG) -> 2x LSTM (eval-mode zoneout
  EMA) -> forward+location-sensitive attention (conv31 on cumulated
  alignments, masked softmax, forward recursion, transition prob mu) ->
  frame/stop projections

with all weights (bf16) and all recurrent state (f32: LSTM c/h, context,
alpha, cumulated alignments, mu, previous frame) resident in VMEM for the
whole decode.  The grid iterates over frame chunks (TPU grids are
sequential); outputs are time-major.  Early stop: when every example's stop
sigmoid passes 0.5 the remaining steps skip compute.

Scope (gated by ``supported()``): ALL FOUR reference attention variants —
'forward' (the ACTIVE configuration, tacotron/models/attention.py:66-231,
including the long-sentence anti-repeat machinery of
forward_attention.py:176-215), 'lsa' (vanilla location-sensitive with the
optional synthesis window, location_sensitive_attention.py:95-226), 'gmm'
(gmm_attention.py:25-67; kappa rides the muS scratch columns) and 'graves'
(graves_attention.py:36-110; per-head mu likewise) — plus the smoothing
(sigmoid-normalize) knob and outputs_per_step r in [1, 6] (the reference's
speed knob, tacotron_hparams.py:124: [B, 80r]/[B, r] projections, last-frame
feedback, per-step any/all stop policy; only oversized gmm/graves vector
state falls back to the XLA path).  Semantics
mirror ``models.attention``'s step functions and
``models.tacotron.decoder_step`` exactly; parity is tested in interpret
mode with ``dropout_rate=0`` for every mode.
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


def supported(cfg: TacotronModelConfig) -> bool:
    # anti_repeat IS supported (vector port of forward_attention.py:176-215
    # inside the kernel — the reference's long-sentence headline feature
    # stays on the fast path); synthesis_constraint is LSA-only and a no-op
    # under forward attention, so it doesn't gate the kernel either.
    mode_ok = cfg.attention_mode in ("forward", "lsa") or (
        cfg.attention_mode == "gmm" and cfg.num_attn_mixtures <= 128
    ) or (cfg.attention_mode == "graves" and cfg.graves_heads <= 128)
    return (
        mode_ok
        # r>1 (reference tacotron_hparams.py:124 "outputs_per_step" speed
        # knob) runs in-kernel: the frame/stop projections widen to
        # [u+V, 80r]/[u+V, r] and the feedback takes the LAST frame via a
        # pre-sliced last-frame projection (bit-identical columns); r is
        # capped only so the widened outputs stay a few lane tiles
        and 1 <= cfg.outputs_per_step <= 6
        and len(cfg.prenet_layers) == 2  # pack_weights packs exactly 2 layers
        # the 64-wide conv subtiles need taps-1 + 64 <= 128 so every tap
        # read stays inside one vreg (see _kernel)
        and cfg.attention_kernel <= 65
    )


def supported_shape(
    batch: int, t_in: int, cfg: TacotronModelConfig | None = None, dtype=jnp.bfloat16
) -> bool:
    """Mosaic only lowers the [B, T_in] -> [B, T_in, 1] expansion in the
    location-conv accumulation for a single native (8, 128) tile, so the
    kernel processes the encoder axis in <=128-wide lane tiles; B > 8 is
    handled by the wrapper via sequential 8-example groups.  T_in is capped
    by VMEM via the cost model below: keys/values ride VMEM in ``dtype``
    (bf16 on TPU — ~10.4 KB per encoder position at B=8, V=512 — which
    clears the old f32 384-position ceiling to ~700; 768 is the hard cap to
    bound the unrolled conv-subtile count).  Shapes or geometries outside
    the envelope fall back to the XLA decode instead of failing at Mosaic
    compile time."""
    if t_in > 768:
        return False
    if cfg is None:
        V, A, u, pre, F, taps, r = 512, 128, 256, 256, 32, 31, 1
    else:
        V = 2 * cfg.encoder_lstm_units
        A = cfg.attention_dim
        u = cfg.decoder_lstm_units
        pre = cfg.prenet_layers[-1]
        F = cfg.attention_filters
        taps = cfg.attention_kernel
        r = cfg.outputs_per_step
    b = min(batch, 8)  # kernel-native batch; the wrapper groups larger ones
    w_bytes = 2  # bf16 weights (the perf configuration)
    if cfg is not None and cfg.kernel_weights_dtype != "bf16":
        # f32-weight debug/parity mode: weights double, and kv rides f32
        # too (the wrapper always keeps kv f32 when dtype itself is f32)
        dtype = jnp.float32
        w_bytes = 4
    if cfg is not None and cfg.kernel_kv_dtype != "bf16":
        dtype = jnp.float32
    kv_bytes = 2 if dtype == jnp.bfloat16 else 4
    weights = w_bytes * (
        (pre + V + u) * 4 * u  # lstm1 split kernels
        + 2 * u * 4 * u  # lstm2
        + pre * pre + 80 * pre  # prenet
        + taps * F + F * A + u * A + V * A  # attention conv/layers + keys layer
        + (u + V) * 81 * r  # frame + stop projections ([u+V, 80r] + [u+V, r])
        + (u + V) * 80 * (1 if r > 1 else 0)  # last-frame feedback projection
        + (V + u)  # mu layer
    )
    # keys/values in dtype; mask/alpha/cum/energy/shift f32
    per_pos = b * ((A + V) * kv_bytes + 5 * 4)
    scratch_fixed = b * (4 * u + V + 7 * 128) * 4
    return weights + t_in * per_pos + scratch_fixed <= 13_000_000


def pack_weights(params: Params, cfg: TacotronModelConfig, dtype=jnp.bfloat16):
    """Split concat-matmul kernels by input segment so the kernel never
    concatenates (each segment is its own MXU matmul)."""
    pre_d = cfg.prenet_layers[-1]
    # encoder output dim; gmm/graves attention has no memory_layer, but the
    # frame projection input is always [u + V]
    V = params["frame_projection"]["w"].shape[0] - cfg.decoder_lstm_units
    u = cfg.decoder_lstm_units
    M = 80

    l1 = params["dec_lstm1"]["w"]  # [(pre+V) + u, 4u]
    l2 = params["dec_lstm2"]["w"]  # [u + u, 4u]
    att = params["attention"]
    w = {
        "pre_w1": params["prenet"]["layers"][0]["w"],
        "pre_b1": params["prenet"]["layers"][0]["b"][None, :],
        "pre_w2": params["prenet"]["layers"][1]["w"],
        "pre_b2": params["prenet"]["layers"][1]["b"][None, :],
        "l1_pre": l1[:pre_d],
        "l1_ctx": l1[pre_d : pre_d + V],
        "l1_h": l1[pre_d + V :],
        "l1_b": params["dec_lstm1"]["b"][None, :],
        "l2_x": l2[:u],
        "l2_h": l2[u:],
        "l2_b": params["dec_lstm2"]["b"][None, :],
        # location-sensitive machinery exists only in forward/lsa modes;
        # minimal zero placeholders keep the static weight list uniform
        "att_wq": att["query_layer"]["w"] if "query_layer" in att else jnp.zeros((1, 1)),
        "att_conv": att["location_conv"]["w"][:, 0, :] if "location_conv" in att else jnp.zeros((1, 1)),
        "att_conv_b": att["location_conv"]["b"][None, :] if "location_conv" in att else jnp.zeros((1, 1)),
        "att_wl": att["location_layer"]["w"] if "location_layer" in att else jnp.zeros((1, 1)),
        "att_v": att["v"][None, :] if "v" in att else jnp.zeros((1, 1)),
        "att_b": att["b"][None, :] if "b" in att else jnp.zeros((1, 1)),
        # lsa has no transition-prob dense; zero placeholders keep the
        # weight list static (the kernel skips the mu matmuls in lsa mode)
        "mu_c": att["mu_layer"]["w"][:V] if "mu_layer" in att else jnp.zeros((V, 1)),
        "mu_q": att["mu_layer"]["w"][V:] if "mu_layer" in att else jnp.zeros((u, 1)),
        "mu_b": att["mu_layer"]["b"][None, :] if "mu_layer" in att else jnp.zeros((1, 1)),
        "fp_h": params["frame_projection"]["w"][:u],
        "fp_c": params["frame_projection"]["w"][u:],
        "fp_b": params["frame_projection"]["b"][None, :],
        "sp_h": params["stop_projection"]["w"][:u],
        "sp_c": params["stop_projection"]["w"][u:],
        "sp_b": params["stop_projection"]["b"][None, :],
        # r>1: the feedback frame is the LAST of the r projected frames
        # (reference helpers.py:64 outputs[:, -hp.num_mels:]); slicing the
        # [B, 80r] result at lane offset 80(r-1) may straddle a vreg
        # boundary, so the last frame is produced by its own matmul over the
        # SAME weight columns (bit-identical contraction).  Placeholders at
        # r=1 keep the static weight list uniform.
        "fpl_h": params["frame_projection"]["w"][:u, -M:] if cfg.outputs_per_step > 1 else jnp.zeros((1, 1)),
        "fpl_c": params["frame_projection"]["w"][u:, -M:] if cfg.outputs_per_step > 1 else jnp.zeros((1, 1)),
        "fpl_b": params["frame_projection"]["b"][None, -M:] if cfg.outputs_per_step > 1 else jnp.zeros((1, 1)),
        # gmm: dense over concat(query, context) -> 3K (gmm_attention.py:25-40)
        "gmm_q": att["gmm_layer"]["w"][:u] if "gmm_layer" in att else jnp.zeros((1, 1)),
        "gmm_c": att["gmm_layer"]["w"][u:] if "gmm_layer" in att else jnp.zeros((1, 1)),
        "gmm_b": att["gmm_layer"]["b"][None, :] if "gmm_layer" in att else jnp.zeros((1, 1)),
        # graves: dense(relu(dense(query))) -> (g, b, k) (graves_attention.py:36-44)
        "gv_w1": att["layer1"]["w"] if "layer1" in att else jnp.zeros((1, 1)),
        "gv_b1": att["layer1"]["b"][None, :] if "layer1" in att else jnp.zeros((1, 1)),
        "gv_w2": att["layer2"]["w"] if "layer2" in att else jnp.zeros((1, 1)),
        "gv_b2": att["layer2"]["b"][None, :] if "layer2" in att else jnp.zeros((1, 1)),
    }
    assert w["fp_b"].shape[-1] == M * cfg.outputs_per_step
    return {k: v.astype(dtype) for k, v in w.items()}


WEIGHT_ORDER = [
    "pre_w1", "pre_b1", "pre_w2", "pre_b2",
    "l1_pre", "l1_ctx", "l1_h", "l1_b", "l2_x", "l2_h", "l2_b",
    "att_wq", "att_conv", "att_conv_b", "att_wl", "att_v", "att_b",
    "mu_c", "mu_q", "mu_b",
    "fp_h", "fp_c", "fp_b", "sp_h", "sp_c", "sp_b",
    "fpl_h", "fpl_c", "fpl_b",
    "gmm_q", "gmm_c", "gmm_b", "gv_w1", "gv_b1", "gv_w2", "gv_b2",
]


def _lstm_eval(gates, c, h, zoneout):
    """TF-order (i, j, f, o) LSTM + eval-mode zoneout EMA
    (models/layers.py lstm_step + zoneout eval branch).

    Returns ``(c_carry, h_carry, out)``: zoneout mixes only the carried
    state; the raw ``new_h`` is the downstream output (reference
    modules.py:114-142, same contract as layers.zoneout_lstm_step)."""
    u = c.shape[-1]
    i = jax.nn.sigmoid(gates[:, :u])
    j = jnp.tanh(gates[:, u : 2 * u])
    f = jax.nn.sigmoid(gates[:, 2 * u : 3 * u] + 1.0)
    o = jax.nn.sigmoid(gates[:, 3 * u :])
    new_c = f * c + i * j
    new_h = o * jnp.tanh(new_c)
    keep = 1.0 - zoneout
    return keep * new_c + zoneout * c, keep * new_h + zoneout * h, new_h


def _kernel(
    seed_ref,  # scalar prefetch [B] int32 — one dropout seed PER ROW
    keys_ref,  # [B, T_in, A]
    values_ref,  # [B, T_in, V]
    mask_ref,  # [B, T_in] f32 1/0
    *rest,
    chunk: int,
    cfg_static: tuple,
    ablate: str = "full",
):
    (
        zoneout, drop_rate, B, T_in, A, V, u, M, F, taps,
        anti_repeat, dwell_first, dwell_rest,
        mode, synth_constraint, synth_window, cumulative, n_mix, n_heads,
        smoothing, r, stop_at_any,
    ) = cfg_static
    lsa = mode == "lsa"
    weights = rest[: len(WEIGHT_ORDER)]
    (frames_out, stops_out, aligns_out) = rest[len(WEIGHT_ORDER) : len(WEIGHT_ORDER) + 3]
    (
        c1S, h1S, c2S, h2S, ctxS, alphaS, cumS, muS, prevS, doneS,
        energyS, shiftS, winS, maxattS, posrecS,
    ) = rest[len(WEIGHT_ORDER) + 3 :]
    # the Mosaic [B, w] -> [B, w, 1] expansion only lowers for a single
    # (8, 128) tile, so every op that needs it runs over these lane tiles
    tiles = [(lo, min(128, T_in - lo)) for lo in range(0, T_in, 128)]
    W = dict(zip(WEIGHT_ORDER, weights))
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (c1S, h1S, c2S, h2S, ctxS, muS, prevS, doneS):
            ref[:] = jnp.zeros_like(ref)
        if mode != "forward":
            # lsa/gmm/graves start alignments/cumulated/vector-state at
            # zeros (attention.init_state); muS columns carry kappa (gmm)
            # or per-head mu (graves)
            alphaS[:] = jnp.zeros_like(alphaS)
            cumS[:] = jnp.zeros_like(cumS)
            muS[:] = jnp.zeros_like(muS)
        else:
            # alpha/cumulated start one-hot at position 0 (attention.py:112-117)
            col = jax.lax.broadcasted_iota(jnp.int32, (B, T_in), 1)
            one_hot = jnp.where(col == 0, 1.0, 0.0).astype(f32)
            alphaS[:] = one_hot
            cumS[:] = one_hot
            muS[:, 0] = jnp.full((B,), 0.5, f32)
        energyS[:] = jnp.zeros_like(energyS)
        shiftS[:] = jnp.zeros_like(shiftS)
        maxattS[:] = jnp.zeros_like(maxattS)
        posrecS[:] = jnp.zeros_like(posrecS)

    # prenet dropout widths (the only in-kernel randomness): both layers'
    # bits for one step are drawn in ONE [1, p1+p2] draw per row
    p1 = W["pre_w1"].shape[-1]
    p2 = W["pre_w2"].shape[-1]

    def draw_step_bits(step_g):
        """Per-ROW dropout bits for one decode step: row i is seeded by
        (seed_ref[i], step) only, so its noise stream is independent of the
        co-batched rows — requests with distinct seeds coalesce into one
        kernel batch and stay individually reproducible."""
        rows = []
        for i in range(B):
            pltpu.prng_seed(seed_ref[i], step_g)
            rows.append(pltpu.prng_random_bits((1, p1 + p2)))
        return pltpu.bitcast(jnp.concatenate(rows, axis=0), jnp.uint32)

    def dropout(x, bits):
        if drop_rate <= 0.0:
            return x
        # keep with prob (1-rate): uniform bits < (1-rate) * 2^32
        thresh = jnp.uint32(int((1.0 - drop_rate) * 4294967295.0))
        keep = bits < thresh
        return jnp.where(keep, x / (1.0 - drop_rate), 0.0)

    def mm(x, wname):
        wref = W[wname]
        return jnp.dot(x.astype(wref.dtype), wref[:], preferred_element_type=f32)

    def body(s, _):
        if ablate == "noexit":
            done = jnp.zeros((B, 1), jnp.float32)
            all_done = jnp.asarray(False)
        else:
            done = doneS[:, 0:1]  # [B,1] 1.0 = finished
            all_done = jnp.min(doneS[:, 0]) > 0.5

        def compute():
            prev = prevS[:, :M]
            ctx = ctxS[:]
            h1, c1, h2, c2 = h1S[:], c1S[:], h2S[:], c2S[:]
            mu = muS[:, 0:1]
            alpha = alphaS[:]
            cum = cumS[:]
            mask = mask_ref[:]

            # prenet (always-on dropout, modules.py:220-251)
            if drop_rate > 0.0:
                bits = draw_step_bits(pl.program_id(0) * chunk + s)
            else:
                bits = None
            p = dropout(
                jnp.maximum(mm(prev, "pre_w1") + W["pre_b1"][:].astype(f32), 0.0),
                None if bits is None else bits[:, :p1],
            )
            p = dropout(
                jnp.maximum(mm(p, "pre_w2") + W["pre_b2"][:].astype(f32), 0.0),
                None if bits is None else bits[:, p1 : p1 + p2],
            )

            if ablate == "nornn":
                # keep a tiny prenet contribution so DCE can't drop the
                # stage; shape-safe for any (prenet, lstm) geometry
                eps = jnp.sum(p, axis=-1, keepdims=True) * 1e-6  # [B, 1]
                c1n, h1n = c1, h1 + eps
                c2n, h2n = c2, h2 + eps
                out2 = h2n
            else:
                # LSTM1 over [prenet, context]
                g1 = mm(p, "l1_pre") + mm(ctx, "l1_ctx") + mm(h1, "l1_h") + W["l1_b"][:].astype(f32)
                c1n, h1n, out1 = _lstm_eval(g1, c1, h1, zoneout)
                # LSTM2 consumes the raw LSTM1 output (zoneout only carries)
                g2 = mm(out1, "l2_x") + mm(h2, "l2_h") + W["l2_b"][:].astype(f32)
                c2n, h2n, out2 = _lstm_eval(g2, c2, h2, zoneout)

            if mode in ("forward", "lsa"):
                # --- forward + location-sensitive attention ---
                # Energy is produced one <=128-wide encoder tile at a time (see
                # ``tiles`` above): location conv + location layer + tanh energy
                # stay tile-local, so no full-width [B, T_in, *] intermediate is
                # ever materialized and T_in may exceed one lane tile.
                pq = mm(out2, "att_wq")  # [B, A]
                if ablate == "noatt":
                    energy = pq[:, :1] * jnp.ones((B, T_in), f32)
                else:
                    padl = (taps - 1) // 2
                    conv_w = W["att_conv"][:].astype(f32)  # [taps, F]
                    # The Mosaic [B,w] -> [B,w,1] expansion lowers only when the
                    # sliced lanes stay inside one (8,128) vreg (offset + width
                    # <= 128), so the encoder axis is processed in 64-wide
                    # subtiles: each subtile's padded conv window (width
                    # wdt + taps - 1 <= 128) is staged ONCE into winS at lane
                    # offset 0, and every tap then reads winS[:, j : j + wdt]
                    # (offset j <= taps-1, so the bound j + wdt <= 128 requires
                    # taps <= 65 — enforced by supported()).
                    for lo in range(0, T_in, 64):
                        wdt = min(64, T_in - lo)
                        # location features: SAME conv over cumulated alignments
                        if ablate == "noconv":
                            f_tile = jnp.zeros((B, wdt, F), f32)
                        else:
                            d0 = max(0, padl - lo)
                            d1 = min(wdt + taps - 1, T_in - lo + padl)
                            if d0 > 0:
                                winS[:, :d0] = jnp.zeros((B, d0), f32)
                            if d1 < wdt + taps - 1:
                                winS[:, d1 : wdt + taps - 1] = jnp.zeros(
                                    (B, wdt + taps - 1 - d1), f32
                                )
                            conv_src = alpha if lsa else cum
                            winS[:, d0:d1] = conv_src[:, lo - padl + d0 : lo - padl + d1]
                            f_tile = jnp.zeros((B, wdt, F), f32)
                            for j in range(taps):
                                win = winS[:, j : j + wdt]  # [B, wdt], j + wdt <= 128
                                f_tile = f_tile + win[..., None] * conv_w[j][None, None, :]
                            f_tile = f_tile + W["att_conv_b"][:].astype(f32)[None]
                        loc_t = jnp.dot(
                            f_tile.reshape(B * wdt, F).astype(W["att_wl"].dtype),
                            W["att_wl"][:],
                            preferred_element_type=f32,
                        ).reshape(B, wdt, A)
                        e_t = jnp.tanh(
                            keys_ref[:, lo : lo + wdt, :].astype(f32)
                            + pq[:, None, :]
                            + loc_t
                            + W["att_b"][:].astype(f32)[None]
                        )
                        energyS[:, lo : lo + wdt] = jnp.sum(
                            e_t * W["att_v"][:].astype(f32)[None], axis=-1
                        )  # [B, wdt]
                    energy = energyS[:]

                col_ar = jax.lax.broadcasted_iota(jnp.int32, (B, T_in), 1)
                if lsa and synth_constraint:
                    # synthesis window around the previous argmax
                    # (models.attention.lsa_window_valid; reference
                    # location_sensitive_attention.py:201-214)
                    prev_m = maxattS[:, 0:1]
                    if anti_repeat:  # 'monotonic': [prev, prev + w)
                        valid = (col_ar >= prev_m) & (col_ar < prev_m + synth_window)
                    else:  # 'window': [prev - ceil(w/2), prev + w//2)
                        back = synth_window // 2 + (synth_window % 2)
                        valid = (col_ar >= prev_m - back) & (
                            col_ar < prev_m + synth_window // 2
                        )
                    energy = jnp.where(valid, energy, -1e9)
                if smoothing:
                    # sigmoid-normalize instead of softmax
                    # (attention.py _smoothing_normalization)
                    sig = jax.nn.sigmoid(energy) * mask
                    align_sm = sig / jnp.sum(sig, axis=-1, keepdims=True)
                else:
                    energy = jnp.where(mask > 0, energy, -1e9)
                    energy = energy - jnp.max(energy, axis=-1, keepdims=True)
                    exp_e = jnp.exp(energy)
                    align_sm = exp_e / jnp.sum(exp_e, axis=-1, keepdims=True)
                cum_new = cum + align_sm

                if lsa:
                    # vanilla location-sensitive: softmax IS the alignment
                    # (models.attention._lsa_step); carry cumulates if enabled
                    align = align_sm
                    maxv = jnp.max(align, axis=-1, keepdims=True)
                    arg = jnp.min(
                        jnp.where(align == maxv, col_ar, T_in), axis=-1, keepdims=True
                    )
                    maxattS[:, 0:1] = arg
                    alpha_next = align + alpha if cumulative else align
                else:
                    # forward recursion (attention.py:156-167,218-220)
                    # zero-fill right-shift of alpha via a padded scratch (a lane
                    # roll would not lower past one 128-lane tile): column 0 of
                    # shiftS stays zero from init, columns [1, T_in] hold alpha
                    shiftS[:, 1 : 1 + T_in] = alpha
                    shift_alpha = shiftS[:, :T_in]
                    align = ((1.0 - mu) * alpha + mu * shift_alpha + 1e-10) * align_sm

                if anti_repeat and not lsa:
                    # in-kernel port of models.attention.anti_repeat_constrain
                    # (reference forward_attention.py:176-215), applied between
                    # the forward recursion and the renormalize, exactly like
                    # the XLA path.  int32 state lives in [B, 128] VMEM scratch
                    # (column 0).
                    col = jax.lax.broadcasted_iota(jnp.int32, (B, T_in), 1)
                    # first-occurrence argmax (matches jnp.argmax tie-breaking),
                    # built from max + where/min — lowers as plain reductions
                    maxv = jnp.max(align, axis=-1, keepdims=True)
                    arg = jnp.min(
                        jnp.where(align == maxv, col, T_in), axis=-1, keepdims=True
                    )  # [B, 1] i32
                    prev_m = maxattS[:, 0:1]
                    prev_p = posrecS[:, 0:1]
                    m = jnp.where(arg <= prev_m, prev_m, prev_m + 1)
                    short = (prev_p < dwell_first) & (m > 2)
                    m = jnp.where(short, prev_m, m)
                    stayed = m == prev_m
                    pos_rec = jnp.where(stayed, prev_p + 1, 1)
                    over = pos_rec >= dwell_rest
                    m = jnp.where(over, m + 1, m)
                    pos_rec = jnp.where(over, 1, pos_rec)
                    window = (col >= m - 2) & (col < m + 3)
                    align = jnp.where(window, align, 0.0)
                    att_sum = jnp.sum(align, axis=-1, keepdims=True)
                    att_sum = jnp.where(att_sum < 1e-10, 1.0, att_sum)
                    at_max = col == jnp.clip(m, 0, T_in - 1)
                    align = jnp.where(at_max, att_sum * 2.0, align)
                    maxattS[:, 0:1] = m
                    posrecS[:, 0:1] = pos_rec

                if not lsa:
                    align = align / jnp.sum(align, axis=-1, keepdims=True)
            else:
                # --- gmm / graves attention (no location energy, no keys) ---
                # reference gmm_attention.py:25-67 / graves_attention.py:36-110;
                # per-position work is pure elementwise over <=128-wide lane
                # tiles; the K/H-sized vector state rides muS columns.
                col_f = jax.lax.broadcasted_iota(jnp.int32, (B, T_in), 1).astype(f32)
                if mode == "gmm":
                    K = n_mix
                    g = jnp.exp(
                        mm(out2, "gmm_q") + mm(ctx, "gmm_c") + W["gmm_b"][:].astype(f32)
                    )  # [B, 3K]
                    alpha_m, beta, kappa_d = g[:, :K], g[:, K : 2 * K], g[:, 2 * K :]
                    kappa = muS[:, :K] + kappa_d  # cumulative centers
                    muS[:, :K] = kappa
                    score = jnp.zeros((B, T_in), f32)
                    for k in range(K):
                        a_k = (alpha_m[:, k : k + 1] / beta[:, k : k + 1])
                        score = score + a_k * jnp.exp(
                            -((kappa[:, k : k + 1] - col_f) ** 2) / beta[:, k : k + 1]
                        )
                    score = jnp.where(mask > 0, score, -1e9)
                    score = score - jnp.max(score, axis=-1, keepdims=True)
                    e = jnp.exp(score)
                    align = e / jnp.sum(e, axis=-1, keepdims=True)
                else:  # graves
                    H = n_heads
                    hid = jnp.maximum(
                        mm(out2, "gv_w1") + W["gv_b1"][:].astype(f32), 0.0
                    )
                    gbk = mm(hid, "gv_w2") + W["gv_b2"][:].astype(f32)  # [B, 3H]
                    g_t = jax.nn.softmax(gbk[:, :H], axis=-1) + 1e-5
                    sig_t = jax.nn.softplus(gbk[:, H : 2 * H]) + 1e-5
                    mu_t = muS[:, :H] + jax.nn.softplus(gbk[:, 2 * H :])
                    muS[:, :H] = mu_t
                    align = jnp.zeros((B, T_in), f32)
                    # align[t] = sum_h g * (F((mu-(t+1.5))/sig) - F((mu-(t+0.5))/sig)),
                    # F(x) = 1/(1+sigmoid(x))  (CDF-difference discretization)
                    for h in range(H):
                        mu_h = mu_t[:, h : h + 1]
                        sig_h = sig_t[:, h : h + 1]
                        f1 = 1.0 / (1.0 + jax.nn.sigmoid((mu_h - (col_f + 1.5)) / sig_h))
                        f0 = 1.0 / (1.0 + jax.nn.sigmoid((mu_h - (col_f + 0.5)) / sig_h))
                        align = align + g_t[:, h : h + 1] * (f1 - f0)
                    align = jnp.where(mask > 0, align, 1e-20)
                cum_new = cum + align
                alpha_next = align

            ctx_new = jnp.zeros((B, V), f32)
            for lo, wdt in tiles:
                # slice then expand_dims: mixing a partial slice with None in
                # one index expression falls back to jnp's gather, which
                # Mosaic cannot lower; tile offsets are 128-aligned so the
                # sliced vector sits at lane offset 0 and reshapes directly
                a_t = jnp.expand_dims(align[:, lo : lo + wdt], -1)  # [B, wdt, 1]
                ctx_new = ctx_new + jnp.sum(
                    a_t * values_ref[:, lo : lo + wdt, :].astype(f32),
                    axis=1,
                )  # [B, V]
            if mode == "forward":
                mu_new = jax.nn.sigmoid(
                    mm(ctx_new, "mu_c") + mm(out2, "mu_q") + W["mu_b"][:].astype(f32)
                )[:, 0:1]

            frames = mm(out2, "fp_h") + mm(ctx_new, "fp_c") + W["fp_b"][:].astype(f32)  # [B, M*r]
            stop = mm(out2, "sp_h") + mm(ctx_new, "sp_c") + W["sp_b"][:].astype(f32)  # [B, r]

            # finished examples keep advancing with real outputs/state until
            # the WHOLE batch stops — exactly the XLA while_loop and the
            # reference dynamic_decode(impute_finished=False, tacotron.py:101)
            # semantics; `done` only feeds the all-done early exit.  (An
            # earlier version froze per-example state/outputs here, which
            # made the postnet tail of trimmed mels differ between the
            # kernel and XLA paths when batch examples stop at different
            # steps.)
            frames_out[s, :, :] = frames
            if r == 1:
                stops_out[s, :] = stop[:, 0]
            else:
                stops_out[s, :, :] = stop
            aligns_out[s, :, :] = align

            c1S[:] = c1n
            h1S[:] = h1n
            c2S[:] = c2n
            h2S[:] = h2n
            ctxS[:] = ctx_new
            # forward carries the renormalized align; lsa carries the
            # cumulated alignments; gmm/graves carry align (their vector
            # state — kappa / per-head mu — was written to muS in-branch)
            alphaS[:] = align if mode == "forward" else alpha_next
            cumS[:] = cum_new
            if mode == "forward":
                muS[:, 0:1] = mu_new
            if r == 1:
                prevS[:, :M] = frames
            else:
                # last frame via its own matmul over the projection's last-M
                # columns (see pack_weights fpl_*) — bit-identical to
                # frames[:, -M:] without the unaligned lane slice
                prevS[:, :M] = (
                    mm(out2, "fpl_h") + mm(ctx_new, "fpl_c") + W["fpl_b"][:].astype(f32)
                )
            fin = jax.nn.sigmoid(stop) > 0.5  # [B, r]
            if stop_at_any:
                newly_done = jnp.max(fin.astype(f32), axis=-1) > 0.5
            else:
                newly_done = jnp.min(fin.astype(f32), axis=-1) > 0.5
            if ablate != "noexit":
                doneS[:, 0] = jnp.maximum(doneS[:, 0], newly_done.astype(f32))

        if ablate == "noexit":
            compute()
        else:
            pl.when(jnp.logical_not(all_done))(compute)

            @pl.when(all_done)
            def _():
                frames_out[s, :, :] = jnp.zeros((B, M * r), f32)
                if r == 1:
                    stops_out[s, :] = jnp.full((B,), 1e4, f32)
                else:
                    stops_out[s, :, :] = jnp.full((B, r), 1e4, f32)
                aligns_out[s, :, :] = jnp.zeros((B, T_in), f32)

        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_iters", "chunk", "interpret", "dtype", "ablate")
)
def decode_autoregressive_pallas(
    params: Params,
    cfg: TacotronModelConfig,
    memory: jax.Array,  # [B, T_in, V]
    mem_mask: jax.Array,  # [B, T_in]
    rng: jax.Array,
    max_iters: int,
    chunk: int | None = None,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    ablate: str = "full",
):
    """Drop-in for ``models.tacotron.decode_autoregressive`` (inference):
    returns (frames [B,T,M], stops [B,T], aligns [B,T,T_in], stop_len [B]).

    Batches beyond the Mosaic tile envelope (B > 8) run as sequential
    8-example kernel invocations (the last group padded by repeating a real
    example); the encoder axis is processed in <=128-wide lane tiles and
    T_in is VMEM-bound (``supported_shape``: ~768 with bf16 keys/values,
    ~384 at f32) — longer inputs fall back to the XLA decode.

    Precision: weights ride VMEM in ``dtype`` (bf16 default).  Keys/values
    follow ``cfg.kernel_kv_dtype`` ("bf16" default — halves the dominant
    per-position footprint; set "f32" to keep attention energies exact) and
    are always f32 when ``dtype`` itself is f32 (the parity-test mode)."""
    from ..models import attention as ATT

    from . import is_per_example_keys

    B, T_in, V = memory.shape
    per_row_keys = is_per_example_keys(rng)
    if per_row_keys and jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        rng = jax.random.key_data(rng)  # raw [B, 2]: slice/repeat-friendly
    if B > 8:
        outs = []
        for start in range(0, B, 8):
            mem_g = memory[start : start + 8]
            mask_g = mem_mask[start : start + 8]
            pad = 8 - mem_g.shape[0]
            rng_g = (
                rng[start : start + 8] if per_row_keys
                else jax.random.fold_in(rng, start)
            )
            if pad:
                # pad by repeating a real example (not zeros): zero-memory rows
                # never fire the stop token, which would defeat the kernel's
                # all-done early exit and pin the last group at max_iters
                mem_g = jnp.concatenate([mem_g, jnp.repeat(mem_g[-1:], pad, 0)], 0)
                mask_g = jnp.concatenate([mask_g, jnp.repeat(mask_g[-1:], pad, 0)], 0)
                if per_row_keys:
                    rng_g = jnp.concatenate([rng_g, jnp.repeat(rng_g[-1:], pad, 0)], 0)
            outs.append(
                decode_autoregressive_pallas(
                    params, cfg, mem_g, mask_g, rng_g,
                    max_iters, chunk, interpret, dtype, ablate,
                )
            )
        return tuple(
            jnp.concatenate([o[i] for o in outs], axis=0)[:B] for i in range(4)
        )
    A, F, u, M = cfg.attention_dim, cfg.attention_filters, cfg.decoder_lstm_units, 80
    taps = cfg.attention_kernel
    r = cfg.outputs_per_step
    if cfg.attention_mode in ("forward", "lsa"):
        keys = ATT.precompute_keys(params["attention"], cfg, memory)
    else:
        # gmm/graves use no projected keys; keys_ref is statically dead in
        # those branches.  The dummy must be T_in-INDEPENDENT to actually
        # save VMEM: the trailing dim tiles to 128 lanes regardless, so a
        # (B, T_in, 1) block would still stage B*T_in*128 lanes of zeros.
        keys = jnp.zeros((B, 1, 1), jnp.float32)

    if chunk is None:
        # double-buffered output chunks (frames + stops + aligns, f32) must
        # fit VMEM beside weights (~4 MB bf16) + memory/keys (in ``dtype``):
        # budget the chunk so larger B*T_in shrink it
        kv_bytes = 2 if dtype == jnp.bfloat16 else 4
        fixed = 4_500_000 + B * T_in * (V + A) * kv_bytes
        per_step = 2 * B * ((M + 1) * r + T_in) * 4  # x2 output double buffering
        budget = max(int((13_000_000 - fixed) / max(per_step, 1)), 8)
        chunk = max(8, min(48, (budget // 8) * 8))

    n_chunks = -(-max_iters // chunk)
    T_pad = n_chunks * chunk
    w = pack_weights(params, cfg, dtype)

    from . import kernel_seed

    # [B] per-ROW seeds: row i's on-chip dropout stream is seeded by
    # (seed[i], global step) only, so an example's decode noise does not
    # depend on what it was co-batched with (serving coalesces distinct-seed
    # requests into one kernel batch).  A single shared key is expanded via
    # the same fold_in(key, i) row derivation for determinism either way.
    if per_row_keys:
        seeds = jax.vmap(lambda k: kernel_seed(k)[0])(rng).astype(jnp.int32)
    else:
        seeds = jax.vmap(
            lambda i: kernel_seed(jax.random.fold_in(rng, i))[0]
        )(jnp.arange(B)).astype(jnp.int32)

    full = lambda a: pl.BlockSpec(a.shape, lambda i, s: (0,) * a.ndim, memory_space=pltpu.VMEM)
    cfg_static = (
        float(cfg.zoneout_rate), float(cfg.dropout_rate), B, T_in, A, V, u, M, F, taps,
        bool(cfg.anti_repeat), int(cfg.dwell_limit_first), int(cfg.dwell_limit_rest),
        cfg.attention_mode, bool(cfg.synthesis_constraint),
        int(cfg.synthesis_window), bool(cfg.cumulative_weights),
        int(cfg.num_attn_mixtures), int(cfg.graves_heads),
        bool(cfg.smoothing), r, bool(cfg.stop_at_any),
    )
    # keys/values ride VMEM in bf16 by default: halves the dominant
    # per-position footprint, roughly doubling the T_in envelope; the kernel
    # upcasts per-tile to f32 before use.  cfg.kernel_kv_dtype="f32" keeps
    # attention energies exact (shrinking the envelope back to ~384), and
    # dtype=f32 (the parity-test mode) always keeps kv f32.
    kv_dtype = dtype if cfg.kernel_kv_dtype == "bf16" else jnp.float32
    keys = keys.astype(kv_dtype)
    memory_kv = memory.astype(kv_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            full(keys),
            full(memory),
            full(mem_mask),
            *[full(w[k]) for k in WEIGHT_ORDER],
        ],
        out_specs=[
            pl.BlockSpec((chunk, B, M * r), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            (
                pl.BlockSpec((chunk, B), lambda i, s: (i, 0), memory_space=pltpu.VMEM)
                if r == 1
                else pl.BlockSpec((chunk, B, r), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM)
            ),
            pl.BlockSpec((chunk, B, T_in), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, u), jnp.float32),  # c1
            pltpu.VMEM((B, u), jnp.float32),  # h1
            pltpu.VMEM((B, u), jnp.float32),  # c2
            pltpu.VMEM((B, u), jnp.float32),  # h2
            pltpu.VMEM((B, V), jnp.float32),  # context
            pltpu.VMEM((B, T_in), jnp.float32),  # alpha
            pltpu.VMEM((B, T_in), jnp.float32),  # cumulated
            pltpu.VMEM((B, 128), jnp.float32),  # mu (col 0)
            pltpu.VMEM((B, 128), jnp.float32),  # prev frame (cols 0:M)
            pltpu.VMEM((B, 128), jnp.float32),  # done flag (col 0)
            pltpu.VMEM((B, T_in), jnp.float32),  # per-tile energy assembly
            pltpu.VMEM((B, T_in + 1), jnp.float32),  # zero-fill alpha shift
            pltpu.VMEM((B, 128), jnp.float32),  # padded conv window per subtile
            pltpu.VMEM((B, 128), jnp.int32),  # anti-repeat max_attentions (col 0)
            pltpu.VMEM((B, 128), jnp.int32),  # anti-repeat pos_rec (col 0)
        ],
    )
    frames, stops, aligns = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, cfg_static=cfg_static, ablate=ablate),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B, M * r), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B) if r == 1 else (T_pad, B, r), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, T_in), jnp.float32),
        ],
        interpret=interpret,
    )(seeds, keys, memory_kv, mem_mask, *[w[k] for k in WEIGHT_ORDER])

    frames = jnp.swapaxes(frames[:max_iters], 0, 1)  # [B, T, M*r]
    stops = jnp.swapaxes(stops[:max_iters], 0, 1)  # [B, T] or [B, T, r]
    aligns = jnp.swapaxes(aligns[:max_iters], 0, 1)  # [B, T, T_in]

    if r == 1:
        finished = jax.nn.sigmoid(stops) > 0.5
        # first True index (or max_iters), EXCLUSIVE of the flagged frame —
        # same rule as decode_autoregressive (reference
        # tacotron_synthesize.py:105)
        idx = jnp.argmax(finished, axis=-1)
        any_f = jnp.any(finished, axis=-1)
        stop_len = jnp.where(any_f, idx, max_iters).astype(jnp.int32)
        return frames, stops, aligns, stop_len

    # r>1: per-STEP done policy over the r frames (reference stop_at_any,
    # helpers.py:58-61), frame-exact trim length inside the flagged step —
    # exactly decode_autoregressive's rule
    fin_frames = jax.nn.sigmoid(stops) > 0.5  # [B, T, r]
    ex_done = jnp.any(fin_frames, -1) if cfg.stop_at_any else jnp.all(fin_frames, -1)
    idx = jnp.argmax(ex_done, axis=-1)  # first flagged step
    any_f = jnp.any(ex_done, axis=-1)
    step_fin = jnp.take_along_axis(fin_frames, idx[:, None, None], axis=1)[:, 0]  # [B, r]
    first_in_group = jnp.argmax(step_fin, axis=-1)
    stop_len = jnp.where(any_f, idx * r + first_in_group, max_iters * r).astype(jnp.int32)
    frames = frames.reshape(B, max_iters * r, M)
    stops = stops.reshape(B, max_iters * r)
    return frames, stops, aligns, stop_len
