"""Tacotron-2 acoustic model: phoneme ids -> mel spectrogram.

TPU-first re-design of the reference graph (tacotron/models/tacotron.py:28-192):
the decoder is a single fused step function run under ``lax.scan`` (teacher
forced training / GTA) or ``lax.while_loop`` with static-shape output buffers
(autoregressive inference with dynamic stop), instead of TF1's
``dynamic_decode``.  All four attention variants plug in via
``models.attention``'s shared state protocol.

Architecture (reference tacotron_hparams.py:100-160):
  embedding(128) -> 3x[conv5-256 + BN + relu + drop] -> BiLSTM(256/dir, zoneout .1)
  -> decoder: prenet[256,256] (always-on dropout) + 2xZoneoutLSTM(256)
     + attention + frame/stop projections (r=1)
  -> 5-layer postnet (tanh conv5-256, final linear) + residual projection
  -> optional CBHG mel->linear head.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import TacotronModelConfig
from . import attention as A
from . import layers as L

Params = Dict[str, Any]


class TacotronOutput(NamedTuple):
    decoder_output: jax.Array  # [B, T_out, M] pre-postnet mels
    mel_outputs: jax.Array  # [B, T_out, M] post-postnet mels
    stop_logits: jax.Array  # [B, T_out]
    alignments: jax.Array  # [B, T_dec, T_in]
    stop_lengths: jax.Array | None = None  # [B] inference: frames until stop
    linear_outputs: jax.Array | None = None  # [B, T_out, F] CBHG head


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_tacotron(key, cfg: TacotronModelConfig) -> Params:
    ks = jax.random.split(key, 16)
    enc_out = 2 * cfg.encoder_lstm_units  # concat fw+bw
    dec_in = cfg.prenet_layers[-1] + enc_out
    proj_in = cfg.decoder_lstm_units + enc_out
    M, r = 80, cfg.outputs_per_step

    params: Params = {
        "embedding": L.uniform_embedding(ks[0], (cfg.vocab_size, cfg.embedding_dim)),
        "enc_convs": L.conv_stack_init(
            ks[1], cfg.enc_conv_layers, cfg.enc_conv_kernel, cfg.embedding_dim, cfg.enc_conv_channels
        ),
        "enc_lstm_fw": L.lstm_init(ks[2], cfg.enc_conv_channels, cfg.encoder_lstm_units),
        "enc_lstm_bw": L.lstm_init(ks[3], cfg.enc_conv_channels, cfg.encoder_lstm_units),
        "attention": A.init_params(ks[4], cfg, enc_out, cfg.decoder_lstm_units),
        "prenet": L.prenet_init(ks[5], M, cfg.prenet_layers),
        "dec_lstm1": L.lstm_init(ks[6], dec_in, cfg.decoder_lstm_units),
        "dec_lstm2": L.lstm_init(ks[7], cfg.decoder_lstm_units, cfg.decoder_lstm_units),
        "frame_projection": L.dense_init(ks[8], proj_in, M * r),
        "stop_projection": L.dense_init(ks[9], proj_in, r),
        "postnet": L.conv_stack_init(ks[10], cfg.postnet_layers, cfg.postnet_kernel, M, cfg.postnet_channels),
        "postnet_projection": L.dense_init(ks[11], cfg.postnet_channels, M),
    }
    if cfg.predict_linear:
        params["cbhg"] = init_cbhg(ks[12], cfg, in_dim=M)
        params["linear_projection"] = L.dense_init(ks[13], 2 * cfg.cbhg_rnn_units, 1025)
    return params


def init_cbhg(key, cfg: TacotronModelConfig, in_dim: int) -> Params:
    """CBHG mel->linear head (reference modules.py:4-78)."""
    ks = jax.random.split(key, cfg.cbhg_kernels + 8)
    bank = []
    for k in range(1, cfg.cbhg_kernels + 1):
        bank.append(
            {
                "conv": L.conv1d_init(ks[k - 1], k, in_dim, cfg.cbhg_conv_channels),
                "bn": L.batchnorm_init(cfg.cbhg_conv_channels),
            }
        )
    j = cfg.cbhg_kernels
    proj1 = {
        "conv": L.conv1d_init(ks[j], 3, cfg.cbhg_kernels * cfg.cbhg_conv_channels, cfg.cbhg_projection),
        "bn": L.batchnorm_init(cfg.cbhg_projection),
    }
    proj2 = {
        "conv": L.conv1d_init(ks[j + 1], 3, cfg.cbhg_projection, in_dim),
        "bn": L.batchnorm_init(in_dim),
    }
    highway_in = L.dense_init(ks[j + 2], in_dim, cfg.cbhg_highway_units)
    highways = [
        L.highway_init(ks[j + 3 + i], cfg.cbhg_highway_units)
        for i in range(cfg.cbhg_highwaynet_layers)
    ]
    gru_fw = L.gru_init(ks[j + 7], cfg.cbhg_highway_units, cfg.cbhg_rnn_units)
    gru_bw = L.gru_init(
        jax.random.fold_in(ks[j + 7], 1), cfg.cbhg_highway_units, cfg.cbhg_rnn_units
    )
    return {
        "bank": bank,
        "proj1": proj1,
        "proj2": proj2,
        "highway_in": highway_in,
        "highways": highways,
        "gru_fw": gru_fw,
        "gru_bw": gru_bw,
    }


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode(
    params: Params,
    cfg: TacotronModelConfig,
    inputs: jax.Array,  # [B, T_in] int32
    input_lengths: jax.Array,  # [B]
    train: bool,
    rng: jax.Array,
):
    """Returns (memory [B,T,512], updated conv-BN params)."""
    x = params["embedding"][inputs]  # [B, T, 128]
    k1, k2, k3 = jax.random.split(rng, 3)
    x, new_convs = L.conv_stack(params["enc_convs"], x, k1, train, cfg.dropout_rate)
    fw = L.unidir_lstm(
        params["enc_lstm_fw"], x, k2, cfg.encoder_lstm_units, cfg.zoneout_rate, train
    )
    bw = L.unidir_lstm(
        params["enc_lstm_bw"], x, k3, cfg.encoder_lstm_units, cfg.zoneout_rate, train,
        reverse=True, lengths=input_lengths,
    )
    memory = jnp.concatenate([fw, bw], axis=-1)
    # zero out positions past input length (tf dynamic_rnn semantics)
    mask = jnp.arange(inputs.shape[1])[None, :] < input_lengths[:, None]
    memory = memory * mask[..., None]
    return memory, new_convs


# ---------------------------------------------------------------------------
# decoder step (the fused hot path)
# ---------------------------------------------------------------------------


class DecoderCarry(NamedTuple):
    c1: jax.Array
    h1: jax.Array
    c2: jax.Array
    h2: jax.Array
    att: A.AttentionState


def init_decoder_carry(cfg: TacotronModelConfig, batch: int, mem_len: int, value_dim: int) -> DecoderCarry:
    u = cfg.decoder_lstm_units
    z = lambda: jnp.zeros((batch, u))
    return DecoderCarry(z(), z(), z(), z(), A.init_state(cfg, batch, mem_len, value_dim))


class StepRand(NamedTuple):
    """All randomness one decoder step consumes, precomputed from its key.

    Per-step threefry inside the decode loops costs more than the step's
    matmuls (measured 28 of 35 us/step on v5e), so the key derivation that
    used to live inside decoder_step is done once for all steps with a vmap
    (``step_rand_from_key``) and the resulting masks ride the scan's xs —
    bit-identical to drawing in place.  Fields are None when the
    corresponding knob is off (rate 0 / eval / non-gmm).
    """

    pre: tuple | None  # prenet keep-masks, one [B, size] per layer
    z1: tuple | None  # dec_lstm1 zoneout (cell, hidden) keep-masks
    z2: tuple | None  # dec_lstm2 zoneout masks
    att: jax.Array | None  # gmm attention dropout keep-mask


def step_rand_from_key(
    params: Params, cfg: TacotronModelConfig, rng: jax.Array, batch: int, train: bool
) -> StepRand:
    """Reproduces decoder_step's historical in-step key derivation exactly:
    (k_pre, k_z1, k_z2, k_att) = split(rng, 4), prenet folds k_pre per layer,
    each zoneout splits its key into (cell, hidden)."""
    k_pre, k_z1, k_z2, k_att = jax.random.split(rng, 4)
    pre = L.prenet_masks(params["prenet"], k_pre, cfg.dropout_rate, batch)
    zr = cfg.zoneout_rate
    if train and zr > 0.0:
        shape = (batch, cfg.decoder_lstm_units)
        z1 = L.zoneout_masks(k_z1, zr, shape)
        z2 = L.zoneout_masks(k_z2, zr, shape)
    else:
        z1 = z2 = None
    att = None
    if train and cfg.attention_mode == "gmm":
        q_dim = cfg.decoder_lstm_units
        v_dim = 2 * cfg.encoder_lstm_units
        att = A.gmm_dropout_mask(k_att, batch, q_dim, v_dim)
    return StepRand(pre, z1, z2, att)


# per-example-key detection lives beside kernel_seed (ops PRNG plumbing);
# re-exported here because the decode entry points document it
from ..ops import is_per_example_keys  # noqa: E402


def decoder_step(
    params: Params,
    cfg: TacotronModelConfig,
    prev_frame: jax.Array,  # [B, M] previous mel frame (GT or predicted)
    carry: DecoderCarry,
    keys: jax.Array,
    values: jax.Array,
    mem_mask: jax.Array,
    train: bool,
    rand: StepRand,
    pre: jax.Array | None = None,
    project: bool = True,
):
    """One decoder step (reference Architecture_wrappers.py:175-218):
    prenet -> concat(context) -> 2x ZoneoutLSTM -> attention -> projections.

    ``rand`` carries the step's precomputed dropout/zoneout masks
    (step_rand_from_key) — the step itself runs zero RNG ops.  ``pre``
    (optional) is the step's prenet output computed OUTSIDE the loop: under
    full teacher forcing the prenet inputs are the ground-truth frames, so
    decode_teacher_forced batches the whole prenet into one [T*B] matmul
    (bit-identical: same contraction, row-wise).  ``project=False`` skips
    the frame/stop projections and returns ``(out2, context, align, carry)``
    instead — under full teacher forcing the projections never feed the
    recurrence, so decode_teacher_forced batches them into one post-scan
    matmul (bit-identical, same argument as ``pre``)."""
    pre = (
        L.prenet(params["prenet"], prev_frame, None, cfg.dropout_rate, masks=rand.pre)
        if pre is None
        else pre
    )
    x = jnp.concatenate([pre, carry.att.context], axis=-1)
    # zoneout mixes only the carried state; the raw LSTM outputs (out1, out2)
    # feed the next cell / attention query / projections, exactly like the
    # reference's MultiRNNCell over ZoneoutLSTMCells (modules.py:114-142)
    c1, h1, out1 = L.zoneout_lstm_step(
        params["dec_lstm1"], x, carry.c1, carry.h1, None, cfg.zoneout_rate, train, masks=rand.z1
    )
    c2, h2, out2 = L.zoneout_lstm_step(
        params["dec_lstm2"], out1, carry.c2, carry.h2, None, cfg.zoneout_rate, train, masks=rand.z2
    )
    context, align, att_state = A.step(
        params["attention"], cfg, out2, carry.att, keys, values, mem_mask, train,
        drop_mask=rand.att,
    )
    if not project:
        return out2, context, align, DecoderCarry(c1, h1, c2, h2, att_state)
    proj_in = jnp.concatenate([out2, context], axis=-1)
    # frame + stop projections share proj_in, so run them as ONE dense over
    # the concatenated output columns (bitwise identical: same contraction,
    # per-column) — one fewer matmul on the scan's critical path.  The
    # concat of loop-invariant weights is hoisted out of the loop by XLA.
    w = jnp.concatenate([params["frame_projection"]["w"], params["stop_projection"]["w"]], axis=1)
    b = jnp.concatenate([params["frame_projection"]["b"], params["stop_projection"]["b"]])
    out = proj_in @ w + b
    n_frame = params["frame_projection"]["w"].shape[1]
    frames, stop = out[:, :n_frame], out[:, n_frame:]  # [B, M*r], [B, r]
    return frames, stop, align, DecoderCarry(c1, h1, c2, h2, att_state)


# ---------------------------------------------------------------------------
# teacher-forced decode (training / GTA) — lax.scan over time
# ---------------------------------------------------------------------------


def decode_teacher_forced(
    params: Params,
    cfg: TacotronModelConfig,
    memory: jax.Array,
    mem_mask: jax.Array,
    mel_targets: jax.Array,  # [B, T_out, M], T_out divisible by r
    train: bool,
    rng: jax.Array,
    teacher_forcing_ratio: jax.Array | float = 1.0,
    unroll: int = 1,
    fused_core: bool = False,
    fused_interpret: bool = False,
    fused_dtype=None,
    fused_wgrads: str = "accum",
):
    """Teacher-forced decode (reference helpers.py:136-142: with ratio 1.0
    the next input is unconditionally the ground-truth frame, which is what
    makes GTA generation work).  ``teacher_forcing_ratio`` < 1 enables
    scheduled sampling: per step/example, feed the ground truth with
    probability ratio, else the model's own previous frame (the reference
    implements this at helpers.py:125-134 but comments it out at :136-142;
    here it is a real knob).  ``unroll`` feeds ``lax.scan`` (bit-identical;
    cfg.tacotron_train.scan_unroll).  Returns (frames [B,T_out,M],
    stops [B,T_out], alignments [B,T_dec,T_in])."""
    B, T_out, M = mel_targets.shape
    r = cfg.outputs_per_step
    T_dec = T_out // r
    keys = A.precompute_keys(params["attention"], cfg, memory)

    # decoder inputs: <GO> zero frame then target frames strided by r
    # (reference helpers.py:84: targets[:, r-1::r]), shifted right one step
    strided = mel_targets[:, r - 1 :: r, :]  # [B, T_dec, M]
    go = jnp.zeros((B, 1, M), mel_targets.dtype)
    dec_inputs = jnp.concatenate([go, strided[:, :-1, :]], axis=1)  # [B, T_dec, M]

    step_rngs = jax.random.split(rng, T_dec)
    # Static full teacher forcing (the reference default: constant ratio 1.0,
    # helpers.py:136-142 always feeds ground truth) skips the per-step
    # uniform draw + select entirely; k_step is split identically in both
    # branches so the dropout stream is bit-identical across them.
    always_gt = isinstance(teacher_forcing_ratio, (int, float)) and teacher_forcing_ratio >= 1.0
    ratio = jnp.asarray(teacher_forcing_ratio, jnp.float32)

    # ALL per-step randomness precomputed outside the scan (one vmapped
    # threefry instead of ~10 RNG ops per iteration — the in-loop draws cost
    # more than the step's matmuls; see StepRand): same key derivation, so
    # the masks are bit-identical to drawing in place.
    def derive(k):
        k_step, k_tf = jax.random.split(k)
        rand = step_rand_from_key(params, cfg, k_step, B, train)
        # None under full teacher forcing (not a dummy array: a False value
        # here would mean "use the model's own prediction", the opposite)
        use_gt = None if always_gt else jax.random.uniform(k_tf, (B, 1)) < ratio
        return rand, use_gt

    rands, use_gts = jax.vmap(derive)(step_rngs)

    dec_inputs_t = jnp.swapaxes(dec_inputs, 0, 1)  # [T, B, M]
    pre_all = None
    if always_gt:
        # Full teacher forcing: every step's prenet input is known up front,
        # so run the whole prenet as ONE batched [T*B] matmul on the MXU
        # instead of two small matmuls per scan iteration.  Uses the same
        # per-step masks, and a batched dense contracts row-wise exactly
        # like the per-step dense — bit-identical outputs.
        pre_all = L.prenet(
            params["prenet"], dec_inputs_t, None, cfg.dropout_rate, masks=rands.pre
        )
        rands = rands._replace(pre=None)  # consumed above; drop from the scan xs

    if always_gt:
        # The frame/stop projections never feed the recurrence under full
        # teacher forcing, so the scan emits (out2, context) and ONE batched
        # [T*B, u+V] matmul projects after the scan — the same row-wise
        # contraction (equal to matmul-reassociation rounding) and two fewer
        # matmuls on the serial chain.
        if fused_core:
            # fused Pallas training decoder (ops/tacotron_trainer_kernel.py):
            # same semantics, same zoneout mask stream, custom VJP
            from ..ops import tacotron_trainer_kernel as TK

            masks = None
            if train and cfg.zoneout_rate > 0.0:
                masks = tuple(
                    m.astype(jnp.float32)
                    for m in (rands.z1[0], rands.z1[1], rands.z2[0], rands.z2[1])
                )
            out2_seq, ctx_seq, aligns = TK.fused_core_apply(
                params, cfg, pre_all, masks, keys, memory, mem_mask,
                interpret=fused_interpret,
                dtype=fused_dtype if fused_dtype is not None else jnp.bfloat16,
                wgrads=fused_wgrads,
            )
        else:

            def body_gt(dec_carry, inp):
                gt_frame, rand, pre = inp
                out2, context, align, dec_carry = decoder_step(
                    params, cfg, gt_frame, dec_carry, keys, memory, mem_mask,
                    train, rand, pre=pre, project=False,
                )
                return dec_carry, (out2, context, align)

            carry0 = init_decoder_carry(cfg, B, memory.shape[1], memory.shape[2])
            _, (out2_seq, ctx_seq, aligns) = jax.lax.scan(
                body_gt, carry0, (dec_inputs_t, rands, pre_all), unroll=unroll
            )
        proj_in = jnp.concatenate([out2_seq, ctx_seq], axis=-1)  # [T, B, u+V]
        w = jnp.concatenate(
            [params["frame_projection"]["w"], params["stop_projection"]["w"]], axis=1
        )
        b = jnp.concatenate([params["frame_projection"]["b"], params["stop_projection"]["b"]])
        out = proj_in @ w + b
        n_frame = params["frame_projection"]["w"].shape[1]
        frames, stops = out[..., :n_frame], out[..., n_frame:]
    else:

        def body(carry, inp):
            dec_carry, prev_pred = carry
            gt_frame, rand, use_gt, pre = inp
            prev_frame = jnp.where(use_gt, gt_frame, prev_pred)
            frames, stop, align, dec_carry = decoder_step(
                params, cfg, prev_frame, dec_carry, keys, memory, mem_mask, train, rand,
                pre=pre,
            )
            return (dec_carry, frames[:, -M:]), (frames, stop, align)

        carry0 = (
            init_decoder_carry(cfg, B, memory.shape[1], memory.shape[2]),
            jnp.zeros((B, M), mel_targets.dtype),
        )
        _, (frames, stops, aligns) = jax.lax.scan(
            body, carry0, (dec_inputs_t, rands, use_gts, pre_all), unroll=unroll
        )
    frames = jnp.swapaxes(frames, 0, 1).reshape(B, T_out, M)
    stops = jnp.swapaxes(stops, 0, 1).reshape(B, T_out)
    aligns = jnp.swapaxes(aligns, 0, 1)  # [B, T_dec, T_in]
    return frames, stops, aligns


# ---------------------------------------------------------------------------
# autoregressive decode (inference) — lax.while_loop with static buffers
# ---------------------------------------------------------------------------


def decode_autoregressive(
    params: Params,
    cfg: TacotronModelConfig,
    memory: jax.Array,
    mem_mask: jax.Array,
    rng: jax.Array,
    max_iters: int | None = None,
):
    """Dynamic-stop decode: stops when sigmoid(stop) > 0.5 (any frame of the
    batch-any policy, reference helpers.py:46-61) or at ``max_iters``
    (reference tacotron.py:96-103).  Static [max_iters] buffers keep shapes
    XLA-friendly; returns per-example stop lengths for host-side trimming."""
    B, T_in, V = memory.shape
    M, r = 80, cfg.outputs_per_step
    T = max_iters if max_iters is not None else cfg.max_iters
    keys = A.precompute_keys(params["attention"], cfg, memory)

    frames_buf = jnp.zeros((T, B, M * r))
    stops_buf = jnp.zeros((T, B, r))
    aligns_buf = jnp.zeros((T, B, T_in))
    carry0 = init_decoder_carry(cfg, B, T_in, V)
    prev0 = jnp.zeros((B, M))
    finished0 = jnp.zeros((B,), bool)
    stop_len0 = jnp.full((B,), T * r, jnp.int32)  # frames, not steps

    # Per-step randomness hoisted out of the while_loop (eval: only the
    # always-on prenet dropout draws), indexed by t inside the body — the
    # same fold_in(rng, t) derivation, so masks are bit-identical to
    # drawing in place.  [T, B, size] bools are tiny (T<=max_iters 2000).
    if is_per_example_keys(rng):
        # [B] per-example keys: row i's masks derive ONLY from rng[i]
        # (fold_in t, then the historical batch=1 step derivation), so a
        # request's decode is reproducible regardless of which rows it was
        # coalesced with (serving: distinct-seed traffic batches freely).
        def _row_rands(k):
            return jax.vmap(
                lambda t: step_rand_from_key(
                    params, cfg, jax.random.fold_in(k, t), 1, False
                )
            )(jnp.arange(T))

        rands_all = jax.tree_util.tree_map(
            lambda m: jnp.swapaxes(m[:, :, 0], 0, 1), jax.vmap(_row_rands)(rng)
        )
    else:
        rands_all = jax.vmap(
            lambda k: step_rand_from_key(params, cfg, k, B, False)
        )(jax.vmap(lambda t: jax.random.fold_in(rng, t))(jnp.arange(T)))

    def cond(loop):
        t, _, _, _, _, _, finished, _ = loop
        return (t < T) & ~jnp.all(finished)

    def body(loop):
        t, carry, prev, fb, sb, ab, finished, stop_len = loop
        rand = jax.tree_util.tree_map(lambda m: m[t], rands_all)
        frames, stop, align, carry = decoder_step(
            params, cfg, prev, carry, keys, memory, mem_mask, False, rand
        )
        fb = fb.at[t].set(frames)
        sb = sb.at[t].set(stop)
        ab = ab.at[t].set(align)
        # stop policy over the r frames of this step: ANY frame past 0.5
        # (reference stop_at_any default, helpers.py:58-61) or ALL frames
        finished_frames = jax.nn.sigmoid(stop) > 0.5
        if cfg.stop_at_any:
            ex_done = jnp.any(finished_frames, axis=-1)
        else:
            ex_done = jnp.all(finished_frames, axis=-1)
        newly = ex_done & ~finished
        # frame-exact trim length, EXCLUSIVE of the first flagged frame
        # (reference tacotron_synthesize.py:105: stop_token.index(1))
        first_in_group = jnp.argmax(finished_frames, axis=-1)
        stop_len = jnp.where(newly, t * r + first_in_group, stop_len)
        finished = finished | ex_done
        prev = frames[:, -M:]  # feed last predicted frame
        return (t + 1, carry, prev, fb, sb, ab, finished, stop_len)

    init = (jnp.int32(0), carry0, prev0, frames_buf, stops_buf, aligns_buf, finished0, stop_len0)
    t_end, _, _, fb, sb, ab, _, stop_len = jax.lax.while_loop(cond, body, init)

    frames = jnp.swapaxes(fb, 0, 1).reshape(B, T * r, M)
    stops = jnp.swapaxes(sb, 0, 1).reshape(B, T * r)
    aligns = jnp.swapaxes(ab, 0, 1)
    return frames, stops, aligns, stop_len


# ---------------------------------------------------------------------------
# postnet / CBHG / full forward
# ---------------------------------------------------------------------------


def apply_postnet(params: Params, cfg: TacotronModelConfig, frames: jax.Array, train: bool, rng):
    """5x tanh convs (last linear) + residual projection
    (reference modules.py:345-376, tacotron.py:115-122)."""
    acts = [jnp.tanh] * (cfg.postnet_layers - 1) + [None]
    x, new_p = L.conv_stack(params["postnet"], frames, rng, train, cfg.dropout_rate, activations=acts)
    residual = L.dense(params["postnet_projection"], x)
    return frames + residual, new_p


def apply_cbhg(params: Params, cfg: TacotronModelConfig, x: jax.Array, train: bool, rng):
    """CBHG: K-wide conv bank + maxpool + projections + highway + BiGRU."""
    p = params["cbhg"]
    outs = []
    new_bank = []
    for i, lp in enumerate(p["bank"]):
        y = jax.nn.relu(L.conv1d(lp["conv"], x))
        y, nb = L.batchnorm(lp["bn"], y, train)
        new_bank.append({"conv": lp["conv"], "bn": nb})
        outs.append(y)
    y = jnp.concatenate(outs, axis=-1)
    # maxpool width 2 stride 1, SAME
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, cfg.cbhg_pool_size, 1), (1, 1, 1), "SAME"
    )
    y = jax.nn.relu(L.conv1d(p["proj1"]["conv"], y))
    y, nbn1 = L.batchnorm(p["proj1"]["bn"], y, train)
    y = L.conv1d(p["proj2"]["conv"], y)
    y, nbn2 = L.batchnorm(p["proj2"]["bn"], y, train)
    y = y + x  # residual
    y = L.dense(p["highway_in"], y)
    for hp_ in p["highways"]:
        y = L.highway(hp_, y)
    fw = L.gru_scan(p["gru_fw"], y)
    # full-axis reverse (not per-length): the reference passes
    # input_lengths=None to the post-CBHG (tacotron.py:138), so its backward
    # GRU also runs across padding frames — kept for numerical parity
    bw = L.gru_scan(p["gru_bw"], y[:, ::-1])[:, ::-1]
    rnn_out = jnp.concatenate([fw, bw], axis=-1)
    linear = L.dense(params["linear_projection"], rnn_out)
    new_p = dict(p, bank=new_bank, proj1=dict(p["proj1"], bn=nbn1), proj2=dict(p["proj2"], bn=nbn2))
    return linear, new_p


def _clip_mel(x: jax.Array, cfg: TacotronModelConfig) -> jax.Array:
    """Output clipping (reference tacotron.py:111-112,119-122)."""
    if not cfg.clip_outputs:
        return x
    m = 4.0
    return jnp.clip(x, -m - cfg.lower_bound_decay, m)


def forward_teacher_forced(
    params: Params,
    cfg: TacotronModelConfig,
    inputs: jax.Array,
    input_lengths: jax.Array,
    mel_targets: jax.Array,
    train: bool,
    rng: jax.Array,
    teacher_forcing_ratio: jax.Array | float = 1.0,
    unroll: int = 1,
    fused_core: bool = False,
    fused_interpret: bool = False,
    fused_dtype=None,
    fused_wgrads: str = "accum",
):
    """Full teacher-forced forward; returns (TacotronOutput, new_params)."""
    k_enc, k_dec, k_post, k_cbhg = jax.random.split(rng, 4)
    memory, new_enc_convs = encode(params, cfg, inputs, input_lengths, train, k_enc)
    mem_mask = (jnp.arange(inputs.shape[1])[None, :] < input_lengths[:, None]).astype(jnp.float32)
    frames, stops, aligns = decode_teacher_forced(
        params, cfg, memory, mem_mask, mel_targets, train, k_dec,
        teacher_forcing_ratio=teacher_forcing_ratio, unroll=unroll,
        fused_core=fused_core, fused_interpret=fused_interpret,
        fused_dtype=fused_dtype, fused_wgrads=fused_wgrads,
    )
    frames = _clip_mel(frames, cfg)
    mel_out, new_postnet = apply_postnet(params, cfg, frames, train, k_post)
    mel_out = _clip_mel(mel_out, cfg)
    linear = None
    new_params = dict(params, enc_convs=new_enc_convs, postnet=new_postnet)
    if cfg.predict_linear:
        linear, new_cbhg = apply_cbhg(params, cfg, mel_out, train, k_cbhg)
        new_params["cbhg"] = new_cbhg
    return (
        TacotronOutput(frames, mel_out, stops, aligns, None, linear),
        new_params,
    )


def forward_inference(
    params: Params,
    cfg: TacotronModelConfig,
    inputs: jax.Array,
    input_lengths: jax.Array,
    rng: jax.Array,
    max_iters: int | None = None,
    use_pallas_decoder: bool = False,
):
    """Autoregressive inference.  ``use_pallas_decoder`` routes the decode
    loop through the fused VMEM-resident kernel
    (ops/tacotron_decoder_kernel.py: 1.7 us/step vs 20.6 us/step for the
    XLA while_loop on v5e, B=1) — only valid for configs the kernel
    supports.

    ``rng`` may be one key (shared-batch streams, the historical behavior)
    or a [B]-array of per-example keys (``is_per_example_keys``): then the
    decode dropout stream of row i depends only on ``rng[i]``, making each
    example reproducible under any batch coalescing.  Inference randomness
    is the always-on prenet dropout only (encoder/postnet run eval-mode)."""
    if is_per_example_keys(rng):
        ks = jax.vmap(lambda k: jax.random.split(k, 4))(rng)  # [B, 4, ...]
        k_enc, k_post, k_cbhg = ks[0][0], ks[0][2], ks[0][3]
        k_dec = ks[:, 1]  # [B] per-example decode keys
    else:
        k_enc, k_dec, k_post, k_cbhg = jax.random.split(rng, 4)
    memory, _ = encode(params, cfg, inputs, input_lengths, False, k_enc)
    mem_mask = (jnp.arange(inputs.shape[1])[None, :] < input_lengths[:, None]).astype(jnp.float32)
    if use_pallas_decoder:
        from ..ops.tacotron_decoder_kernel import decode_autoregressive_pallas

        frames, stops, aligns, stop_len = decode_autoregressive_pallas(
            params, cfg, memory, mem_mask, k_dec,
            max_iters if max_iters is not None else cfg.max_iters,
            dtype=(
                jnp.float32 if cfg.kernel_weights_dtype == "f32" else jnp.bfloat16
            ),
        )
    else:
        frames, stops, aligns, stop_len = decode_autoregressive(
            params, cfg, memory, mem_mask, k_dec, max_iters
        )
    frames = _clip_mel(frames, cfg)
    mel_out, _ = apply_postnet(params, cfg, frames, False, k_post)
    mel_out = _clip_mel(mel_out, cfg)
    linear = None
    if cfg.predict_linear:
        linear, _ = apply_cbhg(params, cfg, mel_out, False, k_cbhg)
    return TacotronOutput(frames, mel_out, stops, aligns, stop_len, linear)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def tacotron_loss(
    out: TacotronOutput,
    mel_targets: jax.Array,
    stop_targets: jax.Array,
    target_lengths: jax.Array,
    params: Params,
    cfg: TacotronModelConfig,
    reg_weight: float = 1e-6,
    mask_decoder: bool = False,
    stop_pos_weight: float = 1.0,
    linear_targets: jax.Array | None = None,
    sample_rate: int = 22050,
    loss_frames: jax.Array | None = None,
):
    """before/after MSE + stop CE + L2 (reference tacotron.py:195-253).

    With ``mask_decoder`` the masked variants of modules.py:403-485 apply.

    ``loss_frames`` [B] (optional): the batch-max frame count rounded to r —
    the length the reference pads to (feeder.py:49-57).  Frames beyond it
    exist only for compile-shape bucketing (data/loader.py) and are excluded
    here, so the unmasked loss matches the reference's exactly: in-batch pad
    frames up to ``loss_frames`` still contribute (reference semantics),
    bucket pads do not.
    """
    T = mel_targets.shape[1]
    mask = (jnp.arange(T)[None, :] < target_lengths[:, None]).astype(jnp.float32)

    if mask_decoder:
        m3 = mask[..., None]
        denom = jnp.sum(m3) * mel_targets.shape[-1]
        before = jnp.sum(((out.decoder_output - mel_targets) ** 2) * m3) / denom
        after = jnp.sum(((out.mel_outputs - mel_targets) ** 2) * m3) / denom
        ce = _weighted_sigmoid_ce(stop_targets, out.stop_logits, stop_pos_weight) * mask
        stop_loss = jnp.sum(ce) / jnp.maximum(jnp.sum((ce != 0).astype(jnp.float32)), 1.0)
    elif loss_frames is None:
        before = jnp.mean((out.decoder_output - mel_targets) ** 2)
        after = jnp.mean((out.mel_outputs - mel_targets) ** 2)
        stop_loss = jnp.mean(_weighted_sigmoid_ce(stop_targets, out.stop_logits, 1.0))
    else:
        fmask = (jnp.arange(T)[None, :] < loss_frames[:, None]).astype(jnp.float32)
        n = jnp.maximum(jnp.sum(fmask), 1.0)
        f3 = fmask[..., None]
        before = jnp.sum(((out.decoder_output - mel_targets) ** 2) * f3) / (n * mel_targets.shape[-1])
        after = jnp.sum(((out.mel_outputs - mel_targets) ** 2) * f3) / (n * mel_targets.shape[-1])
        stop_loss = jnp.sum(_weighted_sigmoid_ce(stop_targets, out.stop_logits, 1.0) * fmask) / n

    reg = reg_weight * l2_regularizables(params)
    loss = before + after + stop_loss + reg
    aux = {"before": before, "after": after, "stop": stop_loss, "reg": reg}

    if linear_targets is not None and out.linear_outputs is not None:
        l1 = jnp.abs(linear_targets - out.linear_outputs)
        n_priority = int(2000 / (sample_rate * 0.5) * linear_targets.shape[-1])
        if mask_decoder:
            # MaskedLinearLoss (modules.py:457-485): both terms divide by the
            # FULL mask sum, including the low-band term
            m3 = mask[..., None]
            denom = jnp.sum(m3) * linear_targets.shape[-1]
            linear_loss = 0.5 * jnp.sum(l1 * m3) / denom + 0.5 * jnp.sum(
                (l1 * m3)[:, :, :n_priority]
            ) / denom
        elif loss_frames is None:
            linear_loss = 0.5 * jnp.mean(l1) + 0.5 * jnp.mean(l1[:, :, :n_priority])
        else:
            fmask = (jnp.arange(T)[None, :] < loss_frames[:, None]).astype(jnp.float32)
            f3 = fmask[..., None]
            n = jnp.maximum(jnp.sum(fmask), 1.0)
            linear_loss = 0.5 * jnp.sum(l1 * f3) / (n * linear_targets.shape[-1]) + 0.5 * jnp.sum(
                (l1 * f3)[:, :, :n_priority]
            ) / (n * n_priority)
        loss = loss + linear_loss
        aux["linear"] = linear_loss

    aux["loss"] = loss
    return loss, aux


def _weighted_sigmoid_ce(targets, logits, pos_weight: float):
    """tf.nn.weighted_cross_entropy_with_logits."""
    log_w = 1.0 + (pos_weight - 1.0) * targets
    return (1.0 - targets) * logits + log_w * (
        jnp.log1p(jnp.exp(-jnp.abs(logits))) + jax.nn.relu(-logits)
    )


def l2_regularizables(params: Params) -> jax.Array:
    """Sum of 0.5*||w||^2 over regularizable weights.

    Excludes biases, LSTM/GRU kernels, embeddings, and projection layers
    (reference tacotron.py:246-248).
    """
    total = 0.0
    skip_top = {
        "embedding", "enc_lstm_fw", "enc_lstm_bw", "dec_lstm1", "dec_lstm2",
        "frame_projection", "stop_projection", "postnet_projection",
        "linear_projection",
    }

    def walk(tree, path):
        nonlocal total
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(v, path + (str(i),))
        else:
            if path[0] in skip_top:
                return
            name = path[-1]
            if "bn" in path:
                # batch-norm gamma/beta (our 'scale'/'bias') ARE regularized
                # by the reference — their TF names gamma/beta match none of
                # its exclusion substrings and they are trainable; only the
                # moving stats (not trainable) are excluded
                if name in ("mean", "var"):
                    return
            elif name in ("b", "bias", "v", "bi", "bh"):
                # biases are never regularized; 'v' is the attention
                # projection vector (treated as projection, reference comment)
                return
            elif any("gru" in comp for comp in path):  # recurrent kernels
                return
            total = total + 0.5 * jnp.sum(tree**2)

    walk(params, ())
    return total
