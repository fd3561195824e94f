"""Four pluggable attention mechanisms with one shared state protocol.

Pure functions over a single ``AttentionState`` superset (the union of the
reference's two decoder-state variants, Architecture_wrappers.py:46-65 and
Architecture_wrappers_gmm.py:46-65), so all variants run under the same
``lax.scan``/``while_loop`` decoder:

* ``forward`` — forward + location-sensitive hybrid (the ACTIVE variant,
  reference tacotron/models/attention.py:66-231), with the inference-time
  anti-repeat/dwell-limit machinery of forward_attention.py:171-215
  available as a vectorized compile-time option.
* ``lsa``     — vanilla location-sensitive attention with optional synthesis
  window/monotonic constraint (location_sensitive_attention.py:95-226).
* ``gmm``     — GMM (v0) attention (gmm_attention.py:9-67).
* ``graves``  — discretized Graves attention (graves_attention.py:10-110).

All masking uses additive -1e9 energies (softmax variants) or 1e-20 floors
(graves), matching the reference's sequence-mask behavior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TacotronModelConfig
from . import layers as L

NEG_INF = -1e9


class AttentionState(NamedTuple):
    """Superset carry for all attention variants.

    ``extra`` holds the variant-specific vector state: forward -> mu [B,1],
    gmm -> kappa [B,mixtures], graves -> mu [B,heads], lsa -> unused [B,1].
    """

    context: jax.Array  # [B, V] previous context (input feeding)
    alignments: jax.Array  # [B, T] previous (or cumulated, for lsa) alignments
    cumulated: jax.Array  # [B, T] cumulated softmax alignments
    alpha: jax.Array  # [B, T] forward-attention recursion state
    extra: jax.Array  # [B, K] variant-specific (mu / kappa)
    max_attention: jax.Array  # [B] int32 argmax of last alignments
    pos_rec: jax.Array  # [B] int32 dwell counter (anti-repeat)


def init_state(cfg: TacotronModelConfig, batch: int, mem_len: int, value_dim: int) -> AttentionState:
    one_hot0 = jnp.zeros((batch, mem_len)).at[:, 0].set(1.0)
    if cfg.attention_mode == "forward":
        extra = jnp.full((batch, 1), 0.5)  # init mu (reference attention.py:116)
        alpha = one_hot0
        cumulated = one_hot0
    elif cfg.attention_mode == "gmm":
        extra = jnp.zeros((batch, cfg.num_attn_mixtures))  # kappa
        alpha = jnp.zeros((batch, mem_len))
        cumulated = jnp.zeros((batch, mem_len))
    elif cfg.attention_mode == "graves":
        extra = jnp.zeros((batch, cfg.graves_heads))  # mu
        alpha = jnp.zeros((batch, mem_len))
        cumulated = jnp.zeros((batch, mem_len))
    else:  # lsa
        extra = jnp.zeros((batch, 1))
        alpha = jnp.zeros((batch, mem_len))
        cumulated = jnp.zeros((batch, mem_len))
    return AttentionState(
        context=jnp.zeros((batch, value_dim)),
        alignments=jnp.zeros((batch, mem_len)),
        cumulated=cumulated,
        alpha=alpha,
        extra=extra,
        max_attention=jnp.zeros((batch,), jnp.int32),
        pos_rec=jnp.zeros((batch,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------


def init_params(key, cfg: TacotronModelConfig, memory_dim: int, query_dim: int):
    ks = jax.random.split(key, 8)
    mode = cfg.attention_mode
    if mode in ("forward", "lsa"):
        p = {
            "memory_layer": L.dense_init(ks[0], memory_dim, cfg.attention_dim, use_bias=False),
            "query_layer": L.dense_init(ks[1], query_dim, cfg.attention_dim, use_bias=False),
            "location_conv": L.conv1d_init(ks[2], cfg.attention_kernel, 1, cfg.attention_filters),
            "location_layer": L.dense_init(ks[3], cfg.attention_filters, cfg.attention_dim, use_bias=False),
            "v": L.glorot(ks[4], (cfg.attention_dim,)),
            "b": jnp.zeros((cfg.attention_dim,)),
        }
        if mode == "forward":
            # transition-prob dense over concat(context, query)
            p["mu_layer"] = L.dense_init(ks[5], memory_dim + query_dim, 1)
        return p
    if mode == "gmm":
        return {
            "gmm_layer": L.dense_init(ks[0], query_dim + memory_dim, 3 * cfg.num_attn_mixtures)
        }
    if mode == "graves":
        h = cfg.decoder_lstm_units // 4
        p = {
            "layer1": L.dense_init(ks[0], query_dim, h),
            "layer2": L.dense_init(ks[1], h, 3 * cfg.graves_heads),
        }
        # bias init (0, 10, 1) per (g, b, k) block (reference graves_attention.py:36-38)
        p["layer2"]["b"] = jnp.asarray(
            np.hstack(
                [
                    np.zeros(cfg.graves_heads),
                    np.full(cfg.graves_heads, 10.0),
                    np.ones(cfg.graves_heads),
                ]
            ),
            dtype=jnp.float32,
        )
        return p
    raise ValueError(f"unknown attention mode {mode}")


def precompute_keys(params, cfg: TacotronModelConfig, memory: jax.Array) -> jax.Array:
    """Project memory once per utterance (BahdanauAttention memory_layer)."""
    if cfg.attention_mode in ("forward", "lsa"):
        return L.dense(params["memory_layer"], memory)
    return memory  # gmm/graves don't use projected keys


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def _location_energy(params, query, conv_input, keys):
    """v . tanh(W_keys + W_query + W_fil conv(align) + b) (attention.py:9-41).

    The location conv (1->F) and location dense (F->A, no bias) are
    precombined into ONE conv (1->A): both are linear, so
    dense(conv(x) + b_c) == conv_combined(x) + b_c @ W_dense.  The combined
    kernel/bias depend only on weights — loop-invariant, hoisted out of the
    decode loop by XLA — which removes a [B,T,F]@[F,A] matmul from every
    decoder step."""
    pq = L.dense(params["query_layer"], query)[:, None, :]  # [B,1,A]
    w_loc = params["location_layer"]["w"]  # [F, A]
    # precision='highest': the TPU default runs matmuls as bf16 passes,
    # which would bake ~1e-3 relative error INTO the combined weights; this
    # is a tiny one-time weight-weight contraction, so full f32 is free
    w_comb = jnp.einsum(
        "kif,fa->kia", params["location_conv"]["w"], w_loc, precision="highest"
    )
    b_comb = jnp.matmul(params["location_conv"]["b"], w_loc, precision="highest")
    loc = L.conv1d({"w": w_comb}, conv_input[..., None]) + b_comb  # [B,T,A]
    return jnp.sum(params["v"] * jnp.tanh(keys + pq + loc + params["b"]), axis=-1)


def _masked_softmax(energy, mask, smoothing: bool = False):
    if smoothing:
        sig = jax.nn.sigmoid(energy) * mask
        return sig / jnp.sum(sig, axis=-1, keepdims=True)
    energy = jnp.where(mask > 0, energy, NEG_INF)
    return jax.nn.softmax(energy, axis=-1)


# ---------------------------------------------------------------------------
# step functions; all return (context, alignments, new_state)
# ---------------------------------------------------------------------------


GMM_DROPOUT = 0.2  # reference gmm_attention.py:28


def gmm_dropout_mask(key, batch: int, q_dim: int, v_dim: int) -> jax.Array:
    """The keep-mask _gmm_step would draw from ``key`` at train time
    (hot-loop precompute; see layers.apply_dropout_mask)."""
    return jax.random.bernoulli(key, 1.0 - GMM_DROPOUT, (batch, q_dim + v_dim))


def step(
    params,
    cfg: TacotronModelConfig,
    query: jax.Array,  # [B, Q] decoder LSTM output
    state: AttentionState,
    keys: jax.Array,  # [B, T, A] projected memory (or raw memory)
    values: jax.Array,  # [B, T, V] raw memory
    mask: jax.Array,  # [B, T] 1/0 valid mask
    train: bool,
    rng: jax.Array | None = None,
    drop_mask: jax.Array | None = None,
):
    mode = cfg.attention_mode
    if mode == "forward":
        return _forward_step(params, cfg, query, state, keys, values, mask, train)
    if mode == "lsa":
        return _lsa_step(params, cfg, query, state, keys, values, mask, train)
    if mode == "gmm":
        return _gmm_step(params, cfg, query, state, values, mask, train, rng, drop_mask)
    if mode == "graves":
        return _graves_step(params, cfg, query, state, values, mask)
    raise ValueError(mode)


def anti_repeat_constrain(align, max_att, prev_max, prev_pos_rec, cfg):
    """Vectorized port of the long-sentence anti-repeat/dwell-limit logic
    (reference forward_attention.py:176-215, the variant whose block is
    ENABLED at inference): forces monotonic argmax, caps dwell time at a
    position, windows alignments to [max-2, max+3), and re-weights the
    argmax bin.  Returns (align pre-renormalize, max_att, pos_rec).

    Golden-tested step-for-step against a scalar per-example oracle of the
    reference logic in tests/test_constraint_oracles.py.

    NOTE: the near-identical block in attention.py (dead behind `and
    False`) differs slightly: boost 1e-1 + att_sum * 2.0, dwell thres 9;
    this implements the live forward_attention.py variant (boost
    att_sum * 2.0, thres 10 — cfg.dwell_limit_rest).
    """
    T = align.shape[-1]
    pos = jnp.arange(T)[None, :]
    max_att = jnp.where(max_att <= prev_max, prev_max, prev_max + 1)
    # early positions may not run ahead before dwell warm-up
    short_mask = (prev_pos_rec < cfg.dwell_limit_first) & (max_att > 2)
    max_att = jnp.where(short_mask, prev_max, max_att)
    stayed = max_att == prev_max
    pos_rec = jnp.where(stayed, prev_pos_rec + 1, 1)
    over = pos_rec >= cfg.dwell_limit_rest
    max_att = jnp.where(over, max_att + 1, max_att)
    pos_rec = jnp.where(over, 1, pos_rec)
    # window alignments to [max-2, max+3)
    window = (pos >= (max_att - 2)[:, None]) & (pos < (max_att + 3)[:, None])
    align = jnp.where(window, align, 0.0)
    # boost the argmax bin (clipped to the last input position, and with
    # the reference's near-zero-sum guard so the renormalize can never
    # divide 0/0 once max_att runs past T-1 — forward_attention.py:205-216)
    att_sum = jnp.sum(align, axis=-1, keepdims=True)
    att_sum = jnp.where(att_sum < 1e-10, 1.0, att_sum)
    at_max = pos == jnp.clip(max_att, 0, T - 1)[:, None]
    align = jnp.where(at_max, att_sum * 2.0, align)
    return align, max_att, pos_rec


def lsa_window_valid(prev_max, T: int, cfg):
    """Synthesis-window validity mask for LSA attention (reference
    location_sensitive_attention.py:201-214): 'monotonic' keeps
    [prev, prev+w); 'window' keeps [prev - ceil(w/2), prev + w//2).
    Returns bool [B, T].  Golden-tested against a tf.sequence_mask oracle
    in tests/test_constraint_oracles.py."""
    pos = jnp.arange(T)[None, :]
    prev = prev_max[:, None]
    w = cfg.synthesis_window
    if cfg.anti_repeat:  # 'monotonic' type: only look forward w steps
        return (pos >= prev) & (pos < prev + w)
    # 'window' type: +/- w neighborhood (exclusive upper bound)
    back = w // 2 + (w % 2)
    return (pos >= prev - back) & (pos < prev + w // 2)


def _forward_step(params, cfg, query, state, keys, values, mask, train):
    """Forward + location-sensitive hybrid (reference attention.py:119-231)."""
    energy = _location_energy(params, query, state.cumulated, keys)
    align_sm = _masked_softmax(energy, mask, cfg.smoothing)
    cumulated = state.cumulated + align_sm

    alpha = state.alpha
    mu = state.extra  # [B,1]
    shift_alpha = jnp.pad(alpha, ((0, 0), (1, 0)))[:, :-1]
    align = ((1.0 - mu) * alpha + mu * shift_alpha + 1e-10) * align_sm

    max_att = jnp.argmax(align, axis=-1).astype(jnp.int32)
    pos_rec = state.pos_rec

    if cfg.anti_repeat and not train:
        align, max_att, pos_rec = anti_repeat_constrain(
            align, max_att, state.max_attention, state.pos_rec, cfg
        )

    align = align / jnp.sum(align, axis=-1, keepdims=True)
    context = jnp.einsum("bt,btv->bv", align, values)
    new_mu = jax.nn.sigmoid(
        L.dense(params["mu_layer"], jnp.concatenate([context, query], axis=-1))
    )
    new_state = AttentionState(
        context=context,
        alignments=align,
        cumulated=cumulated,
        alpha=align,
        extra=new_mu,
        max_attention=max_att,
        pos_rec=pos_rec,
    )
    return context, align, new_state


def _lsa_step(params, cfg, query, state, keys, values, mask, train):
    """Vanilla location-sensitive attention
    (reference location_sensitive_attention.py:169-226)."""
    energy = _location_energy(params, query, state.alignments, keys)
    if cfg.synthesis_constraint and not train:
        valid = lsa_window_valid(state.max_attention, energy.shape[-1], cfg)
        energy = jnp.where(valid, energy, NEG_INF)
    align = _masked_softmax(energy, mask, cfg.smoothing)
    max_att = jnp.argmax(align, axis=-1).astype(jnp.int32)
    next_align = align + state.alignments if cfg.cumulative_weights else align
    context = jnp.einsum("bt,btv->bv", align, values)
    new_state = state._replace(
        context=context,
        alignments=next_align,
        cumulated=state.cumulated + align,
        max_attention=max_att,
    )
    return context, align, new_state


def _gmm_step(params, cfg, query, state, values, mask, train, rng, drop_mask=None):
    """GMM (v0) attention (reference gmm_attention.py:25-67)."""
    inputs = jnp.concatenate([query, state.context], axis=-1)
    if train and drop_mask is not None:
        inputs = L.apply_dropout_mask(drop_mask, inputs, GMM_DROPOUT)
    elif train and rng is not None:
        inputs = L.dropout(rng, inputs, GMM_DROPOUT, enabled=True)
    p = jnp.exp(L.dense(params["gmm_layer"], inputs))  # [B, 3K]
    K = cfg.num_attn_mixtures
    alpha_m, beta, kappa_d = p[:, :K], p[:, K : 2 * K], p[:, 2 * K :]
    kappa = state.extra + kappa_d  # cumulative center positions
    u = jnp.arange(values.shape[1], dtype=jnp.float32)[None, None, :]
    score = jnp.sum(
        (alpha_m / beta)[..., None] * jnp.exp(-((kappa[..., None] - u) ** 2) / beta[..., None]),
        axis=1,
    )
    align = _masked_softmax(score, mask)
    max_att = jnp.argmax(align, axis=-1).astype(jnp.int32)
    context = jnp.einsum("bt,btv->bv", align, values)
    new_state = state._replace(
        context=context,
        alignments=align,
        cumulated=state.cumulated + align,
        extra=kappa,
        max_attention=max_att,
    )
    return context, align, new_state


def _graves_step(params, cfg, query, state, values, mask):
    """Discretized Graves attention (reference graves_attention.py:63-110)."""
    h = jax.nn.relu(L.dense(params["layer1"], query))
    gbk = L.dense(params["layer2"], h)  # [B, 3H]
    H = cfg.graves_heads
    g_t, b_t, k_t = gbk[:, :H], gbk[:, H : 2 * H], gbk[:, 2 * H :]
    mu_t = state.extra + jax.nn.softplus(k_t)
    sig_t = jax.nn.softplus(b_t) + 1e-5
    g_t = jax.nn.softmax(g_t, axis=1) + 1e-5
    T = values.shape[1]
    pos = (jnp.arange(T + 1, dtype=jnp.float32) + 0.5)[None, None, :]
    x = (mu_t[..., None] - pos) / sig_t[..., None]
    phi = g_t[..., None] * (1.0 / (1.0 + jax.nn.sigmoid(x)))
    alpha_t = jnp.sum(phi, axis=1)  # [B, T+1]
    align = alpha_t[:, 1:] - alpha_t[:, :-1]
    align = jnp.where(mask > 0, align, 1e-20)
    max_att = jnp.argmax(align, axis=-1).astype(jnp.int32)
    context = jnp.einsum("bt,btv->bv", align, values)
    new_state = state._replace(
        context=context,
        alignments=align,
        cumulated=state.cumulated + align,
        extra=mu_t,
        max_attention=max_att,
    )
    return context, align, new_state
