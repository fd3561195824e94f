"""Original (DeepMind-style) WaveRNN: coarse/fine dual-softmax, 16-bit.

Counterpart of the reference's standalone alternative vocoder
(wavernn/models/deepmind_version.py:8-176): one GRU-like recurrence whose
R matmul is computed once and split across the (r, u, e) gates, with the
16-bit sample split into coarse (high 8 bits) and fine (low 8 bits) halves
predicted by two interleaved softmaxes — fine conditions on the
just-sampled coarse value within the same step.

TPU-first structure: training forward computes the full-rank recurrent
matmul under ``lax.scan`` (hidden state is the only carry); generation is a
scan whose step does the half-matmul trick of the reference (R split into
coarse/fine halves, deepmind_version.py:60-83).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from . import layers as L

Params = Dict[str, Any]


def init_deepmind_wavernn(key, hidden: int = 896) -> Params:
    ks = jax.random.split(key, 6)
    half = hidden // 2
    return {
        # R: [hidden, 3*hidden] recurrent kernel (gates r, u, e)
        "R": L.glorot(ks[0], (hidden, 3 * hidden)),
        # input projections: coarse half sees [c_{t-1}, f_{t-1}], fine half
        # additionally sees the current coarse sample c_t
        "I_coarse": L.dense_init(ks[1], 2, 3 * half, use_bias=False),
        "I_fine": L.dense_init(ks[2], 3, 3 * half, use_bias=False),
        "bias_u": jnp.zeros((hidden,)),
        "bias_r": jnp.zeros((hidden,)),
        "bias_e": jnp.zeros((hidden,)),
        "O1": L.dense_init(ks[3], half, half),
        "O2": L.dense_init(ks[4], half, 256),
        "O3": L.dense_init(ks[5], half, half),
        "O4": L.dense_init(jax.random.fold_in(ks[5], 1), half, 256),
    }


def _gates(params: Params, Rh: jax.Array, Ic: jax.Array, If: jax.Array, h: jax.Array):
    """Combine recurrent + input projections into the new hidden state
    (reference deepmind_version.py:85-112)."""
    hidden = params["R"].shape[0]
    R_r, R_u, R_e = jnp.split(Rh, 3, axis=-1)  # each [B, hidden]

    def halves(I):  # input projection -> per-gate halves [B, half]
        return jnp.split(I, 3, axis=-1)

    Ic_r, Ic_u, Ic_e = halves(Ic)
    If_r, If_u, If_e = halves(If)
    I_r = jnp.concatenate([Ic_r, If_r], axis=-1)
    I_u = jnp.concatenate([Ic_u, If_u], axis=-1)
    I_e = jnp.concatenate([Ic_e, If_e], axis=-1)

    r = jax.nn.sigmoid(R_r + I_r + params["bias_r"])
    u = jax.nn.sigmoid(R_u + I_u + params["bias_u"])
    e = jnp.tanh(r * R_e + I_e + params["bias_e"])
    return u * h + (1.0 - u) * e


def forward(params: Params, prev_coarse, prev_fine, cur_coarse, h):
    """One teacher-forced step -> (coarse_logits, fine_logits, new_h).

    prev_coarse/prev_fine/cur_coarse: [B] floats scaled to [0, 1).
    """
    hidden = params["R"].shape[0]
    half = hidden // 2
    Rh = h @ params["R"]
    coarse_in = jnp.stack([prev_coarse, prev_fine], axis=-1)  # [B, 2]
    fine_in = jnp.stack([prev_coarse, prev_fine, cur_coarse], axis=-1)  # [B, 3]
    Ic = coarse_in @ params["I_coarse"]["w"]
    If = fine_in @ params["I_fine"]["w"]
    h_new = _gates(params, Rh, Ic, If, h)

    h_c, h_f = h_new[:, :half], h_new[:, half:]
    out_c = L.dense(params["O2"], jax.nn.relu(L.dense(params["O1"], h_c)))
    out_f = L.dense(params["O4"], jax.nn.relu(L.dense(params["O3"], h_f)))
    return out_c, out_f, h_new


def train_forward(params: Params, coarse: jax.Array, fine: jax.Array):
    """Teacher-forced sequence forward.

    coarse/fine: [B, T+1] scaled sample streams (previous + current).
    Returns (coarse_logits [B, T, 256], fine_logits [B, T, 256]).
    """
    B, Tp1 = coarse.shape
    h0 = jnp.zeros((B, params["R"].shape[0]))

    def step(h, inp):
        pc, pf, cc = inp
        oc, of, h = forward(params, pc, pf, cc, h)
        return h, (oc, of)

    xs = (
        jnp.swapaxes(coarse[:, :-1], 0, 1),
        jnp.swapaxes(fine[:, :-1], 0, 1),
        jnp.swapaxes(coarse[:, 1:], 0, 1),
    )
    _, (oc, of) = jax.lax.scan(step, h0, xs)
    return jnp.swapaxes(oc, 0, 1), jnp.swapaxes(of, 0, 1)


def loss(params: Params, coarse: jax.Array, fine: jax.Array):
    """Dual cross-entropy (reference deepmind_version.py train loop usage)."""
    oc, of = train_forward(params, coarse / 255.0, fine / 255.0)
    tc = coarse[:, 1:].astype(jnp.int32)
    tf_ = fine[:, 1:].astype(jnp.int32)
    ce = lambda lg, t: -jnp.mean(
        jnp.take_along_axis(jax.nn.log_softmax(lg), t[..., None], axis=-1)
    )
    return ce(oc, tc) + ce(of, tf_)


def generate(params: Params, n_samples: int, rng: jax.Array, batch: int = 1):
    """AR generation -> [B, n_samples] float wav in [-1, 1]
    (reference deepmind_version.py:44-83: interleaved coarse -> fine)."""
    hidden = params["R"].shape[0]
    half = hidden // 2

    # split R columns per gate into coarse/fine halves (deepmind_version.py:60-66)
    R_r, R_u, R_e = jnp.split(params["R"], 3, axis=-1)
    split = lambda M: (M[:, :half], M[:, half:])
    Rr_c, Rr_f = split(R_r)
    Ru_c, Ru_f = split(R_u)
    Re_c, Re_f = split(R_e)
    br_c, br_f = params["bias_r"][:half], params["bias_r"][half:]
    bu_c, bu_f = params["bias_u"][:half], params["bias_u"][half:]
    be_c, be_f = params["bias_e"][:half], params["bias_e"][half:]

    keys = jax.random.split(rng, n_samples)

    def step(carry, key):
        h, c_prev, f_prev = carry
        kc, kf = jax.random.split(key)

        # coarse half-step
        Rh_r, Rh_u, Rh_e = h @ Rr_c, h @ Ru_c, h @ Re_c
        Ic = jnp.stack([c_prev, f_prev], axis=-1) @ params["I_coarse"]["w"]
        Ic_r, Ic_u, Ic_e = jnp.split(Ic, 3, axis=-1)
        r_c = jax.nn.sigmoid(Rh_r + Ic_r + br_c)
        u_c = jax.nn.sigmoid(Rh_u + Ic_u + bu_c)
        e_c = jnp.tanh(r_c * Rh_e + Ic_e + be_c)
        h_c = u_c * h[:, :half] + (1.0 - u_c) * e_c
        out_c = L.dense(params["O2"], jax.nn.relu(L.dense(params["O1"], h_c)))
        c_new = jax.random.categorical(kc, out_c, axis=-1).astype(jnp.float32) / 255.0

        # fine half-step (conditions on the fresh coarse sample)
        Fh_r, Fh_u, Fh_e = h @ Rr_f, h @ Ru_f, h @ Re_f
        If = jnp.stack([c_prev, f_prev, c_new], axis=-1) @ params["I_fine"]["w"]
        If_r, If_u, If_e = jnp.split(If, 3, axis=-1)
        r_f = jax.nn.sigmoid(Fh_r + If_r + br_f)
        u_f = jax.nn.sigmoid(Fh_u + If_u + bu_f)
        e_f = jnp.tanh(r_f * Fh_e + If_e + be_f)
        h_f = u_f * h[:, half:] + (1.0 - u_f) * e_f
        out_f = L.dense(params["O4"], jax.nn.relu(L.dense(params["O3"], h_f)))
        f_new = jax.random.categorical(kf, out_f, axis=-1).astype(jnp.float32) / 255.0

        h_new = jnp.concatenate([h_c, h_f], axis=-1)
        sample = (c_new * 255.0 * 256.0 + f_new * 255.0) / 32767.5 - 1.0
        return (h_new, c_new, f_new), sample

    init = (
        jnp.zeros((batch, hidden)),
        jnp.zeros((batch,)),
        jnp.zeros((batch,)),
    )
    _, samples = jax.lax.scan(step, init, keys)
    return jnp.swapaxes(samples, 0, 1)


def split_signal_16bit(x: jax.Array):
    """float [-1,1] -> (coarse, fine) 8-bit streams (reference dsp.py:97-106)."""
    unsigned = (x + 1.0) * 32767.5
    coarse = jnp.floor(unsigned / 256.0)
    fine = unsigned - coarse * 256.0
    return coarse, fine


def combine_signal(coarse: jax.Array, fine: jax.Array) -> jax.Array:
    return (coarse * 256.0 + fine) / 32767.5 - 1.0
