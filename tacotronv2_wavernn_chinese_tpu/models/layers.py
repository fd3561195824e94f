"""Functional neural-net building blocks (pure JAX, explicit params/rng).

Every layer is an ``init(key, ...) -> params`` / ``apply(params, x, ...)``
pair over plain-dict pytrees: full control for ``lax.scan`` decoders, pjit
sharding, and checkpoint mapping, with no framework magic.

Semantics pinned to the reference where training parity matters:
* LSTM cell uses TF gate order (i, j, f, o) with forget-gate bias 1.0
  (tf.nn.rnn_cell.LSTMCell, used at reference modules.py:100).
* Zoneout in training drops state *deltas* with a binary mask
  (``c = mask*(new-prev) + prev``), in eval it EMA-mixes
  (reference modules.py:131-138).
* Prenet dropout is always on — a seeded, explicit sampling knob here
  instead of the reference's hidden ``training=True`` (modules.py:249).
* BatchNorm is applied after the activation (``batch_norm_position='after'``,
  reference modules.py:379-391) with momentum 0.99.
* GRU cell uses torch gate order (r, z, n) with the reset gate applied to
  the projected hidden state (torch.nn.GRU, reference fatchord_version.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def glorot(key, shape, dtype=jnp.float32):
    """Xavier/Glorot uniform (TF dense/conv default initializer)."""
    fan_in, fan_out = _fans(shape)
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _fans(shape):
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:
        return shape[0], shape[1]
    # conv kernels [width, in, out]
    rf = int(np.prod(shape[:-2]))
    return shape[-2] * rf, shape[-1] * rf


def uniform_embedding(key, shape, dtype=jnp.float32, scale=0.5):
    return jax.random.uniform(key, shape, dtype, -scale, scale)


# ---------------------------------------------------------------------------
# dense / conv / norm / dropout
# ---------------------------------------------------------------------------


def dense_init(key, in_dim: int, out_dim: int, use_bias: bool = True) -> Params:
    p = {"w": glorot(key, (in_dim, out_dim))}
    if use_bias:
        p["b"] = jnp.zeros((out_dim,))
    return p


def dense(p: Params, x: jax.Array) -> jax.Array:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def conv1d_init(key, width: int, in_ch: int, out_ch: int, use_bias: bool = True) -> Params:
    p = {"w": glorot(key, (width, in_ch, out_ch))}
    if use_bias:
        p["b"] = jnp.zeros((out_ch,))
    return p


def promote_conv_operands(x: jax.Array, w: jax.Array):
    """lax.conv requires matching dtypes (no promotion): under the
    mixed-precision policy (utils/precision.py) weights arrive bf16 —
    promote both sides (conv kernels are tiny, so f32 compute here costs
    nothing; the MXU runs f32 convs as bf16 passes anyway)."""
    if w.dtype != x.dtype:
        dt = jnp.promote_types(w.dtype, x.dtype)
        return x.astype(dt), w.astype(dt)
    return x, w


def conv1d(p: Params, x: jax.Array, dilation: int = 1) -> jax.Array:
    """SAME-padded 1-D convolution over [B, T, C]."""
    x, w = promote_conv_operands(x, p["w"])
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding="SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "b" in p:
        y = y + p["b"]
    return y


def batchnorm_init(dim: int) -> Params:
    return {
        "scale": jnp.ones((dim,)),
        "bias": jnp.zeros((dim,)),
        "mean": jnp.zeros((dim,)),
        "var": jnp.ones((dim,)),
    }


def batchnorm(
    p: Params, x: jax.Array, train: bool, momentum: float = 0.99, eps: float = 1e-3,
    unbiased_ema: bool = False,
):
    """Returns (y, updated_params).  In eval mode params pass through.

    ``eps=1e-3`` matches tf.layers.batch_normalization defaults.
    Reduction is over all axes but the last.

    ``unbiased_ema``: torch nn.BatchNorm1d normalizes with the BIASED batch
    variance but tracks running_var with the UNBIASED one (Bessel n/(n-1));
    the vocoder path sets this to match torch training-time running stats.
    TF keeps the biased variance in both places (the tacotron-side default).
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        track_var = var
        if unbiased_ema:
            n = 1
            for a in axes:
                n *= x.shape[a]
            if n > 1:
                track_var = var * (n / (n - 1))
        new_p = dict(
            p,
            mean=momentum * p["mean"] + (1 - momentum) * mean,
            var=momentum * p["var"] + (1 - momentum) * track_var,
        )
    else:
        mean, var = p["mean"], p["var"]
        new_p = p
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y, new_p


def dropout(key, x: jax.Array, rate: float, enabled: bool = True) -> jax.Array:
    if not enabled or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def apply_dropout_mask(mask: jax.Array, x: jax.Array, rate: float) -> jax.Array:
    """Dropout from a precomputed keep-mask (``bernoulli(key, 1-rate, shape)``).

    Hot-loop form: per-step threefry inside a ``lax.scan`` costs more than the
    step's matmuls (measured ~28 of 35 us/step on v5e), so callers vmap the
    SAME key derivation over all steps outside the loop and pass masks in —
    bit-identical to the keyed path by construction.
    """
    return jnp.where(mask, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# LSTM (TF convention) + zoneout
# ---------------------------------------------------------------------------


def lstm_init(key, in_dim: int, units: int) -> Params:
    return {
        "w": glorot(key, (in_dim + units, 4 * units)),
        "b": jnp.zeros((4 * units,)),
    }


def lstm_step(p: Params, x: jax.Array, c: jax.Array, h: jax.Array):
    """One LSTM step; gate order (i, j, f, o), forget bias 1.0 (TF LSTMCell)."""
    z = jnp.concatenate([x, h], axis=-1) @ p["w"] + p["b"]
    return _lstm_gates(z, c)


def lstm_step_from_gates(p: Params, zx: jax.Array, c: jax.Array, h: jax.Array):
    """LSTM step with the input projection precomputed (``zx = x @ w[:D]``).

    Hot-loop form: when the whole input sequence is known up front, the
    x-side of the gate matmul runs as ONE batched matmul before the scan and
    only ``h @ w[D:]`` stays sequential.  Splitting the concat-dot changes
    f32 summation association, so results are within-rounding (not
    bit-exact) vs lstm_step."""
    units = h.shape[-1]
    z = zx + h @ p["w"][p["w"].shape[0] - units :] + p["b"]
    return _lstm_gates(z, c)


def _lstm_gates(z: jax.Array, c: jax.Array):
    i, j, f, o = jnp.split(z, 4, axis=-1)
    new_c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_c, new_h


def zoneout(key, new: jax.Array, prev: jax.Array, rate: float, train: bool, mask=None):
    """Zoneout (reference modules.py:131-138).

    Train: binary per-unit mask keeps the delta with prob (1-rate)
    (the tf dropout 1/keep scaling cancels the (1-rate) prefactor).
    Eval: deterministic EMA mix.  ``mask`` (precomputed
    ``bernoulli(key, 1-rate, shape)``) replaces the in-place draw in hot
    loops — see apply_dropout_mask.
    """
    if rate == 0.0:
        return new
    if train:
        if mask is None:
            if key is None:
                raise ValueError(
                    "zoneout in train mode needs a key or a precomputed mask "
                    "(did a caller build StepRand with train=False but run "
                    "the step with train=True?)"
                )
            mask = jax.random.bernoulli(key, 1.0 - rate, new.shape)
        return jnp.where(mask, new - prev, 0.0) + prev
    return (1.0 - rate) * new + rate * prev


def zoneout_masks(key, rate: float, shape) -> tuple[jax.Array, jax.Array]:
    """The (cell, hidden) keep-masks zoneout_lstm_step would draw from
    ``key`` — split order matches exactly."""
    kc, kh = jax.random.split(key)
    return (
        jax.random.bernoulli(kc, 1.0 - rate, shape),
        jax.random.bernoulli(kh, 1.0 - rate, shape),
    )


def zoneout_lstm_step(p, x, c, h, key, rate: float, train: bool, masks=None, zx=None):
    """Returns ``(c_carry, h_carry, out)``.

    Matches the reference ZoneoutLSTMCell exactly (modules.py:114-142 +
    tf LSTMCell): zoneout mixes only the RECURRENT state — the cell's
    per-step ``output`` handed downstream (next stacked cell, attention
    query, dynamic_rnn outputs) is the raw pre-zoneout ``new_h``.
    """
    if zx is not None:
        new_c, new_h = lstm_step_from_gates(p, zx, c, h)
    else:
        new_c, new_h = lstm_step(p, x, c, h)
    if masks is None:
        if key is None or rate == 0.0 or not train:
            mc = mh = None
        else:
            mc, mh = zoneout_masks(key, rate, new_c.shape)
    else:
        mc, mh = masks
    return (
        zoneout(None, new_c, c, rate, train, mask=mc),
        zoneout(None, new_h, h, rate, train, mask=mh),
        new_h,
    )


def unidir_lstm(
    p: Params,
    xs: jax.Array,
    key,
    units: int,
    zoneout_rate: float = 0.0,
    train: bool = False,
    reverse: bool = False,
    lengths: jax.Array | None = None,
):
    """Run an LSTM over [B, T, D] -> [B, T, units] with a ``lax.scan``.

    With ``reverse=True`` and ``lengths``, emulates
    tf.nn.bidirectional_dynamic_rnn's backward pass: each sequence is
    reversed within its own valid length.
    """
    B, T, _ = xs.shape
    if reverse:
        xs = _reverse_sequence(xs, lengths)

    # Hoist the per-step zoneout draws out of the scan: one vmapped threefry
    # over all T steps (bit-identical masks — zoneout_masks reproduces the
    # in-step key derivation) instead of 2 draws + a split per iteration.
    use_masks = train and zoneout_rate > 0.0
    # Hoist the x-side of the gate matmul out of the scan: the whole input
    # sequence is known, so [B*T, D] @ w[:D] runs once on the MXU and only
    # the recurrent h @ w[D:] stays sequential (lstm_step_from_gates).
    zx_all = jnp.swapaxes(xs, 0, 1) @ p["w"][: xs.shape[-1]]  # [T, B, 4H]
    if use_masks:
        keys = jax.random.split(key, T)
        masks = jax.vmap(lambda k: zoneout_masks(k, zoneout_rate, (B, units)))(keys)
        xs_scan = (zx_all,) + masks
    else:
        xs_scan = (zx_all,)

    def step(carry, inp):
        c, h = carry
        zx, *m = inp
        c2, h2, out = zoneout_lstm_step(
            p, None, c, h, None, zoneout_rate, train,
            masks=tuple(m) if use_masks else None, zx=zx,
        )
        # dynamic_rnn collects the cell's raw output; zoneout only mixes
        # the carried state (reference modules.py:114-142)
        return (c2, h2), out

    init = (jnp.zeros((B, units)), jnp.zeros((B, units)))
    _, hs = jax.lax.scan(step, init, xs_scan)
    hs = jnp.swapaxes(hs, 0, 1)  # [B, T, units]
    if reverse:
        hs = _reverse_sequence(hs, lengths)
    return hs


def _reverse_sequence(xs: jax.Array, lengths: jax.Array | None) -> jax.Array:
    if lengths is None:
        return xs[:, ::-1]
    T = xs.shape[1]
    idx = lengths[:, None] - 1 - jnp.arange(T)[None, :]
    idx = jnp.where(idx >= 0, idx, jnp.arange(T)[None, :])
    return jnp.take_along_axis(xs, idx[..., None], axis=1)


# ---------------------------------------------------------------------------
# GRU (torch convention)
# ---------------------------------------------------------------------------


def gru_init(key, in_dim: int, units: int) -> Params:
    k1, k2 = jax.random.split(key)
    scale = 1.0 / np.sqrt(units)

    def u(k, shape):
        return jax.random.uniform(k, shape, jnp.float32, -scale, scale)

    ks = jax.random.split(k1, 2)
    return {
        "wi": u(ks[0], (in_dim, 3 * units)),  # gates (r, z, n)
        "wh": u(ks[1], (units, 3 * units)),
        "bi": u(jax.random.split(k2, 2)[0], (3 * units,)),
        "bh": u(jax.random.split(k2, 2)[1], (3 * units,)),
    }


def gru_step_from_gates(p: Params, gi: jax.Array, h: jax.Array) -> jax.Array:
    """GRU step from a precomputed input projection ``gi = x @ wi + bi``."""
    gh = h @ p["wh"] + p["bh"]
    ir, iz, inn = jnp.split(gi, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(inn + r * hn)
    return (1.0 - z) * n + z * h


def gru_step(p: Params, x: jax.Array, h: jax.Array) -> jax.Array:
    """torch.nn.GRUCell semantics: n = tanh(Wx + bi + r*(Wh h + bh))."""
    return gru_step_from_gates(p, x @ p["wi"] + p["bi"], h)


def gru_scan(p: Params, xs: jax.Array, h0: jax.Array | None = None) -> jax.Array:
    """GRU over [B, T, D] -> [B, T, H].

    The whole input-side projection runs as ONE batched [B*T] matmul before
    the scan (teacher-forced inputs are fully known), halving the in-loop
    matmul work; batched dense contracts row-wise exactly like the per-step
    one, so outputs are bit-identical.  Only the recurrent ``h @ wh``
    remains sequential."""
    B, T, _ = xs.shape
    H = p["wh"].shape[0]
    h0 = jnp.zeros((B, H)) if h0 is None else h0
    gi_all = xs @ p["wi"] + p["bi"]  # [B, T, 3H]

    def step(h, gi):
        h2 = gru_step_from_gates(p, gi, h)
        return h2, h2

    _, hs = jax.lax.scan(step, h0, jnp.swapaxes(gi_all, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


# ---------------------------------------------------------------------------
# composite blocks
# ---------------------------------------------------------------------------


def prenet_init(key, in_dim: int, sizes) -> Params:
    keys = jax.random.split(key, len(sizes))
    layers = []
    d = in_dim
    for k, s in zip(keys, sizes):
        layers.append(dense_init(k, d, s))
        d = s
    return {"layers": layers}


def prenet(p: Params, x: jax.Array, key, rate: float = 0.5, masks=None) -> jax.Array:
    """Prenet with always-on dropout (reference modules.py:220-251).

    ``masks`` (from prenet_masks) replaces the per-layer draws in hot loops."""
    for i, lp in enumerate(p["layers"]):
        x = jax.nn.relu(dense(lp, x))
        if masks is not None:
            x = apply_dropout_mask(masks[i], x, rate)
        elif rate > 0.0:
            x = dropout(jax.random.fold_in(key, i), x, rate, enabled=True)
    return x


def prenet_masks(p: Params, key, rate: float, batch: int):
    """The per-layer keep-masks prenet would draw from ``key`` (same
    fold_in(key, i) derivation); None when rate is 0."""
    if rate == 0.0:
        return None
    return tuple(
        jax.random.bernoulli(
            jax.random.fold_in(key, i), 1.0 - rate, (batch, lp["w"].shape[1])
        )
        for i, lp in enumerate(p["layers"])
    )


def conv_stack_init(key, n_layers: int, width: int, in_ch: int, channels: int) -> Params:
    keys = jax.random.split(key, n_layers)
    layers = []
    d = in_ch
    for k in keys:
        layers.append(
            {"conv": conv1d_init(k, width, d, channels), "bn": batchnorm_init(channels)}
        )
        d = channels
    return {"layers": layers}


def conv_stack(
    p: Params,
    x: jax.Array,
    key,
    train: bool,
    drop_rate: float = 0.5,
    activations=None,
):
    """Conv1d + activation + BN + dropout stack (reference modules.py:379-391,
    with the default ``batch_norm_position='after'``: conv -> act -> BN -> drop).

    Returns (y, updated_params).
    """
    new_layers = []
    for i, lp in enumerate(p["layers"]):
        act = None
        if activations is not None:
            act = activations[i]
        elif activations is None:
            act = jax.nn.relu
        y = conv1d(lp["conv"], x)
        if act is not None:
            y = act(y)
        y, new_bn = batchnorm(lp["bn"], y, train)
        y = dropout(jax.random.fold_in(key, i), y, drop_rate, enabled=train)
        new_layers.append({"conv": lp["conv"], "bn": new_bn})
        x = y
    return x, {"layers": new_layers}


def highway_init(key, units: int) -> Params:
    k1, k2 = jax.random.split(key)
    p = {"h": dense_init(k1, units, units), "t": dense_init(k2, units, units)}
    # gate bias -1 biases toward carry early in training
    p["t"]["b"] = jnp.full((units,), -1.0)
    return p


def highway(p: Params, x: jax.Array) -> jax.Array:
    h = jax.nn.relu(dense(p["h"], x))
    t = jax.nn.sigmoid(dense(p["t"], x))
    return h * t + x * (1.0 - t)
