"""Discretized mixture-of-logistics (MOL) loss and sampling.

JAX re-implementation of the reference's r9y9-port
(wavernn/utils/distribution.py:6-123), used by WaveRNN's MOL mode
(fatchord_version.py:102-108,160-164).  Everything is vectorized over
[B, T] so it jits cleanly; sampling threads an explicit PRNG key instead of
torch's global RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_sum_exp(x: jax.Array, axis: int = -1) -> jax.Array:
    """Numerically stable log-sum-exp (reference distribution.py:6-12)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    return jnp.squeeze(m, axis) + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis))


def discretized_mix_logistic_loss(
    y_hat: jax.Array,  # [B, T, 3*num_mixtures] (logit_probs, means, log_scales)
    y: jax.Array,  # [B, T] targets in [-1, 1]
    num_classes: int = 65536,
    log_scale_min: float = -32.23619130191664,  # float(np.log(1e-14))
    reduce: bool = True,
):
    """NLL of discretized logistic mixture (reference distribution.py:15-69)."""
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix : 2 * nr_mix]
    log_scales = jnp.maximum(y_hat[..., 2 * nr_mix :], log_scale_min)

    centered = y[..., None] - means  # [B, T, M]
    inv_stdv = jnp.exp(-log_scales)
    half = 1.0 / (num_classes - 1)
    plus_in = inv_stdv * (centered + half)
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered - half)
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)  # log CDF at +inf edge
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)  # log (1-CDF) at -inf edge
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - jnp.log((num_classes - 1) / 2.0),
    )
    log_probs = jnp.where(
        y[..., None] < -0.999,
        log_cdf_plus,
        jnp.where(y[..., None] > 0.999, log_one_minus_cdf_min, inner),
    )
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    nll = -log_sum_exp(log_probs, axis=-1)  # [B, T]
    return jnp.mean(nll) if reduce else nll


def sample_from_discretized_mix_logistic(
    y_hat: jax.Array,  # [B, T, 3*num_mixtures]
    rng: jax.Array,
    log_scale_min: float = -32.23619130191664,
) -> jax.Array:
    """Draw samples (reference distribution.py:72-123) -> [B, T] in [-1, 1]."""
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :nr_mix]
    k_sel, k_u = jax.random.split(rng)

    # Gumbel-max mixture selection (reference uses uniform log-trick)
    sel = jax.random.categorical(k_sel, logit_probs, axis=-1)  # [B, T]
    one_hot = jax.nn.one_hot(sel, nr_mix, dtype=y_hat.dtype)

    means = jnp.sum(y_hat[..., nr_mix : 2 * nr_mix] * one_hot, axis=-1)
    log_scales = jnp.maximum(
        jnp.sum(y_hat[..., 2 * nr_mix :] * one_hot, axis=-1), log_scale_min
    )
    u = jax.random.uniform(k_u, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log1p(-u))
    return jnp.clip(x, -1.0, 1.0)
