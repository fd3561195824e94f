"""Fused Pallas TPU kernels for the two autoregressive hot loops."""

import jax
import jax.numpy as jnp


def kernel_seed(rng: jax.Array) -> jax.Array:
    """Collapse a JAX PRNG key (typed key or raw uint32 data) into the
    single int32 seed that feeds the on-chip ``pltpu.prng_seed``.  Shared by
    both AR kernels so their host->kernel seed derivation cannot diverge."""
    key_arr = (
        jax.random.key_data(rng)
        if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
        else rng
    )
    return jnp.asarray(
        [jnp.bitwise_xor.reduce(key_arr.astype(jnp.uint32).ravel()).astype(jnp.int32)]
    )


def is_per_example_keys(rng: jax.Array) -> bool:
    """True when ``rng`` is a [B]-shaped array of per-example PRNG keys
    (typed keys with ndim 1, or raw uint32 key data with ndim 2) rather
    than one key shared by the whole batch.  Per-example keys make each
    row's random stream a function of its OWN key only, so serving can
    coalesce requests with distinct seeds into one batch without any
    request's output depending on what it was co-batched with."""
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return rng.ndim == 1
    return rng.ndim == 2
