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
