"""One isolated wide-group bwd_accum compile+timing (the shared compile
helper crashes under repeated large compiles; isolation works).

Usage: python -m tools.exp_tk_wide ROWS
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache
from tools.benchlib import sync, timed






def main():
    nrows = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    enable_compile_cache()
    from tacotronv2_wavernn_chinese_tpu.models import attention as ATT
    from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
    from tacotronv2_wavernn_chinese_tpu.ops import tacotron_trainer_kernel as TK

    cfg = default_config().tacotron
    key = jax.random.PRNGKey(7)
    T_in, T_dec = 64, 512
    u, V, A = cfg.decoder_lstm_units, 2 * cfg.encoder_lstm_units, cfg.attention_dim
    pre, taps = cfg.prenet_layers[-1], cfg.attention_kernel
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg)
    weights = TK.pack_core_weights(params, cfg)
    pre_seq = jax.random.normal(jax.random.PRNGKey(1), (T_dec, nrows, pre))
    masks = tuple(jnp.ones((T_dec, nrows, u)) for _ in range(4))
    memory = jax.random.normal(jax.random.PRNGKey(2), (nrows, T_in, V))
    keys_p = ATT.precompute_keys(params["attention"], cfg, memory)
    mm_full = jnp.ones((nrows, T_in))
    static = (
        nrows, T_in, T_dec, 8, pre, u, V, A, taps,
        float(cfg.zoneout_rate), True, False, "bf16", "accum",
    )
    saves = tuple(
        jax.jit(lambda: TK._fwd_call(
            static, weights, pre_seq, masks, keys_p, memory, mm_full,
        ))()
    )
    print(f"fwd({nrows}) compiled+ran", flush=True)

    def make_bwd(R):
        def run(k):
            def body(i, acc):
                cots = (
                    jnp.full((T_dec, nrows, u), 1e-3) + jnp.float32(i) * 0,
                    jnp.full((T_dec, nrows, V), 1e-3),
                    jnp.full((T_dec, nrows, T_in), 1e-3),
                )
                outs = TK._bwd_call(
                    static, weights, pre_seq, masks, keys_p, memory, mm_full,
                    saves, cots,
                )
                return acc + jnp.sum(outs[2])
            return jax.lax.fori_loop(0, R, body, 0.0)
        return jax.jit(run)

    t2 = timed(make_bwd(2), key)
    t6 = timed(make_bwd(6), key)
    print(f"bwd_wide rows={nrows}: marginal {1000*(t6-t2)/4:.2f} ms/group-pass", flush=True)

    def make_fwd(R):
        def run(k):
            def body(i, acc):
                outs = TK._fwd_call(
                    static, weights, pre_seq + jnp.float32(i) * 0, masks,
                    keys_p, memory, mm_full,
                )
                return acc + jnp.sum(outs[0])
            return jax.lax.fori_loop(0, R, body, 0.0)
        return jax.jit(run)

    t2 = timed(make_fwd(2), key)
    t6 = timed(make_fwd(6), key)
    print(f"fwd_wide rows={nrows}: marginal {1000*(t6-t2)/4:.2f} ms/group-pass", flush=True)


if __name__ == "__main__":
    main()
