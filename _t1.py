import dataclasses
import jax, jax.numpy as jnp, numpy as np
from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
from tacotronv2_wavernn_chinese_tpu.ops import tacotron_trainer_kernel as TK
from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

cfg = default_config().tacotron
params = T.init_tacotron(jax.random.PRNGKey(0), cfg)
B, T_in, Td = 8, 64, 32
inputs = jnp.arange(B*T_in).reshape(B,T_in) % 50
lens = jnp.full((B,), T_in, jnp.int32)
memory, _ = T.encode(params, cfg, inputs, lens, False, jax.random.PRNGKey(1))
mask = jnp.ones((B, T_in), jnp.float32)
from tacotronv2_wavernn_chinese_tpu.models import attention as A
keys = A.precompute_keys(params["attention"], cfg, memory)
pre_seq = jax.random.normal(jax.random.PRNGKey(2), (Td, B, cfg.prenet_layers[-1]))
u = cfg.decoder_lstm_units
masks = tuple(jnp.ones((Td, B, u), jnp.float32) for _ in range(4))

print("fwd only...", flush=True)
f = jax.jit(lambda p, pre: TK.fused_core_apply(p, cfg, pre, masks, keys, memory, mask)[0])
out = f(params, pre_seq)
print("fwd OK", float(np.asarray(jnp.sum(out))), flush=True)

print("fwd+bwd...", flush=True)
def loss(p, pre):
    o2, cx, al = TK.fused_core_apply(p, cfg, pre, masks, keys, memory, mask)
    return jnp.sum(o2**2) + jnp.sum(cx**2) + jnp.sum(al*2.0)
g = jax.jit(jax.grad(loss))(params, pre_seq)
print("bwd OK", float(np.asarray(jnp.sum(g["dec_lstm1"]["w"]))), flush=True)
