"""Pallas TPU kernel: fused autoregressive WaveRNN sample loop.

Why: the pure ``lax.scan`` generation path re-reads every weight matrix from
HBM on each of the 22,050 steps per audio-second (~19 MB f32 -> ~24 us/step,
HBM-bandwidth-bound).  This kernel pins all weights in VMEM (bf16, ~8.4 MB)
for the entire pallas_call and streams only the per-step conditioning
(256 bf16 values per fold per step), so the serial loop is MXU-compute-bound
instead of bandwidth-bound.

Structure (reference semantics: fatchord_version.py:169-260):

* The grid iterates over time *chunks*; TPU grid execution is sequential, so
  GRU hidden state, the previous sample, and the fold axis live in VMEM
  scratch that persists across grid steps.  Pallas double-buffers the
  conditioning chunk DMA automatically via its BlockSpec pipeline.
* Conditioning is packed outside the kernel as a [B, T, 256] bf16 tensor:
  cols [0:80) upsampled mel, [80:112) aux a1, [112:144) a2, [144:176) a3,
  [176:208) a4, rest zero.  Weight matrices that consume mel/aux slices are
  re-packed as 256-row matrices with zeros elsewhere, so each consumer is a
  single MXU matmul against the packed conditioning row.
* Sampling is on-chip: pltpu PRNG bits -> Gumbel noise -> argmax over the
  2**bits softmax logits (equivalent to categorical sampling,
  reference fatchord_version.py:233).

Roofline position (v5e, measured via bench.py at 222 folds): the serial
in-loop matmuls (I-cond 256x512, GRU1 512x1536 x2, GRU2 (512+256)x1536 + h,
fc1/fc2 (512+256)x512, fc3 512x1024) total ~9.8 MFLOP per fold per sample
= ~2.2 GFLOP per 222-fold step; at the measured ~14.7 us/step that is
~148 TFLOP/s = ~75% of the chip's 197 TFLOP/s bf16 peak.  The remaining
~25% is MXU pipeline latency in an unbreakable serial dependence chain
(each matmul consumes the previous one's output) plus the VPU work
(sigmoid/tanh gates, softmax-free Gumbel argmax) and the conditioning DMA.
An AR sample loop cannot batch across time, so fold count is the only
utilization lever: throughput scales near-linearly to ~512 folds
(~690x realtime) where the MXU saturates.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import WaveRNNModelConfig

Params = Dict[str, Any]

COND_W = 256  # packed conditioning width
_MEL0, _A1, _A2, _A3, _A4 = 0, 80, 112, 144, 176

# Largest fold batch per pallas_call: at 512 folds the cond double-buffer
# (2*B*chunk*COND_W bf16 at the chunk floor of 8), the f32 hidden-state and
# logits scratches, and the ~8.4 MB of pinned bf16 weights still fit VMEM
# (measured working on v5e — ~690x realtime); ~640 does not.  Larger batches
# run as sequential groups in generate_pallas.
MAX_FOLDS = 512


def _pack_cond(mels_up: jax.Array, aux: jax.Array, aux_d: int) -> jax.Array:
    """[B,T,80] + [B,T,4*aux_d] -> [B,T,COND_W] (zero-padded)."""
    B, T, M = mels_up.shape
    pad = COND_W - (M + 4 * aux_d)
    return jnp.concatenate(
        [mels_up, aux, jnp.zeros((B, T, pad), mels_up.dtype)], axis=-1
    )


def _rows(w: jax.Array, at: int, total: int = COND_W) -> jax.Array:
    """Place ``w`` [r, c] at row offset ``at`` of a [total, c] zero matrix."""
    out = jnp.zeros((total, w.shape[1]), w.dtype)
    return out.at[at : at + w.shape[0]].set(w)


def pack_weights(params: Params, cfg: WaveRNNModelConfig, dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """Re-pack model params into kernel layout (all consumers of the packed
    conditioning become 256-row matrices)."""
    M = params["I"]["w"].shape[0] - 1 - (cfg.res_out_dims // 4)  # num_mels
    aux_d = cfg.res_out_dims // 4
    rnn, fc = cfg.rnn_dims, cfg.fc_dims

    wi = params["I"]["w"]  # [(1+M+aux), rnn]; row 0 = sample
    packed = {
        "w_x": wi[0:1, :],  # [1, rnn]
        "wi_cond": _rows(wi[1:, :], _MEL0),  # mel rows at 0, a1 rows at 80
        "b_i": params["I"]["b"][None, :],
        "wi1": params["gru1"]["wi"],
        "wh1": params["gru1"]["wh"],
        "bi1": params["gru1"]["bi"][None, :],
        "bh1": params["gru1"]["bh"][None, :],
        "wi2_x": params["gru2"]["wi"][:rnn, :],
        "wi2_cond": _rows(params["gru2"]["wi"][rnn:, :], _A2),
        "wh2": params["gru2"]["wh"],
        "bi2": params["gru2"]["bi"][None, :],
        "bh2": params["gru2"]["bh"][None, :],
        "wfc1_x": params["fc1"]["w"][:rnn, :],
        "wfc1_cond": _rows(params["fc1"]["w"][rnn:, :], _A3),
        "bfc1": params["fc1"]["b"][None, :],
        "wfc2_x": params["fc2"]["w"][:fc, :],
        "wfc2_cond": _rows(params["fc2"]["w"][fc:, :], _A4),
        "bfc2": params["fc2"]["b"][None, :],
        "wfc3": params["fc3"]["w"],
        "bfc3": params["fc3"]["b"][None, :],
    }
    # the _A1.._A4 column offsets are the 80/32 geometry EXACTLY — a mere
    # sum check would admit (96, 16)-style splits that scramble a3/a4
    assert M == _A1 and aux_d == _A2 - _A1, "packing layout assumes 80 mels + 32-dim aux"
    return {k: v.astype(dtype) for k, v in packed.items()}


def _gumbel_from_bits(bits: jax.Array) -> jax.Array:
    """uint32 random bits -> standard Gumbel noise (float32)."""
    # bits -> uniform in [1, 2) via exponent trick, then to (0, 1]
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32) - 1.0
    u = jnp.maximum(f, 1e-9)
    return -jnp.log(-jnp.log(u))


def _kernel(
    # scalar prefetch
    seed_ref,  # [1] int32
    # inputs
    cond_ref,  # [CHUNK, B, COND_W] time-major (pipelined over T; per-step
    #            reads index dim 0, which Mosaic allows dynamic indices on)
    w_x, wi_cond, b_i, wi1, wh1, bi1, bh1,
    wi2_x, wi2_cond, wh2, bi2, bh2,
    wfc1_x, wfc1_cond, bfc1, wfc2_x, wfc2_cond, bfc2, wfc3, bfc3,
    # outputs
    out_ref,  # [CHUNK, B] int32 (time-major: dynamic per-step writes hit
    #           the sublane dim, which TPU handles efficiently)
    # scratch
    h1_ref,  # [B, rnn] f32
    h2_ref,  # [B, rnn] f32
    x_ref,  # [B, 128] f32 (col 0 = prev sample)
    *,
    chunk: int,
    n_classes: int,
    greedy: bool,
):
    step0 = pl.program_id(0) == 0

    @pl.when(step0)
    def _():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        h2_ref[:] = jnp.zeros_like(h2_ref)
        x_ref[:] = jnp.zeros_like(x_ref)

    if not greedy:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    f32 = jnp.float32

    def body(s, _):
        cond = cond_ref[s, :, :]  # [B, COND_W] bf16
        h1 = h1_ref[:]
        h2 = h2_ref[:]
        x = x_ref[:, 0:1]  # [B, 1]

        # I: x * w_x + cond @ wi_cond + b
        xt = (
            jnp.dot(x.astype(w_x.dtype), w_x[:], preferred_element_type=f32)
            + jnp.dot(cond, wi_cond[:], preferred_element_type=f32)
            + b_i[:].astype(f32)
        )  # [B, rnn]

        # GRU1
        xt_b = xt.astype(wi1.dtype)
        gi = jnp.dot(xt_b, wi1[:], preferred_element_type=f32) + bi1[:].astype(f32)
        gh = jnp.dot(h1.astype(wh1.dtype), wh1[:], preferred_element_type=f32) + bh1[:].astype(f32)
        h1 = _gru_combine(gi, gh, h1)
        xt = xt + h1

        # GRU2 (input = [xt, a2] via packed cond matmul)
        xt_b = xt.astype(wi2_x.dtype)
        gi = (
            jnp.dot(xt_b, wi2_x[:], preferred_element_type=f32)
            + jnp.dot(cond, wi2_cond[:], preferred_element_type=f32)
            + bi2[:].astype(f32)
        )
        gh = jnp.dot(h2.astype(wh2.dtype), wh2[:], preferred_element_type=f32) + bh2[:].astype(f32)
        h2 = _gru_combine(gi, gh, h2)
        xt = xt + h2

        # FC stack
        y = jnp.maximum(
            jnp.dot(xt.astype(wfc1_x.dtype), wfc1_x[:], preferred_element_type=f32)
            + jnp.dot(cond, wfc1_cond[:], preferred_element_type=f32)
            + bfc1[:].astype(f32),
            0.0,
        )
        y = jnp.maximum(
            jnp.dot(y.astype(wfc2_x.dtype), wfc2_x[:], preferred_element_type=f32)
            + jnp.dot(cond, wfc2_cond[:], preferred_element_type=f32)
            + bfc2[:].astype(f32),
            0.0,
        )
        logits = jnp.dot(y.astype(wfc3.dtype), wfc3[:], preferred_element_type=f32) + bfc3[:].astype(f32)

        # categorical sample: Gumbel-argmax over mu-law classes
        if not greedy:
            bits = pltpu.bitcast(pltpu.prng_random_bits(logits.shape), jnp.uint32)
            logits = logits + _gumbel_from_bits(bits)
        sample = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]

        out_ref[s, :] = sample
        h1_ref[:] = h1
        h2_ref[:] = h2
        # same op ORDER as dsp.mulaw.label_2_float (2*x then /(n-1)): the
        # precomputed-reciprocal form differs by 1 ulp for some labels,
        # which would let greedy trajectories diverge from the scan path
        x_ref[:, 0] = 2.0 * sample.astype(f32) / (n_classes - 1.0) - 1.0
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _gru_combine(gi: jax.Array, gh: jax.Array, h: jax.Array) -> jax.Array:
    """torch GRUCell gate combine from input/hidden projections (f32)."""
    H = h.shape[-1]
    r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
    n = jnp.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
    return (1.0 - z) * n + z * h


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "bits", "apply_mu_law", "greedy", "chunk", "interpret", "dtype"),
)
def generate_pallas(
    params: Params,
    cfg: WaveRNNModelConfig,
    mels: jax.Array,  # [B, T_mel, M] unit mels (padded by ``pad``)
    rng: jax.Array,
    bits: int = 10,
    apply_mu_law: bool = True,
    greedy: bool = False,
    chunk: int | None = None,
    interpret: bool = False,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Drop-in replacement for ``wavernn.generate_scan`` -> [B, T] float wav."""
    from ..models import wavernn as W

    n_fc3 = params["fc3"]["w"].shape[1]
    if n_fc3 != 2 ** bits:
        # the scan path derives the class count from fc3 itself; a silent
        # mismatch here would feed wrongly-rescaled samples back into the AR
        # loop and produce garbage audio instead of an error
        raise ValueError(
            f"bits={bits} implies {2 ** bits} mu-law classes but fc3 has {n_fc3}"
        )
    if mels.shape[0] > MAX_FOLDS:
        # beyond ~MAX_FOLDS the cond double-buffer + scratches no longer fit
        # VMEM beside the pinned weights; run sequential fold groups (each
        # amortizes fully — the MXU already saturates near MAX_FOLDS)
        outs = []
        for g in range(0, mels.shape[0], MAX_FOLDS):
            grng = (
                jax.random.fold_in(rng, g)
                if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
                else rng + jnp.asarray(g + 1, rng.dtype)
            )
            outs.append(
                generate_pallas(
                    params, cfg, mels[g : g + MAX_FOLDS], grng, bits,
                    apply_mu_law, greedy, chunk, interpret, dtype,
                )
            )
        return jnp.concatenate(outs, axis=0)

    aux_d = cfg.res_out_dims // 4
    mels_up, aux, _ = W.upsample(params, cfg, mels, train=False)
    cond = _pack_cond(mels_up, aux, aux_d).astype(dtype)
    B, T, _ = cond.shape
    cond = jnp.swapaxes(cond, 0, 1)  # time-major [T, B, COND_W]
    n_classes = 2 ** bits

    if chunk is None:
        # double-buffered cond chunks must fit VMEM beside ~8.4 MB of bf16
        # weights: 2 * B * chunk * COND_W * itemsize <= ~5.5 MB
        itemsize = jnp.dtype(dtype).itemsize
        budget = int(5_500_000 / max(2 * B * COND_W * itemsize, 1))
        chunk = max(8, min(64, (budget // 8) * 8))

    # pad T to a whole number of chunks
    n_chunks = -(-T // chunk)
    T_pad = n_chunks * chunk
    if T_pad != T:
        cond = jnp.pad(cond, ((0, T_pad - T), (0, 0), (0, 0)))

    w = pack_weights(params, cfg, dtype)
    rnn = cfg.rnn_dims
    from . import kernel_seed

    seed = kernel_seed(rng)

    weight_order = [
        "w_x", "wi_cond", "b_i", "wi1", "wh1", "bi1", "bh1",
        "wi2_x", "wi2_cond", "wh2", "bi2", "bh2",
        "wfc1_x", "wfc1_cond", "bfc1", "wfc2_x", "wfc2_cond", "bfc2", "wfc3", "bfc3",
    ]
    # index maps receive (grid idx, *scalar_prefetch_refs)
    full = lambda a: pl.BlockSpec(a.shape, lambda i, s: (0,) * a.ndim, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, B, COND_W), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            *[full(w[k]) for k in weight_order],
        ],
        out_specs=pl.BlockSpec((chunk, B), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, rnn), jnp.float32),
            pltpu.VMEM((B, rnn), jnp.float32),
            pltpu.VMEM((B, 128), jnp.float32),
        ],
    )
    labels = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, n_classes=n_classes, greedy=greedy),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_pad, B), jnp.int32),
        interpret=interpret,
    )(seed, cond, *[w[k] for k in weight_order])

    labels = labels.T[:, :T]
    if apply_mu_law:
        return W.mu_law_expand(labels, bits)
    return 2.0 * labels.astype(jnp.float32) / (n_classes - 1.0) - 1.0


def supported(cfg: WaveRNNModelConfig, num_mels: int = 80) -> bool:
    """The packed layout assumes the reference geometry (80 mels, aux 32) and
    the kernel samples with mu-law argmax — RAW mode only (MOL uses
    mixture-of-logistics sampling, handled by the scan path)."""
    return cfg.mode == "RAW" and num_mels == 80 and cfg.res_out_dims // 4 == 32
