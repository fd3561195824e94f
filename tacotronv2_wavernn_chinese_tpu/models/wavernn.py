"""WaveRNN vocoder (fatchord RAW variant): mel -> waveform.

TPU-first re-design of the reference PyTorch model
(wavernn/models/fatchord_version.py:92-405):

* Teacher-forced training forward is fully parallel over time — the GRU
  recurrences run under ``lax.scan`` while every conditioning matmul
  (upsampled mel / aux projections) is hoisted into large batched matmuls
  that map straight onto the MXU.
* Autoregressive generation splits each utterance's time axis into
  overlapping folds (reference ``fold_with_overlap``,
  fatchord_version.py:293-340) which become the *batch* axis of the serial
  sample loop; folds can additionally be sharded over a device mesh.  All
  input-side contributions of the conditioning features are precomputed for
  the whole utterance in one pass, so the serial loop carries only the true
  recurrence: two GRU hidden-state matmuls + output stack + on-chip
  categorical sampling (Gumbel argmax).

Architecture constants (reference wavernn_hparams.py:27-43): RAW mode with
2**10 mu-law classes, upsample (5, 5, 11) = 275 = hop, rnn/fc 512,
MelResNet compute 128 with 10 blocks, aux 4 x 32, pad 2.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig, WaveRNNGenConfig, WaveRNNModelConfig
from ..utils import is_tpu_backend
from . import layers as L

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_wavernn(key, cfg: WaveRNNModelConfig, num_mels: int = 80, bits: int = 10) -> Params:
    """Parameter pytree.  n_classes = 2**bits in RAW mode
    (reference fatchord_version.py:102-108)."""
    ks = jax.random.split(key, 12)
    aux = cfg.res_out_dims // 4
    n_classes = 2 ** bits if cfg.mode == "RAW" else 30

    params: Params = {
        "resnet": _melresnet_init(ks[0], cfg, num_mels),
        "upsample": _upsample_init(ks[1], cfg),
        "I": L.dense_init(ks[2], num_mels + aux + 1, cfg.rnn_dims),
        "gru1": L.gru_init(ks[3], cfg.rnn_dims, cfg.rnn_dims),
        "gru2": L.gru_init(ks[4], cfg.rnn_dims + aux, cfg.rnn_dims),
        "fc1": L.dense_init(ks[5], cfg.rnn_dims + aux, cfg.fc_dims),
        "fc2": L.dense_init(ks[6], cfg.fc_dims + aux, cfg.fc_dims),
        "fc3": L.dense_init(ks[7], cfg.fc_dims, n_classes),
    }
    return params


def _melresnet_init(key, cfg: WaveRNNModelConfig, num_mels: int) -> Params:
    """MelResNet (reference fatchord_version.py:13-48): VALID conv_in k=2*pad+1
    -> 10x [1x1 conv + BN]x2 residual blocks -> 1x1 conv_out."""
    ks = jax.random.split(key, cfg.res_blocks + 2)
    blocks = []
    for i in range(cfg.res_blocks):
        k1, k2 = jax.random.split(ks[i])
        blocks.append(
            {
                "conv1": L.conv1d_init(k1, 1, cfg.compute_dims, cfg.compute_dims, use_bias=False),
                "bn1": L.batchnorm_init(cfg.compute_dims),
                "conv2": L.conv1d_init(k2, 1, cfg.compute_dims, cfg.compute_dims, use_bias=False),
                "bn2": L.batchnorm_init(cfg.compute_dims),
            }
        )
    return {
        "conv_in": L.conv1d_init(ks[-2], 2 * cfg.pad + 1, num_mels, cfg.compute_dims, use_bias=False),
        "bn_in": L.batchnorm_init(cfg.compute_dims),
        "blocks": blocks,
        "conv_out": L.conv1d_init(ks[-1], 1, cfg.compute_dims, cfg.res_out_dims),
    }


def _upsample_init(key, cfg: WaveRNNModelConfig) -> Params:
    """Per-scale smoothing kernels, initialized to the mean filter
    (reference fatchord_version.py:73-80).  One shared (2s+1) taps-vector per
    scale, applied depthwise along time to every mel bin."""
    kernels = []
    for s in cfg.upsample_factors:
        kernels.append(jnp.full((2 * s + 1,), 1.0 / (2 * s + 1)))
    return {"kernels": kernels}


# ---------------------------------------------------------------------------
# conditioning network: MelResNet + upsample
# ---------------------------------------------------------------------------


def _conv1d_valid(p: Params, x: jax.Array) -> jax.Array:
    x, w = L.promote_conv_operands(x, p["w"])
    y = jax.lax.conv_general_dilated(
        x, w, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
    )
    if "b" in p:
        y = y + p["b"]
    return y


def melresnet(params: Params, mels: jax.Array, train: bool):
    """[B, T_mel, M] -> ([B, T_mel - 2*pad, res_out_dims], new_params).

    BatchNorm uses the TORCH defaults (eps 1e-5, running-stat momentum 0.1,
    i.e. new = 0.9*old + 0.1*batch, running_var tracked with the UNBIASED
    batch variance) — the vocoder side is a torch model in the reference
    (nn.BatchNorm1d, fatchord_version.py:18-36), unlike the TF acoustic side
    (eps 1e-3, biased var)."""
    p = params["resnet"]
    bn = lambda pp, x: L.batchnorm(
        pp, x, train, momentum=0.9, eps=1e-5, unbiased_ema=True
    )
    x = _conv1d_valid(p["conv_in"], mels)
    x, nbn_in = bn(p["bn_in"], x)
    x = jax.nn.relu(x)
    new_blocks = []
    for bp in p["blocks"]:
        y = _conv1d_valid(bp["conv1"], x)
        y, nbn1 = bn(bp["bn1"], y)
        y = jax.nn.relu(y)
        y = _conv1d_valid(bp["conv2"], y)
        y, nbn2 = bn(bp["bn2"], y)
        x = x + y
        new_blocks.append(dict(bp, bn1=nbn1, bn2=nbn2))
    x = _conv1d_valid(p["conv_out"], x)
    new_p = dict(p, bn_in=nbn_in, blocks=new_blocks)
    return x, new_p


def _stretch_smooth(x: jax.Array, taps: jax.Array, scale: int) -> jax.Array:
    """Nearest-repeat upsample by ``scale`` along time then depthwise smooth
    with a shared taps vector (reference Stretch2d + mean-init conv2d,
    fatchord_version.py:51-80).  x: [B, T, C]."""
    B, T, C = x.shape
    x = jnp.repeat(x, scale, axis=1)  # [B, T*scale, C]
    k = taps[:, None, None] * jnp.ones((1, 1, C), x.dtype)  # [W, 1, C] depthwise
    return jax.lax.conv_general_dilated(
        x,
        k,
        (1,),
        [(taps.shape[0] // 2, taps.shape[0] // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    )


def upsample(params: Params, cfg: WaveRNNModelConfig, mels: jax.Array, train: bool):
    """[B, T_mel, M] -> (mels_up [B, (T_mel-2*pad)*hop, M],
                         aux    [B, (T_mel-2*pad)*hop, res_out],
                         new_params)

    Matches reference UpsampleNetwork.forward (fatchord_version.py:82-89):
    the aux path runs MelResNet then nearest-stretches by the total factor;
    the mel path stretch+smooths per scale then trims ``pad*hop`` each side.
    """
    total = cfg.total_upsample
    aux, new_resnet = melresnet(params, mels, train)
    aux = jnp.repeat(aux, total, axis=1)

    x = mels
    for taps, s in zip(params["upsample"]["kernels"], cfg.upsample_factors):
        x = _stretch_smooth(x, taps, s)
    indent = cfg.pad * total
    x = x[:, indent : -indent or None, :]
    return x, aux, dict(params, resnet=new_resnet)


# ---------------------------------------------------------------------------
# teacher-forced forward (training)
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    cfg: WaveRNNModelConfig,
    x: jax.Array,  # [B, T] previous samples as floats in [-1, 1]
    mels: jax.Array,  # [B, T_mel, M] unit-range mels, T_mel = T/hop + 2*pad
    train: bool,
):
    """Teacher-forced forward -> (logits [B, T, n_classes], new_params).

    Reference fatchord_version.py:131-167, re-ordered for TPU: every
    time-parallel matmul (I, GRU input projections, fc aux parts) is computed
    in bulk; the two scans carry only the hidden-state recurrence.
    """
    aux_d = cfg.res_out_dims // 4
    mels_up, aux, new_params = upsample(params, cfg, mels, train)
    a1, a2, a3, a4 = (aux[:, :, i * aux_d : (i + 1) * aux_d] for i in range(4))

    xi = jnp.concatenate([x[..., None], mels_up, a1], axis=-1)
    h = L.dense(params["I"], xi)  # [B, T, rnn]
    res1 = h

    # GRU1: input gate projections for all t at once, then scan the recurrence
    gi1 = h @ params["gru1"]["wi"] + params["gru1"]["bi"]
    h = _gru_scan_precomputed(params["gru1"], gi1)
    h = h + res1
    res2 = h

    gru2_in = jnp.concatenate([h, a2], axis=-1)
    gi2 = gru2_in @ params["gru2"]["wi"] + params["gru2"]["bi"]
    h = _gru_scan_precomputed(params["gru2"], gi2)
    h = h + res2

    h = jax.nn.relu(L.dense(params["fc1"], jnp.concatenate([h, a3], axis=-1)))
    h = jax.nn.relu(L.dense(params["fc2"], jnp.concatenate([h, a4], axis=-1)))
    logits = L.dense(params["fc3"], h)
    return logits, new_params


def _gru_scan_precomputed(p: Params, gi: jax.Array, h0: jax.Array | None = None) -> jax.Array:
    """GRU over time when the input-side gate projections ``gi`` [B, T, 3H]
    are already computed; the scan does only h @ wh per step."""
    B, T, _ = gi.shape
    H = p["wh"].shape[0]
    h0 = jnp.zeros((B, H), gi.dtype) if h0 is None else h0

    def step(h, gi_t):
        h2 = _gru_cell(p, gi_t, h)
        return h2, h2

    _, hs = jax.lax.scan(step, h0, jnp.swapaxes(gi, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


def _gru_cell(p: Params, gi_t: jax.Array, h: jax.Array) -> jax.Array:
    """One GRU step from precomputed input gates (torch gate order r, z, n)."""
    gh = h @ p["wh"] + p["bh"]
    ir, iz, inn = jnp.split(gi_t, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(inn + r * hn)
    return (1.0 - z) * n + z * h


# ---------------------------------------------------------------------------
# autoregressive generation
# ---------------------------------------------------------------------------


class GenPrecomputed(NamedTuple):
    """Per-utterance conditioning computed in bulk before the serial loop.
    Shapes are [B, T, .] where B is the fold (batch) axis.  Only the wide
    mel+a1 projection is materialized at rnn width; a2/a3/a4 stay at their
    raw 32-dim width (the in-loop projections are tiny) to keep the per-step
    HBM read small."""

    i_cond: jax.Array  # mel+a1 contribution to I (incl. bias) [B, T, rnn]
    a2: jax.Array  # [B, T, aux]
    a3: jax.Array  # [B, T, aux]
    a4: jax.Array  # [B, T, aux]


def precompute_conditioning(params: Params, cfg: WaveRNNModelConfig, mels: jax.Array):
    """Run upsample + the input-side I projection for a whole (folded)
    utterance in parallel.  The sample value enters I through a single column
    of its kernel, so I(x_t) = x_t * w_x + i_cond_t."""
    aux_d = cfg.res_out_dims // 4
    mels_up, aux, _ = upsample(params, cfg, mels, train=False)
    a1, a2, a3, a4 = (aux[:, :, i * aux_d : (i + 1) * aux_d] for i in range(4))

    wi = params["I"]["w"]  # [(1 + M + aux), rnn]; row 0 multiplies the sample
    cond_in = jnp.concatenate([mels_up, a1], axis=-1)
    i_cond = cond_in @ wi[1:, :] + params["I"]["b"]
    return GenPrecomputed(i_cond, a2, a3, a4)


def generate_scan(
    params: Params,
    cfg: WaveRNNModelConfig,
    mels: jax.Array,  # [B, T_mel, M] unit mels (already padded by ``pad``)
    rng: jax.Array,
    bits: int = 10,
    apply_mu_law: bool = True,
    greedy: bool = False,
) -> jax.Array:
    """Serial sample loop under ``lax.scan`` -> [B, T] float wav in [-1, 1].

    The carry is (h1, h2, x); per step: I -> GRU1 -> GRU2 -> fc1 -> fc2 ->
    fc3 -> Gumbel-argmax categorical sample (reference Categorical.sample,
    fatchord_version.py:233).  Everything else is precomputed.
    """
    pre = precompute_conditioning(params, cfg, mels)
    B, T, _ = pre.i_cond.shape
    n_classes = params["fc3"]["w"].shape[1]

    w_x = params["I"]["w"][0, :]  # sample column of I
    step_keys = jax.random.split(rng, T)
    mol = cfg.mode == "MOL"

    def step(carry, inp):
        h1, h2, x = carry
        i_cond_t, a2_t, a3_t, a4_t, key_t = inp
        xt = x[:, None] * w_x[None, :] + i_cond_t
        gi1 = xt @ params["gru1"]["wi"] + params["gru1"]["bi"]
        h1 = _gru_cell(params["gru1"], gi1, h1)
        xt = xt + h1
        gi2 = jnp.concatenate([xt, a2_t], axis=-1) @ params["gru2"]["wi"] + params["gru2"]["bi"]
        h2 = _gru_cell(params["gru2"], gi2, h2)
        xt = xt + h2
        y = jax.nn.relu(L.dense(params["fc1"], jnp.concatenate([xt, a3_t], axis=-1)))
        y = jax.nn.relu(L.dense(params["fc2"], jnp.concatenate([y, a4_t], axis=-1)))
        logits = L.dense(params["fc3"], y)
        if mol:
            from ..ops.distribution import sample_from_discretized_mix_logistic

            x = sample_from_discretized_mix_logistic(logits[:, None, :], key_t)[:, 0]
            sample = x  # float samples in MOL mode
        else:
            g_t = (
                jnp.zeros((B, n_classes), jnp.float32)
                if greedy
                else jax.random.gumbel(key_t, (B, n_classes), jnp.float32)
            )
            sample = jnp.argmax(jax.nn.log_softmax(logits) + g_t, axis=-1)
            x = 2.0 * sample.astype(jnp.float32) / (n_classes - 1.0) - 1.0
        return (h1, h2, x), sample

    # derive the zero carry from the conditioning so it picks up the same
    # sharding/varying-axes type under shard_map (i_cond is rnn-wide)
    h0 = pre.i_cond[:, 0, :] * 0.0
    x0 = pre.i_cond[:, 0, 0] * 0.0
    xs = (
        jnp.swapaxes(pre.i_cond, 0, 1),
        jnp.swapaxes(pre.a2, 0, 1),
        jnp.swapaxes(pre.a3, 0, 1),
        jnp.swapaxes(pre.a4, 0, 1),
        step_keys,
    )
    _, samples = jax.lax.scan(step, (h0, h0, x0), xs)
    samples = jnp.swapaxes(samples, 0, 1)  # [B, T]
    if mol:
        return samples  # already float wav in [-1, 1]
    if apply_mu_law:
        return mu_law_expand(samples, bits)
    return 2.0 * samples.astype(jnp.float32) / (n_classes - 1.0) - 1.0


def mu_law_expand(labels: jax.Array, bits: int) -> jax.Array:
    """Labels [0, 2**bits) -> float wav via mu-law expansion
    (reference decode_mu_law with from_labels=True, dsp.py:42-47)."""
    mu = 2 ** bits - 1
    x = 2.0 * labels.astype(jnp.float32) / mu - 1.0
    return jnp.sign(x) / mu * ((1.0 + mu) ** jnp.abs(x) - 1.0)


# ---------------------------------------------------------------------------
# fold / unfold (sequence-parallel batched generation)
# ---------------------------------------------------------------------------


def fold_with_overlap(x: np.ndarray, target: int, overlap: int) -> Tuple[np.ndarray, int]:
    """Split [T, C] conditioning into overlapping folds [n_folds, target+2*ov, C]
    (reference fatchord_version.py:293-340).  Returns (folds, n_folds)."""
    total = x.shape[0]
    num_folds = max(0, (total - overlap) // (target + overlap))
    extended = num_folds * (overlap + target) + overlap
    remaining = total - extended
    if remaining != 0 or num_folds == 0:
        # also covers degenerate inputs shorter than one fold (or even the
        # overlap): always emit at least one zero-padded fold
        num_folds += 1
        padding = target + 2 * overlap - remaining
        x = np.concatenate([x, np.zeros((padding,) + x.shape[1:], x.dtype)], axis=0)
    folds = np.stack(
        [x[i * (target + overlap) : i * (target + overlap) + target + 2 * overlap] for i in range(num_folds)]
    )
    return folds, num_folds


def xfade_and_unfold(y: np.ndarray, overlap: int) -> np.ndarray:
    """Equal-power crossfade of folds [n, target+2*ov] -> [T]
    (reference fatchord_version.py:342-405): each fold gets ``overlap/2``
    silence then a sqrt fade-in over the other half; each tail keeps unit
    gain through the next fold's silent warmup then sqrt-fades out, so the
    summed gains stay ~1 across every boundary."""
    num_folds, length = y.shape
    target = length - 2 * overlap
    silence_len = overlap // 2
    fade_len = overlap - silence_len

    t = np.linspace(-1.0, 1.0, fade_len, dtype=np.float64)
    fade_in = np.sqrt(0.5 * (1.0 + t))
    fade_out = np.sqrt(0.5 * (1.0 - t))

    fin = np.concatenate([np.zeros(silence_len), fade_in])  # [overlap]
    fout = np.concatenate([np.ones(silence_len), fade_out])  # [overlap]

    y = y.astype(np.float64).copy()
    if overlap:
        y[:, :overlap] *= fin
        y[:, -overlap:] *= fout

    total = num_folds * (target + overlap) + overlap
    unfolded = np.zeros(total, np.float64)
    for i in range(num_folds):
        start = i * (target + overlap)
        unfolded[start : start + length] += y[i]
    return unfolded.astype(np.float32)


def bucket_folds(folds: np.ndarray, multiple: int = 8) -> np.ndarray:
    """Pad the fold axis up to a multiple (repeating the last fold) so
    repeated calls reuse a few compiled shapes; callers drop the extras."""
    from ..utils import round_up

    n = folds.shape[0]
    n_pad = round_up(n, multiple)
    if n_pad != n:
        folds = np.concatenate(
            [folds, np.repeat(folds[-1:], n_pad - n, axis=0)], axis=0
        )
    return folds


def pad_mel_for_generation(mel: np.ndarray, pad: int) -> np.ndarray:
    """Edge-value pad ``pad`` frames each side so upsample's VALID trims line
    up with the utterance (reference pad_tensor, fatchord_version.py:281-291
    pads with zeros; edge padding avoids boundary clicks and is equivalent in
    the interior)."""
    return np.pad(mel, ((pad, pad), (0, 0)), mode="edge")


def select_generate_fn(model_cfg: WaveRNNModelConfig, n_mels: int, use_pallas: bool):
    """Pick the per-fold AR generation function: the fused Pallas kernel when
    running on TPU and the config fits its envelope, else the scan path.
    Single source of truth for kernel gating (used by generate,
    generate_batch, and parallel.generate)."""
    if use_pallas and is_tpu_backend():
        from ..ops import wavernn_kernel as K

        if K.supported(model_cfg, n_mels):
            return K.generate_pallas
    return generate_scan


def generate(
    params: Params,
    model_cfg: WaveRNNModelConfig,
    gen_cfg: WaveRNNGenConfig,
    mel: np.ndarray,  # [T_mel, M] unit-range mel for ONE utterance
    rng: jax.Array,
    bits: int = 10,
    apply_mu_law: bool = True,
    generate_fn=None,
) -> np.ndarray:
    """Full batched-fold generation for one utterance -> wav [T_mel * hop].

    Mirrors reference WaveRNN.generate (fatchord_version.py:169-260) with the
    fold axis as the device batch: mel -> pad -> fold along *mel frames* ->
    parallel AR generation over folds -> host crossfade-unfold -> fade-out.
    """
    hop = model_cfg.total_upsample
    if gen_cfg.batched and (gen_cfg.target % hop or gen_cfg.overlap % hop):
        raise ValueError("target and overlap must be multiples of the hop size")

    T_mel = mel.shape[0]
    wave_len = T_mel * hop
    gen = generate_fn
    if gen is None:
        gen = select_generate_fn(model_cfg, mel.shape[1], gen_cfg.use_pallas)

    if gen_cfg.batched:
        # Fold on mel frames so each fold carries its own conditioning window.
        t_frames = gen_cfg.target // hop
        ov_frames = gen_cfg.overlap // hop
        folds, n_folds = fold_with_overlap(mel, t_frames, ov_frames)
        folds = np.stack([pad_mel_for_generation(f, model_cfg.pad) for f in folds])
        folds = bucket_folds(folds)
        wav_folds = np.asarray(gen(params, model_cfg, jnp.asarray(folds), rng, bits, apply_mu_law))
        wav = xfade_and_unfold(wav_folds[:n_folds], gen_cfg.overlap)[:wave_len]
    else:
        mel_p = pad_mel_for_generation(mel, model_cfg.pad)[None]
        wav = np.asarray(gen(params, model_cfg, jnp.asarray(mel_p), rng, bits, apply_mu_law))[0][:wave_len]

    # 20-hop linear fade-out tail (reference fatchord_version.py:255-258)
    wav = np.array(wav, np.float32, copy=True)
    fade_len = 20 * hop
    if wave_len > fade_len:
        wav[-fade_len:] *= np.linspace(1.0, 0.0, fade_len, dtype=np.float32)
    return wav.astype(np.float32)


def generate_batch(
    params: Params,
    model_cfg: WaveRNNModelConfig,
    gen_cfg: WaveRNNGenConfig,
    mels: list[np.ndarray],  # unit-range [T_i, M] mels, one per utterance
    rng: jax.Array,
    bits: int = 10,
    apply_mu_law: bool = True,
    generate_fn=None,
) -> list[np.ndarray]:
    """Vocode MANY utterances in one fused kernel invocation.

    All utterances' folds concatenate into a single fold-batch (the kernel's
    throughput scales with fold count — ~420x realtime at 72 folds, ~690x at
    512 on v5e), then each utterance is crossfade-unfolded from its own fold
    slice.  This is the server-throughput path; the reference processes
    utterances one at a time (wavernn_gen.py:13-45).

    ``gen_cfg.batched=False`` is honored here too (matching ``generate``):
    each utterance becomes one whole fold padded to a shared bucketed length
    — no crossfade, at the cost of losing the fold-level parallelism.
    """
    hop = model_cfg.total_upsample
    if gen_cfg.batched and (gen_cfg.target % hop or gen_cfg.overlap % hop):
        raise ValueError("target and overlap must be multiples of the hop size")
    t_frames = gen_cfg.target // hop
    ov_frames = gen_cfg.overlap // hop

    all_folds, counts, lens = [], [], []
    if gen_cfg.batched:
        for mel in mels:
            folds, n = fold_with_overlap(np.asarray(mel, np.float32), t_frames, ov_frames)
            all_folds.append(
                np.stack([pad_mel_for_generation(f, model_cfg.pad) for f in folds])
            )
            counts.append(n)
            lens.append(mel.shape[0] * hop)
        stacked = np.concatenate(all_folds, axis=0)
    else:
        # whole utterances, padded (with the edge frame) to a shared length
        # bucketed to 64 frames so varying batches reuse compiled shapes
        from ..utils import round_up

        T_max = round_up(max(m.shape[0] for m in mels), 64)
        for mel in mels:
            mel = np.asarray(mel, np.float32)
            lens.append(mel.shape[0] * hop)
            mel = np.pad(mel, ((0, T_max - mel.shape[0]), (0, 0)), mode="edge")
            all_folds.append(pad_mel_for_generation(mel, model_cfg.pad)[None])
            counts.append(1)
        stacked = np.concatenate(all_folds, axis=0)
    # bucket the total fold count to a multiple of 8 (same as generate()) so
    # varying text batches reuse a few compiled shapes instead of paying a
    # fresh remote kernel compile per distinct fold count
    stacked = bucket_folds(stacked)

    gen = generate_fn
    if gen is None:
        gen = select_generate_fn(model_cfg, stacked.shape[-1], gen_cfg.use_pallas)
    wav_folds = np.asarray(gen(params, model_cfg, jnp.asarray(stacked), rng, bits, apply_mu_law))

    out, offset = [], 0
    fade_len = 20 * hop
    for n, wave_len in zip(counts, lens):
        if gen_cfg.batched:
            wav = xfade_and_unfold(wav_folds[offset : offset + n], gen_cfg.overlap)[:wave_len]
        else:
            wav = wav_folds[offset][:wave_len]
        wav = np.array(wav, np.float32, copy=True)
        if wave_len > fade_len:
            wav[-fade_len:] *= np.linspace(1.0, 0.0, fade_len, dtype=np.float32)
        out.append(wav)
        offset += n
    return out


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------


def wavernn_loss(logits: jax.Array, targets: jax.Array, mode: str = "RAW", bits: int = 10) -> jax.Array:
    """RAW: cross-entropy over mu-law classes (reference wavernn_train.py:82).
    MOL: discretized mixture-of-logistics NLL on float targets in [-1, 1]
    (reference wavernn_train.py:78-80, distribution.py:15-69)."""
    if mode == "MOL":
        from ..ops.distribution import discretized_mix_logistic_loss

        y = targets.astype(jnp.float32)
        if jnp.issubdtype(targets.dtype, jnp.integer):
            y = 2.0 * y / (2 ** bits - 1.0) - 1.0
        return discretized_mix_logistic_loss(logits, y)
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))


def num_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
