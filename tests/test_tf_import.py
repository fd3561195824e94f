"""Value-level validation of the TF checkpoint importer.

The mel-parity north star (BASELINE.md) needs tools/import_tf_checkpoint.py
to map every reference variable class — LSTM gate layout, conv kernels, BN
moving stats, the BahdanauAttention memory/query layers, the
forward-attention mu dense — onto our param tree with the right transforms.
The reference .data blob is absent from the mount, so this test builds a
SYNTHETIC TF checkpoint (tools/tf_bundle.write_bundle, the exact on-disk
bundle format), imports it, and checks our teacher-forced forward against an
independent numpy oracle that consumes the TF-layout weights with TF-graph
semantics (tf.nn.rnn_cell.LSTMCell + ZoneoutLSTM eval, tf.layers.conv1d
SAME, tf.layers.batch_normalization eval, BahdanauAttention internals per
reference tacotron/models/attention.py:66-231, decoder cell per
Architecture_wrappers.py:175-218).  Any wrong transpose or gate permutation
in the importer makes this fail.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tools.import_tf_checkpoint import P, import_checkpoint, load_tf_variables, tf_name_map
from tools.tf_bundle import read_bundle, write_bundle

# ---------------------------------------------------------------------------
# tiny config + synthetic TF-layout variables
# ---------------------------------------------------------------------------


def tiny_cfg():
    cfg = default_config()
    taco = dataclasses.replace(
        cfg.tacotron,
        vocab_size=13,
        embedding_dim=8,
        enc_conv_layers=2,
        enc_conv_kernel=5,
        enc_conv_channels=12,
        encoder_lstm_units=5,
        attention_dim=4,
        attention_filters=3,
        attention_kernel=5,
        prenet_layers=(9, 7),
        decoder_lstm_units=6,
        postnet_layers=2,
        postnet_kernel=5,
        postnet_channels=11,
        outputs_per_step=1,
        zoneout_rate=0.1,  # exercises the eval EMA path
        dropout_rate=0.0,  # determinism (reference prenet dropout is a knob here)
        max_iters=20,
    )
    return dataclasses.replace(cfg, tacotron=taco)


def synthetic_tf_vars(cfg, seed=0):
    """Random values for every name in tf_name_map, in TF-graph layout."""
    t = cfg.tacotron
    rng = np.random.default_rng(seed)
    M = 80
    V = 2 * t.encoder_lstm_units
    u = t.decoder_lstm_units

    def r(*shape):
        return (rng.standard_normal(shape) * 0.3).astype(np.float32)

    out = {f"{P}/inputs_embedding": r(t.vocab_size, t.embedding_dim)}

    def bn(scope, ch):
        out[f"{scope}/batch_normalization/gamma"] = (
            1.0 + 0.2 * rng.standard_normal(ch)
        ).astype(np.float32)
        out[f"{scope}/batch_normalization/beta"] = r(ch)
        out[f"{scope}/batch_normalization/moving_mean"] = r(ch)
        out[f"{scope}/batch_normalization/moving_variance"] = (
            0.5 + rng.random(ch)
        ).astype(np.float32)

    d = t.embedding_dim
    for i in range(t.enc_conv_layers):
        s = f"{P}/encoder_convolutions/conv_layer_{i+1}_encoder_convolutions"
        out[f"{s}/conv1d/kernel"] = r(t.enc_conv_kernel, d, t.enc_conv_channels)
        out[f"{s}/conv1d/bias"] = r(t.enc_conv_channels)
        bn(s, t.enc_conv_channels)
        d = t.enc_conv_channels
    for dr in ("fw", "bw"):
        s = f"{P}/encoder_LSTM/bidirectional_rnn/{dr}/encoder_{dr}_LSTM"
        out[f"{s}/kernel"] = r(t.enc_conv_channels + t.encoder_lstm_units, 4 * t.encoder_lstm_units)
        out[f"{s}/bias"] = r(4 * t.encoder_lstm_units)
    din = M
    for i, size in enumerate(t.prenet_layers):
        s = f"{P}/decoder/decoder_prenet/dense_{i+1}"
        out[f"{s}/kernel"] = r(din, size)
        out[f"{s}/bias"] = r(size)
        din = size
    out[f"{P}/decoder/decoder_LSTM/multi_rnn_cell/cell_0/decoder_LSTM_1/kernel"] = r(
        t.prenet_layers[-1] + V + u, 4 * u
    )
    out[f"{P}/decoder/decoder_LSTM/multi_rnn_cell/cell_0/decoder_LSTM_1/bias"] = r(4 * u)
    out[f"{P}/decoder/decoder_LSTM/multi_rnn_cell/cell_1/decoder_LSTM_2/kernel"] = r(
        2 * u, 4 * u
    )
    out[f"{P}/decoder/decoder_LSTM/multi_rnn_cell/cell_1/decoder_LSTM_2/bias"] = r(4 * u)
    a = f"{P}/decoder"
    out[f"{P}/memory_layer/kernel"] = r(V, t.attention_dim)
    out[f"{a}/Location_Sensitive_Attention/query_layer/kernel"] = r(u, t.attention_dim)
    out[f"{a}/Location_Sensitive_Attention/location_features_convolution/kernel"] = r(
        t.attention_kernel, 1, t.attention_filters
    )
    out[f"{a}/Location_Sensitive_Attention/location_features_convolution/bias"] = r(
        t.attention_filters
    )
    out[f"{a}/Location_Sensitive_Attention/location_features_layer/kernel"] = r(
        t.attention_filters, t.attention_dim
    )
    out[f"{a}/Location_Sensitive_Attention/attention_variable_projection"] = r(t.attention_dim)
    out[f"{a}/Location_Sensitive_Attention/attention_bias"] = r(t.attention_dim)
    out[f"{a}/dense/kernel"] = r(V + u, 1)
    out[f"{a}/dense/bias"] = r(1)
    out[f"{a}/linear_transform_projection/projection_linear_transform_projection/kernel"] = r(
        u + V, M * t.outputs_per_step
    )
    out[f"{a}/linear_transform_projection/projection_linear_transform_projection/bias"] = r(
        M * t.outputs_per_step
    )
    out[f"{a}/stop_token_projection/projection_stop_token_projection/kernel"] = r(
        u + V, t.outputs_per_step
    )
    out[f"{a}/stop_token_projection/projection_stop_token_projection/bias"] = r(
        t.outputs_per_step
    )
    d = M
    for i in range(t.postnet_layers):
        s = f"{P}/postnet_convolutions/conv_layer_{i+1}_postnet_convolutions"
        out[f"{s}/conv1d/kernel"] = r(t.postnet_kernel, d, t.postnet_channels)
        out[f"{s}/conv1d/bias"] = r(t.postnet_channels)
        bn(s, t.postnet_channels)
        d = t.postnet_channels
    out[f"{P}/postnet_projection/projection_postnet_projection/kernel"] = r(t.postnet_channels, M)
    out[f"{P}/postnet_projection/projection_postnet_projection/bias"] = r(M)
    out["global_step"] = np.asarray(206500, np.int64)
    return out


# ---------------------------------------------------------------------------
# numpy oracle of the reference TF graph (eval mode, teacher-forced)
# ---------------------------------------------------------------------------


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def _conv1d_same(x, w, b):
    """tf.layers.conv1d(padding='same', stride 1): x [B,T,C] w [k,in,out]."""
    k = w.shape[0]
    pad_l = (k - 1) // 2
    xp = np.pad(x, ((0, 0), (pad_l, k - 1 - pad_l), (0, 0)))
    T = x.shape[1]
    y = sum(xp[:, j : j + T, :] @ w[j] for j in range(k))
    return y + b


def _bn_eval(x, V, scope):
    """tf.layers.batch_normalization inference (eps 1e-3)."""
    g = V[f"{scope}/batch_normalization/gamma"]
    b = V[f"{scope}/batch_normalization/beta"]
    m = V[f"{scope}/batch_normalization/moving_mean"]
    v = V[f"{scope}/batch_normalization/moving_variance"]
    return (x - m) / np.sqrt(v + 1e-3) * g + b


def _zoneout_lstm_seq(xs, kernel, bias, zr):
    """tf dynamic_rnn over ZoneoutLSTMCell (eval): returns raw per-step
    outputs; the EMA-mixed state is carried (reference modules.py:114-142).
    xs [B, T, D] -> [B, T, units]."""
    B, T, _ = xs.shape
    units = kernel.shape[1] // 4
    c = np.zeros((B, units), np.float32)
    h = np.zeros((B, units), np.float32)
    outs = np.zeros((B, T, units), np.float32)
    for t in range(T):
        z = np.concatenate([xs[:, t], h], -1) @ kernel + bias
        i, j, f, o = np.split(z, 4, -1)
        c_new = _sig(f + 1.0) * c + _sig(i) * np.tanh(j)  # forget_bias 1.0
        h_new = _sig(o) * np.tanh(c_new)
        outs[:, t] = h_new
        c = (1 - zr) * c_new + zr * c
        h = (1 - zr) * h_new + zr * h
    return outs


def _zoneout_lstm_step(x, c, h, kernel, bias, zr):
    z = np.concatenate([x, h], -1) @ kernel + bias
    i, j, f, o = np.split(z, 4, -1)
    c_new = _sig(f + 1.0) * c + _sig(i) * np.tanh(j)
    h_new = _sig(o) * np.tanh(c_new)
    return (1 - zr) * c_new + zr * c, (1 - zr) * h_new + zr * h, h_new


def oracle_forward(V, cfg, inputs, input_lengths, mel_targets):
    """Reference TF graph, teacher-forced eval, in numpy from TF-layout vars."""
    t = cfg.tacotron
    zr = t.zoneout_rate
    B, T_in = inputs.shape
    M = 80
    mask = (np.arange(T_in)[None, :] < input_lengths[:, None]).astype(np.float32)

    # --- encoder ---
    x = V[f"{P}/inputs_embedding"][inputs]
    for i in range(t.enc_conv_layers):
        s = f"{P}/encoder_convolutions/conv_layer_{i+1}_encoder_convolutions"
        x = _conv1d_same(x, V[f"{s}/conv1d/kernel"], V[f"{s}/conv1d/bias"])
        x = np.maximum(x, 0.0)
        x = _bn_eval(x, V, s)
    fw = _zoneout_lstm_seq(
        x,
        V[f"{P}/encoder_LSTM/bidirectional_rnn/fw/encoder_fw_LSTM/kernel"],
        V[f"{P}/encoder_LSTM/bidirectional_rnn/fw/encoder_fw_LSTM/bias"],
        zr,
    )
    # backward direction: reverse WITHIN each sequence's valid length
    # (tf reverse_sequence semantics inside bidirectional_dynamic_rnn)
    x_rev = np.zeros_like(x)
    for b in range(B):
        L = input_lengths[b]
        x_rev[b, :L] = x[b, :L][::-1]
        x_rev[b, L:] = x[b, L:]
    bw_rev = _zoneout_lstm_seq(
        x_rev,
        V[f"{P}/encoder_LSTM/bidirectional_rnn/bw/encoder_bw_LSTM/kernel"],
        V[f"{P}/encoder_LSTM/bidirectional_rnn/bw/encoder_bw_LSTM/bias"],
        zr,
    )
    bw = np.zeros_like(bw_rev)
    for b in range(B):
        L = input_lengths[b]
        bw[b, :L] = bw_rev[b, :L][::-1]
    memory = np.concatenate([fw, bw], -1) * mask[..., None]

    # --- decoder (teacher forced, r=1) ---
    a = f"{P}/decoder"
    keys = memory @ V[f"{P}/memory_layer/kernel"]
    u = t.decoder_lstm_units
    Vd = memory.shape[-1]
    T_dec = mel_targets.shape[1]
    c1 = np.zeros((B, u), np.float32)
    h1 = np.zeros((B, u), np.float32)
    c2 = np.zeros((B, u), np.float32)
    h2 = np.zeros((B, u), np.float32)
    context = np.zeros((B, Vd), np.float32)
    one_hot = np.zeros((B, T_in), np.float32)
    one_hot[:, 0] = 1.0
    alpha = one_hot.copy()
    cum = one_hot.copy()
    mu = np.full((B, 1), 0.5, np.float32)
    prev = np.zeros((B, M), np.float32)
    frames_all, stops_all, aligns_all = [], [], []
    for step in range(T_dec):
        # prenet (dropout_rate 0 in this test)
        p = prev
        for i in range(len(t.prenet_layers)):
            s = f"{P}/decoder/decoder_prenet/dense_{i+1}"
            p = np.maximum(p @ V[f"{s}/kernel"] + V[f"{s}/bias"], 0.0)
        lstm_in = np.concatenate([p, context], -1)
        c1, h1, out1 = _zoneout_lstm_step(
            lstm_in, c1, h1,
            V[f"{a}/decoder_LSTM/multi_rnn_cell/cell_0/decoder_LSTM_1/kernel"],
            V[f"{a}/decoder_LSTM/multi_rnn_cell/cell_0/decoder_LSTM_1/bias"], zr,
        )
        c2, h2, out2 = _zoneout_lstm_step(
            out1, c2, h2,
            V[f"{a}/decoder_LSTM/multi_rnn_cell/cell_1/decoder_LSTM_2/kernel"],
            V[f"{a}/decoder_LSTM/multi_rnn_cell/cell_1/decoder_LSTM_2/bias"], zr,
        )
        query = out2
        # location-sensitive energy (reference attention.py:9-41,131-147)
        s = f"{a}/Location_Sensitive_Attention"
        pq = query @ V[f"{s}/query_layer/kernel"]
        f = _conv1d_same(
            cum[..., None],
            V[f"{s}/location_features_convolution/kernel"],
            V[f"{s}/location_features_convolution/bias"],
        )
        loc = f @ V[f"{s}/location_features_layer/kernel"]
        energy = np.sum(
            V[f"{s}/attention_variable_projection"]
            * np.tanh(keys + pq[:, None, :] + loc + V[f"{s}/attention_bias"]),
            -1,
        )
        energy = np.where(mask > 0, energy, -1e9)
        e = np.exp(energy - energy.max(-1, keepdims=True))
        align_sm = e / e.sum(-1, keepdims=True)
        cum = cum + align_sm
        shift_alpha = np.concatenate([np.zeros((B, 1), np.float32), alpha[:, :-1]], -1)
        align = ((1 - mu) * alpha + mu * shift_alpha + 1e-10) * align_sm
        align = align / align.sum(-1, keepdims=True)
        context = np.einsum("bt,btv->bv", align, memory)
        mu = _sig(
            np.concatenate([context, query], -1) @ V[f"{a}/dense/kernel"]
            + V[f"{a}/dense/bias"]
        )
        alpha = align
        proj_in = np.concatenate([query, context], -1)
        frames = (
            proj_in
            @ V[f"{a}/linear_transform_projection/projection_linear_transform_projection/kernel"]
            + V[f"{a}/linear_transform_projection/projection_linear_transform_projection/bias"]
        )
        stop = (
            proj_in
            @ V[f"{a}/stop_token_projection/projection_stop_token_projection/kernel"]
            + V[f"{a}/stop_token_projection/projection_stop_token_projection/bias"]
        )
        frames_all.append(frames)
        stops_all.append(stop[:, 0])
        aligns_all.append(align)
        prev = mel_targets[:, step]  # teacher forcing (helpers.py:142)

    decoder_out = np.stack(frames_all, 1)
    stops = np.stack(stops_all, 1)
    aligns = np.stack(aligns_all, 1)
    decoder_out = np.clip(decoder_out, -4.0 - t.lower_bound_decay, 4.0)

    # --- postnet ---
    x = decoder_out
    for i in range(t.postnet_layers):
        s = f"{P}/postnet_convolutions/conv_layer_{i+1}_postnet_convolutions"
        x = _conv1d_same(x, V[f"{s}/conv1d/kernel"], V[f"{s}/conv1d/bias"])
        if i < t.postnet_layers - 1:
            x = np.tanh(x)
        x = _bn_eval(x, V, s)
    residual = (
        x @ V[f"{P}/postnet_projection/projection_postnet_projection/kernel"]
        + V[f"{P}/postnet_projection/projection_postnet_projection/bias"]
    )
    mel_out = np.clip(decoder_out + residual, -4.0 - t.lower_bound_decay, 4.0)
    return decoder_out, mel_out, stops, aligns


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_bundle_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a/kernel": rng.standard_normal((31, 1, 32)).astype(np.float32),
        "a/bias": rng.standard_normal((32,)).astype(np.float32),
        "global_step": np.asarray(206500, np.int64),
        "z/int32": np.arange(6, dtype=np.int32).reshape(2, 3),
    }
    prefix = str(tmp_path / "ckpt-1")
    write_bundle(prefix, tensors)
    back = read_bundle(prefix)
    assert sorted(back) == sorted(tensors)
    for k, v in tensors.items():
        assert back[k].dtype == v.dtype and back[k].shape == v.shape
        assert np.array_equal(back[k], v), k


def test_bundle_detects_corruption(tmp_path):
    prefix = str(tmp_path / "ckpt-2")
    write_bundle(prefix, {"w": np.ones((8, 8), np.float32)})
    path = f"{prefix}.data-00000-of-00001"
    raw = bytearray(open(path, "rb").read())
    raw[7] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="crc"):
        read_bundle(prefix)
    # index corruption too
    write_bundle(prefix, {"w": np.ones((8, 8), np.float32)})
    ipath = f"{prefix}.index"
    raw = bytearray(open(ipath, "rb").read())
    raw[3] ^= 0xFF
    open(ipath, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        read_bundle(prefix)


def test_native_crc32c_matches_python():
    """native/libcrc32c.so (slice-by-8) must agree with the pure-Python
    table-driven fallback, including incremental extends (the block-trailer
    path feeds the crc of the data back in for the type byte)."""
    import tools.tf_bundle as B

    data = np.random.default_rng(3).integers(0, 256, 50_000, dtype=np.uint8).tobytes()
    native_lib = B._native_crc()
    if native_lib is None:
        pytest.skip("native crc32c unavailable (no compiler?)")
    native = B.crc32c(data)
    c_inc = B.crc32c(data[:12345])
    c_inc = B.crc32c(data[12345:], c_inc)
    assert c_inc == native
    saved, B._NATIVE_CRC = B._NATIVE_CRC, False
    try:
        # pure-Python path: one-shot AND incremental (nonzero crc seed,
        # the block-trailer extend pattern) must match the native result
        assert B.crc32c(data) == native
        py_inc = B.crc32c(data[:777])
        py_inc = B.crc32c(data[777:], py_inc)
        assert py_inc == native
        assert B.crc32c(data[:4096]) == native_lib.crc32c_update(0, data[:4096], 4096)
    finally:
        B._NATIVE_CRC = saved


def test_bundle_cross_validates_against_real_tensorflow(tmp_path):
    """Gold-standard format check (runs when tensorflow is installed):
    tf.train.load_checkpoint reads OUR bundles bit-exactly, and we read a
    bundle written by TF's own Saver bit-exactly.

    The TF side runs in a SUBPROCESS: importing tensorflow beside jax/torch
    in the pytest process segfaults at interpreter teardown (exit 139)."""
    import importlib.util
    import subprocess
    import sys

    # NOT importorskip: that would import tensorflow into the pytest
    # process, which is exactly the teardown-segfault this test avoids
    if importlib.util.find_spec("tensorflow") is None:
        pytest.skip("tensorflow not installed")

    rng = np.random.default_rng(0)
    tensors = {
        "Tacotron_model/inference/inputs_embedding": rng.standard_normal(
            (191, 128)
        ).astype(np.float32),
        "a/kernel": rng.standard_normal((31, 1, 32)).astype(np.float32),
        "global_step": np.asarray(206500, np.int64),
        "ints": np.arange(6, dtype=np.int32).reshape(2, 3),
    }
    np.savez(tmp_path / "tensors.npz", **tensors)
    ours = str(tmp_path / "ours.ckpt-1")
    write_bundle(ours, tensors)

    script = f"""
import numpy as np
import tensorflow as tf
tensors = dict(np.load({str(tmp_path / 'tensors.npz')!r}))
reader = tf.train.load_checkpoint({ours!r})
assert sorted(reader.get_variable_to_shape_map()) == sorted(tensors)
for n, v in tensors.items():
    got = reader.get_tensor(n)
    assert got.dtype == v.dtype and got.shape == v.shape, n
    assert np.array_equal(got, v), n
with tf.Graph().as_default():
    vs = {{n: tf.Variable(v, name=n) for n, v in tensors.items()}}
    saver = tf.compat.v1.train.Saver(var_list=vs)
    with tf.compat.v1.Session() as sess:
        sess.run(tf.compat.v1.global_variables_initializer())
        saver.save(sess, {str(tmp_path / 'tfw.ckpt')!r}, write_meta_graph=False)
print("TF_SIDE_OK")
"""
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, env=env,
    )
    assert "TF_SIDE_OK" in proc.stdout, proc.stderr[-2000:]

    back = read_bundle(str(tmp_path / "tfw.ckpt"))
    for n, v in tensors.items():
        assert np.array_equal(back[n], v), n


REF_INDEX = "/root/reference/logs-Tacotron-2/taco_pretrained/tacotron_model.ckpt-206500.index"


def test_real_reference_index_crc_and_entries():
    """The shipped .index parses with crc verification ON — validates the
    table walk + crc32c implementation against TF's own writer."""
    import os

    if not os.path.exists(REF_INDEX):
        pytest.skip("reference mount absent")
    from tools.tf_bundle import _read_table, decode_bundle_entry

    kv = _read_table(open(REF_INDEX, "rb").read(), verify=True)
    entries = {k.decode(): decode_bundle_entry(v) for k, v in kv if k}
    emb = entries[f"{P}/inputs_embedding"]
    assert emb["shape"] == [191, 128] and emb["dtype"] == 1
    assert all(e["crc"] is not None for e in entries.values())


def test_import_value_parity_vs_tf_oracle(tmp_path):
    """Synthetic TF checkpoint -> bundle round-trip -> importer -> our
    forward == independent numpy oracle of the TF graph.  Fails if any
    importer transform (gate order, conv/dense layout, BN stat mapping,
    attention kernels) is wrong."""
    import jax

    cfg = tiny_cfg()
    tf_vars = synthetic_tf_vars(cfg, seed=3)
    prefix = str(tmp_path / "tacotron_model.ckpt-100")
    write_bundle(prefix, tf_vars)

    loaded = load_tf_variables(prefix, None)  # exercises the native reader
    params, unmatched, missing = import_checkpoint(cfg, loaded)
    assert missing == []
    assert unmatched == []

    rng = np.random.default_rng(7)
    B, T_in, T_dec, M = 2, 7, 5, 80
    inputs = rng.integers(0, cfg.tacotron.vocab_size, (B, T_in)).astype(np.int32)
    input_lengths = np.asarray([7, 5], np.int32)
    inputs[1, 5:] = 0
    mel_targets = (rng.standard_normal((B, T_dec, M)) * 0.5).astype(np.float32)

    from tacotronv2_wavernn_chinese_tpu.models import tacotron as T

    out, _ = T.forward_teacher_forced(
        jax.tree_util.tree_map(np.asarray, params),
        cfg.tacotron,
        inputs,
        input_lengths,
        mel_targets,
        train=False,
        rng=jax.random.PRNGKey(0),
    )
    dec_o, mel_o, stops_o, aligns_o = oracle_forward(
        tf_vars, cfg, inputs, input_lengths, mel_targets
    )
    np.testing.assert_allclose(np.asarray(out.decoder_output), dec_o, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.mel_outputs), mel_o, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.stop_logits), stops_o, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.alignments), aligns_o, atol=2e-5, rtol=1e-4)


def test_import_catches_gate_permutation(tmp_path):
    """A deliberately gate-permuted LSTM kernel must NOT pass the oracle —
    guards against the parity test being insensitive."""
    import jax

    cfg = tiny_cfg()
    tf_vars = synthetic_tf_vars(cfg, seed=3)
    name = f"{P}/decoder/decoder_LSTM/multi_rnn_cell/cell_0/decoder_LSTM_1/kernel"
    k = tf_vars[name]
    u = cfg.tacotron.decoder_lstm_units
    # swap (i, j) gate blocks, as a wrong importer might
    perm = np.concatenate([k[:, u : 2 * u], k[:, :u], k[:, 2 * u :]], axis=1)
    bad_vars = dict(tf_vars, **{name: perm})
    prefix = str(tmp_path / "bad.ckpt-1")
    write_bundle(prefix, bad_vars)
    params, _, _ = import_checkpoint(cfg, load_tf_variables(prefix, None))

    rng = np.random.default_rng(7)
    B, T_in, T_dec, M = 2, 7, 5, 80
    inputs = rng.integers(0, cfg.tacotron.vocab_size, (B, T_in)).astype(np.int32)
    input_lengths = np.asarray([7, 5], np.int32)
    mel_targets = (rng.standard_normal((B, T_dec, M)) * 0.5).astype(np.float32)

    from tacotronv2_wavernn_chinese_tpu.models import tacotron as T

    out, _ = T.forward_teacher_forced(
        jax.tree_util.tree_map(np.asarray, params), cfg.tacotron,
        inputs, input_lengths, mel_targets, train=False, rng=jax.random.PRNGKey(0),
    )
    dec_o, _, _, _ = oracle_forward(tf_vars, cfg, inputs, input_lengths, mel_targets)
    assert not np.allclose(np.asarray(out.decoder_output), dec_o, atol=1e-3)
