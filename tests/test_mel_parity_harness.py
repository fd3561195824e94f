"""Self-validation of the mel-parity harness (tools/check_mel_parity.py).

The real gate needs the reference weight blobs (absent from the mount), so
the harness is proven here end-to-end on a synthetic stand-in: a synthetic
TF checkpoint is imported, 'reference mels' are produced by the INDEPENDENT
numpy oracle of the TF graph (tests/test_tf_import.py), and the harness
must report allclose PASS — then FAIL after a single weight is perturbed.
"""

from __future__ import annotations

import os

import numpy as np

from tests.test_tf_import import oracle_forward, synthetic_tf_vars, tiny_cfg
from tools.check_mel_parity import run as harness_run
from tools.import_tf_checkpoint import import_checkpoint
from tools.tf_bundle import write_bundle


def _setup(tmp_path, perturb: bool):
    import dataclasses

    import jax

    cfg = tiny_cfg()
    # full 191-symbol vocab so real G2P ids are in range for BOTH the
    # harness's encode and the oracle's embedding lookup
    cfg = dataclasses.replace(
        cfg, tacotron=dataclasses.replace(cfg.tacotron, vocab_size=191)
    )
    tf_vars = synthetic_tf_vars(cfg, seed=11)
    prefix = str(tmp_path / "syn.ckpt-1")
    write_bundle(prefix, tf_vars)

    rng = np.random.default_rng(2)
    gt_dir = tmp_path / "gt"
    ref_dir = tmp_path / "ref"
    os.makedirs(gt_dir), os.makedirs(ref_dir)
    rows = []
    T_in = 7
    for i in range(3):
        index = f"{i+1:06d}"
        # pinyin the tiny vocab can encode is irrelevant here: drive
        # teacher_forced_mel via harness internals with known ids is heavier,
        # so use a trivial sentence and let encode produce whatever ids —
        # BOTH sides (our forward and the oracle) see the same ids/mels.
        rows.append((index, "你好。"))
    from tacotronv2_wavernn_chinese_tpu.frontend import default_symbols, get_pyin

    syms = default_symbols()
    params, _, _ = import_checkpoint(cfg, tf_vars)
    params = jax.tree_util.tree_map(np.asarray, params)
    if perturb:
        params["dec_lstm1"]["w"] = params["dec_lstm1"]["w"] + 0.05

    for index, text in rows:
        pyin, _ = get_pyin(text)
        ids = np.asarray(syms.encode(pyin), np.int32)
        T_dec = 6
        gt = (rng.standard_normal((T_dec, 80)) * 0.5).astype(np.float32)
        np.save(gt_dir / f"mel-{index}.npy", gt)
        # 'reference' mel from the independent numpy oracle, on the SAME ids
        # the harness will compute (force that by monkeypatching encode? no:
        # recompute identically here)
        _, mel_o, _, _ = oracle_forward(
            tf_vars, cfg, ids[None, :], np.asarray([len(ids)], np.int32), gt[None]
        )
        np.save(ref_dir / f"mel-{index}.npy", mel_o[0])
    return cfg, params, rows, str(gt_dir), str(ref_dir)


def test_harness_passes_on_oracle_reference(tmp_path):
    cfg, params, rows, gt_dir, ref_dir = _setup(tmp_path, perturb=False)
    report = harness_run(cfg, params, rows, None, gt_dir, ref_dir, atol=1e-3,
                         log=lambda *a: None)
    assert report["passed"], report
    assert report["n_pass"] == 3
    assert report["mean_l1"] < 1e-4


def test_harness_fails_on_perturbed_weights(tmp_path):
    cfg, params, rows, gt_dir, ref_dir = _setup(tmp_path, perturb=True)
    report = harness_run(cfg, params, rows, None, gt_dir, ref_dir, atol=1e-3,
                         log=lambda *a: None)
    assert not report["passed"]
