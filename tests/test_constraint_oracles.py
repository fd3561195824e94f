"""Golden-oracle tests for the inference-time attention constraints.

The anti-repeat/dwell-limit machinery (reference forward_attention.py:176-215)
and the LSA synthesis window (location_sensitive_attention.py:201-214) are
branchy, data-dependent logic that our framework vectorizes
(models/attention.py anti_repeat_constrain / lsa_window_valid).  These tests
re-implement the reference's per-step logic as SCALAR per-example numpy
oracles — literal if/else transcriptions of the TF ops (tf.where on scalars,
tf.sequence_mask built index-by-index) — and drive both implementations over
hundreds of random and adversarial alignment trajectories, asserting exact
agreement of the windowed alignments, max_attentions, and pos_rec at every
step, including the dwell-limit, warm-up, zero-sum-window, and
past-end-of-input edge cases.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import attention as A

CFG = default_config().tacotron  # dwell_limit_first=5, dwell_limit_rest=10


# ---------------------------------------------------------------------------
# scalar oracle: forward_attention.py:176-215, one example at a time
# ---------------------------------------------------------------------------


def oracle_anti_repeat_step(align, prev_max, prev_pos_rec):
    """One constraint application for ONE example.  align is the forward
    recursion product (pre-renormalize); returns (align', max_att, pos_rec)
    with align' pre-renormalize, exactly as the reference block leaves it."""
    T = align.shape[0]
    max_att = int(np.argmax(align))

    # max_attentions = where(max <= prev, prev, prev+1)
    if max_att <= prev_max:
        max_att = prev_max
    else:
        max_att = prev_max + 1

    # short_mask = (prev_pos_rec < 5) & (2 < max_att) -> hold at prev
    if prev_pos_rec < 5 and 2 < max_att:
        max_att = prev_max

    # pos_rec update
    if max_att == prev_max:
        pos_rec = prev_pos_rec + 1
    else:
        pos_rec = 1

    # dwell limit: pos_rec < 10 keeps; else advance and reset
    if not (pos_rec < 10):
        max_att = max_att + 1
        pos_rec = 1

    # window [max-2, max+3): left = sequence_mask(max-2), right past max+3
    out = np.zeros_like(align)
    for t in range(T):
        left = t < (max_att - 2)  # tf.sequence_mask semantics (neg len -> none)
        right = not (t < (max_att + 3))
        if not (left or right):
            out[t] = align[t]

    # boost bin == clip(max, 0, T-1) to 2x the windowed sum (guarded)
    s = float(np.sum(out))
    if s < 1e-10:
        s = 1.0
    boost_pos = min(max(max_att, 0), T - 1)
    for t in range(T):
        left = t < boost_pos
        right = not (t < (max_att + 1))
        if not (left or right):
            out[t] = s * 2.0
    return out, max_att, pos_rec


def oracle_lsa_valid(prev_max, T, win, monotonic):
    """tf.sequence_mask-built validity for ONE example
    (location_sensitive_attention.py:201-214)."""
    valid = np.zeros((T,), bool)
    for t in range(T):
        if monotonic:
            key_mask = t < prev_max
            # reverse_masks = sequence_mask(T - win - prev)[::-1]
            rev = (T - 1 - t) < (T - win - prev_max)
        else:
            back = win // 2 + (1 if win % 2 != 0 else 0)
            key_mask = t < (prev_max - back)
            rev = (T - 1 - t) < (T - win // 2 - prev_max)
        valid[t] = not (key_mask or rev)
    return valid


# ---------------------------------------------------------------------------
# trajectory generators (adversarial shapes included)
# ---------------------------------------------------------------------------


def _trajectories(rng, T, steps):
    """Yield [steps, T] alignment sequences of varying character."""
    # 1. pure noise
    yield np.abs(rng.standard_normal((steps, T))).astype(np.float32) * 0.1
    # 2. stuck at one position (triggers warm-up + dwell limit)
    stuck = np.full((steps, T), 1e-6, np.float32)
    stuck[:, 3] = 1.0
    yield stuck
    # 3. runs off the end (max_att grows past T-1 -> zero-sum window + clip)
    ramp = np.full((steps, T), 1e-6, np.float32)
    for s in range(steps):
        ramp[s, min(2 * s, T - 1)] = 1.0
    yield ramp
    # 4. oscillating argmax (monotonicity forcing)
    osc = np.full((steps, T), 1e-6, np.float32)
    for s in range(steps):
        osc[s, (7 * s) % T] = 1.0
    yield osc
    # 5. near-zero everywhere (boost guard: att_sum < 1e-10)
    yield np.full((steps, T), 1e-13, np.float32)
    # 6. concentrated just outside the window
    far = np.full((steps, T), 1e-8, np.float32)
    far[:, T - 1] = 0.5
    yield far


def test_anti_repeat_matches_reference_oracle():
    rng = np.random.default_rng(42)
    cfg = dataclasses.replace(CFG, anti_repeat=True)
    T, steps, B = 23, 40, 1

    constrain = jax.jit(
        lambda a, m, pm, pr: A.anti_repeat_constrain(a, m, pm, pr, cfg)
    )

    n_checked = 0
    for traj in _trajectories(rng, T, steps):
        # trajectory state threads through steps exactly like the decoder
        prev_max, prev_pos = 0, 0
        for s in range(traj.shape[0]):
            align = traj[s][None, :]  # [1, T]
            max_in = np.argmax(align, axis=-1).astype(np.int32)
            got_a, got_m, got_p = constrain(
                jnp.asarray(align),
                jnp.asarray(max_in),
                jnp.asarray([prev_max], jnp.int32),
                jnp.asarray([prev_pos], jnp.int32),
            )
            want_a, want_m, want_p = oracle_anti_repeat_step(
                traj[s].copy(), prev_max, prev_pos
            )
            # rtol covers f32-vs-f64 summation-order differences in the
            # boosted bin (2x the windowed sum); the structure (which bins
            # are zeroed/boosted) must match exactly
            np.testing.assert_allclose(
                np.asarray(got_a)[0], want_a, atol=1e-9, rtol=1e-5,
                err_msg=f"step {s} prev_max={prev_max} prev_pos={prev_pos}",
            )
            assert np.array_equal(np.asarray(got_a)[0] == 0.0, want_a == 0.0)
            assert int(got_m[0]) == want_m, (s, prev_max, prev_pos)
            assert int(got_p[0]) == want_p, (s, prev_max, prev_pos)
            prev_max, prev_pos = want_m, want_p
            n_checked += 1
    assert n_checked == 6 * 40


def test_anti_repeat_batch_independence():
    """Vectorized path must treat batch rows independently."""
    rng = np.random.default_rng(1)
    cfg = dataclasses.replace(CFG, anti_repeat=True)
    T, B = 17, 8
    align = np.abs(rng.standard_normal((B, T))).astype(np.float32)
    prev_max = rng.integers(0, T + 3, B).astype(np.int32)  # incl. past-end
    prev_pos = rng.integers(0, 12, B).astype(np.int32)
    max_in = np.argmax(align, -1).astype(np.int32)
    got_a, got_m, got_p = A.anti_repeat_constrain(
        jnp.asarray(align), jnp.asarray(max_in), jnp.asarray(prev_max),
        jnp.asarray(prev_pos), cfg,
    )
    for b in range(B):
        want_a, want_m, want_p = oracle_anti_repeat_step(
            align[b].copy(), int(prev_max[b]), int(prev_pos[b])
        )
        np.testing.assert_allclose(np.asarray(got_a)[b], want_a, atol=1e-9, rtol=1e-5)
        assert int(got_m[b]) == want_m
        assert int(got_p[b]) == want_p


def test_lsa_window_matches_sequence_mask_oracle():
    T = 29
    for monotonic in (True, False):
        for win in (1, 2, 3, 4, 5, 8):
            cfg = dataclasses.replace(
                CFG,
                attention_mode="lsa",
                synthesis_constraint=True,
                synthesis_window=win,
                anti_repeat=monotonic,
            )
            prev = np.arange(-0, T + 4)  # includes edges and past-end
            got = np.asarray(A.lsa_window_valid(jnp.asarray(prev, jnp.int32), T, cfg))
            for i, p in enumerate(prev):
                want = oracle_lsa_valid(int(p), T, win, monotonic)
                assert np.array_equal(got[i], want), (monotonic, win, p)


def test_lsa_step_respects_window_end_to_end():
    """Full _lsa_step with constraint: alignment mass stays inside the
    oracle window whenever the window is non-empty."""
    import jax.random as jr

    cfg = dataclasses.replace(
        CFG,
        attention_mode="lsa",
        synthesis_constraint=True,
        synthesis_window=4,
        anti_repeat=True,
        encoder_lstm_units=5,
        attention_dim=4,
        attention_filters=3,
        attention_kernel=5,
        decoder_lstm_units=6,
    )
    B, T, V = 3, 19, 10
    key = jr.PRNGKey(0)
    params = A.init_params(key, cfg, V, cfg.decoder_lstm_units)
    state = A.init_state(cfg, B, T, V)
    state = state._replace(max_attention=jnp.asarray([0, 7, 16], jnp.int32))
    memory = jr.normal(jr.fold_in(key, 1), (B, T, V))
    keys = A.precompute_keys(params, cfg, memory)
    query = jr.normal(jr.fold_in(key, 2), (B, cfg.decoder_lstm_units))
    mask = jnp.ones((B, T))
    _, align, _ = A.step(params, cfg, query, state, keys, memory, mask, train=False)
    align = np.asarray(align)
    for b, p in enumerate([0, 7, 16]):
        want = oracle_lsa_valid(p, T, 4, True)
        outside = align[b][~want].sum()
        assert outside < 1e-6, (b, p, outside)
