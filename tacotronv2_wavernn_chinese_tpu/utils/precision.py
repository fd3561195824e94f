"""Mixed-precision training policy: bf16 weights, f32 master + state.

The reference trains both models in f32 throughout (TF 1.14 defaults /
torch CPU, reference tacotron_hparams.py, wavernn_train.py:46).  This
module provides the numerically safest mixed variant — bf16 weights with
an f32 master, no loss scaling needed — behind
``*_train.mixed_precision`` (default OFF).

Measured value on v5e: **a no-op at training batch sizes** — marginal
(dispatch-constant-cancelled) whole-step speedup 0.94x (tacotron B=32,
T=512) and 1.03x (wavernn B=32), BENCH_SUITE_r5 ``*_mp_marginal`` rows.
That measurement is itself the diagnosis: if the training scans re-read
the recurrent weights from HBM every step, halving weight bytes would buy
~1.3x (tacotron decoder weights ~25 MB x 512 steps ~= 12.8 GB/forward
~= 15 ms of the 31 ms step at HBM speed); the observed <=1.03x means XLA
already hoists the loop-invariant weights (the bf16->f32 upcast is
hoisted too), so there is no weight traffic to save, and the residual
step time sits in the serial recurrence + VPU/attention work the
trainer-kernel decomposition documented (BASELINE.md "Training-throughput
axis").  The knob stays for model-scaling headroom (larger-than-VMEM
weights) and as the numerics testbed the kernel bf16 modes validate
against.

Policy (``cast_params``):
* float weight leaves -> bf16 (XLA fuses the upcast into consuming dots, so
  HBM reads inside scan loops stay bf16);
* BatchNorm subtrees (keys starting with ``bn``) stay f32 — running stats
  are part of the f32 master state;
* the Tacotron ``attention`` subtree stays f32 — the forward-attention
  recursion multiplies probabilities with a 1e-10 floor and renormalizes
  (models/attention.py), where bf16's 8-bit mantissa visibly drifts, and its
  tensors are tiny ([B, T_in]) so there is nothing to win.

Gradients are taken w.r.t. the f32 master (the cast happens inside the loss
function, and the transpose of ``convert_element_type`` casts cotangents
back to f32), so Adam moments and updates are full precision.

``merge_master`` recombines after the forward pass: leaves the policy kept
f32 (BN stats — the only leaves a forward mutates) are taken from the
computed tree, cast (bf16) leaves from the f32 master, so the master never
round-trips through bf16.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _keep_f32(key: str, skip: frozenset[str]) -> bool:
    return key in skip or key.startswith("bn")


def cast_params(node: Any, dtype=jnp.bfloat16, skip: frozenset[str] = frozenset({"attention"})) -> Any:
    """Cast float weight leaves to ``dtype``; BN/``skip`` subtrees untouched."""
    if isinstance(node, dict):
        return {
            k: (v if _keep_f32(k, skip) else cast_params(v, dtype, skip))
            for k, v in node.items()
        }
    if isinstance(node, (list, tuple)):
        return type(node)(cast_params(v, dtype, skip) for v in node)
    if hasattr(node, "dtype") and jnp.issubdtype(node.dtype, jnp.floating):
        return node.astype(dtype)
    return node


def merge_master(master: Any, computed: Any) -> Any:
    """Rebuild the f32 master tree after a mixed-precision forward.

    ``computed`` is the tree the forward returned: bf16 copies of the cast
    weights (unchanged) plus f32 BN subtrees carrying updated running stats.
    Take same-dtype leaves (the f32 ones, i.e. everything the forward could
    have mutated) from ``computed`` and cast leaves from ``master`` — the
    master weights never pass through bf16.
    """
    return jax.tree_util.tree_map(
        lambda m, c: c if c.dtype == m.dtype else m, master, computed
    )


def cast_to_float32(tree: Any) -> Any:
    """Upcast any float leaves to f32 (loss-side safety net)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )
