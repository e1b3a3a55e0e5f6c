"""Learnable Equivalent Transformation (LET) algebra — pure functions.

TPU-native re-implementation of the reference smoothing math
(reference: models/transformation.py:24-114), reformulated as pure functions
that map a pytree of weights -> a pytree of transformed weights. There is no
temporary/inplace module-state split: the same function produces the
"temporary" weights during calibration (differentiably) and the folded weights
at export time — callers simply stop gradients / materialize afterwards.

The equivalence identities (Y unchanged in exact arithmetic):
  ln->fcs   : ln_w' = ln_w / s ; ln_b' = (ln_b - d) / s (bias materialized on
              RMSNorm when absent);  fc_w' = fc_w * s (per input column);
              fc_b' = fc_b + fc_w @ d
  fc1->fc2  : fc1_w' = fc1_w / s (per output row); fc1_b' = (fc1_b - d) / s;
              fc2_w' = fc2_w * s (per input column); fc2_b' = fc2_b + fc2_w @ d
  q<->k     : q_w' = q_w / s (rows); q_b' = q_b / s; k_w' = k_w * s; k_b' = k_b * s

All linear weights use torch convention (out_features, in_features);
y = x @ W.T + b.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


@jax.custom_vjp
def truncate_number(x: jax.Array, threshold: float = 1e-2) -> jax.Array:
    """Clamp |x| >= threshold with straight-through gradient.

    Matches reference TruncateFunction (models/transformation.py:5-20):
    values with |x| < threshold become sign(x)*threshold (note sign(0)=0,
    so exact zeros stay zero), gradient is identity.
    """
    return _truncate_fwd_value(x, threshold)


def _truncate_fwd_value(x, threshold):
    return jnp.where(jnp.abs(x) < threshold, jnp.sign(x) * threshold, x)


def _truncate_fwd(x, threshold):
    return _truncate_fwd_value(x, threshold), None


def _truncate_bwd(_, g):
    return (g, None)


truncate_number.defvjp(_truncate_fwd, _truncate_bwd)


def smooth_ln_fcs(ln: dict, fcs: list, scales: jax.Array, shifts: jax.Array):
    """Migrate outliers from a norm's output into following linears.

    `ln` is {'weight': (h,), optional 'bias': (h,)}; each fc is
    {'weight': (out, h), optional 'bias': (out,)}. Returns (ln', [fc', ...]).
    A bias is materialized on the norm if it had none (the folded shift lives
    there — reference models/transformation.py:78-80 registers a bias buffer
    on RMSNorm for exactly this reason).
    """
    ln_bias = ln.get("bias")
    new_ln = dict(ln)
    if ln_bias is not None:
        new_ln["bias"] = (ln_bias - shifts) / scales
    else:
        new_ln["bias"] = (-shifts) / scales
    new_ln["weight"] = ln["weight"] / scales

    new_fcs = []
    for fc in fcs:
        new_fc = dict(fc)
        w = fc["weight"]
        b = fc.get("bias")
        # bias update uses the ORIGINAL weight (reference :37-40 computes
        # fc.weight @ shifts before scaling the weight)
        delta = w @ shifts
        new_fc["bias"] = b + delta if b is not None else delta
        new_fc["weight"] = w * scales[None, :]
        new_fcs.append(new_fc)
    return new_ln, new_fcs


def smooth_fc_fc(fc1: dict, fc2: dict, scales: jax.Array,
                 shifts: Optional[jax.Array] = None):
    """v_proj -> o_proj smoothing (reference models/transformation.py:44-60).

    fc1's output channels are divided by `scales`, fc2's input columns
    multiplied. MHA layout (fc1.out == fc2.in); see smooth_fc_fc_gqa for GQA.
    """
    if shifts is None:
        shifts = jnp.zeros_like(scales)
    new_fc1 = dict(fc1)
    b1 = fc1.get("bias")
    if b1 is None:
        b1 = jnp.zeros((fc1["weight"].shape[0],), dtype=fc1["weight"].dtype)
    new_fc1["bias"] = (b1 - shifts) / scales
    new_fc1["weight"] = fc1["weight"] / scales[:, None]

    new_fc2 = dict(fc2)
    w2 = fc2["weight"]
    b2 = fc2.get("bias")
    delta = w2 @ shifts
    new_fc2["bias"] = b2 + delta if b2 is not None else delta
    new_fc2["weight"] = w2 * scales[None, :]
    return new_fc1, new_fc2


def smooth_fc_fc_gqa(fc1: dict, fc2: dict, scales: jax.Array,
                     shifts: Optional[jax.Array], head_dim: int, n_rep: int):
    """GQA-aware v_proj -> o_proj smoothing. scales: (n_kv_heads*head_dim,)."""
    if n_rep == 1:
        return smooth_fc_fc(fc1, fc2, scales, shifts)
    if shifts is None:
        shifts = jnp.zeros_like(scales)
    new_fc1 = dict(fc1)
    b1 = fc1.get("bias")
    if b1 is None:
        b1 = jnp.zeros((fc1["weight"].shape[0],), dtype=fc1["weight"].dtype)
    new_fc1["bias"] = (b1 - shifts) / scales
    new_fc1["weight"] = fc1["weight"] / scales[:, None]

    n_kv = scales.shape[0] // head_dim
    rep = lambda v: jnp.repeat(
        v.reshape(n_kv, 1, head_dim), n_rep, axis=1
    ).reshape(-1)
    scales2, shifts2 = rep(scales), rep(shifts)
    new_fc2 = dict(fc2)
    w2 = fc2["weight"]
    b2 = fc2.get("bias")
    delta = w2 @ shifts2
    new_fc2["bias"] = b2 + delta if b2 is not None else delta
    new_fc2["weight"] = w2 * scales2[None, :]
    return new_fc1, new_fc2


def smooth_q_k(q_proj: dict, k_proj: dict, scales: jax.Array,
               head_dim: int = 0, n_rep: int = 1):
    """q<->k smoothing (reference models/transformation.py:63-69).

    Divides q rows, multiplies k rows; q @ k^T per head is invariant.
    `scales` has length k_out (= n_kv_heads * head_dim). For GQA (n_rep > 1)
    each kv head's scale is repeated across its n_rep query heads so the
    per-head dot products stay invariant (the reference only handles MHA,
    where this reduces to its math with scales of length q_out).
    """
    if n_rep == 1:
        q_scales = scales
    else:
        n_kv = scales.shape[0] // head_dim
        q_scales = jnp.repeat(
            scales.reshape(n_kv, 1, head_dim), n_rep, axis=1
        ).reshape(-1)
    new_q, new_k = dict(q_proj), dict(k_proj)
    new_q["weight"] = q_proj["weight"] / q_scales[:, None]
    new_k["weight"] = k_proj["weight"] * scales[:, None]
    if q_proj.get("bias") is not None:
        new_q["bias"] = q_proj["bias"] / q_scales
    if k_proj.get("bias") is not None:
        new_k["bias"] = k_proj["bias"] * scales
    return new_q, new_k
