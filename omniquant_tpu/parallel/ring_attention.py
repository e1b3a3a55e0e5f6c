"""Ring attention: sequence-sharded (context-parallel) causal prefill.

Net-new relative to the reference (its sequence length is pinned to 2048,
SURVEY.md §5 "long-context: absent"): shard the sequence axis of q/k/v over
a mesh axis, keep each chip's k/v block resident, and rotate k/v blocks
around the ring with `lax.ppermute` while combining partial attention with
the online-softmax recurrence — the standard TPU context-parallel recipe
(collectives ride ICI; no chip ever holds more than S/n of the sequence).

The per-block compute is plain jnp (einsum + masked online update), so the
same code runs on a CPU test mesh and on TPU where XLA maps the block
matmuls onto the MXU; the blockwise flash kernel can be slotted into the
per-block step later without changing the ring protocol.

Combine correctness: for each local q row, blocks arrive in ring order; the
running (m, l, acc) recurrence is order-invariant (same algebra as
kernels/flash_attention.py), so the result equals full causal attention.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG = -1e30


def _block_update(q, k, v, q_pos, k_pos, sm_scale, m, l, acc, causal):
    """One (q_local x k_block) partial-attention update.

    q: (B, H, Sq, D); k/v: (B, H, Sk, D); q_pos (Sq,), k_pos (Sk,) global
    positions; m/l (B, H, Sq, 1) f32, acc (B, H, Sq, D) f32."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if causal:
        valid = k_pos[None, None, None, :] <= q_pos[None, None, :, None]
        s = jnp.where(valid, s, _NEG)
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m, m_curr)
    alpha = jnp.exp(m - m_next)
    p = jnp.exp(s - m_next)
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return m_next, l, acc


def ring_attention(q, k, v, mesh: Mesh, axis: str = "sp",
                   sm_scale: Optional[float] = None,
                   causal: bool = True) -> jax.Array:
    """Causal attention with q/k/v sequence-sharded over `axis` of `mesh`.

    q, k, v: (B, H, S, D) GLOBAL arrays (sharded or to-be-sharded on dim 2).
    Returns (B, H, S, D) with the same sequence sharding. GQA callers repeat
    k/v heads first (the ring moves S/n-sized blocks; head repetition does
    not change the rotated payload size materially for prefill).
    """
    from jax.experimental.shard_map import shard_map

    B, H, S, D = q.shape
    n = mesh.shape[axis]
    assert S % n == 0, (S, n)
    s_local = S // n
    if sm_scale is None:
        sm_scale = float(D) ** -0.5

    spec = P(None, None, axis, None)

    def local_fn(q_l, k_l, v_l):
        p_idx = jax.lax.axis_index(axis)
        q_pos = p_idx * s_local + jnp.arange(s_local)
        m = jnp.full((*q_l.shape[:3], 1), _NEG, jnp.float32)
        l = jnp.zeros((*q_l.shape[:3], 1), jnp.float32)
        acc = jnp.zeros(q_l.shape, jnp.float32)
        k_cur, v_cur = k_l, v_l
        perm = [(j, (j + 1) % n) for j in range(n)]
        for i in range(n):
            src = (p_idx - i) % n  # whose block we currently hold
            k_pos = src * s_local + jnp.arange(s_local)
            m, l, acc = _block_update(
                q_l, k_cur, v_cur, q_pos, k_pos, sm_scale, m, l, acc,
                causal)
            if i != n - 1:
                k_cur = jax.lax.ppermute(k_cur, axis, perm)
                v_cur = jax.lax.ppermute(v_cur, axis, perm)
        return (acc / jnp.maximum(l, 1e-30)).astype(q_l.dtype)

    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec)
    q = jax.device_put(q, NamedSharding(mesh, spec))
    k = jax.device_put(k, NamedSharding(mesh, spec))
    v = jax.device_put(v, NamedSharding(mesh, spec))
    return fn(q, k, v)
