"""Ring attention: sequence-sharded (context-parallel) causal prefill.

Net-new relative to the reference (its sequence length is pinned to 2048,
SURVEY.md §5 "long-context: absent"): shard the sequence axis of q/k/v over
a mesh axis, keep each chip's k/v block resident, and rotate k/v blocks
around the ring with `lax.ppermute` while combining partial attention with
the online-softmax recurrence — the standard TPU context-parallel recipe
(collectives ride ICI; no chip ever holds more than S/n of the sequence).

Two per-block implementations:
  impl="flash" (default on TPU): the blockwise flash kernel computes each
    (q_local x k_block) partial WITH its softmax stats
    (kernels/flash_attention.py return_stats); the ring merges partials
    with the standard online-softmax combine. Causality needs no in-kernel
    masking off the diagonal: with the causal ring schedule, rotation step
    i sees a fully-visible block iff p_idx >= i, else a fully-masked one —
    gated by zeroing that block's stats (devices are bulk-synchronous
    through ppermute, so the masked branch costs no wall-clock).
  impl="jnp": plain einsum blocks — differentiable (the flash kernel has
    no VJP), used by sequence-parallel calibration's training step and as
    the CPU oracle.

Combine correctness: for each local q row, blocks arrive in ring order; the
running (m, l, acc) recurrence is order-invariant, so the result equals
full causal attention.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG = -1e30


def _block_update(q, k, v, q_pos, k_pos, sm_scale, m, l, acc, causal):
    """One (q_local x k_block) partial-attention update (plain jnp).

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


def _merge(m, l, acc, o_b, m_b, l_b):
    """Online-softmax merge of a normalized partial (o_b, m_b, l_b) into the
    running (m, l, acc). Stats shaped (..., Sq, 1); o_b (..., Sq, D)."""
    m_next = jnp.maximum(m, m_b)
    a1 = jnp.exp(m - m_next)
    a2 = jnp.exp(m_b - m_next) * l_b
    l_next = l * a1 + a2
    acc = acc * a1 + o_b.astype(jnp.float32) * a2
    return m_next, l_next, acc


def ring_attention_local(q_l, k_l, v_l, axis: str, n: int,
                         sm_scale: Optional[float] = None,
                         causal: bool = True, impl: str = "flash"):
    """Shard-LOCAL ring attention — must be called inside shard_map over a
    mesh with axis `axis` of size `n`. q_l/k_l/v_l: (B, H, S/n, D) local
    blocks (GQA callers repeat kv heads first). Returns (B, H, S/n, D)."""
    B, H, s_local, D = q_l.shape
    if sm_scale is None:
        sm_scale = float(D) ** -0.5
    p_idx = jax.lax.axis_index(axis)
    perm = [(j, (j + 1) % n) for j in range(n)]
    m = jnp.full((B, H, s_local, 1), _NEG, jnp.float32)
    l = jnp.zeros((B, H, s_local, 1), jnp.float32)
    acc = jnp.zeros(q_l.shape, jnp.float32)
    k_cur, v_cur = k_l, v_l

    if impl == "flash":
        from ..kernels.flash_attention import flash_attention

        for i in range(n):
            if i == 0:
                # the diagonal block: q/k share the global offset, plain
                # aligned causal masking inside the kernel
                o_b, m_b, l_b = flash_attention(
                    q_l, k_cur, v_cur, sm_scale=sm_scale, causal=causal,
                    return_stats=True)
            else:
                # rotation i holds block src = p_idx - i (mod n): fully
                # visible iff p_idx >= i, fully masked otherwise — compute
                # unmasked and gate the stats (the ring is bulk-synchronous,
                # so the gated branch costs no wall-clock)
                o_b, m_b, l_b = flash_attention(
                    q_l, k_cur, v_cur, sm_scale=sm_scale, causal=False,
                    return_stats=True)
                if causal:
                    gate = (p_idx >= i)
                    m_b = jnp.where(gate, m_b, _NEG)
                    l_b = jnp.where(gate, l_b, 0.0)
            m, l, acc = _merge(m, l, acc, o_b, m_b[..., None],
                               l_b[..., None])
            if i != n - 1:
                k_cur = jax.lax.ppermute(k_cur, axis, perm)
                v_cur = jax.lax.ppermute(v_cur, axis, perm)
    else:
        q_pos = p_idx * s_local + jnp.arange(s_local)
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


def ring_attention(q, k, v, mesh: Mesh, axis: str = "sp",
                   sm_scale: Optional[float] = None,
                   causal: bool = True,
                   impl: Optional[str] = None) -> jax.Array:
    """Causal attention with q/k/v sequence-sharded over `axis` of `mesh`.

    q, k, v: (B, H, S, D) GLOBAL arrays (sharded or to-be-sharded on dim 2).
    Returns (B, H, S, D) with the same sequence sharding. GQA callers repeat
    k/v heads first (the ring moves S/n-sized blocks; head repetition does
    not change the rotated payload size materially for prefill).

    impl: "flash" (default) | "jnp" (differentiable oracle).
    """
    from jax import shard_map

    B, H, S, D = q.shape
    n = mesh.shape[axis]
    assert S % n == 0, (S, n)
    if impl is None:
        impl = "flash"

    spec = P(None, None, axis, None)
    local_fn = functools.partial(
        ring_attention_local, axis=axis, n=n, sm_scale=sm_scale,
        causal=causal, impl=impl)
    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_vma=False)  # pallas inside
    q = jax.device_put(q, NamedSharding(mesh, spec))
    k = jax.device_put(k, NamedSharding(mesh, spec))
    v = jax.device_put(v, NamedSharding(mesh, spec))
    return fn(q, k, v)
