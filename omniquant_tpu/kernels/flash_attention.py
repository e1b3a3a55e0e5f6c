"""Blockwise (flash) causal attention Pallas kernel for long-context prefill.

Net-new relative to the reference: its sequence length is pinned to 2048
(main.py:261) and its attention materializes the full (S, S) score matrix
(int_llama_layer.py:141-163). This kernel is the long-context story SURVEY.md
§5 calls for — online-softmax blockwise attention whose working set is
O(block_q * block_k), so prefill memory no longer scales with S².

Design:
  * grid (B, H, S/block_q, S/block_k), k-blocks innermost ("arbitrary"),
    batch/head/q-block parallel;
  * running max / sum / accumulator in VMEM scratch, all shaped
    (block_q, 128) so every update is a full-tile VPU op (head_dim is padded
    to the 128-lane width — zero K/V lanes contribute nothing to scores and
    the padded output lanes are dropped on return);
  * causal blocks strictly above the diagonal are skipped via pl.when —
    the inner loop does ~half the work of the dense version;
  * GQA handled in the BlockSpec index maps (kv head = h // n_rep), no
    materialized repeat_kv;
  * f32 score/softmax accumulation regardless of input dtype (matches the
    eval path's fp32 softmax, reference int_llama_layer.py:160).

ALiBi is supported via per-head slopes (falcon): the bias
slope[h] * key_pos * sm_scale is added to the scores inside the kernel —
the absolute-key-position formulation the serving engine uses (softmax
shift invariance makes it equivalent to the relative q-k distance form).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LANES = 128


def _flash_kernel(q_ref, k_ref, v_ref, slopes_ref, *rest,
                  sm_scale: float, block_q: int, block_k: int,
                  kv_len: int, causal: bool, has_alibi: bool, out_dtype,
                  with_stats: bool = False):
    if with_stats:
        out_ref, mo_ref, lo_ref, m_ref, l_ref, acc_ref = rest
    else:
        out_ref, m_ref, l_ref, acc_ref = rest
    hh = pl.program_id(1)
    iq = pl.program_id(2)
    jk = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(jk == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # skip blocks strictly above the causal diagonal
    should_run = (
        (jk * block_k <= iq * block_q + block_q - 1) if causal
        else jk >= 0)

    @pl.when(should_run)
    def _body():
        q = q_ref[0, 0]  # (block_q, d_pad)
        k = k_ref[0, 0]  # (block_k, d_pad)
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # (bq, bk)

        k_idx = jk * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if has_alibi:
            slope = slopes_ref[hh, 0]
            s = s + (slope * sm_scale) * k_idx.astype(jnp.float32)
        valid = k_idx < kv_len
        if causal:
            q_idx = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            valid = valid & (k_idx <= q_idx)
        s = jnp.where(valid, s, _NEG_INF)

        m_curr = jnp.broadcast_to(
            jnp.max(s, axis=1, keepdims=True), m_ref.shape)
        m_next = jnp.maximum(m_ref[:], m_curr)
        alpha = jnp.exp(m_ref[:] - m_next)  # (bq, 128)
        p = jnp.exp(s - m_next[:, :1])      # (bq, bk)
        l_ref[:] = l_ref[:] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_next

    @pl.when(jk == nk - 1)
    def _fin():
        # every lane of l holds the row sum; guard fully-masked rows
        # (q padding) against 0/0
        l = jnp.maximum(l_ref[:], 1e-30)
        out_ref[0, 0] = (acc_ref[:] / l).astype(out_dtype)
        if with_stats:
            # softmax stats for cross-block combining (ring attention):
            # every lane of the (block_q, 8) slabs carries the row value
            mo_ref[0, 0] = m_ref[:, :8]
            lo_ref[0, 0] = l_ref[:, :8]


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "causal", "kv_len", "block_q", "block_k",
                     "n_rep", "has_alibi", "with_stats", "interpret"),
)
def _flash_call(q, k, v, slopes, sm_scale, causal, kv_len, block_q, block_k,
                n_rep, has_alibi, with_stats, interpret):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    grid = (B, H, Sq // block_q, Skv // block_k)

    q_spec = pl.BlockSpec((1, 1, block_q, D),
                          lambda b, h, i, j: (b, h, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, block_k, D),
                           lambda b, h, i, j: (b, h // n_rep, j, 0),
                           memory_space=pltpu.VMEM)
    # the whole (H, 1) table unblocked in SMEM — blocked rank-1/(1,1) SMEM
    # specs trip Mosaic's tiling rules; the kernel indexes by program_id(1)
    slopes_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        kv_len=kv_len, causal=causal, has_alibi=has_alibi,
        out_dtype=q.dtype, with_stats=with_stats)
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    out_specs = [q_spec]
    if with_stats:
        # per-row softmax stats for cross-block combining (ring attention);
        # 8-lane slabs keep the HBM footprint negligible
        stat_spec = pl.BlockSpec((1, 1, block_q, 8),
                                 lambda b, h, i, j: (b, h, i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape += [jax.ShapeDtypeStruct((B, H, Sq, 8), jnp.float32)] * 2
        out_specs += [stat_spec, stat_spec]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, slopes_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running max
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running sum
            pltpu.VMEM((block_q, D), jnp.float32),       # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Skv * D // (2 if causal else 1),
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=B * H * Sq * Skv,
        ),
        interpret=interpret,
    )(q, k, v, slopes)


def flash_attention(q, k, v, sm_scale: Optional[float] = None,
                    causal: bool = True, block_q: int = 256,
                    block_k: int = 256,
                    alibi_slopes: Optional[jax.Array] = None,
                    return_stats: bool = False,
                    interpret: Optional[bool] = None):
    """Blockwise attention. q: (B, H, Sq, D); k, v: (B, Hkv, Skv, D) with
    H % Hkv == 0 (GQA/MQA). Returns (B, H, Sq, D) in q.dtype.

    `alibi_slopes` (H,) adds slope[h] * key_position * sm_scale to the
    scores (falcon's ALiBi, absolute-position form).

    `return_stats=True` additionally returns the per-row softmax stats
    (m, l) as (B, H, Sq) f32 — out is normalized by its own l; a caller
    combining partial attentions over key blocks (ring attention) rescales
    with the standard online-softmax merge.

    Sequences are zero-padded to block multiples and head_dim to the
    128-lane width internally; padded key positions are masked, padded
    output rows/lanes are dropped.
    """
    B, H, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    assert H % Hkv == 0, (H, Hkv)
    if sm_scale is None:
        sm_scale = float(D) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    block_q = min(block_q, max(8, 1 << (Sq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (Skv - 1).bit_length()))

    d_pad = max(_LANES, D) - D
    sq_pad = -Sq % block_q
    sk_pad = -Skv % block_k
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad), (0, d_pad)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad), (0, d_pad)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad), (0, d_pad)))

    has_alibi = alibi_slopes is not None
    slopes = (jnp.asarray(alibi_slopes, jnp.float32) if has_alibi
              else jnp.zeros((H,), jnp.float32)).reshape(H, 1)
    res = _flash_call(qp, kp, vp, slopes, sm_scale=float(sm_scale),
                      causal=causal, kv_len=Skv, block_q=block_q,
                      block_k=block_k, n_rep=H // Hkv, has_alibi=has_alibi,
                      with_stats=return_stats, interpret=interpret)
    if return_stats:
        out, m, l = res
        return (out[:, :, :Sq, :D], m[:, :, :Sq, 0], l[:, :, :Sq, 0])
    return res[0][:, :, :Sq, :D]


def flash_attention_reference(q, k, v, sm_scale=None, causal=True,
                              alibi_slopes=None):
    """Dense jnp oracle for validation."""
    B, H, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    if sm_scale is None:
        sm_scale = float(D) ** -0.5
    rep = H // Hkv
    k = jnp.repeat(k, rep, axis=1)
    v = jnp.repeat(v, rep, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if alibi_slopes is not None:
        ki_b = jnp.arange(Skv, dtype=jnp.float32)
        s = s + (jnp.asarray(alibi_slopes, jnp.float32)[None, :, None, None]
                 * sm_scale * ki_b[None, None, None, :])
    if causal:
        qi = jnp.arange(Sq)[:, None] + (Skv - Sq)
        ki = jnp.arange(Skv)[None, :]
        s = jnp.where(ki <= qi, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(
        q.dtype)
