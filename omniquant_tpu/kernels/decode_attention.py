"""Fused int8-KV decode attention (Pallas).

The serving engine stores the KV cache as per-token symmetric int8
(codes (B, n_kv, max_len, hd) + scales (B, n_kv, max_len)). The XLA decode
path dequantizes the visible window into bf16 before the two attention
matmuls, which materializes a 2x-sized copy of the cache in HBM every step
(int8 read + bf16 write + bf16 read ~ 5 bytes/element). This kernel reads
the int8 codes directly into VMEM and folds the per-token scales into the
score/probability matrices — the scales factor out of both dot products:

    score[h, j] = (q_h . k_j * ks_j) = (q_h . k_j) * ks_j
    out[h]      = sum_j p[h, j] * (v_j * vs_j) = sum_j (p[h, j] * vs_j) . v_j

so the codes never need elementwise dequantization. HBM traffic per step
drops to ~1 byte/element of the visible cache window (the roofline for an
int8 cache), plus the tiny q/out/scale tensors.

Replaces (TPU-native redesign): the reference has no serving attention at
all — its deployment path delegates to MLC-LLM/TVM compiled kernels
(README.md:138-170). Role equivalent: fused dequant+attention decode kernel.

Layout notes (see pallas_guide.md): hd=128 matches the lane width; kv_len
is bucketed to powers of two >= 64 by the engine, satisfying the int8
(32, 128) min tile; heads are grouped per grid cell so the per-cell k+v
blocks stay within a VMEM budget while keeping the grid coarse (grid cells
stream 2*Hg*kv_len*hd int8 bytes each, pipelined by Pallas).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_VMEM_CODE_BUDGET = 4 * 1024 * 1024  # bytes of k+v codes per grid cell


def _heads_per_cell(n_kv: int, kv_len: int, head_dim: int) -> int:
    """Largest divisor of n_kv whose k+v code block fits the VMEM budget."""
    per_head = 2 * kv_len * head_dim  # int8 bytes for one head's k+v window
    cap = max(1, _VMEM_CODE_BUDGET // per_head)
    hg = 1
    for d in range(1, n_kv + 1):
        if n_kv % d == 0 and d <= cap:
            hg = d
    return hg


def _kernel(len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
            *, score_scale: float):
    b = pl.program_id(0)
    length = len_ref[b]

    q = q_ref[0].astype(jnp.float32)           # (Hg, n_rep, hd)
    k = k_ref[0].astype(jnp.float32)           # (Hg, kv_len, hd)
    ks = ks_ref[0].astype(jnp.float32)         # (Hg, kv_len)
    hg, n_rep, _ = q.shape
    kv_len = k.shape[1]

    # scores[h, r, j] = (q[h, r] . k[h, j]) * ks[h, j] * score_scale
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)    # (Hg, n_rep, kv_len)
    scores = scores * (ks[:, None, :] * score_scale)

    # causal-from-length mask: position j visible iff j <= length (the
    # engine writes the current token's kv at index `length` pre-attention)
    pos = jax.lax.broadcasted_iota(jnp.int32, (hg, n_rep, kv_len), 2)
    scores = jnp.where(pos <= length, scores, _NEG)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0].astype(jnp.float32)           # (Hg, kv_len, hd)
    vs = vs_ref[0].astype(jnp.float32)         # (Hg, kv_len)
    pv = jax.lax.dot_general(
        p * vs[:, None, :], v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)    # (Hg, n_rep, hd)
    o_ref[0] = (pv / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kv_len", "score_scale", "out_dtype", "interpret"))
def decode_attention_int8(q, k_codes, k_scale, v_codes, v_scale, lengths,
                          kv_len: int, score_scale: float,
                          out_dtype=jnp.bfloat16, interpret=None):
    """Single-position decode attention over an int8 KV window.

    q:        (B, n_heads, hd)  n_heads = n_kv * n_rep, grouped-query order
    k_codes:  (B, n_kv, max_len, hd) int8 — the FULL cache buffer; only the
              leading kv_len window is DMA'd (BlockSpec bounds the read, so
              no XLA slice copy is materialized)
    k_scale:  (B, n_kv, max_len) f32 per-token scales
    v_codes / v_scale: same shapes
    lengths:  (B,) int32 — tokens already in the cache for each slot; the
              newly-written token at index lengths[b] is attended (<=).
    kv_len:   static attention window bound (bucketed by the caller)
    returns:  (B, n_heads, hd) out_dtype
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, n_heads, hd = q.shape
    _, n_kv, max_len, _ = k_codes.shape
    kv_len = min(kv_len, max_len)
    n_rep = n_heads // n_kv
    hg = _heads_per_cell(n_kv, kv_len, hd)

    q4 = q.reshape(B, n_kv, n_rep, hd)
    grid = (B, n_kv // hg)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hg, n_rep, hd), lambda b, g, _: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, kv_len, hd), lambda b, g, _: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, kv_len), lambda b, g, _: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, kv_len, hd), lambda b, g, _: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, kv_len), lambda b, g, _: (b, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hg, n_rep, hd), lambda b, g, _: (b, g, 0, 0),
            memory_space=pltpu.VMEM),
    )
    cost = pl.CostEstimate(
        flops=2 * 2 * B * n_heads * kv_len * hd,
        bytes_accessed=(2 * B * n_kv * kv_len * hd          # int8 codes
                        + 2 * 4 * B * n_kv * kv_len          # f32 scales
                        + 2 * 2 * B * n_heads * hd),         # q + out bf16
        transcendentals=B * n_heads * kv_len,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, score_scale=score_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv, n_rep, hd), out_dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(lengths.astype(jnp.int32), q4, k_codes, k_scale, v_codes, v_scale)
    return out.reshape(B, n_heads, hd)


def decode_attention_int8_reference(q, k_codes, k_scale, v_codes, v_scale,
                                    lengths, kv_len: int, score_scale: float,
                                    out_dtype=jnp.bfloat16):
    """jnp oracle: dequantize then attend (the engine's XLA path)."""
    B, n_heads, hd = q.shape
    _, n_kv, max_len, _ = k_codes.shape
    kv_len = min(kv_len, max_len)
    k_codes = k_codes[:, :, :kv_len]
    v_codes = v_codes[:, :, :kv_len]
    k_scale = k_scale[:, :, :kv_len]
    v_scale = v_scale[:, :, :kv_len]
    n_rep = n_heads // n_kv
    k = k_codes.astype(jnp.float32) * k_scale[..., None]
    v = v_codes.astype(jnp.float32) * v_scale[..., None]
    k = jnp.repeat(k, n_rep, axis=1)
    v = jnp.repeat(v, n_rep, axis=1)
    q4 = q.reshape(B, n_kv, n_rep, hd).reshape(B, n_heads, hd)
    scores = jnp.einsum(
        "bhd,bhkd->bhk", q4.astype(jnp.float32), k) * score_scale
    pos = jnp.arange(kv_len)
    mask = pos[None, None, :] <= lengths[:, None, None]
    scores = jnp.where(mask, scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhk,bhkd->bhd", probs, v)
    return out.astype(out_dtype)
