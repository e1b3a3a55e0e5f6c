"""Fused int8-KV decode attention (Pallas, flash-decode style).

The serving engine stores the KV cache as per-token symmetric int8
(codes (B, n_kv, max_len, hd) + scale planes). The XLA decode path
dequantizes the visible window into bf16 before the two attention matmuls,
which materializes a 2x-sized copy of the cache in HBM every step (int8
read + bf16 write + bf16 read ~ 5 bytes/element). This kernel reads the
int8 codes directly into VMEM and folds the per-token scales into the
score/probability matrices — the scales factor out of both dot products:

    score[h, j] = (q_h . k_j * ks_j) = (q_h . k_j) * ks_j
    out[h]      = sum_j p[h, j] * (v_j * vs_j) = sum_j (p[h, j] * vs_j) . v_j

so the codes never need elementwise dequantization. HBM traffic per step
drops to ~1 byte/element of the visible cache window (the roofline for an
int8 cache), plus the tiny q/out/scale tensors.

The kv axis is CHUNKED (grid dim, online softmax running (m, l, acc) in
VMEM scratch, same recurrence as flash_attention.py) so the per-cell VMEM
footprint is bounded at 2*hg*chunk*hd int8 bytes regardless of window
length — windows >= 4k lower fine where the old whole-window block spec
ran out of legal shapes.

Measured end-to-end on one v5e chip (7B geometry, packed W4g128 weights,
engine step() wall time including ~30 ms tunnel dispatch overhead):

    window (bucket)   batch   bf16-XLA   int8-XLA   int8-pallas
    256               32      45.9 ms    53.7 ms    48.2 ms
    2048              8       50.6 ms    45.6 ms    62.2 ms(XLA)

i.e. with an int8 cache this kernel always beats XLA dequant+einsum, and
beats the bf16 cache end-to-end from ~1-2k-token windows up (while halving
cache HBM). The engine therefore defaults attn_kernel=True whenever
kv_dtype="int8" (serving/engine.py).

Replaces (TPU-native redesign): the reference has no serving attention at
all — its deployment path delegates to MLC-LLM/TVM compiled kernels
(README.md:138-170). Role equivalent: fused dequant+attention decode kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_LANES = 128
_MAX_CHUNK = 1024


def _head_group(n_kv: int, chunk: int = 1024, hd: int = 128) -> int:
    """Heads per grid cell: Mosaic's block rule needs hg % 8 == 0 or
    hg == n_kv. Prefer the LARGEST group whose k+v chunk blocks fit a
    ~8 MB VMEM budget — more heads per cell amortizes the per-cell grid
    overhead that dominates short-window decode (measured: hg 8 -> 32 at
    kv 256 cut the int8 path's gap to the bf16-XLA path)."""
    # the grid pipeline DOUBLE-BUFFERS the k/v chunk blocks, so the
    # single-buffer budget must stay under ~half of the 16 MB scoped VMEM
    # (hg=32 at chunk 1024 compiled to 16.55 MB and OOM'd)
    budget = 4 * 1024 * 1024
    if n_kv <= 8 or n_kv % 8 != 0:
        return n_kv
    hg = n_kv
    while hg > 8 and (hg % 8 != 0 or 2 * hg * chunk * hd > budget):
        hg //= 2
    return hg if hg % 8 == 0 or hg == n_kv else 8


def _kernel(len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, *rest,
            score_scale: float, chunk: int, stats: bool = False,
            ring_n: int = -1):
    if ring_n >= 0:
        rk_ref, rks_ref, rv_ref, rvs_ref = rest[:4]
        rest = rest[4:]
    o_ref = rest[0]
    rest = rest[1:]
    if stats:
        om_ref, ol_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    c = pl.program_id(2)
    nc = pl.num_programs(2)
    length = len_ref[b]

    @pl.when(c == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # skip chunks fully beyond the live window (position `length` is the
    # newly written token and is attended: valid iff pos <= length)
    @pl.when(c * chunk <= length)
    def _body():
        q = q_ref[0].astype(jnp.float32)       # (hg, n_rep, hd)
        k = k_ref[0].astype(jnp.float32)       # (hg, chunk, hd)
        ks = ks_ref[0].astype(jnp.float32)     # (hg, chunk)
        hg, n_rep, _ = q.shape

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (hg, n_rep, chunk)
        s = s * (ks[:, None, :] * score_scale)
        pos = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (hg, n_rep, chunk), 2)
        s = jnp.where(pos <= length, s, _NEG)

        m_curr = jnp.broadcast_to(
            jnp.max(s, axis=-1, keepdims=True), m_ref.shape)
        m_next = jnp.maximum(m_ref[:], m_curr)
        alpha = jnp.exp(m_ref[:] - m_next)          # (hg, n_rep, 128)
        p = jnp.exp(s - m_next[:, :, :1])           # (hg, n_rep, chunk)
        l_ref[:] = l_ref[:] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
        vs = vs_ref[0].astype(jnp.float32)          # (hg, chunk)
        v = v_ref[0].astype(jnp.float32)            # (hg, chunk, hd)
        pv = jax.lax.dot_general(
            p * vs[:, None, :], v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # (hg, n_rep, hd)
        acc_ref[:] = acc_ref[:] * alpha[:, :, : acc_ref.shape[2]] + pv
        m_ref[:] = m_next

    if ring_n >= 0:
        # ring-staged decode tokens (serving engine step_n): an extra tiny
        # bf16-free chunk of R staged positions, codes+scales exactly like
        # the cache chunks (scales fold into scores/probs), masked by the
        # STATIC ring fill count — runs once, in the last grid cell
        @pl.when(c == nc - 1)
        def _ring():
            q = q_ref[0].astype(jnp.float32)
            rk = rk_ref[0].astype(jnp.float32)       # (hg, R, hd)
            rks = rks_ref[0].astype(jnp.float32)     # (hg, R)
            s = jax.lax.dot_general(
                q, rk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (hg, n_rep, R)
            s = s * (rks[:, None, :] * score_scale)
            j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(j <= ring_n, s, _NEG)
            m_curr = jnp.broadcast_to(
                jnp.max(s, axis=-1, keepdims=True), m_ref.shape)
            m_next = jnp.maximum(m_ref[:], m_curr)
            alpha = jnp.exp(m_ref[:] - m_next)
            p = jnp.exp(s - m_next[:, :, :1])
            l_ref[:] = l_ref[:] * alpha + jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
            rvs = rvs_ref[0].astype(jnp.float32)     # (hg, R)
            rv = rv_ref[0].astype(jnp.float32)
            pv = jax.lax.dot_general(
                p * rvs[:, None, :], rv, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] * alpha[:, :, : acc_ref.shape[2]] + pv
            m_ref[:] = m_next

    @pl.when(c == nc - 1)
    def _fin():
        l = jnp.maximum(l_ref[:, :, : o_ref.shape[3]], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        if stats:
            om_ref[0] = m_ref[:]
            ol_ref[0] = l_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("kv_len", "score_scale", "out_dtype", "interpret",
                     "return_stats", "ring_n"))
def decode_attention_int8(q, k_codes, k_scale, v_codes, v_scale, lengths,
                          kv_len: int, score_scale: float,
                          out_dtype=jnp.bfloat16, interpret=None,
                          return_stats: bool = False,
                          ring_kv=None, ring_n: int = -1):
    """Single-position decode attention over an int8 KV window.

    q:        (B, n_heads, hd)  n_heads = n_kv * n_rep, grouped-query order
    k_codes:  (B, n_kv, max_len, hd) int8 — the FULL cache buffer; only the
              leading kv_len window is DMA'd (BlockSpec bounds the read, so
              no XLA slice copy is materialized)
    k_scale:  (B, n_kv, max_len) f32 per-token scales
    v_codes / v_scale: same shapes
    lengths:  (B,) int32 — tokens already in the cache for each slot; the
              newly-written token at index lengths[b] is attended (<=).
    kv_len:   static attention window bound (bucketed by the caller);
              windows < 128 fall back to the jnp reference (the chunked
              scale block needs a 128-lane multiple)
    return_stats: additionally return the online-softmax running stats
              (m, l), each (B, n_heads) f32 — out is m/l-NORMALIZED, so a
              caller can flash-merge it with an externally computed
              partial.
    ring_kv / ring_n: ring-staged decode tokens (serving engine step_n,
              serving/engine.py::_decode_multi_impl): ring_kv =
              (rk_codes (B, n_kv, R, hd) int8, rk_scale (B, n_kv, R) f32,
              rv_codes, rv_scale); positions
              0..ring_n of the ring are attended as an extra in-kernel
              chunk AFTER the [0, lengths] cache window (their logical
              positions follow the cache window). ring_n is STATIC (the
              unrolled step index), so each step specializes its kernel.
    returns:  (B, n_heads, hd) out_dtype [, m (B, n_heads), l (B, n_heads)]
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, n_heads, hd = q.shape
    _, n_kv, max_len, _ = k_codes.shape
    kv_len = min(kv_len, max_len)
    if kv_len % 128 != 0 and not interpret:
        return decode_attention_int8_reference(
            q, k_codes, k_scale, v_codes, v_scale, lengths, kv_len,
            score_scale, out_dtype, return_stats=return_stats,
            ring_kv=ring_kv, ring_n=ring_n)
    n_rep = n_heads // n_kv
    # chunk must DIVIDE kv_len or the grid (kv_len // chunk) silently drops
    # the tail (e.g. kv_len=1536, chunk=1024 would attend only 1024
    # positions). Pick the largest 128-multiple divisor <= _MAX_CHUNK.
    if kv_len % 128 == 0:
        chunk = max(c for c in range(128, min(_MAX_CHUNK, kv_len) + 1, 128)
                    if kv_len % c == 0)
    else:
        chunk = kv_len  # interpret-only (compiled path fell back above)
    hg = _head_group(n_kv, chunk, hd)

    q4 = q.reshape(B, n_kv, n_rep, hd)
    grid = (B, n_kv // hg, kv_len // chunk)

    in_specs = [
        pl.BlockSpec((1, hg, n_rep, hd), lambda b, g, c, _=None: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, chunk, hd), lambda b, g, c, _=None: (b, g, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, chunk), lambda b, g, c, _=None: (b, g, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, chunk, hd), lambda b, g, c, _=None: (b, g, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, chunk), lambda b, g, c, _=None: (b, g, c),
                     memory_space=pltpu.VMEM),
    ]
    ring_args = ()
    if ring_n >= 0:
        rk_c, rk_s, rv_c, rv_s = ring_kv
        R = rk_c.shape[2]
        in_specs += [
            pl.BlockSpec((1, hg, R, hd), lambda b, g, c, _=None: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, R), lambda b, g, c, _=None: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, R, hd), lambda b, g, c, _=None: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, R), lambda b, g, c, _=None: (b, g, 0),
                         memory_space=pltpu.VMEM),
        ]
        ring_args = (rk_c, rk_s, rv_c, rv_s)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            [pl.BlockSpec(
                (1, hg, n_rep, hd), lambda b, g, c, _=None: (b, g, 0, 0),
                memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(
                (1, hg, n_rep, _LANES), lambda b, g, c, _=None: (b, g, 0, 0),
                memory_space=pltpu.VMEM)] * (2 if return_stats else 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((hg, n_rep, _LANES), jnp.float32),  # running max
            pltpu.VMEM((hg, n_rep, _LANES), jnp.float32),  # running sum
            pltpu.VMEM((hg, n_rep, hd), jnp.float32),      # out accumulator
        ],
    )
    cost = pl.CostEstimate(
        flops=2 * 2 * B * n_heads * kv_len * hd,
        bytes_accessed=(2 * B * n_kv * kv_len * hd          # int8 codes
                        + 2 * 4 * B * n_kv * kv_len          # f32 scales
                        + 2 * 2 * B * n_heads * hd),         # q + out bf16
        transcendentals=B * n_heads * kv_len,
    )
    out_shape = [jax.ShapeDtypeStruct((B, n_kv, n_rep, hd), out_dtype)]
    if return_stats:
        out_shape += [jax.ShapeDtypeStruct(
            (B, n_kv, n_rep, _LANES), jnp.float32)] * 2
    res = pl.pallas_call(
        functools.partial(_kernel, score_scale=score_scale, chunk=chunk,
                          stats=return_stats, ring_n=ring_n),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(lengths.astype(jnp.int32), q4, k_codes, k_scale, v_codes, v_scale,
      *ring_args)
    if return_stats:
        out, m, l = res
        return (out.reshape(B, n_heads, hd),
                m[..., 0].reshape(B, n_heads),
                l[..., 0].reshape(B, n_heads))
    return res[0].reshape(B, n_heads, hd)


def decode_attention_int8_reference(q, k_codes, k_scale, v_codes, v_scale,
                                    lengths, kv_len: int, score_scale: float,
                                    out_dtype=jnp.bfloat16,
                                    return_stats: bool = False,
                                    ring_kv=None, ring_n: int = -1):
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
    pos = jnp.arange(kv_len)
    mask = pos[None, None, :] <= lengths[:, None, None]
    if ring_n >= 0:
        rk_c, rk_s, rv_c, rv_s = ring_kv
        R = rk_c.shape[2]
        k = jnp.concatenate(
            [k, rk_c.astype(jnp.float32) * rk_s[:, :, :R, None]], axis=2)
        v = jnp.concatenate(
            [v, rv_c.astype(jnp.float32) * rv_s[:, :, :R, None]], axis=2)
        rmask = (jnp.arange(R) <= ring_n)[None, None, :]
        mask = jnp.concatenate(
            [mask, jnp.broadcast_to(rmask, (B, 1, R))], axis=-1)
    k = jnp.repeat(k, n_rep, axis=1)
    v = jnp.repeat(v, n_rep, axis=1)
    q4 = q.reshape(B, n_kv, n_rep, hd).reshape(B, n_heads, hd)
    scores = jnp.einsum(
        "bhd,bhkd->bhk", q4.astype(jnp.float32), k) * score_scale
    scores = jnp.where(mask, scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhk,bhkd->bhd", probs, v)
    if return_stats:
        m = jnp.max(scores, axis=-1)                     # (B, n_heads)
        l = jnp.sum(jnp.exp(scores - m[..., None]), axis=-1)
        return out.astype(out_dtype), m, l
    return out.astype(out_dtype)
