"""Fused packed-int dequant + matmul Pallas kernels (W2/W3/W4/W8 × A16).

The TPU-native replacement for the reference's AutoGPTQ CUDA QuantLinear
(quantize/omniquant.py:255-277 packs; the CUDA kernel dequantizes
in-register and matmuls). Design notes:

  * Weights live in HBM as packed int32 in the tile-local planar W^T layout
    (quant/packing.py). One K tile = one pack tile: the kernel unpacks it
    with vpw *static* 2-D shift/mask ops and a single sublane concatenate —
    a pattern Mosaic vectorizes cleanly (the naive word-interleaved unpack's
    3-D broadcast stalls the compiler).
  * Decode-time GEMMs (M small) are HBM-bandwidth-bound on the weights, so
    streaming ~n_bits/16 of the bf16 bytes is the speedup mechanism; the
    VPU unpack overlaps the MXU's consumption of the previous tile via
    pallas' grid pipeline.
  * Grid is (N tiles, K tiles), K innermost ("arbitrary" semantics) with a
    VMEM f32 accumulator; x is re-read per N tile (cheap: M is small).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.packing import (
    PackedWeight, pack_tile, rows_per_words, vals_per_word, words_per_rows)


def _unpack_planar_tile(u, bits: int):
    """(tile*bits/32, bn) words -> (tile, bn) int32 codes for power-of-two
    widths: vpw static 2-D shift/mask ops + one concatenate along sublanes;
    row order matches the tile-local planar layout."""
    vpw = vals_per_word(bits)
    mask = jnp.uint32(2**bits - 1)
    planes = [
        ((u >> jnp.uint32(bits * p)) & mask).astype(jnp.int32)
        for p in range(vpw)
    ]
    return jnp.concatenate(planes, axis=0)


def _unpack_tile(qw, bits: int, bk: int):
    """Packed tile words -> (bk, bn) int32 codes. 3-bit recombines its
    2-bit and 1-bit planes (code = low | hi << 2); 6-bit its 4-bit and
    2-bit planes (code = low | hi << 4)."""
    u = pltpu.bitcast(qw, jnp.uint32)
    if bits == 3:
        low = _unpack_planar_tile(u[: bk // 16], 2)
        hi = _unpack_planar_tile(u[bk // 16 :], 1)
        return low | (hi << 2)
    if bits == 6:
        low = _unpack_planar_tile(u[: bk // 8], 4)
        hi = _unpack_planar_tile(u[bk // 8 :], 2)
        return low | (hi << 4)
    return _unpack_planar_tile(u, bits)


def _qmm_kernel(x_ref, qw_ref, sc_ref, zp_ref, out_ref, acc_ref,
                *, bits: int, bk: int, bn: int, gs_rows: int,
                grouped: bool, out_dtype):
    nk = pl.num_programs(2)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xv = x_ref[:]
    codes = _unpack_tile(qw_ref[:], bits, bk)  # (bk, bn) int32
    n_g = bk // gs_rows
    # sc/off blocks are (1, ngp, bn) host-side per-K-tile slabs (ngp = n_g
    # rounded up to 8 sublanes); off = -zero*scale precomputed. Codes cast
    # to the input dtype for the MXU (bf16 in serving — codes <= 255 are
    # exact in bf16; measured ~40% faster than f32 on v5e).
    sc = sc_ref[0, :n_g, :]
    off = zp_ref[0, :n_g, :]
    if gs_rows >= 128:
        # post-matmul group scaling: contract each quant group against the
        # RAW codes on the MXU, then scale the (m, bn) partial product and
        # add the zero-offset as a rank-1 term (off * per-group x-sums).
        # Skips the (bk, bn) elementwise dequant fma entirely — the VPU was
        # the bottleneck, not HBM (measured 15-45%/gemm on v5e, 160->210
        # GB/s on the 7B decode shapes). Only for coarse groups: fine
        # groups would fragment the contraction into many tiny MXU passes.
        m = xv.shape[0]
        codes_f = codes.astype(xv.dtype)
        # group sums accumulate 128+ adds — do them in f32 (bf16 inputs lose
        # mantissa bits over a long chain; the cost is VPU-side and tiny next
        # to the MXU passes)
        xsum = jnp.sum(
            xv.astype(jnp.float32).reshape(m, n_g, gs_rows), axis=-1)
        acc = jnp.dot(xsum, off.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
        for g in range(n_g):
            d = jnp.dot(xv[:, g * gs_rows : (g + 1) * gs_rows],
                        codes_f[g * gs_rows : (g + 1) * gs_rows],
                        preferred_element_type=jnp.float32)
            acc += d * sc[g][None, :].astype(jnp.float32)
        acc_ref[:] += acc
    else:
        # fine groups: single dequant fma into the full (bk, bn) tile, one
        # MXU pass over the whole K tile
        codes_g = codes.reshape(n_g, gs_rows, bn).astype(xv.dtype)
        w = codes_g * sc[:, None, :] + off[:, None, :]
        w = w.reshape(bk, bn)
        acc_ref[:] += jnp.dot(xv, w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "out_features", "block_n",
                     "tile_k", "interpret"),
)
def _qmm_call(x, qweight, scales_t, zeros_t, bits, group_size,
              out_features, block_n, tile_k, interpret):
    m, k = x.shape
    bk = tile_k  # one K tile == one pack tile (layout parameter)
    k_pad = rows_per_words(bits, qweight.shape[0])
    assert k_pad % bk == 0, (k_pad, bk)
    if k_pad != k:
        x = jnp.pad(x, ((0, 0), (0, k_pad - k)))
    n = out_features
    bn = block_n
    gs_rows = group_size if group_size else bk
    nk = k_pad // bk
    # tile M so large-batch/prefill GEMMs keep the x tile + f32 accumulator
    # inside scoped VMEM (decode's m stays a single tile: nm == 1)
    bm = min(256, -(-m // 8) * 8)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // bm, n // bn, nk)

    # reshape scales / (-zero*scale) offsets into per-K-tile slabs
    # (nk, ngp, n): slab j holds the groups of K tile j, sublane-padded to 8
    n_g = bk // gs_rows
    ngp = -(-n_g // 8) * 8
    def to_slabs(a):
        if group_size:
            g_needed = nk * n_g
            if a.shape[0] < g_needed:  # layout padding rows: finite junk ok
                a = jnp.concatenate(
                    [a, jnp.repeat(a[-1:], g_needed - a.shape[0], 0)])
            a = a.reshape(nk, n_g, n)
        else:
            a = jnp.broadcast_to(a[None], (nk, 1, n))
        return jnp.pad(a, ((0, 0), (0, ngp - n_g), (0, 0))).astype(x.dtype)

    offsets_t = -zeros_t * scales_t
    scales_t = to_slabs(scales_t)
    offsets_t = to_slabs(offsets_t)

    kernel = functools.partial(
        _qmm_kernel, bits=bits, bk=bk, bn=bn, gs_rows=gs_rows,
        grouped=bool(group_size), out_dtype=x.dtype)

    sc_spec = pl.BlockSpec(
        (1, ngp, bn), lambda im, i, j: (j, 0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda im, i, j: (im, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((words_per_rows(bits, bk), bn),
                         lambda im, i, j: (j, i), memory_space=pltpu.VMEM),
            sc_spec,
            sc_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda im, i, j: (im, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k_pad * n,
            bytes_accessed=(qweight.size * 4 + x.size * x.dtype.itemsize
                            + m_pad * n * x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qweight, scales_t, offsets_t)
    return out[:m] if m_pad != m else out


def quant_matmul(x: jax.Array, pw: PackedWeight, block_n: int = 2048,
                 interpret: Optional[bool] = None) -> jax.Array:
    """y = x @ dequant(pw) (+ bias). x: (..., in_features_logical).

    Zero-pads x's contraction dim to the packed length (packing pads
    in-features up to the layout tile). On the CPU backend the kernel runs
    in interpret mode automatically (pallas has no compiled CPU path)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    orig_shape = x.shape
    m = 1
    for d in orig_shape[:-1]:
        m *= d
    n = pw.out_features
    # fall back to the dense-dequant path when N doesn't tile onto lanes
    if n % 128 != 0:
        return quant_matmul_reference(x, pw).reshape(*orig_shape[:-1], n)
    bn = next(b for b in (block_n, 1024, 512, 256, 128) if n % b == 0)
    x2 = x.reshape(m, orig_shape[-1])
    scales_t = pw.scales.T.astype(jnp.float32)  # (G, out)
    zeros_t = pw.zeros.T.astype(jnp.float32)
    y = _qmm_call(
        x2, pw.qweight, scales_t, zeros_t,
        bits=pw.bits, group_size=pw.group_size,
        out_features=pw.out_features, block_n=bn, tile_k=pw.tile_k,
        interpret=interpret)
    if pw.bias is not None:
        y = y + pw.bias.astype(y.dtype)
    return y.reshape(*orig_shape[:-1], pw.out_features)


def quant_matmul_reference(x: jax.Array, pw: PackedWeight) -> jax.Array:
    """jnp reference implementation (no pallas) for validation."""
    from ..quant.packing import dequantize_packed

    w = dequantize_packed(pw, dtype=jnp.float32)  # (in, out)
    pad = w.shape[0] - x.shape[-1]
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    y = jnp.einsum("...k,kn->...n", x.astype(jnp.float32), w).astype(x.dtype)
    if pw.bias is not None:
        y = y + pw.bias.astype(y.dtype)
    return y
