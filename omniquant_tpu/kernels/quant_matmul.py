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
    PackedWeight, dequantize_packed, pack_tile, rows_per_words, vals_per_word,
    words_per_rows)


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


def _unpack_tile(qw, bits: int, bk: int, layout: str = "planar"):
    """Packed tile words -> (bk, bn) int32 codes. Planar 3-bit recombines
    its 2-bit and 1-bit planes (code = low | hi << 2); 6-bit its 4-bit and
    2-bit planes (code = low | hi << 4); pairs 3-bit extracts the 5
    contiguous code pairs per word directly."""
    u = pltpu.bitcast(qw, jnp.uint32)
    if layout == "pairs":
        def pairs_plane(up, b):
            mask = jnp.uint32(2**b - 1)
            parts = []
            for j in range((16 // b)):
                lo = ((up >> jnp.uint32(b * j)) & mask).astype(jnp.int32)
                hi = ((up >> jnp.uint32(b * j + 16)) & mask).astype(
                    jnp.int32)
                # natural rows j*2W + 2w + h: interleave along sublanes
                parts.append(jnp.stack([lo, hi], axis=1).reshape(
                    2 * lo.shape[0], lo.shape[1]))
            return jnp.concatenate(parts, axis=0)

        return pairs_plane(u, bits)
    if bits == 3:
        low = _unpack_planar_tile(u[: bk // 16], 2)
        hi = _unpack_planar_tile(u[bk // 16 :], 1)
        return low | (hi << 2)
    if bits == 6:
        low = _unpack_planar_tile(u[: bk // 8], 4)
        hi = _unpack_planar_tile(u[bk // 8 :], 2)
        return low | (hi << 4)
    return _unpack_planar_tile(u, bits)


def _pairs_part_rows(bk: int, bits: int) -> int:
    """Natural rows per injected part (= 2 words' worth of code pairs):
    2 * (bk / vpw), with the pairs 3-bit layout at vpw=10."""
    vpw = 2 * (16 // bits)
    assert bk % vpw == 0, (bk, bits)
    return 2 * (bk // vpw)


def _pairs_fast_path(layout: str, gs_rows: int, bk: int, bits: int) -> bool:
    """Whether the pairs bf16-injection fast path applies: every injected
    part (2*bk/vpw rows) and every merged dot (ppd parts, ~128 rows) must
    lie inside a single quant group so the per-group scaling stays exact.
    All of bits 2/3/4 are a SINGLE injected pass — 3-bit codes are stored
    contiguously at 3.2 effective bits (quant/packing.py), so its 2^3
    factor folds into the scale slabs like the power-of-two widths."""
    if layout != "pairs" or gs_rows < 128 or bits not in (2, 3, 4):
        return False
    vpw = 2 * (16 // bits)
    if bk % vpw:
        return False
    part_rows = _pairs_part_rows(bk, bits)
    if part_rows > gs_rows or gs_rows % part_rows != 0:
        return False
    ppd = max(1, 128 // part_rows)
    if gs_rows % (part_rows * ppd) != 0:
        return False
    return True


def _qmm_kernel(x_ref, qw_ref, sc_ref, zp_ref, out_ref, acc_ref,
                *, bits: int, bk: int, bn: int, gs_rows: int,
                grouped: bool, out_dtype, layout: str = "planar"):
    nk = pl.num_programs(2)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xv = x_ref[:]
    n_g = bk // gs_rows
    # sc/off blocks are (1, ngp, bn) host-side per-K-tile slabs (ngp = n_g
    # rounded up to 8 sublanes); off = -zero*scale precomputed. Codes cast
    # to the input dtype for the MXU (bf16 in serving — codes <= 255 are
    # exact in bf16; measured ~40% faster than f32 on v5e).
    sc = sc_ref[0, :n_g, :]
    off = zp_ref[0, :n_g, :]
    if _pairs_fast_path(layout, gs_rows, bk, bits):
        # pairs fast path: each injected part j — ((u >> s) & mask2) | one2,
        # bitcast 32->16 — IS the contiguous natural-row slice
        # [j*2W, (j+1)*2W) of the tile (2W = 2*bk/vpw rows <= one quant
        # group), so the MXU consumes every part straight out of the
        # injection with NO (bk, bn) concatenate/materialization. The host
        # folded 2^b into sc and (off - 2^b*sc) into off (w' = 1 + c/2^b);
        # 3-bit codes are stored contiguously (3.2 effective bits), so it
        # runs the same ONE pass as the power-of-two widths.
        u = pltpu.bitcast(qw_ref[:], jnp.uint32)
        one2 = jnp.uint32(0x3F803F80)
        m = xv.shape[0]
        xsum = jnp.sum(
            xv.astype(jnp.float32).reshape(m, n_g, gs_rows), axis=-1)
        acc = jnp.dot(xsum, off.astype(jnp.float32),
                      preferred_element_type=jnp.float32)

        vpw_p = 2 * (16 // bits)
        sh = 7 - bits
        mask2 = jnp.uint32(((2**bits - 1) << sh) * 0x00010001)
        part_rows = _pairs_part_rows(bk, bits)

        def part(j):
            s = bits * j - sh
            t = (u >> jnp.uint32(s)) if s >= 0 else (u << jnp.uint32(-s))
            w1j = pltpu.bitcast((t & mask2) | one2, jnp.bfloat16)
            return w1j if w1j.dtype == xv.dtype else w1j.astype(xv.dtype)

        # feed the MXU >= 128-row dots: adjacent parts are consecutive
        # natural-row slices, so concatenating ppd of them (W2: 2x64
        # rows) restores a full-width contraction
        ppd = max(1, 128 // part_rows)
        dot_rows = part_rows * ppd
        for j0 in range(0, vpw_p // 2, ppd):
            w1 = (part(j0) if ppd == 1 else jnp.concatenate(
                [part(j0 + d) for d in range(ppd)], axis=0))
            g_j = (j0 * part_rows) // gs_rows
            d = jnp.dot(
                xv[:, j0 * part_rows : j0 * part_rows + dot_rows],
                w1, preferred_element_type=jnp.float32)
            acc += d * sc[g_j][None, :].astype(jnp.float32)
        acc_ref[:] += acc

        @pl.when(k == nk - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_dtype)

        return

    codes = _unpack_tile(qw_ref[:], bits, bk, layout)  # (bk, bn) int32
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
                     "tile_k", "layout", "interpret", "block_m"),
)
def _qmm_call(x, qweight, scales_t, zeros_t, bits, group_size,
              out_features, block_n, tile_k, interpret, layout="planar",
              block_m=None):
    m, k = x.shape
    bk = tile_k  # one K tile == one pack tile (layout parameter)
    k_pad = rows_per_words(bits, qweight.shape[0], layout)
    assert k_pad % bk == 0, (k_pad, bk)
    if k_pad != k:
        x = jnp.pad(x, ((0, 0), (0, k_pad - k)))
    n = out_features
    bn = block_n
    gs_rows = group_size if group_size else bk
    nk = k_pad // bk
    # tile M so large-batch/prefill GEMMs keep the x tile + f32 accumulator
    # inside scoped VMEM (decode's m stays a single tile: nm == 1);
    # block_m overrides for tiling experiments (scripts/exp_prefill_tiles)
    bm = block_m or min(256, -(-m // 8) * 8)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // bm, n // bn, nk)

    # reshape scales / (-zero*scale) offsets into per-K-tile slabs
    # (nk, ngp, n): slab j holds the groups of K tile j, sublane-padded to 8
    n_g = bk // gs_rows
    ngp = -(-n_g // 8) * 8
    # coarse-group paths consume the slabs in f32 (the kernel multiplies
    # f32 dot outputs); keeping them f32 is also REQUIRED for the pairs
    # fold, where sc2 and the -sc2 inside off2 must cancel exactly —
    # separate bf16 roundings broke the cancellation by ~sc*2^b*|xsum|.
    # The fine-group fma path keeps x.dtype (w = codes*sc + off in-dtype).
    slab_dtype = jnp.float32 if gs_rows >= 128 else x.dtype

    def to_slabs(a):
        if group_size:
            g_needed = nk * n_g
            if a.shape[0] < g_needed:  # layout padding rows: finite junk ok
                a = jnp.concatenate(
                    [a, jnp.repeat(a[-1:], g_needed - a.shape[0], 0)])
            a = a.reshape(nk, n_g, n)
        else:
            a = jnp.broadcast_to(a[None], (nk, 1, n))
        return jnp.pad(a, ((0, 0), (0, ngp - n_g), (0, 0))).astype(slab_dtype)

    offsets_t = -zeros_t * scales_t
    if _pairs_fast_path(layout, gs_rows, bk, bits):  # kernel fast-path cond
        # fold the pairs path's w' = 1 + c/2^b algebra:
        # sc*(x@c) + xsum*off == (2^b*sc)*(x@w') + xsum*(off - 2^b*sc)
        offsets_t = offsets_t - scales_t * (2.0 ** bits)
        scales_t = scales_t * (2.0 ** bits)
    scales_t = to_slabs(scales_t)
    offsets_t = to_slabs(offsets_t)

    kernel = functools.partial(
        _qmm_kernel, bits=bits, bk=bk, bn=bn, gs_rows=gs_rows,
        grouped=bool(group_size), out_dtype=x.dtype, layout=layout)

    sc_spec = pl.BlockSpec(
        (1, ngp, bn), lambda im, i, j: (j, 0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda im, i, j: (im, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((words_per_rows(bits, bk, layout), bn),
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


def _finite_zero_tie(x2: jax.Array) -> jax.Array:
    """A (1, 1) ZERO of x2's dtype that (a) data-depends on x2, (b) stays
    exactly 0 even when the sampled element is inf/NaN, and (c) survives
    the algebraic simplifier (float mul-by-zero is never folded). Used to
    anchor loop-invariant dequant/unpack work to its consumer."""
    v = x2[:1, :1]
    return jnp.where(jnp.isfinite(v), v, jnp.zeros_like(v)) * 0


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
    # geometry from the ARRAY shapes, not the dataclass metadata: inside
    # shard_map the arrays are local shards while the pytree aux data still
    # carries the global dims (parallel/tp_forward.py's _fix_local_pw does
    # the same for its callers)
    n = pw.qweight.shape[1]
    # fall back to the dense-dequant path when N doesn't tile onto lanes
    if n % 128 != 0:
        return quant_matmul_reference(x, pw).reshape(*orig_shape[:-1], n)
    bn = next(b for b in (block_n, 1024, 512, 256, 128) if n % b == 0)
    # Large-M (prefill) routing, from a queue-and-sync-once sweep on v5e
    # (scripts/exp_prefill_tiles.py; docs/bench_infrastructure.md for the
    # measurement methodology): when N forces the fused kernel below a
    # 1024-lane tile (e.g. gate/up at 11008 -> bn=256, fused 30% MFU),
    # dequantize-ONCE + dense MXU matmul is 30-60% faster at m >= 4096
    # (49% MFU); at bn >= 1024 the fused kernel matches or beats it
    # (down_proj 50.1% vs 45.8%), so those stay fused at every M.
    if m >= 4096 and bn < 1024 and not interpret:
        x2 = x.reshape(m, orig_shape[-1])
        w = dequantize_packed(pw, dtype=x.dtype)  # (k_pad, n)
        # tie the dequantization to THIS matmul's input: without the data
        # dependence XLA hoists every layer's (loop-invariant) dequant to
        # the program start and keeps all of them live at once — measured
        # +5.8 GB program memory (32 layers x 180 MB) and an HBM OOM on
        # the 7B prefill. The tie must be (a) guaranteed zero even for a
        # non-finite activation element (IEEE 0 * inf = NaN silently
        # poisons the whole weight matrix) and (b) UNfoldable — integer
        # x & 0 gets constant-folded by the algebraic simplifier, which
        # severs the dependence and re-enables the hoist (measured OOM).
        # where(isfinite(v), v, 0) * 0 satisfies both: inf/NaN route to
        # the 0 branch, and XLA never folds float mul-by-zero (NaN/inf
        # semantics). The add fuses into the dequant epilogue.
        zero = _finite_zero_tie(x2)
        w = w + zero.astype(w.dtype)
        pad = w.shape[0] - x2.shape[-1]
        if pad:
            x2 = jnp.pad(x2, ((0, 0), (0, pad)))
        y = x2 @ w
        if pw.bias is not None:
            y = y + pw.bias.astype(y.dtype)
        return y.reshape(*orig_shape[:-1], n)
    x2 = x.reshape(m, orig_shape[-1])
    scales_t = pw.scales.T.astype(jnp.float32)  # (G, out)
    zeros_t = pw.zeros.T.astype(jnp.float32)
    y = _qmm_call(
        x2, pw.qweight, scales_t, zeros_t,
        bits=pw.bits, group_size=pw.group_size,
        out_features=n, block_n=bn, tile_k=pw.tile_k,
        interpret=interpret, layout=pw.layout)
    if pw.bias is not None:
        y = y + pw.bias.astype(y.dtype)
    return y.reshape(*orig_shape[:-1], n)


# ---------------------------------------------------------------------------
# integer-activation path (W4A4 / W6A6): int8 MXU matmuls on the codes
# ---------------------------------------------------------------------------
#
# The weight-activation schemes' headline math (BASELINE.json metric names
# W4A4): activations are per-token asymmetrically quantized (reference
# quantizer.py per_token_dynamic_calibration) and weights per-group. Writing
# x̂ = (xq - zp_m)·s_m and ŵ = (wq - wzp_g)·sc_g, the product factors as
#
#   y[m,n] = s_m · Σ_g [ dot(xc_g, wc_g)·sc_g[n] + xsum_g[m]·off2_g[n] ]
#
# with xc = xq - zp_m (int8, exact), wc = wq - 2^{b-1} (int8, exact),
# off2 = (2^{b-1} - wzp)·sc (host-precomputed f32), xsum_g = Σ_{k∈g} xc.
# Every dot runs on the int8 MXU (2x the bf16 MACs/cycle on v5e) with int32
# accumulation — integer-exact, so the result is *more* faithful to the
# quantized algebra than the bf16 fake-quant matmul. The epilogue applies
# the per-token activation scale once. The reference has no integer compute
# path at all (its W4A4 is fake-quant fp16 end-to-end).


def quantize_act_int(x: jax.Array, cfg) -> tuple:
    """Per-token activation quantization to CENTERED int8 codes + f32 scale,
    on exactly the fake_quant_act grid (same _scale_zp, same clipping).
    Requires cfg.n_bits <= 7 for the asymmetric range to fit int8
    (|xq - zp| <= 2^n - 1). Returns (codes int8 (..., k), scale f32 (..., 1)).
    XLA fuses this elementwise chain into the preceding norm/matmul epilogue
    — the TPU analog of the north star's 'quant fused into the layernorm
    epilogue'."""
    from ..quant.quantizer import _scale_zp

    assert cfg.n_bits <= 7, "asymmetric act codes need n_bits <= 7 for int8"
    assert not cfg.group_size, "grouped act quant has no int path"
    xmin = jnp.min(x, axis=-1, keepdims=True)
    xmax = jnp.max(x, axis=-1, keepdims=True)
    scale, rzp = _scale_zp(xmin, xmax, cfg)
    xq = jnp.clip(jnp.round(x / scale) + rzp, 0, cfg.qmax)
    codes = (xq - rzp).astype(jnp.int8)
    return codes, scale.astype(jnp.float32)


def _qmm_int_kernel(x_ref, xs_ref, qw_ref, sc_ref, zp_ref, out_ref, acc_ref,
                    *, bits: int, bk: int, bn: int, gs_rows: int,
                    out_dtype, layout: str = "planar"):
    nk = pl.num_programs(2)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xc = x_ref[:]                                    # (bm, bk) int8
    codes = _unpack_tile(qw_ref[:], bits, bk, layout)  # (bk, bn) int32
    wc = (codes - 2 ** (bits - 1)).astype(jnp.int8)  # centered, exact
    n_g = bk // gs_rows
    sc = sc_ref[0, :n_g, :]    # (n_g, bn) f32
    off2 = zp_ref[0, :n_g, :]  # (2^{b-1} - wzp)·sc, f32
    m = xc.shape[0]
    xsum = jnp.sum(
        xc.astype(jnp.int32).reshape(m, n_g, gs_rows), axis=-1
    ).astype(jnp.float32)                            # (m, n_g)
    acc = jnp.dot(xsum, off2, preferred_element_type=jnp.float32)
    for g in range(n_g):
        d = jnp.dot(xc[:, g * gs_rows : (g + 1) * gs_rows],
                    wc[g * gs_rows : (g + 1) * gs_rows],
                    preferred_element_type=jnp.int32)  # int8 MXU pass
        acc += d.astype(jnp.float32) * sc[g][None, :]
    acc_ref[:] += acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:] * xs_ref[:]).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "out_features", "block_n",
                     "tile_k", "out_dtype", "layout", "interpret"),
)
def _qmm_int_call(xc, xs, qweight, scales_t, off2_t, bits, group_size,
                  out_features, block_n, tile_k, out_dtype, interpret,
                  layout="planar"):
    m, k = xc.shape
    bk = tile_k
    k_pad = rows_per_words(bits, qweight.shape[0], layout)
    assert k_pad % bk == 0, (k_pad, bk)
    if k_pad != k:
        xc = jnp.pad(xc, ((0, 0), (0, k_pad - k)))
    n = out_features
    bn = block_n
    gs_rows = group_size if group_size else bk
    nk = k_pad // bk
    # int8 x tiles need >= 32 sublanes (Mosaic int8 tiling)
    bm = min(256, -(-m // 32) * 32)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        xc = jnp.pad(xc, ((0, m_pad - m), (0, 0)))
        xs = jnp.pad(xs, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // bm, n // bn, nk)

    n_g = bk // gs_rows
    ngp = -(-n_g // 8) * 8

    def to_slabs(a):
        if group_size:
            g_needed = nk * n_g
            if a.shape[0] < g_needed:
                a = jnp.concatenate(
                    [a, jnp.repeat(a[-1:], g_needed - a.shape[0], 0)])
            a = a.reshape(nk, n_g, n)
        else:
            a = jnp.broadcast_to(a[None], (nk, 1, n))
        return jnp.pad(a, ((0, 0), (0, ngp - n_g), (0, 0)))

    scales_t = to_slabs(scales_t).astype(jnp.float32)
    off2_t = to_slabs(off2_t).astype(jnp.float32)

    kernel = functools.partial(
        _qmm_int_kernel, bits=bits, bk=bk, bn=bn, gs_rows=gs_rows,
        out_dtype=out_dtype, layout=layout)
    sc_spec = pl.BlockSpec(
        (1, ngp, bn), lambda im, i, j: (j, 0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda im, i, j: (im, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda im, i, j: (im, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((words_per_rows(bits, bk, layout), bn),
                         lambda im, i, j: (j, i), memory_space=pltpu.VMEM),
            sc_spec,
            sc_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda im, i, j: (im, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k_pad * n,
            bytes_accessed=(qweight.size * 4 + xc.size + m_pad * n * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xc, xs, qweight, scales_t, off2_t)
    return out[:m] if m_pad != m else out


# -- large-m (prefill) integer route: unpack ONCE, int8-MXU consume ------
#
# The fused kernel above re-unpacks each weight tile once per M tile
# (grid m x n x k), which at prefill m is pure waste: ablation on v5e
# (scripts/exp_ablate_int.py, 4096^3 W4g128, m=4096) measured
#   in-kernel unpack + int8 group dots : 1377 us  (99.8 TF/s eff)
#   PRE-UNPACKED int8 + group dots     :  690 us (199.2 TF/s eff)
#   bf16 pairs fused (the W4A16 path)  : 1223 us (112.4 TF/s eff)
# and K=128 group dots cost nothing vs one K=512 dot (690 vs 686 us) —
# the int8 MXU's 2x rate survives per-group scaling. So at m >=
# _INT_DENSE_MIN_M the codes are unpacked once to CENTERED int8 (XLA,
# one pass) and a dense consumer kernel runs the group-dot algebra.

_INT_DENSE_MIN_M = 2048


def _unpack_int8_kernel(qw_ref, zero_ref, out_ref, *, bits, bk, layout):
    codes = _unpack_tile(qw_ref[:], bits, bk, layout)
    # broadcast-add the (1,1) int32 zero on the i32 codes (Mosaic supports
    # neither i8 scalar extraction nor i8 vector add here)
    out_ref[:] = (codes - 2 ** (bits - 1) + zero_ref[:]).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("bits", "bk", "layout", "interpret"))
def _unpack_to_int8(qweight, zero, bits, bk, layout, interpret):
    """Packed words -> CENTERED int8 codes (k_pad, n), one Pallas pass
    (the XLA unpack's 3-D broadcast costs ~4x more on v5e: 255 vs ~60
    us for a 4096x4096 W4). `zero` is an int8 (1, 1) ZERO manufactured
    from the caller's activations: adding it inside the kernel ties the
    unpack to this call's input with no extra pass (anti-hoist, see
    caller)."""
    n = qweight.shape[1]
    k_pad = rows_per_words(bits, qweight.shape[0], layout)
    wpt = words_per_rows(bits, bk, layout)
    bn = next(b for b in (2048, 1024, 512, 256, 128) if n % b == 0) \
        if n % 128 == 0 else n
    return pl.pallas_call(
        functools.partial(_unpack_int8_kernel, bits=bits, bk=bk,
                          layout=layout),
        grid=(k_pad // bk, n // bn),
        in_specs=[pl.BlockSpec((wpt, bn), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bk, bn), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, n), jnp.int8),
        interpret=interpret,
    )(qweight, zero)


def _qmm_int_dense_kernel(x_ref, xsum_ref, xs_ref, w_ref, sc_ref, off_ref,
                          out_ref, acc_ref, *, gs_rows: int, out_dtype):
    nk = pl.num_programs(2)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xc = x_ref[:]                 # (bm, bk) i8 centered act codes
    wv = w_ref[:]                 # (bk, bn) i8 centered weight codes
    n_g = xc.shape[1] // gs_rows
    sc = sc_ref[0, :n_g, :]       # (n_g, bn) f32
    off2 = off_ref[0, :n_g, :]    # (2^{b-1} - wzp)*sc, f32
    # per-group act-code sums arrive TRANSPOSED (ngp, bm) — lane-friendly
    # block shape — and contract on their group dim directly. Accumulate
    # straight into the scratch ref: a Python-level (bm, bn) f32 temp
    # costs 4 MB of kernel stack and blew scoped VMEM at this tiling.
    xsum_t = xsum_ref[:, :]       # (ngp, bm) f32
    acc_ref[:] += jax.lax.dot_general(
        xsum_t[:n_g], off2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (bm, bn)
    for g in range(n_g):
        d = jnp.dot(xc[:, g * gs_rows:(g + 1) * gs_rows],
                    wv[g * gs_rows:(g + 1) * gs_rows],
                    preferred_element_type=jnp.int32)  # int8 MXU pass
        acc_ref[:] += d.astype(jnp.float32) * sc[g][None, :]

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:] * xs_ref[:]).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("gs_rows", "block_n", "block_k", "out_dtype",
                     "interpret"),
)
def _qmm_int_dense_call(xc, xsum, xs, w8, sc_slabs, off_slabs, gs_rows,
                        block_n, block_k, out_dtype, interpret):
    m, k_pad = xc.shape
    n = w8.shape[1]
    # 512-row m tiles halve the weight-tile HBM re-reads vs 256 (the
    # consume kernel's dominant cost term); tiling sweep on v5e 4096^3:
    # (256,2048,512) 754us / (512,2048,512) 652 / (512,4096,512) 594 /
    # (512,2048,1024) 619 — see scripts/exp_ablate_int.py ablation
    bm = min(512, -(-m // 32) * 32)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        xc = jnp.pad(xc, ((0, m_pad - m), (0, 0)))
        xsum = jnp.pad(xsum, ((0, 0), (0, m_pad - m)))
        xs = jnp.pad(xs, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // bm, n // block_n, k_pad // block_k)
    n_g = block_k // gs_rows
    ngp = sc_slabs.shape[1]
    kernel = functools.partial(
        _qmm_int_dense_kernel, gs_rows=gs_rows, out_dtype=out_dtype)
    sc_spec = pl.BlockSpec(
        (1, ngp, block_n), lambda im, i, j: (j, 0, i),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda im, i, j: (im, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngp, bm), lambda im, i, j: (j, im),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda im, i, j: (im, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda im, i, j: (j, i),
                         memory_space=pltpu.VMEM),
            sc_spec,
            sc_spec,
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda im, i, j: (im, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k_pad * n,
            bytes_accessed=(w8.size + xc.size + m_pad * n * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xc, xsum, xs, w8, sc_slabs, off_slabs)
    return out[:m] if m_pad != m else out


def _quant_matmul_int_dense(x, pw: PackedWeight, act_cfg, interpret):
    """Large-m integer route: y = actq(x) @ dequant(pw), the weight codes
    unpacked ONCE to centered int8 and consumed by the dense int8-MXU
    kernel. Same quantized algebra as the fused route (module comment)."""
    orig_shape = x.shape
    n = pw.qweight.shape[1]
    m = 1
    for d in orig_shape[:-1]:
        m *= d
    x2 = x.reshape(m, orig_shape[-1])
    # act quant stays on XLA: a fused Pallas act-quant kernel measured
    # SLOWER end-to-end (1182 vs 1094 us on the 4096^3 chain) because XLA
    # fuses the min/max/round passes into the producing ops for free
    xc, xs = quantize_act_int(x2, act_cfg)
    bits = pw.bits
    # zero tied to THIS call's activations: without the data dependence
    # XLA hoists every layer's (loop-invariant) unpack to program start
    # and keeps all the int8 code buffers live at once (same OOM
    # mechanism as the bf16 dequant-once route above). Derived from the
    # float input via the finite-safe unfoldable tie, then cast (exact:
    # the value is guaranteed 0.0).
    zero = _finite_zero_tie(x2).astype(jnp.int32)
    w8 = _unpack_to_int8(pw.qweight, zero, bits, pw.tile_k, pw.layout,
                         interpret)
    k_pad = w8.shape[0]
    if k_pad != xc.shape[1]:
        # centered zero act codes: pad rows contribute 0 to dots AND to
        # the per-group xsum, so junk codes in the pack-padding rows of
        # w8 (code 0 -> -2^{b-1}) are nullified exactly
        xc = jnp.pad(xc, ((0, 0), (0, k_pad - xc.shape[1])))
    # w8 is DENSE (no pack-tile constraint): bk only needs the group size
    # to divide it and to divide k_pad; start from the pack tile (a
    # multiple of gs that divides k_pad by construction) and grow toward
    # 1024 while the VMEM budget holds
    gs_rows = pw.group_size or pw.tile_k
    bk = pw.tile_k
    n_g = bk // gs_rows
    ngp = -(-n_g // 8) * 8
    nk = k_pad // bk

    scales_t = pw.scales.T.astype(jnp.float32)
    off2_t = ((2 ** (bits - 1) - pw.zeros) * pw.scales).T.astype(
        jnp.float32)

    def to_slabs(a):
        if pw.group_size:
            g_needed = nk * n_g
            if a.shape[0] < g_needed:
                a = jnp.concatenate(
                    [a, jnp.repeat(a[-1:], g_needed - a.shape[0], 0)])
            a = a.reshape(nk, n_g, n)
        else:
            a = jnp.broadcast_to(a[None], (nk, 1, n))
        return jnp.pad(a, ((0, 0), (0, ngp - n_g), (0, 0)))

    # per-(K tile, group) act-code sums, f32, TRANSPOSED to (nk*ngp, m)
    # so the kernel's block shape is lane-friendly (last dim = bm)
    xsum = jnp.sum(
        xc.astype(jnp.int32).reshape(m, k_pad // gs_rows, gs_rows),
        axis=-1).astype(jnp.float32)
    xsum = xsum.reshape(m, nk, n_g)
    xsum = jnp.pad(xsum, ((0, 0), (0, 0), (0, ngp - n_g)))
    xsum = xsum.transpose(1, 2, 0).reshape(nk * ngp, m)
    # lane tile: as wide as divides n, capped at the sweep-validated VMEM
    # envelope (bm=512, bn=2048, bk=512: 652us on the 4096^3 ablation;
    # wider bn with this operand set blows scoped VMEM)
    bn = next((b for b in (2048, 1024, 512, 256, 128)
               if n % b == 0 and bk * b <= 512 * 2048), 128)
    y = _qmm_int_dense_call(
        xc, xsum, xs, w8, to_slabs(scales_t), to_slabs(off2_t),
        gs_rows=gs_rows, block_n=bn, block_k=bk,
        out_dtype=jnp.dtype(x.dtype), interpret=interpret)
    if pw.bias is not None:
        y = y + pw.bias.astype(y.dtype)
    return y.reshape(*orig_shape[:-1], n)


def quant_matmul_int(x: jax.Array, pw: PackedWeight, act_cfg,
                     block_n: int = 2048,
                     interpret: Optional[bool] = None) -> jax.Array:
    """y = fake_quant_act(x) @ dequant(pw) (+ bias), evaluated EXACTLY on
    the integer domain: per-token int8 activation codes against the packed
    weight codes on the int8 MXU (see module comment). Falls back to
    fake-quant + quant_matmul when the geometry doesn't fit the int path."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = pw.qweight.shape[1]
    m = 1
    for d in x.shape[:-1]:
        m *= d
    eligible = (
        act_cfg is not None and act_cfg.enabled and not act_cfg.group_size
        and act_cfg.n_bits <= 7 and act_cfg.metric == "minmax"
        and n % 128 == 0 and pw.bits <= 8)
    if eligible and m >= _INT_DENSE_MIN_M:
        # large-m (prefill): unpack-once + dense int8-MXU consume — works
        # for every wire layout (unpack_codes handles pairs), and beats
        # the bf16 kernels by ~1.7x (see ablation above)
        return _quant_matmul_int_dense(x, pw, act_cfg, interpret)
    eligible = eligible and pw.layout == "planar"
    # small-m pairs-layout weights: extracting INT codes from the pair
    # words needs a sublane interleave that costs more than the int8-MXU
    # saves at decode (measured 489 vs 1333 tok/s at 7B decode); the
    # fake-quant fallback below uses the fast bf16 injection kernel AND
    # matches the eval oracle's fake-quant semantics exactly
    if not eligible:
        from ..quant.quantizer import fake_quant_act

        return quant_matmul(fake_quant_act(x, act_cfg), pw,
                            block_n=block_n, interpret=interpret)
    orig_shape = x.shape
    m = 1
    for d in orig_shape[:-1]:
        m *= d
    xc, xs = quantize_act_int(x.reshape(m, orig_shape[-1]), act_cfg)
    bn = next(b for b in (block_n, 1024, 512, 256, 128) if n % b == 0)
    scales_t = pw.scales.T.astype(jnp.float32)                 # (G, out)
    off2_t = ((2 ** (pw.bits - 1) - pw.zeros) * pw.scales).T.astype(
        jnp.float32)
    y = _qmm_int_call(
        xc, xs, pw.qweight, scales_t, off2_t,
        bits=pw.bits, group_size=pw.group_size,
        out_features=n, block_n=bn, tile_k=pw.tile_k,
        out_dtype=jnp.dtype(x.dtype), interpret=interpret,
        layout=pw.layout)
    if pw.bias is not None:
        y = y + pw.bias.astype(y.dtype)
    return y.reshape(*orig_shape[:-1], n)


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
