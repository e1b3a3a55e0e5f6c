"""Packed integer weight storage for W2/W3/W4 — TPU-friendly layouts.

Role-equivalent of the AutoGPTQ CUDA QuantLinear packing the reference uses
for real quantization (reference: quantize/omniquant.py:255-277), but the
layout is designed for vectorized unpack on TPU rather than copied from
AutoGPTQ's CUDA format:

  * Weights are stored transposed, as W^T with shape (in, out): `out` rides
    the 128-wide lane dimension and the contraction axis is the sublane axis,
    so a Pallas kernel can unpack a block and feed the MXU without transposes.
  * Tile-local planar bit layout: rows are packed in tiles of `tile_k` rows
    (a multiple of vals_per_word*8 sublanes and of the group size). Within a
    tile, word w's bit-slot p holds row p*(tile_k/vpw) + w. The kernel then
    unpacks one tile with vpw *static 2-D* shift/mask ops and a single
    sublane concatenate — no 3-D intermediates, no gathers, no transposes
    (the word-interleaved layout's unpack pattern stalls the Mosaic
    compiler; this one compiles in <1s and vectorizes cleanly).
  * 3-bit, planar: a 2-bit plane + a 1-bit plane per tile (exactly 3.0 bits
    per value; code = low2 | hi1 << 2). This avoids both AutoGPTQ's
    word-boundary-crossing layout and planar n-per-word packings with
    non-power-of-two n, whose unpack patterns compile poorly.
  * 3-bit, pairs: 10 CONTIGUOUS codes per word (5 pairs 16 bits apart;
    bits 15/31 unused — 3.2 effective bits). Spending 0.2 bits of HBM buys
    the decode fast path a single bf16-injection matmul pass per tile: the
    2+1-plane form needs two injected plane passes + an xsum correction,
    which made W3 decode SLOWER than W4 (VERDICT r3) despite moving 25%
    fewer bytes — the unpack/MXU cost is per CODE PASS, not per bit.

Scales/zero-points are per-group along the in-features axis (group_size) or
per output channel, stored as (out, n_groups) f32 — the transpose-free layout
for the kernel epilogue (dequant multiplies along lanes).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .quantizer import QuantConfig, quantize_weight_int


def vals_per_word(bits: int) -> int:
    """Values per int32 word for power-of-two widths. Planar 3-bit (2+1)
    and 6-bit (4+2) use bitplane decompositions (see pack_codes) rather
    than n-per-word packing, so they have no single vals_per_word; the
    PAIRS 3-bit layout stores 10 contiguous codes per word (use
    vals_per_word_layout)."""
    return {1: 32, 2: 16, 4: 8, 8: 4}[bits]


def _pairs_vpw(bits: int) -> int:
    """Values per int32 word in the PAIRS layout: codes sit 16 bits apart
    in pairs, 2*(16//bits) per word. 3-bit packs 5 pairs (bits 3j and
    3j+16, j<5; lane bits 15/31 unused => 3.2 effective bits/value)."""
    return 2 * (16 // bits)


def words_per_rows(bits: int, rows: int, layout: str = "planar") -> int:
    """int32 words storing `rows` values at `bits` each. Exact for planar
    widths (3-bit = 2+1 planes, 6-bit = 4+2 planes); the pairs 3-bit
    layout stores 10 values/word."""
    if bits == 3 and layout == "pairs":
        assert rows % 10 == 0, rows
        return rows // 10
    assert (rows * bits) % 32 == 0, (bits, rows)
    return rows * bits // 32


def rows_per_words(bits: int, words: int, layout: str = "planar") -> int:
    if bits == 3 and layout == "pairs":
        return words * 10
    assert (words * 32) % bits == 0, (bits, words)
    return words * 32 // bits


def pack_tile(bits: int, group_size: Optional[int],
              in_features: Optional[int] = None,
              layout: str = "planar") -> int:
    """Default layout tile size (rows of W^T per pack tile): a multiple of
    every plane chunk's 8-sublane unit and of the group size (so quant
    groups never straddle tiles), scaled toward 512 rows (640 for the
    10-per-word pairs 3-bit layout) so the matmul kernel's K steps stay
    coarse — but not past in_features (smaller matrices keep the base
    tile, minimizing padding). Tensor-parallel packing may override with a
    smaller multiple of the base so shards split on tile boundaries."""
    import math

    if bits == 3 and layout == "pairs":
        base = 80  # 10 codes/word x 8 sublanes of words
        target = 640  # 5 injected parts of 128 rows per tile
    elif bits == 3:
        base = 256  # 1-bit plane chunk tile/32 must fill 8 sublanes
        target = 512
    elif bits == 6:
        base = 128  # lcm of the 4-bit (64) and 2-bit (128) plane units
        target = 512
    else:
        base = vals_per_word(bits) * 8
        target = 512
    if group_size:
        base = base * group_size // math.gcd(base, group_size)
    scale = max(1, target // base)
    if in_features is not None:
        while scale > 1 and base * scale > in_features:
            scale //= 2
    return base * scale


@dataclasses.dataclass
class PackedWeight:
    """A packed quantized linear weight.

    qweight: int32 (k_pad * bits / 32, out) — packed W^T codes, where
             k_pad = in_features rounded up to tile_k
    scales:  (out, n_groups) f32
    zeros:   (out, n_groups) f32 — *rounded* zero points (reference keeps
             round_zero_point; dequant is (q - zero) * scale)
    bias:    optional (out,)
    layout:  "planar" — tile-local bit planes (see module docstring);
             "pairs"  — codes paired 16 bits apart inside each word so the
             matmul kernel manufactures TWO bf16 weights (1 + c/2^b, the
             2^b and -1 folding into the scale slabs) with ONE
             shift+and+or — halving the VPU unpack cost that dominates
             decode GEMMs (bits 2/3/4, coarse or per-channel groups;
             3-bit at 3.2 effective bits, see module docstring)
    """

    qweight: jax.Array
    scales: jax.Array
    zeros: jax.Array
    bias: Optional[jax.Array]
    bits: int
    group_size: Optional[int]
    in_features: int
    out_features: int
    tile_k: int = 0  # 0 => derive default from (bits, group_size, in)
    layout: str = "planar"

    def __post_init__(self):
        if not self.tile_k:
            self.tile_k = pack_tile(
                self.bits, self.group_size, self.in_features, self.layout)

    @property
    def k_pad(self) -> int:
        return rows_per_words(self.bits, self.qweight.shape[0], self.layout)

    def tree_flatten(self):
        return (
            (self.qweight, self.scales, self.zeros, self.bias),
            (self.bits, self.group_size, self.in_features, self.out_features,
             self.tile_k, self.layout),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        qweight, scales, zeros, bias = children
        return cls(qweight, scales, zeros, bias, *aux)


jax.tree_util.register_pytree_node(
    PackedWeight,
    PackedWeight.tree_flatten,
    lambda aux, children: PackedWeight.tree_unflatten(aux, children),
)


def _pack_planar(codes_t: jax.Array, bits: int, tile: int) -> jax.Array:
    """(k_pad, out) codes -> (k_pad*bits/32, out) words, tile-local planar.

    Row r = tile j*T + plane p*(T/vpw) + w lives in bit-slot p of word
    (j*(T/vpw) + w) within the tile's word block."""
    k_pad, out_f = codes_t.shape
    vpw = vals_per_word(bits)
    plane = tile // vpw
    grouped = codes_t.reshape(k_pad // tile, vpw, plane, out_f)
    shifts = (bits * jnp.arange(vpw, dtype=jnp.uint32))[None, :, None, None]
    packed = jnp.sum(grouped << shifts, axis=1, dtype=jnp.uint32)
    return packed.reshape(k_pad * bits // 32, out_f)


def _unpack_planar(packed: jax.Array, bits: int, tile: int) -> jax.Array:
    vpw = vals_per_word(bits)
    plane = tile // vpw
    n_words, out_f = packed.shape
    mask = jnp.uint32(2**bits - 1)
    p = packed.astype(jnp.uint32).reshape(-1, plane, out_f)
    shifts = (bits * jnp.arange(vpw, dtype=jnp.uint32))[None, :, None, None]
    vals = (p[:, None] >> shifts) & mask
    return vals.reshape(-1, out_f)


def _pack_pairs(codes_t: jax.Array, bits: int, tile: int) -> jax.Array:
    """(k_pad, out) codes -> (k_pad/vpw, out) words in the PAIRS layout:
    within each tile of T rows (W = T/vpw words, vpw = 2*(16//bits)),
    natural row n = j*(2W) + 2w + h lives at bit position bits*j + 16*h of
    word w — i.e. the two halves of a 32-bit word hold a PAIR of codes 16
    bits apart, which the kernel turns into two bf16 weights with one
    shift+and+or (Mosaic's 32->16 bitcast interleaves sublanes as
    [lo16, hi16], giving natural row order after a j-major concat).
    3-bit packs 5 such pairs per word (10 codes, bits 15/31 unused —
    3.2 effective bits/value, the price of a contiguous-code layout whose
    decode fast path runs ONE injected matmul pass instead of the 2+1
    planes' two)."""
    assert bits in (1, 2, 3, 4), bits
    k_pad, out_f = codes_t.shape
    vpw = _pairs_vpw(bits)
    assert tile % vpw == 0, (tile, vpw)
    W = tile // vpw
    tiles = codes_t.reshape(k_pad // tile, vpw // 2, W, 2, out_f)
    shifts = (bits * jnp.arange(vpw // 2, dtype=jnp.uint32)
              )[None, :, None, None, None]
    h16 = (16 * jnp.arange(2, dtype=jnp.uint32))[None, None, None, :, None]
    packed = jnp.sum(tiles << (shifts + h16), axis=(1, 3), dtype=jnp.uint32)
    return packed.reshape(k_pad // vpw, out_f)


def _unpack_pairs(packed: jax.Array, bits: int, tile: int) -> jax.Array:
    assert bits in (1, 2, 3, 4), bits
    n_words, out_f = packed.shape
    vpw = _pairs_vpw(bits)
    W = tile // vpw
    mask = jnp.uint32(2**bits - 1)
    p = packed.astype(jnp.uint32).reshape(-1, 1, W, 1, out_f)
    shifts = (bits * jnp.arange(vpw // 2, dtype=jnp.uint32)
              )[None, :, None, None, None]
    h16 = (16 * jnp.arange(2, dtype=jnp.uint32))[None, None, None, :, None]
    vals = (p >> (shifts + h16)) & mask
    return vals.reshape(-1, out_f)


def pack_codes(codes: jax.Array, bits: int,
               group_size: Optional[int] = None,
               tile_k: Optional[int] = None,
               layout: str = "planar") -> jax.Array:
    """Pack int codes (out, in) -> int32 words, tile-local planar (default)
    or pairs (see _pack_pairs; bits 2/3/4 — 3-bit stores 10 contiguous
    codes per word, 3.2 effective bits). Planar 3-bit decomposes into a
    2-bit plane followed by a 1-bit plane per tile (exactly 3.0 bits/value;
    avoids non-power-of-two packing whose unpack patterns compile poorly).
    Codes are zero-padded up to k_pad = roundup(in, tile)."""
    out_f, in_f = codes.shape
    tile = tile_k or pack_tile(bits, group_size, in_f, layout)
    codes_t = codes.T.astype(jnp.uint32)  # (in, out)
    pad = (-in_f) % tile
    if pad:
        codes_t = jnp.pad(codes_t, ((0, pad), (0, 0)))
    k_pad = codes_t.shape[0]
    if layout == "pairs":
        return _pack_pairs(codes_t, bits, tile).astype(jnp.int32)
    if bits == 3:
        n_tiles = k_pad // tile
        tiles = codes_t.reshape(n_tiles, tile, out_f)
        low = _pack_planar(
            (tiles & 3).reshape(k_pad, out_f), 2, tile
        ).reshape(n_tiles, tile // 16, out_f)
        hi = _pack_planar(
            (tiles >> 2).reshape(k_pad, out_f), 1, tile
        ).reshape(n_tiles, tile // 32, out_f)
        packed = jnp.concatenate([low, hi], axis=1)  # (n_tiles, 3T/32, out)
        return packed.reshape(k_pad * 3 // 32, out_f).astype(jnp.int32)
    if bits == 6:
        # 4-bit plane + 2-bit plane per tile: exactly 6.0 bits per value
        # (code = low4 | hi2 << 4) — the W6A6 real-quant layout
        n_tiles = k_pad // tile
        tiles = codes_t.reshape(n_tiles, tile, out_f)
        low = _pack_planar(
            (tiles & 15).reshape(k_pad, out_f), 4, tile
        ).reshape(n_tiles, tile // 8, out_f)
        hi = _pack_planar(
            (tiles >> 4).reshape(k_pad, out_f), 2, tile
        ).reshape(n_tiles, tile // 16, out_f)
        packed = jnp.concatenate([low, hi], axis=1)  # (n_tiles, 6T/32, out)
        return packed.reshape(k_pad * 6 // 32, out_f).astype(jnp.int32)
    return _pack_planar(codes_t, bits, tile).astype(jnp.int32)


def unpack_codes(packed: jax.Array, bits: int, in_features: int,
                 group_size: Optional[int] = None,
                 tile_k: Optional[int] = None,
                 layout: str = "planar") -> jax.Array:
    """Unpack int32 words -> codes (in_features, out) [W^T layout].

    Pure jnp; the Pallas kernels inline the per-tile variant (static 2-D
    shift/mask ops + concatenates)."""
    n_words, out_f = packed.shape
    tile = tile_k or pack_tile(bits, group_size, in_features, layout)
    if layout == "pairs":
        vals = _unpack_pairs(packed.astype(jnp.uint32), bits, tile)
        return vals[:in_features].astype(jnp.int32)
    if bits == 3:
        wpt = tile * 3 // 32
        tiles = packed.astype(jnp.uint32).reshape(-1, wpt, out_f)
        n_tiles = tiles.shape[0]
        low = _unpack_planar(
            tiles[:, : tile // 16].reshape(-1, out_f), 2, tile)
        hi = _unpack_planar(
            tiles[:, tile // 16 :].reshape(-1, out_f), 1, tile)
        vals = low | (hi << 2)
        return vals[:in_features].astype(jnp.int32)
    if bits == 6:
        wpt = tile * 6 // 32
        tiles = packed.astype(jnp.uint32).reshape(-1, wpt, out_f)
        low = _unpack_planar(
            tiles[:, : tile // 8].reshape(-1, out_f), 4, tile)
        hi = _unpack_planar(
            tiles[:, tile // 8 :].reshape(-1, out_f), 2, tile)
        vals = low | (hi << 4)
        return vals[:in_features].astype(jnp.int32)
    vals = _unpack_planar(packed.astype(jnp.uint32), bits, tile)
    return vals[:in_features].astype(jnp.int32)


def default_layout(bits: int, group_size: Optional[int]) -> str:
    """'pairs' wherever the fast decode path supports it (bits 2/3/4,
    per-channel or >=128-row groups — the post-matmul group-scaling
    regime), else 'planar'."""
    if bits in (2, 3, 4) and (group_size is None or group_size >= 128):
        return "pairs"
    return "planar"


def pack_weight(
    w: jax.Array,
    cfg: QuantConfig,
    lwc_params: Optional[dict] = None,
    bias: Optional[jax.Array] = None,
    scale: Optional[jax.Array] = None,
    rzp: Optional[jax.Array] = None,
    tile_k: Optional[int] = None,
    layout: str = "planar",
) -> PackedWeight:
    """Quantize + pack a weight (out, in) into PackedWeight.

    If `scale`/`rzp` are given (calibration-recorded quantizer state, shape
    (num_groups, 1)), codes are derived against that exact grid — the
    reference's pack(module, scales, zeros) path (quantize/omniquant.py:
    258-265) where the weight is already the dequantized fixed point.
    """
    out_f, in_f = w.shape
    if scale is not None:
        deficiency = cfg.deficiency(in_f)
        xq = jnp.pad(w, ((0, 0), (0, deficiency))) if deficiency else w
        grouped = xq.reshape(-1, cfg.group_size) if cfg.group_size else xq
        codes = jnp.clip(
            jnp.round(grouped / scale) + rzp, cfg.qmin, cfg.qmax)
        codes = codes.reshape(out_f, in_f + deficiency).astype(jnp.int32)
    else:
        codes, scale, rzp = quantize_weight_int(w, cfg, lwc_params)
    in_padded = codes.shape[1]  # includes deficiency padding
    # scale/rzp are (num_groups, 1); reshape to (out, n_groups)
    scales = scale.reshape(out_f, -1).astype(jnp.float32)
    zeros = rzp.reshape(out_f, -1).astype(jnp.float32)
    auto = layout == "auto"
    if auto:
        layout = default_layout(cfg.n_bits, cfg.group_size)
    tile = tile_k or pack_tile(cfg.n_bits, cfg.group_size, in_padded, layout)
    if cfg.n_bits == 3 and layout == "pairs" and tile % 80:
        # the 10-per-word layout needs whole 8-sublane word tiles; an
        # incompatible (caller-pinned or tiny-matrix) tile falls back to
        # the exact-3.0-bit planar planes when the layout was auto-chosen
        if not auto:
            raise ValueError(
                f"tile_k {tile} incompatible with the pairs 3-bit layout "
                "(needs a multiple of 80 rows)")
        layout = "planar"
        tile = tile_k or pack_tile(cfg.n_bits, cfg.group_size, in_padded)
    if cfg.group_size and tile % cfg.group_size:
        raise ValueError(
            f"tile_k {tile} must be a multiple of group_size "
            f"{cfg.group_size} (quant groups must not straddle pack tiles)")
    return PackedWeight(
        qweight=pack_codes(codes, cfg.n_bits, cfg.group_size, tile, layout),
        scales=scales,
        zeros=zeros,
        bias=bias,
        bits=cfg.n_bits,
        group_size=cfg.group_size,
        in_features=in_padded,
        out_features=out_f,
        tile_k=tile,
        layout=layout,
    )


def dequantize_packed(pw: PackedWeight, dtype=jnp.float32) -> jax.Array:
    """PackedWeight -> dense W^T (in_features, out) — the jnp reference path
    the Pallas kernel is validated against bit-for-bit on the int domain.

    Geometry comes from the ARRAY shapes where they can disagree with the
    dataclass aux (inside shard_map the arrays are local shards carrying
    global metadata — same contract as quant_matmul)."""
    in_f = min(pw.in_features,
               rows_per_words(pw.bits, pw.qweight.shape[0], pw.layout))
    codes = unpack_codes(
        pw.qweight, pw.bits, in_f, pw.group_size,
        pw.tile_k, pw.layout)  # (in, out)
    out_f = codes.shape[1]
    if pw.group_size:
        # reshape-broadcast per group (a per-row gather compiles/runs
        # pathologically on TPU at size)
        n_g = in_f // pw.group_size
        cg = codes.reshape(n_g, pw.group_size, out_f).astype(jnp.float32)
        sc = pw.scales.T[:n_g, None, :]  # (G, 1, out)
        zp = pw.zeros.T[:n_g, None, :]
        deq = ((cg - zp) * sc).reshape(in_f, out_f)
    else:
        deq = (codes.astype(jnp.float32) - pw.zeros.T) * pw.scales.T
    return deq.astype(dtype)
