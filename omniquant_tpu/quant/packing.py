"""Packed integer weight storage for W2/W3/W4 — TPU-friendly layouts.

Role-equivalent of the AutoGPTQ CUDA QuantLinear packing the reference uses
for real quantization (reference: quantize/omniquant.py:255-277), but the
layout is designed for vectorized unpack on TPU rather than copied from
AutoGPTQ's CUDA format:

  * Weights are stored transposed, as W^T with shape (in, out): `out` rides
    the 128-wide lane dimension and the contraction axis is the sublane axis,
    so a Pallas kernel can unpack a block and feed the MXU without transposes.
  * 2- and 4-bit: `vals_per_word = 32 // bits` consecutive rows of W^T are
    packed into one int32 (codes[i, k] lives in bits [bits*k, bits*(k+1))
    of word [i // vpw, :] with k = i % vpw). Unpacking is a shift+mask
    broadcast followed by a contiguous reshape — no gathers, no transposes.
  * 3-bit: 10 values per int32 (30 used bits, 2 pad). This deliberately
    avoids AutoGPTQ's word-boundary-crossing 3-bit layout, which cannot be
    unpacked with uniform vector ops. Rows are zero-padded to a multiple
    of 10.

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
    return {2: 16, 3: 10, 4: 8, 8: 4}[bits]


@dataclasses.dataclass
class PackedWeight:
    """A packed quantized linear weight.

    qweight: int32 (ceil(in_padded / vpw), out) — packed W^T codes
    scales:  (out, n_groups) f32
    zeros:   (out, n_groups) f32 — *rounded* zero points (reference keeps
             round_zero_point; dequant is (q - zero) * scale)
    bias:    optional (out,)
    """

    qweight: jax.Array
    scales: jax.Array
    zeros: jax.Array
    bias: Optional[jax.Array]
    bits: int
    group_size: Optional[int]
    in_features: int
    out_features: int

    def tree_flatten(self):
        return (
            (self.qweight, self.scales, self.zeros, self.bias),
            (self.bits, self.group_size, self.in_features, self.out_features),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        qweight, scales, zeros, bias = children
        bits, group_size, in_features, out_features = aux
        return cls(qweight, scales, zeros, bias, bits, group_size,
                   in_features, out_features)


jax.tree_util.register_pytree_node(
    PackedWeight,
    PackedWeight.tree_flatten,
    lambda aux, children: PackedWeight.tree_unflatten(aux, children),
)


def pack_codes(codes: jax.Array, bits: int) -> jax.Array:
    """Pack int codes (out, in) -> int32 (ceil(in_pad/vpw), out) in W^T layout."""
    out_f, in_f = codes.shape
    vpw = vals_per_word(bits)
    codes_t = codes.T.astype(jnp.uint32)  # (in, out)
    pad = (-in_f) % vpw
    if pad:
        codes_t = jnp.pad(codes_t, ((0, pad), (0, 0)))
    n_words = codes_t.shape[0] // vpw
    # (n_words, vpw, out): word w packs rows w*vpw .. w*vpw+vpw-1
    grouped = codes_t.reshape(n_words, vpw, out_f)
    shifts = (bits * jnp.arange(vpw, dtype=jnp.uint32))[None, :, None]
    packed = jnp.sum(grouped << shifts, axis=1, dtype=jnp.uint32)
    return packed.astype(jnp.int32)


def unpack_codes(packed: jax.Array, bits: int, in_features: int) -> jax.Array:
    """Unpack int32 (n_words, out) -> codes (in_features, out) [W^T layout].

    Pure jnp; the Pallas kernels inline the same shift/mask/reshape sequence.
    """
    n_words, out_f = packed.shape
    vpw = vals_per_word(bits)
    mask = jnp.uint32(2**bits - 1)
    p = packed.astype(jnp.uint32)
    shifts = (bits * jnp.arange(vpw, dtype=jnp.uint32))[None, :, None]
    vals = (p[:, None, :] >> shifts) & mask  # (n_words, vpw, out)
    return vals.reshape(n_words * vpw, out_f)[:in_features].astype(jnp.int32)


def pack_weight(
    w: jax.Array,
    cfg: QuantConfig,
    lwc_params: Optional[dict] = None,
    bias: Optional[jax.Array] = None,
    scale: Optional[jax.Array] = None,
    rzp: Optional[jax.Array] = None,
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
    return PackedWeight(
        qweight=pack_codes(codes, cfg.n_bits),
        scales=scales,
        zeros=zeros,
        bias=bias,
        bits=cfg.n_bits,
        group_size=cfg.group_size,
        in_features=in_padded,
        out_features=out_f,
    )


def dequantize_packed(pw: PackedWeight, dtype=jnp.float32) -> jax.Array:
    """PackedWeight -> dense W^T (in_features, out) — the jnp reference path
    the Pallas kernel is validated against bit-for-bit on the int domain."""
    codes = unpack_codes(pw.qweight, pw.bits, pw.in_features)  # (in, out)
    if pw.group_size:
        n_groups = pw.scales.shape[1]
        # group g covers rows [g*gs, (g+1)*gs)
        gid = jnp.arange(pw.in_features) // pw.group_size
        scales_t = pw.scales.T[gid]  # (in, out)
        zeros_t = pw.zeros.T[gid]
    else:
        scales_t = jnp.broadcast_to(pw.scales.T, codes.shape)
        zeros_t = jnp.broadcast_to(pw.zeros.T, codes.shape)
    return ((codes.astype(jnp.float32) - zeros_t) * scales_t).astype(dtype)
