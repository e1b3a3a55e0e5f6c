"""Shared functional building blocks for decoder-only LMs.

All linear weights use (out_features, in_features) layout; y = x @ W.T + b.
Norm computations follow the reference's precision choices: RMSNorm variance
in f32 then cast back (reference quantize/omni_norm.py:52-63), attention
softmax in f32 (reference models/int_llama_layer.py:160).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..quant.quantizer import QuantConfig, fake_quant_act


@dataclasses.dataclass(frozen=True)
class ActQuantSpec:
    """Static activation-quantization spec for a block forward.

    Mirrors the reference's six per-site quantizer configs built in
    main.py:268-303 (weights handled separately, on params). `None` disables
    a site. Hashable => usable as a jit static argument.
    """

    act: Optional[QuantConfig] = None  # inputs of every quantized linear
    q: Optional[QuantConfig] = None    # query entering q@k^T
    k: Optional[QuantConfig] = None    # key entering q@k^T
    v: Optional[QuantConfig] = None    # value entering p@v
    p: Optional[QuantConfig] = None    # softmax probs entering p@v

    @staticmethod
    def from_bits(abits: int) -> "ActQuantSpec":
        """The reference's default wiring: per-token asymmetric quant at
        abits for act/q/k/v, 16-bit fix0to1 for softmax probs (identity)."""
        if abits >= 16:
            return ActQuantSpec()
        a = QuantConfig(n_bits=abits, symmetric=False)
        return ActQuantSpec(
            act=a, q=a, k=a, v=a, p=QuantConfig(n_bits=16, metric="fix0to1")
        )


NO_ACT_QUANT = ActQuantSpec()


def maybe_quant(x: jax.Array, cfg: Optional[QuantConfig]) -> jax.Array:
    if cfg is None:
        return x
    return fake_quant_act(x, cfg)


def linear(x: jax.Array, fc, act_cfg: Optional[QuantConfig] = None):
    """Quantized-linear forward (reference quantize/int_linear.py:48-62):
    optionally fake-quant the input per-token, then x @ W.T + b. The weight
    is whatever the caller put in `fc` (raw / LET-transformed / fake-quant),
    or a PackedWeight — then the fused Pallas dequant-matmul runs instead,
    so the same model code serves both fake-quant eval and packed serving.

    PackedWeight + an enabled act quantizer takes the INTEGER compute path
    (kernels/quant_matmul.quant_matmul_int): per-token int8 activation codes
    against the packed codes on the int8 MXU — the same quantized algebra
    evaluated exactly, at ~2x the bf16 MAC rate (the W4A4/W6A6 serving
    path; the reference's W4A4 is fake-quant fp16 end-to-end)."""
    from ..quant.packing import PackedWeight

    if isinstance(fc, PackedWeight):
        if act_cfg is not None and act_cfg.enabled:
            from ..kernels.quant_matmul import quant_matmul_int

            return quant_matmul_int(x, fc, act_cfg)
        from ..kernels.quant_matmul import quant_matmul

        return quant_matmul(x, fc)
    x = maybe_quant(x, act_cfg)
    y = x @ fc["weight"].T
    b = fc.get("bias")
    if b is not None:
        y = y + b
    return y


def rms_norm(x: jax.Array, p: dict, eps: float) -> jax.Array:
    """RMSNorm with f32 variance; supports a bias materialized by LET folding
    (reference quantize/omni_norm.py:40-63)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps)).astype(dtype) * p["weight"]
    b = p.get("bias")
    if b is not None:
        y = y + b
    return y


def layer_norm(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    y = y * p["weight"]
    b = p.get("bias")
    if b is not None:
        y = y + b
    return y


def causal_mask(q_len: int, kv_len: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask (0 on allowed, large-negative on future),
    shape (1, 1, q_len, kv_len). Matches HF's min-dtype convention."""
    neg = jnp.finfo(dtype).min
    i = jnp.arange(q_len)[:, None] + (kv_len - q_len)
    j = jnp.arange(kv_len)[None, :]
    m = jnp.where(j <= i, 0.0, neg).astype(dtype)
    return m[None, None]


def attention_core(
    q: jax.Array,  # (b, n_heads, q_len, hd)
    k: jax.Array,  # (b, n_heads, kv_len, hd)
    v: jax.Array,  # (b, n_heads, kv_len, hd)
    mask: Optional[jax.Array],
    scale: float,
    spec: ActQuantSpec,
    scale_before_quant: bool = False,
) -> jax.Array:
    """Fake-quant-aware attention (reference models/int_llama_layer.py:141-163).

    q/k quantized per-token over head_dim entering q@k^T; softmax in f32;
    probs through the p-quantizer; v quantized entering p@v.
    `scale_before_quant` reproduces OPT's ordering (q * scaling before the
    q-quantizer, reference models/int_opt_layer.py:96-97) vs LLaMA's
    (scores / sqrt(hd) after the matmul)."""
    dtype = q.dtype
    if scale_before_quant:
        q = q * scale
    q = maybe_quant(q, spec.q)
    k = maybe_quant(k, spec.k)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if not scale_before_quant:
        scores = scores * scale
    if mask is not None:
        scores = scores + mask
        scores = jnp.maximum(scores, jnp.finfo(dtype).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    probs = maybe_quant(probs, spec.p)
    v = maybe_quant(v, spec.v)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """(b, n_kv, s, hd) -> (b, n_kv*n_rep, s, hd), each kv head repeated
    n_rep consecutive times (HF repeat_kv layout)."""
    if n_rep == 1:
        return x
    b, n_kv, s, hd = x.shape
    return jnp.broadcast_to(
        x[:, :, None], (b, n_kv, n_rep, s, hd)
    ).reshape(b, n_kv * n_rep, s, hd)
