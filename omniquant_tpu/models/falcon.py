"""Falcon — pure-function JAX implementation (LWC-only, like the reference).

Functional re-design of the reference's QuantFalconDecoderLayer
(models/int_falcon_layer.py): fused query_key_value projection with the
three head-split variants (:66-94), rotary or alibi position encoding,
parallel-attention / dual-layernorm architectures (:273-315), GELU MLP.
LET is unsupported for falcon in the reference (:330-331,345-346) — this
family is LWC/weight-quant only; effective_block_weights therefore rejects
let_params.

Param layout per block:
  input_layernorm / (ln_attn, ln_mlp) / post_attention_layernorm:
      {'weight','bias'}
  query_key_value, dense, dense_h_to_4h, dense_4h_to_h: {'weight','bias'}
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..quant.quantizer import QuantConfig, fake_quant_weight
from ..quant.packing import PackedWeight
from .common import (
    ActQuantSpec,
    NO_ACT_QUANT,
    attention_core,
    causal_mask,
    layer_norm,
    linear,
)
from .llama import apply_rope, rope_cos_sin

LINEAR_NAMES = ("query_key_value", "dense", "dense_h_to_4h", "dense_4h_to_h")


@dataclasses.dataclass(frozen=True)
class FalconConfig:
    vocab_size: int = 65024
    hidden_size: int = 4544
    num_hidden_layers: int = 32
    num_attention_heads: int = 71
    num_kv_heads: Optional[int] = None
    multi_query: bool = True
    new_decoder_architecture: bool = False
    parallel_attn: bool = True
    alibi: bool = False
    layer_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    bias: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def effective_kv_heads(self) -> int:
        if self.new_decoder_architecture:
            return self.num_kv_heads or self.num_attention_heads
        if self.multi_query:
            return 1
        return self.num_attention_heads

    @classmethod
    def from_hf(cls, hf_config) -> "FalconConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_kv_heads", None),
            multi_query=getattr(hf_config, "multi_query", True),
            new_decoder_architecture=getattr(
                hf_config, "new_decoder_architecture", False),
            parallel_attn=getattr(hf_config, "parallel_attn", True),
            alibi=getattr(hf_config, "alibi", False),
            layer_norm_eps=getattr(hf_config, "layer_norm_epsilon", 1e-5),
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            bias=getattr(hf_config, "bias", False),
        )


def split_heads(fused_qkv: jax.Array, cfg: FalconConfig):
    """Fused qkv -> (q, k, v) each (b, s, n_heads, hd) with kv broadcast to
    n_heads (reference models/int_falcon_layer.py:66-94)."""
    b, s, _ = fused_qkv.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    if cfg.new_decoder_architecture:
        n_kv = cfg.effective_kv_heads
        rep = nh // n_kv
        qkv = fused_qkv.reshape(b, s, n_kv, rep + 2, hd)
        q = qkv[:, :, :, :-2]
        k = qkv[:, :, :, [-2]]
        v = qkv[:, :, :, [-1]]
        k = jnp.broadcast_to(k, q.shape)
        v = jnp.broadcast_to(v, q.shape)
        return (x.reshape(b, s, nh, hd) for x in (q, k, v))
    if not cfg.multi_query:
        qkv = fused_qkv.reshape(b, s, nh, 3, hd)
        return qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    qkv = fused_qkv.reshape(b, s, nh + 2, hd)
    q = qkv[..., :-2, :]
    k = jnp.broadcast_to(qkv[..., -2:-1, :], q.shape)
    v = jnp.broadcast_to(qkv[..., -1:, :], q.shape)
    return q, k, v


def split_heads_kv(fused_qkv: jax.Array, cfg: FalconConfig):
    """Like split_heads, but k/v keep their TRUE head count (no broadcast):
    q (b, s, n_heads, hd); k, v (b, s, n_kv, hd). The serving engine caches
    these directly — falcon-7b MQA stores ONE kv head instead of 71 copies
    (71x less cache memory) and repeats on read."""
    b, s, _ = fused_qkv.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    if cfg.new_decoder_architecture:
        n_kv = cfg.effective_kv_heads
        rep = nh // n_kv
        qkv = fused_qkv.reshape(b, s, n_kv, rep + 2, hd)
        q = qkv[:, :, :, :-2].reshape(b, s, nh, hd)
        return q, qkv[:, :, :, -2], qkv[:, :, :, -1]
    if not cfg.multi_query:
        qkv = fused_qkv.reshape(b, s, nh, 3, hd)
        return qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    qkv = fused_qkv.reshape(b, s, nh + 2, hd)
    return qkv[..., :-2, :], qkv[..., -2:-1, :], qkv[..., -1:, :]


def alibi_slopes(n_heads: int) -> jax.Array:
    """Standard ALiBi head slopes."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        slopes = pow2_slopes(n_heads)
    else:
        closest = 2 ** math.floor(math.log2(n_heads))
        slopes = pow2_slopes(closest)
        extra = pow2_slopes(2 * closest)[0::2][: n_heads - closest]
        slopes = slopes + extra
    return jnp.asarray(slopes, jnp.float32)


def block_forward(
    p: dict,
    x: jax.Array,
    cfg: FalconConfig,
    mask: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    spec: ActQuantSpec = NO_ACT_QUANT,
    kv_cache: Optional[tuple] = None,
    tap: Optional[dict] = None,
):
    """One falcon block (reference models/int_falcon_layer.py:261-315).

    Note the reference's falcon attention has no QuantMatMul — q/k/v/p sites
    are unquantized (:171-175 uses SDPA); only linear inputs go through the
    act quantizer.
    """
    b, s, h = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    residual = x
    if cfg.new_decoder_architecture:
        attn_ln_out = layer_norm(x, p["ln_attn"], cfg.layer_norm_eps)
        mlp_ln_out = layer_norm(x, p["ln_mlp"], cfg.layer_norm_eps)
    else:
        attn_ln_out = layer_norm(x, p["input_layernorm"], cfg.layer_norm_eps)
        mlp_ln_out = None

    if tap is not None:
        tap["query_key_value"] = attn_ln_out
    fused = linear(attn_ln_out, p["query_key_value"], spec.act)
    q, k, v = split_heads(fused, cfg)
    q = q.transpose(0, 2, 1, 3)  # (b, nh, s, hd)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    if positions is None:
        offset = 0 if kv_cache is None else kv_cache[0].shape[2]
        positions = jnp.arange(s) + offset
    if not cfg.alibi:
        cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta, dtype=x.dtype)
        q, k = apply_rope(q, k, cos, sin)

    if kv_cache is not None:
        k = jnp.concatenate([kv_cache[0], k], axis=2)
        v = jnp.concatenate([kv_cache[1], v], axis=2)
    new_cache = (k, v)
    kv_len = k.shape[2]

    if mask is None:
        mask = causal_mask(s, kv_len, dtype=x.dtype)
    if cfg.alibi:
        # scores = inv_norm*(q@k) + beta*alibi with beta = inv_norm
        # (reference int_falcon_layer.py:42-43; HF baddbmm formulation).
        # attention_core adds the mask post-scaling, so fold beta in here.
        dist = jnp.arange(kv_len)[None, :].astype(jnp.float32)
        bias = (alibi_slopes(nh)[:, None, None] * dist[None]
                * (1.0 / hd**0.5)).astype(x.dtype)  # (1, nh, 1, kv_len)
        mask = mask + bias[None]

    # falcon attention is unquantized at the matmul sites (no QuantMatMul)
    attn = attention_core(q, k, v, mask, 1.0 / (hd**0.5), NO_ACT_QUANT)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    if tap is not None:
        tap["dense"] = attn
    attn_out = linear(attn, p["dense"], spec.act)

    if not cfg.new_decoder_architecture:
        if cfg.parallel_attn:
            mlp_ln_out = attn_ln_out
        else:
            residual = residual + attn_out
            mlp_ln_out = layer_norm(
                residual, p["post_attention_layernorm"], cfg.layer_norm_eps)

    if tap is not None:
        tap["dense_h_to_4h"] = mlp_ln_out
    hmid = jax.nn.gelu(
        linear(mlp_ln_out, p["dense_h_to_4h"], spec.act), approximate=False)
    if tap is not None:
        tap["dense_4h_to_h"] = hmid
    mlp_out = linear(hmid, p["dense_4h_to_h"], spec.act)

    if cfg.new_decoder_architecture or cfg.parallel_attn:
        mlp_out = mlp_out + attn_out
    return residual + mlp_out, new_cache


def effective_block_weights(
    p: dict,
    wcfg: Optional[QuantConfig],
    lwc_params: Optional[dict] = None,
    let_params: Optional[dict] = None,
    cfg: Optional[FalconConfig] = None,
    quantize: bool = True,
) -> dict:
    if let_params:
        raise NotImplementedError(
            "falcon does not support LET (reference "
            "models/int_falcon_layer.py:330-331 raises the same)")
    p = {k: (dict(v) if isinstance(v, dict) else v) for k, v in p.items()}
    if quantize and wcfg is not None and wcfg.enabled:
        for name in LINEAR_NAMES:
            lwc = lwc_params.get(name) if lwc_params else None
            p[name] = dict(p[name])
            p[name]["weight"] = fake_quant_weight(p[name]["weight"], wcfg, lwc)
    return p


def init_let_params(p, cfg, act_scales, alpha=0.5, dtype=jnp.float32):
    raise NotImplementedError("falcon is LWC-only (no LET)")


def init_lwc_params_block(p: dict, wcfg: QuantConfig, dtype=jnp.float32) -> dict:
    from ..quant.quantizer import init_lwc_params

    return {
        name: init_lwc_params(wcfg, p[name]["weight"].shape, dtype)
        for name in LINEAR_NAMES
    }


def embed(params: dict, tokens: jax.Array, cfg=None) -> jax.Array:
    return params["word_embeddings"][tokens]


def head(params: dict, hidden: jax.Array, cfg: FalconConfig) -> jax.Array:
    hidden = layer_norm(hidden, params["ln_f"], cfg.layer_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        lm_head = params["word_embeddings"]
    if isinstance(lm_head, PackedWeight):
        # a PACKED lm_head (e.g. a speculative draft's quantized head —
        # serving/spec_decode.py pack_draft_head): fused dequant-matmul
        from ..kernels.quant_matmul import quant_matmul

        return quant_matmul(hidden, lm_head)
    return hidden @ lm_head.T


def forward(params: dict, tokens: jax.Array, cfg: FalconConfig,
            spec: ActQuantSpec = NO_ACT_QUANT) -> jax.Array:
    x = embed(params, tokens)
    s = tokens.shape[1]
    mask = None  # built per-block (alibi-aware)
    for layer in params["layers"]:
        x, _ = block_forward(layer, x, cfg, mask, jnp.arange(s), spec)
    return head(params, x, cfg)


def init_params(rng: jax.Array, cfg: FalconConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, cfg.num_hidden_layers + 2)
    h = cfg.hidden_size
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    if cfg.new_decoder_architecture:
        n_kv = cfg.effective_kv_heads
        qkv_out = n_kv * (nh // n_kv + 2) * hd
    elif cfg.multi_query:
        qkv_out = (nh + 2) * hd
    else:
        qkv_out = 3 * h

    def lin(key, out_f, in_f):
        return {
            "weight": jax.random.normal(key, (out_f, in_f), dtype) * 0.02,
            "bias": jnp.zeros((out_f,), dtype) if cfg.bias else None,
        }

    def norm():
        return {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}

    def block(key):
        ks = jax.random.split(key, 4)
        out = {
            "query_key_value": lin(ks[0], qkv_out, h),
            "dense": lin(ks[1], h, nh * hd),
            "dense_h_to_4h": lin(ks[2], 4 * h, h),
            "dense_4h_to_h": lin(ks[3], h, 4 * h),
        }
        if cfg.new_decoder_architecture:
            out["ln_attn"] = norm()
            out["ln_mlp"] = norm()
        else:
            out["input_layernorm"] = norm()
            if not cfg.parallel_attn:
                out["post_attention_layernorm"] = norm()
        return out

    return {
        "word_embeddings": jax.random.normal(
            keys[0], (cfg.vocab_size, h), dtype) * 0.02,
        "layers": [block(keys[i + 1]) for i in range(cfg.num_hidden_layers)],
        "ln_f": norm(),
        "lm_head": None,  # tied
    }


def from_hf_state_dict(sd: dict, cfg: FalconConfig, dtype=jnp.float32) -> dict:
    import numpy as np

    def arr(name):
        t = sd[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(t), dtype)

    def lin(prefix):
        out = {"weight": arr(prefix + ".weight")}
        out["bias"] = arr(prefix + ".bias") if prefix + ".bias" in sd else None
        return out

    def norm(prefix):
        return {"weight": arr(prefix + ".weight"), "bias": arr(prefix + ".bias")}

    t = "transformer."
    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"{t}h.{i}."
        blk = {
            "query_key_value": lin(pre + "self_attention.query_key_value"),
            "dense": lin(pre + "self_attention.dense"),
            "dense_h_to_4h": lin(pre + "mlp.dense_h_to_4h"),
            "dense_4h_to_h": lin(pre + "mlp.dense_4h_to_h"),
        }
        if cfg.new_decoder_architecture:
            blk["ln_attn"] = norm(pre + "ln_attn")
            blk["ln_mlp"] = norm(pre + "ln_mlp")
        else:
            blk["input_layernorm"] = norm(pre + "input_layernorm")
            if not cfg.parallel_attn:
                blk["post_attention_layernorm"] = norm(
                    pre + "post_attention_layernorm")
        layers.append(blk)
    return {
        "word_embeddings": arr(t + "word_embeddings.weight"),
        "layers": layers,
        "ln_f": norm(t + "ln_f"),
        "lm_head": arr("lm_head.weight") if "lm_head.weight" in sd else None,
    }
