"""LLaMA / Llama-2 — pure-function JAX implementation with quant hook points.

Functional re-design of the reference's QuantLlamaDecoderLayer
(models/int_llama_layer.py): parameters are plain pytrees, the block forward
is a pure function, and the LET "temporary smoothing" becomes a pure
params -> params transform (effective_block_weights) that jax.grad
differentiates through — no module state.

Param layout per block (torch (out, in) weight convention):
  input_layernorm / post_attention_layernorm: {'weight', optional 'bias'}
  q_proj k_proj v_proj o_proj gate_proj up_proj down_proj:
      {'weight', optional 'bias'}
LET sites (reference int_llama_layer.py:279-307): input_ln->{q,k,v},
post_ln->{up,gate}, v->o, q<->k; down_proj is NOT transformed.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..quant.quantizer import QuantConfig, fake_quant_weight
from ..quant.transform import (
    smooth_fc_fc_gqa,
    smooth_ln_fcs,
    smooth_q_k,
    truncate_number,
)
from ..quant.packing import PackedWeight
from .common import (
    ActQuantSpec,
    NO_ACT_QUANT,
    attention_core,
    causal_mask,
    linear,
    repeat_kv,
    rms_norm,
)

LINEAR_NAMES = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"
)


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def n_rep(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @classmethod
    def from_hf(cls, hf_config) -> "LlamaConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            num_key_value_heads=getattr(
                hf_config, "num_key_value_heads", hf_config.num_attention_heads
            ),
            max_position_embeddings=hf_config.max_position_embeddings,
            rms_norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        )


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float,
                 dtype=jnp.float32):
    """cos/sin tables (..., seq, head_dim), HF duplicated-halves layout."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., s, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q,k: (b, heads, s, hd); cos/sin: (s, hd) or (b, s, hd)."""
    if cos.ndim == 2:
        cos = cos[None, None]
        sin = sin[None, None]
    else:
        cos = cos[:, None]
        sin = sin[:, None]
    return q * cos + rotate_half(q) * sin, k * cos + rotate_half(k) * sin


# ---------------------------------------------------------------------------
# Block forward
# ---------------------------------------------------------------------------

def block_forward(
    p: dict,
    x: jax.Array,  # (b, s, h)
    cfg: LlamaConfig,
    mask: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    spec: ActQuantSpec = NO_ACT_QUANT,
    kv_cache: Optional[tuple] = None,
    tap: Optional[dict] = None,
    attn_impl=None,
):
    """One decoder block. Returns (y, new_kv_cache).

    Mirrors reference QuantLlamaDecoderLayer.forward + QuantLlamaAttention
    (models/int_llama_layer.py:103-267): pre-norm attention with RoPE + GQA,
    q/k/v/p fake-quant at the attention matmuls, pre-norm SwiGLU MLP.

    `tap`, when a dict, collects each linear's input activation (the
    functional analog of the reference's forward hooks in
    generate_act_scale_shift.py:25-57).

    `attn_impl`, when given, replaces attention_core:
    attn_impl(q, k_rep, v_rep, spec) -> (b, h, s, hd) — the hook
    sequence-parallel calibration uses to run ring attention over an sp
    mesh axis (parallel/sp_calib.py); positions must then be the GLOBAL
    positions of this shard's rows.
    """
    b, s, h = x.shape
    hd, n_heads, n_kv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads

    residual = x
    hidden = rms_norm(x, p["input_layernorm"], cfg.rms_norm_eps)
    if tap is not None:
        tap["q_proj"] = tap["k_proj"] = tap["v_proj"] = hidden

    q = linear(hidden, p["q_proj"], spec.act).reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)
    k = linear(hidden, p["k_proj"], spec.act).reshape(b, s, n_kv, hd).transpose(0, 2, 1, 3)
    v = linear(hidden, p["v_proj"], spec.act).reshape(b, s, n_kv, hd).transpose(0, 2, 1, 3)

    if positions is None:
        offset = 0 if kv_cache is None else kv_cache[0].shape[2]
        positions = jnp.arange(s) + offset
    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta, dtype=x.dtype)
    q, k = apply_rope(q, k, cos, sin)

    if kv_cache is not None:
        k = jnp.concatenate([kv_cache[0], k], axis=2)
        v = jnp.concatenate([kv_cache[1], v], axis=2)
    new_cache = (k, v)

    k_r = repeat_kv(k, cfg.n_rep)
    v_r = repeat_kv(v, cfg.n_rep)
    if attn_impl is not None:
        attn = attn_impl(q, k_r, v_r, spec)
    else:
        if mask is None:
            mask = causal_mask(s, k_r.shape[2], dtype=x.dtype)
        attn = attention_core(q, k_r, v_r, mask, 1.0 / (hd ** 0.5), spec)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, n_heads * hd)
    if tap is not None:
        tap["o_proj"] = attn
    attn_out = linear(attn, p["o_proj"], spec.act)
    x = residual + attn_out

    residual = x
    hidden = rms_norm(x, p["post_attention_layernorm"], cfg.rms_norm_eps)
    if tap is not None:
        tap["gate_proj"] = tap["up_proj"] = hidden
    gate = linear(hidden, p["gate_proj"], spec.act)
    up = linear(hidden, p["up_proj"], spec.act)
    mlp_in = jax.nn.silu(gate) * up
    if tap is not None:
        tap["down_proj"] = mlp_in
    mlp_out = linear(mlp_in, p["down_proj"], spec.act)
    return residual + mlp_out, new_cache


# ---------------------------------------------------------------------------
# LET + LWC: effective weights (the functional smooth_and_quant_temporary)
# ---------------------------------------------------------------------------

def init_let_params(p: dict, cfg: LlamaConfig, act_scales: Optional[dict],
                    alpha: float = 0.5, dtype=jnp.float32) -> dict:
    """Initialize LET scale/shift params for one block.

    scale = act_scale^alpha / colmax(W)^(1-alpha), clamped >= 1e-5
    (reference quantize/omniquant.py:182-197); shifts start at zero for
    llama (reference :192-195); qkt scale starts at ones (:184).
    act_scales keys: 'q_proj', 'up_proj', 'o_proj' per-block slices.

    NOTE: the reference's weight statistic is the PLAIN per-column max
    (`module.weight.max(dim=0)[0].clamp(min=1e-5)`, omniquant.py:191), not
    the absolute max — columns whose max is negative clamp to 1e-5. We
    reproduce that exactly (verified in tests/test_reference_parity.py).
    """
    def scale_for(name, fallback_dim):
        w = p[name]["weight"]
        wmax = jnp.clip(jnp.max(w, axis=0), 1e-5, None)
        if act_scales is not None and name in act_scales:
            a = jnp.clip(jnp.asarray(act_scales[name], dtype), 1e-5, None)
        else:
            a = jnp.ones((fallback_dim,), dtype)
        return jnp.clip(a**alpha / wmax ** (1 - alpha), 1e-5, None).astype(dtype)

    h = cfg.hidden_size
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    return {
        "qkv_smooth_scale": scale_for("q_proj", h),
        "qkv_smooth_shift": jnp.zeros((h,), dtype),
        "fc1_smooth_scale": scale_for("up_proj", h),
        "fc1_smooth_shift": jnp.zeros((h,), dtype),
        "out_smooth_scale": (
            scale_for("o_proj", kv_dim)[:kv_dim]
            if cfg.n_rep == 1
            else jnp.ones((kv_dim,), dtype)
        ),
        "out_smooth_shift": jnp.zeros((kv_dim,), dtype),
        "qkt_smooth_scale": jnp.ones((kv_dim,), dtype),
    }


def init_lwc_params_block(p: dict, wcfg: QuantConfig, dtype=jnp.float32) -> dict:
    from ..quant.quantizer import init_lwc_params

    return {
        name: init_lwc_params(wcfg, p[name]["weight"].shape, dtype)
        for name in LINEAR_NAMES
    }


def effective_block_weights(
    p: dict,
    wcfg: Optional[QuantConfig],
    lwc_params: Optional[dict] = None,
    let_params: Optional[dict] = None,
    cfg: Optional[LlamaConfig] = None,
    quantize: bool = True,
) -> dict:
    """Apply LET smoothing then LWC weight fake-quant, functionally.

    The pure-function analog of smooth_and_quant_temporary
    (reference models/int_llama_layer.py:279-307); with quantize=False it is
    the fold-only path (smooth_and_quant_inplace minus the hard quant).
    Differentiable w.r.t. let_params and lwc_params.
    """
    p = {k: (dict(v) if isinstance(v, dict) else v) for k, v in p.items()}
    if let_params is not None:
        t = {
            k: (truncate_number(v) if "smooth_scale" in k else v)
            for k, v in let_params.items()
        }
        ln, fcs = smooth_ln_fcs(
            p["input_layernorm"],
            [p["q_proj"], p["k_proj"], p["v_proj"]],
            t["qkv_smooth_scale"], t["qkv_smooth_shift"],
        )
        p["input_layernorm"], (p["q_proj"], p["k_proj"], p["v_proj"]) = ln, fcs
        ln, fcs = smooth_ln_fcs(
            p["post_attention_layernorm"],
            [p["up_proj"], p["gate_proj"]],
            t["fc1_smooth_scale"], t["fc1_smooth_shift"],
        )
        p["post_attention_layernorm"], (p["up_proj"], p["gate_proj"]) = ln, fcs
        p["v_proj"], p["o_proj"] = smooth_fc_fc_gqa(
            p["v_proj"], p["o_proj"],
            t["out_smooth_scale"], t["out_smooth_shift"],
            head_dim=cfg.head_dim, n_rep=cfg.n_rep,
        )
        p["q_proj"], p["k_proj"] = smooth_q_k(
            p["q_proj"], p["k_proj"], t["qkt_smooth_scale"],
            head_dim=cfg.head_dim, n_rep=cfg.n_rep,
        )
    if quantize and wcfg is not None and wcfg.enabled:
        for name in LINEAR_NAMES:
            lwc = lwc_params.get(name) if lwc_params else None
            p[name] = dict(p[name])
            p[name]["weight"] = fake_quant_weight(p[name]["weight"], wcfg, lwc)
    return p


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def embed(params: dict, tokens: jax.Array) -> jax.Array:
    return params["embed_tokens"][tokens]


def head(params: dict, hidden: jax.Array, cfg: LlamaConfig) -> jax.Array:
    hidden = rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        lm_head = params["embed_tokens"]
    if isinstance(lm_head, PackedWeight):
        # a PACKED lm_head (e.g. a speculative draft's quantized head —
        # serving/spec_decode.py pack_draft_head): fused dequant-matmul
        from ..kernels.quant_matmul import quant_matmul

        return quant_matmul(hidden, lm_head)
    return hidden @ lm_head.T


def forward(
    params: dict,
    tokens: jax.Array,  # (b, s)
    cfg: LlamaConfig,
    spec: ActQuantSpec = NO_ACT_QUANT,
) -> jax.Array:
    """Full causal-LM forward -> logits (b, s, vocab)."""
    x = embed(params, tokens)
    s = tokens.shape[1]
    mask = causal_mask(s, s, dtype=x.dtype)
    positions = jnp.arange(s)
    for layer in params["layers"]:
        x, _ = block_forward(layer, x, cfg, mask, positions, spec)
    return head(params, x, cfg)


# ---------------------------------------------------------------------------
# Init / HF conversion
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    """Random init (tests/benchmarks only)."""
    keys = jax.random.split(rng, cfg.num_hidden_layers + 2)

    def lin(key, out_f, in_f):
        return {
            "weight": (jax.random.normal(key, (out_f, in_f), dtype)
                       * (0.02)).astype(dtype),
            "bias": None,
        }

    def block(key):
        h, i = cfg.hidden_size, cfg.intermediate_size
        kv = cfg.num_key_value_heads * cfg.head_dim
        ks = jax.random.split(key, 7)
        return {
            "input_layernorm": {"weight": jnp.ones((h,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((h,), dtype)},
            "q_proj": lin(ks[0], h, h),
            "k_proj": lin(ks[1], kv, h),
            "v_proj": lin(ks[2], kv, h),
            "o_proj": lin(ks[3], h, h),
            "gate_proj": lin(ks[4], i, h),
            "up_proj": lin(ks[5], i, h),
            "down_proj": lin(ks[6], h, i),
        }

    return {
        "embed_tokens": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02,
        "layers": [block(keys[i + 1]) for i in range(cfg.num_hidden_layers)],
        "norm": {"weight": jnp.ones((cfg.hidden_size,), dtype)},
        "lm_head": None if cfg.tie_word_embeddings else jax.random.normal(
            keys[-1], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02,
    }


def from_hf_state_dict(sd: dict, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    """Convert an HF LlamaForCausalLM state_dict (torch tensors or numpy)
    into our pytree layout."""
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

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}."
        layers.append({
            "input_layernorm": {"weight": arr(pre + "input_layernorm.weight")},
            "post_attention_layernorm": {
                "weight": arr(pre + "post_attention_layernorm.weight")},
            "q_proj": lin(pre + "self_attn.q_proj"),
            "k_proj": lin(pre + "self_attn.k_proj"),
            "v_proj": lin(pre + "self_attn.v_proj"),
            "o_proj": lin(pre + "self_attn.o_proj"),
            "gate_proj": lin(pre + "mlp.gate_proj"),
            "up_proj": lin(pre + "mlp.up_proj"),
            "down_proj": lin(pre + "mlp.down_proj"),
        })
    return {
        "embed_tokens": arr("model.embed_tokens.weight"),
        "layers": layers,
        "norm": {"weight": arr("model.norm.weight")},
        "lm_head": arr("lm_head.weight") if "lm_head.weight" in sd else None,
    }
