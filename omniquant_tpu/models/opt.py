"""OPT — pure-function JAX implementation with quant hook points.

Functional re-design of the reference's QuantOPTDecoderLayer
(models/int_opt_layer.py): LayerNorm with bias, biased linears, ReLU MLP,
learned positional embeddings with the OPT +2 offset, q pre-scaled by
head_dim**-0.5 before its quantizer (reference :96-97).

LET sites (reference int_opt_layer.py:385-398): self_attn_ln->{q,k,v},
final_ln->{fc1}, v->out_proj, q<->k; fc2 is NOT transformed.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..quant.quantizer import QuantConfig, fake_quant_weight
from ..quant.transform import smooth_fc_fc, smooth_ln_fcs, smooth_q_k, truncate_number
from ..quant.packing import PackedWeight
from .common import (
    ActQuantSpec,
    NO_ACT_QUANT,
    attention_core,
    causal_mask,
    layer_norm,
    linear,
)

LINEAR_NAMES = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 2048
    word_embed_proj_dim: Optional[int] = None  # != hidden_size => project_in/out
    do_layer_norm_before: bool = True
    enable_bias: bool = True
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, hf_config) -> "OPTConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            ffn_dim=hf_config.ffn_dim,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            word_embed_proj_dim=(
                hf_config.word_embed_proj_dim
                if hf_config.word_embed_proj_dim != hf_config.hidden_size
                else None
            ),
            do_layer_norm_before=hf_config.do_layer_norm_before,
            enable_bias=getattr(hf_config, "enable_bias", True),
        )


def block_forward(
    p: dict,
    x: jax.Array,  # (b, s, h)
    cfg: OPTConfig,
    mask: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,  # unused (positions live in embed)
    spec: ActQuantSpec = NO_ACT_QUANT,
    kv_cache: Optional[tuple] = None,
    tap: Optional[dict] = None,
    attn_impl=None,
):
    """One OPT decoder block (reference models/int_opt_layer.py:268-346).

    Quantizer placement matches the reference: q scaled then q-quantized
    pre-reshape (:96-97), k/v quantized per-token pre-reshape (:107,118),
    probs through p-quantizer post-softmax (:196).

    `attn_impl`, when given, replaces attention_core (the sequence-
    parallel calibration hook, as in llama.block_forward): it receives
    the ALREADY-quantized q/k/v (OPT's reference sites quantize
    pre-reshape) with a p-only spec, so the hook's own q/k/v quantizers
    are identities and semantics stay reference-exact.
    """
    b, s, h = x.shape
    n_heads, hd = cfg.num_attention_heads, cfg.head_dim

    residual = x
    hidden = x
    if cfg.do_layer_norm_before:
        hidden = layer_norm(hidden, p["self_attn_layer_norm"], cfg.layer_norm_eps)
    if tap is not None:
        tap["q_proj"] = tap["k_proj"] = tap["v_proj"] = hidden

    q = linear(hidden, p["q_proj"], spec.act) * (hd ** -0.5)
    from .common import maybe_quant

    q = maybe_quant(q, spec.q)
    k = maybe_quant(linear(hidden, p["k_proj"], spec.act), spec.k)
    v = maybe_quant(linear(hidden, p["v_proj"], spec.act), spec.v)

    q = q.reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)

    if kv_cache is not None:
        k = jnp.concatenate([kv_cache[0], k], axis=2)
        v = jnp.concatenate([kv_cache[1], v], axis=2)
    new_cache = (k, v)

    # q/k/v already quantized at the reference's sites; pass a spec with only
    # the p quantizer active so attention_core doesn't double-quantize.
    p_only = ActQuantSpec(p=spec.p)
    if attn_impl is not None:
        attn = attn_impl(q, k, v, p_only)
    else:
        if mask is None:
            mask = causal_mask(s, k.shape[2], dtype=x.dtype)
        attn = attention_core(q, k, v, mask, 1.0, p_only)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h)
    if tap is not None:
        tap["out_proj"] = attn
    attn_out = linear(attn, p["out_proj"], spec.act)
    x = residual + attn_out
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, p["self_attn_layer_norm"], cfg.layer_norm_eps)

    residual = x
    hidden = x
    if cfg.do_layer_norm_before:
        hidden = layer_norm(hidden, p["final_layer_norm"], cfg.layer_norm_eps)
    if tap is not None:
        tap["fc1"] = hidden
    hidden = jax.nn.relu(linear(hidden, p["fc1"], spec.act))
    if tap is not None:
        tap["fc2"] = hidden
    hidden = linear(hidden, p["fc2"], spec.act)
    x = residual + hidden
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, p["final_layer_norm"], cfg.layer_norm_eps)
    return x, new_cache


# ---------------------------------------------------------------------------
# LET + LWC
# ---------------------------------------------------------------------------

def init_let_params(p: dict, cfg: OPTConfig, act_scales: Optional[dict],
                    act_shifts: Optional[dict], alpha: float = 0.5,
                    dtype=jnp.float32) -> dict:
    """Reference init (quantize/omniquant.py:182-197): scale from
    act^alpha / colmax|W|^(1-alpha); OPT (non-llama) gets real shifts from
    the EMA midrange stats."""
    def scale_for(name, dim):
        w = p[name]["weight"]
        # plain max, not absmax — matches reference omniquant.py:191 exactly
        wmax = jnp.clip(jnp.max(w, axis=0), 1e-5, None)
        if act_scales is not None and name in act_scales:
            a = jnp.clip(jnp.asarray(act_scales[name], dtype), 1e-5, None)
        else:
            a = jnp.ones((dim,), dtype)
        return jnp.clip(a**alpha / wmax ** (1 - alpha), 1e-5, None).astype(dtype)

    def shift_for(name, dim):
        if act_shifts is not None and name in act_shifts:
            return jnp.asarray(act_shifts[name], dtype)
        return jnp.zeros((dim,), dtype)

    h = cfg.hidden_size
    return {
        "qkv_smooth_scale": scale_for("q_proj", h),
        "qkv_smooth_shift": shift_for("q_proj", h),
        "fc1_smooth_scale": scale_for("fc1", h),
        "fc1_smooth_shift": shift_for("fc1", h),
        "out_smooth_scale": scale_for("out_proj", h),
        "out_smooth_shift": shift_for("out_proj", h),
        "qkt_smooth_scale": jnp.ones((h,), dtype),
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
    cfg: Optional[OPTConfig] = None,
    quantize: bool = True,
) -> dict:
    """LET smoothing + LWC fake-quant for an OPT block (functional analog of
    reference int_opt_layer.py:385-413)."""
    p = {k: (dict(v) if isinstance(v, dict) else v) for k, v in p.items()}
    if let_params is not None:
        t = {
            k: (truncate_number(v) if "smooth_scale" in k else v)
            for k, v in let_params.items()
        }
        ln, fcs = smooth_ln_fcs(
            p["self_attn_layer_norm"],
            [p["q_proj"], p["k_proj"], p["v_proj"]],
            t["qkv_smooth_scale"], t["qkv_smooth_shift"],
        )
        p["self_attn_layer_norm"], (p["q_proj"], p["k_proj"], p["v_proj"]) = ln, fcs
        ln, fcs = smooth_ln_fcs(
            p["final_layer_norm"], [p["fc1"]],
            t["fc1_smooth_scale"], t["fc1_smooth_shift"],
        )
        p["final_layer_norm"], (p["fc1"],) = ln, fcs
        p["v_proj"], p["out_proj"] = smooth_fc_fc(
            p["v_proj"], p["out_proj"],
            t["out_smooth_scale"], t["out_smooth_shift"],
        )
        p["q_proj"], p["k_proj"] = smooth_q_k(
            p["q_proj"], p["k_proj"], t["qkt_smooth_scale"],
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

def embed(params: dict, tokens: jax.Array, cfg: OPTConfig) -> jax.Array:
    """Token + learned positional embeddings (OPT's +2 offset)."""
    x = params["embed_tokens"][tokens]
    if params.get("project_in") is not None:
        x = linear(x, params["project_in"])
    s = tokens.shape[1]
    pos = params["embed_positions"][jnp.arange(s) + 2]
    return x + pos


def head(params: dict, hidden: jax.Array, cfg: OPTConfig) -> jax.Array:
    if params.get("final_layer_norm") is not None and cfg.do_layer_norm_before:
        hidden = layer_norm(hidden, params["final_layer_norm"], cfg.layer_norm_eps)
    if params.get("project_out") is not None:
        hidden = linear(hidden, params["project_out"])
    lm_head = params.get("lm_head")
    if lm_head is None:
        lm_head = params["embed_tokens"]
    if isinstance(lm_head, PackedWeight):
        # a PACKED lm_head (e.g. a speculative draft's quantized head —
        # serving/spec_decode.py pack_draft_head): fused dequant-matmul
        from ..kernels.quant_matmul import quant_matmul

        return quant_matmul(hidden, lm_head)
    return hidden @ lm_head.T


def forward(params: dict, tokens: jax.Array, cfg: OPTConfig,
            spec: ActQuantSpec = NO_ACT_QUANT) -> jax.Array:
    x = embed(params, tokens, cfg)
    s = tokens.shape[1]
    mask = causal_mask(s, s, dtype=x.dtype)
    for layer in params["layers"]:
        x, _ = block_forward(layer, x, cfg, mask, spec=spec)
    return head(params, x, cfg)


def init_params(rng: jax.Array, cfg: OPTConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, cfg.num_hidden_layers + 3)

    def lin(key, out_f, in_f, bias=True):
        return {
            "weight": jax.random.normal(key, (out_f, in_f), dtype) * 0.02,
            "bias": jnp.zeros((out_f,), dtype) if bias else None,
        }

    def norm(h):
        return {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}

    def block(key):
        h, f = cfg.hidden_size, cfg.ffn_dim
        ks = jax.random.split(key, 6)
        return {
            "self_attn_layer_norm": norm(h),
            "final_layer_norm": norm(h),
            "q_proj": lin(ks[0], h, h),
            "k_proj": lin(ks[1], h, h),
            "v_proj": lin(ks[2], h, h),
            "out_proj": lin(ks[3], h, h),
            "fc1": lin(ks[4], f, h),
            "fc2": lin(ks[5], h, f),
        }

    return {
        "embed_tokens": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02,
        "embed_positions": jax.random.normal(
            keys[1], (cfg.max_position_embeddings + 2, cfg.hidden_size), dtype
        ) * 0.02,
        "project_in": None,
        "project_out": None,
        "layers": [block(keys[i + 2]) for i in range(cfg.num_hidden_layers)],
        "final_layer_norm": {
            "weight": jnp.ones((cfg.hidden_size,), dtype),
            "bias": jnp.zeros((cfg.hidden_size,), dtype),
        },
        "lm_head": None,  # tied to embed_tokens
    }


def from_hf_state_dict(sd: dict, cfg: OPTConfig, dtype=jnp.float32) -> dict:
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

    d = "model.decoder."
    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"{d}layers.{i}."
        layers.append({
            "self_attn_layer_norm": norm(pre + "self_attn_layer_norm"),
            "final_layer_norm": norm(pre + "final_layer_norm"),
            "q_proj": lin(pre + "self_attn.q_proj"),
            "k_proj": lin(pre + "self_attn.k_proj"),
            "v_proj": lin(pre + "self_attn.v_proj"),
            "out_proj": lin(pre + "self_attn.out_proj"),
            "fc1": lin(pre + "fc1"),
            "fc2": lin(pre + "fc2"),
        })
    return {
        "embed_tokens": arr(d + "embed_tokens.weight"),
        "embed_positions": arr(d + "embed_positions.weight"),
        "project_in": (
            lin(d + "project_in") if d + "project_in.weight" in sd else None
        ),
        "project_out": (
            lin(d + "project_out") if d + "project_out.weight" in sd else None
        ),
        "layers": layers,
        "final_layer_norm": (
            norm(d + "final_layer_norm")
            if d + "final_layer_norm.weight" in sd else None
        ),
        "lm_head": arr("lm_head.weight") if "lm_head.weight" in sd else None,
    }
