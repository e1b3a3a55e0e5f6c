"""Single-host serving engine: jitted prefill/decode with slot-based
continuous batching and (optionally int8-quantized) KV cache.

Net-new relative to the reference (its deployment path delegates serving to
MLC-LLM/TVM compiled libs — SURVEY.md §2.4); this is the TPU-native engine:
  * weights may be PackedWeight (fused Pallas dequant-matmul via
    models.common.linear) or dense fake-quant pytrees — same code path;
  * static-shape KV cache (layers, B, n_kv, max_len, hd): decode is one
    jit-compiled step for ALL slots (continuous batching = slots join/leave
    between steps, shapes never change);
  * optional int8 per-token KV quantization (scale per (slot, head, pos)),
    halving cache memory vs bf16 — the quantized-KV-cache requirement from
    BASELINE.json that the reference never had.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.common import ActQuantSpec, NO_ACT_QUANT, linear, repeat_kv, rms_norm
from ..models import llama as jllama
from ..quant.packing import PackedWeight


def fuse_packed(pws: List[PackedWeight]) -> Optional[PackedWeight]:
    """Concatenate packed linears sharing in_features into one kernel call
    (qkv / gate+up fusion): lanes of qweight and rows of scales/zeros concat
    along the out axis. Cuts per-layer Pallas launches (decode is
    launch-overhead-bound at small batch)."""
    if not all(isinstance(p, PackedWeight) for p in pws):
        return None
    first = pws[0]
    if not all(
        p.bits == first.bits and p.group_size == first.group_size
        and p.in_features == first.in_features
        and p.tile_k == first.tile_k
        and p.qweight.shape[0] == first.qweight.shape[0]
        for p in pws
    ):
        return None
    biases = [p.bias for p in pws]
    if any(b is not None for b in biases):
        bias = jnp.concatenate([
            b if b is not None else jnp.zeros((p.out_features,), jnp.float32)
            for p, b in zip(pws, biases)])
    else:
        bias = None
    return PackedWeight(
        qweight=jnp.concatenate([p.qweight for p in pws], axis=1),
        scales=jnp.concatenate([p.scales for p in pws], axis=0),
        zeros=jnp.concatenate([p.zeros for p in pws], axis=0),
        bias=bias,
        bits=first.bits, group_size=first.group_size,
        in_features=first.in_features,
        out_features=sum(p.out_features for p in pws),
        tile_k=first.tile_k,
    )


@dataclasses.dataclass
class KVCache:
    """Per-layer lists of (B, n_kv, max_len, hd) arrays.

    Per-layer arrays (rather than one stacked (L, ...) tensor) let XLA alias
    each layer's donated buffer through its scatter update — with a stacked
    cache the 32 chained scatters defeated aliasing and the decode program
    tried to materialize multiple multi-GB copies (OOM at compile)."""

    k: list
    v: list
    k_scale: Optional[list]  # (B, n_kv, max_len, 1) f32 when int8
    v_scale: Optional[list]


jax.tree_util.register_pytree_node(
    KVCache,
    lambda c: ((c.k, c.v, c.k_scale, c.v_scale), None),
    lambda _, ch: KVCache(*ch),
)


def _quantize_kv(x):
    """Per-token symmetric int8 quantization over head_dim."""
    scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    codes = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return codes, scale.astype(jnp.float32)


class LlamaEngine:
    """Continuous-batching decoder for the llama family."""

    def __init__(self, params: dict, cfg: jllama.LlamaConfig,
                 max_batch: int = 8, max_len: int = 2048,
                 dtype=jnp.bfloat16, kv_dtype: str = "native",
                 spec: ActQuantSpec = NO_ACT_QUANT):
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len
        self.dtype = dtype
        self.kv_int8 = kv_dtype == "int8"
        self.spec = spec
        self.params = jax.tree.map(
            lambda x: x.astype(dtype) if (
                hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            ) else x,
            params, is_leaf=lambda x: x is None)
        # fuse qkv and gate/up packed projections into single kernel calls
        for p in self.params["layers"]:
            qkv = fuse_packed([p["q_proj"], p["k_proj"], p["v_proj"]]) if (
                isinstance(p.get("q_proj"), PackedWeight)) else None
            if qkv is not None:
                p["qkv_fused"] = qkv
            gu = fuse_packed([p["gate_proj"], p["up_proj"]]) if (
                isinstance(p.get("gate_proj"), PackedWeight)) else None
            if gu is not None:
                p["gate_up_fused"] = gu

        L = cfg.num_hidden_layers
        kv_shape = (max_batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
        if self.kv_int8:
            self.cache = KVCache(
                [jnp.zeros(kv_shape, jnp.int8) for _ in range(L)],
                [jnp.zeros(kv_shape, jnp.int8) for _ in range(L)],
                [jnp.zeros((*kv_shape[:-1], 1), jnp.float32) for _ in range(L)],
                [jnp.zeros((*kv_shape[:-1], 1), jnp.float32) for _ in range(L)])
        else:
            self.cache = KVCache(
                [jnp.zeros(kv_shape, dtype) for _ in range(L)],
                [jnp.zeros(kv_shape, dtype) for _ in range(L)],
                None, None)

        # host-side slot state
        self.lengths = np.zeros(max_batch, np.int32)
        self.active = np.zeros(max_batch, bool)

        self._prefill = jax.jit(self._prefill_impl, donate_argnums=(1,),
                                static_argnames=("seq_len",))
        self._decode = jax.jit(self._decode_impl, donate_argnums=(1,),
                               static_argnames=("kv_len",))

    # ------------------------------------------------------------------
    def _write_kv(self, cache: KVCache, li, slot, pos, k_new, v_new):
        """Write (n_kv, s, hd) k/v into cache layer li, slot, at pos."""
        upd = lambda arr, val: jax.lax.dynamic_update_slice(
            arr, val[None], (slot, 0, pos, 0))
        k, v = list(cache.k), list(cache.v)
        if self.kv_int8:
            kc, ks = _quantize_kv(k_new)
            vc, vs = _quantize_kv(v_new)
            k[li] = upd(cache.k[li], kc)
            v[li] = upd(cache.v[li], vc)
            k_s, v_s = list(cache.k_scale), list(cache.v_scale)
            k_s[li] = upd(cache.k_scale[li], ks)
            v_s[li] = upd(cache.v_scale[li], vs)
            return KVCache(k, v, k_s, v_s)
        k[li] = upd(cache.k[li], k_new.astype(cache.k[li].dtype))
        v[li] = upd(cache.v[li], v_new.astype(cache.v[li].dtype))
        return KVCache(k, v, None, None)

    def _read_kv(self, cache: KVCache, li, kv_len: Optional[int] = None):
        """-> (B, n_kv, kv_len, hd) dequantized."""
        sl = slice(None) if kv_len is None else slice(0, kv_len)
        if self.kv_int8:
            k = (cache.k[li][:, :, sl].astype(self.dtype)
                 * cache.k_scale[li][:, :, sl].astype(self.dtype))
            v = (cache.v[li][:, :, sl].astype(self.dtype)
                 * cache.v_scale[li][:, :, sl].astype(self.dtype))
            return k, v
        return cache.k[li][:, :, sl], cache.v[li][:, :, sl]

    # ------------------------------------------------------------------
    def _attn_qkv(self, p, hidden, positions):
        cfg = self.cfg
        b, s, _ = hidden.shape
        q_dim = cfg.num_attention_heads * cfg.head_dim
        kv_dim = cfg.num_key_value_heads * cfg.head_dim
        if "qkv_fused" in p:
            qkv = linear(hidden, p["qkv_fused"], self.spec.act)
            q = qkv[..., :q_dim]
            k = qkv[..., q_dim : q_dim + kv_dim]
            v = qkv[..., q_dim + kv_dim :]
        else:
            q = linear(hidden, p["q_proj"], self.spec.act)
            k = linear(hidden, p["k_proj"], self.spec.act)
            v = linear(hidden, p["v_proj"], self.spec.act)
        q = q.reshape(
            b, s, cfg.num_attention_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(
            b, s, cfg.num_key_value_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(
            b, s, cfg.num_key_value_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        cos, sin = jllama.rope_cos_sin(
            positions, cfg.head_dim, cfg.rope_theta, dtype=hidden.dtype)
        q, k = jllama.apply_rope(q, k, cos, sin)
        return q, k, v

    def _mlp(self, p, x):
        h = rms_norm(x, p["post_attention_layernorm"], self.cfg.rms_norm_eps)
        if "gate_up_fused" in p:
            gu = linear(h, p["gate_up_fused"], self.spec.act)
            i = self.cfg.intermediate_size
            gate, up = gu[..., :i], gu[..., i:]
        else:
            gate = linear(h, p["gate_proj"], self.spec.act)
            up = linear(h, p["up_proj"], self.spec.act)
        return x + linear(jax.nn.silu(gate) * up, p["down_proj"], self.spec.act)

    # ------------------------------------------------------------------
    def _prefill_impl(self, params, cache: KVCache, tokens, slot, last_idx,
                      seq_len: int):
        """Prefill one slot with `tokens` (1, seq_len — bucket-padded);
        returns (cache, logits at position last_idx)."""
        cfg = self.cfg
        x = jllama.embed(params, tokens).astype(self.dtype)
        positions = jnp.arange(seq_len)
        neg = jnp.finfo(self.dtype).min
        mask = jnp.where(
            positions[None, :] <= positions[:, None], 0.0, neg
        ).astype(self.dtype)[None, None]
        for li, p in enumerate(params["layers"]):
            residual = x
            hidden = rms_norm(x, p["input_layernorm"], cfg.rms_norm_eps)
            q, k, v = self._attn_qkv(p, hidden, positions)
            cache = self._write_kv(cache, li, slot, 0, k[0], v[0])
            k_r, v_r = repeat_kv(k, cfg.n_rep), repeat_kv(v, cfg.n_rep)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_r) / (cfg.head_dim**0.5)
            probs = jax.nn.softmax(
                (scores + mask).astype(jnp.float32), axis=-1).astype(self.dtype)
            attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v_r)
            attn = attn.transpose(0, 2, 1, 3).reshape(1, seq_len, -1)
            x = residual + linear(attn, p["o_proj"], self.spec.act)
            x = self._mlp(p, x)
        last = jax.lax.dynamic_slice_in_dim(x, last_idx, 1, axis=1)
        logits = jllama.head(params, last, cfg)
        return cache, logits[:, 0]

    def _decode_impl(self, params, cache: KVCache, last_tokens, lengths,
                     kv_len: int):
        """One decode step for all slots. last_tokens (B,), lengths (B,)
        = tokens already in cache. kv_len (static) bounds the attention
        window — the cache is only *read* up to kv_len slots (caller buckets
        it), so per-step HBM traffic scales with the live sequence length,
        not max_len. Returns (cache, logits (B, V))."""
        cfg = self.cfg
        B = self.max_batch
        x = jllama.embed(params, last_tokens[:, None]).astype(self.dtype)
        positions = lengths[:, None]  # (B, 1)
        kv_positions = jnp.arange(kv_len)
        neg = jnp.finfo(self.dtype).min
        # slot mask: attend to cache positions < length, plus self (written below)
        mask = jnp.where(
            kv_positions[None, :] <= lengths[:, None], 0.0, neg
        ).astype(self.dtype)[:, None, None, :]  # (B, 1, 1, kv_len)
        b_idx = jnp.arange(B)

        for li, p in enumerate(params["layers"]):
            residual = x
            hidden = rms_norm(x, p["input_layernorm"], cfg.rms_norm_eps)
            q, k, v = self._attn_qkv(p, hidden, positions)
            # scatter each slot's new kv at (slot, :, lengths[slot], :) —
            # touches B*n_kv*hd elements, not the whole cache
            ck, cv = list(cache.k), list(cache.v)
            if self.kv_int8:
                kc, ks = _quantize_kv(k[:, :, 0])
                vc, vs = _quantize_kv(v[:, :, 0])
                cks, cvs = list(cache.k_scale), list(cache.v_scale)
                ck[li] = cache.k[li].at[b_idx, :, lengths, :].set(kc)
                cv[li] = cache.v[li].at[b_idx, :, lengths, :].set(vc)
                cks[li] = cache.k_scale[li].at[b_idx, :, lengths, :].set(ks)
                cvs[li] = cache.v_scale[li].at[b_idx, :, lengths, :].set(vs)
                cache = KVCache(ck, cv, cks, cvs)
            else:
                ck[li] = cache.k[li].at[b_idx, :, lengths, :].set(
                    k[:, :, 0].astype(cache.k[li].dtype))
                cv[li] = cache.v[li].at[b_idx, :, lengths, :].set(
                    v[:, :, 0].astype(cache.v[li].dtype))
                cache = KVCache(ck, cv, None, None)

            k_all, v_all = self._read_kv(cache, li, kv_len)
            k_r = repeat_kv(k_all, cfg.n_rep)
            v_r = repeat_kv(v_all, cfg.n_rep)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_r) / (cfg.head_dim**0.5)
            probs = jax.nn.softmax(
                (scores + mask).astype(jnp.float32), axis=-1).astype(self.dtype)
            attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v_r)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, 1, -1)
            x = residual + linear(attn, p["o_proj"], self.spec.act)
            x = self._mlp(p, x)
        logits = jllama.head(params, x, cfg)
        return cache, logits[:, 0]

    # ------------------------------------------------------------------
    # host-side continuous batching API
    def add_request(self, tokens) -> int:
        """Prefill `tokens` (list[int]) into a free slot; returns slot id."""
        free = np.where(~self.active)[0]
        if len(free) == 0:
            raise RuntimeError("no free slots")
        slot = int(free[0])
        t = np.asarray(tokens, np.int32)
        # bucket prompt lengths to powers of two so prefill compiles O(log)
        # distinct shapes; pads land beyond `length` and are never attended
        bucket = max(16, 1 << int(np.ceil(np.log2(len(t)))))
        padded = np.zeros(bucket, np.int32)
        padded[: len(t)] = t
        self.cache, logits = self._prefill(
            self.params, self.cache, jnp.asarray(padded[None]), slot,
            len(t) - 1, seq_len=bucket)
        self.active[slot] = True
        self.lengths[slot] = len(tokens)
        self._last_logits = np.asarray(logits)
        self._pending_next = {slot: int(np.argmax(self._last_logits[0]))}
        return slot

    def release(self, slot: int):
        self.active[slot] = False
        self.lengths[slot] = 0

    def step(self, last_tokens: dict) -> dict:
        """One decode step. last_tokens: {slot: token}. Returns
        {slot: next_token_logits_argmax} for active slots."""
        toks = np.zeros(self.max_batch, np.int32)
        for s, t in last_tokens.items():
            toks[s] = t
        # bucket the attention window to the next power of two above the
        # longest live sequence (+1 for the token written this step)
        longest = int(self.lengths[self.active].max()) if self.active.any() else 0
        kv_len = min(self.max_len,
                     max(64, 1 << int(np.ceil(np.log2(longest + 1)))))
        self.cache, logits = self._decode(
            self.params, self.cache, jnp.asarray(toks),
            jnp.asarray(self.lengths), kv_len=kv_len)
        out = {}
        logits = np.asarray(logits)
        for s in last_tokens:
            self.lengths[s] += 1
            out[s] = int(np.argmax(logits[s]))
        return out

    def generate(self, prompt_tokens, max_new_tokens: int = 32) -> list:
        """Greedy single-request convenience wrapper."""
        slot = self.add_request(prompt_tokens)
        next_tok = self._pending_next[slot]
        out = [next_tok]
        for _ in range(max_new_tokens - 1):
            res = self.step({slot: next_tok})
            next_tok = res[slot]
            out.append(next_tok)
        self.release(slot)
        return out
