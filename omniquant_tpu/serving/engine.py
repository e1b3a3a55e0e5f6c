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

from ..kernels.kv_update import (
    kv_cache_prefill_write, kv_cache_write, kv_cache_write_span,
    scale_plane_init, scale_plane_view, scale_plane_write_span)
from ..models.common import (
    ActQuantSpec, NO_ACT_QUANT, linear, maybe_quant, repeat_kv, rms_norm)
from ..models import llama as jllama
from ..quant.packing import PackedWeight
from .sampling import sample_tokens


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
        and p.layout == first.layout
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
        layout=first.layout,
    )


@dataclasses.dataclass
class KVCache:
    """Per-layer lists of (B, n_kv, max_len, hd) arrays.

    Per-layer arrays (rather than one stacked (L, ...) tensor) let XLA alias
    each layer's donated buffer through its update — with a stacked cache
    the 32 chained updates defeated aliasing and the decode program tried to
    materialize multiple multi-GB copies (OOM at compile).

    All cache WRITES go through the Pallas kernels in kernels/kv_update
    (kv_cache_write / kv_cache_prefill_write): XLA lowers the per-slot
    scatter to a full-buffer copy (~0.4 ms per 67 MB buffer — 52 of the
    round-1 decode step's 70 ms of device time were these copies); the
    kernels DMA only the touched tiles into the aliased buffer."""

    k: list
    v: list
    k_scale: Optional[list]  # (B, n_kv, s8, 128) f32 scale planes when int8
    v_scale: Optional[list]  # position p at (p // 128, p % 128) — kv_update


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
                 spec: ActQuantSpec = NO_ACT_QUANT,
                 attn_kernel: Optional[bool] = None, seed: int = 0,
                 flash_min_len: int = 256,
                 auto_grow: bool = False, grow_limit: Optional[int] = None):
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len
        # growing KV cache: when a slot would outrun max_len, double the
        # cache buffers (old contents copied in) instead of refusing — the
        # serving-beyond-the-bucket-ceiling story (VERDICT r2 missing #4).
        # Each growth recompiles the step programs at the new shapes, so
        # it amortizes like the prompt/kv bucketing already does.
        self.auto_grow = auto_grow
        self.grow_limit = grow_limit or getattr(
            cfg, "max_position_embeddings", 0) or (max_len * 16)
        self.dtype = dtype
        self.kv_int8 = kv_dtype == "int8"
        # fused int8-KV Pallas decode attention: reads the int8 cache window
        # directly instead of materializing a dequantized bf16 copy.
        # Default ON for int8 caches: measured end-to-end on v5e (7B
        # geometry) it beats the XLA dequant+einsum int8 path at every
        # window (48.2 vs 53.7 ms/step at kv 256; 45.6 vs 62.2 at kv 2048)
        # and beats the bf16-cache path from ~1-2k-token windows up while
        # halving cache HBM — crossover table in kernels/decode_attention.
        # a non-identity softmax-probs quantizer (spec.p at < 16 bits) can't
        # be honored inside the fused kernels (probs never materialize) —
        # fall back to the dense paths so serving semantics == eval. The
        # reference's default p config (16-bit fix0to1) is an identity
        # (quantizer.py forward returns x for n_bits >= 16), so the standard
        # W4A4 spec keeps the fast paths.
        self._p_quant_active = spec.p is not None and spec.p.enabled
        if attn_kernel is None:
            attn_kernel = True
        self.attn_kernel = (attn_kernel and self.kv_int8
                            and not self._p_quant_active)
        # blockwise (flash) attention for prefill at/above this prompt
        # length: O(block²) working set instead of the (S, S) score matrix.
        # Engines whose mask carries extra content (falcon ALiBi) disable it.
        self.flash_min_len = flash_min_len
        self.spec = spec
        self.params = self._prep_params(params)
        self.cache = self._init_cache()

        # host-side slot state
        self.lengths = np.zeros(max_batch, np.int32)
        self.active = np.zeros(max_batch, bool)
        # per-slot sampling controls (temperature <= 0 = greedy); sampling
        # happens on device inside the decode step so the host link still
        # only carries (B,) int32 tokens
        self.temps = np.zeros(max_batch, np.float32)
        self.top_ks = np.zeros(max_batch, np.int32)
        self.top_ps = np.ones(max_batch, np.float32)
        self._base_key = jax.random.PRNGKey(seed)
        self._dispatch = 0  # folds into the key once per device dispatch

        self._pending_next = {}
        # async growth pre-compilation state: (new_len, thread, results)
        # — see prefetch_grow. _seen_steps records the (n_steps, do_sample)
        # combos serving actually uses so the prefetch compiles the
        # programs the post-growth stream will need.
        self._grow_prep = None
        self._aot = {}
        self._seen_steps = set()
        self._build_steps()

    def _prep_params(self, params: dict) -> dict:
        """Cast floating leaves to the engine dtype and fuse qkv / gate+up
        packed projections into single kernel calls. Overridden by the
        tensor-parallel engine (tp-aware fusion + sharded placement)."""
        params = jax.tree.map(
            lambda x: x.astype(self.dtype) if (
                hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            ) else x,
            params, is_leaf=lambda x: x is None)
        for p in params["layers"]:
            if "qkv_fused" in p or "gate_up_fused" in p:
                continue  # already prepped (a spec-decode draft sharing the
                # target's layer buffers — refusing keeps them shared)
            qkv = fuse_packed([p["q_proj"], p["k_proj"], p["v_proj"]]) if (
                isinstance(p.get("q_proj"), PackedWeight)) else None
            if qkv is not None:
                p["qkv_fused"] = qkv
            gu = fuse_packed([p["gate_proj"], p["up_proj"]]) if (
                isinstance(p.get("gate_proj"), PackedWeight)) else None
            if gu is not None:
                p["gate_up_fused"] = gu
        return params

    def _cache_n_kv(self) -> int:
        """KV-head count of the allocated cache buffers (the GLOBAL count —
        the TP engine allocates globally and shards on this axis)."""
        return self.cfg.num_key_value_heads

    def _init_cache(self) -> KVCache:
        L = self.cfg.num_hidden_layers
        n_kv = self._cache_n_kv()
        kv_shape = (self.max_batch, n_kv, self.max_len, self.cfg.head_dim)
        if self.kv_int8:
            plane = lambda: scale_plane_init(
                self.max_batch, n_kv, self.max_len)
            return KVCache(
                [jnp.zeros(kv_shape, jnp.int8) for _ in range(L)],
                [jnp.zeros(kv_shape, jnp.int8) for _ in range(L)],
                [plane() for _ in range(L)],
                [plane() for _ in range(L)])
        return KVCache(
            [jnp.zeros(kv_shape, self.dtype) for _ in range(L)],
            [jnp.zeros(kv_shape, self.dtype) for _ in range(L)],
            None, None)

    def _build_steps(self):
        """jit the prefill/decode step impls. Overridden by the TP engine
        (wraps each impl in shard_map over the tp mesh first)."""
        self._prefill = jax.jit(self._prefill_impl, donate_argnums=(1,),
                                static_argnames=("seq_len", "do_sample"))
        self._prefill_multi = jax.jit(
            self._prefill_multi_impl, donate_argnums=(1,),
            static_argnames=("seq_len", "do_sample"))
        self._decode = jax.jit(self._decode_impl, donate_argnums=(1,),
                               static_argnames=("kv_len", "do_sample"))
        self._decode_multi = jax.jit(
            self._decode_multi_impl, donate_argnums=(1,),
            static_argnames=("kv_len", "n_steps", "do_sample"))
        self._verify = jax.jit(
            self._verify_impl, donate_argnums=(1,),
            static_argnames=("kv_len", "s", "return_logits"))

    def _next_key(self):
        key = jax.random.fold_in(self._base_key, self._dispatch)
        self._dispatch += 1
        return key

    def _flash_ok(self) -> bool:
        """Whether the flash prefill path is valid for this engine."""
        return not self._p_quant_active

    def _alibi_slopes(self):
        """Per-head ALiBi slopes for the flash kernel (None = plain causal).
        Overridden by FalconEngine when cfg.alibi."""
        return None

    def _do_sample(self) -> bool:
        """Static sampling toggle: greedy-only batches keep the pure-argmax
        program (no (B, V) sort in the step)."""
        return bool(np.any(self.temps[self.active] > 0.0))

    def _select(self, logits, key, temps, top_ks, top_ps, do_sample: bool):
        """(B, V) logits -> (B,) int32 next tokens."""
        if not do_sample:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return sample_tokens(logits, key, temps, top_ks, top_ps)

    # ------------------------------------------------------------------
    def _set_plane(self, plane, slots, scales, seq_len):
        """Write (N, n_kv, seq, 1) scales into a (B, n_kv, s8, 128) plane at
        positions [0, seq) of each slot. XLA scatter is fine HERE: planes
        are ~2 MB so the copy it materializes is noise (unlike the value
        caches, which go through the kv_update kernels)."""
        B, H, s8, _ = plane.shape
        flat = plane.reshape(B, H, s8 * 128)
        flat = flat.at[slots, :, :seq_len].set(scales[..., 0])
        return flat.reshape(B, H, s8, 128)

    def _write_kv(self, cache: KVCache, li, slot, pos, k_new, v_new):
        """Write (n_kv, s, hd) k/v into cache layer li, slot, at pos=0
        (single-request prefill)."""
        del pos  # always 0: prefill writes the sequence head
        slots = jnp.reshape(slot, (1,))
        k, v = list(cache.k), list(cache.v)
        if self.kv_int8:
            kc, ks = _quantize_kv(k_new)
            vc, vs = _quantize_kv(v_new)
            k[li] = kv_cache_prefill_write(cache.k[li], kc[None], slots)
            v[li] = kv_cache_prefill_write(cache.v[li], vc[None], slots)
            k_s, v_s = list(cache.k_scale), list(cache.v_scale)
            seq = k_new.shape[1]
            k_s[li] = self._set_plane(cache.k_scale[li], slots, ks[None], seq)
            v_s[li] = self._set_plane(cache.v_scale[li], slots, vs[None], seq)
            return KVCache(k, v, k_s, v_s)
        k[li] = kv_cache_prefill_write(
            cache.k[li], k_new[None].astype(cache.k[li].dtype), slots)
        v[li] = kv_cache_prefill_write(
            cache.v[li], v_new[None].astype(cache.v[li].dtype), slots)
        return KVCache(k, v, None, None)

    def _read_kv(self, cache: KVCache, li, kv_len: Optional[int] = None):
        """-> (B, n_kv, kv_len, hd) dequantized."""
        sl = slice(None) if kv_len is None else slice(0, kv_len)
        if self.kv_int8:
            ks = scale_plane_view(cache.k_scale[li])[:, :, sl, None]
            vs = scale_plane_view(cache.v_scale[li])[:, :, sl, None]
            k = cache.k[li][:, :, sl].astype(self.dtype) * ks.astype(self.dtype)
            v = cache.v[li][:, :, sl].astype(self.dtype) * vs.astype(self.dtype)
            return k, v
        return cache.k[li][:, :, sl], cache.v[li][:, :, sl]

    # ------------------------------------------------------------------
    # family hooks (overridden by OPTEngine)
    def _embed(self, params, tokens, positions):
        return jllama.embed(params, tokens).astype(self.dtype)

    def _head(self, params, x):
        return jllama.head(params, x, self.cfg)

    def _attn_norm(self, p, x):
        return rms_norm(x, p["input_layernorm"], self.cfg.rms_norm_eps)

    def _attn_out(self, p, attn):
        return linear(attn, p["o_proj"], self.spec.act)

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

    def _quant_qkv(self, q, k, v):
        """Apply the spec's q/k/v activation quantizers at the reference's
        sites (models/common.py:126-139 — per-token over head_dim, post-RoPE
        for llama). k/v are quantized BEFORE the cache commit: per-token
        quant treats each (b, h, pos) row independently, so quantize-once-
        at-write equals the eval path's quantize-at-every-attend. Falcon
        overrides to identity (reference falcon has no QuantMatMul —
        int_falcon_layer.py attention matmuls are unquantized)."""
        return (maybe_quant(q, self.spec.q), maybe_quant(k, self.spec.k),
                maybe_quant(v, self.spec.v))

    def _sm_scale(self) -> float:
        """Score scale applied after q@k^T. OPT returns 1.0 (its scale is
        folded into q pre-quantization, matching the reference's ordering —
        int_opt_layer.py:96)."""
        return float(self.cfg.head_dim) ** -0.5

    def _attn_core(self, p, hidden, positions, mask, commit):
        """qkv -> cache commit -> attention -> output projection."""
        cfg = self.cfg
        b, s, _ = hidden.shape
        q, k, v = self._attn_qkv(p, hidden, positions)
        q, k, v = self._quant_qkv(q, k, v)
        committed = commit(k, v)
        if len(committed) == 9 and committed[0] == "int8win+ring":
            # ring-staged decode (see _decode_multi_impl): the staged
            # tokens ride INSIDE the fused kernel as an extra tiny chunk
            # (codes+scales, static fill count) after the [0, base) window
            from ..kernels.decode_attention import decode_attention_int8

            (_, kv_len, kc, ks, vc, vs, ring_kv, i_step, base) = committed
            attn = decode_attention_int8(
                q[:, :, 0], kc, ks, vc, vs,
                (base - 1).astype(jnp.int32), kv_len, self._sm_scale(),
                out_dtype=self.dtype, ring_kv=ring_kv, ring_n=i_step)
            return self._attn_out(p, attn.reshape(b, s, -1))
        if len(committed) == 6 and committed[0] == "int8win":
            from ..kernels.decode_attention import decode_attention_int8

            _, kv_len, kc, ks, vc, vs = committed
            attn = decode_attention_int8(
                q[:, :, 0], kc, ks, vc, vs,
                positions[:, 0].astype(jnp.int32), kv_len,
                self._sm_scale(), out_dtype=self.dtype)
            return self._attn_out(p, attn.reshape(b, s, -1))
        k_all, v_all = committed
        if (s >= max(2, self.flash_min_len) and k_all.shape[2] == s
                and self._flash_ok()):
            # prefill fast path (fresh same-length k/v, plain causal mask):
            # blockwise flash kernel — never materializes the (s, s) scores
            from ..kernels.flash_attention import flash_attention

            attn = flash_attention(
                q, k_all, v_all, sm_scale=self._sm_scale(),
                causal=True, alibi_slopes=self._alibi_slopes())
            attn = attn.transpose(0, 2, 1, 3).reshape(b, s, -1)
            return self._attn_out(p, attn)
        k_r = repeat_kv(k_all, cfg.n_rep)
        v_r = repeat_kv(v_all, cfg.n_rep)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_r) * self._sm_scale()
        probs = jax.nn.softmax(
            (scores + mask).astype(jnp.float32), axis=-1).astype(self.dtype)
        probs = maybe_quant(probs, self.spec.p)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v_r)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, -1)
        return self._attn_out(p, attn)

    def _block(self, p, x, positions, mask, commit):
        """One decoder block (pre-norm residual form; falcon overrides
        for parallel attention)."""
        residual = x
        hidden = self._attn_norm(p, x)
        x = residual + self._attn_core(p, hidden, positions, mask, commit)
        return self._mlp(p, x)

    # ------------------------------------------------------------------
    def _prefill_impl(self, params, cache: KVCache, tokens, slot, last_idx,
                      key, temps, top_ks, top_ps,
                      seq_len: int, do_sample: bool = False):
        """Prefill one slot with `tokens` (1, seq_len — bucket-padded);
        returns (cache, first sampled token)."""
        cfg = self.cfg
        positions = jnp.arange(seq_len)
        x = self._embed(params, tokens, positions[None])
        neg = jnp.finfo(self.dtype).min
        mask = jnp.where(
            positions[None, :] <= positions[:, None], 0.0, neg
        ).astype(self.dtype)[None, None]
        for li, p in enumerate(params["layers"]):
            def commit(k, v, _li=li):
                nonlocal cache
                cache = self._write_kv(cache, _li, slot, 0, k[0], v[0])
                return k, v
            x = self._block(p, x, positions, mask, commit)
        last = jax.lax.dynamic_slice_in_dim(x, last_idx, 1, axis=1)
        logits = self._head(params, last)
        return cache, self._select(
            logits[:, 0], key, temps, top_ks, top_ps, do_sample)

    def _prefill_multi_impl(self, params, cache: KVCache, tokens, slots,
                            last_idx, key, temps, top_ks, top_ps,
                            seq_len: int, do_sample: bool = False):
        """Prefill N requests in ONE dispatch. tokens (N, seq_len) padded to
        a common bucket, slots (N,) target cache slots, last_idx (N,) each
        prompt's final position. One compiled program per (N, bucket) pair
        serves any slot assignment; blocks run at batch N so the MXU sees
        N× the prefill work per launch. Returns (cache, (N,) first tokens)."""
        positions = jnp.arange(seq_len)
        x = self._embed(params, tokens, positions[None])
        neg = jnp.finfo(self.dtype).min
        mask = jnp.where(
            positions[None, :] <= positions[:, None], 0.0, neg
        ).astype(self.dtype)[None, None]
        for li, p in enumerate(params["layers"]):
            def commit(k, v, _li=li):
                nonlocal cache
                ck, cv = list(cache.k), list(cache.v)
                if self.kv_int8:
                    kc, ks = _quantize_kv(k)
                    vc, vs = _quantize_kv(v)
                    cks, cvs = list(cache.k_scale), list(cache.v_scale)
                    ck[_li] = kv_cache_prefill_write(cache.k[_li], kc, slots)
                    cv[_li] = kv_cache_prefill_write(cache.v[_li], vc, slots)
                    cks[_li] = self._set_plane(
                        cache.k_scale[_li], slots, ks, seq_len)
                    cvs[_li] = self._set_plane(
                        cache.v_scale[_li], slots, vs, seq_len)
                    cache = KVCache(ck, cv, cks, cvs)
                else:
                    ck[_li] = kv_cache_prefill_write(
                        cache.k[_li], k.astype(cache.k[_li].dtype), slots)
                    cv[_li] = kv_cache_prefill_write(
                        cache.v[_li], v.astype(cache.v[_li].dtype), slots)
                    cache = KVCache(ck, cv, None, None)
                return k, v
            x = self._block(p, x, positions, mask, commit)
        last = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)
        logits = self._head(params, last)
        return cache, self._select(
            logits[:, 0], key, temps, top_ks, top_ps, do_sample)

    def _decode_impl(self, params, cache: KVCache, last_tokens, lengths,
                     key, temps, top_ks, top_ps,
                     kv_len: int, do_sample: bool = False):
        """One decode step for all slots. last_tokens (B,), lengths (B,)
        = tokens already in cache. kv_len (static) bounds the attention
        window — the cache is only *read* up to kv_len slots (caller buckets
        it), so per-step HBM traffic scales with the live sequence length,
        not max_len. Returns (cache, logits (B, V))."""
        cfg = self.cfg
        B = self.max_batch
        positions = lengths[:, None]  # (B, 1)
        x = self._embed(params, last_tokens[:, None], positions)
        kv_positions = jnp.arange(kv_len)
        neg = jnp.finfo(self.dtype).min
        # slot mask: attend to cache positions < length, plus self (written below)
        mask = jnp.where(
            kv_positions[None, :] <= lengths[:, None], 0.0, neg
        ).astype(self.dtype)[:, None, None, :]  # (B, 1, 1, kv_len)
        b_idx = jnp.arange(B)

        for li, p in enumerate(params["layers"]):
            def commit(k, v, _li=li):
                """Write each slot's new kv at (slot, :, lengths[slot]) via
                the kv_update RMW kernel (touches only the 8-row tiles), then
                return the visible window."""
                nonlocal cache
                ck, cv = list(cache.k), list(cache.v)
                if self.kv_int8:
                    kc, ks = _quantize_kv(k[:, :, 0])
                    vc, vs = _quantize_kv(v[:, :, 0])
                    cks, cvs = list(cache.k_scale), list(cache.v_scale)
                    # codes through the rows-RMW kernel; scale planes via
                    # the batched-DUS scatter — the planes' "flat" RMW was
                    # measured IN SITU at ~4 ms/step of the 5.1 ms write
                    # cost at batch 32 (scripts/exp_engine_attrib.py: the
                    # plane tiles' per-slot DMAs are pure latency), while
                    # the 2 MB plane scatter copies are noise
                    ck[_li], cv[_li] = kv_cache_write(
                        (cache.k[_li], cache.v[_li]), (kc, vc), lengths)
                    cks[_li] = scale_plane_write_span(
                        cache.k_scale[_li], ks, lengths)
                    cvs[_li] = scale_plane_write_span(
                        cache.v_scale[_li], vs, lengths)
                    cache = KVCache(ck, cv, cks, cvs)
                    if self.attn_kernel:
                        # hand the raw int8 buffers (full max_len shape —
                        # the kernel's BlockSpec bounds reads to kv_len).
                        # The buffer length comes from the CACHE SHAPE,
                        # not self.max_len: prefetch_grow traces this impl
                        # against grown-cache avals in a background thread
                        # while self.max_len still holds the old value.
                        buf_len = cache.k[_li].shape[2]
                        return ("int8win", kv_len,
                                cache.k[_li],
                                scale_plane_view(
                                    cache.k_scale[_li], buf_len),
                                cache.v[_li],
                                scale_plane_view(
                                    cache.v_scale[_li], buf_len))
                else:
                    ck[_li], cv[_li] = kv_cache_write(
                        (cache.k[_li], cache.v[_li]),
                        (k[:, :, 0].astype(cache.k[_li].dtype),
                         v[:, :, 0].astype(cache.v[_li].dtype)), lengths)
                    cache = KVCache(ck, cv, None, None)
                return self._read_kv(cache, _li, kv_len)
            x = self._block(p, x, positions, mask, commit)
        logits = self._head(params, x)
        # token selection on device: the host only ever transfers (B,)
        # int32 tokens — shipping full (B, vocab) logits through the host
        # link dominated step time (151ms -> ~1ms on the tunneled chip)
        return cache, self._select(
            logits[:, 0], key, temps, top_ks, top_ps, do_sample)

    def _verify_impl(self, params, cache: KVCache, tokens, lengths,
                     kv_len: int, s: int, return_logits: bool = False):
        """Score s KNOWN tokens per slot in ONE forward (the speculative-
        decoding verify pass): tokens (B, s) enter at positions
        lengths..lengths+s-1, their KV is committed (stale tail entries are
        overwritten by later writes and never attended — the mask bounds
        every query at its own position), and the per-position argmax
        next-tokens (B, s) come back. One pass streams/unpacks the packed
        weights ONCE for s tokens — vs s times for s sequential decode
        steps — which is what breaks the decode VPU-unpack/HBM floor when a
        draft model supplies the tokens (serving/spec_decode.py)."""
        positions = lengths[:, None] + jnp.arange(s)[None]  # (B, s)
        x = self._embed(params, tokens, positions)
        kv_positions = jnp.arange(kv_len)
        neg = jnp.finfo(self.dtype).min
        mask = jnp.where(
            kv_positions[None, None, None, :] <= positions[:, None, :, None],
            0.0, neg).astype(self.dtype)  # (B, 1, s, kv_len)
        for li, p in enumerate(params["layers"]):
            def commit(k, v, _li=li):
                # k/v (B, n_kv, s, hd): the s positions are CONTIGUOUS per
                # slot, so ONE span RMW writes them all (vs s chained
                # single-row kernel calls — the per-slot DMA latency was
                # measured to dominate, scripts/exp_engine_attrib.py)
                nonlocal cache
                ck, cv = list(cache.k), list(cache.v)
                if self.kv_int8:
                    kc, ks = _quantize_kv(k)
                    vc, vs = _quantize_kv(v)
                    cks, cvs = list(cache.k_scale), list(cache.v_scale)
                    ck[_li], cv[_li] = kv_cache_write_span(
                        (cache.k[_li], cache.v[_li]), (kc, vc), lengths)
                    cks[_li] = scale_plane_write_span(
                        cache.k_scale[_li], ks[..., 0], lengths)
                    cvs[_li] = scale_plane_write_span(
                        cache.v_scale[_li], vs[..., 0], lengths)
                    cache = KVCache(ck, cv, cks, cvs)
                else:
                    ck[_li], cv[_li] = kv_cache_write_span(
                        (cache.k[_li], cache.v[_li]),
                        (k.astype(cache.k[_li].dtype),
                         v.astype(cache.v[_li].dtype)), lengths)
                    cache = KVCache(ck, cv, None, None)
                return self._read_kv(cache, _li, kv_len)
            x = self._block(p, x, positions, mask, commit)
        logits = self._head(params, x)  # (B, s, V)
        if return_logits:
            # sampling-mode speculative decoding needs the full rows (the
            # acceptance test is p(x)/q(x) on the warped distributions)
            return cache, logits.astype(jnp.float32)
        return cache, jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _decode_multi_impl(self, params, cache: KVCache, last_tokens,
                           lengths, key, temps, top_ks, top_ps,
                           kv_len: int, n_steps: int,
                           do_sample: bool = False):
        """n_steps greedy decode steps entirely on device (one host round
        trip amortizes over n tokens per slot — the host link latency, not
        compute, bounds per-step serving on high-latency interconnects).
        Returns (cache, tokens (B, n_steps)).

        Statically unrolled rather than lax.fori_loop: XLA double-buffers a
        loop-carried cache (2x HBM — OOM at 7B), while the unrolled chain
        aliases the donated buffers like sequential calls do.

        RING-STAGED WRITES: the per-step positioned cache write was
        measured in situ at 5.1 ms of a 22.4 ms int8-KV step (batch 32 —
        scripts/exp_engine_attrib.py: 32 slots x 4 buffers x 2 latency-
        bound DMAs per layer per step). Instead, each step i stores its
        new k/v at a STATIC index (XLA fuses a static-index update — no
        scatter, no kernel): the fused int8 kernel path stages into small
        per-layer ring arrays the kernel attends as an extra in-kernel
        chunk; the dense paths stage into the UNUSED tail rows
        [kv_len, kv_len+n) of the cache buffer itself (every row >= kv_len
        is beyond any live sequence by bucketing), so attention reads ONE
        contiguous [0, kv_len+n) window with a two-zone mask — no concat
        copy. ONE span write per layer flushes the n_steps contiguous
        rows to their per-slot positions at dispatch end — the same 2
        DMAs per (slot, cache) now carry n_steps rows
        (kv_update.kv_cache_write_span). The staging never escapes the
        program, so prefill/verify/grow paths are untouched. Falcon-ALiBi
        keeps the per-step path: its additive-mask bias indexes absolute
        key positions, which the staged-zone mask layout does not
        preserve (_use_ring)."""
        if n_steps == 1 or not self._use_ring():
            toks, lens = last_tokens, lengths
            outs = []
            for i in range(n_steps):
                cache, toks = self._decode_impl(
                    params, cache, toks, lens, jax.random.fold_in(key, i),
                    temps, top_ks, top_ps, kv_len, do_sample)
                lens = lens + 1
                outs.append(toks)
            return cache, jnp.stack(outs, axis=1)

        B = self.max_batch
        L = len(params["layers"])
        base = lengths
        R = n_steps
        neg = jnp.finfo(self.dtype).min
        kv_positions = jnp.arange(kv_len)
        # cache part: strictly past (staged tokens live in the ring);
        # the fused kernel carries its own masking — this mask only rides
        # through _block's signature
        mask = jnp.where(
            kv_positions[None, :] < base[:, None], 0.0, neg
        ).astype(self.dtype)[:, None, None, :]  # (B, 1, 1, kv_len)
        rings = [None] * L
        toks = last_tokens
        outs = []
        for i in range(n_steps):
            positions = (base + i)[:, None]
            x = self._embed(params, toks[:, None], positions)
            for li, p in enumerate(params["layers"]):
                def commit(k, v, _li=li, _i=i):
                    # small per-layer ring arrays; the kernel attends
                    # them as an extra chunk (codes+scales fold in
                    # exactly like the cache chunks)
                    kc, ks = _quantize_kv(k[:, :, 0])
                    vc, vs = _quantize_kv(v[:, :, 0])
                    st = rings[_li]
                    if st is None:
                        zc = jnp.zeros(
                            kc.shape[:2] + (R, kc.shape[2]), jnp.int8)
                        zs = jnp.zeros(
                            ks.shape[:2] + (R,), jnp.float32)
                        st = {"kc": zc, "vc": zc, "ks": zs, "vs": zs}
                    st = {
                        "kc": st["kc"].at[:, :, _i].set(kc),
                        "vc": st["vc"].at[:, :, _i].set(vc),
                        "ks": st["ks"].at[:, :, _i].set(ks[:, :, 0]),
                        "vs": st["vs"].at[:, :, _i].set(vs[:, :, 0]),
                    }
                    rings[_li] = st
                    bl = cache.k[_li].shape[2]
                    return ("int8win+ring", kv_len,
                            cache.k[_li],
                            scale_plane_view(cache.k_scale[_li], bl),
                            cache.v[_li],
                            scale_plane_view(cache.v_scale[_li], bl),
                            (st["kc"], st["ks"], st["vc"], st["vs"]),
                            _i, base)
                x = self._block(p, x, positions, mask, commit)
            logits = self._head(params, x)
            toks = self._select(
                logits[:, 0], jax.random.fold_in(key, i), temps, top_ks,
                top_ps, do_sample)
            outs.append(toks)
        # flush: one span write per layer moves the n_steps staged rows to
        # their per-slot positions
        ck, cv = list(cache.k), list(cache.v)
        cks, cvs = list(cache.k_scale), list(cache.v_scale)
        for li in range(L):
            st = rings[li]
            ck[li], cv[li] = kv_cache_write_span(
                (ck[li], cv[li]), (st["kc"], st["vc"]), base)
            cks[li] = scale_plane_write_span(cks[li], st["ks"], base)
            cvs[li] = scale_plane_write_span(cvs[li], st["vs"], base)
        cache = KVCache(ck, cv, cks, cvs)
        return cache, jnp.stack(outs, axis=1)

    def _use_ring(self) -> bool:
        """Whether _decode_multi_impl stages decode tokens in ring arrays
        the fused kernel attends in-kernel (int8 + attn_kernel engines
        only; ALiBi falcon clears attn_kernel, taking the dense path whose
        mask carries the positional bias)."""
        return self.attn_kernel

    # ------------------------------------------------------------------
    # host-side continuous batching API
    def add_request(self, tokens, temperature: float = 0.0,
                    top_k: int = 0, top_p: float = 1.0) -> int:
        """Prefill `tokens` (list[int]) into a free slot; returns slot id.

        temperature <= 0 = greedy; top_k = 0 and top_p = 1.0 disable the
        respective filters. Controls are per-request and live for the
        slot's lifetime (continuous batching mixes them in one step)."""
        free = np.where(~self.active)[0]
        if len(free) == 0:
            raise RuntimeError("no free slots")
        slot = int(free[0])
        self.temps[slot] = temperature
        self.top_ks[slot] = top_k
        self.top_ps[slot] = top_p
        t = np.asarray(tokens, np.int32)
        # bucket prompt lengths to powers of two so prefill compiles O(log)
        # distinct shapes; pads land beyond `length` and are never attended
        bucket = max(16, 1 << int(np.ceil(np.log2(len(t)))))
        self._ensure_prefill_capacity(bucket)
        padded = np.zeros(bucket, np.int32)
        padded[: len(t)] = t
        sl = slice(slot, slot + 1)
        self.cache, logits = self._prefill(
            self.params, self.cache, jnp.asarray(padded[None]), slot,
            len(t) - 1, self._next_key(), jnp.asarray(self.temps[sl]),
            jnp.asarray(self.top_ks[sl]), jnp.asarray(self.top_ps[sl]),
            seq_len=bucket, do_sample=bool(temperature > 0.0))
        self.active[slot] = True
        self.lengths[slot] = len(tokens)
        self._pending_next[slot] = int(np.asarray(logits)[0])
        return slot

    def add_requests(self, requests, temperature: float = 0.0,
                     top_k: int = 0, top_p: float = 1.0) -> list:
        """Prefill several prompts in ONE device dispatch (batched prefill).

        requests: list of token lists. All prompts share one bucket (the
        power-of-two ceiling of the longest), so one compiled program per
        (count, bucket) pair; shorter prompts ride along with pad tokens
        whose cache entries are never attended. Returns the slot ids; first
        sampled tokens land in `_pending_next`."""
        free = np.where(~self.active)[0]
        if len(free) < len(requests):
            raise RuntimeError(
                f"need {len(requests)} free slots, have {len(free)}")
        slots = free[: len(requests)].astype(np.int32)
        longest = max(len(r) for r in requests)
        bucket = max(16, 1 << int(np.ceil(np.log2(longest))))
        self._ensure_prefill_capacity(bucket)
        toks = np.zeros((len(requests), bucket), np.int32)
        last_idx = np.zeros(len(requests), np.int32)
        for i, r in enumerate(requests):
            toks[i, : len(r)] = np.asarray(r, np.int32)
            last_idx[i] = len(r) - 1
        self.temps[slots] = temperature
        self.top_ks[slots] = top_k
        self.top_ps[slots] = top_p
        self.cache, first = self._prefill_multi(
            self.params, self.cache, jnp.asarray(toks), jnp.asarray(slots),
            jnp.asarray(last_idx), self._next_key(),
            jnp.asarray(self.temps[slots]), jnp.asarray(self.top_ks[slots]),
            jnp.asarray(self.top_ps[slots]),
            seq_len=bucket, do_sample=bool(temperature > 0.0))
        first = np.asarray(first)
        for i, s in enumerate(slots):
            self.active[s] = True
            self.lengths[s] = len(requests[i])
            self._pending_next[int(s)] = int(first[i])
        return [int(s) for s in slots]

    def release(self, slot: int):
        self.active[slot] = False
        self.lengths[slot] = 0
        self.temps[slot] = 0.0
        self.top_ks[slot] = 0
        self.top_ps[slot] = 1.0

    def _check_capacity(self, slots, n: int):
        """Refuse to decode a slot whose write position would reach max_len:
        the kv_update RMW kernel's dynamic-slice base gets CLAMPED by Mosaic
        at pos == max_len, silently overwriting the live row at max_len-8
        (corrupting attended history) instead of dropping the write the way
        the old XLA scatter did. With auto_grow the cache doubles instead.

        Checked for ALL active slots, not just the requested ones:
        _decode_impl/_verify_impl write n KV rows at lengths+i for EVERY
        batch slot, so an active bystander slot within n of max_len would
        get clamped writes corrupting its attended history even though it
        was not in this step's request dict."""
        check = set(int(s) for s in np.nonzero(self.active)[0])
        check.update(int(s) for s in slots)
        need = max(
            (int(self.lengths[s]) + n for s in check), default=0)
        if need <= self.max_len:
            # occupancy-triggered background compile of the grown-shape
            # programs (single-host jitted impls only — TP engines'
            # shard_map wrappers recompile synchronously as before)
            if (self.auto_grow and need > self.max_len * 3 // 4
                    and not hasattr(self, "mesh")
                    and self.max_len < self.grow_limit):
                self.prefetch_grow()
            return
        if not self.auto_grow:
            over = [s for s in sorted(check)
                    if self.lengths[s] + n > self.max_len]
            raise RuntimeError(
                f"slots {over} would exceed max_len={self.max_len} after "
                f"{n} step(s) (lengths {[int(self.lengths[s]) for s in over]});"
                " release them, enable auto_grow, or build the engine with"
                " a larger max_len")
        self._grow(need)

    def _grow_target(self, need: int) -> int:
        new_len = self.max_len
        while new_len < need:
            new_len *= 2
        if new_len > self.grow_limit:
            raise RuntimeError(
                f"cannot grow cache to {new_len} (> grow_limit="
                f"{self.grow_limit}, cfg.max_position_embeddings)")
        return new_len

    # one engine-lifetime jitted copy fn (shape-polymorphic via retrace per
    # (old, new) shape pair) — hoisted out of _grow so prefetch_grow can
    # AOT-compile it for the grown shapes ahead of need
    @staticmethod
    @jax.jit
    def _copy_cache(new, old):
        def cp(nbuf, obuf):
            return nbuf.at[:, :, : obuf.shape[2]].set(obuf)
        return jax.tree.map(cp, new, old)

    def _cache_avals(self, max_len: int):
        """ShapeDtypeStruct pytree of the cache at a given max_len (no
        allocation)."""
        saved = self.max_len
        self.max_len = max_len
        try:
            return jax.eval_shape(self._init_cache)
        finally:
            self.max_len = saved

    def prefetch_grow(self, steps=None):
        """Start BACKGROUND AOT compilation of the programs the stream will
        need right after the next cache doubling: the grown-shape decode /
        decode_multi steps (kv_len = new max_len — growth only triggers
        when the window already fills the old bucket) and the cache copy.
        Called automatically from _check_capacity when occupancy crosses
        3/4 of max_len (auto_grow engines), so by the time _grow runs the
        executables are ready and the stall is just the copy cost — not
        the ~15 s synchronous recompile measured in BENCH_r04. Compilation
        runs in a daemon thread; the main thread keeps executing the
        already-compiled current-size programs (no concurrent tracing).
        No-op when a prep is already in flight or at the grow_limit."""
        if self._grow_prep is not None:
            return
        try:
            new_len = self._grow_target(self.max_len + 1)
        except RuntimeError:
            return
        if steps is None:
            steps = set(self._seen_steps) or {(8, False)}
        params_avals = jax.tree.map(
            lambda x: None if x is None else jax.ShapeDtypeStruct(
                x.shape, x.dtype),
            self.params, is_leaf=lambda x: x is None)
        cache_avals = self._cache_avals(new_len)
        old_cache_avals = self._cache_avals(self.max_len)
        B = self.max_batch
        i32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.int32)
        f32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
        key_aval = jax.ShapeDtypeStruct(
            self._base_key.shape, self._base_key.dtype)
        results = {}

        def compile_all():
            results[("copy", new_len)] = LlamaEngine._copy_cache.lower(
                cache_avals, old_cache_avals).compile()
            for n, do_sample in steps:
                kind = "decode" if n == 1 else "decode_multi"
                statics = dict(kv_len=new_len, do_sample=do_sample)
                if n == 1:
                    fn, args = self._decode, (
                        params_avals, cache_avals, i32(B), i32(B), key_aval,
                        f32(B), i32(B), f32(B))
                else:
                    statics["n_steps"] = n
                    fn, args = self._decode_multi, (
                        params_avals, cache_avals, i32(B), i32(B), key_aval,
                        f32(B), i32(B), f32(B))
                key = (kind, new_len, tuple(sorted(statics.items())))
                results[key] = fn.lower(*args, **statics).compile()

        import threading

        th = threading.Thread(target=compile_all, daemon=True)
        th.start()
        self._grow_prep = (new_len, th, results)

    def _grow(self, need: int):
        """Double max_len (to at least `need`, capped at grow_limit) and
        copy the live cache into freshly allocated buffers. Uses the
        prefetched AOT executables when prefetch_grow prepared them."""
        new_len = self._grow_target(need)
        prep_copy = None
        if self._grow_prep is not None:
            prep_len, th, results = self._grow_prep
            th.join()  # overlapped with serving since the 3/4 trigger
            self._grow_prep = None
            if prep_len == new_len:
                self._aot.update(results)
                prep_copy = results.get(("copy", new_len))
        old_cache = self.cache
        self.max_len = new_len
        new_cache = self._init_cache()
        if prep_copy is not None:
            self.cache = prep_copy(new_cache, old_cache)
        else:
            self.cache = LlamaEngine._copy_cache(new_cache, old_cache)

    def _aot_call(self, kind: str, args, statics: dict):
        """Dispatch through a prefetched grown-shape executable when one
        exists for (kind, max_len, statics); otherwise the jitted fn."""
        key = (kind, self.max_len, tuple(sorted(statics.items())))
        fn = self._aot.get(key)
        if fn is not None:
            return fn(*args)
        base = {"decode": self._decode, "decode_multi": self._decode_multi}
        return base[kind](*args, **statics)

    def _ensure_prefill_capacity(self, bucket: int):
        """Prompts longer than max_len would write past the cache buffers
        (kv_cache_prefill_write DMAs [0, bucket) rows): grow or refuse."""
        if bucket <= self.max_len:
            return
        if not self.auto_grow:
            raise RuntimeError(
                f"prompt bucket {bucket} exceeds max_len={self.max_len}; "
                "enable auto_grow or build the engine with a larger max_len")
        self._grow(bucket)

    def step(self, last_tokens: dict) -> dict:
        """One decode step. last_tokens: {slot: token}. Returns
        {slot: next_token_logits_argmax} for active slots."""
        self._check_capacity(last_tokens, 1)
        toks = np.zeros(self.max_batch, np.int32)
        for s, t in last_tokens.items():
            toks[s] = t
        # bucket the attention window to the next power of two above the
        # longest live sequence (+1 for the token written this step)
        longest = int(self.lengths[self.active].max()) if self.active.any() else 0
        kv_len = min(self.max_len,
                     max(64, 1 << int(np.ceil(np.log2(longest + 1)))))
        do_sample = self._do_sample()
        self._seen_steps.add((1, do_sample))
        self.cache, next_tokens = self._aot_call(
            "decode",
            (self.params, self.cache, jnp.asarray(toks),
             jnp.asarray(self.lengths), self._next_key(),
             jnp.asarray(self.temps), jnp.asarray(self.top_ks),
             jnp.asarray(self.top_ps)),
            dict(kv_len=kv_len, do_sample=do_sample))
        out = {}
        next_tokens = np.asarray(next_tokens)  # (B,) int32 — tiny transfer
        for s in last_tokens:
            self.lengths[s] += 1
            out[s] = int(next_tokens[s])
        return out

    def step_n(self, last_tokens: dict, n: int) -> dict:
        """n decode steps in one device dispatch. Returns {slot: [tokens]}.
        Requests can only join/leave every n tokens — the coarser continuous-
        batching granularity trades scheduling latency for host-link
        round-trips."""
        self._check_capacity(last_tokens, n)
        toks = np.zeros(self.max_batch, np.int32)
        for s, t in last_tokens.items():
            toks[s] = t
        longest = int(self.lengths[self.active].max()) if self.active.any() else 0
        kv_len = min(self.max_len,
                     max(64, 1 << int(np.ceil(np.log2(longest + n + 1)))))
        do_sample = self._do_sample()
        self._seen_steps.add((n, do_sample))
        self.cache, out = self._aot_call(
            "decode_multi",
            (self.params, self.cache, jnp.asarray(toks),
             jnp.asarray(self.lengths), self._next_key(),
             jnp.asarray(self.temps), jnp.asarray(self.top_ks),
             jnp.asarray(self.top_ps)),
            dict(kv_len=kv_len, n_steps=n, do_sample=do_sample))
        out = np.asarray(out)
        res = {}
        for s in last_tokens:
            self.lengths[s] += n
            res[s] = out[s].tolist()
        return res

    def _verify_call(self, tokens: dict, return_logits: bool):
        """Shared body of verify_step/verify_step_logits: validate, build
        the (B, s) token buffer, bucket the kv window, run _verify (which
        writes KV at lengths..lengths+s-1 WITHOUT advancing lengths)."""
        s = len(next(iter(tokens.values())))
        if not all(len(t) == s for t in tokens.values()):
            raise ValueError(
                "verify requires the same number of tokens per slot "
                f"(got lengths {sorted(set(len(t) for t in tokens.values()))})")
        self._check_capacity(tokens, s)
        toks = np.zeros((self.max_batch, s), np.int32)
        for sl, ts in tokens.items():
            toks[sl] = ts
        longest = int(self.lengths[self.active].max()) if self.active.any() \
            else 0
        kv_len = min(self.max_len,
                     max(64, 1 << int(np.ceil(np.log2(longest + s + 1)))))
        self.cache, out = self._verify(
            self.params, self.cache, jnp.asarray(toks),
            jnp.asarray(self.lengths), kv_len=kv_len, s=s,
            return_logits=return_logits)
        return np.asarray(out)

    def verify_step(self, tokens: dict) -> dict:
        """Speculative-decoding verify: tokens {slot: [s tokens]} (same s
        for every slot) are scored in ONE device pass; their KV is written
        at positions lengths..lengths+s-1. Does NOT advance `lengths` —
        the caller advances by however many tokens it accepts (unaccepted
        cache entries sit beyond `lengths`, are never attended, and are
        overwritten by later writes). Returns {slot: [s argmax tokens]}
        where entry i is the model's next-token after tokens[:i+1].
        (The greedy spec-decode acceptance rule is exact argmax
        equality.)"""
        out = self._verify_call(tokens, return_logits=False)
        return {sl: out[sl].tolist() for sl in tokens}

    def verify_step_logits(self, tokens: dict) -> dict:
        """verify_step returning the FULL fp32 logit rows instead of
        argmaxes: {slot: (s, V) ndarray}. Same KV-write semantics. The
        sampling-mode speculative-decoding acceptance rule needs the whole
        warped distributions p_i (serving/spec_decode.py: accept proposal
        x_i with prob min(1, p_i(x_i)/q_i(x_i)), resample rejections from
        normalize(max(p_i - q_i, 0)))."""
        out = self._verify_call(tokens, return_logits=True)
        return {sl: out[sl] for sl in tokens}

    def generate(self, prompt_tokens, max_new_tokens: int = 32,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0) -> list:
        """Single-request convenience wrapper (greedy by default)."""
        slot = self.add_request(prompt_tokens, temperature=temperature,
                                top_k=top_k, top_p=top_p)
        next_tok = self._pending_next[slot]
        out = [next_tok]
        for _ in range(max_new_tokens - 1):
            res = self.step({slot: next_tok})
            next_tok = res[slot]
            out.append(next_tok)
        self.release(slot)
        return out


class OPTEngine(LlamaEngine):
    """Continuous-batching decoder for the OPT family.

    Differences from llama handled via the family hooks: learned positional
    embeddings (+2 offset) added at embed time, LayerNorm with bias, no RoPE,
    q pre-scaled by head_dim**-0.5, ReLU fc1/fc2 MLP, final decoder norm in
    the head. Requires do_layer_norm_before=True configs (the standard OPT
    family; the reference's post-norm variant is eval-path only)."""

    def __init__(self, params, cfg, **kw):
        assert cfg.do_layer_norm_before, "OPTEngine supports pre-norm OPT"
        # adapt llama-named attributes the base engine uses
        self._ocfg = cfg
        import dataclasses as _dc

        class _Adapter:
            pass

        a = _Adapter()
        a.__dict__.update(cfg.__dict__)
        a.num_hidden_layers = cfg.num_hidden_layers
        a.num_attention_heads = cfg.num_attention_heads
        a.num_key_value_heads = cfg.num_attention_heads
        a.head_dim = cfg.head_dim
        a.n_rep = 1
        a.intermediate_size = cfg.ffn_dim
        a.rms_norm_eps = cfg.layer_norm_eps
        a.rope_theta = 0.0
        super().__init__(params, a, **kw)

    def _embed(self, params, tokens, positions):
        from ..models.common import linear as _lin

        x = params["embed_tokens"][tokens].astype(self.dtype)
        if params.get("project_in") is not None:
            x = _lin(x, params["project_in"])
        pos = params["embed_positions"][positions + 2].astype(self.dtype)
        return x + pos

    def _head(self, params, x):
        from ..models import opt as jopt

        return jopt.head(params, x, self._ocfg)

    def _attn_norm(self, p, x):
        from ..models.common import layer_norm

        return layer_norm(x, p["self_attn_layer_norm"],
                          self._ocfg.layer_norm_eps)

    def _attn_qkv(self, p, hidden, positions):
        cfg = self.cfg
        b, s, _ = hidden.shape
        if "qkv_fused" in p:
            qkv = linear(hidden, p["qkv_fused"], self.spec.act)
            h = cfg.hidden_size
            q, k, v = qkv[..., :h], qkv[..., h : 2 * h], qkv[..., 2 * h :]
        else:
            q = linear(hidden, p["q_proj"], self.spec.act)
            k = linear(hidden, p["k_proj"], self.spec.act)
            v = linear(hidden, p["v_proj"], self.spec.act)
        # the reference's OPT ordering (int_opt_layer.py:96-118, mirrored by
        # models/opt.py:95-100): q pre-scaled by hd**-0.5 THEN quantized,
        # and q/k/v quantized per-token over the FULL hidden dim before the
        # head reshape (unlike llama's per-head rows). _sm_scale() is 1.0 so
        # the shared attention paths apply no further scaling.
        hd = cfg.head_dim
        q = maybe_quant(q * (hd ** -0.5), self.spec.q)
        k = maybe_quant(k, self.spec.k)
        v = maybe_quant(v, self.spec.v)
        q = q.reshape(b, s, cfg.num_attention_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, cfg.num_attention_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, cfg.num_attention_heads, hd).transpose(0, 2, 1, 3)
        return q, k, v

    def _quant_qkv(self, q, k, v):
        return q, k, v  # done pre-reshape in _attn_qkv (reference ordering)

    def _sm_scale(self) -> float:
        return 1.0  # folded into q in _attn_qkv

    def _attn_out(self, p, attn):
        return linear(attn, p["out_proj"], self.spec.act)

    def _mlp(self, p, x):
        from ..models.common import layer_norm

        h = layer_norm(x, p["final_layer_norm"], self._ocfg.layer_norm_eps)
        h = jax.nn.relu(linear(h, p["fc1"], self.spec.act))
        return x + linear(h, p["fc2"], self.spec.act)



class FalconEngine(LlamaEngine):
    """Continuous-batching decoder for the falcon family.

    Supports the falcon-7b-style architecture (multi-query + parallel
    attention + rotary) and the classic variant (post-attention norm); the
    new-decoder-architecture dual-LN form follows the parallel path with
    ln_attn/ln_mlp."""

    def __init__(self, params, cfg, **kw):
        self._fcfg = cfg

        class _Adapter:
            pass

        a = _Adapter()
        a.__dict__.update(cfg.__dict__)
        a.num_hidden_layers = cfg.num_hidden_layers
        a.num_attention_heads = cfg.num_attention_heads
        # cache the TRUE kv head count: falcon-7b MQA stores ONE kv head
        # (71x less cache memory than replicating per query head) and the
        # attention paths repeat on read (repeat_kv / flash's n_rep maps)
        a.num_key_value_heads = cfg.effective_kv_heads
        a.head_dim = cfg.head_dim
        a.n_rep = cfg.num_attention_heads // cfg.effective_kv_heads
        a.rms_norm_eps = cfg.layer_norm_eps
        a.rope_theta = cfg.rope_theta
        a.hidden_size = cfg.hidden_size
        super().__init__(params, a, **kw)
        if cfg.alibi:
            # the fused int8 decode kernel computes plain causal attention
            # and never sees the additive mask the ALiBi bias is folded
            # into (_block) — routing an ALiBi model through it silently
            # drops the positional bias (measured: streams diverge from
            # the dense path within a few steps). ALiBi + int8 uses the
            # dense dequant path, whose mask carries the bias.
            self.attn_kernel = False

    def _alibi_slopes(self):
        if not self._fcfg.alibi:
            return None
        from ..models.falcon import alibi_slopes

        return alibi_slopes(self._fcfg.num_attention_heads)

    def _quant_qkv(self, q, k, v):
        """Falcon attention matmuls are unquantized in the reference
        (int_falcon_layer.py has no QuantMatMul; models/falcon.py:207 uses
        NO_ACT_QUANT) — only spec.act at the linears applies."""
        return q, k, v

    def _embed(self, params, tokens, positions):
        from ..models import falcon as jfalcon

        return jfalcon.embed(params, tokens).astype(self.dtype)

    def _head(self, params, x):
        from ..models import falcon as jfalcon

        return jfalcon.head(params, x, self._fcfg)

    def _attn_qkv(self, p, hidden, positions):
        from ..models import falcon as jfalcon

        cfg = self._fcfg
        fused = linear(hidden, p["query_key_value"], self.spec.act)
        q, k, v = jfalcon.split_heads_kv(fused, cfg)  # k/v at true n_kv
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if not cfg.alibi:
            cos, sin = jllama.rope_cos_sin(
                positions, cfg.head_dim, cfg.rope_theta, dtype=hidden.dtype)
            q, k = jllama.apply_rope(q, k, cos, sin)
        return q, k, v

    def _attn_out(self, p, attn):
        return linear(attn, p["dense"], self.spec.act)

    def _block(self, p, x, positions, mask, commit):
        from ..models.common import layer_norm

        cfg = self._fcfg
        if cfg.alibi:
            # fold slopes*key_pos*inv_norm into the additive mask, matching
            # the eval path (models/falcon.py block_forward); softmax shift
            # invariance makes absolute key positions equivalent to the
            # relative formulation
            from ..models.falcon import alibi_slopes

            kv_len = mask.shape[-1]
            dist = jnp.arange(kv_len, dtype=jnp.float32)
            bias = (alibi_slopes(cfg.num_attention_heads)[:, None, None]
                    * dist[None, None, :]
                    * (1.0 / cfg.head_dim**0.5)).astype(mask.dtype)
            mask = mask + bias[None]
        residual = x
        if cfg.new_decoder_architecture:
            attn_ln = layer_norm(x, p["ln_attn"], cfg.layer_norm_eps)
            mlp_ln = layer_norm(x, p["ln_mlp"], cfg.layer_norm_eps)
        else:
            attn_ln = layer_norm(x, p["input_layernorm"], cfg.layer_norm_eps)
            mlp_ln = None
        attn_out = self._attn_core(p, attn_ln, positions, mask, commit)
        if not cfg.new_decoder_architecture:
            if cfg.parallel_attn:
                mlp_ln = attn_ln
            else:
                residual = residual + attn_out
                mlp_ln = layer_norm(
                    residual, p["post_attention_layernorm"],
                    cfg.layer_norm_eps)
        h = jax.nn.gelu(
            linear(mlp_ln, p["dense_h_to_4h"], self.spec.act),
            approximate=False)
        mlp_out = linear(h, p["dense_4h_to_h"], self.spec.act)
        if cfg.new_decoder_architecture or cfg.parallel_attn:
            mlp_out = mlp_out + attn_out
        return residual + mlp_out
