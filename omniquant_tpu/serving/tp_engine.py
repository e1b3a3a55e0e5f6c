"""Tensor-parallel serving engine: the continuous-batching engine sharded
over a `tp` mesh axis.

The single-chip engine (serving/engine.py) composes per-family block
forwards, Pallas kv-cache writes, and the fused int8 flash-decode kernel.
This module reuses ALL of that machinery unchanged by running the engine's
jitted step impls inside `shard_map`:

  * weights: row-parallel (q/k/v/gate/up/fc1/query_key_value) shard output
    lanes; column-parallel (o/down/out_proj/fc2/dense/dense_4h_to_h) shard
    packed rows and psum partial products (one psum per block per site,
    riding ICI). Placement reuses parallel/tp_forward.py's padding +
    sharding helpers (padded MLP intermediates with provably-zero
    contributions, falcon-MQA lane restructuring).
  * KV cache: head-sharded — each shard owns (B, n_kv/tp, max_len, hd) of
    every layer's cache (+ its slice of the int8 scale planes). The Pallas
    kv_update RMW writes and the int8 flash-decode kernel run per shard on
    local heads; no cache communication at all.
  * qkv / gate+up fusion is TP-aware: lanes are interleaved per shard
    ([q_0 k_0 v_0 | q_1 k_1 v_1 | ...]) so a plain P(None, "tp") row shard
    hands every device its own contiguous [q_l, k_l, v_l] block and the
    engine's local split-by-size stays correct.
  * activation quantization stays EXACT under TP: row-parallel inputs are
    replicated (full feature rows -> local per-token ranges equal global
    ones); column-parallel inputs are feature-sharded, so their per-token
    min/max is computed with lax.pmin/pmax over the tp axis before the
    local fake-quant — bit-identical to the unsharded engine.
  * host-side continuous batching (slots, buckets, sampling controls) is
    inherited unchanged.

This is the missing north-star config from BASELINE.json configs[4]
(LLaMA-2-70B W3A16g128 tensor-sharded serving): a 70B in W3 (~25 GB packed)
cannot serve from one v5e chip. Reference analog (and the capability
exceeded): /root/reference/parallel_utils.py:89-163 places whole layers on
GPUs sequentially with no collectives and no serving engine at all.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..kernels.quant_matmul import quant_matmul
from ..models.common import layer_norm, maybe_quant, rms_norm
from ..parallel.tp_forward import (
    COL_NAMES, ROW_NAMES, _ensure_col_splittable, _pw_sharded_col,
    _pw_sharded_row, pad_intermediate_packed, restructure_falcon_mqa)
from ..quant.packing import PackedWeight
from ..quant.quantizer import _fake_quant_core, _scale_zp
from .engine import FalconEngine, KVCache, LlamaEngine, OPTEngine


# ---------------------------------------------------------------------------
# TP-aware fusion: per-shard interleaved lanes
# ---------------------------------------------------------------------------

def fuse_packed_tp(pws, tp: int) -> Optional[PackedWeight]:
    """Fuse packed linears sharing in_features with lanes interleaved per
    shard: shard i's contiguous chunk is [pw0_i, pw1_i, ...]. A plain
    P(None, 'tp') row shard of the result gives each device its own fused
    [q_l, k_l, v_l] block, so the engine's split-by-local-size is correct.
    Returns None when fusion constraints don't hold (mirrors
    engine.fuse_packed)."""
    if not all(isinstance(p, PackedWeight) for p in pws):
        return None
    first = pws[0]
    if not all(
        p.bits == first.bits and p.group_size == first.group_size
        and p.in_features == first.in_features
        and p.tile_k == first.tile_k
        and p.layout == first.layout
        and p.qweight.shape[0] == first.qweight.shape[0]
        and p.out_features % tp == 0
        for p in pws
    ):
        return None
    qs, ss, zs, bs = [], [], [], []
    any_bias = any(p.bias is not None for p in pws)
    for i in range(tp):
        for p in pws:
            o_l = p.out_features // tp
            sl = slice(i * o_l, (i + 1) * o_l)
            qs.append(p.qweight[:, sl])
            ss.append(p.scales[sl])
            zs.append(p.zeros[sl])
            if any_bias:
                b = (p.bias if p.bias is not None
                     else jnp.zeros((p.out_features,), jnp.float32))
                bs.append(b[sl])
    return PackedWeight(
        qweight=jnp.concatenate(qs, axis=1),
        scales=jnp.concatenate(ss, axis=0),
        zeros=jnp.concatenate(zs, axis=0),
        bias=jnp.concatenate(bs) if any_bias else None,
        bits=first.bits, group_size=first.group_size,
        in_features=first.in_features,
        out_features=sum(p.out_features for p in pws),
        tile_k=first.tile_k,
        layout=first.layout,
    )


_FUSE_SITES = {
    "llama": (("q_proj", "k_proj", "v_proj", "qkv_fused"),
              ("gate_proj", "up_proj", "gate_up_fused")),
    "opt": (("q_proj", "k_proj", "v_proj", "qkv_fused"),),
    "falcon": (),
}


# ---------------------------------------------------------------------------
# placement + shard_map specs
# ---------------------------------------------------------------------------

def _pw_spec(pw: PackedWeight, row: bool) -> PackedWeight:
    """PackedWeight-shaped PartitionSpec tree (aux metadata must equal the
    real weight's for shard_map's structural match)."""
    if row:
        qw, sc = P(None, "tp"), P("tp", None)
        bspec = P("tp")
    else:
        qw = P("tp", None)
        sc = P(None, "tp") if pw.group_size else P()
        bspec = P()
    return PackedWeight(
        qweight=qw, scales=sc, zeros=sc,
        bias=None if pw.bias is None else bspec,
        bits=pw.bits, group_size=pw.group_size,
        in_features=pw.in_features, out_features=pw.out_features,
        tile_k=pw.tile_k, layout=pw.layout)


def _place_dense(w: dict, mesh: Mesh, row: bool):
    wspec = P("tp", None) if row else P(None, "tp")
    bspec = (P("tp") if row else P()) if w.get("bias") is not None else None
    placed = {
        "weight": jax.device_put(w["weight"], NamedSharding(mesh, wspec)),
        "bias": None if w.get("bias") is None else jax.device_put(
            w["bias"], NamedSharding(mesh, bspec)),
    }
    return placed, {"weight": wspec, "bias": bspec}


def _replicate(tree, mesh: Mesh):
    placed = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())),
        tree, is_leaf=lambda a: a is None)
    specs = jax.tree.map(lambda a: P(), tree, is_leaf=lambda a: a is None)
    return placed, specs


def _cast_dtype(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if (
            hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        ) else x,
        tree, is_leaf=lambda x: x is None)


def place_params(params: dict, gcfg, mesh: Mesh, family: str, dtype):
    """Pad + restructure + fuse + device_put a full engine param tree for
    TP. Returns (placed, specs, padded_intermediate)."""
    tp = mesh.shape["tp"]
    rows, cols = set(ROW_NAMES[family]), set(COL_NAMES[family])
    for site in _FUSE_SITES.get(family, ()):
        rows.add(site[-1])  # fused names are row-parallel

    placed, specs = {}, {}
    for name, sub in params.items():
        if name == "layers":
            continue
        placed[name], specs[name] = _replicate(_cast_dtype(sub, dtype), mesh)

    inter_pad = None
    placed["layers"], specs["layers"] = [], []
    for block in params["layers"]:
        block = _cast_dtype(dict(block), dtype)
        block = pad_intermediate_packed(block, gcfg, tp, family)
        if (family == "falcon" and gcfg.multi_query
                and not gcfg.new_decoder_architecture and tp > 1):
            block = restructure_falcon_mqa(block, gcfg, tp)
        if inter_pad is None:
            from ..parallel.tp_forward import _MLP_NAMES

            w0 = block[_MLP_NAMES[family][0][0]]
            inter_pad = (w0.out_features if isinstance(w0, PackedWeight)
                         else w0["weight"].shape[0])
        for site in _FUSE_SITES.get(family, ()):
            parts = [block.get(n) for n in site[:-1]]
            if all(isinstance(p, PackedWeight) for p in parts):
                fused = fuse_packed_tp(parts, tp)
                if fused is not None:
                    block[site[-1]] = fused
        pb, sb = {}, {}
        for name, w in block.items():
            if name in rows:
                if isinstance(w, PackedWeight):
                    pb[name] = _pw_sharded_row(w, mesh)
                    sb[name] = _pw_spec(w, row=True)
                else:
                    pb[name], sb[name] = _place_dense(w, mesh, row=True)
            elif name in cols:
                if isinstance(w, PackedWeight):
                    w = _ensure_col_splittable(w, tp)
                    pb[name] = _pw_sharded_col(w, mesh)
                    sb[name] = _pw_spec(w, row=False)
                else:
                    pb[name], sb[name] = _place_dense(w, mesh, row=False)
            else:
                pb[name], sb[name] = _replicate(w, mesh)
        placed["layers"].append(pb)
        specs["layers"].append(sb)
    return placed, specs, inter_pad


# ---------------------------------------------------------------------------
# the TP mixin
# ---------------------------------------------------------------------------

class _TPMixin:
    """Shared TP machinery layered over an engine family class. Subclass
    __init__ must set self.mesh / self.tp / self._gcfg / self._family, call
    place_params, and pass a LOCAL (per-shard) config to the base engine
    __init__ so every in-shard reshape/split uses local head counts."""

    def _prep_params(self, params):
        return self._placed  # placed + sharded in __init__

    def _cache_n_kv(self) -> int:
        return self._cache_nkv  # GLOBAL head count of the sharded cache

    def _init_cache(self) -> KVCache:
        cache = super()._init_cache()
        sh = NamedSharding(self.mesh, P(None, "tp", None, None))
        return jax.tree.map(lambda a: jax.device_put(a, sh), cache)

    def _cache_specs(self):
        return jax.tree.map(lambda a: P(None, "tp", None, None), self.cache)

    def _build_steps(self):
        mesh = self.mesh
        cspecs = self._cache_specs()

        def wrap(impl):
            """shard_map the impl over the mesh; statics are closed into the
            mapped fn and compiled programs cached per static tuple (the
            host-side callers always pass them as keywords)."""
            compiled = {}

            def caller(params, cache, *rest, **statics):
                key = tuple(sorted(statics.items()))
                if key not in compiled:
                    inner = shard_map(
                        partial(impl, **statics), mesh=mesh,
                        in_specs=(self._pspecs, cspecs) + (P(),) * len(rest),
                        out_specs=(cspecs, P()),
                        check_vma=False)
                    compiled[key] = jax.jit(inner, donate_argnums=(1,))
                return compiled[key](params, cache, *rest)

            return caller

        self._prefill = wrap(self._prefill_impl)
        self._prefill_multi = wrap(self._prefill_multi_impl)
        self._decode = wrap(self._decode_impl)
        self._decode_multi = wrap(self._decode_multi_impl)
        self._verify = wrap(self._verify_impl)

    def lower_step(self, kind: str = "decode_multi", **statics):
        """AOT-lower (NO execution) one step program at this engine's full
        geometry: returns a jax.stages.Lowered whose .compile() exposes
        memory_analysis()/cost_analysis(). The rehearsal tool for configs
        too big to run on available hardware (e.g. Llama-2-70B W3A16g128
        tensor-sharded — BASELINE.json north star): validates that the
        sharded step traces, partitions, and compiles at the real shapes,
        and lets the caller check per-shard HBM arithmetic against the
        target chip, without ever dispatching a step."""
        impls = {
            "decode": self._decode_impl,
            "decode_multi": self._decode_multi_impl,
            "prefill_multi": self._prefill_multi_impl,
            "verify": self._verify_impl,
        }
        impl = impls[kind]
        B = self.max_batch
        i32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.int32)
        f32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
        key_aval = jax.ShapeDtypeStruct(
            self._base_key.shape, self._base_key.dtype)
        if kind in ("decode", "decode_multi"):
            rest = (i32(B), i32(B), key_aval, f32(B), i32(B), f32(B))
        elif kind == "prefill_multi":
            n = statics.pop("n_prompts", B)
            rest = (i32(n, statics["seq_len"]), i32(n), i32(n), key_aval,
                    f32(n), i32(n), f32(n))
        else:  # verify
            rest = (i32(B, statics["s"]), i32(B))
        inner = shard_map(
            partial(impl, **statics), mesh=self.mesh,
            in_specs=(self._pspecs, self._cache_specs())
            + (P(),) * len(rest),
            out_specs=(self._cache_specs(), P()),
            check_vma=False)
        params_avals = jax.tree.map(
            lambda x: None if x is None else jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=getattr(x, "sharding", None)),
            self.params, is_leaf=lambda x: x is None)
        cache_avals = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=getattr(x, "sharding", None)),
            self.cache)
        return jax.jit(inner, donate_argnums=(1,)).lower(
            params_avals, cache_avals, *rest)

    # -- TP-exact activation quantization over a feature-sharded axis ------
    def _tp_act_quant(self, x, qcfg):
        """Per-token fake-quant whose min/max ranges span the FULL feature
        row (pmin/pmax over tp) — bit-identical to the unsharded engine's
        maybe_quant on the gathered tensor."""
        if qcfg is None or not qcfg.enabled:
            return x
        if qcfg.metric == "fix0to1":
            return maybe_quant(x, qcfg)  # elementwise: shard-local is exact
        assert not qcfg.group_size, (
            "grouped activation quant over a tp-sharded feature axis is "
            "not supported (groups would straddle shards)")
        xmin = jax.lax.pmin(jnp.min(x, axis=-1, keepdims=True), "tp")
        xmax = jax.lax.pmax(jnp.max(x, axis=-1, keepdims=True), "tp")
        scale, rzp = _scale_zp(xmin, xmax, qcfg)
        return _fake_quant_core(x, scale, rzp, qcfg)

    def _col_linear(self, x, w):
        """Column-parallel linear: TP-exact input quant, then the SHARED
        chunked-psum implementation (parallel/tp_forward._col_linear_psum
        — overlap_chunks > 1 splits the out dim into independent
        (quant-matmul -> psum) pairs so XLA's latency-hiding scheduler
        can overlap collective k with matmul k+1; equality asserted in
        tests/test_tp_engine.py)."""
        from ..parallel.tp_forward import _col_linear_psum

        x = self._tp_act_quant(x, self.spec.act)
        return _col_linear_psum(
            x, w, "tp", getattr(self, "overlap_chunks", 1))


def _local_view(obj_dict: dict, **overrides):
    class _Cfg:
        pass

    c = _Cfg()
    c.__dict__.update(obj_dict)
    c.__dict__.update(overrides)
    return c


class TPLlamaEngine(_TPMixin, LlamaEngine):
    """Tensor-sharded llama-family continuous-batching engine."""

    def __init__(self, params: dict, cfg, mesh: Mesh, **kw):
        self.overlap_chunks = kw.pop("overlap_chunks", 1)
        tp = mesh.shape["tp"]
        assert cfg.num_attention_heads % tp == 0, "heads must divide tp"
        assert cfg.num_key_value_heads % tp == 0, "kv heads must divide tp"
        self.mesh, self.tp = mesh, tp
        self._gcfg = cfg
        dtype = kw.get("dtype", jnp.bfloat16)
        self._raw_params = params  # spec-decode drafts re-place from raw
        self._placed, self._pspecs, inter_pad = place_params(
            params, cfg, mesh, "llama", dtype)
        self._cache_nkv = cfg.num_key_value_heads
        local = _local_view(
            dict(cfg.__dict__),
            num_attention_heads=cfg.num_attention_heads // tp,
            num_key_value_heads=cfg.num_key_value_heads // tp,
            head_dim=cfg.head_dim,
            n_rep=cfg.n_rep,
            intermediate_size=inter_pad // tp,
            num_hidden_layers=cfg.num_hidden_layers,
        )
        LlamaEngine.__init__(self, self._placed, local, **kw)

    def _attn_out(self, p, attn):
        return self._col_linear(attn, p["o_proj"])

    def _mlp(self, p, x):
        from ..models.common import linear

        h = rms_norm(x, p["post_attention_layernorm"], self.cfg.rms_norm_eps)
        if "gate_up_fused" in p:
            gu = linear(h, p["gate_up_fused"], self.spec.act)
            i = self.cfg.intermediate_size  # LOCAL (padded // tp)
            gate, up = gu[..., :i], gu[..., i:]
        else:
            gate = linear(h, p["gate_proj"], self.spec.act)
            up = linear(h, p["up_proj"], self.spec.act)
        return x + self._col_linear(jax.nn.silu(gate) * up, p["down_proj"])


class TPOPTEngine(_TPMixin, OPTEngine):
    """Tensor-sharded OPT-family engine."""

    def __init__(self, params: dict, cfg, mesh: Mesh, **kw):
        self.overlap_chunks = kw.pop("overlap_chunks", 1)
        assert cfg.do_layer_norm_before, "OPTEngine supports pre-norm OPT"
        tp = mesh.shape["tp"]
        assert cfg.num_attention_heads % tp == 0, "heads must divide tp"
        self.mesh, self.tp = mesh, tp
        self._gcfg = cfg
        self._ocfg = cfg
        dtype = kw.get("dtype", jnp.bfloat16)
        self._raw_params = params
        self._placed, self._pspecs, _ = place_params(
            params, cfg, mesh, "opt", dtype)
        self._cache_nkv = cfg.num_attention_heads
        local = _local_view(
            dict(cfg.__dict__),
            num_attention_heads=cfg.num_attention_heads // tp,
            num_key_value_heads=cfg.num_attention_heads // tp,
            head_dim=cfg.head_dim,
            n_rep=1,
            hidden_size=cfg.hidden_size // tp,  # local fused-qkv split size
            intermediate_size=cfg.ffn_dim,
            rms_norm_eps=cfg.layer_norm_eps,
            rope_theta=0.0,
            num_hidden_layers=cfg.num_hidden_layers,
        )
        # skip OPTEngine.__init__ (it builds its own global adapter)
        LlamaEngine.__init__(self, self._placed, local, **kw)

    def _attn_qkv(self, p, hidden, positions):
        from ..models.common import linear

        cfg = self.cfg
        b, s, _ = hidden.shape
        if "qkv_fused" in p:
            qkv = linear(hidden, p["qkv_fused"], self.spec.act)
            h = cfg.hidden_size  # LOCAL
            q, k, v = qkv[..., :h], qkv[..., h : 2 * h], qkv[..., 2 * h :]
        else:
            q = linear(hidden, p["q_proj"], self.spec.act)
            k = linear(hidden, p["k_proj"], self.spec.act)
            v = linear(hidden, p["v_proj"], self.spec.act)
        # OPT quantizes q (pre-scaled) / k / v per-token over the FULL
        # hidden dim pre-reshape — under TP those rows are head-sharded, so
        # the ranges come from pmin/pmax (TP-exact, see _tp_act_quant)
        hd = cfg.head_dim
        q = self._tp_act_quant(q * (hd ** -0.5), self.spec.q)
        k = self._tp_act_quant(k, self.spec.k)
        v = self._tp_act_quant(v, self.spec.v)
        q = q.reshape(b, s, cfg.num_attention_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, cfg.num_attention_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, cfg.num_attention_heads, hd).transpose(0, 2, 1, 3)
        return q, k, v

    def _attn_out(self, p, attn):
        return self._col_linear(attn, p["out_proj"])

    def _mlp(self, p, x):
        from ..models.common import linear

        h = layer_norm(x, p["final_layer_norm"], self._ocfg.layer_norm_eps)
        h = jax.nn.relu(linear(h, p["fc1"], self.spec.act))
        return x + self._col_linear(h, p["fc2"])


class TPFalconEngine(_TPMixin, FalconEngine):
    """Tensor-sharded falcon-family engine.

    MQA (falcon-7b style): restructure_falcon_mqa rewrites the fused qkv so
    every shard computes its own replica of the shared k/v head — the cache
    is then (B, tp, max_len, hd) head-sharded with one local kv head per
    shard (tp-fold replication of ONE head's cache: noise next to the
    weights). New-decoder GQA shards kv groups naturally. ALiBi (the
    falcon-rw / 180B-demo lineage, reference
    runing_falcon180b_on_single_a100_80g.ipynb): slopes are computed for
    the GLOBAL head count and each shard slices its own heads' slopes by
    mesh axis index (_alibi_slopes) — both the flash prefill kernel and
    the folded-mask dense path consume the local slice."""

    def __init__(self, params: dict, cfg, mesh: Mesh, **kw):
        self.overlap_chunks = kw.pop("overlap_chunks", 1)
        tp = mesh.shape["tp"]
        assert cfg.num_attention_heads % tp == 0, "heads must divide tp"
        self.mesh, self.tp = mesh, tp
        self._gcfg = cfg
        dtype = kw.get("dtype", jnp.bfloat16)
        self._raw_params = params
        self._placed, self._pspecs, _ = place_params(
            params, cfg, mesh, "falcon", dtype)
        nh_l = cfg.num_attention_heads // tp
        if cfg.multi_query and not cfg.new_decoder_architecture:
            kv_l = 1  # per-shard replica of the single shared head
            self._cache_nkv = tp
            self._fcfg = dataclasses.replace(
                cfg, num_attention_heads=nh_l, hidden_size=nh_l * cfg.head_dim)
        else:
            n_kv = cfg.effective_kv_heads
            assert n_kv % tp == 0, "kv heads must divide tp"
            kv_l = n_kv // tp
            self._cache_nkv = n_kv
            self._fcfg = dataclasses.replace(
                cfg, num_attention_heads=nh_l,
                num_kv_heads=kv_l if cfg.new_decoder_architecture else None,
                hidden_size=nh_l * cfg.head_dim)
        local = _local_view(
            dict(cfg.__dict__),
            num_attention_heads=nh_l,
            num_key_value_heads=kv_l,
            head_dim=cfg.head_dim,
            n_rep=nh_l // kv_l,
            rms_norm_eps=cfg.layer_norm_eps,
            rope_theta=cfg.rope_theta,
            hidden_size=nh_l * cfg.head_dim,
            num_hidden_layers=cfg.num_hidden_layers,
        )
        LlamaEngine.__init__(self, self._placed, local, **kw)

    def _attn_out(self, p, attn):
        return self._col_linear(attn, p["dense"])

    def _alibi_slopes(self):
        """LOCAL slice of the global ALiBi slopes: slopes depend on the
        global head count and head index, and the row-sharded qkv gives
        shard i heads [i*nh_l, (i+1)*nh_l) — so compute all slopes and
        dynamic-slice by the shard's mesh position (runs inside
        shard_map, where axis_index is defined)."""
        if not self._gcfg.alibi:
            return None
        from ..models.falcon import alibi_slopes

        full = alibi_slopes(self._gcfg.num_attention_heads)
        nh_l = self._gcfg.num_attention_heads // self.tp
        idx = jax.lax.axis_index("tp")
        return jax.lax.dynamic_slice_in_dim(full, idx * nh_l, nh_l)

    def _block(self, p, x, positions, mask, commit):
        cfg = self._fcfg
        if self._gcfg.alibi:
            # same fold as the single-chip FalconEngine._block, with the
            # shard-local slope slice (head axis is local under TP)
            kv_len = mask.shape[-1]
            dist = jnp.arange(kv_len, dtype=jnp.float32)
            bias = (self._alibi_slopes()[:, None, None]
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
        from ..models.common import linear

        h = jax.nn.gelu(
            linear(mlp_ln, p["dense_h_to_4h"], self.spec.act),
            approximate=False)
        mlp_out = self._col_linear(h, p["dense_4h_to_h"])
        if cfg.new_decoder_architecture or cfg.parallel_attn:
            mlp_out = mlp_out + attn_out
        return residual + mlp_out


TP_ENGINES = {
    "llama": TPLlamaEngine,
    "opt": TPOPTEngine,
    "falcon": TPFalconEngine,
}
