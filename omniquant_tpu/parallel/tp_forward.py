"""Tensor-parallel block forwards over packed weights via shard_map.

XLA auto-partitions the dense fake-quant path from NamedSharding constraints
alone (parallel/sharding.py), but a Pallas kernel is opaque to the
partitioner — packed-weight TP therefore runs the whole block inside
shard_map with explicit collectives:

  row-parallel (no comms):   llama q/k/v/gate/up, OPT q/k/v/fc1,
                             falcon query_key_value/dense_h_to_4h
  column-parallel (psum):    llama o/down, OPT out_proj/fc2,
                             falcon dense/dense_4h_to_h
  attention:                 head-parallel (each shard owns n_heads/tp heads)

Column-parallel biases are added ONCE after the psum (adding per shard would
multiply them by tp).

Shard alignment: row-parallel out dims split per shard on 128-lane / head
boundaries; column-parallel packed rows split on whole pack tiles and quant
groups. `pad_intermediate_packed` pads the MLP intermediate dimension to a
multiple of tp x lcm(tile, 128) with provably-zero contributions: padded
gate/up/fc1 output channels carry scale=0 groups (dequant -> exact 0, so
silu(0)*0 = 0 / relu(0) = 0 / gelu(0) = 0 activations), and the padded
down/fc2 input rows then multiply those exact zeros. This is how LLaMA-7B's
intermediate 11008 runs at tp in {2, 4, 8} (11008 is not a multiple of
tp x 512).

The reference capability matched (and exceeded — it had no real TP at all):
parallel_utils.py:89-163 binned whole layers onto GPUs sequentially.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..kernels.quant_matmul import quant_matmul
from ..models import llama as jllama
from ..models import falcon as jfalcon
from ..models.common import causal_mask, layer_norm, repeat_kv, rms_norm
from ..quant.packing import (
    PackedWeight, pack_tile, rows_per_words, words_per_rows)
from ..quant.quantizer import QuantConfig


# ---------------------------------------------------------------------------
# packed-weight padding (intermediate dim -> tp x tile multiples)
# ---------------------------------------------------------------------------

def _pad_packed_out(pw: PackedWeight, new_out: int) -> PackedWeight:
    """Pad a row-parallel PackedWeight's OUT dim (qweight lanes, scale/zero
    rows, bias) to `new_out`. Padded channels get scale=0 groups, so their
    dequantized weights — and therefore their activations — are exactly 0."""
    pad = new_out - pw.out_features
    if pad == 0:
        return pw
    assert pad > 0
    return dataclasses.replace(
        pw,
        qweight=jnp.pad(pw.qweight, ((0, 0), (0, pad))),
        scales=jnp.pad(pw.scales, ((0, pad), (0, 0))),
        zeros=jnp.pad(pw.zeros, ((0, pad), (0, 0))),
        bias=None if pw.bias is None else jnp.pad(pw.bias, (0, pad)),
        out_features=new_out,
    )


def _pad_packed_in(pw: PackedWeight, new_in: int) -> PackedWeight:
    """Pad a column-parallel PackedWeight's IN dim (packed word rows + scale
    groups) to `new_in` (a multiple of tile_k). The padded rows' codes are
    zero words with scale-0 groups; their inputs are the exact zeros produced
    by the padded row-parallel partner, so contributions are exactly 0."""
    if new_in == pw.in_features:
        return pw
    assert new_in > pw.in_features and new_in % pw.tile_k == 0, (
        new_in, pw.in_features, pw.tile_k)
    k_pad_old = rows_per_words(pw.bits, pw.qweight.shape[0], pw.layout)
    new_words = words_per_rows(pw.bits, new_in, pw.layout)
    qweight = jnp.pad(pw.qweight,
                      ((0, new_words - pw.qweight.shape[0]), (0, 0)))
    scales, zeros = pw.scales, pw.zeros
    if pw.group_size:
        n_g_new = new_in // pw.group_size
        g_pad = n_g_new - scales.shape[1]
        if g_pad:
            scales = jnp.pad(scales, ((0, 0), (0, g_pad)))
            zeros = jnp.pad(zeros, ((0, 0), (0, g_pad)))
    return dataclasses.replace(
        pw, qweight=qweight, scales=scales, zeros=zeros, in_features=new_in)


def _retile_packed(pw: PackedWeight, new_tile: int) -> PackedWeight:
    """Repack with a different layout tile (tile_k is a layout parameter,
    not semantics): unpack the full padded row range and re-pack. Used when a
    column-parallel shard boundary wouldn't land on a whole-tile boundary."""
    from ..quant.packing import pack_codes, unpack_codes

    k_total = rows_per_words(pw.bits, pw.qweight.shape[0], pw.layout)
    codes = unpack_codes(pw.qweight, pw.bits, k_total, pw.group_size,
                         pw.tile_k, pw.layout)  # incl. layout pad rows
    assert k_total % new_tile == 0, (k_total, new_tile)
    qweight = pack_codes(codes.T, pw.bits, pw.group_size, new_tile,
                         pw.layout)
    return dataclasses.replace(pw, qweight=qweight, tile_k=new_tile)


def _min_tile(bits: int, group_size: Optional[int],
              layout: str = "planar") -> int:
    if bits == 3 and layout == "pairs":
        base = 80  # 10 codes/word x 8 sublanes (quant/packing.pack_tile)
    elif bits == 3:
        base = 256
    else:
        base = 8 * (32 // bits)
    if group_size:
        base = base * group_size // math.gcd(base, group_size)
    return base


def _ensure_col_splittable(pw: PackedWeight, tp: int) -> PackedWeight:
    """Make a column-parallel PackedWeight's packed rows splittable into tp
    whole-tile shards, re-tiling to a smaller layout tile if needed."""
    k_total = rows_per_words(pw.bits, pw.qweight.shape[0], pw.layout)
    if k_total % tp == 0 and (k_total // tp) % pw.tile_k == 0:
        return pw
    base = _min_tile(pw.bits, pw.group_size, pw.layout)
    k_local = k_total // tp
    if k_total % tp or k_local % base:
        raise ValueError(
            f"in_features {k_total} cannot split into {tp} shards of whole "
            f"{base}-row pack tiles (bits={pw.bits}, group={pw.group_size})")
    # largest multiple of base dividing the local row count, capped at the
    # original tile so K-step granularity never grows
    tile = base
    while tile * 2 <= pw.tile_k and k_local % (tile * 2) == 0:
        tile *= 2
    return _retile_packed(pw, tile)


def _pad_dense_out(w: dict, new_out: int) -> dict:
    pad = new_out - w["weight"].shape[0]
    if pad == 0:
        return w
    return {
        "weight": jnp.pad(w["weight"], ((0, pad), (0, 0))),
        "bias": None if w.get("bias") is None else jnp.pad(w["bias"], (0, pad)),
    }


def _pad_dense_in(w: dict, new_in: int) -> dict:
    pad = new_in - w["weight"].shape[1]
    if pad == 0:
        return w
    return {
        "weight": jnp.pad(w["weight"], ((0, 0), (0, pad))),
        "bias": w.get("bias"),
    }


_MLP_NAMES = {
    "llama": (("gate_proj", "up_proj"), "down_proj"),
    "opt": (("fc1",), "fc2"),
    "falcon": (("dense_h_to_4h",), "dense_4h_to_h"),
}


def pad_intermediate_packed(block: dict, cfg, tp: int,
                            family: str = "llama") -> dict:
    """Pad the MLP so the intermediate dim splits on tp x pack-tile
    boundaries with exact-zero pad contributions (see module docstring).
    Works on PackedWeight and dense-dict linears alike; returns a new block.
    """
    row_names, col_name = _MLP_NAMES[family]
    col = block[col_name]
    if isinstance(col, PackedWeight):
        tile = col.tile_k
        inter = block[row_names[0]].out_features
        # per-shard rows must be whole pack tiles; per-shard lanes multiples
        # of 128 keep the kernel on its fast path
        unit = tp * (tile * 128 // math.gcd(tile, 128))
    else:
        inter = block[row_names[0]]["weight"].shape[0]
        unit = tp  # dense shards only need an even split
    inter_pad = -(-inter // unit) * unit
    if inter_pad == inter and (
            not isinstance(col, PackedWeight)
            or rows_per_words(col.bits, col.qweight.shape[0],
                              col.layout) == inter_pad):
        return block
    out = dict(block)
    for name in row_names:
        w = out[name]
        out[name] = (_pad_packed_out(w, inter_pad)
                     if isinstance(w, PackedWeight)
                     else _pad_dense_out(w, inter_pad))
    out[col_name] = (_pad_packed_in(col, inter_pad)
                     if isinstance(col, PackedWeight)
                     else _pad_dense_in(col, inter_pad))
    return out


def restructure_falcon_mqa(block: dict, cfg, tp: int) -> dict:
    """Rewrite falcon's multi-query fused qkv [q0..q{nh-1}, k, v] into
    per-shard blocks [q-slice_i, k, v] so a plain row shard gives every
    shard its own replica of the shared k/v head. Purely a host-side
    relayout of output channels (lanes for PackedWeight), done once at
    placement time; the shard then computes standard MQA with nh/tp heads."""
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    assert nh % tp == 0, (
        f"falcon MQA TP needs num_heads % tp == 0 (got {nh} % {tp}); "
        "pad heads or choose a tp that divides the head count")
    nh_l = nh // tp
    qkv = block["query_key_value"]

    def relayout(take_rows):
        parts = []
        for i in range(tp):
            parts.append(take_rows(i * nh_l * hd, nh_l * hd))   # q slice
            parts.append(take_rows(nh * hd, 2 * hd))            # shared k,v
        return parts

    out = dict(block)
    if isinstance(qkv, PackedWeight):
        parts_q = relayout(lambda s, n: qkv.qweight[:, s : s + n])
        parts_s = relayout(lambda s, n: qkv.scales[s : s + n])
        parts_z = relayout(lambda s, n: qkv.zeros[s : s + n])
        bias = None
        if qkv.bias is not None:
            bias = jnp.concatenate(
                relayout(lambda s, n: qkv.bias[s : s + n]))
        out["query_key_value"] = dataclasses.replace(
            qkv,
            qweight=jnp.concatenate(parts_q, axis=1),
            scales=jnp.concatenate(parts_s, axis=0),
            zeros=jnp.concatenate(parts_z, axis=0),
            bias=bias,
            out_features=tp * (nh_l + 2) * hd,
        )
    else:
        w = qkv["weight"]
        parts = relayout(lambda s, n: w[s : s + n])
        bias = None
        if qkv.get("bias") is not None:
            bias = jnp.concatenate(
                relayout(lambda s, n: qkv["bias"][s : s + n]))
        out["query_key_value"] = {
            "weight": jnp.concatenate(parts, axis=0), "bias": bias}
    return out


# ---------------------------------------------------------------------------
# sharded placement
# ---------------------------------------------------------------------------

def _pw_sharded_row(pw: PackedWeight, mesh: Mesh):
    """Row-parallel placement: shard qweight lanes / scale rows / bias."""
    return PackedWeight(
        qweight=jax.device_put(pw.qweight, NamedSharding(mesh, P(None, "tp"))),
        scales=jax.device_put(pw.scales, NamedSharding(mesh, P("tp", None))),
        zeros=jax.device_put(pw.zeros, NamedSharding(mesh, P("tp", None))),
        bias=None if pw.bias is None else jax.device_put(
            pw.bias, NamedSharding(mesh, P("tp"))),
        bits=pw.bits, group_size=pw.group_size,
        in_features=pw.in_features, out_features=pw.out_features,
        tile_k=pw.tile_k, layout=pw.layout,
    )


def _pw_sharded_col(pw: PackedWeight, mesh: Mesh):
    """Column-parallel placement: shard packed rows and scale groups;
    replicate the bias (added once after the psum)."""
    sc_spec = P(None, "tp") if pw.group_size else P()
    return PackedWeight(
        qweight=jax.device_put(pw.qweight, NamedSharding(mesh, P("tp", None))),
        scales=jax.device_put(pw.scales, NamedSharding(mesh, sc_spec)),
        zeros=jax.device_put(pw.zeros, NamedSharding(mesh, sc_spec)),
        bias=None if pw.bias is None else jax.device_put(
            pw.bias, NamedSharding(mesh, P())),
        bits=pw.bits, group_size=pw.group_size,
        in_features=pw.in_features, out_features=pw.out_features,
        tile_k=pw.tile_k, layout=pw.layout,
    )


ROW_NAMES = {
    "llama": ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"),
    "opt": ("q_proj", "k_proj", "v_proj", "fc1"),
    "falcon": ("query_key_value", "dense_h_to_4h"),
}
COL_NAMES = {
    "llama": ("o_proj", "down_proj"),
    "opt": ("out_proj", "fc2"),
    "falcon": ("dense", "dense_4h_to_h"),
}


def _make_shard_block(mesh: Mesh, family: str, cfg, tp: int):
    rows, cols = ROW_NAMES[family], COL_NAMES[family]

    def shard_block(block: dict):
        """Pad + place one calibrated block's weights for TP."""
        block = pad_intermediate_packed(block, cfg, tp, family)
        if (family == "falcon" and cfg.multi_query
                and not cfg.new_decoder_architecture and tp > 1):
            block = restructure_falcon_mqa(block, cfg, tp)
        out = {}
        for name, w in block.items():
            if name in rows:
                if isinstance(w, PackedWeight):
                    out[name] = _pw_sharded_row(w, mesh)
                else:
                    out[name] = {
                        "weight": jax.device_put(
                            w["weight"], NamedSharding(mesh, P("tp", None))),
                        "bias": None if w.get("bias") is None else
                        jax.device_put(w["bias"], NamedSharding(mesh, P("tp"))),
                    }
            elif name in cols:
                if isinstance(w, PackedWeight):
                    out[name] = _pw_sharded_col(
                        _ensure_col_splittable(w, tp), mesh)
                else:
                    out[name] = {
                        "weight": jax.device_put(
                            w["weight"], NamedSharding(mesh, P(None, "tp"))),
                        "bias": None if w.get("bias") is None else
                        jax.device_put(w["bias"], NamedSharding(mesh, P())),
                    }
            else:
                out[name] = jax.tree.map(
                    lambda a: jax.device_put(a, NamedSharding(mesh, P())),
                    w, is_leaf=lambda a: a is None)
        return out

    def _pw_local_spec(pw, row):
        qw = P(None, "tp") if row else P("tp", None)
        if row:
            sc = P("tp", None)
        else:
            sc = P(None, "tp") if pw.group_size else P()
        return PackedWeight(
            qweight=qw, scales=sc, zeros=sc,
            bias=None if pw.bias is None else (P("tp") if row else P()),
            bits=pw.bits, group_size=pw.group_size,
            in_features=pw.in_features, out_features=pw.out_features,
            tile_k=pw.tile_k, layout=pw.layout)

    def block_specs(block):
        out = {}
        for name, w in block.items():
            row = name in rows
            if row or name in cols:
                if isinstance(w, PackedWeight):
                    out[name] = _pw_local_spec(w, row)
                else:
                    wspec = P("tp", None) if row else P(None, "tp")
                    bspec = (P("tp") if row else P()) if (
                        w.get("bias") is not None) else None
                    out[name] = {"weight": wspec, "bias": bspec}
            else:
                out[name] = jax.tree.map(
                    lambda a: P(), w, is_leaf=lambda a: a is None)
        return out

    return shard_block, block_specs


# ---------------------------------------------------------------------------
# shard-local compute
# ---------------------------------------------------------------------------

def _fix_local_pw(w: PackedWeight) -> PackedWeight:
    """Inside shard_map the arrays are LOCAL shards; rebuild the logical
    dims from the actual shard shapes (row-parallel shrank out; column-
    parallel shrank in)."""
    local_rows = rows_per_words(w.bits, w.qweight.shape[0], w.layout)
    return dataclasses.replace(
        w, out_features=w.qweight.shape[1],
        in_features=min(w.in_features, local_rows))


def _row_linear(x, w):
    """Row-parallel local matmul (bias shard added locally)."""
    if isinstance(w, PackedWeight):
        return quant_matmul(x, _fix_local_pw(w))
    y = x @ w["weight"].T
    if w.get("bias") is not None:
        y = y + w["bias"]
    return y


def _slice_packed_out(pw: PackedWeight, n0: int, n1: int) -> PackedWeight:
    """Static slice of a PackedWeight along OUT (qweight lanes + scale/zero
    rows + bias). Any [n0, n1) is layout-valid: packing is per-lane along
    out, so no word boundaries are crossed."""
    return dataclasses.replace(
        pw,
        qweight=jax.lax.slice_in_dim(pw.qweight, n0, n1, axis=1),
        scales=jax.lax.slice_in_dim(pw.scales, n0, n1, axis=0),
        zeros=jax.lax.slice_in_dim(pw.zeros, n0, n1, axis=0),
        bias=None if pw.bias is None else pw.bias[n0:n1],
        out_features=n1 - n0)


def effective_overlap_chunks(n: int, chunks: int) -> int:
    """Largest c <= chunks such that every chunk keeps the kernel's 128-lane
    tiling (n % (c*128) == 0); 1 when n is too small to split."""
    c = max(1, chunks)
    while c > 1 and n % (c * 128) != 0:
        c -= 1
    return c


def _col_linear_psum(x, w, tp_axis, overlap_chunks: int = 1):
    """Column-parallel: local partial product, all-reduce, then the
    (replicated) bias exactly once.

    overlap_chunks > 1 splits the OUT dim into that many independent
    (matmul -> psum) pairs. Each chunk's all-reduce depends only on its own
    partial product, so XLA's latency-hiding scheduler can run collective
    chunk k while the MXU computes chunk k+1 — the north-star "all-reduce
    overlapped with quantized matmuls" (SURVEY §2.3; the reference has no
    tensor parallelism at all, its parallel_utils.py:89-163 is sequential
    layer placement). Exact equality with the unchunked path is asserted
    in tests/test_tp_packed.py / test_tp_engine.py; scripts/exp_tp_overlap.py
    records the HLO-schedule artifact."""
    if isinstance(w, PackedWeight):
        wl = _fix_local_pw(w)
        n = wl.out_features
        c = effective_overlap_chunks(n, overlap_chunks)
        if c > 1:
            step = n // c
            parts = [
                jax.lax.psum(
                    quant_matmul(
                        x, dataclasses.replace(
                            _slice_packed_out(wl, i * step, (i + 1) * step),
                            bias=None)),
                    tp_axis)
                for i in range(c)
            ]
            y = jnp.concatenate(parts, axis=-1)
        else:
            y = jax.lax.psum(
                quant_matmul(x, dataclasses.replace(wl, bias=None)), tp_axis)
        if w.bias is not None:
            y = y + w.bias.astype(y.dtype)
        return y
    n = w["weight"].shape[0]
    c = effective_overlap_chunks(n, overlap_chunks)
    if c > 1:
        step = n // c
        y = jnp.concatenate([
            jax.lax.psum(x @ w["weight"][i * step:(i + 1) * step].T, tp_axis)
            for i in range(c)
        ], axis=-1)
    else:
        y = jax.lax.psum(x @ w["weight"].T, tp_axis)
    if w.get("bias") is not None:
        y = y + w["bias"]
    return y


def _llama_block_fn(cfg, tp, tp_axis, overlap_chunks: int = 1):
    hd = cfg.head_dim
    n_heads_l = cfg.num_attention_heads // tp
    n_kv_l = max(1, cfg.num_key_value_heads // tp)
    assert cfg.num_attention_heads % tp == 0, "heads must divide tp"
    assert cfg.num_key_value_heads % tp == 0, "kv heads must divide tp"

    def block_fn(p, x, mask, positions):
        b, s, h = x.shape
        residual = x
        hidden = rms_norm(x, p["input_layernorm"], cfg.rms_norm_eps)
        q = _row_linear(hidden, p["q_proj"]).reshape(
            b, s, n_heads_l, hd).transpose(0, 2, 1, 3)
        k = _row_linear(hidden, p["k_proj"]).reshape(
            b, s, n_kv_l, hd).transpose(0, 2, 1, 3)
        v = _row_linear(hidden, p["v_proj"]).reshape(
            b, s, n_kv_l, hd).transpose(0, 2, 1, 3)
        cos, sin = jllama.rope_cos_sin(positions, hd, cfg.rope_theta,
                                       dtype=x.dtype)
        q, k = jllama.apply_rope(q, k, cos, sin)
        k = repeat_kv(k, n_heads_l // n_kv_l)
        v = repeat_kv(v, n_heads_l // n_kv_l)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (hd**0.5)
        probs = jax.nn.softmax(
            (scores + mask).astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, n_heads_l * hd)
        x = residual + _col_linear_psum(attn, p["o_proj"], tp_axis, overlap_chunks)

        residual = x
        hidden = rms_norm(x, p["post_attention_layernorm"], cfg.rms_norm_eps)
        gate = _row_linear(hidden, p["gate_proj"])
        up = _row_linear(hidden, p["up_proj"])
        mlp = _col_linear_psum(jax.nn.silu(gate) * up, p["down_proj"], tp_axis, overlap_chunks)
        return residual + mlp

    return block_fn


def _opt_block_fn(cfg, tp, tp_axis, overlap_chunks: int = 1):
    hd = cfg.head_dim
    n_heads_l = cfg.num_attention_heads // tp
    assert cfg.num_attention_heads % tp == 0, "heads must divide tp"

    def block_fn(p, x, mask, positions):
        b, s, h = x.shape
        residual = x
        hidden = x
        if cfg.do_layer_norm_before:
            hidden = layer_norm(
                hidden, p["self_attn_layer_norm"], cfg.layer_norm_eps)
        q = _row_linear(hidden, p["q_proj"]) * (hd**-0.5)
        k = _row_linear(hidden, p["k_proj"])
        v = _row_linear(hidden, p["v_proj"])
        q = q.reshape(b, s, n_heads_l, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, n_heads_l, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, n_heads_l, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        probs = jax.nn.softmax(
            (scores + mask).astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, n_heads_l * hd)
        x = residual + _col_linear_psum(attn, p["out_proj"], tp_axis, overlap_chunks)
        if not cfg.do_layer_norm_before:
            x = layer_norm(x, p["self_attn_layer_norm"], cfg.layer_norm_eps)

        residual = x
        hidden = x
        if cfg.do_layer_norm_before:
            hidden = layer_norm(
                hidden, p["final_layer_norm"], cfg.layer_norm_eps)
        hidden = jax.nn.relu(_row_linear(hidden, p["fc1"]))
        x = residual + _col_linear_psum(hidden, p["fc2"], tp_axis, overlap_chunks)
        if not cfg.do_layer_norm_before:
            x = layer_norm(x, p["final_layer_norm"], cfg.layer_norm_eps)
        return x

    return block_fn


def _falcon_block_fn(cfg, tp, tp_axis, overlap_chunks: int = 1):
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    assert nh % tp == 0, "heads must divide tp"
    nh_l = nh // tp
    if cfg.new_decoder_architecture:
        n_kv = cfg.effective_kv_heads
        assert n_kv % tp == 0, "kv heads must divide tp"
        cfg_l = dataclasses.replace(
            cfg, num_attention_heads=nh_l, num_kv_heads=n_kv // tp,
            hidden_size=nh_l * hd)
    else:
        # multi_query shards see [q-slice, k, v] after restructure_falcon_mqa;
        # old non-MQ layouts shard naturally on (head, 3, hd) boundaries
        cfg_l = dataclasses.replace(
            cfg, num_attention_heads=nh_l, hidden_size=nh_l * hd)

    def block_fn(p, x, mask, positions):
        b, s, h = x.shape
        residual = x
        if cfg.new_decoder_architecture:
            attn_ln_out = layer_norm(x, p["ln_attn"], cfg.layer_norm_eps)
            mlp_ln_out = layer_norm(x, p["ln_mlp"], cfg.layer_norm_eps)
        else:
            attn_ln_out = layer_norm(
                x, p["input_layernorm"], cfg.layer_norm_eps)
            mlp_ln_out = None

        fused = _row_linear(attn_ln_out, p["query_key_value"])
        q, k, v = jfalcon.split_heads(fused, cfg_l)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if not cfg.alibi:
            cos, sin = jllama.rope_cos_sin(positions, hd, cfg.rope_theta,
                                           dtype=x.dtype)
            q, k = jllama.apply_rope(q, k, cos, sin)
        kv_len = k.shape[2]
        m = mask
        if cfg.alibi:
            # this shard owns heads [idx*nh_l, (idx+1)*nh_l) — slice its
            # slopes from the global table
            idx = jax.lax.axis_index(tp_axis)
            slopes = jax.lax.dynamic_slice_in_dim(
                jfalcon.alibi_slopes(nh), idx * nh_l, nh_l)
            dist = jnp.arange(kv_len)[None, :].astype(jnp.float32)
            bias = (slopes[:, None, None] * dist[None]
                    * (1.0 / hd**0.5)).astype(x.dtype)
            m = m + bias[None]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (hd**0.5)
        probs = jax.nn.softmax(
            (scores + m).astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, nh_l * hd)
        attn_out = _col_linear_psum(attn, p["dense"], tp_axis, overlap_chunks)

        if not cfg.new_decoder_architecture:
            if cfg.parallel_attn:
                mlp_ln_out = attn_ln_out
            else:
                residual = residual + attn_out
                mlp_ln_out = layer_norm(
                    residual, p["post_attention_layernorm"],
                    cfg.layer_norm_eps)
        hmid = jax.nn.gelu(
            _row_linear(mlp_ln_out, p["dense_h_to_4h"]), approximate=False)
        mlp_out = _col_linear_psum(hmid, p["dense_4h_to_h"], tp_axis, overlap_chunks)
        if cfg.new_decoder_architecture or cfg.parallel_attn:
            mlp_out = mlp_out + attn_out
        return residual + mlp_out

    return block_fn


_BLOCK_FNS = {
    "llama": _llama_block_fn,
    "opt": _opt_block_fn,
    "falcon": _falcon_block_fn,
}


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def make_tp_forward(family: str, mesh: Mesh, cfg, tp_axis: str = "tp",
                    overlap_chunks: int = 1):
    """Returns (make_forward, shard_block): shard_block pads + places one
    calibrated block's weights (PackedWeight or dense) for TP; make_forward
    builds the jitted tensor-parallel trunk over the sharded blocks.
    Embeds/head stay outside (replicated)."""
    tp = mesh.shape[tp_axis]
    shard_block, block_specs = _make_shard_block(mesh, family, cfg, tp)
    block_fn = _BLOCK_FNS[family](cfg, tp, tp_axis, overlap_chunks)
    uses_alibi = family == "falcon" and cfg.alibi

    def make_forward(layers):
        specs = block_specs(layers[0])
        smapped = shard_map(
            block_fn, mesh=mesh,
            in_specs=(specs, P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )

        @jax.jit
        def fwd(layers, x):
            s = x.shape[1]
            mask = causal_mask(s, s, dtype=x.dtype)
            positions = jnp.arange(s)
            for block in layers:
                x = smapped(block, x, mask, positions)
            return x

        return fwd

    return make_forward, shard_block


def make_tp_llama_forward(mesh: Mesh, cfg, tp_axis: str = "tp"):
    """Back-compat alias for the llama family."""
    return make_tp_forward("llama", mesh, cfg, tp_axis)
