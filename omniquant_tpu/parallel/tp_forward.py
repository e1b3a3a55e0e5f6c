"""Tensor-parallel llama forward over packed weights via shard_map.

XLA auto-partitions the dense fake-quant path from NamedSharding constraints
alone (parallel/sharding.py), but a Pallas kernel is opaque to the
partitioner — packed-weight TP therefore runs the whole block inside
shard_map with explicit collectives:

  q/k/v, gate/up : row-parallel (heads / intermediate sharded) — no comms
  o_proj, down   : column-parallel partial sums -> psum over the tp axis
  attention      : head-parallel (each shard owns n_heads/tp heads)

Shard alignment: row-parallel out dims must divide by tp on head/group
boundaries; column-parallel packed rows must split on pack-tile boundaries.
`pad_intermediate_packed` pads gate/up/down so the intermediate dim is a
multiple of tp*tile_k with zero-contribution pad channels (zero gate/up rows
=> silu(0)*0 = 0 activations => padded down rows see exact zeros).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..kernels.quant_matmul import quant_matmul
from ..models import llama as jllama
from ..models.common import causal_mask, repeat_kv, rms_norm
from ..quant.packing import PackedWeight, pack_weight, pack_tile
from ..quant.quantizer import QuantConfig


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
        tile_k=pw.tile_k,
    )


def _pw_sharded_col(pw: PackedWeight, mesh: Mesh):
    """Column-parallel placement: shard packed rows / replicate scales' out
    axis but shard group rows."""
    return PackedWeight(
        qweight=jax.device_put(pw.qweight, NamedSharding(mesh, P("tp", None))),
        scales=jax.device_put(pw.scales, NamedSharding(mesh, P(None, "tp"))),
        zeros=jax.device_put(pw.zeros, NamedSharding(mesh, P(None, "tp"))),
        bias=None if pw.bias is None else jax.device_put(
            pw.bias, NamedSharding(mesh, P())),
        bits=pw.bits, group_size=pw.group_size,
        in_features=pw.in_features, out_features=pw.out_features,
        tile_k=pw.tile_k,
    )


def pad_intermediate_packed(block: dict, cfg, tp: int) -> dict:
    """Pad gate/up (out) and down (in) so the intermediate dim splits on
    tp * pack-tile boundaries, with exact-zero pad contributions."""
    gate = block["gate_proj"]
    tile = gate.tile_k
    inter = gate.out_features
    unit = tp * tile
    pad = (-inter) % unit
    if pad == 0:
        return block
    raise NotImplementedError(
        "intermediate dim padding for packed TP not yet implemented; "
        f"need intermediate {inter} to be a multiple of {unit} — choose tp "
        "accordingly or repack with padding")


def make_tp_llama_forward(mesh: Mesh, cfg, tp_axis: str = "tp"):
    """Returns (shard_fn, shard_block): shard_block places one calibrated
    block's weights (PackedWeight or dense) for TP; shard_fn(layers, x)
    runs the blocks tensor-parallel. Embeds/head stay outside (replicated).
    """
    tp = mesh.shape[tp_axis]
    hd = cfg.head_dim
    n_heads_l = cfg.num_attention_heads // tp
    n_kv_l = max(1, cfg.num_key_value_heads // tp)
    assert cfg.num_attention_heads % tp == 0, "heads must divide tp"
    assert cfg.num_key_value_heads % tp == 0, "kv heads must divide tp"

    def local_linear(x, w):
        if isinstance(w, PackedWeight):
            import dataclasses as _dc

            from ..quant.packing import rows_per_words

            # inside shard_map the arrays are LOCAL shards; rebuild the
            # aux dims from the actual shard shapes
            local_rows = rows_per_words(w.bits, w.qweight.shape[0])
            w = _dc.replace(
                w, out_features=w.qweight.shape[1],
                in_features=min(w.in_features, local_rows))
            return quant_matmul(x, w)
        y = x @ w["weight"].T
        if w.get("bias") is not None:
            y = y + w["bias"]
        return y

    def block_fn(p, x, mask, positions):
        """Runs on each shard with LOCAL weight shards; x replicated."""
        b, s, h = x.shape
        residual = x
        hidden = rms_norm(x, p["input_layernorm"], cfg.rms_norm_eps)
        q = local_linear(hidden, p["q_proj"]).reshape(
            b, s, n_heads_l, hd).transpose(0, 2, 1, 3)
        k = local_linear(hidden, p["k_proj"]).reshape(
            b, s, n_kv_l, hd).transpose(0, 2, 1, 3)
        v = local_linear(hidden, p["v_proj"]).reshape(
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
        # column-parallel: local partial product then all-reduce
        attn_out = jax.lax.psum(local_linear(attn, p["o_proj"]), tp_axis)
        x = residual + attn_out

        residual = x
        hidden = rms_norm(x, p["post_attention_layernorm"], cfg.rms_norm_eps)
        gate = local_linear(hidden, p["gate_proj"])
        up = local_linear(hidden, p["up_proj"])
        mlp = jax.lax.psum(
            local_linear(jax.nn.silu(gate) * up, p["down_proj"]), tp_axis)
        return residual + mlp

    def shard_block(block: dict):
        """Place one block's calibrated weights for TP."""
        out = {}
        for name, w in block.items():
            if name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
                if isinstance(w, PackedWeight):
                    out[name] = _pw_sharded_row(w, mesh)
                else:
                    out[name] = {
                        "weight": jax.device_put(
                            w["weight"], NamedSharding(mesh, P("tp", None))),
                        "bias": None if w.get("bias") is None else
                        jax.device_put(w["bias"], NamedSharding(mesh, P("tp"))),
                    }
            elif name in ("o_proj", "down_proj"):
                if isinstance(w, PackedWeight):
                    out[name] = _pw_sharded_col(w, mesh)
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
        qw = P(None, tp_axis) if row else P(tp_axis, None)
        sc = P(tp_axis, None) if row else P(None, tp_axis)
        return PackedWeight(
            qweight=qw, scales=sc, zeros=sc,
            bias=None if pw.bias is None else (P(tp_axis) if row else P()),
            bits=pw.bits, group_size=pw.group_size,
            in_features=pw.in_features, out_features=pw.out_features,
            tile_k=pw.tile_k)

    def block_specs(block):
        out = {}
        for name, w in block.items():
            row = name in ("q_proj", "k_proj", "v_proj", "gate_proj",
                           "up_proj")
            if name in ("o_proj", "down_proj") or row:
                if isinstance(w, PackedWeight):
                    out[name] = _pw_local_spec(w, row)
                else:
                    wspec = P(tp_axis, None) if row else P(None, tp_axis)
                    bspec = (P(tp_axis) if row else P()) if (
                        w.get("bias") is not None) else None
                    out[name] = {"weight": wspec, "bias": bspec}
            else:
                out[name] = jax.tree.map(
                    lambda a: P(), w, is_leaf=lambda a: a is None)
        return out

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
