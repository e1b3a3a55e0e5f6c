"""Mesh construction and parameter sharding specs.

The TPU-native replacement for the reference's multi-GPU story
(parallel_utils.py:89-163 greedily binned whole layers onto GPUs and moved
activations with forward hooks — no collectives). Here distribution is
declarative: a jax.sharding.Mesh over (dp, tp) axes + NamedSharding
PartitionSpecs per parameter; XLA inserts the all-gathers/reduce-scatters
over ICI.

Tensor-parallel layout (Megatron-style, quantization-aware):
  q/k/v/gate/up: row-parallel (out axis sharded on tp) — head-aligned
  o/down:        column-parallel (in axis sharded on tp), output all-reduced
  norms/embeds:  replicated (embed optionally dp-sharded by batch)
For PackedWeight linears the same specs apply to qweight's `out` lane axis
(row-parallel) or its packed-row axis (column-parallel; shard boundaries
stay group- and tile-aligned because shapes are multiples of tile_k).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.packing import PackedWeight


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _linear_spec(row_parallel: bool, sub):
    """PartitionSpec pytree for one linear (dict weight/bias or PackedWeight).

    Dense weights are (out, in). PackedWeight.qweight is (k_words, out) —
    the transposed layout, so row-parallel shards its *lane* axis and
    column-parallel shards its *sublane* (packed-row) axis; grouped scales
    (out, n_groups) shard accordingly. Spec PackedWeights mirror the target's
    aux metadata so the two pytrees have identical treedefs.
    """
    if not isinstance(sub, PackedWeight):
        if row_parallel:
            return {"weight": P("tp", None), "bias": P("tp")}
        return {"weight": P(None, "tp"), "bias": P()}
    if row_parallel:
        qw, sc, b = P(None, "tp"), P("tp", None), P("tp")
    else:
        qw, sc, b = P("tp", None), P(None, "tp"), P()
    return PackedWeight(
        qweight=qw, scales=sc, zeros=sc,
        bias=b if sub.bias is not None else None,
        bits=sub.bits, group_size=sub.group_size,
        in_features=sub.in_features, out_features=sub.out_features,
        tile_k=sub.tile_k)


ROW_PARALLEL = {
    "llama": ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"),
    "opt": ("q_proj", "k_proj", "v_proj", "fc1"),
    # fused qkv row-shards are legal for ANY falcon head layout on the dense
    # path: NamedShardings are hints, GSPMD re-gathers where the head split
    # needs it (the packed shard_map path instead restructures the fused
    # layout at placement time — parallel/tp_forward.py).
    "falcon": ("query_key_value", "dense_h_to_4h"),
}
COL_PARALLEL = {
    "llama": ("o_proj", "down_proj"),
    "opt": ("out_proj", "fc2"),
    "falcon": ("dense", "dense_4h_to_h"),
}


def block_specs(family_name: str, block: dict) -> dict:
    """PartitionSpec pytree matching one decoder block's params."""
    specs = {}
    rows = ROW_PARALLEL[family_name]
    cols = COL_PARALLEL[family_name]
    for name, sub in block.items():
        if name in rows or name in cols:
            specs[name] = _linear_spec(name in rows, sub)
        else:  # norms
            specs[name] = jax.tree.map(
                lambda _: P(), sub, is_leaf=lambda x: x is None)
        # prune bias spec when the param's bias key exists but is None
        if isinstance(sub, dict) and isinstance(specs[name], dict):
            if "bias" in sub and sub["bias"] is None:
                specs[name]["bias"] = None
            elif "bias" not in sub:
                specs[name].pop("bias", None)
    return specs


def model_specs(family_name: str, params: dict) -> dict:
    """PartitionSpec pytree for the full model params."""
    specs = {}
    for key, val in params.items():
        if key == "layers":
            specs["layers"] = [block_specs(family_name, b) for b in val]
        elif val is None:
            specs[key] = None
        elif key in ("embed_tokens", "lm_head", "embed_positions"):
            # replicate embeds (vocab-sharding is a later optimization)
            specs[key] = P()
        else:
            specs[key] = jax.tree.map(
                lambda _: P(), val, is_leaf=lambda x: x is None)
    return specs


def to_shardings(mesh: Mesh, specs):
    """PartitionSpec pytree -> NamedSharding pytree (None leaves pass)."""
    return jax.tree.map(
        lambda s: None if s is None else NamedSharding(mesh, s),
        specs, is_leaf=lambda x: x is None or isinstance(x, P))


def shard_params(params, mesh: Mesh, specs):
    """device_put every param with its NamedSharding."""
    def put(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(
        put, params, specs,
        is_leaf=lambda x: x is None or isinstance(x, P))
