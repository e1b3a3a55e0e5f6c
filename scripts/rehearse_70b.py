"""70B-config rehearsal without hardware (VERDICT r4 next #7).

AOT-lowers and compiles the tensor-parallel serving engine's decode step
at the Llama-2-70B W3A16g128 geometry (the BASELINE.json north-star
serving config: W3A16g128 ppl target 3.78, v5e-16 deployment) on a
virtual 8-device CPU mesh, then records per-shard HBM arithmetic from the
placed buffers + the compiled program's memory analysis into
docs/artifacts/rehearsal_70b.json and asserts the per-chip footprint fits
a v5e (16 GB).

tp=8 (not 16): 70B has 8 KV heads, and the engine shards the KV cache on
heads — the v5e-16 deployment is tp=8 x dp=2 (two serving replicas), so
per-chip memory is set by the tp=8 shard. Weights are ZERO-FILLED packed
buffers at the exact wire shapes (values are irrelevant to compilation,
partitioning, and memory math).

Run: python scripts/rehearse_70b.py  (~27 GB host RAM, several minutes)
A reduced-depth version of the same machinery runs in
tests/test_rehearsal_70b.py on every suite run.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from omniquant_tpu.quant.packing import (
    PackedWeight, default_layout, pack_tile, words_per_rows)


V5E_HBM_GB = 16.0


def zero_packed(out_f: int, in_f: int, bits: int, gs: int,
                layout: str = "auto") -> PackedWeight:
    """A PackedWeight with zero-filled buffers at the exact wire shapes
    pack_weight would produce — rehearsal only (compilation and memory
    math never look at the values)."""
    if layout == "auto":
        layout = default_layout(bits, gs)
    tile = pack_tile(bits, gs, in_f, layout)
    k_pad = -(-in_f // tile) * tile
    words = words_per_rows(bits, k_pad, layout)
    n_groups = -(-in_f // gs) if gs else 1
    return PackedWeight(
        qweight=jnp.zeros((words, out_f), jnp.int32),
        scales=jnp.zeros((out_f, n_groups), jnp.float32),
        zeros=jnp.zeros((out_f, n_groups), jnp.float32),
        bias=None, bits=bits, group_size=gs, in_features=in_f,
        out_features=out_f, tile_k=tile, layout=layout)


def build_params(cfg, bits=3, gs=128, layers=None):
    H, I = cfg.hidden_size, cfg.intermediate_size
    kv = cfg.num_key_value_heads * cfg.head_dim
    # column-parallel weights (o/down) shard their PACKED ROWS over tp, so
    # they use the planar layout whose tiles split 8-way at these
    # geometries; row-parallel weights shard lanes (layout-agnostic) and
    # keep the decode fast-path default (pairs for W3)
    shared = {
        "q_proj": zero_packed(H, H, bits, gs),
        "k_proj": zero_packed(kv, H, bits, gs),
        "v_proj": zero_packed(kv, H, bits, gs),
        "o_proj": zero_packed(H, H, bits, gs, layout="planar"),
        "gate_proj": zero_packed(I, H, bits, gs),
        "up_proj": zero_packed(I, H, bits, gs),
        "down_proj": zero_packed(H, I, bits, gs, layout="planar"),
    }
    norm = {"weight": jnp.ones((H,), jnp.bfloat16)}
    n_layers = layers or cfg.num_hidden_layers
    blocks = [{**{k: v for k, v in shared.items()},
               "input_layernorm": dict(norm),
               "post_attention_layernorm": dict(norm)}
              for _ in range(n_layers)]
    embed = jnp.zeros((cfg.vocab_size, H), jnp.bfloat16)
    return {"embed_tokens": embed, "layers": blocks,
            "norm": {"weight": jnp.ones((H,), jnp.bfloat16)},
            "lm_head": embed}


def shard_bytes(tree, tp: int) -> int:
    """Per-shard bytes of a placed pytree: each leaf's global bytes
    divided by the number of shards its NamedSharding actually splits it
    into (replicated leaves count full)."""
    del tp  # derived per leaf from its actual sharding
    total = 0
    for x in jax.tree.leaves(tree):
        if not hasattr(x, "nbytes"):
            continue
        sh = getattr(x, "sharding", None)
        n_sh = 1
        if sh is not None:
            try:
                n_sh = max(1, int(np.prod(x.shape))
                           // int(np.prod(sh.shard_shape(x.shape))))
            except Exception:
                n_sh = 1
        total += x.nbytes // n_sh
    return total


def rehearse(layers=80, max_batch=8, max_len=2048, tp=8, n_steps=1,
             bits=3, gs=128):
    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.parallel import make_mesh
    from omniquant_tpu.serving.tp_engine import TPLlamaEngine

    cfg = jllama.LlamaConfig(
        vocab_size=32000, hidden_size=8192, intermediate_size=28672,
        num_hidden_layers=layers, num_attention_heads=64,
        num_key_value_heads=8, max_position_embeddings=max_len,
    )
    t0 = time.time()
    params = build_params(cfg, bits=bits, gs=gs, layers=layers)
    mesh = make_mesh(dp=1, tp=tp)
    eng = TPLlamaEngine(params, cfg, mesh, max_batch=max_batch,
                        max_len=max_len, dtype=jnp.bfloat16,
                        kv_dtype="int8")
    build_s = time.time() - t0

    t0 = time.time()
    lowered = eng.lower_step("decode_multi", kv_len=max_len,
                             n_steps=n_steps, do_sample=False)
    lower_s = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0

    w_shard = shard_bytes(eng.params, tp)
    c_shard = shard_bytes(eng.cache, tp)
    mem = {}
    try:
        ma = compiled.memory_analysis()
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                mem[k] = int(v)
    except Exception as e:  # backend without memory analysis
        mem["error"] = str(e)[:120]

    report = {
        "config": {
            "model": f"llama2-70b-geometry x {layers} layers",
            "scheme": f"W{bits}A16g{gs}", "tp": tp,
            "max_batch": max_batch, "max_len": max_len,
            "kv": "int8", "n_steps": n_steps,
            "wire_layout": default_layout(bits, gs),
        },
        "per_shard_weight_gb": round(w_shard / 1e9, 3),
        "per_shard_kv_cache_gb": round(c_shard / 1e9, 3),
        "per_shard_resident_gb": round((w_shard + c_shard) / 1e9, 3),
        "xla_memory_analysis": mem,
        "v5e_hbm_gb": V5E_HBM_GB,
        "fits_v5e": (w_shard + c_shard) / 1e9 < V5E_HBM_GB * 0.9,
        "timings_s": {"build": round(build_s, 1),
                      "lower": round(lower_s, 1),
                      "compile": round(compile_s, 1)},
    }
    return report


if __name__ == "__main__":
    report = rehearse()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts",
        "rehearsal_70b.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    assert report["fits_v5e"], report
    print("OK: 70B W3A16g128 tp=8 decode step compiles and fits v5e HBM")
