"""Record the all-reduce/matmul overlap schedule artifact (VERDICT r3 #3).

Compiles the tensor-parallel llama block forward at overlap_chunks 1 vs 4
on a virtual tp=4 mesh and dumps the optimized HLO. The chunked build must
show C independent (fused quant-matmul -> all-reduce) chains per
column-parallel site instead of one — the dependence structure XLA's
latency-hiding scheduler needs to run collective chunk k during matmul
chunk k+1 on a real TPU mesh (async all-reduce start/done pairs). Real
multi-chip timing is OUT OF SCOPE in this harness (one physical chip); the
artifact records the schedule-enabling structure plus exact-equality
evidence (tests/test_tp_packed.py::test_tp_overlap_chunked_psum_matches_*).

Writes docs/artifacts/tp_overlap_hlo_c{1,4}.txt and prints a summary.

Run: python scripts/exp_tp_overlap.py
"""
import os
import re
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np


def main():
    from omniquant_tpu.models import LLAMA
    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.parallel import make_mesh
    from omniquant_tpu.parallel.tp_forward import make_tp_forward
    from omniquant_tpu.quant import QuantConfig
    from omniquant_tpu.serving.export import pack_model

    cfg = jllama.LlamaConfig(
        vocab_size=256, hidden_size=1024, intermediate_size=2048,
        num_hidden_layers=1, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=64,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    wcfg = QuantConfig(n_bits=4, group_size=128)
    fq = dict(params)
    fq["layers"] = [
        LLAMA.effective_block_weights(b, wcfg, None, None, cfg)
        for b in params["layers"]
    ]
    packed = pack_model(LLAMA, fq, wcfg)
    mesh = make_mesh(dp=1, tp=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, cfg.hidden_size)), jnp.float32)

    os.makedirs("docs/artifacts", exist_ok=True)
    counts = {}
    for chunks in (1, 4):
        make_fwd, shard_block = make_tp_forward(
            "llama", mesh, cfg, overlap_chunks=chunks)
        layers = [shard_block(b) for b in packed["layers"]]
        fwd = make_fwd(layers)
        lowered = jax.jit(lambda ls, xx: fwd(ls, xx)).lower(layers, x)
        stable = lowered.as_text()
        hlo = lowered.compile().as_text()
        path = f"docs/artifacts/tp_overlap_hlo_c{chunks}.txt"
        with open(path, "w") as f:
            f.write(hlo)
        n_emitted = len(re.findall(r"all_reduce", stable))
        # the backend's all-reduce COMBINER may fold the independent chunk
        # all-reduces into variadic ops (operand count preserves the
        # chunk granularity); count both forms
        n_opt_ops = len(re.findall(r"all-reduce(?:-start)?\(", hlo))
        n_opt_operands = sum(
            m.count("%") for m in re.findall(
                r"all-reduce(?:-start)?\(([^)]*)\)", hlo))
        counts[chunks] = (n_emitted, n_opt_ops, n_opt_operands)
        print(f"chunks={chunks}: emitted {n_emitted} independent "
              f"all_reduces -> optimized {n_opt_ops} ops / "
              f"{n_opt_operands} operands -> {path}")

    # 2 column-parallel sites/block (o_proj + down_proj): chunking by 4
    # must emit 4x the independent all-reduce chains
    assert counts[4][0] == 4 * counts[1][0], counts
    print(
        "OK: chunked build emits independent per-chunk (quant-matmul -> "
        f"all-reduce) chains ({counts[1][0]} -> {counts[4][0]}). On this "
        "CPU artifact the backend combiner folded them into variadic ops; "
        "on a real TPU mesh, cap the combiner at the chunk size "
        "(--xla_all_reduce_combine_threshold_bytes=<chunk_bytes>) so the "
        "latency-hiding scheduler keeps per-chunk async start/done pairs "
        "overlapped with the next chunk's quant-matmul. Exact-equality "
        "evidence: tests/test_tp_packed.py::"
        "test_tp_overlap_chunked_psum_matches_unchunked.")


if __name__ == "__main__":
    main()
