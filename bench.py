"""Benchmark: 7B-geometry packed decode/prefill throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N, ...extras}

Headline metric (value): aggregate decode throughput of the continuous-
batching serving engine — batch 32, prompt 128, decode over a 256-slot
attention window (kv bucket), bf16 KV cache, max_len 512 — on one TPU
chip with W4A16g128 weights streamed through the fused Pallas
dequant-matmul kernels, stepping 8 tokens per host dispatch (step_n).
Baseline: 134.2 tok/s — the reference's MLC-LLM LLaMA-7B W4A16g128 on
A100-80G (BASELINE.md "Inference throughput"; effectively single-stream,
so vs_baseline compares aggregate against single-stream).

Extras (best-effort; omitted if they fail):
  w3g128 / w2g128   same decode setting at 3/2-bit packed weights (each
                    with its own pct_roofline: <scheme>_pct_roofline)
  w4a4 / w6a6       weight-activation schemes: per-token int8 activation
                    codes against the packed codes on the int8 MXU
                    (kernels/quant_matmul.quant_matmul_int) — the headline
                    metric's "& W4A4" config (BASELINE.json)
  kv2048_int8       batch 8, 2048-token window, int8 KV + fused attention
  kv2048_int8_b16   same window at batch 16 — the single-chip aggregate
                    ceiling (batch 32's int8 cache alone is 17.2 GB)
  prefill_tok_s     batched prefill throughput (32 x 128-token prompts,
                    dense-score path below the flash gate)
  prefill_long_*    batch 8 x 1024-token prompts — the blockwise flash
                    kernel path (engine flash_min_len=256) — with MFU vs
                    the chip's 197 TFLOP/s bf16 matmul peak
  pct_roofline      measured step time vs. the HBM-bound lower bound at
                    the chip's MEASURED peak bandwidth (437 GB/s on this
                    tunneled v5e; elementwise r+w microbenchmark), counting
                    packed weights + scales, embedding head, and KV window
                    reads + writes

Tensor-parallel serving (serving/tp_engine.py) exists and is asserted
token-for-token equal to this engine on a CPU mesh (tests/test_tp_engine.py,
dryrun_multichip); it cannot be benched here — the harness exposes ONE real
chip, and a virtual-device mesh on one chip shares the same HBM/MXU.
"""
import json
import sys
import time

import numpy as np


BASELINE_TOK_S = 134.2
MEASURED_PEAK_GBPS = 437.0  # elementwise r+w microbenchmark, this chip
PEAK_BF16_TFLOPS = 197.0    # v5e MXU bf16 peak
BATCH = 32
DECODE_STEPS = 24
PREFILL_LEN = 128
MAX_LEN = 512


def build_7b_packed_params(cfg, dtype, bits: int = 4, layout: str = "auto"):
    """Random 7B-geometry packed weights. Layers share the same packed
    buffers (identical shapes) — timing-equivalent to distinct weights while
    keeping host-side generation fast."""
    import jax.numpy as jnp

    from omniquant_tpu.quant import QuantConfig, pack_weight

    rng = np.random.default_rng(0)
    wcfg = QuantConfig(n_bits=bits, group_size=128)
    H, I = cfg.hidden_size, cfg.intermediate_size
    kv = cfg.num_key_value_heads * cfg.head_dim

    def pw(out_f, in_f, seed):
        w = jnp.asarray(
            rng.standard_normal((out_f, in_f)).astype(np.float32) * 0.02)
        return pack_weight(w, wcfg, layout=layout)

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


def free_buffers(*trees):
    """Explicitly delete device buffers (python del alone leaves deletion
    to async GC — the next scheme's allocation races it and OOMs)."""
    import jax

    for t in trees:
        for x in jax.tree.leaves(t):
            if hasattr(x, "delete"):
                try:
                    x.delete()
                except Exception:
                    pass


def make_cfg(max_len):
    from omniquant_tpu.models import llama as jllama

    return jllama.LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=max_len,
    )


def weight_bytes(params):
    import jax

    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(params["layers"])) + (
        params["embed_tokens"].size * params["embed_tokens"].dtype.itemsize)


def decode_tok_s(params, cfg, batch, max_len, kv_dtype="native",
                 force_len=None, label="", spec=None, prefill_len=None):
    """Steady-state decode throughput via step_n(8)."""
    import jax.numpy as jnp

    from omniquant_tpu.models.common import NO_ACT_QUANT
    from omniquant_tpu.serving.engine import LlamaEngine

    eng = LlamaEngine(params, cfg, max_batch=batch, max_len=max_len,
                      dtype=jnp.bfloat16, kv_dtype=kv_dtype,
                      spec=spec if spec is not None else NO_ACT_QUANT)
    rng = np.random.default_rng(1)
    t0 = time.time()
    prompts = [list(rng.integers(0, 32000, prefill_len or PREFILL_LEN))
               for _ in range(batch)]
    slots = eng.add_requests(prompts)
    last = {s: eng._pending_next[s] for s in slots}
    prefill_t = time.time() - t0
    print(f"# [{label}] batched prefill {batch}x{PREFILL_LEN} in "
          f"{prefill_t:.0f}s (incl. compile)", file=sys.stderr)
    if force_len is not None:
        eng.lengths[slots] = force_len

    def set_len():
        if force_len is not None:
            eng.lengths[slots] = force_len

    chunks = eng.step_n(last, 8)  # warm/compile
    last = {s: toks[-1] for s, toks in chunks.items()}
    set_len()
    chunks = eng.step_n(last, 8)
    last = {s: toks[-1] for s, toks in chunks.items()}
    set_len()
    t0 = time.time()
    rounds = DECODE_STEPS // 8
    for _ in range(rounds):
        chunks = eng.step_n(last, 8)
        last = {s: toks[-1] for s, toks in chunks.items()}
        set_len()
    dt = time.time() - t0
    step_ms = dt / (rounds * 8) * 1e3
    tok_s = batch * rounds * 8 / dt
    print(f"# [{label}] {rounds} x step_n(8) x batch {batch}: "
          f"{step_ms:.2f} ms/step = {tok_s:.1f} tok/s", file=sys.stderr)

    # second prefill measurement with the program already compiled
    for s in slots:
        eng.release(s)
    t0 = time.time()
    slots = eng.add_requests(prompts)
    prefill_tok_s = batch * len(prompts[0]) / (time.time() - t0)
    return tok_s, step_ms, prefill_tok_s, eng


def main():
    import jax
    import jax.numpy as jnp

    extras = {}

    # --- headline: W4A16g128, bf16 KV, kv bucket 256 ---
    cfg = make_cfg(MAX_LEN)
    t0 = time.time()
    params = build_7b_packed_params(cfg, jnp.bfloat16, bits=4)
    print(f"# built W4 packed params in {time.time() - t0:.0f}s",
          file=sys.stderr)
    w_bytes = weight_bytes(params)
    tok_s, step_ms, prefill_tok_s, eng = decode_tok_s(
        params, cfg, BATCH, MAX_LEN, label="w4g128")
    extras["prefill_tok_s"] = round(prefill_tok_s, 1)
    extras["step_ms"] = round(step_ms, 2)

    # roofline: per-step HBM floor at measured peak bandwidth. kv bucket is
    # 256 during these steps (prompt 128 + <=56 generated); bf16 cache.
    kv_bucket = 256
    L, NKV, HD = (cfg.num_hidden_layers, cfg.num_key_value_heads,
                  cfg.head_dim)

    def ideal_step_ms(weight_bytes_, batch, bucket, kv_itemsize=2):
        kv = L * 2 * batch * NKV * bucket * HD * kv_itemsize
        return (weight_bytes_ + kv) / (MEASURED_PEAK_GBPS * 1e9) * 1e3, (
            weight_bytes_ + kv)

    ideal_ms, step_bytes = ideal_step_ms(w_bytes, BATCH, kv_bucket)
    extras["pct_roofline"] = round(100 * ideal_ms / step_ms, 1)
    extras["roofline_basis"] = (
        f"{step_bytes / 1e9:.2f} GB/step @ {MEASURED_PEAK_GBPS:.0f} GB/s "
        f"measured peak")

    # emit the headline line NOW so a driver-side timeout on the (long)
    # extras sweep still records the metric; the FULL line prints at the
    # end and, being last, is the one a tail-parser picks up
    print(json.dumps({
        "metric": "llama7b_w4a16g128_decode_tok_per_sec_per_chip",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 2),
        **extras,
        "partial": "extras sweep still running",
    }), flush=True)

    # int8 KV at the same setting: the quantized KV cache (a BASELINE.json
    # north-star feature the reference never had) halves the cache half of
    # the step's traffic — with the kv bucket at 256 the bf16 cache is
    # 4.3 of the 8.22 GB/step
    free_buffers(eng.cache)
    try:
        ts, sm, _, e2 = decode_tok_s(
            params, cfg, BATCH, MAX_LEN, kv_dtype="int8",
            label="w4g128-int8kv")
        extras["w4_int8kv_tok_s"] = round(ts, 1)
        im, _ = ideal_step_ms(w_bytes, BATCH, kv_bucket, kv_itemsize=1)
        extras["w4_int8kv_pct_roofline"] = round(100 * im / sm, 1)
        free_buffers(e2.cache, e2.params)
        del e2
    except Exception as exc:
        print(f"# w4-int8kv failed: {exc}", file=sys.stderr)

    free_buffers(eng.cache, eng.params, params)
    del eng, params

    # --- extra weight-only schemes: batch-32 aggregate (KV-heavy) AND a
    # batch-8 weight-bound point where the packed-byte advantage is the
    # dominant term (kv ~1.1 GB vs 1.8-3.7 GB of weights) ---
    for bits, key in ((4, "w4g128"), (3, "w3g128"), (2, "w2g128")):
        try:
            p = build_7b_packed_params(cfg, jnp.bfloat16, bits=bits)
            wb = weight_bytes(p)
            if bits != 4:  # batch-32 for w4 is the headline above
                ts, sm, _, e = decode_tok_s(
                    p, cfg, BATCH, MAX_LEN, label=f"w{bits}g128")
                extras[f"{key}_tok_s"] = round(ts, 1)
                im, _ = ideal_step_ms(wb, BATCH, kv_bucket)
                extras[f"{key}_pct_roofline"] = round(100 * im / sm, 1)
                # cache only: e.params SHARES the packed buffers with p
                free_buffers(e.cache)
                del e
            ts, sm, _, e = decode_tok_s(
                p, cfg, 8, MAX_LEN, label=f"w{bits}g128-b8")
            extras[f"{key}_b8_tok_s"] = round(ts, 1)
            im, _ = ideal_step_ms(wb, 8, kv_bucket)
            extras[f"{key}_b8_pct_roofline"] = round(100 * im / sm, 1)
            free_buffers(e.cache, e.params, p)
            del p, e
        except Exception as exc:  # degrade to headline-only
            print(f"# w{bits} failed: {exc}", file=sys.stderr)

    # --- weight-activation schemes: the int8-MXU integer path (planar
    # codes — the int kernel's unpack-to-int prefers the plane layout) ---
    from omniquant_tpu.models.common import ActQuantSpec

    for wb_, ab_, key in ((4, 4, "w4a4"), (6, 6, "w6a6")):
        try:
            p = build_7b_packed_params(cfg, jnp.bfloat16, bits=wb_,
                                       layout="planar")
            ts, sm, _, e = decode_tok_s(
                p, cfg, BATCH, MAX_LEN, label=f"w{wb_}a{ab_}",
                spec=ActQuantSpec.from_bits(ab_))
            extras[f"{key}_tok_s"] = round(ts, 1)
            free_buffers(e.cache, e.params, p)
            del p, e
        except Exception as exc:
            print(f"# {key} failed: {exc}", file=sys.stderr)

    # --- long-window decode: kv 2048, int8 KV + fused attention ---
    # batch 16 is the single-chip aggregate ceiling: at batch 32 the int8
    # cache ALONE is 32 slots x 2 x 32L x 4096 x 2048 = 17.2 GB > 16 GB HBM
    # (measured XLA OOM: 23.8 GB requested) — the config the TP engine's
    # head-sharded cache exists for
    cfg2 = make_cfg(2048)
    p_kv = None
    for batch, key in ((8, "kv2048_int8_tok_s"), (16, "kv2048_int8_b16_tok_s")):
        try:
            if p_kv is None:
                p_kv = build_7b_packed_params(cfg2, jnp.bfloat16, bits=4)
            p = p_kv
            ts, sm, _, e = decode_tok_s(
                p, cfg2, batch, 2048, kv_dtype="int8", force_len=2000,
                label=f"kv2048-int8-b{batch}")
            extras[key] = round(ts, 1)
            if batch == 8:
                wb = weight_bytes(p)
                im, _ = ideal_step_ms(wb, batch, 2048, kv_itemsize=1)
                extras["kv2048_int8_pct_roofline"] = round(100 * im / sm, 1)
                # long-prompt prefill through the SAME engine (max_len 2048):
                # 1024-token prompts ride the blockwise flash kernel
                # (flash_min_len=256); MFU vs the bf16 matmul peak
                for s in range(e.max_batch):
                    e.release(s)
                long_len = 1024
                rng2 = np.random.default_rng(5)
                lp = [list(rng2.integers(0, 32000, long_len))
                      for _ in range(batch)]
                slots = e.add_requests(lp)  # compile
                for s in slots:
                    e.release(s)
                t0 = time.time()
                e.add_requests(lp)
                dt = time.time() - t0
                lin_flops = 2 * 6.74e9 * batch * long_len
                attn_flops = (2 * 2 * 32 * (long_len ** 2) // 2
                              * 128 * batch * L)
                mfu = (lin_flops + attn_flops) / dt / (
                    PEAK_BF16_TFLOPS * 1e12)
                extras["prefill_long_tok_s"] = round(
                    batch * long_len / dt, 1)
                extras["prefill_mfu_pct"] = round(100 * mfu, 1)
                print(f"# [prefill-long] {batch}x{long_len} in "
                      f"{dt*1e3:.0f} ms "
                      f"({extras['prefill_long_tok_s']} tok/s, MFU "
                      f"{extras['prefill_mfu_pct']}%)", file=sys.stderr)
            free_buffers(e.cache)  # p_kv shared across both batches
            del e
        except Exception as exc:
            print(f"# kv2048 b{batch} failed: {exc}", file=sys.stderr)
    if p_kv is not None:
        free_buffers(p_kv)
        del p_kv

    print(json.dumps({
        "metric": "llama7b_w4a16g128_decode_tok_per_sec_per_chip",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 2),
        **extras,
    }))


if __name__ == "__main__":
    main()
