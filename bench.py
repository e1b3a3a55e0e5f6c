"""Benchmark: 7B-geometry packed decode/prefill throughput on one chip.

Prints one cumulative JSON line after EVERY completed stage (the driver
tail-parses the LAST JSON line, so a mid-sweep timeout still records all
completed stages); the final line carries no "partial" marker:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N, ...extras}

Headline metric (value): aggregate decode throughput of the continuous-
batching serving engine — batch 32, prompt 128, decode over a 256-slot
attention window (kv bucket), bf16 KV cache, max_len 512 — on one TPU
chip with W4A16g128 weights streamed through the fused Pallas
dequant-matmul kernels, stepping 8 tokens per host dispatch (step_n).
Baseline: 134.2 tok/s — the reference's MLC-LLM LLaMA-7B W4A16g128 on
A100-80G (BASELINE.md "Inference throughput"; effectively single-stream,
so vs_baseline compares aggregate against single-stream).

Stage order is importance-first (headline -> w4a4/w6a6 -> spec decode ->
kv2048 long-window -> weight-only extras -> batch-8 points -> auto-grow
-> eval throughput): the stages that name the BASELINE.json metric run
before nice-to-haves, so a budget cut costs the least-important numbers.
A wall-clock guard (BENCH_BUDGET_S, default 1700s) skips remaining stages
— recording them in "skipped" — rather than letting the driver's timeout
kill the process mid-stage. Compiles go through the persistent JAX
compilation cache under cache/jax_cache/ (same dir across runs in this
working tree), so a warmed tree replays the whole sweep in minutes.

Extras reference:
  w4a4 / w6a6       weight-activation schemes: per-token int8 activation
                    codes against the packed codes on the int8 MXU
                    (kernels/quant_matmul.quant_matmul_int) — the headline
                    metric's "& W4A4" config (BASELINE.json). The
                    reference's own W4A4 was fake-quant fp16.
  spec_*            layer-skip speculative decoding (serving/spec_decode):
                    fused-round cost, measured acceptance (random weights
                    => ~0: the first-4-layer draft of a RANDOM 32-layer
                    model is uncorrelated with it, so the measured
                    end-to-end spec_decode_tok_s is the acceptance FLOOR),
                    and the transferable number — round cost in sequential-
                    token units with projected speedups at the acceptance
                    rates real checkpoints reach (LayerSkip-style ~0.7-0.9).
  w3g128 / w2g128   same decode setting at 3/2-bit packed weights (each
                    with its own pct_roofline: <scheme>_pct_roofline)
  kv2048_int8       batch 8, 2048-token window, int8 KV + fused attention
  kv2048_int8_b16   same window at batch 16 — the single-chip aggregate
                    ceiling (batch 32's int8 cache alone is 17.2 GB)
  prefill_tok_s     batched prefill throughput (32 x 128-token prompts,
                    dense-score path below the flash gate)
  prefill_long_*    batch 8 x 1024-token prompts — the blockwise flash
                    kernel path (engine flash_min_len=256) — with MFU vs
                    the chip's 197 TFLOP/s bf16 matmul peak
  autogrow_ms       one measured auto_grow doubling (512->1024) mid-decode:
                    recompile + cache copy stall (serving/engine.py:_grow)
  eval_docs_per_s   harness loglikelihood scoring throughput (JaxLM
                    _score_token_batches, piqa-shaped docs) on the packed
                    7B model
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
import os
import sys
import time

import numpy as np


BASELINE_TOK_S = 134.2
MEASURED_PEAK_GBPS = 437.0  # elementwise r+w microbenchmark, this chip
PEAK_BF16_TFLOPS = 197.0    # v5e MXU bf16 peak
BATCH = 32
DECODE_STEPS = 48  # 6 x step_n(8); 24 showed +-7% run-to-run on the
# tunneled chip (dispatch-latency noise over a ~0.5s window)
PREFILL_LEN = 128
MAX_LEN = 512

_T0 = time.time()
# default sized against the driver's observed timeout (>= ~1500s in r03):
# the headline stage alone can cost 600-1100s (the tunnel runtime's
# one-time first-execution tax, docs/bench_infrastructure.md), after which
# stages run 60-150s each; the guard pre-skips what cannot fit so the
# process exits 0, and the per-stage cumulative JSON emission means even
# an external kill loses nothing already measured
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "1700"))


def remaining() -> float:
    return _BUDGET - (time.time() - _T0)


def build_7b_packed_params(cfg, dtype, bits: int = 4, layout: str = "auto"):
    """Random 7B-geometry packed weights. Layers share the same packed
    buffers (identical shapes) — timing-equivalent to distinct weights.
    Weights are generated ON DEVICE (jax.random): host-side numpy + the
    tunneled host->device transfer cost 50-80s per build (~1 GB of f32),
    which multiplied across the per-scheme stages ate minutes of the
    sweep budget."""
    import jax
    import jax.numpy as jnp

    from omniquant_tpu.quant import QuantConfig, pack_weight

    wcfg = QuantConfig(n_bits=bits, group_size=128)
    H, I = cfg.hidden_size, cfg.intermediate_size
    kv = cfg.num_key_value_heads * cfg.head_dim

    def pw(out_f, in_f, seed):
        w = jax.random.normal(
            jax.random.PRNGKey(seed), (out_f, in_f), jnp.float32) * 0.02
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
    embed = (jax.random.normal(
        jax.random.PRNGKey(99), (cfg.vocab_size, H), jnp.float32)
        * 0.02).astype(dtype)
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


_PARAM_CACHE = {}


def get_params(cfg, dtype, bits=4, layout="auto"):
    """Stage-shared packed params: geometry depends only on (bits, layout)
    — max_position_embeddings is an engine property — so the sweep builds
    each scheme's params ONCE (a build costs ~47 s of pack dispatches
    through the tunnel; the old per-stage builds ate ~4 min)."""
    key = (bits, layout)
    if key not in _PARAM_CACHE:
        _PARAM_CACHE[key] = build_7b_packed_params(
            cfg, dtype, bits=bits, layout=layout)
    return _PARAM_CACHE[key]


def free_engine(eng):
    """Free an engine's cache + its PREPPED param buffers (fuse_packed
    copies) without touching the raw buffers shared via _PARAM_CACHE."""
    import jax

    keep = {id(x) for p in _PARAM_CACHE.values()
            for x in jax.tree.leaves(p)}
    free_buffers(eng.cache)
    for x in jax.tree.leaves(eng.params):
        if hasattr(x, "delete") and id(x) not in keep:
            try:
                x.delete()
            except Exception:
                pass


def drop_params(bits, layout="auto"):
    """Evict one scheme's raw params (schemes whose stages are done):
    keeping every scheme cached would exceed HBM (W4+W3+W4planar+W6+W2
    ~ 17 GB against 16)."""
    v = _PARAM_CACHE.pop((bits, layout), None)
    if v is not None:
        free_buffers(v)


def free_param_cache():
    for v in _PARAM_CACHE.values():
        free_buffers(v)
    _PARAM_CACHE.clear()


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


class Bench:
    """Cumulative-emit stage runner with a wall-clock budget."""

    def __init__(self):
        self.extras = {}
        self.headline = None
        self.skipped = []

    def emit(self, final=False):
        if self.headline is None:
            return
        line = dict(self.headline)
        line.update(self.extras)
        if self.skipped:
            line["skipped"] = list(self.skipped)
        if not final:
            line["partial"] = "sweep still running"
        print(json.dumps(line), flush=True)

    def stage(self, name, fn, est_s=120.0):
        """Run stage fn unless the budget can't fit its estimate; always
        emit the cumulative line afterwards."""
        if remaining() < est_s:
            print(f"# [skip] {name}: {remaining():.0f}s left < est "
                  f"{est_s:.0f}s", file=sys.stderr)
            self.skipped.append(name)
            return
        import jax

        live = [x for x in jax.live_arrays()
                if getattr(x, "nbytes", 0) > (1 << 20)]
        print(f"# [mem] before {name}: {len(live)} live arrays > 1MB, "
              f"{sum(x.nbytes for x in live)/1e9:.2f} GB", file=sys.stderr)
        t0 = time.time()
        try:
            fn()
        except Exception as exc:
            print(f"# {name} failed: {exc}", file=sys.stderr)
            self.extras[f"{name}_error"] = str(exc)[:200]
        # a failed stage's half-built params/caches would otherwise stay
        # referenced (traceback frames / async deletion) and cascade OOM
        # into every later stage — collect + re-check
        import gc

        gc.collect()
        live = [x for x in jax.live_arrays()
                if getattr(x, "nbytes", 0) > (1 << 20)]
        if live:
            print(f"# [mem] after {name}: {len(live)} live arrays > 1MB, "
                  f"{sum(x.nbytes for x in live)/1e9:.2f} GB",
                  file=sys.stderr)
        print(f"# stage {name} took {time.time() - t0:.0f}s "
              f"({remaining():.0f}s budget left)", file=sys.stderr)
        self.emit()


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "cache", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from omniquant_tpu.models.common import ActQuantSpec

    b = Bench()
    cfg = make_cfg(MAX_LEN)
    L, NKV, HD = (cfg.num_hidden_layers, cfg.num_key_value_heads,
                  cfg.head_dim)
    kv_bucket = 256  # prompt 128 + <=56 generated during the timed steps

    def ideal_step_ms(weight_bytes_, batch, bucket, kv_itemsize=2):
        kv = L * 2 * batch * NKV * bucket * HD * kv_itemsize
        return (weight_bytes_ + kv) / (MEASURED_PEAK_GBPS * 1e9) * 1e3, (
            weight_bytes_ + kv)

    # --- stage 1: headline W4A16g128, bf16 KV, batch 32 ---
    t0 = time.time()
    params = get_params(cfg, jnp.bfloat16, bits=4)
    print(f"# built W4 packed params in {time.time() - t0:.0f}s",
          file=sys.stderr)
    w_bytes = weight_bytes(params)
    tok_s, step_ms, prefill_tok_s, eng = decode_tok_s(
        params, cfg, BATCH, MAX_LEN, label="w4g128")
    ideal_ms, step_bytes = ideal_step_ms(w_bytes, BATCH, kv_bucket)
    b.headline = {
        "metric": "llama7b_w4a16g128_decode_tok_per_sec_per_chip",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 2),
    }
    b.extras["prefill_tok_s"] = round(prefill_tok_s, 1)
    b.extras["step_ms"] = round(step_ms, 2)
    b.extras["pct_roofline"] = round(100 * ideal_ms / step_ms, 1)
    b.extras["roofline_basis"] = (
        f"{step_bytes / 1e9:.2f} GB/step @ {MEASURED_PEAK_GBPS:.0f} GB/s "
        f"measured peak")
    free_engine(eng)
    del eng
    b.emit()

    # --- stage 2: W3 batch-32 — the contiguous pairs-3 layout (this
    # round's "W3 must beat W4" deliverable) runs right after the headline
    # so a budget cut can't lose it ---
    def wo_stage(bits, key):
        def run():
            p = get_params(cfg, jnp.bfloat16, bits=bits)
            wb = weight_bytes(p)
            ts, sm, _, e = decode_tok_s(
                p, cfg, BATCH, MAX_LEN, label=f"w{bits}g128")
            b.extras[f"{key}_tok_s"] = round(ts, 1)
            im, _ = ideal_step_ms(wb, BATCH, kv_bucket)
            b.extras[f"{key}_pct_roofline"] = round(100 * im / sm, 1)
            free_engine(e)
        return run

    # batch-8 weight-bound points (packed-byte advantage dominates:
    # kv ~1.1 GB vs 1.8-3.7 GB of weights); run adjacent to each scheme's
    # batch-32 stage so params are built once and evicted after
    def b8_stage(bits, key):
        def run():
            p = get_params(cfg, jnp.bfloat16, bits=bits)
            wb = weight_bytes(p)
            ts, sm, _, e = decode_tok_s(
                p, cfg, 8, MAX_LEN, label=f"w{bits}g128-b8")
            b.extras[f"{key}_b8_tok_s"] = round(ts, 1)
            im, _ = ideal_step_ms(wb, 8, kv_bucket)
            b.extras[f"{key}_b8_pct_roofline"] = round(100 * im / sm, 1)
            free_engine(e)
        return run

    b.stage("w3g128", wo_stage(3, "w3g128"), est_s=180)
    b.stage("w3g128_b8", b8_stage(3, "w3g128"), est_s=150)
    drop_params(3)

    # --- weight-activation schemes. These are HALF the named headline
    # metric ("... & W4A4") — they run before every nice-to-have.
    # Per-m routing (kernels/quant_matmul.quant_matmul_int): decode
    # (small m) rides the pairs bf16-injection kernel on fake-quant
    # activations (eval-oracle semantics, same speed class as W4A16);
    # prefill (m >= 2048) unpacks once to centered int8 codes and runs
    # the dense int8-MXU kernel — measured 1.09x the bf16 kernel at
    # 4096^3 while being integer-exact. W6 has no pairs layout, so its
    # decode uses the fused planar int kernel. ---
    def wa_stage(wb_, ab_, key, layout):
        def run():
            p = get_params(cfg, jnp.bfloat16, bits=wb_, layout=layout)
            wb_bytes = weight_bytes(p)
            ts, sm, pf, e = decode_tok_s(
                p, cfg, BATCH, MAX_LEN, label=f"w{wb_}a{ab_}",
                spec=ActQuantSpec.from_bits(ab_))
            b.extras[f"{key}_tok_s"] = round(ts, 1)
            b.extras[f"{key}_step_ms"] = round(sm, 2)
            im, _ = ideal_step_ms(wb_bytes, BATCH, kv_bucket)
            b.extras[f"{key}_pct_roofline"] = round(100 * im / sm, 1)
            b.extras[f"{key}_prefill_tok_s"] = round(pf, 1)
            free_engine(e)
        return run

    b.stage("w4a4", wa_stage(4, 4, "w4a4", "auto"), est_s=240)

    # W4A4 long prefill MFU (batch 8 x 1024-token prompts — the config
    # prefill_mfu_pct measures for bf16): the integer path's 2x-MXU
    # regime. Runs right after the w4a4 decode stage so the pairs params
    # are still cached.
    def w4a4_prefill_stage():
        from omniquant_tpu.serving.engine import LlamaEngine

        scfg = make_cfg(2048)
        p = get_params(scfg, jnp.bfloat16, bits=4, layout="auto")
        e = LlamaEngine(p, scfg, max_batch=8, max_len=2048,
                        dtype=jnp.bfloat16,
                        spec=ActQuantSpec.from_bits(4))
        long_len = 1024
        rng2 = np.random.default_rng(5)
        lp = [list(rng2.integers(0, 32000, long_len)) for _ in range(8)]
        slots = e.add_requests(lp)  # compile
        for s in slots:
            e.release(s)
        t0 = time.time()
        e.add_requests(lp)
        dt = time.time() - t0
        lin_flops = 2 * 6.74e9 * 8 * long_len
        attn_flops = 2 * 2 * 32 * (long_len ** 2) // 2 * 128 * 8 * L
        mfu = (lin_flops + attn_flops) / dt / (PEAK_BF16_TFLOPS * 1e12)
        b.extras["w4a4_prefill_long_tok_s"] = round(8 * long_len / dt, 1)
        b.extras["w4a4_prefill_mfu_pct"] = round(100 * mfu, 1)
        print(f"# [w4a4-prefill-long] 8x{long_len} in {dt*1e3:.0f} ms "
              f"(MFU-equivalent {b.extras['w4a4_prefill_mfu_pct']}% of "
              f"bf16 peak)", file=sys.stderr)
        free_engine(e)

    # (the (4, "auto") params stay cached — the headline and every later
    # W4 stage share them)
    b.stage("w4a4_prefill", w4a4_prefill_stage, est_s=200)
    b.stage("w6a6", wa_stage(6, 6, "w6a6", "planar"), est_s=240)
    drop_params(6, "planar")

    # --- stage 4: speculative decoding (layer-skip self-draft) ---
    def spec_stage():
        from omniquant_tpu.serving.engine import LlamaEngine
        from omniquant_tpu.serving.spec_decode import SpecDecoder

        batch, d, g, r = 8, 4, 4, 4
        scfg = make_cfg(1024)
        p = get_params(scfg, jnp.bfloat16, bits=4)
        eng = LlamaEngine(p, scfg, max_batch=batch, max_len=1024,
                          dtype=jnp.bfloat16)
        rng = np.random.default_rng(2)
        prompts = [list(rng.integers(0, 32000, 128)) for _ in range(batch)]
        slots = eng.add_requests(prompts)
        last = {s: eng._pending_next[s] for s in slots}

        def seq():
            eng.step_n(dict(last), 8)
            eng.lengths[slots] = 128

        seq()  # compile
        eng.lengths[slots] = 128
        t0 = time.time()
        for _ in range(3):
            seq()
        seq_tok_ms = (time.time() - t0) / 3 / 8 * 1e3

        sd = SpecDecoder(eng, draft_layers=d, gamma=g)
        for s in slots:
            sd.draft.release(s)
        dslots = sd.draft.add_requests(prompts)
        assert dslots == slots

        def fused():
            out = sd.spec_steps(dict(last), rounds=r)
            eng.lengths[slots] = 128
            sd.draft.lengths[slots] = 128
            return out

        fused()  # compile
        t0 = time.time()
        n_disp, emitted = 3, 0
        for _ in range(n_disp):
            out = fused()
            emitted += sum(len(t) for t in out.values())
        dt = time.time() - t0
        round_ms = dt / n_disp / r * 1e3
        b.extras["spec_round_ms"] = round(round_ms, 2)
        b.extras["spec_round_cost_seq_tokens"] = round(
            round_ms / seq_tok_ms, 2)
        b.extras["spec_accept_rate"] = round(sd.acceptance_rate, 3)
        b.extras["spec_decode_tok_s"] = round(emitted / dt, 1)
        for alpha, key in ((0.7, "spec_tok_s_at_alpha07"),
                           (0.9, "spec_tok_s_at_alpha09")):
            tps = batch * (1 + alpha * g) / round_ms * 1e3
            b.extras[key] = round(tps, 1)
        print(f"# [spec d={d} g={g}] round {round_ms:.2f} ms = "
              f"{round_ms/seq_tok_ms:.2f} seq-tokens, accept "
              f"{sd.acceptance_rate:.3f} (random-weight floor)",
              file=sys.stderr)
        free_engine(eng)
        free_engine(sd.draft)

    b.stage("spec_decode", spec_stage, est_s=240)

    # --- stage 5+6: long-window decode: kv 2048, int8 KV + fused attention.
    # batch 16 is the single-chip aggregate ceiling: at batch 32 the int8
    # cache ALONE is 32 slots x 2 x 32L x 4096 x 2048 = 17.2 GB > 16 GB HBM
    # (measured XLA OOM: 23.8 GB requested) — the config the TP engine's
    # head-sharded cache exists for ---
    cfg2 = make_cfg(2048)

    def kv2048_stage(batch, key):
        def run():
            p = get_params(cfg2, jnp.bfloat16, bits=4)
            ts, sm, _, e = decode_tok_s(
                p, cfg2, batch, 2048, kv_dtype="int8", force_len=2000,
                label=f"kv2048-int8-b{batch}")
            b.extras[key] = round(ts, 1)
            if batch == 8:
                wb = weight_bytes(p)
                im, _ = ideal_step_ms(wb, batch, 2048, kv_itemsize=1)
                b.extras["kv2048_int8_pct_roofline"] = round(
                    100 * im / sm, 1)
                # long-prompt prefill through the SAME engine (max_len
                # 2048): 1024-token prompts ride the blockwise flash kernel
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
                b.extras["prefill_long_tok_s"] = round(
                    batch * long_len / dt, 1)
                b.extras["prefill_mfu_pct"] = round(100 * mfu, 1)
                print(f"# [prefill-long] {batch}x{long_len} in "
                      f"{dt*1e3:.0f} ms "
                      f"({b.extras['prefill_long_tok_s']} tok/s, MFU "
                      f"{b.extras['prefill_mfu_pct']}%)", file=sys.stderr)
            free_engine(e)
        return run

    b.stage("kv2048_int8", kv2048_stage(8, "kv2048_int8_tok_s"), est_s=240)
    b.stage("kv2048_int8_b16", kv2048_stage(16, "kv2048_int8_b16_tok_s"),
            est_s=180)

    b.stage("w2g128", wo_stage(2, "w2g128"), est_s=180)
    b.stage("w2g128_b8", b8_stage(2, "w2g128"), est_s=150)
    drop_params(2)

    # --- stage 9: int8 KV at the headline setting: the quantized KV cache
    # (a BASELINE.json north-star feature the reference never had) halves
    # the cache half of the step's traffic ---
    def int8kv_stage():
        p = get_params(cfg, jnp.bfloat16, bits=4)
        ts, sm, _, e = decode_tok_s(
            p, cfg, BATCH, MAX_LEN, kv_dtype="int8", label="w4g128-int8kv")
        b.extras["w4_int8kv_tok_s"] = round(ts, 1)
        im, _ = ideal_step_ms(weight_bytes(p), BATCH, kv_bucket,
                              kv_itemsize=1)
        b.extras["w4_int8kv_pct_roofline"] = round(100 * im / sm, 1)
        free_engine(e)

    b.stage("w4_int8kv", int8kv_stage, est_s=180)

    b.stage("w4g128_b8", b8_stage(4, "w4g128"), est_s=150)

    # --- stage 11: one timed auto_grow doubling mid-decode, with the
    # prefetched AOT growth programs (engine.prefetch_grow): compilation
    # of the 1024-bucket step programs overlaps serving in a background
    # thread, so the measured mid-stream stall is just cache copy +
    # dispatch — not the ~15 s synchronous recompile of BENCH_r04 ---
    def autogrow_stage():
        from omniquant_tpu.serving.engine import LlamaEngine

        gcfg = make_cfg(1024)
        p = get_params(gcfg, jnp.bfloat16, bits=4)
        e = LlamaEngine(p, gcfg, max_batch=8, max_len=512,
                        dtype=jnp.bfloat16, auto_grow=True)
        e.prefetch_grow(steps={(8, False)})  # background 1024-shape compile
        rng = np.random.default_rng(7)
        prompts = [list(rng.integers(0, 32000, 128)) for _ in range(8)]
        slots = e.add_requests(prompts)
        last = {s: e._pending_next[s] for s in slots}
        out = e.step_n(last, 8)  # warm at 512 (overlaps the bg compile)
        last = {s: t[-1] for s, t in out.items()}
        t0 = time.time()
        e._grow_prep[1].join()  # residual bg-compile wait (0 once warm)
        prep_wait = time.time() - t0
        b.extras["autogrow_prep_residual_ms"] = round(prep_wait * 1e3, 1)
        e.lengths[slots] = 508  # next step_n forces 512 -> 1024 growth
        t0 = time.time()
        e.step_n(last, 8)
        b.extras["autogrow_ms"] = round((time.time() - t0) * 1e3, 1)
        print(f"# [autogrow] 512->1024 grow + step_n(8): "
              f"{b.extras['autogrow_ms']} ms (prefetched AOT programs; "
              f"residual prep wait {prep_wait*1e3:.0f} ms)",
              file=sys.stderr)
        free_engine(e)

    b.stage("autogrow", autogrow_stage, est_s=150)

    # --- stage 12: harness eval throughput (loglikelihood scoring) ---
    def eval_stage():
        from omniquant_tpu.eval.harness.base import JaxLM
        from omniquant_tpu.models import LLAMA

        p = get_params(cfg, jnp.bfloat16, bits=4)
        lm = JaxLM(LLAMA, p, cfg, tokenizer=None, seqlen=MAX_LEN,
                   batch_size=32)
        rng = np.random.default_rng(9)
        # piqa-shaped docs: ~2 requests/doc, ctx ~40 tokens, cont ~10
        n_docs = 64
        pairs = [
            (list(rng.integers(0, 32000, int(rng.integers(24, 56)))),
             list(rng.integers(0, 32000, int(rng.integers(4, 16)))))
            for _ in range(2 * n_docs)
        ]
        lm._score_token_batches(pairs[:64])  # compile both buckets
        t0 = time.time()
        lm._score_token_batches(pairs)
        dt = time.time() - t0
        b.extras["eval_docs_per_s"] = round(n_docs / dt, 1)
        print(f"# [eval] {n_docs} piqa-shaped docs ({len(pairs)} "
              f"loglikelihood reqs) in {dt:.2f}s = "
              f"{b.extras['eval_docs_per_s']} docs/s", file=sys.stderr)

    b.stage("eval_throughput", eval_stage, est_s=150)

    free_param_cache()
    b.emit(final=True)


if __name__ == "__main__":
    main()
