"""In-situ attribution of the W4+int8KV composed decode step (VERDICT r4
weak #4: w4_int8kv_pct_roofline 63.7 vs 91.6 weights-only / 80.4 kv-only).

Isolation chains (exp_int8kv_parts) overstate: they add artificial
dependencies. Here the REAL engine step is re-traced with one component
neutralized at a time (monkeypatched before engine build) and the step
time diffed:

  full        unmodified int8-KV engine step (batch 32, bucket 256)
  noquant     _quantize_kv -> fixed-scale cast (drops the absmax reduce)
  nowrite     kv_cache_write -> identity on the cache buffers (WRONG
              tokens, but the step program is otherwise identical)
  bf16kv      the native-KV engine (headline config) for reference

The diffs say where the composed step's time goes; docs/serving.md
records the finding.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def step_ms(eng, slots, last, reps=4, n=8):
    for s in slots:
        eng.lengths[s] = 128
    eng.step_n(dict(last), n)  # compile
    for s in slots:
        eng.lengths[s] = 128
    t0 = time.time()
    for _ in range(reps):
        eng.step_n(dict(last), n)
        for s in slots:
            eng.lengths[s] = 128
    return (time.time() - t0) / reps / n * 1e3


def build(bench, eng_mod, cfg, jnp, kv_dtype):
    p = bench.get_params(cfg, jnp.bfloat16, bits=4)
    eng = eng_mod.LlamaEngine(p, cfg, max_batch=32, max_len=512,
                              dtype=jnp.bfloat16, kv_dtype=kv_dtype)
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(0, 32000, 128)) for _ in range(32)]
    slots = eng.add_requests(prompts)
    last = {s: eng._pending_next[s] for s in slots}
    return eng, slots, last


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/cache/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import bench
    from omniquant_tpu.serving import engine as eng_mod

    cfg = bench.make_cfg(512)
    orig_quant = eng_mod._quantize_kv
    orig_write = eng_mod.kv_cache_write

    def run(label, kv_dtype):
        eng, slots, last = build(bench, eng_mod, cfg, jnp, kv_dtype)
        ms = step_ms(eng, slots, last)
        print(f"{label:10s} {ms:6.2f} ms/step", file=sys.stderr)
        bench.free_engine(eng)
        return ms

    full = run("full-int8", "int8")

    def cheap_quant(x):
        codes = jnp.clip(jnp.round(x * 8.0), -127, 127).astype(jnp.int8)
        scale = jnp.full(x.shape[:-1] + (1,), 0.125, jnp.float32)
        return codes, scale

    eng_mod._quantize_kv = cheap_quant
    noq = run("noquant", "int8")
    eng_mod._quantize_kv = orig_quant

    def no_write(caches, news, lengths, **kw):
        return caches

    eng_mod.kv_cache_write = no_write
    now = run("nowrite", "int8")
    eng_mod.kv_cache_write = orig_write

    bf16 = run("bf16-kv", "native")

    orig_span = eng_mod.kv_cache_write_span

    def no_span(caches, news, lengths, **kw):
        return tuple(caches)

    eng_mod.kv_cache_write_span = no_span
    run("bf16-noflush", "native")
    eng_mod.kv_cache_write_span = orig_span

    orig_ring = eng_mod.LlamaEngine._use_ring
    eng_mod.LlamaEngine._use_ring = lambda self: False
    run("bf16-oldpath", "native")
    run("int8-oldpath", "int8")
    eng_mod.kv_cache_write = no_write
    run("bf16-old-nowrite", "native")
    run("int8-old-nowrite", "int8")
    eng_mod.kv_cache_write = orig_write
    eng_mod.LlamaEngine._use_ring = orig_ring
    print(f"quant(absmax) cost {full-noq:5.2f} ms, write cost "
          f"{full-now:5.2f} ms, int8-vs-bf16 {full-bf16:+5.2f} ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
