"""Decompose one serving decode step into its cost components on the real
chip: packed-weight matmul chain, attention (scatter + window read + einsum),
lm_head, and the full engine step. Prints per-component ms and implied HBM
bandwidth so the roofline gap (VERDICT #3) is attributable.

Run each phase as its own process so HBM is free between them:
  for p in mm attn head engine; do python -m scripts.profile_decode --phase $p; done
"""

# NOTE: block_until_ready is a NO-OP on the tunneled axon backend — any
# timing below that relies on it under-reports. Use the queue-N-dispatches
# + single host-readback pattern instead (scripts/exp_prefill_tiles.py,
# docs/bench_infrastructure.md). Engine-level timings (step_n/add_requests)
# are unaffected: they sync via host token transfers.

import argparse
import time

import numpy as np

H, I, NH, HD = 4096, 11008, 32, 128
V = 32000


def timeit(fn, *args, n=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def phase_mm(B, L, dt):
    import jax
    import jax.numpy as jnp
    from omniquant_tpu.quant import QuantConfig, pack_weight
    from omniquant_tpu.kernels.quant_matmul import quant_matmul

    rng = np.random.default_rng(0)
    wcfg = QuantConfig(n_bits=4, group_size=128)

    def pw(out_f, in_f):
        w = jnp.asarray(
            rng.standard_normal((out_f, in_f)).astype(np.float32) * 0.02)
        return pack_weight(w, wcfg)

    qkv, o, gate_up, down = pw(3 * H, H), pw(H, H), pw(2 * I, H), pw(H, I)
    x = jnp.asarray(rng.standard_normal((B, 1, H)).astype(np.float32), dt)

    @jax.jit
    def mm_chain(x):
        h = x
        for _ in range(L):
            a = quant_matmul(h.reshape(B, H), qkv)[:, :H]
            a = quant_matmul(a, o)
            g = quant_matmul(a, gate_up)
            h = quant_matmul(
                g[:, :I] * jax.nn.silu(g[:, I:]), down).reshape(B, 1, H)
        return h

    t = timeit(mm_chain, x)
    w_bytes = L * sum(
        p.qweight.size * 4 + p.scales.size * 4 + p.zeros.size * 4
        for p in (qkv, o, gate_up, down))
    print(f"packed-mm chain ({L}L x 4 gemms, B={B}): {t*1e3:8.2f} ms   "
          f"{w_bytes/1e9:.2f} GB weights -> {w_bytes/t/1e9:7.1f} GB/s")


def phase_attn(B, KV, L, dt):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    kc = [jnp.zeros((B, NH, KV, HD), dt) for _ in range(L)]
    vc = [jnp.zeros((B, NH, KV, HD), dt) for _ in range(L)]
    lengths = jnp.full((B,), KV - 8, jnp.int32)
    b_idx = jnp.arange(B)
    q = jnp.asarray(rng.standard_normal((B, NH, 1, HD)), dt)
    kn = jnp.asarray(rng.standard_normal((B, NH, HD)), dt)

    def attn_once(kci, vci):
        kci = kci.at[b_idx, :, lengths, :].set(kn)
        vci = vci.at[b_idx, :, lengths, :].set(kn)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, kci) / (HD ** 0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(dt)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vci)
        return kci, vci, out

    def attn_chain(kc, vc):
        outs, nk, nv = [], [], []
        for i in range(L):
            a, b, c = attn_once(kc[i], vc[i])
            nk.append(a); nv.append(b); outs.append(c)
        return nk, nv, jnp.stack(outs).sum()

    attn_j = jax.jit(attn_chain, donate_argnums=(0, 1))
    for _ in range(3):
        kc, vc, s = attn_j(kc, vc)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    NIT = 20
    for _ in range(NIT):
        kc, vc, s = attn_j(kc, vc)
    jax.block_until_ready(s)
    t = (time.perf_counter() - t0) / NIT
    kv_bytes = L * 2 * B * NH * KV * HD * 2
    print(f"attention chain ({L}L, B={B}, kv={KV}, bf16): {t*1e3:6.2f} ms   "
          f"{kv_bytes/1e9:.2f} GB cache -> {kv_bytes/t/1e9:7.1f} GB/s")


def phase_head(B, dt):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    head_w = jnp.asarray(rng.standard_normal((V, H)).astype(np.float32), dt)
    x = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32), dt)

    @jax.jit
    def head(x):
        return jnp.argmax(jnp.einsum("bh,vh->bv", x, head_w), -1)

    t = timeit(head, x)
    print(f"lm_head+argmax (dense {V}x{H} bf16, B={B}): {t*1e3:6.2f} ms   "
          f"{V*H*2/t/1e9:7.1f} GB/s")


def phase_engine(B, KV, L, dt, kv_dtype="native"):
    import jax.numpy as jnp
    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.serving.engine import LlamaEngine
    import bench as benchmod

    rng = np.random.default_rng(1)
    cfg = jllama.LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=I,
        num_hidden_layers=L, num_attention_heads=NH, num_key_value_heads=NH,
        max_position_embeddings=KV,
    )
    params = benchmod.build_7b_packed_params(cfg, dt)
    eng = LlamaEngine(params, cfg, max_batch=B, max_len=KV, dtype=dt,
                      kv_dtype=kv_dtype)
    prompts = [list(rng.integers(0, V, 128)) for _ in range(B)]
    slots = eng.add_requests(prompts)
    eng.lengths[:] = KV - 40  # force the kv bucket under test
    last = {s: eng._pending_next[s] for s in slots}
    last = eng.step(last)
    eng.lengths[:] = KV - 40
    last = eng.step(last)
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        eng.lengths[:] = KV - 41  # keep bucket fixed across timed steps
        last = eng.step(last)
    t = (time.perf_counter() - t0) / N
    kv_elt = 1 if kv_dtype == "int8" else 2
    tot = (3.5e9 * 4 / 4 + L * 2 * B * NH * KV * HD * kv_elt + V * H * 2)
    print(f"engine step (B={B}, kv bucket {KV}, kv_dtype={kv_dtype}): "
          f"{t*1e3:6.2f} ms = {B/t:.0f} tok/s; "
          f"ideal {tot/1e9:.2f} GB -> {tot/t/1e9:7.1f} GB/s apparent")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--kv", type=int, default=256)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--kv_dtype", default="native")
    ap.add_argument("--phase", choices=["mm", "attn", "head", "engine", "all"],
                    default="all")
    args = ap.parse_args()
    import jax.numpy as jnp

    dt = jnp.bfloat16
    if args.phase in ("mm", "all"):
        phase_mm(args.batch, args.layers, dt)
    if args.phase in ("attn", "all"):
        phase_attn(args.batch, args.kv, args.layers, dt)
    if args.phase in ("head", "all"):
        phase_head(args.batch, dt)
    if args.phase in ("engine", "all"):
        phase_engine(args.batch, args.kv, args.layers, dt, args.kv_dtype)


if __name__ == "__main__":
    main()
