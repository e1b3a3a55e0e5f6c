"""Attribute the W4+int8KV composition loss (VERDICT r4 weak #4:
w4_int8kv_pct_roofline 63.7 vs 91.6 weights-only / 80.4 kv-only).

Times each component of the combined decode step in isolation at the
bench geometry (batch 32, 32 kv heads, hd 128, kv bucket 256, 32 layers),
chained x32 inside one jit:
  gemm-chain     the 4 fused packed GEMMs per layer (qkv/o/gate_up/down)
  attn-int8      decode_attention_int8 over the (B, H, 256, 128) window
  kv-quant       per-token symmetric int8 quantization of the new k/v
  kv-write       the 4-buffer RMW cache write kernel
Sum vs the measured engine step says whether the loss is additive
sub-peak serialization or cross-kernel interference.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from omniquant_tpu.kernels.decode_attention import decode_attention_int8
from omniquant_tpu.kernels.kv_update import (
    kv_cache_write, scale_plane_init, scale_plane_view)
from omniquant_tpu.quant import QuantConfig, pack_weight
from omniquant_tpu.kernels.quant_matmul import quant_matmul
from omniquant_tpu.serving.engine import _quantize_kv

B, H, HD, KV, L = 32, 32, 128, 256, 32
HID, INTER = 4096, 11008


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))


def timed(label, f, n, reps=6, bytes_per=None):
    _sync(f())
    t0 = time.time()
    outs = [f() for _ in range(reps)]
    _sync(outs[-1])
    dt = (time.time() - t0) / (reps * n)
    bw = f"  {bytes_per/dt/1e9:6.0f} GB/s" if bytes_per else ""
    tot = dt * L * 1e3
    print(f"{label:12s} {dt*1e6:7.0f} us/layer  -> {tot:5.2f} ms/step{bw}",
          file=sys.stderr)
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/cache/jax_cache")
    rng = np.random.default_rng(0)
    wcfg = QuantConfig(n_bits=4, group_size=128)

    def pw(o, i, s):
        w = jax.random.normal(jax.random.PRNGKey(s), (o, i),
                              jnp.float32) * 0.02
        return pack_weight(w, wcfg)

    qkv, o_p = pw(3 * HID, HID, 1), pw(HID, HID, 2)
    gu, down = pw(2 * INTER, HID, 3), pw(HID, INTER, 4)
    x = jnp.asarray(rng.standard_normal((B, HID)), jnp.bfloat16)

    @jax.jit
    def gemm_chain():
        y = x
        for _ in range(L):
            a = quant_matmul(y, qkv)[:, :HID]
            b2 = quant_matmul(a, o_p)
            c = quant_matmul(b2, gu)[:, :INTER]
            y = quant_matmul(c, down) * 1e-2
        return y

    wbytes = sum(p.qweight.size * 4 for p in (qkv, o_p, gu, down))
    timed("gemm-chain", gemm_chain, L, bytes_per=wbytes)

    kc = jnp.asarray(rng.integers(-127, 128, (B, H, KV, HD)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 128, (B, H, KV, HD)), jnp.int8)
    ks = jnp.abs(jnp.asarray(
        rng.standard_normal((B, H, KV)), jnp.float32)) + 0.01
    vs = jnp.abs(jnp.asarray(
        rng.standard_normal((B, H, KV)), jnp.float32)) + 0.01
    q = jnp.asarray(rng.standard_normal((B, H, HD)), jnp.bfloat16)
    lengths = jnp.full((B,), KV - 8, jnp.int32)

    @jax.jit
    def attn_chain():
        acc = q
        for _ in range(L):
            a = decode_attention_int8(
                acc, kc, ks, vc, vs, lengths, KV, HD ** -0.5,
                out_dtype=jnp.bfloat16)
            acc = q + a * 1e-3
        return acc

    timed("attn-int8", attn_chain, L,
          bytes_per=2 * B * H * KV * HD)

    k_new = jnp.asarray(rng.standard_normal((B, H, HD)), jnp.bfloat16)

    @jax.jit
    def quant_chain():
        acc = k_new
        for _ in range(L):
            c, s = _quantize_kv(acc)
            acc = k_new + c.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)
        return acc

    timed("kv-quant x2", quant_chain, L)

    kbuf = jnp.zeros((B, H, 512, HD), jnp.int8)
    vbuf = jnp.zeros((B, H, 512, HD), jnp.int8)
    kpl = scale_plane_init(B, H, 512)
    vpl = scale_plane_init(B, H, 512)
    kc1 = jnp.asarray(rng.integers(-127, 128, (B, H, HD)), jnp.int8)
    sc1 = jnp.abs(jnp.asarray(rng.standard_normal((B, H)), jnp.float32))

    @jax.jit
    def write_chain(kbuf, vbuf, kpl, vpl):
        for _ in range(L):
            kbuf, vbuf, kpl, vpl = kv_cache_write(
                (kbuf, vbuf, kpl, vpl), (kc1, kc1, sc1, sc1), lengths)
        return kbuf, vbuf, kpl, vpl

    f = lambda: write_chain(kbuf, vbuf, kpl, vpl)
    timed("kv-write", f, L)


if __name__ == "__main__":
    main()
