"""Prototype the W4A4 PREFILL integer path: dequant-once to int8 codes +
group-looped int8 MXU GEMM (XLA dot_general s8xs8->s32), vs the fused
bf16 kernel and the current fused int kernel. The fused kernels re-unpack
the weight tile for every m-tile (grid m x n x k), which at prefill m
wastes VPU work m_tiles times; unpacking ONCE shifts that to a single
pass and lets the MXU run at the int8 rate (2x bf16 on v5e).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from omniquant_tpu.kernels.quant_matmul import (  # noqa: E402
    quant_matmul, quant_matmul_int, quantize_act_int)
from omniquant_tpu.models.common import ActQuantSpec  # noqa: E402
from omniquant_tpu.quant import QuantConfig, pack_weight  # noqa: E402
from omniquant_tpu.quant.packing import unpack_codes  # noqa: E402

K = N = 4096
GS = 128


def timed(label, chain, x, n_chain, reps=8):
    float(jnp.sum(chain(x)))  # compile + sync first-execution tax
    t0 = time.time()
    outs = [chain(x) for _ in range(reps)]
    s = float(jnp.sum(outs[-1]))
    dt = (time.time() - t0) / (reps * n_chain)
    tf = 2 * x.shape[0] * K * N / dt / 1e12
    print(f"{label:22s} {dt*1e6:8.0f} us/gemm  {tf:6.1f} TF/s eff "
          f"(sink {s:.3g})", file=sys.stderr)
    return dt


def int_gemm_dequant_once(x, pw, acfg):
    """y = actq(x) @ dequant(pw): unpack codes ONCE to int8, then G
    int8-MXU dots with per-group f32 scaling."""
    m, k = x.shape
    bits, gs = pw.bits, pw.group_size
    xc, xs = quantize_act_int(x, acfg)  # (m,k) int8 centered, (m,1) f32
    codes = unpack_codes(pw.qweight, bits, pw.in_features, gs,
                         pw.tile_k, pw.layout)  # (k, n) int32, 0..2^b-1
    # integer-domain zero tied to x: stops XLA hoisting every layer's
    # unpack out of the (loop-invariant) layer body and keeping all of
    # them live (same OOM mechanism as the bf16 dequant-once route)
    zero = jnp.bitwise_and(
        jax.lax.bitcast_convert_type(xc[:1, :1], jnp.int8), 0)
    c8 = (codes.astype(jnp.int8) + zero)  # 0..15 fits int8
    sc = pw.scales.T.astype(jnp.float32)                    # (G, n)
    off = (-(pw.zeros.T) * pw.scales.T).astype(jnp.float32)  # -zp*sc (G, n)
    G = k // gs
    xsum = jnp.sum(xc.astype(jnp.int32).reshape(m, G, gs), axis=-1)
    acc = xsum.astype(jnp.float32) @ off
    # centered xc needs the (xc + zp... ) no: y_codes = dot(xc, c) with c
    # UNcentered; the weight zero-point correction is xsum @ (-zp*sc);
    # xc is already centered so no further act-side correction is needed
    for g in range(G):
        d = jax.lax.dot_general(
            xc[:, g * gs:(g + 1) * gs], c8[g * gs:(g + 1) * gs],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = acc + d.astype(jnp.float32) * sc[g][None, :]
    return (acc * xs).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32) * 0.02)
    wcfg = QuantConfig(n_bits=4, group_size=GS)
    pw_pairs = pack_weight(w, wcfg, layout="pairs")
    pw_planar = pack_weight(w, wcfg, layout="planar")
    acfg = ActQuantSpec.from_bits(4).act

    # correctness vs the fused int kernel
    xt = jnp.asarray(rng.standard_normal((256, K)), jnp.bfloat16)
    got = int_gemm_dequant_once(xt, pw_planar, acfg)
    want = quant_matmul_int(xt, pw_planar, acfg)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"# dequant-once vs fused-int max rel err {rel:.2e}",
          file=sys.stderr)

    for m, n_chain in ((4096, 16), (8192, 8)):
        print(f"--- m={m} ---", file=sys.stderr)
        x = jnp.asarray(rng.standard_normal((m, K)), jnp.bfloat16)

        def mk(fn):
            @jax.jit
            def chain(x):
                y = x
                for _ in range(n_chain):
                    y = fn(y) * 1e-2
                return y
            return chain

        timed("bf16-pairs fused", mk(lambda y: quant_matmul(y, pw_pairs)),
              x, n_chain)
        timed("int-planar fused",
              mk(lambda y: quant_matmul_int(y, pw_planar, acfg)),
              x, n_chain)
        timed("int8 dequant-once(pl)",
              mk(lambda y: int_gemm_dequant_once(y, pw_planar, acfg)),
              x, n_chain)
        timed("int8 dequant-once(pr)",
              mk(lambda y: int_gemm_dequant_once(y, pw_pairs, acfg)),
              x, n_chain)


if __name__ == "__main__":
    main()
