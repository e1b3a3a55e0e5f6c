"""Ablate the W4A4 integer GEMM's cost components on the real chip.

Variants at m=4096, K=N=4096, W4g128 (all consume (m,k) int8 acts):
  int-fused          current kernel: in-kernel unpack + 4x K=128 dots
  i8dense-g          pre-unpacked int8 (k,n) weights, 4x K=128 group dots
                     + per-group f32 scale FMA (exact algebra)
  i8dense-1dot       pre-unpacked int8, ONE K=512 dot + single scale
                     (WRONG algebra — MXU-rate probe only)
  bf16-pairs         the bf16 fused kernel (reference point)
Separates: unpack cost (int-fused minus i8dense-g), group-dot cost
(i8dense-g minus i8dense-1dot), and the int8 MXU headroom
(i8dense-1dot vs bf16)."""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from omniquant_tpu.kernels.quant_matmul import (  # noqa: E402
    quant_matmul, quant_matmul_int, quantize_act_int)
from omniquant_tpu.models.common import ActQuantSpec  # noqa: E402
from omniquant_tpu.quant import QuantConfig, pack_weight  # noqa: E402
from omniquant_tpu.quant.packing import unpack_codes  # noqa: E402

K = N = 4096
GS = 128
M = 4096
BM, BN, BK = 256, 2048, 512


def _consume_kernel(x_ref, w_ref, sc_ref, out_ref, acc_ref, *, n_dots):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xv = x_ref[:]            # (BM, BK) i8
    wv = w_ref[:]            # (BK, BN) i8
    sc = sc_ref[0]           # (8, BN) f32 (sublane-padded groups)
    if n_dots == 1:
        d = jnp.dot(xv, wv, preferred_element_type=jnp.int32)
        acc_ref[:] += d.astype(jnp.float32) * sc[0][None, :]
    else:
        gs = BK // n_dots
        for g in range(n_dots):
            d = jnp.dot(xv[:, g * gs:(g + 1) * gs],
                        wv[g * gs:(g + 1) * gs],
                        preferred_element_type=jnp.int32)
            acc_ref[:] += d.astype(jnp.float32) * sc[g][None, :]

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def consume(xc, w8, sc_slabs, n_dots):
    grid = (M // BM, N // BN, K // BK)
    return pl.pallas_call(
        partial(_consume_kernel, n_dots=n_dots),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, BK), lambda im, i, j: (im, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda im, i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, BN), lambda im, i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda im, i, j: (im, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xc, w8, sc_slabs)


def timed(label, fn, reps=8, n_chain=1):
    float(jnp.sum(fn()))
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    s = float(jnp.sum(outs[-1]))
    dt = (time.time() - t0) / (reps * n_chain)
    print(f"{label:14s} {dt*1e6:8.0f} us/gemm  "
          f"{2*M*K*N/dt/1e12:6.1f} TF/s eff (sink {s:.3g})",
          file=sys.stderr)


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32) * 0.02)
    wcfg = QuantConfig(n_bits=4, group_size=GS)
    pw = pack_weight(w, wcfg, layout="planar")
    pw_pairs = pack_weight(w, wcfg, layout="pairs")
    acfg = ActQuantSpec.from_bits(4).act
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    xc, xs = jax.jit(quantize_act_int, static_argnums=1)(x, acfg)
    codes = unpack_codes(pw.qweight, 4, K, GS, pw.tile_k, "planar")
    w8 = (codes - 8).astype(jnp.int8)   # centered (k, n)
    sc = pw.scales.T.astype(jnp.float32)  # (G, n)
    n_g = BK // GS
    slabs = sc.reshape(K // BK, n_g, N)
    slabs = jnp.pad(slabs, ((0, 0), (0, 8 - n_g), (0, 0)))
    xc = jax.device_put(xc)

    N_CHAIN = 16

    def chain(fn, perturb):
        # vary the input per iteration (a dependent perturbation) so XLA
        # cannot CSE the identical gemm calls into one
        @jax.jit
        def f():
            y = jnp.float32(0)
            for i in range(N_CHAIN):
                y = y + jnp.sum(fn(perturb(i, y))[:1, :1])
            return y
        return f

    pert_bf16 = lambda i, y: x + y.astype(jnp.bfloat16)
    pert_i8 = lambda i, y: xc + (y != 0).astype(jnp.int8)
    timed("bf16-pairs", chain(lambda xi: quant_matmul(xi, pw_pairs),
                              pert_bf16), n_chain=N_CHAIN)
    timed("int-fused", chain(lambda xi: quant_matmul_int(xi, pw, acfg),
                             pert_bf16), n_chain=N_CHAIN)
    timed("i8dense-g", chain(lambda xi: consume(xi, w8, slabs, n_g),
                             pert_i8), n_chain=N_CHAIN)
    timed("i8dense-1dot", chain(lambda xi: consume(xi, w8, slabs, 1),
                                pert_i8), n_chain=N_CHAIN)


if __name__ == "__main__":
    main()
