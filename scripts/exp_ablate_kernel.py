"""Ablation: where do the ~87us of a W4/W2 decode GEMM go?
  full    current kernel (unpack + dequant-dots)
  noup    same grid/streams but dots a constant bf16 tile (no unpack work)
  nodot   unpack + cast only, accumulate plane sums (no MXU dots)
  dense   plain bf16 matmul kernel at the same logical shape (w streamed
          as bf16 = 4x the packed bytes for W4)
"""

# NOTE: block_until_ready is a NO-OP on the tunneled axon backend — any
# timing below that relies on it under-reports. Use the queue-N-dispatches
# + single host-readback pattern instead (scripts/exp_prefill_tiles.py,
# docs/bench_infrastructure.md). Engine-level timings (step_n/add_requests)
# are unaffected: they sync via host token transfers.

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from omniquant_tpu.kernels.quant_matmul import (  # noqa: E402
    _unpack_tile, quant_matmul)
from omniquant_tpu.quant import QuantConfig, pack_weight  # noqa: E402
from omniquant_tpu.quant.packing import words_per_rows  # noqa: E402

M, K, N, GS = 32, 4096, 4096, 128
N_CHAIN = 64


def _kernel(mode, x_ref, qw_ref, sc_ref, out_ref, acc_ref,
            *, bits, bk, bn, gs_rows):
    nk = pl.num_programs(2)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xv = x_ref[:]
    n_g = bk // gs_rows
    sc = sc_ref[0, :n_g, :]
    if mode == "noup":
        w = jnp.broadcast_to(
            xv[0:1, :bn].astype(xv.dtype), (bk, bn))  # no unpack
        acc = jnp.zeros((xv.shape[0], bn), jnp.float32)
        for g in range(n_g):
            d = jnp.dot(xv[:, g * gs_rows:(g + 1) * gs_rows],
                        w[g * gs_rows:(g + 1) * gs_rows],
                        preferred_element_type=jnp.float32)
            acc += d * sc[g][None, :]
        acc_ref[:] += acc
    elif mode == "nodot":
        codes = _unpack_tile(qw_ref[:], bits, bk).astype(xv.dtype)
        acc_ref[:] += jnp.sum(
            codes.reshape(n_g, gs_rows, bn), axis=(0, 1)
        )[None, :].astype(jnp.float32) * 0.0 + codes[:acc_ref.shape[0], :bn
                                                     ].astype(jnp.float32)
    else:  # full
        codes = _unpack_tile(qw_ref[:], bits, bk)
        codes_f = codes.astype(xv.dtype)
        acc = jnp.zeros((xv.shape[0], bn), jnp.float32)
        for g in range(n_g):
            d = jnp.dot(xv[:, g * gs_rows:(g + 1) * gs_rows],
                        codes_f[g * gs_rows:(g + 1) * gs_rows],
                        preferred_element_type=jnp.float32)
            acc += d * sc[g][None, :]
        acc_ref[:] += acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def run(mode, pw, x, bn=2048):
    bits = pw.bits
    bk = pw.tile_k
    k_pad = pw.qweight.shape[0] * 32 // bits
    n = pw.qweight.shape[1]
    nk = k_pad // bk
    n_g = bk // pw.group_size
    ngp = -(-n_g // 8) * 8
    sc = pw.scales.T.astype(jnp.float32)
    g_needed = nk * n_g
    if sc.shape[0] < g_needed:
        sc = jnp.concatenate(
            [sc, jnp.repeat(sc[-1:], g_needed - sc.shape[0], 0)])
    sc = jnp.pad(sc.reshape(nk, n_g, n), ((0, 0), (0, ngp - n_g), (0, 0)))
    kfn = functools.partial(_kernel, mode, bits=bits, bk=bk, bn=bn,
                            gs_rows=pw.group_size)

    def call(xx):
        return pl.pallas_call(
            kfn,
            grid=(1, n // bn, nk),
            in_specs=[
                pl.BlockSpec((M, bk), lambda im, i, j: (im, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((words_per_rows(bits, bk), bn),
                             lambda im, i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ngp, bn), lambda im, i, j: (j, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda im, i, j: (im, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(xx, pw.qweight, sc)

    @jax.jit
    def chain(xx):
        y = xx
        for _ in range(N_CHAIN):
            y = call(y)
        return y

    chain(x).block_until_ready()
    t0 = time.time()
    for _ in range(5):
        out = chain(x)
    out.block_until_ready()
    return (time.time() - t0) / (5 * N_CHAIN)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32) * 0.02)
    for bits in (4, 2):
        pw = pack_weight(w, QuantConfig(n_bits=bits, group_size=GS))
        for mode in ("full", "noup", "nodot"):
            try:
                dt = run(mode, pw, x)
                print(f"w{bits} {mode:6s}: {dt*1e6:7.1f} us",
                      file=sys.stderr)
            except Exception as e:
                print(f"w{bits} {mode} failed: {type(e).__name__}: {e}",
                      file=sys.stderr)

    # dense bf16 comparison via plain jnp (XLA matmul)
    wb = jnp.asarray(w.T, jnp.bfloat16)

    @jax.jit
    def dchain(xx):
        y = xx
        for _ in range(N_CHAIN):
            y = (y @ wb).astype(jnp.bfloat16)
        return y

    dchain(x).block_until_ready()
    t0 = time.time()
    for _ in range(5):
        out = dchain(x)
    out.block_until_ready()
    dt = (time.time() - t0) / (5 * N_CHAIN)
    print(f"dense bf16 XLA : {dt*1e6:7.1f} us  "
          f"{wb.size*2/dt/1e9:5.0f} GB/s", file=sys.stderr)


if __name__ == "__main__":
    main()
