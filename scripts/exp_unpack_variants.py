"""Experiment: which unpack strategy lets sub-4-bit decode GEMMs run at
their HBM-byte advantage? Times chained GEMMs (one dispatch) on the real
TPU. Throwaway harness — results feed kernels/quant_matmul.py.

Variants (coarse-group g128, M=32 decode shape):
  cur      current kernel: int32 shift/mask planes, concat, astype(bf16),
           post-matmul group scaling
  f32inj   mantissa injection: (((u>>s)&m) << (23-b)) | 0x3F800000 bitcast
           to f32 (w' = 1 + c/2^b) -> f32 MXU dots; the 2^b factor and the
           rank-1 "-1" correction fold into the scale slabs, so the VPU
           never converts int->float and never touches 16-bit lanes
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
    quant_matmul, quant_matmul_reference)
from omniquant_tpu.quant import QuantConfig, pack_weight  # noqa: E402
from omniquant_tpu.quant.packing import (  # noqa: E402
    vals_per_word, words_per_rows)

M = 32
K = N = 4096
GS = 128
N_CHAIN = 64


def _kernel_f32inj(x_ref, qw_ref, sc2_ref, off2_ref, out_ref, acc_ref,
                   *, bits, bk, bn, gs_rows, out_dtype):
    nk = pl.num_programs(2)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xv = x_ref[:].astype(jnp.float32)
    u = pltpu.bitcast(qw_ref[:], jnp.uint32)
    vpw = vals_per_word(bits)
    mask = jnp.uint32(2**bits - 1)
    one = jnp.uint32(0x3F800000)
    lsh = jnp.uint32(23 - bits)
    planes = [
        pltpu.bitcast(
            ((((u >> jnp.uint32(bits * p)) & mask) << lsh) | one),
            jnp.float32)
        for p in range(vpw)
    ]
    w1 = jnp.concatenate(planes, axis=0)  # (bk, bn) f32, w' = 1 + c/2^b
    n_g = bk // gs_rows
    sc2 = sc2_ref[0, :n_g, :]
    off2 = off2_ref[0, :n_g, :]
    m = xv.shape[0]
    xsum = jnp.sum(xv.reshape(m, n_g, gs_rows), axis=-1)
    acc = jnp.dot(xsum, off2, preferred_element_type=jnp.float32)
    for g in range(n_g):
        d = jnp.dot(xv[:, g * gs_rows:(g + 1) * gs_rows],
                    w1[g * gs_rows:(g + 1) * gs_rows],
                    preferred_element_type=jnp.float32)
        acc += d * sc2[g][None, :]
    acc_ref[:] += acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def make_call(pw, bn):
    bits, gs = pw.bits, pw.group_size
    bk = pw.tile_k
    k_pad = pw.qweight.shape[0] * 32 // bits
    n = pw.qweight.shape[1]
    nk = k_pad // bk
    n_g = bk // gs
    ngp = -(-n_g // 8) * 8
    sc = pw.scales.T.astype(jnp.float32)
    zp = pw.zeros.T.astype(jnp.float32)
    sc2 = sc * (2.0 ** bits)
    off2 = (-zp * sc) - sc2

    def to_slabs(a):
        g_needed = nk * n_g
        if a.shape[0] < g_needed:
            a = jnp.concatenate(
                [a, jnp.repeat(a[-1:], g_needed - a.shape[0], 0)])
        a = a.reshape(nk, n_g, n)
        return jnp.pad(a, ((0, 0), (0, ngp - n_g), (0, 0)))

    sc2, off2 = to_slabs(sc2), to_slabs(off2)
    grid = (1, n // bn, nk)
    kfn = functools.partial(
        _kernel_f32inj, bits=bits, bk=bk, bn=bn, gs_rows=gs,
        out_dtype=jnp.bfloat16)
    sc_spec = pl.BlockSpec(
        (1, ngp, bn), lambda im, i, j: (j, 0, i), memory_space=pltpu.VMEM)

    def call(xx):
        return pl.pallas_call(
            kfn,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, bk), lambda im, i, j: (im, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((words_per_rows(bits, bk), bn),
                             lambda im, i, j: (j, i),
                             memory_space=pltpu.VMEM),
                sc_spec, sc_spec,
            ],
            out_specs=pl.BlockSpec((M, bn), lambda im, i, j: (im, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(xx, pw.qweight, sc2, off2)

    return call


def time_chain(call, x):
    @jax.jit
    def chain(xx):
        y = xx
        for _ in range(N_CHAIN):
            y = call(y)
        return y

    chain(x).block_until_ready()
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = chain(x)
    out.block_until_ready()
    return (time.time() - t0) / (reps * N_CHAIN)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    for bits in (4, 2, 3, 8):
        w = jnp.asarray(
            rng.standard_normal((N, K)).astype(np.float32) * 0.02)
        pw = pack_weight(w, QuantConfig(n_bits=bits, group_size=GS))
        nbytes = pw.qweight.size * 4

        dt = time_chain(lambda xx, pw=pw: quant_matmul(xx, pw), x)
        print(f"w{bits} cur    : {dt*1e6:7.1f} us  "
              f"{nbytes/dt/1e9:5.0f} GB/s", file=sys.stderr)

        if bits in (2, 4, 8):  # injection path handles power-of-2 widths
            call = make_call(pw, bn=2048)
            # correctness
            got = jax.jit(call)(x)
            want = quant_matmul_reference(x.astype(jnp.float32), pw)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - want))
                / (float(jnp.max(jnp.abs(want))) + 1e-9))
            dt = time_chain(call, x)
            print(f"w{bits} f32inj : {dt*1e6:7.1f} us  "
                  f"{nbytes/dt/1e9:5.0f} GB/s  (rel err {err:.2e})",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
