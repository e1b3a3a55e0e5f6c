"""Raw MXU rate check via Pallas/Mosaic: bf16xbf16->f32 vs s8xs8->s32 at
VMEM-resident tiles (no HBM traffic in the inner loop). Answers whether
Mosaic exposes the v5e int8 MXU 2x rate to jnp.dot inside a kernel — the
premise of the W4A4 integer prefill path."""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

M = N = KK = 512
INNER = 64


def kern_bf16(x_ref, w_ref, o_ref):
    acc = jnp.zeros((M, N), jnp.float32)
    x, w = x_ref[:], w_ref[:]
    for i in range(INNER):
        acc += jnp.dot(x, w, preferred_element_type=jnp.float32)
        x = x + x * 0  # keep the chain honest (no CSE of identical dots)
    o_ref[:] = acc


def kern_i8(x_ref, w_ref, o_ref):
    acc = jnp.zeros((M, N), jnp.int32)
    x, w = x_ref[:], w_ref[:]
    for i in range(INNER):
        acc += jnp.dot(x, w, preferred_element_type=jnp.int32)
        x = x ^ (x & 0)
    o_ref[:] = acc.astype(jnp.float32)


def run(label, kern, xdtype):
    rng = np.random.default_rng(0)
    if xdtype == jnp.bfloat16:
        x = jnp.asarray(rng.standard_normal((M, KK)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((KK, N)), jnp.bfloat16)
    else:
        x = jnp.asarray(rng.integers(-16, 16, (M, KK)), jnp.int8)
        w = jnp.asarray(rng.integers(-8, 8, (KK, N)), jnp.int8)

    f = jax.jit(lambda x, w: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        grid=(64,),
    )(x, w))
    float(jnp.sum(f(x, w)))
    t0 = time.time()
    reps = 16
    outs = [f(x, w) for _ in range(reps)]
    float(jnp.sum(outs[-1]))
    dt = (time.time() - t0) / reps
    flops = 2 * M * N * KK * INNER * 64
    print(f"{label:8s} {flops/dt/1e12:7.1f} TOP/s", file=sys.stderr)


if __name__ == "__main__":
    run("bf16", kern_bf16, jnp.bfloat16)
    run("int8", kern_i8, jnp.int8)
