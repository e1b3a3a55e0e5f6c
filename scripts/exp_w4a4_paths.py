"""W4A4 path attribution on the real chip (VERDICT r4 next #1): where do
the 16% decode and the unknown prefill costs go?

Compares, at decode (m=32) and prefill (m=4096) GEMM shapes, 4096x4096
W4g128:
  bf16-pairs        quant_matmul, pairs layout (the W4A16 fast path)
  bf16-planar       quant_matmul, planar layout
  int-planar        quant_matmul_int, planar (current W4A4 serving path)
  fq+bf16-pairs     fake_quant_act then the pairs kernel (eval-oracle
                    semantics; candidate W4A4 decode route)
  actq-only         the per-token activation quantization alone

Timing: chain N dependent GEMMs in one jit, queue R dispatches, sync once
(block_until_ready is a no-op on the tunneled axon backend — see
docs/bench_infrastructure.md).
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
from omniquant_tpu.quant.quantizer import fake_quant_act  # noqa: E402

K = N = 4096


def timed(label, chain, x, n_chain, reps=8):
    # compile AND sync the first execution (the tunneled runtime's
    # first-execution tax must land outside the timed window; an unsynced
    # warmup would queue it INTO the timed drain)
    float(jnp.sum(chain(x)))
    t0 = time.time()
    outs = [chain(x) for _ in range(reps)]
    s = float(jnp.sum(outs[-1]))  # forces the whole queue to drain
    dt = (time.time() - t0) / (reps * n_chain)
    print(f"{label:18s} {dt*1e6:8.0f} us/gemm   (sink {s:.3g})",
          file=sys.stderr)
    return dt


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32) * 0.02)
    wcfg = QuantConfig(n_bits=4, group_size=128)
    pw_pairs = pack_weight(w, wcfg, layout="pairs")
    pw_planar = pack_weight(w, wcfg, layout="planar")
    acfg = ActQuantSpec.from_bits(4).act

    for m, n_chain in ((32, 64), (4096, 16)):
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

        timed("bf16-pairs", mk(lambda y: quant_matmul(y, pw_pairs)),
              x, n_chain)
        timed("bf16-planar", mk(lambda y: quant_matmul(y, pw_planar)),
              x, n_chain)
        timed("int-planar",
              mk(lambda y: quant_matmul_int(y, pw_planar, acfg)),
              x, n_chain)
        timed("fq+bf16-pairs",
              mk(lambda y: quant_matmul(fake_quant_act(y, acfg), pw_pairs)),
              x, n_chain)
        timed("fq+bf16-planar",
              mk(lambda y: quant_matmul(fake_quant_act(y, acfg), pw_planar)),
              x, n_chain)

        @jax.jit
        def actq_chain(x):
            y = x
            for _ in range(n_chain):
                c, s = quantize_act_int(y, acfg)
                y = c.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)
            return y

        timed("actq-only", actq_chain, x, n_chain)


if __name__ == "__main__":
    main()
