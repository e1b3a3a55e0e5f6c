"""Microbenchmark the fused dequant-matmul kernel per bit-width on the real
TPU at 7B decode shapes. Chains N_CHAIN dependent GEMMs inside ONE jit so
the tunneled chip's per-dispatch overhead (~1.3 ms) amortizes away; reports
per-GEMM ms + effective packed-weight streaming GB/s (a scheme far below
the chip's ~437 GB/s peak at small bytes/step is VPU-unpack-bound, not
HBM-bound)."""

# NOTE: block_until_ready is a NO-OP on the tunneled axon backend — any
# timing below that relies on it under-reports. Use the queue-N-dispatches
# + single host-readback pattern instead (scripts/exp_prefill_tiles.py,
# docs/bench_infrastructure.md). Engine-level timings (step_n/add_requests)
# are unaffected: they sync via host token transfers.

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from omniquant_tpu.kernels.quant_matmul import quant_matmul  # noqa: E402
from omniquant_tpu.quant import QuantConfig, pack_weight  # noqa: E402

N_CHAIN = 64
M = 32
K = N = 4096


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    for bits in (4, 3, 2, 6, 8):
        w = jnp.asarray(
            rng.standard_normal((N, K)).astype(np.float32) * 0.02)
        pw = pack_weight(w, QuantConfig(n_bits=bits, group_size=128))

        @jax.jit
        def chain(x, pw=pw):
            y = x
            for _ in range(N_CHAIN):
                y = quant_matmul(y, pw) * 1e-2  # keep magnitudes bounded
            return y

        chain(x).block_until_ready()
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            out = chain(x)
        out.block_until_ready()
        dt = (time.time() - t0) / (reps * N_CHAIN)
        nbytes = pw.qweight.size * 4 + pw.scales.size * 4 * 2
        print(f"w{bits}g128 {K}x{N}: {dt*1e6:.0f} us/gemm  "
              f"{nbytes/dt/1e9:.0f} GB/s packed-stream", file=sys.stderr)


if __name__ == "__main__":
    main()
