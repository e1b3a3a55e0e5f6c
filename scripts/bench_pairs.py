"""pairs vs planar layout decode-GEMM throughput on the real TPU."""

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

M, K, N, GS, N_CHAIN = 32, 4096, 4096, 128, 64


def time_chain(pw, x):
    @jax.jit
    def chain(xx):
        y = xx
        for _ in range(N_CHAIN):
            y = quant_matmul(y, pw)
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
        for layout in ("planar", "pairs"):
            pw = pack_weight(w, QuantConfig(n_bits=bits, group_size=GS),
                             layout=layout)
            dt = time_chain(pw, x)
            nbytes = pw.qweight.size * 4
            print(f"w{bits} {layout:6s}: {dt*1e6:7.1f} us  "
                  f"{nbytes/dt/1e9:5.0f} GB/s", file=sys.stderr)


if __name__ == "__main__":
    main()
