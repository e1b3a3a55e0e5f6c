"""Experiment: is the decode GEMM bound by per-grid-cell fixed cost?
Times the current kernel at different (tile_k, block_n) grid geometries.
If time tracks cell count rather than bytes, coarser grids win sub-4-bit
its bandwidth advantage back."""

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

M = 32
K = N = 4096
GS = 128
N_CHAIN = 64


def time_chain(fn, x):
    @jax.jit
    def chain(xx):
        y = xx
        for _ in range(N_CHAIN):
            y = fn(y)
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
    w = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32) * 0.02)

    for bits in (4, 2):
        for tile_k in (512, 1024, 2048):
            for bn in (1024, 2048, 4096):
                # VMEM bound: bf16 codes tile + int32 planes intermediate
                if tile_k * bn * (2 + 4) > 14 * 1024 * 1024:
                    continue
                try:
                    pw = pack_weight(
                        w, QuantConfig(n_bits=bits, group_size=GS),
                        tile_k=tile_k)
                    dt = time_chain(
                        lambda xx, pw=pw, bn=bn: quant_matmul(
                            xx, pw, block_n=bn), x)
                    cells = (K // tile_k) * (N // bn)
                    nbytes = pw.qweight.size * 4
                    print(f"w{bits} tile={tile_k:4d} bn={bn:4d} "
                          f"cells={cells:3d}: {dt*1e6:7.1f} us  "
                          f"{nbytes/dt/1e9:5.0f} GB/s", file=sys.stderr)
                except Exception as e:
                    print(f"w{bits} tile={tile_k} bn={bn} failed: "
                          f"{type(e).__name__}", file=sys.stderr)


if __name__ == "__main__":
    main()
