"""Sweep the fused quant-matmul's (block_m, block_n) tiling at PREFILL
shapes (VERDICT r3 weak #3: prefill MFU 47% -> 55%+ or a ceiling analysis).

Prefill linear flops dominate the MFU accounting (98% vs attention at 7B,
batch 8 x 1024 tokens), so the fused dequant-matmul's large-M efficiency
IS the prefill MFU. The kernel re-unpacks each weight tile once per m-tile
(m/bm times at m=8192) — larger bm amortizes the VPU unpack against more
MXU rows, at the cost of a bigger VMEM accumulator (bm x bn x 4B).

Run on the TPU: python scripts/exp_prefill_tiles.py [bits]
Prints ms and MFU per (bm, bn) for the three 7B prefill GEMMs.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from omniquant_tpu.kernels.quant_matmul import _qmm_call
    from omniquant_tpu.quant import QuantConfig, pack_weight

    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    peak = 197e12
    shapes = [  # (m, k, n) — 7B batch 8 x 1024-token prefill GEMMs
        (8192, 4096, 4096),
        (8192, 4096, 11008),
        (8192, 11008, 4096),
    ]
    wcfg = QuantConfig(n_bits=bits, group_size=128)
    rng = np.random.default_rng(0)
    for (m, k, n) in shapes:
        w = jnp.asarray(
            rng.standard_normal((n, k)).astype(np.float32) * 0.02)
        pw = pack_weight(w, wcfg, layout="auto")
        x = jnp.asarray(
            rng.standard_normal((m, k)).astype(np.float32), jnp.bfloat16)
        scales_t = pw.scales.T.astype(jnp.float32)
        zeros_t = pw.zeros.T.astype(jnp.float32)
        flops = 2 * m * k * n
        print(f"== {m}x{k}x{n} W{bits} layout={pw.layout} "
              f"tile_k={pw.tile_k} ==")
        for bm in (None, 256, 512, 1024, 2048):
            for bn in (512, 1024, 2048):
                if n % bn:
                    continue
                try:
                    def run():
                        return _qmm_call(
                            x, pw.qweight, scales_t, zeros_t,
                            bits=pw.bits, group_size=pw.group_size,
                            out_features=n, block_n=bn, tile_k=pw.tile_k,
                            interpret=False, layout=pw.layout,
                            block_m=bm).block_until_ready()

                    run()  # compile
                    t0 = time.time()
                    reps = 8
                    for _ in range(reps):
                        run()
                    dt = (time.time() - t0) / reps
                    print(f"  bm={bm or 'auto'} bn={bn}: {dt*1e3:7.2f} ms  "
                          f"MFU {flops/dt/peak*100:5.1f}%")
                except Exception as exc:
                    print(f"  bm={bm or 'auto'} bn={bn}: FAIL "
                          f"{str(exc)[:90]}")


if __name__ == "__main__":
    main()
