"""Sweep the fused quant-matmul's (block_m, block_n) tiling at PREFILL
shapes (VERDICT r3 weak #3: prefill MFU 47% -> 55%+ or a ceiling analysis).

Prefill linear flops dominate the MFU accounting (98% vs attention at 7B,
batch 8 x 1024 tokens), so the fused dequant-matmul's large-M efficiency
IS the prefill MFU. The kernel re-unpacks each weight tile once per m-tile
(m/bm times at m=8192) — larger bm amortizes the VPU unpack against more
MXU rows, at the cost of a bigger VMEM accumulator (bm x bn x 4B).

Run on the TPU: python scripts/exp_prefill_tiles.py [bits]
Prints ms and MFU per (bm, bn) for the three 7B prefill GEMMs.

RESULTS (v5e, W4 pairs, m=8192; queue-16-sync-once timing — NOTE
block_until_ready is a no-op on the tunneled backend, see
docs/bench_infrastructure.md):

  shape                fused best           dequant-once    dense ceiling
  8192x4096x4096       3.53 ms / 39.5%      3.73 / 37.4%    2.99 / 46.7%
  8192x4096x12288      7.47 ms / 56.0%      7.93 / 52.8%    (qkv fused)
  8192x11008x4096      7.49 ms / 50.1%      8.19 / 45.8%    5.56 / 67.4%
  8192x4096x11008     12.40 ms / 30.2%      7.64 / 49.1%    5.47 / 68.5%
                       (bn=256 forced)

  * (bm, bn) tiling moves the fused kernel by only ~±8%; the auto choice
    is near-best wherever bn >= 1024 can be used.
  * When N forces bn < 1024 (gate/up: 11008 % 512 != 0 at fused 22016),
    the fused kernel collapses to ~30% MFU; dequantize-ONCE + dense MXU
    is 30-60% faster there. quant_matmul now routes m>=4096, bn<1024
    GEMMs through dequant-once.
  * Engine-level long prefill (8x1024, flash attention included):
    46.8% -> 53.3% MFU (6699 -> 7636 tok/s) with the routing. The
    chip's own plain bf16 matmul peaks at 67-68% MFU on these shapes,
    so the engine runs at ~79% of the realistic dense ceiling.
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
        for bm in (None, 512, 1024):
            for bn in (512, 1024, 2048):
                if n % bn:
                    continue
                try:
                    def call():
                        return _qmm_call(
                            x, pw.qweight, scales_t, zeros_t,
                            bits=pw.bits, group_size=pw.group_size,
                            out_features=n, block_n=bn, tile_k=pw.tile_k,
                            interpret=False, layout=pw.layout,
                            block_m=bm)

                    def sync(y):
                        # block_until_ready is a NO-OP on the tunneled
                        # backend and a per-call host readback pays the
                        # (large) dispatch latency; queue all reps, sync
                        # ONCE via a readback that depends on the last
                        return float(jnp.sum(y[:8, :8]))

                    sync(call())  # compile + warm
                    reps = 16
                    t0 = time.time()
                    y = None
                    for _ in range(reps):
                        y = call()
                    sync(y)
                    dt = (time.time() - t0) / reps
                    print(f"  bm={bm or 'auto'} bn={bn}: {dt*1e3:7.2f} ms  "
                          f"MFU {flops/dt/peak*100:5.1f}%")
                except Exception as exc:
                    print(f"  bm={bm or 'auto'} bn={bn}: FAIL "
                          f"{str(exc)[:90]}")


if __name__ == "__main__":
    main()
