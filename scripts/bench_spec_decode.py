"""Measure the speculative-decoding round cost at 7B geometry on one chip.

The interesting number is the FUSED round cost (spec_steps: draft loop +
verify + acceptance in one dispatch, r rounds per dispatch) against the
sequential step_n(8) per-token cost. Random weights give ~zero layer-skip
acceptance, so end-to-end tok/s is meaningless here; what transfers to a
real checkpoint is the cost side:

    speedup(alpha) = (1 + alpha*gamma) / (round_ms / seq_tok_ms)

Run: python scripts/bench_spec_decode.py [bits] [draft_layers] [gamma]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax.numpy as jnp

    from bench import build_7b_packed_params, make_cfg
    from omniquant_tpu.serving import LlamaEngine, SpecDecoder

    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    g = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    batch = 8
    cfg = make_cfg(1024)
    t0 = time.time()
    params = build_7b_packed_params(cfg, jnp.bfloat16, bits=bits)
    print(f"# built W{bits} packed params in {time.time()-t0:.0f}s")
    eng = LlamaEngine(params, cfg, max_batch=batch, max_len=1024,
                      dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(0, 32000, 128)) for _ in range(batch)]
    slots = eng.add_requests(prompts)
    last = {s: eng._pending_next[s] for s in slots}

    # sequential baseline: step_n(8), the bench.py decode path
    def seq():
        eng.step_n(dict(last), 8)
        eng.lengths[slots] = 128

    seq()  # compile
    eng.lengths[slots] = 128
    t0 = time.time()
    for _ in range(3):
        seq()
    seq_tok_ms = (time.time() - t0) / 3 / 8 * 1e3
    print(f"# sequential step_n(8): {seq_tok_ms:.2f} ms/token "
          f"({batch/seq_tok_ms*1e3:.0f} tok/s aggregate)")

    sd = SpecDecoder(eng, draft_layers=d, gamma=g)
    # prefill the draft for real (cache coverage for the windows)
    for s in slots:
        sd.draft.release(s)
    dslots = sd.draft.add_requests(prompts)
    assert dslots == slots

    r = 4

    def fused():
        sd.spec_steps(dict(last), rounds=r)
        eng.lengths[slots] = 128
        sd.draft.lengths[slots] = 128

    fused()  # compile
    t0 = time.time()
    n = 3
    for _ in range(n):
        fused()
    round_ms = (time.time() - t0) / n / r * 1e3
    print(f"# fused spec round (d={d}, gamma={g}, r={r}/dispatch): "
          f"{round_ms:.2f} ms/round = {round_ms/seq_tok_ms:.2f} seq-tokens")
    for alpha in (0.5, 0.7, 0.9, 1.0):
        sp = (1 + alpha * g) / (round_ms / seq_tok_ms)
        print(f"#   acceptance {alpha:.1f}: {1+alpha*g:.1f} tok/round "
              f"=> {sp:.2f}x sequential decode")


if __name__ == "__main__":
    main()
