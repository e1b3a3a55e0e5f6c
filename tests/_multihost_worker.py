"""Worker process for tests/test_multihost.py — one rank of a 2-process
gloo-CPU cluster running a dp-across-hosts x tp-within-host calibration
step. Prints `LOSS <value>` so the test can compare ranks against the
single-process oracle.

Must run under plain `python` (not pytest): it configures its own backend
before any jax usage.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    local_devices = int(sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.config.update("jax_default_matmul_precision", "highest")

    from omniquant_tpu.parallel.multihost import (
        MultihostConfig, init_multihost, global_mesh,
        shard_calibration_batch, process_slice, all_processes_agree)

    init_multihost(MultihostConfig(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid))
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * local_devices

    loss = calibration_step_global(
        global_mesh(tp=local_devices),
        shard_calibration_batch, process_slice)
    assert all_processes_agree(loss)
    print(f"LOSS {float(loss):.10f}", flush=True)

    # multi-step calibration with per-host data loading end-to-end
    # (VERDICT r2 #9): each rank loads ONLY its process_slice of the
    # synthetic corpus, runs N dp x tp steps, folds, and checks the folded
    # weights agree across ranks bit-for-bit
    import time as _time

    t0 = _time.perf_counter()
    w_sum, w_head = calibration_run_global(
        global_mesh(tp=local_devices),
        shard_calibration_batch, process_slice, steps=6)
    dt = _time.perf_counter() - t0
    assert all_processes_agree(w_sum)
    print(f"FOLDSUM {float(w_sum):.10f}", flush=True)
    print(f"FOLDHEAD {' '.join(f'{v:.8e}' for v in w_head)}", flush=True)
    print(f"WALL {dt:.3f}", flush=True)

    # cross-host SERVING: dp continuous batching — each rank's host-local
    # engine decodes its routed slot range; gather_tokens allgathers the
    # global streams (serving/dp_serving.py). The pytest side compares
    # against the single-process engine token-for-token.
    toks = dp_serving_tokens_global()
    import json as _json

    print(f"SERVTOKS {_json.dumps(toks)}", flush=True)


def serving_fixture():
    """Deterministic tiny packed llama engine inputs (same on every rank
    and in the single-process oracle)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from omniquant_tpu.models import LLAMA
    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.quant import QuantConfig
    from omniquant_tpu.serving.export import pack_model

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    params = jllama.init_params(jax.random.PRNGKey(2), cfg)
    wcfg = QuantConfig(n_bits=4, group_size=32)
    fq = dict(params)
    fq["layers"] = [
        LLAMA.effective_block_weights(b, wcfg, None, None, cfg)
        for b in params["layers"]
    ]
    packed = pack_model(LLAMA, fq, wcfg, tile_k=32)
    rng = np.random.default_rng(17)
    prompts = [list(map(int, rng.integers(0, 128, int(n))))
               for n in rng.integers(3, 7, 5)]
    return cfg, packed, prompts


def dp_serving_tokens_global():
    import jax.numpy as jnp

    from omniquant_tpu.serving.dp_serving import DPServingCoordinator
    from omniquant_tpu.serving.engine import LlamaEngine

    cfg, packed, prompts = serving_fixture()
    eng = LlamaEngine(packed, cfg, max_batch=4, max_len=32,
                      dtype=jnp.float32)
    coord = DPServingCoordinator(eng)
    return coord.generate_all(prompts, max_new_tokens=9, step=4)


def calibration_step_global(mesh, shard_fn, slice_fn, global_batch=4):
    """One dp x tp LWC/LET calibration step on a tiny llama block. Also used
    (with trivial shard/slice fns) by the single-process oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from omniquant_tpu.models import LLAMA
    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.parallel import block_specs, shard_params
    from omniquant_tpu.quant import QuantConfig

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    block = params["layers"][0]
    block_sh = shard_params(block, mesh, block_specs("llama", block))

    wcfg = QuantConfig(n_bits=4, group_size=16, lwc=True)
    trainable = {
        "lwc": jllama.init_lwc_params_block(block, wcfg),
        "let": jllama.init_let_params(block, cfg, None),
    }
    opt = optax.adamw(1e-2)
    opt_state = opt.init(trainable)

    rng = np.random.default_rng(0)
    x_full = rng.standard_normal((global_batch, 16, cfg.hidden_size)).astype(
        np.float32)
    fp_full = rng.standard_normal((global_batch, 16, cfg.hidden_size)).astype(
        np.float32)
    sl = slice_fn(global_batch)
    x = shard_fn(mesh, x_full[sl])
    fp_out = shard_fn(mesh, fp_full[sl])

    def loss_fn(tr, block, x, fp_out):
        eff = LLAMA.effective_block_weights(
            block, wcfg, tr["lwc"], tr["let"], cfg)
        out, _ = LLAMA.block_forward(eff, x, cfg)
        return jnp.mean((out - fp_out) ** 2)

    @jax.jit
    def step(tr, opt_state, block, x, fp_out):
        loss, grads = jax.value_and_grad(loss_fn)(tr, block, x, fp_out)
        updates, opt_state = opt.update(grads, opt_state, tr)
        return optax.apply_updates(tr, updates), opt_state, loss

    with jax.sharding.set_mesh(mesh):
        _, _, loss = step(trainable, opt_state, block_sh, x, fp_out)
    return loss


def calibration_run_global(mesh, shard_fn, slice_fn, steps=6,
                           global_batch=8):
    """A SHORT but complete calibration inner loop: per-host data loading
    (slice_fn over a real loader), `steps` dp x tp LWC steps, then the fold
    (hard fake-quant of the LET/LWC-transformed weights). Returns a scalar
    checksum + the first folded weight row so ranks (and the single-process
    oracle) can be compared for bit-equality."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from omniquant_tpu.calib.data import get_synthetic
    from omniquant_tpu.models import LLAMA
    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.parallel import block_specs, shard_params
    from omniquant_tpu.quant import QuantConfig, fake_quant_weight

    cfg = jllama.LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    block = params["layers"][0]
    block_sh = shard_params(block, mesh, block_specs("llama", block))

    # per-host data: every rank draws the SAME seeded corpus but only
    # slices its own rows (the multi-host loader contract: seeded loaders
    # are deterministic, process_slice picks this host's shard)
    train, _ = get_synthetic(global_batch, seed=3, seqlen=16, vocab_size=64)
    emb = np.asarray(jax.vmap(lambda t: params["embed_tokens"][t])(
        jnp.asarray(train)), np.float32)
    fp_full = emb * 1.01  # synthetic fp targets (same on all ranks)
    sl = slice_fn(global_batch)
    x = shard_fn(mesh, emb[sl])
    fp_out = shard_fn(mesh, fp_full[sl])

    wcfg = QuantConfig(n_bits=4, group_size=16, lwc=True)
    trainable = {"lwc": jllama.init_lwc_params_block(block, wcfg)}
    opt = optax.adamw(1e-2)
    opt_state = opt.init(trainable)

    def loss_fn(tr, block, x, fp_out):
        eff = LLAMA.effective_block_weights(
            block, wcfg, tr["lwc"], None, cfg)
        out, _ = LLAMA.block_forward(eff, x, cfg)
        return jnp.mean((out - fp_out) ** 2)

    @jax.jit
    def step(tr, opt_state, block, x, fp_out):
        loss, grads = jax.value_and_grad(loss_fn)(tr, block, x, fp_out)
        updates, opt_state = opt.update(grads, opt_state, tr)
        return optax.apply_updates(tr, updates), opt_state, loss

    with jax.sharding.set_mesh(mesh):
        for _ in range(steps):
            trainable, opt_state, loss = step(
                trainable, opt_state, block_sh, x, fp_out)
        folded = fake_quant_weight(
            jnp.asarray(block["q_proj"]["weight"]), wcfg,
            trainable["lwc"]["q_proj"])
    w = np.asarray(folded)
    return float(np.abs(w).sum()), [float(v) for v in w[0, :4]]


if __name__ == "__main__":
    main()
