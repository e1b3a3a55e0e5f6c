"""Ring-staged decode writes (serving/engine.py::_decode_multi_impl).

step_n(n>1) stages each step's k/v at a static ring index and flushes one
contiguous span write per layer at dispatch end (kv_cache_write_span);
attention covers cache[0, base) + the staged ring (flash-stats merge on
the fused int8 kernel path, concat on the dense paths). These tests pin
the invariant that the staged program emits token-for-token the same
stream as sequential single-step decode (whose per-step positioned write
path is unchanged), across cache dtypes, families, uneven slot lengths,
and repeated dispatches (flush -> re-stage)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omniquant_tpu.models import llama as jllama
from omniquant_tpu.serving.engine import (
    FalconEngine, LlamaEngine, OPTEngine)


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _streams(make_engine, prompts, n_steps_seq):
    """(sequential singles, staged multi) token streams per slot."""
    eng1 = make_engine()
    slots = eng1.add_requests(prompts)
    toks = {s: eng1._pending_next[s] for s in slots}
    singles = {s: [t] for s, t in toks.items()}
    total = sum(n_steps_seq)
    for _ in range(total):
        toks = eng1.step(dict(toks))
        for s, t in toks.items():
            singles[s].append(t)

    eng2 = make_engine()
    slots2 = eng2.add_requests(prompts)
    assert slots2 == slots
    toks = {s: eng2._pending_next[s] for s in slots}
    multi = {s: [t] for s, t in toks.items()}
    for n in n_steps_seq:
        out = eng2.step_n(dict(toks), n)
        for s, ts in out.items():
            multi[s].extend(ts)
            toks[s] = ts[-1]
    return singles, multi


@pytest.mark.parametrize("kv_dtype", ["native", "int8"])
def test_ring_matches_sequential_llama(tiny_llama, kv_dtype):
    cfg, params = tiny_llama
    rng = np.random.default_rng(0)
    # uneven prompt lengths: each slot's base offset differs, exercising
    # per-slot span-write positions and the strict-past cache mask
    prompts = [list(rng.integers(0, 128, n)) for n in (5, 12, 3)]

    def make():
        return LlamaEngine(params, cfg, max_batch=3, max_len=128,
                           dtype=jnp.float32, kv_dtype=kv_dtype)

    singles, multi = _streams(make, prompts, n_steps_seq=[8, 3, 5])
    assert multi == singles


def test_ring_int8_kernel_path(tiny_llama):
    """attn_kernel=True + int8: the flash-stats merge path (kernel runs
    in interpret mode on CPU)."""
    cfg, params = tiny_llama
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(0, 128, n)) for n in (7, 2)]

    def make():
        eng = LlamaEngine(params, cfg, max_batch=2, max_len=128,
                          dtype=jnp.float32, kv_dtype="int8")
        assert eng.attn_kernel
        return eng

    singles, multi = _streams(make, prompts, n_steps_seq=[6, 6])
    assert multi == singles


def test_ring_matches_sequential_opt():
    from omniquant_tpu.models import opt as jopt

    cfg = jopt.OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=256,
        do_layer_norm_before=True)
    params = jopt.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(0, 128, n)) for n in (4, 9)]

    def make():
        eng = OPTEngine(params, cfg, max_batch=2, max_len=128,
                        dtype=jnp.float32, kv_dtype="int8")
        assert eng._use_ring()
        return eng

    singles, multi = _streams(make, prompts, n_steps_seq=[8])
    assert multi == singles


@pytest.mark.parametrize("alibi", [False, True])
def test_ring_matches_sequential_falcon(alibi):
    from omniquant_tpu.models import falcon as jfalcon

    cfg = jfalcon.FalconConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, multi_query=not alibi,
        parallel_attn=not alibi, alibi=alibi, bias=alibi)
    params = jfalcon.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(0, 128, n)) for n in (6, 11)]

    def make():
        return FalconEngine(params, cfg, max_batch=2, max_len=128,
                            dtype=jnp.float32, kv_dtype="int8")

    eng = make()
    # ALiBi must NOT take the fused kernel (it would drop the mask-folded
    # positional bias — measured stream divergence) nor the ring
    assert eng._use_ring() == (not alibi)
    assert eng.attn_kernel == (not alibi)
    singles, multi = _streams(make, prompts, n_steps_seq=[8])
    assert multi == singles
