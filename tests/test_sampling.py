"""On-device sampling: pure-function semantics + engine integration.

The reference delegates sampling to MLC-LLM's ChatModule; here it is part of
the jitted decode step (serving/sampling.py), so these tests pin down the
filter semantics (greedy / top-k / nucleus) and that mixed greedy+sampled
batches coexist in one step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniquant_tpu.serving.sampling import sample_tokens


def _ones(B, v):
    return jnp.full((B,), v)


def test_temperature_zero_is_argmax():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 50)).astype(np.float32))
    out = sample_tokens(logits, jax.random.PRNGKey(0),
                        _ones(4, 0.0), jnp.zeros(4, jnp.int32), _ones(4, 1.0))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.argmax(np.asarray(logits), axis=-1))


def test_top_k_one_is_argmax_even_at_high_temperature():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 40)).astype(np.float32))
    out = sample_tokens(logits, jax.random.PRNGKey(1),
                        _ones(3, 5.0), jnp.full(3, 1, jnp.int32), _ones(3, 1.0))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.argmax(np.asarray(logits), axis=-1))


def test_top_k_support_is_respected():
    """With top_k=k, every drawn token must be among the k largest logits."""
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32))
    k = 4
    topk = set(np.argsort(np.asarray(logits)[0])[-k:].tolist())
    draws = set()
    for i in range(200):
        out = sample_tokens(logits, jax.random.PRNGKey(i),
                            _ones(1, 2.0), jnp.full(1, k, jnp.int32),
                            _ones(1, 1.0))
        draws.add(int(out[0]))
    assert draws <= topk
    assert len(draws) > 1  # actually stochastic


def test_top_p_nucleus_support():
    """A peaked distribution with top_p just above the peak mass keeps only
    the tokens needed to reach that mass (the boundary-crossing token is
    included, standard nucleus convention)."""
    logits = jnp.asarray(
        [[10.0, 9.0] + [0.0] * 30], jnp.float32)  # two dominant tokens
    draws = set()
    for i in range(200):
        out = sample_tokens(logits, jax.random.PRNGKey(i),
                            _ones(1, 1.0), jnp.zeros(1, jnp.int32),
                            _ones(1, 0.9))
        draws.add(int(out[0]))
    assert draws <= {0, 1}


def test_mixed_greedy_and_sampled_rows():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((2, 100)).astype(np.float32))
    temps = jnp.asarray([0.0, 3.0])
    greedy0 = int(np.argmax(np.asarray(logits)[0]))
    row1 = set()
    for i in range(100):
        out = sample_tokens(logits, jax.random.PRNGKey(i), temps,
                            jnp.zeros(2, jnp.int32), _ones(2, 1.0))
        assert int(out[0]) == greedy0
        row1.add(int(out[1]))
    assert len(row1) > 3


def test_engine_sampled_generation_varies_by_seed():
    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.serving.engine import LlamaEngine

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64)
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    prompt = list(range(1, 9))

    outs = []
    for seed in (0, 1):
        eng = LlamaEngine(params, cfg, max_batch=2, max_len=64,
                          dtype=jnp.float32, seed=seed)
        outs.append(eng.generate(prompt, max_new_tokens=12,
                                 temperature=1.5, top_k=0, top_p=1.0))
    assert outs[0] != outs[1]
    assert all(0 <= t < cfg.vocab_size for t in outs[0] + outs[1])

    # greedy runs are seed-independent and deterministic
    g0 = LlamaEngine(params, cfg, max_batch=2, max_len=64,
                     dtype=jnp.float32, seed=0).generate(prompt, 12)
    g1 = LlamaEngine(params, cfg, max_batch=2, max_len=64,
                     dtype=jnp.float32, seed=7).generate(prompt, 12)
    assert g0 == g1


def test_engine_step_n_mixed_batch():
    """Greedy and sampled slots coexist in one step_n dispatch; the greedy
    slot's tokens match an all-greedy run."""
    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.serving.engine import LlamaEngine

    cfg = jllama.LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64)
    params = jllama.init_params(jax.random.PRNGKey(1), cfg)
    prompt = list(range(1, 6))

    ref = LlamaEngine(params, cfg, max_batch=2, max_len=64, dtype=jnp.float32)
    s = ref.add_request(prompt)
    ref_chunk = ref.step_n({s: ref._pending_next[s]}, 6)[s]

    eng = LlamaEngine(params, cfg, max_batch=2, max_len=64, dtype=jnp.float32)
    g = eng.add_request(prompt)                       # greedy slot
    g_next = eng._pending_next[g]
    r = eng.add_request(prompt, temperature=2.0)      # sampled slot
    r_next = eng._pending_next[r]
    chunk = eng.step_n({g: g_next, r: r_next}, 6)
    assert chunk[g] == ref_chunk
    assert all(0 <= t < cfg.vocab_size for t in chunk[r])
