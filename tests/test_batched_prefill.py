"""Batched multi-slot prefill (`add_requests`) vs per-request prefill."""
import jax
import jax.numpy as jnp
import numpy as np

from omniquant_tpu.models import llama as jllama
from omniquant_tpu.serving.engine import LlamaEngine, OPTEngine


def _llama_cfg():
    return jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)


def test_batched_prefill_matches_sequential():
    cfg = _llama_cfg()
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 128, n)) for n in (12, 7, 20)]

    seq = LlamaEngine(params, cfg, max_batch=4, max_len=128,
                      dtype=jnp.float32)
    seq_slots = [seq.add_request(p) for p in prompts]
    seq_first = {s: seq._pending_next[s] for s in seq_slots}
    seq_out = seq.step_n(seq_first, 5)

    bat = LlamaEngine(params, cfg, max_batch=4, max_len=128,
                      dtype=jnp.float32)
    bat_slots = bat.add_requests(prompts)
    assert bat_slots == seq_slots
    bat_first = {s: bat._pending_next[s] for s in bat_slots}
    assert bat_first == seq_first
    bat_out = bat.step_n(bat_first, 5)
    assert bat_out == seq_out


def test_batched_prefill_int8_kv():
    cfg = _llama_cfg()
    params = jllama.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(1, 128, n)) for n in (9, 15)]

    seq = LlamaEngine(params, cfg, max_batch=2, max_len=128,
                      dtype=jnp.float32, kv_dtype="int8")
    sf = {s: seq._pending_next[s] for s in [seq.add_request(p) for p in prompts]}
    bat = LlamaEngine(params, cfg, max_batch=2, max_len=128,
                      dtype=jnp.float32, kv_dtype="int8")
    slots = bat.add_requests(prompts)
    bf = {s: bat._pending_next[s] for s in slots}
    assert bf == sf
    assert bat.step_n(bf, 4) == seq.step_n(sf, 4)


def test_batched_prefill_opt():
    from omniquant_tpu.models import opt as jopt

    cfg = jopt.OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=True)
    params = jopt.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(1, 128, n)) for n in (5, 11)]

    seq = OPTEngine(params, cfg, max_batch=2, max_len=128, dtype=jnp.float32)
    sf = {s: seq._pending_next[s] for s in [seq.add_request(p) for p in prompts]}
    bat = OPTEngine(params, cfg, max_batch=2, max_len=128, dtype=jnp.float32)
    slots = bat.add_requests(prompts)
    assert {s: bat._pending_next[s] for s in slots} == sf
