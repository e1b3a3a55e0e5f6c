"""Flash (blockwise) attention kernel vs dense oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniquant_tpu.kernels.flash_attention import (
    flash_attention, flash_attention_reference)


def _mk(B, H, Hkv, S, D, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), dtype)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), dtype)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_matches_oracle_f32(causal):
    q, k, v = _mk(2, 4, 4, 256, 64)
    out = flash_attention(q, k, v, causal=causal, block_q=64, block_k=128)
    ref = flash_attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gqa_and_mqa():
    for Hkv in (2, 1):
        q, k, v = _mk(1, 4, Hkv, 128, 64, seed=Hkv)
        out = flash_attention(q, k, v, block_q=64, block_k=128)
        ref = flash_attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_ragged_length_and_small_head_dim():
    """S not a block multiple (padding masked) and D < 128 (lane padding)."""
    q, k, v = _mk(1, 2, 2, 200, 32, seed=3)
    out = flash_attention(q, k, v, block_q=64, block_k=128)
    ref = flash_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bf16_long_context():
    """4k context in bf16 — the regime the dense path can't afford."""
    q, k, v = _mk(1, 2, 2, 4096, 64, dtype=jnp.bfloat16, seed=4)
    out = flash_attention(q, k, v, block_q=256, block_k=256)
    ref = flash_attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_engine_prefill_uses_flash_and_matches_dense():
    """LlamaEngine prefill through the flash path produces the same next
    token and logits path as the dense einsum path."""
    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.serving.engine import LlamaEngine

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256)
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    prompt = list(np.random.default_rng(0).integers(1, 128, 100))

    dense = LlamaEngine(params, cfg, max_batch=2, max_len=256,
                        dtype=jnp.float32, flash_min_len=10**9)
    flash = LlamaEngine(params, cfg, max_batch=2, max_len=256,
                        dtype=jnp.float32, flash_min_len=16)
    sd = dense.add_request(prompt)
    sf = flash.add_request(prompt)
    assert dense._pending_next[sd] == flash._pending_next[sf]
    # decode continues identically off the flash-prefilled cache
    d = dense.step_n({sd: dense._pending_next[sd]}, 4)[sd]
    f = flash.step_n({sf: flash._pending_next[sf]}, 4)[sf]
    assert d == f


def test_alibi_matches_oracle():
    """ALiBi slopes inside the kernel == dense oracle with the bias."""
    from omniquant_tpu.kernels.flash_attention import (
        flash_attention, flash_attention_reference)
    from omniquant_tpu.models.falcon import alibi_slopes

    rng = np.random.default_rng(9)
    B, H, S, D = 1, 4, 96, 32
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, 1, S, D)), jnp.float32)  # MQA
    v = jnp.asarray(rng.standard_normal((B, 1, S, D)), jnp.float32)
    slopes = alibi_slopes(H)
    ref = flash_attention_reference(q, k, v, alibi_slopes=slopes)
    got = flash_attention(q, k, v, alibi_slopes=slopes, block_q=32,
                          block_k=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
