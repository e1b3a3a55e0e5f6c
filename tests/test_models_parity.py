"""Numerics parity vs HuggingFace transformers (torch CPU, random weights).

These validate that our functional LLaMA/OPT forwards match the upstream
architectures the reference wraps (models/int_llama_layer.py faithfully
re-implements HF LlamaDecoderLayer; ditto OPT), so quantization deltas
measured on our models are comparable to the reference's.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omniquant_tpu.models import llama as jllama
from omniquant_tpu.models import opt as jopt


@pytest.fixture(scope="module")
def torch_mods():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM, OPTConfig, OPTForCausalLM

    return torch, LlamaConfig, LlamaForCausalLM, OPTConfig, OPTForCausalLM


def tiny_hf_llama(torch_mods, num_kv_heads=4):
    torch, LlamaConfig, LlamaForCausalLM, *_ = torch_mods
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    return cfg, model


@pytest.mark.parametrize("num_kv_heads", [4, 2])
def test_llama_forward_matches_hf(torch_mods, num_kv_heads):
    torch = torch_mods[0]
    hf_cfg, hf_model = tiny_hf_llama(torch_mods, num_kv_heads)
    cfg = jllama.LlamaConfig.from_hf(hf_cfg)
    params = jllama.from_hf_state_dict(hf_model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(jllama.forward(params, jnp.asarray(tokens), cfg))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_opt_forward_matches_hf(torch_mods):
    torch, _, _, OPTConfig, OPTForCausalLM = torch_mods
    hf_cfg = OPTConfig(
        vocab_size=256,
        hidden_size=64,
        ffn_dim=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=128,
        word_embed_proj_dim=64,
        do_layer_norm_before=True,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf_model = OPTForCausalLM(hf_cfg).eval()
    cfg = jopt.OPTConfig.from_hf(hf_cfg)
    params = jopt.from_hf_state_dict(hf_model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 256, size=(2, 16))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(jopt.forward(params, jnp.asarray(tokens), cfg))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_llama_let_fold_preserves_block_output(torch_mods):
    """effective_block_weights with LET (no quant) must preserve the block
    function — the foundational OmniQuant equivalence."""
    hf_cfg, hf_model = tiny_hf_llama(torch_mods)
    cfg = jllama.LlamaConfig.from_hf(hf_cfg)
    params = jllama.from_hf_state_dict(hf_model.state_dict(), cfg)
    block = params["layers"][0]

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)), jnp.float32)
    let = jllama.init_let_params(block, cfg, act_scales=None)
    # make it non-trivial
    let = {
        k: (v + jnp.asarray(rng.uniform(0.2, 0.8, v.shape), jnp.float32)
            if "scale" in k else
            v + jnp.asarray(rng.standard_normal(v.shape) * 0.05, jnp.float32))
        for k, v in let.items()
    }
    eff = jllama.effective_block_weights(
        block, None, None, let, cfg, quantize=False)
    y_ref, _ = jllama.block_forward(block, x, cfg)
    y_let, _ = jllama.block_forward(eff, x, cfg)
    np.testing.assert_allclose(
        np.asarray(y_let), np.asarray(y_ref), rtol=1e-3, atol=1e-4
    )


def test_opt_let_fold_preserves_block_output(torch_mods):
    torch = torch_mods[0]
    cfg = jopt.OPTConfig(
        vocab_size=64, hidden_size=32, ffn_dim=64, num_hidden_layers=1,
        num_attention_heads=4, max_position_embeddings=64,
    )
    params = jopt.init_params(jax.random.PRNGKey(0), cfg)
    block = params["layers"][0]
    rng = np.random.default_rng(3)
    # give biases nonzero values so the shift algebra is exercised
    for n in jopt.LINEAR_NAMES:
        block[n]["bias"] = jnp.asarray(
            rng.standard_normal(block[n]["bias"].shape) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)), jnp.float32)
    let = jopt.init_let_params(block, cfg, None, None)
    let = {
        k: (v * jnp.asarray(rng.uniform(0.5, 1.5, v.shape), jnp.float32)
            if "scale" in k else
            v + jnp.asarray(rng.standard_normal(v.shape) * 0.05, jnp.float32))
        for k, v in let.items()
    }
    eff = jopt.effective_block_weights(block, None, None, let, cfg, quantize=False)
    y_ref, _ = jopt.block_forward(block, x, cfg)
    y_let, _ = jopt.block_forward(eff, x, cfg)
    np.testing.assert_allclose(
        np.asarray(y_let), np.asarray(y_ref), rtol=1e-3, atol=1e-4
    )


def test_llama_kv_cache_decode_matches_full_forward(torch_mods):
    """Prefill+decode with kv cache == full forward on the whole sequence."""
    hf_cfg, hf_model = tiny_hf_llama(torch_mods)
    cfg = jllama.LlamaConfig.from_hf(hf_cfg)
    params = jllama.from_hf_state_dict(hf_model.state_dict(), cfg)
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(0, 256, size=(1, 12)))

    full = jllama.forward(params, tokens, cfg)

    # prefill on first 8, decode 4 one at a time
    x = jllama.embed(params, tokens[:, :8])
    from omniquant_tpu.models.common import causal_mask

    caches = []
    mask = causal_mask(8, 8)
    h = x
    for layer in params["layers"]:
        h, c = jllama.block_forward(layer, h, cfg, mask, jnp.arange(8))
        caches.append(c)
    logits_last = jllama.head(params, h, cfg)[:, -1]

    outs = [logits_last]
    for t in range(8, 12):
        h = jllama.embed(params, tokens[:, t : t + 1])
        new_caches = []
        for layer, c in zip(params["layers"], caches):
            h, c2 = jllama.block_forward(
                layer, h, cfg, None, jnp.asarray([t]), kv_cache=c)
            new_caches.append(c2)
        caches = new_caches
        outs.append(jllama.head(params, h, cfg)[:, -1])
    decode_logits = jnp.stack(outs, axis=1)  # predictions at positions 7..11
    np.testing.assert_allclose(
        np.asarray(decode_logits), np.asarray(full[:, 7:12]), rtol=2e-4, atol=2e-4
    )
