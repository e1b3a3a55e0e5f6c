"""Tensor-parallel packed-weight forward (shard_map + explicit psum)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omniquant_tpu.models import LLAMA
from omniquant_tpu.models import llama as jllama
from omniquant_tpu.parallel import make_mesh
from omniquant_tpu.parallel.tp_forward import make_tp_llama_forward
from omniquant_tpu.quant import QuantConfig
from omniquant_tpu.serving.export import pack_model


@pytest.fixture(scope="module")
def packed_llama():
    # dims chosen so packed rows split on 64-row tile boundaries at tp=4
    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    wcfg = QuantConfig(n_bits=4, group_size=32)
    fq = dict(params)
    fq["layers"] = [
        LLAMA.effective_block_weights(b, wcfg, None, None, cfg)
        for b in params["layers"]
    ]
    # tile_k=64 so packed rows split on tile boundaries at tp in {2, 4}
    packed = pack_model(LLAMA, fq, wcfg, tile_k=64)
    return cfg, fq, packed


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_packed_forward_matches_single_device(packed_llama, tp):
    cfg, fq, packed = packed_llama
    mesh = make_mesh(dp=1, tp=tp)
    make_forward, shard_block = make_tp_llama_forward(mesh, cfg)
    layers = [shard_block(b) for b in packed["layers"]]
    fwd = make_forward(layers)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, cfg.hidden_size)), jnp.float32)

    # single-device reference through the fake-quant dense path
    ref = x
    for b in fq["layers"]:
        ref, _ = LLAMA.block_forward(b, ref, cfg)

    got = fwd(layers, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_tp_dense_forward_matches(packed_llama):
    cfg, fq, _ = packed_llama
    mesh = make_mesh(dp=1, tp=4)
    make_forward, shard_block = make_tp_llama_forward(mesh, cfg)
    layers = [shard_block(b) for b in fq["layers"]]
    fwd = make_forward(layers)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)), jnp.float32)
    ref = x
    for b in fq["layers"]:
        ref, _ = LLAMA.block_forward(b, ref, cfg)
    got = fwd(layers, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
