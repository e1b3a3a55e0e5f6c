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


# ---------------------------------------------------------------------------
# padded intermediates + OPT / falcon families (round-2: VERDICT item 2)
# ---------------------------------------------------------------------------

def test_tp_packed_padded_intermediate():
    """LLaMA-7B-geometry analog: intermediate NOT a multiple of tp*tile
    (288 with tile 256, tp 2 -> padded to 512) must run and match."""
    from omniquant_tpu.parallel.tp_forward import make_tp_forward

    cfg = jllama.LlamaConfig(
        vocab_size=64, hidden_size=256, intermediate_size=288,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    params = jllama.init_params(jax.random.PRNGKey(2), cfg)
    wcfg = QuantConfig(n_bits=4, group_size=32)
    fq = dict(params)
    fq["layers"] = [
        LLAMA.effective_block_weights(b, wcfg, None, None, cfg)
        for b in params["layers"]
    ]
    packed = pack_model(LLAMA, fq, wcfg)
    gate = packed["layers"][0]["gate_proj"]
    assert gate.out_features % (2 * packed["layers"][0]["down_proj"].tile_k) \
        != 0  # the case that used to raise NotImplementedError

    mesh = make_mesh(dp=1, tp=2)
    make_forward, shard_block = make_tp_forward("llama", mesh, cfg)
    layers = [shard_block(b) for b in packed["layers"]]
    # padded shapes: out lanes / packed rows round to tp*tile units
    assert layers[0]["gate_proj"].out_features % (2 * 256) == 0
    assert layers[0]["down_proj"].in_features == \
        layers[0]["gate_proj"].out_features
    fwd = make_forward(layers)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)), jnp.float32)
    ref = x
    for b in fq["layers"]:
        ref, _ = LLAMA.block_forward(b, ref, cfg)
    got = fwd(layers, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_packed_opt(tp):
    """OPT packed TP (biases everywhere; col-parallel bias added once)."""
    from omniquant_tpu.models import OPT
    from omniquant_tpu.models import opt as jopt
    from omniquant_tpu.parallel.tp_forward import make_tp_forward

    cfg = jopt.OPTConfig(
        vocab_size=64, hidden_size=256, ffn_dim=320,  # 320 needs padding
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64,
    )
    params = jopt.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    for b in params["layers"]:
        for n in jopt.LINEAR_NAMES:
            b[n]["bias"] = jnp.asarray(
                rng.standard_normal(b[n]["bias"].shape) * 0.1, jnp.float32)
    wcfg = QuantConfig(n_bits=4, group_size=32)
    fq = dict(params)
    fq["layers"] = [
        OPT.effective_block_weights(b, wcfg, None, None, cfg)
        for b in params["layers"]
    ]
    packed = pack_model(OPT, fq, wcfg, tile_k=64)

    mesh = make_mesh(dp=1, tp=tp)
    make_forward, shard_block = make_tp_forward("opt", mesh, cfg)
    layers = [shard_block(b) for b in packed["layers"]]
    fwd = make_forward(layers)

    x = jnp.asarray(rng.standard_normal((2, 8, cfg.hidden_size)), jnp.float32)
    ref = x
    for b in fq["layers"]:
        ref, _ = OPT.block_forward(b, ref, cfg)
    got = fwd(layers, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("variant", ["new_decoder", "mqa", "classic"])
def test_tp_packed_falcon(variant):
    """Falcon packed TP across its three head-layout variants."""
    from omniquant_tpu.models import FALCON
    from omniquant_tpu.models import falcon as jfalcon
    from omniquant_tpu.parallel.tp_forward import make_tp_forward

    kw = dict(vocab_size=64, hidden_size=256, num_hidden_layers=1,
              num_attention_heads=4)
    if variant == "new_decoder":
        cfg = jfalcon.FalconConfig(
            **kw, num_kv_heads=2, multi_query=False,
            new_decoder_architecture=True, parallel_attn=True)
    elif variant == "mqa":
        cfg = jfalcon.FalconConfig(
            **kw, multi_query=True, new_decoder_architecture=False,
            parallel_attn=True)
    else:
        cfg = jfalcon.FalconConfig(
            **kw, multi_query=False, new_decoder_architecture=False,
            parallel_attn=False, alibi=True)
    params = jfalcon.init_params(jax.random.PRNGKey(4), cfg)
    wcfg = QuantConfig(n_bits=4, group_size=32)
    fq = dict(params)
    fq["layers"] = [
        FALCON.effective_block_weights(b, wcfg, None, None, cfg)
        for b in params["layers"]
    ]
    packed = pack_model(FALCON, fq, wcfg, tile_k=64)

    mesh = make_mesh(dp=1, tp=2)
    make_forward, shard_block = make_tp_forward("falcon", mesh, cfg)
    layers = [shard_block(b) for b in packed["layers"]]
    fwd = make_forward(layers)

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)), jnp.float32)
    ref = x
    for b in fq["layers"]:
        ref, _ = FALCON.block_forward(b, ref, cfg)
    got = fwd(layers, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("chunks", [2, 4])
def test_tp_overlap_chunked_psum_matches_unchunked(packed_llama, chunks):
    """overlap_chunks splits each column-parallel site into independent
    (matmul -> psum) pairs (all-reduce/compute overlap on real meshes);
    the algebra must be exactly the unchunked forward."""
    from omniquant_tpu.parallel.tp_forward import make_tp_forward

    cfg, fq, packed = packed_llama
    mesh = make_mesh(dp=1, tp=2)
    make_fwd1, shard_block = make_tp_forward("llama", mesh, cfg)
    make_fwdC, shard_blockC = make_tp_forward(
        "llama", mesh, cfg, overlap_chunks=chunks)
    layers = [shard_block(b) for b in packed["layers"]]
    fwd1 = make_fwd1(layers)
    fwdC = make_fwdC(layers)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, cfg.hidden_size)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fwdC(layers, x)), np.asarray(fwd1(layers, x)),
        rtol=1e-6, atol=1e-6)


def test_effective_overlap_chunks_geometry():
    from omniquant_tpu.parallel.tp_forward import effective_overlap_chunks

    assert effective_overlap_chunks(4096, 4) == 4
    assert effective_overlap_chunks(256, 4) == 2   # 4 would break 128 lanes
    assert effective_overlap_chunks(128, 4) == 1
    assert effective_overlap_chunks(4096, 1) == 1


def test_tp_packed_w3_pairs_layout():
    """Column-parallel sharding of the contiguous pairs-3 layout (10
    codes/word, tile 640): packed rows must split on whole-tile boundaries
    and the TP forward must equal the dense fake-quant trunk."""
    from omniquant_tpu.parallel.tp_forward import make_tp_forward

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=1280, intermediate_size=1280,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=32,
    )
    params = jllama.init_params(jax.random.PRNGKey(2), cfg)
    wcfg = QuantConfig(n_bits=3, group_size=128)
    fq = dict(params)
    fq["layers"] = [
        LLAMA.effective_block_weights(b, wcfg, None, None, cfg)
        for b in params["layers"]
    ]
    packed = pack_model(LLAMA, fq, wcfg)
    pw = packed["layers"][0]["down_proj"]
    assert (pw.layout, pw.tile_k) == ("pairs", 640)

    mesh = make_mesh(dp=1, tp=2)
    make_fwd, shard_block = make_tp_forward("llama", mesh, cfg)
    layers = [shard_block(b) for b in packed["layers"]]
    fwd = make_fwd(layers)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 8, cfg.hidden_size)),
                    jnp.float32)
    ref = x
    for b in fq["layers"]:
        ref, _ = LLAMA.block_forward(b, ref, cfg)
    np.testing.assert_allclose(
        np.asarray(fwd(layers, x)), np.asarray(ref), rtol=2e-4, atol=2e-4)
