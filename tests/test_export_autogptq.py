"""AutoGPTQ-format export: round-trip equality with our packed dequant
(the interop inverse of utils/import_reference.py — reference real-quant
path quantize/omniquant.py:255-277)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omniquant_tpu.models import LLAMA
from omniquant_tpu.models import llama as jllama
from omniquant_tpu.quant import QuantConfig, dequantize_packed, pack_weight
from omniquant_tpu.serving.export import pack_model
from omniquant_tpu.serving.export_autogptq import (
    _pack_bits, _unpack_bits, export_autogptq_state_dict,
    pack_autogptq_linear, save_autogptq_checkpoint, unpack_autogptq)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_bitpack_roundtrip_including_straddle(bits):
    """3-bit values straddle int32 word boundaries in the AutoGPTQ layout;
    pack->unpack must be exact for every width."""
    rng = np.random.default_rng(bits)
    n = 96  # *bits divisible by 32 for all widths
    vals = rng.integers(0, 2**bits, size=(n, 8)).astype(np.uint32)
    words = _pack_bits(vals, bits)
    assert words.dtype == np.int32
    assert words.shape == (n * bits // 32, 8)
    back = _unpack_bits(words, bits, n)
    np.testing.assert_array_equal(back, vals)


@pytest.mark.parametrize("bits,gs", [(2, 32), (3, 32), (4, 32), (4, None),
                                     (3, None)])
@pytest.mark.parametrize("layout", ["planar", "pairs"])
def test_autogptq_linear_roundtrip(bits, gs, layout):
    """our PackedWeight -> AutoGPTQ tensors -> AutoGPTQ dequant oracle
    == our dequantize_packed, for both TPU wire layouts."""
    if layout == "pairs" and bits == 8:
        pytest.skip("pairs supports bits 2/3/4")
    rng = np.random.default_rng(17 + bits)
    out_f, in_f = 64, 96
    w = jnp.asarray(rng.standard_normal((out_f, in_f)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(out_f).astype(np.float32))
    pw = pack_weight(w, QuantConfig(n_bits=bits, group_size=gs), bias=b,
                     layout=layout)
    tensors = pack_autogptq_linear(pw)
    deq = unpack_autogptq(tensors, bits)  # (in, out) f32
    ours = np.asarray(dequantize_packed(pw, dtype=jnp.float32))[:in_f]
    # AutoGPTQ scales are f16 on the wire; compare at f16 scale precision
    np.testing.assert_allclose(deq, ours, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        tensors["bias"].astype(np.float32), np.asarray(b), rtol=2e-3,
        atol=2e-3)


def test_autogptq_zero_point_zero_survives_default_convention():
    """The upstream zeros-1 wire format corrupts zero points of 0 (the
    bug the reference's pinned AutoGPTQ fork fixes); our default
    convention (zeros_offset=0) must round-trip zp=0 exactly."""
    rng = np.random.default_rng(3)
    w = np.abs(rng.standard_normal((32, 64)).astype(np.float32))
    # all-positive weights with min==0 per group force zero_point 0 on the
    # asymmetric grid
    w[:, ::8] = 0.0
    pw = pack_weight(jnp.asarray(w), QuantConfig(n_bits=4, group_size=32))
    assert float(np.min(np.asarray(pw.zeros))) == 0.0
    tensors = pack_autogptq_linear(pw)
    deq = unpack_autogptq(tensors, 4)
    ours = np.asarray(dequantize_packed(pw, dtype=jnp.float32))[:64]
    np.testing.assert_allclose(deq, ours, rtol=2e-3, atol=2e-3)


def test_autogptq_model_export_and_torch_load(tmp_path):
    """Whole-model export under HF llama module names, loadable by torch;
    every linear's AutoGPTQ dequant matches the packed model it came
    from."""
    import torch

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    wcfg = QuantConfig(n_bits=4, group_size=32)
    fq = dict(params)
    fq["layers"] = [
        LLAMA.effective_block_weights(b, wcfg, None, None, cfg)
        for b in params["layers"]
    ]
    packed = pack_model(LLAMA, fq, wcfg, tile_k=32)
    path = str(tmp_path / "model_autogptq.pt")
    save_autogptq_checkpoint("llama", packed, path)
    sd = torch.load(path, weights_only=True)
    assert "model.layers.0.self_attn.q_proj.qweight" in sd
    assert "model.layers.1.mlp.down_proj.scales" in sd
    assert "model.embed_tokens.weight" in sd
    assert "model.norm.weight" in sd
    qt = {k.split("q_proj.")[-1]: sd[
        "model.layers.0.self_attn.q_proj." + k.split("q_proj.")[-1]].numpy()
        for k in sd if "layers.0.self_attn.q_proj" in k}
    deq = unpack_autogptq(qt, 4)
    ours = np.asarray(dequantize_packed(
        packed["layers"][0]["q_proj"], dtype=jnp.float32))[:64]
    np.testing.assert_allclose(deq, ours, rtol=2e-3, atol=2e-3)


def test_autogptq_upstream_offset_convention():
    """zeros_offset=-1 (upstream AutoGPTQ wire format) round-trips through
    the matching unpacker when no group's zero point is 0."""
    rng = np.random.default_rng(9)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    pw = pack_weight(jnp.asarray(w), QuantConfig(n_bits=4, group_size=32))
    assert float(np.min(np.asarray(pw.zeros))) > 0.0
    tensors = pack_autogptq_linear(pw, zeros_offset=-1)
    deq = unpack_autogptq(tensors, 4, zeros_offset=-1)
    ours = np.asarray(dequantize_packed(pw, dtype=jnp.float32))[:64]
    np.testing.assert_allclose(deq, ours, rtol=2e-3, atol=2e-3)
