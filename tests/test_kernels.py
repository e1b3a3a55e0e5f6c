"""Pallas quant-matmul kernel validation (interpret mode on CPU).

Each kernel is validated bit-for-bit on the int domain against the jnp
reference path (SURVEY.md §7 stage 6 requirement).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omniquant_tpu.kernels.quant_matmul import (
    quant_matmul,
    quant_matmul_reference,
)
from omniquant_tpu.quant import QuantConfig, pack_weight


def make_packed(bits, group_size, out_f, in_f, seed=0, bias=False):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((out_f, in_f)).astype(np.float32))
    b = (jnp.asarray(rng.standard_normal(out_f).astype(np.float32))
         if bias else None)
    cfg = QuantConfig(n_bits=bits, group_size=group_size)
    return pack_weight(w, cfg, bias=b)


@pytest.mark.parametrize("bits,group_size", [
    (4, 128), (4, None), (2, 128), (3, 128), (6, 128), (6, None),
    (8, 128), (3, None),
])
def test_kernel_matches_reference(bits, group_size):
    pw = make_packed(bits, group_size, out_f=256, in_f=512, seed=bits)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    ref = quant_matmul_reference(x, pw)
    got = quant_matmul(x, pw, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_kernel_3bit_nondivisible_k():
    """K=520: 3-bit words hold 10 vals, 52 words; unit lcm(80,128)=640 forces
    word+x padding paths."""
    pw = make_packed(3, 128 if False else None, out_f=128, in_f=520, seed=7)
    # use group_size=None first, then a grouped case with deficiency-free K
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 520)).astype(np.float32))
    ref = quant_matmul_reference(x, pw)
    got = quant_matmul(x, pw, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_kernel_bias_and_3d_input():
    pw = make_packed(4, 64, out_f=128, in_f=256, bias=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 3, 256)).astype(np.float32))
    ref = quant_matmul_reference(x, pw)
    got = quant_matmul(x, pw, interpret=True)
    assert got.shape == (2, 3, 128)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_kernel_bf16_input():
    """bf16 inputs contract in bf16 with f32 accumulation (serving fast
    path): compare against a reference mirroring the kernel's post-matmul
    group-scaling factorization (x_g @ codes_g) * sc_g + xsum_g @ off_g
    (slabs stay f32 in the coarse path — see _qmm_call slab_dtype)."""
    from omniquant_tpu.quant.packing import unpack_codes

    pw = make_packed(4, 128, out_f=256, in_f=512)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.bfloat16)
    got = quant_matmul(x, pw, interpret=True)
    assert got.dtype == jnp.bfloat16

    codes = np.asarray(unpack_codes(
        pw.qweight, pw.bits, pw.in_features, pw.group_size),
        dtype=np.float32)  # (in, out); codes <= 15 are exact in bf16
    gs = pw.group_size
    n_g = pw.in_features // gs
    sc = np.asarray(pw.scales.T, np.float32)  # (G, out)
    off = np.asarray((-pw.zeros * pw.scales).T, np.float32)
    xf = np.asarray(x, np.float32)
    acc = np.zeros((x.shape[0], pw.out_features), np.float32)
    for g in range(n_g):
        xg = xf[:, g * gs : (g + 1) * gs]
        acc += (xg @ codes[g * gs : (g + 1) * gs]) * sc[g][None, :]
        acc += xg.sum(-1, keepdims=True) * off[g][None, :]
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), acc, rtol=2e-2, atol=2e-1)


def test_kernel_bf16_vs_f32_dequant_oracle():
    """bf16 coarse-group path (post-matmul group scaling) against the TRUE
    f32-dequant reference — bounds the total precision loss of the bf16
    factorization rather than mirroring it (the f32 group-sum accumulation
    keeps the rank-1 zero-offset term exact)."""
    pw = make_packed(4, 128, out_f=256, in_f=1024, seed=11)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((4, 1024)), jnp.bfloat16)
    got = quant_matmul(x, pw, interpret=True)
    ref = quant_matmul_reference(x.astype(jnp.float32), pw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref),
        rtol=2e-2, atol=np.abs(np.asarray(ref)).max() * 2e-2)


def test_kernel_fallback_odd_n():
    """out_features not a multiple of 128 falls back to the dense path."""
    pw = make_packed(4, 64, out_f=100, in_f=256)
    x = jnp.ones((2, 256), jnp.float32)
    got = quant_matmul(x, pw)
    ref = quant_matmul_reference(x, pw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


# ---------------------------------------------------------------------------
# fused int8-KV decode attention
# ---------------------------------------------------------------------------

def test_decode_attention_int8_matches_oracle():
    from omniquant_tpu.kernels.decode_attention import (
        decode_attention_int8, decode_attention_int8_reference)

    rng = np.random.default_rng(0)
    for (B, n_kv, n_rep, kv_len, hd, max_len, lengths) in [
            (4, 4, 1, 64, 128, 64, None),     # MHA, window == cache
            (2, 2, 4, 128, 128, 512, None),   # GQA, window < cache
            (3, 8, 2, 256, 128, 256, None),
            # multi-chunk online-softmax path (grid dim 3 > 1, the engine's
            # default for 2048-token int8 windows): lengths straddling the
            # 1024 chunk boundary exercise the (m, l, acc) recurrence and
            # the c*chunk <= length skip logic
            (4, 4, 2, 2048, 128, 2048, [1023, 1024, 2000, 37]),
            # non-power-of-two window: chunk must divide kv_len (1536 ->
            # chunk 768, NOT min(1024, kv_len) which would drop the tail)
            (2, 4, 1, 1536, 128, 1536, [1400, 600])]:
        n_heads = n_kv * n_rep
        q = jnp.asarray(rng.standard_normal((B, n_heads, hd)), jnp.bfloat16)
        kc = jnp.asarray(
            rng.integers(-127, 128, (B, n_kv, max_len, hd)), jnp.int8)
        vc = jnp.asarray(
            rng.integers(-127, 128, (B, n_kv, max_len, hd)), jnp.int8)
        ks = jnp.asarray(
            rng.uniform(0.001, 0.02, (B, n_kv, max_len)), jnp.float32)
        vs = jnp.asarray(
            rng.uniform(0.001, 0.02, (B, n_kv, max_len)), jnp.float32)
        if lengths is None:
            lengths = rng.integers(0, kv_len - 1, (B,))
        lengths = jnp.asarray(lengths, jnp.int32)
        ss = 1.0 / np.sqrt(hd)
        got = decode_attention_int8(
            q, kc, ks, vc, vs, lengths, kv_len, ss, out_dtype=jnp.float32)
        want = decode_attention_int8_reference(
            q, kc, ks, vc, vs, lengths, kv_len, ss, out_dtype=jnp.float32)
        rel = float(jnp.max(jnp.abs(got - want))
                    / jnp.max(jnp.abs(want)))
        assert rel < 1e-3, (B, n_kv, n_rep, kv_len, rel)


def test_engine_attn_kernel_matches_xla_path():
    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.serving.engine import LlamaEngine

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    prompt = [5, 17, 99, 3]
    eng_k = LlamaEngine(params, cfg, max_batch=2, max_len=64,
                        dtype=jnp.float32, kv_dtype="int8", attn_kernel=True)
    eng_x = LlamaEngine(params, cfg, max_batch=2, max_len=64,
                        dtype=jnp.float32, kv_dtype="int8", attn_kernel=False)
    got_k = eng_k.generate(prompt, max_new_tokens=8)
    got_x = eng_x.generate(prompt, max_new_tokens=8)
    assert got_k == got_x, (got_k, got_x)


# ---------------------------------------------------------------------------
# integer-activation compute path (W4A4 / W6A6)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("wbits,abits,gs", [
    (4, 4, 128), (6, 6, 128), (4, 4, None), (3, 4, 128), (2, 6, 64),
])
def test_quant_matmul_int_matches_fake_quant_oracle(wbits, abits, gs):
    """The int8-MXU path must equal fake_quant_act(x) @ dequant(w) computed
    in f32 — the same quantized algebra, integer-exact."""
    from omniquant_tpu.kernels.quant_matmul import quant_matmul_int
    from omniquant_tpu.quant.packing import dequantize_packed
    from omniquant_tpu.quant.quantizer import fake_quant_act

    pw = make_packed(wbits, gs, out_f=256, in_f=512, seed=wbits * 10 + abits)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((8, 512)).astype(np.float32))
    acfg = QuantConfig(n_bits=abits, symmetric=False)
    got = quant_matmul_int(x, pw, acfg, interpret=True)

    xdq = fake_quant_act(x, acfg)
    w = dequantize_packed(pw, dtype=jnp.float32)
    want = jnp.einsum("mk,kn->mn", xdq, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-3)


def test_quant_matmul_int_bias_3d_and_fallbacks():
    from omniquant_tpu.kernels.quant_matmul import (
        quant_matmul, quant_matmul_int)
    from omniquant_tpu.quant.packing import dequantize_packed
    from omniquant_tpu.quant.quantizer import fake_quant_act

    pw = make_packed(4, 64, out_f=128, in_f=256, bias=True, seed=21)
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((2, 3, 256)).astype(np.float32))
    acfg = QuantConfig(n_bits=4, symmetric=False)
    got = quant_matmul_int(x, pw, acfg, interpret=True)
    want = jnp.einsum(
        "bmk,kn->bmn", fake_quant_act(x, acfg),
        dequantize_packed(pw, dtype=jnp.float32)) + pw.bias
    assert got.shape == (2, 3, 128)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-3)

    # a8 asym exceeds the centered-int8 range: must fall back to fake-quant
    a8 = QuantConfig(n_bits=8, symmetric=False)
    fb = quant_matmul_int(x, pw, a8, interpret=True)
    ref = quant_matmul(fake_quant_act(x, a8), pw, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(ref), rtol=1e-5, atol=1e-3)


def test_engine_w4a4_int_path_matches_eval(tiny_packed_llama=None):
    """Packed W4A4 serving through the int path generates the same tokens
    as the fake-quant eval forward over the dequantized weights."""
    from omniquant_tpu.models import LLAMA
    from omniquant_tpu.models import llama as jllama
    from omniquant_tpu.models.common import ActQuantSpec
    from omniquant_tpu.quant import QuantConfig as QC
    from omniquant_tpu.serving.engine import LlamaEngine
    from omniquant_tpu.serving.export import pack_model

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    wcfg = QC(n_bits=4, group_size=32)
    fq = dict(params)
    fq["layers"] = [
        LLAMA.effective_block_weights(b, wcfg, None, None, cfg)
        for b in params["layers"]
    ]
    packed = pack_model(LLAMA, fq, wcfg, tile_k=64)
    spec = ActQuantSpec.from_bits(4)
    eng = LlamaEngine(packed, cfg, max_batch=2, max_len=64,
                      dtype=jnp.float32, spec=spec)
    prompt = [5, 17, 99, 3]
    got = eng.generate(prompt, max_new_tokens=8)

    toks = jnp.asarray(np.asarray(prompt, np.int32)[None])
    ref = []
    for _ in range(8):
        logits = jllama.forward(fq, toks, cfg, spec)
        nxt = int(jnp.argmax(logits[0, -1]))
        ref.append(nxt)
        toks = jnp.concatenate([toks, jnp.asarray([[nxt]])], axis=1)
    assert got == ref, (got, ref)


@pytest.mark.parametrize("bits,group_size", [
    (4, 128), (2, 128), (3, 128), (4, None), (2, None), (3, None),
])
def test_kernel_pairs_layout_matches_reference(bits, group_size):
    """The pairs-layout fast path (bf16 mantissa-injection unpack + folded
    scale slabs) == the dequant reference. Tolerance: the w' = 1 + c/2^b
    fold subtracts the rank-1 constant part after the f32 dot, so ~1 bit of
    f32 cancellation roundoff is expected (measured <= 2e-4 absolute on
    O(50) outputs)."""
    pw = make_packed_layout(bits, group_size, out_f=256, in_f=512,
                            seed=bits, layout="pairs")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    ref = quant_matmul_reference(x, pw)
    got = quant_matmul(x, pw, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-3)


def test_kernel_pairs_bf16_and_int_path():
    from omniquant_tpu.kernels.quant_matmul import quant_matmul_int
    from omniquant_tpu.quant.packing import dequantize_packed
    from omniquant_tpu.quant.quantizer import fake_quant_act

    pw = make_packed_layout(4, 128, out_f=256, in_f=512, seed=13,
                            layout="pairs")
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.bfloat16)
    got = quant_matmul(x, pw, interpret=True)
    ref = quant_matmul_reference(x.astype(jnp.float32), pw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref),
        rtol=2e-2, atol=np.abs(np.asarray(ref)).max() * 2e-2)

    xf = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    acfg = QuantConfig(n_bits=4, symmetric=False)
    got_i = quant_matmul_int(xf, pw, acfg, interpret=True)
    want_i = jnp.einsum("mk,kn->mn", fake_quant_act(xf, acfg),
                        dequantize_packed(pw, dtype=jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got_i), np.asarray(want_i), rtol=1e-5, atol=1e-3)


def make_packed_layout(bits, group_size, out_f, in_f, seed=0, bias=False,
                       layout="planar"):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((out_f, in_f)).astype(np.float32))
    b = (jnp.asarray(rng.standard_normal(out_f).astype(np.float32))
         if bias else None)
    cfg = QuantConfig(n_bits=bits, group_size=group_size)
    return pack_weight(w, cfg, bias=b, layout=layout)


@pytest.mark.parametrize("layout", ["planar", "pairs"])
def test_kernel_large_m(layout):
    """Prefill-sized m (multiple 256-row m-tiles) through the fused kernel
    matches the reference (a dequantize-once dense variant was measured
    slower on TPU — see quant_matmul's large-M note)."""
    pw = make_packed_layout(4, 128, out_f=256, in_f=512, seed=31,
                            layout=layout)
    rng = np.random.default_rng(32)
    x = jnp.asarray(rng.standard_normal((1100, 512)).astype(np.float32))
    got = quant_matmul(x, pw, interpret=True)
    ref = quant_matmul_reference(x, pw)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-3)


def test_kernel_large_m_dequant_once_route():
    """m>=4096 with bn<1024 (N not divisible by 1024 — the gate/up
    geometry) routes through dequantize-once + dense matmul (measured
    30-60% faster on v5e where the fused kernel is forced to small lane
    tiles; scripts/exp_prefill_tiles.py). The route is pure jnp, so
    interpret=False works even on CPU — which also proves the fused
    pallas path was NOT taken."""
    pw = make_packed_layout(4, 128, out_f=384, in_f=512, seed=41,
                            layout="pairs")
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((4096, 512)).astype(np.float32))
    got = quant_matmul(x, pw, interpret=False)  # dense route, no pallas
    ref = quant_matmul_reference(x, pw)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("bits,gs,layout", [
    (4, 32, "planar"), (4, 32, "pairs"), (3, 32, "pairs"),
    (6, 32, "planar"), (4, None, "planar")])
def test_int_dense_large_m_matches_reference(bits, gs, layout):
    """The large-m integer route (unpack-once + dense int8-MXU consume,
    m >= _INT_DENSE_MIN_M) must evaluate the same quantized algebra as
    the fake-quant oracle, for every wire layout and both grouped and
    per-channel weights."""
    from omniquant_tpu.kernels.quant_matmul import (
        _INT_DENSE_MIN_M, _quant_matmul_int_dense, quant_matmul_int,
        quant_matmul_reference)
    from omniquant_tpu.models.common import ActQuantSpec
    from omniquant_tpu.quant.quantizer import fake_quant_act

    rng = np.random.default_rng(50 + bits)
    acfg = ActQuantSpec.from_bits(4).act
    out_f, in_f = 128, 160
    w = jnp.asarray(rng.standard_normal((out_f, in_f)).astype(np.float32)
                    * 0.5)
    x = jnp.asarray(rng.standard_normal(
        (_INT_DENSE_MIN_M, in_f)).astype(np.float32))
    tk = (gs or 32) if layout == "planar" else None
    pw = pack_weight(w, QuantConfig(n_bits=bits, group_size=gs),
                     layout=layout, tile_k=tk)
    got = _quant_matmul_int_dense(x, pw, acfg, interpret=True)
    # the public entry routes large m to the dense path
    got2 = quant_matmul_int(x, pw, acfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))
    want = quant_matmul_reference(fake_quant_act(x, acfg), pw)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5,
        atol=2e-5 * float(jnp.max(jnp.abs(want))))


def test_int_small_m_pairs_routes_to_fake_quant_pairs_kernel():
    """Small-m pairs-layout weight+act quant == fake-quant + pairs kernel
    exactly (the decode route; eval-oracle semantics)."""
    from omniquant_tpu.kernels.quant_matmul import (
        quant_matmul, quant_matmul_int)
    from omniquant_tpu.models.common import ActQuantSpec
    from omniquant_tpu.quant.quantizer import fake_quant_act

    rng = np.random.default_rng(77)
    acfg = ActQuantSpec.from_bits(4).act
    w = jnp.asarray(rng.standard_normal((128, 160)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((8, 160)).astype(np.float32))
    pw = pack_weight(w, QuantConfig(n_bits=4, group_size=32),
                     layout="pairs")
    got = quant_matmul_int(x, pw, acfg)
    want = quant_matmul(fake_quant_act(x, acfg), pw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
