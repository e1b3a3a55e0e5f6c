"""Numerical parity against the ACTUAL reference implementation.

/root/reference (OmniQuant, torch) is mounted and importable. These tests run
its code SIDE-BY-SIDE with omniquant_tpu on identical inputs and assert
numerical agreement — the strongest offline evidence that a calibration run
here reproduces the reference's published numbers (the real-data ppl targets
in BASELINE.md are unreachable without network access).

Four levels (VERDICT round-1 item 1):
  (a) quantizer: reference quantize/quantizer.py UniformAffineQuantizer vs
      omniquant_tpu.quant.quantizer across bits x grouping x symmetry x LWC,
      values, scale/zero-point, and LWC gradients
  (b) LET algebra: reference models/transformation.py inplace folds vs
      omniquant_tpu.quant.transform
  (c) block level: reference QuantOPTDecoderLayer / QuantLlamaDecoderLayer
      (act-quant on, LET smoothed, weights fake-quantized) vs our
      block_forward(effective_block_weights(...))
  (d) calibration loop: N AdamW steps of the reference inner loop
      (quantize/omniquant.py:157-250, reproduced faithfully here since
      importing omniquant.py pulls in auto_gptq) vs calibrate() on identical
      data — per-step losses, learned params, and folded weights

All torch runs are f32 (the reference's own --deactive_amp regime,
main.py:241-242) to match our f32 calibration.
"""
import sys
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    torch.manual_seed(0)
    from quantize.quantizer import UniformAffineQuantizer
    from models import transformation as T
    from models.int_opt_layer import QuantOPTDecoderLayer
    from models.int_llama_layer import QuantLlamaDecoderLayer

    return SimpleNamespace(
        torch=torch,
        UAQ=UniformAffineQuantizer,
        T=T,
        QuantOPTDecoderLayer=QuantOPTDecoderLayer,
        QuantLlamaDecoderLayer=QuantLlamaDecoderLayer,
    )


# ---------------------------------------------------------------------------
# (a) quantizer parity
# ---------------------------------------------------------------------------

WEIGHT_CASES = [
    # (n_bits, group_size, symmetric, lwc, in_features)
    (2, None, False, False, 64),
    (2, None, False, True, 64),
    (3, None, False, True, 64),
    (4, None, False, True, 64),
    (4, None, True, True, 64),
    (2, 16, False, True, 64),
    (3, 16, False, True, 64),
    (4, 16, False, True, 64),
    (4, 32, True, True, 64),
    (4, 16, True, True, 56),  # deficiency padding (56 % 16 != 0, symmetric)
    (8, None, False, False, 64),
    (16, None, False, False, 64),  # identity path
]


@pytest.mark.parametrize("n_bits,group_size,symmetric,lwc,in_f", WEIGHT_CASES)
def test_weight_quantizer_matches_reference(ref, n_bits, group_size,
                                            symmetric, lwc, in_f):
    from omniquant_tpu.quant.quantizer import (
        QuantConfig, fake_quant_weight, weight_scale_zp)

    torch = ref.torch
    out_f = 8
    rng = np.random.default_rng(n_bits * 100 + (group_size or 0))
    w = rng.standard_normal((out_f, in_f)).astype(np.float32)

    rq = ref.UAQ(n_bits=n_bits, symmetric=symmetric, per_channel_axes=[0],
                 dynamic_method="per_channel", group_size=group_size,
                 shape=(out_f, in_f), lwc=lwc)
    cfg = QuantConfig(n_bits=n_bits, symmetric=symmetric,
                      group_size=group_size, lwc=lwc)
    lwc_params = None
    if lwc:
        # randomize the clipping factors (init is 4.0 on both sides; random
        # values exercise the sigmoid path properly)
        ngroups = rq.upbound_factor.shape[0]
        up = rng.standard_normal((ngroups, 1)).astype(np.float32) + 4.0
        lo = rng.standard_normal((ngroups, 1)).astype(np.float32) + 4.0
        with torch.no_grad():
            rq.upbound_factor.copy_(torch.from_numpy(up))
            rq.lowbound_factor.copy_(torch.from_numpy(lo))
        lwc_params = {"upbound_factor": jnp.asarray(up),
                      "lowbound_factor": jnp.asarray(lo)}

    with torch.no_grad():
        ref_out = rq(torch.from_numpy(w)).numpy()
    got = np.asarray(fake_quant_weight(jnp.asarray(w), cfg, lwc_params))
    np.testing.assert_allclose(got, ref_out, rtol=1e-6, atol=1e-6)

    if n_bits < 16:
        # scale / round_zero_point parity (export path)
        scale, rzp = weight_scale_zp(jnp.asarray(w), cfg, lwc_params)
        np.testing.assert_allclose(
            np.asarray(scale), rq.scale.detach().numpy(), rtol=1e-6, atol=0)
        np.testing.assert_allclose(
            np.asarray(rzp), rq.round_zero_point.detach().numpy(), atol=0)


def test_lwc_gradients_match_reference(ref):
    """d(sum fake_quant(w)) / d(lwc factors): the STE path the calibration
    loop trains through."""
    from omniquant_tpu.quant.quantizer import QuantConfig, fake_quant_weight

    torch = ref.torch
    rng = np.random.default_rng(7)
    w = rng.standard_normal((8, 64)).astype(np.float32)
    for symmetric in (False, True):
        rq = ref.UAQ(n_bits=4, symmetric=symmetric, per_channel_axes=[0],
                     dynamic_method="per_channel", group_size=16,
                     shape=(8, 64), lwc=True)
        up = (rng.standard_normal(rq.upbound_factor.shape) + 4).astype(np.float32)
        lo = (rng.standard_normal(rq.lowbound_factor.shape) + 4).astype(np.float32)
        with torch.no_grad():
            rq.upbound_factor.copy_(torch.from_numpy(up))
            rq.lowbound_factor.copy_(torch.from_numpy(lo))
        out = rq(torch.from_numpy(w))
        # weighted sum so gradients aren't uniform
        wvec = torch.from_numpy(
            rng.standard_normal(out.shape).astype(np.float32))
        (out * wvec).sum().backward()

        cfg = QuantConfig(n_bits=4, symmetric=symmetric, group_size=16, lwc=True)

        def f(lp):
            return jnp.sum(
                fake_quant_weight(jnp.asarray(w), cfg, lp) * jnp.asarray(
                    wvec.numpy()))

        g = jax.grad(f)({"upbound_factor": jnp.asarray(up),
                         "lowbound_factor": jnp.asarray(lo)})
        np.testing.assert_allclose(
            np.asarray(g["upbound_factor"]),
            rq.upbound_factor.grad.numpy(), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g["lowbound_factor"]),
            rq.lowbound_factor.grad.numpy(), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("n_bits", [4, 6, 8])
def test_act_quantizer_matches_reference(ref, n_bits):
    """Per-token dynamic activation quantization (the a/q/k/v sites)."""
    from omniquant_tpu.quant.quantizer import QuantConfig, fake_quant_act

    torch = ref.torch
    rng = np.random.default_rng(n_bits)
    x = (rng.standard_normal((2, 9, 64)) * 3).astype(np.float32)
    rq = ref.UAQ(n_bits=n_bits, symmetric=False, per_channel_axes=[],
                 dynamic_method="per_token")
    with torch.no_grad():
        ref_out = rq(torch.from_numpy(x)).numpy()
    got = np.asarray(
        fake_quant_act(jnp.asarray(x), QuantConfig(n_bits=n_bits)))
    np.testing.assert_allclose(got, ref_out, rtol=1e-6, atol=1e-6)


def test_fix0to1_matches_reference(ref):
    """The softmax-probs metric (reachable when n_bits < 16)."""
    from omniquant_tpu.quant.quantizer import QuantConfig, fake_quant_act

    torch = ref.torch
    rng = np.random.default_rng(0)
    x = rng.random((4, 17)).astype(np.float32)
    rq = ref.UAQ(n_bits=8, metric="fix0to1", dynamic_method="per_token")
    with torch.no_grad():
        ref_out = rq(torch.from_numpy(x.copy())).numpy()  # mutates input
    got = np.asarray(
        fake_quant_act(jnp.asarray(x),
                       QuantConfig(n_bits=8, metric="fix0to1")))
    np.testing.assert_allclose(got, ref_out, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# (b) LET transformation parity
# ---------------------------------------------------------------------------

class _Shim:
    """Bare module-alike exposing .weight/.bias the reference transformation
    functions mutate; backed by torch nn.Module for register_buffer."""


def _module(torch, weight, bias=None):
    m = torch.nn.Module()
    m.weight = torch.nn.Parameter(torch.from_numpy(weight.copy()))
    if bias is not None:
        m.bias = torch.nn.Parameter(torch.from_numpy(bias.copy()))
    else:
        m.bias = None
    return m


def test_smooth_ln_fcs_matches_reference(ref):
    from omniquant_tpu.quant.transform import smooth_ln_fcs

    torch = ref.torch
    rng = np.random.default_rng(1)
    h, out = 16, 24
    scales = rng.uniform(0.2, 2.0, h).astype(np.float32)
    shifts = (rng.standard_normal(h) * 0.1).astype(np.float32)

    for ln_bias in (True, False):  # LayerNorm (OPT) / RMSNorm (llama) cases
        lnw = rng.standard_normal(h).astype(np.float32)
        lnb = (rng.standard_normal(h) * 0.1).astype(np.float32) if ln_bias else None
        fcw = rng.standard_normal((out, h)).astype(np.float32)
        fcb = (rng.standard_normal(out) * 0.1).astype(np.float32)

        ln = _module(torch, lnw[None], None)  # weight shape irrelevant to math
        ln.weight = torch.nn.Parameter(torch.from_numpy(lnw.copy()))
        if ln_bias:
            ln.bias = torch.nn.Parameter(torch.from_numpy(lnb.copy()))
        fc_b = _module(torch, fcw, fcb)
        fc_n = _module(torch, fcw, None)
        with torch.no_grad():
            ref.T.smooth_ln_fcs_inplace(
                ln, [fc_b, fc_n], torch.from_numpy(scales),
                torch.from_numpy(shifts))

        ours_ln, ours_fcs = smooth_ln_fcs(
            {"weight": jnp.asarray(lnw),
             **({"bias": jnp.asarray(lnb)} if ln_bias else {})},
            [{"weight": jnp.asarray(fcw), "bias": jnp.asarray(fcb)},
             {"weight": jnp.asarray(fcw), "bias": None}],
            jnp.asarray(scales), jnp.asarray(shifts))

        np.testing.assert_allclose(
            np.asarray(ours_ln["weight"]), ln.weight.detach().numpy(),
            rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ours_ln["bias"]), ln.bias.detach().numpy(), rtol=1e-6,
            atol=1e-7)
        for ours, theirs in zip(ours_fcs, (fc_b, fc_n)):
            np.testing.assert_allclose(
                np.asarray(ours["weight"]), theirs.weight.detach().numpy(),
                rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(ours["bias"]), theirs.bias.detach().numpy(),
                rtol=1e-5, atol=1e-6)


def test_smooth_fc_fc_and_q_k_match_reference(ref):
    from omniquant_tpu.quant.transform import smooth_fc_fc, smooth_q_k

    torch = ref.torch
    rng = np.random.default_rng(2)
    h = 16
    scales = rng.uniform(0.2, 2.0, h).astype(np.float32)
    shifts = (rng.standard_normal(h) * 0.1).astype(np.float32)

    v_w = rng.standard_normal((h, h)).astype(np.float32)
    v_b = (rng.standard_normal(h) * 0.1).astype(np.float32)
    o_w = rng.standard_normal((h, h)).astype(np.float32)
    o_b = (rng.standard_normal(h) * 0.1).astype(np.float32)
    v = _module(torch, v_w, v_b)
    o = _module(torch, o_w, o_b)
    with torch.no_grad():
        ref.T.smooth_fc_fc_inplace(v, o, torch.from_numpy(scales),
                                   torch.from_numpy(shifts))
    ours_v, ours_o = smooth_fc_fc(
        {"weight": jnp.asarray(v_w), "bias": jnp.asarray(v_b)},
        {"weight": jnp.asarray(o_w), "bias": jnp.asarray(o_b)},
        jnp.asarray(scales), jnp.asarray(shifts))
    for ours, theirs in ((ours_v, v), (ours_o, o)):
        np.testing.assert_allclose(
            np.asarray(ours["weight"]), theirs.weight.detach().numpy(),
            rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ours["bias"]), theirs.bias.detach().numpy(),
            rtol=1e-5, atol=1e-6)

    q_w = rng.standard_normal((h, h)).astype(np.float32)
    q_b = (rng.standard_normal(h) * 0.1).astype(np.float32)
    k_w = rng.standard_normal((h, h)).astype(np.float32)
    k_b = (rng.standard_normal(h) * 0.1).astype(np.float32)
    q = _module(torch, q_w, q_b)
    k = _module(torch, k_w, k_b)
    with torch.no_grad():
        ref.T.smooth_q_k_inplace(q, k, torch.from_numpy(scales))
    ours_q, ours_k = smooth_q_k(
        {"weight": jnp.asarray(q_w), "bias": jnp.asarray(q_b)},
        {"weight": jnp.asarray(k_w), "bias": jnp.asarray(k_b)},
        jnp.asarray(scales))
    for ours, theirs in ((ours_q, q), (ours_k, k)):
        np.testing.assert_allclose(
            np.asarray(ours["weight"]), theirs.weight.detach().numpy(),
            rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ours["bias"]), theirs.bias.detach().numpy(),
            rtol=1e-5, atol=1e-7)


def test_truncate_number_matches_reference(ref):
    from omniquant_tpu.quant.transform import truncate_number

    torch = ref.torch
    x = np.array([0.5, 0.005, -0.003, 0.0, -2.0, 1e-2], dtype=np.float32)
    ref_out = ref.T.truncate_number(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(truncate_number(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_out, atol=0)


# ---------------------------------------------------------------------------
# shared scaffolding for (c)/(d)
# ---------------------------------------------------------------------------

def _quant_args(wbits=4, abits=8, group_size=None, symmetric=False, lwc=True):
    """The reference's six quant-param dicts, exactly as main.py:268-303
    builds them."""
    return SimpleNamespace(
        weight_quant_params={
            "n_bits": wbits, "per_channel_axes": [0], "symmetric": symmetric,
            "dynamic_method": "per_channel", "group_size": group_size,
            "lwc": lwc,
        },
        act_quant_params={
            "n_bits": abits, "per_channel_axes": [], "symmetric": False,
            "dynamic_method": "per_token",
        },
        q_quant_params={
            "n_bits": abits, "per_channel_axes": [], "symmetric": False,
            "dynamic_method": "per_token",
        },
        k_quant_params={
            "n_bits": abits, "per_channel_axes": [], "symmetric": False,
            "dynamic_method": "per_token",
        },
        v_quant_params={
            "n_bits": abits, "per_channel_axes": [], "symmetric": False,
            "dynamic_method": "per_token",
        },
        p_quant_params={"n_bits": 16, "metric": "fix0to1"},
    )


def _torch_mask(torch, s, batch=1):
    """HF-style additive causal mask, identical on both sides."""
    from omniquant_tpu.models.common import causal_mask

    m = np.asarray(causal_mask(s, s, dtype=jnp.float32))
    return torch.from_numpy(np.broadcast_to(m, (batch, 1, s, s)).copy())


class _OldRotary:
    """The pre-4.3x HF rotary API the reference layer expects:
    forward(x, seq_len) -> (cos, sin) tables. transformers 4.57's
    apply_rotary_pos_emb then consumes them via unsqueeze(1) — returning
    (1, seq, head_dim) gathered tables reproduces the old positional
    semantics for full-sequence forwards (positions 0..seq-1)."""

    def __new__(cls, torch, head_dim, theta=10000.0):
        class Rot(torch.nn.Module):
            def __init__(self):
                super().__init__()
                inv = 1.0 / (theta ** (
                    torch.arange(0, head_dim, 2, dtype=torch.float32)
                    / head_dim))
                self.register_buffer("inv_freq", inv)

            def forward(self, x, seq_len):
                t = torch.arange(seq_len, dtype=torch.float32)
                freqs = torch.outer(t, self.inv_freq)
                emb = torch.cat([freqs, freqs], dim=-1)
                return emb.cos()[None], emb.sin()[None]

        return Rot()


def _detach_buffers(qlayer):
    """Replace Parameter-backed buffers with detached clones. The reference
    registers the ORIGINAL nn.Parameters as buffers (int_linear.py:26,
    omni_norm.py:15); in its real flow `.to(dev)` / fp16->f32 `.float()`
    materializes fresh plain tensors, but in an all-CPU-f32 test those are
    no-ops, so `fc2.temp_weight = fc2.weight` would re-register a Parameter
    and crash — and the in-place fold would mutate the HF model the JAX side
    converts from. This reproduces what `.to(dev)` does on GPU."""
    for m in qlayer.modules():
        for bname, buf in list(m._buffers.items()):
            if buf is not None:
                m._buffers[bname] = buf.detach().clone()


def _set_param(torch, module, name, value):
    module.register_parameter(
        name, torch.nn.Parameter(torch.from_numpy(np.asarray(value).copy())))


def _register_ref_let_params(torch, qlayer, pairs, act_scales, act_shifts,
                             alpha, is_llama, q_out):
    """Reference LET init, verbatim semantics (quantize/omniquant.py:182-197):
    scale = act^alpha / weight.max(dim=0).clamp(1e-5)^(1-alpha), clamp 1e-5;
    shift = act_shifts (non-llama) or zeros."""
    sys.path.insert(0, REF) if REF not in sys.path else None
    from quantize.int_linear import QuantLinear

    _set_param(torch, qlayer, "qkt_smooth_scale",
               np.ones(q_out, dtype=np.float32))
    for name, module in qlayer.named_modules():
        if isinstance(module, QuantLinear):
            for key in pairs:
                if key in name:
                    act = torch.from_numpy(act_scales[name]).clamp(min=1e-5)
                    weight = module.weight.max(dim=0)[0].clamp(min=1e-5)
                    scale = (act.pow(alpha) / weight.pow(1 - alpha)).clamp(
                        min=1e-5)
                    if not is_llama:
                        shift = torch.from_numpy(act_shifts[name])
                    else:
                        shift = torch.zeros_like(scale)
                    _set_param(torch, qlayer, f"{pairs[key]}_smooth_shift",
                               shift.detach().numpy())
                    _set_param(torch, qlayer, f"{pairs[key]}_smooth_scale",
                               scale.detach().numpy())


def _tiny_hf_opt(h=32, heads=4, ffn=64, layers=1, vocab=128):
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        vocab_size=vocab, hidden_size=h, ffn_dim=ffn,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=64, word_embed_proj_dim=h,
        do_layer_norm_before=True, attn_implementation="eager")
    torch.manual_seed(11)
    model = OPTForCausalLM(cfg).eval().float()
    # nonzero norm biases/weights variation so the algebra is exercised
    return cfg, model


def _tiny_hf_llama(h=32, heads=4, ffn=64, layers=1, vocab=128):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=h, intermediate_size=ffn,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=heads,  # reference LET math is MHA-only
        max_position_embeddings=64, rms_norm_eps=1e-6,
        attn_implementation="eager", tie_word_embeddings=False)
    torch.manual_seed(12)
    model = LlamaForCausalLM(cfg).eval().float()
    return cfg, model


# ---------------------------------------------------------------------------
# (c) block-level parity
# ---------------------------------------------------------------------------

def test_opt_block_matches_reference(ref):
    """Reference QuantOPTDecoderLayer (LET temporary-smoothed + LWC
    fake-quant weights + act quant) vs our functional equivalent."""
    import omniquant_tpu.models.opt as jopt
    from omniquant_tpu.models.common import ActQuantSpec, causal_mask
    from omniquant_tpu.quant.quantizer import QuantConfig

    torch = ref.torch
    hf_cfg, hf_model = _tiny_hf_opt()
    h = hf_cfg.hidden_size
    ori = hf_model.model.decoder.layers[0]
    args = _quant_args(wbits=4, abits=8, group_size=16)
    qlayer = ref.QuantOPTDecoderLayer(hf_cfg, ori, args).float()
    _detach_buffers(qlayer)
    qlayer.set_quant_state(weight_quant=False, act_quant=True)
    qlayer.let = True

    rng = np.random.default_rng(3)
    names = ["self_attn.q_proj", "self_attn.out_proj", "fc1"]
    act_scales = {n: rng.uniform(0.1, 3.0, h).astype(np.float32)
                  for n in names}
    act_shifts = {n: (rng.standard_normal(h) * 0.05).astype(np.float32)
                  for n in names}
    pairs = {"q_proj": "qkv", "out_proj": "out", "fc1": "fc1"}
    _register_ref_let_params(torch, qlayer, pairs, act_scales, act_shifts,
                             alpha=0.5, is_llama=False, q_out=h)
    qlayer.smooth_and_quant_temporary()

    s = 8
    x = rng.standard_normal((2, s, h)).astype(np.float32)
    mask = _torch_mask(torch, s, batch=2)
    with torch.no_grad():
        ref_out = qlayer(torch.from_numpy(x), attention_mask=mask)[0].numpy()

    # ours
    cfg = jopt.OPTConfig.from_hf(hf_cfg)
    params = jopt.from_hf_state_dict(hf_model.state_dict(), cfg)
    block = params["layers"][0]
    wcfg = QuantConfig(n_bits=4, group_size=16, lwc=True)
    lwc = jopt.init_lwc_params_block(block, wcfg)
    let = jopt.init_let_params(
        block, cfg,
        {"q_proj": act_scales["self_attn.q_proj"],
         "out_proj": act_scales["self_attn.out_proj"],
         "fc1": act_scales["fc1"]},
        {"q_proj": act_shifts["self_attn.q_proj"],
         "out_proj": act_shifts["self_attn.out_proj"],
         "fc1": act_shifts["fc1"]})
    # LET-init parity first: learned starting points must agree exactly
    np.testing.assert_allclose(
        np.asarray(let["qkv_smooth_scale"]),
        qlayer.qkv_smooth_scale.detach().numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(let["out_smooth_shift"]),
        qlayer.out_smooth_shift.detach().numpy(), atol=0)

    eff = jopt.effective_block_weights(block, wcfg, lwc, let, cfg)
    got, _ = jopt.block_forward(
        eff, jnp.asarray(x), cfg, causal_mask(s, s),
        spec=ActQuantSpec.from_bits(8))
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=2e-4, atol=2e-5)


def test_llama_block_matches_reference(ref):
    import omniquant_tpu.models.llama as jllama
    from omniquant_tpu.models.common import ActQuantSpec, causal_mask
    from omniquant_tpu.quant.quantizer import QuantConfig

    torch = ref.torch
    hf_cfg, hf_model = _tiny_hf_llama()
    h = hf_cfg.hidden_size
    ori = hf_model.model.layers[0]
    # the reference layer expects the pre-4.3x per-attention rotary module
    ori.self_attn.rotary_emb = _OldRotary(
        torch, hf_cfg.hidden_size // hf_cfg.num_attention_heads)
    args = _quant_args(wbits=4, abits=8, group_size=16)
    qlayer = ref.QuantLlamaDecoderLayer(hf_cfg, ori, args).float()
    _detach_buffers(qlayer)
    qlayer.set_quant_state(weight_quant=False, act_quant=True)
    qlayer.let = True

    rng = np.random.default_rng(4)
    names = ["self_attn.q_proj", "self_attn.o_proj", "mlp.up_proj"]
    act_scales = {n: rng.uniform(0.1, 3.0, h).astype(np.float32)
                  for n in names}
    pairs = {"q_proj": "qkv", "o_proj": "out", "up_proj": "fc1"}
    _register_ref_let_params(torch, qlayer, pairs, act_scales, None,
                             alpha=0.5, is_llama=True, q_out=h)
    qlayer.smooth_and_quant_temporary()

    s = 8
    x = rng.standard_normal((1, s, h)).astype(np.float32)
    mask = _torch_mask(torch, s)
    pos = torch.arange(s)[None]
    with torch.no_grad():
        ref_out = qlayer(torch.from_numpy(x), attention_mask=mask,
                         position_ids=pos)[0].numpy()

    cfg = jllama.LlamaConfig.from_hf(hf_cfg)
    params = jllama.from_hf_state_dict(hf_model.state_dict(), cfg)
    block = params["layers"][0]
    wcfg = QuantConfig(n_bits=4, group_size=16, lwc=True)
    lwc = jllama.init_lwc_params_block(block, wcfg)
    let = jllama.init_let_params(
        block, cfg,
        {"q_proj": act_scales["self_attn.q_proj"],
         "o_proj": act_scales["self_attn.o_proj"],
         "up_proj": act_scales["mlp.up_proj"]})
    np.testing.assert_allclose(
        np.asarray(let["fc1_smooth_scale"]),
        qlayer.fc1_smooth_scale.detach().numpy(), rtol=1e-6)

    eff = jllama.effective_block_weights(block, wcfg, lwc, let, cfg)
    got, _ = jllama.block_forward(
        eff, jnp.asarray(x), cfg, causal_mask(s, s), jnp.arange(s),
        spec=ActQuantSpec.from_bits(8))
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# (d) calibration-loop parity
# ---------------------------------------------------------------------------

def _ref_calibration_loop(ref, qlayer, inps, mask, position_ids, act_scales,
                          act_shifts, pairs, is_llama, q_out, *, epochs,
                          nsamples, bs, let_lr, lwc_lr):
    """Faithful reproduction of the reference inner loop
    (quantize/omniquant.py:157-250, deactive_amp/f32 regime). Returns
    (per-step losses, folded qlayer)."""
    torch = ref.torch
    qlayer.set_quant_state(weight_quant=False, act_quant=False)
    fp_inps = inps.clone()
    with torch.no_grad():
        for j in range(nsamples):
            fp_inps[j] = qlayer(fp_inps[j].unsqueeze(0), attention_mask=mask,
                                position_ids=position_ids)[0]
    qlayer.set_quant_state(weight_quant=False, act_quant=True)
    qlayer.let = True
    _register_ref_let_params(torch, qlayer, pairs, act_scales, act_shifts,
                             alpha=0.5, is_llama=is_llama, q_out=q_out)
    qlayer.float()
    optimizer = torch.optim.AdamW(
        [{"params": list(qlayer.let_parameters(True)), "lr": let_lr},
         {"params": list(qlayer.lwc_parameters()), "lr": lwc_lr}],
        weight_decay=0.0)
    loss_fn = torch.nn.MSELoss()
    mask_b = mask.repeat(bs, 1, 1, 1)
    losses = []
    for _ in range(epochs):
        for j in range(nsamples // bs):
            idx = j * bs
            qlayer.smooth_and_quant_temporary()
            out = qlayer(inps[idx:idx + bs], attention_mask=mask_b,
                         position_ids=position_ids)[0]
            loss = loss_fn(fp_inps[idx:idx + bs], out)
            losses.append(float(loss))
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
    qlayer.clear_temp_variable()
    qlayer.smooth_and_quant_inplace()
    return losses, fp_inps


def _compare_folded(ours_w, ref_w, what, flip_frac=0.002):
    """Folded weights live on a quantization lattice; allow a tiny fraction
    of one-step lattice flips from accumulated fp noise, require the rest
    to agree tightly."""
    ours = np.asarray(ours_w, dtype=np.float64)
    theirs = np.asarray(ref_w, dtype=np.float64)
    diff = np.abs(ours - theirs)
    tol = 1e-4 * max(1.0, float(np.abs(theirs).max()))
    frac = float((diff > tol).mean())
    assert frac <= flip_frac, (
        f"{what}: {frac:.4%} of entries differ beyond {tol:.2e} "
        f"(max diff {diff.max():.3e})")


def test_opt_calibration_loop_matches_reference(ref):
    """N AdamW steps of the reference loop vs calibrate() on identical
    tokens/stats: per-step losses, learned omni params, folded weights."""
    import omniquant_tpu.models.opt as jopt
    from omniquant_tpu.calib.engine import CalibConfig, calibrate
    from omniquant_tpu.models.registry import OPT

    torch = ref.torch
    hf_cfg, hf_model = _tiny_hf_opt(layers=1)
    h = hf_cfg.hidden_size
    nsamples, seqlen, bs, epochs = 4, 12, 2, 3
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, hf_cfg.vocab_size, (nsamples, seqlen))

    # identical layer-0 inputs on both sides: embedding lookups + add are
    # bit-exact across torch/XLA (no reductions)
    with torch.no_grad():
        tt = torch.from_numpy(tokens)
        emb = hf_model.model.decoder.embed_tokens(tt)
        pos = hf_model.model.decoder.embed_positions.weight[
            torch.arange(seqlen) + 2]
        inps = (emb + pos[None]).float()
    mask = _torch_mask(torch, seqlen)

    names = ["self_attn.q_proj", "self_attn.out_proj", "fc1"]
    act_scales = {n: rng.uniform(0.1, 3.0, h).astype(np.float32)
                  for n in names}
    act_shifts = {n: (rng.standard_normal(h) * 0.05).astype(np.float32)
                  for n in names}
    pairs = {"q_proj": "qkv", "out_proj": "out", "fc1": "fc1"}

    args = _quant_args(wbits=4, abits=8, group_size=16)
    qlayer = ref.QuantOPTDecoderLayer(
        hf_cfg, hf_model.model.decoder.layers[0], args).float()
    _detach_buffers(qlayer)
    ref_losses, _ = _ref_calibration_loop(
        ref, qlayer, inps.clone(), mask, None, act_scales, act_shifts, pairs,
        is_llama=False, q_out=h, epochs=epochs, nsamples=nsamples, bs=bs,
        let_lr=5e-3, lwc_lr=1e-2)

    # ours: full calibrate() on the converted model
    cfg = jopt.OPTConfig.from_hf(hf_cfg)
    params = jopt.from_hf_state_dict(hf_model.state_dict(), cfg)
    cc = CalibConfig(wbits=4, abits=8, group_size=16, lwc=True, let=True,
                     epochs=epochs, nsamples=nsamples, batch_size=bs)
    our_losses = []

    class Log:
        def info(self, msg):
            if "loss:" in msg:
                our_losses.append(float(msg.split("loss:")[1].split()[0]))

    scales_l = [{"q_proj": act_scales["self_attn.q_proj"],
                 "out_proj": act_scales["self_attn.out_proj"],
                 "fc1": act_scales["fc1"]}]
    shifts_l = [{"q_proj": act_shifts["self_attn.q_proj"],
                 "out_proj": act_shifts["self_attn.out_proj"],
                 "fc1": act_shifts["fc1"]}]
    params, omni = calibrate(OPT, params, cfg, jnp.asarray(tokens), cc,
                             scales_l, shifts_l, logger=Log())

    # per-epoch mean losses (engine logs epoch means)
    ref_epoch = np.asarray(ref_losses).reshape(epochs, -1).mean(axis=1)
    np.testing.assert_allclose(np.asarray(our_losses), ref_epoch,
                               rtol=1e-3, atol=1e-7)

    # learned omni params
    np.testing.assert_allclose(
        np.asarray(omni[0]["let"]["qkv_smooth_scale"]),
        qlayer.qkv_smooth_scale.detach().numpy(), rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(omni[0]["lwc"]["fc1"]["upbound_factor"]),
        qlayer.fc1.weight_quantizer.upbound_factor.detach().numpy(),
        rtol=1e-3, atol=2e-5)

    # folded weights + norms
    blk = params["layers"][0]
    _compare_folded(blk["q_proj"]["weight"],
                    qlayer.self_attn.q_proj.weight.detach().numpy(), "q_proj")
    _compare_folded(blk["fc2"]["weight"],
                    qlayer.fc2.weight.detach().numpy(), "fc2")
    np.testing.assert_allclose(
        np.asarray(blk["self_attn_layer_norm"]["weight"]),
        qlayer.self_attn_layer_norm.weight.detach().numpy(),
        rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(blk["self_attn_layer_norm"]["bias"]),
        qlayer.self_attn_layer_norm.bias.detach().numpy(),
        rtol=1e-3, atol=2e-5)


def test_llama_calibration_loop_matches_reference(ref):
    import omniquant_tpu.models.llama as jllama
    from omniquant_tpu.calib.engine import CalibConfig, calibrate
    from omniquant_tpu.models.registry import LLAMA

    torch = ref.torch
    hf_cfg, hf_model = _tiny_hf_llama(layers=1)
    h = hf_cfg.hidden_size
    nsamples, seqlen, bs, epochs = 4, 12, 2, 3
    rng = np.random.default_rng(6)
    tokens = rng.integers(0, hf_cfg.vocab_size, (nsamples, seqlen))

    with torch.no_grad():
        inps = hf_model.model.embed_tokens(torch.from_numpy(tokens)).float()
    mask = _torch_mask(torch, seqlen)
    position_ids = torch.arange(seqlen)[None]

    names = ["self_attn.q_proj", "self_attn.o_proj", "mlp.up_proj"]
    act_scales = {n: rng.uniform(0.1, 3.0, h).astype(np.float32)
                  for n in names}
    pairs = {"q_proj": "qkv", "o_proj": "out", "up_proj": "fc1"}

    ori = hf_model.model.layers[0]
    ori.self_attn.rotary_emb = _OldRotary(
        torch, h // hf_cfg.num_attention_heads)
    args = _quant_args(wbits=4, abits=8, group_size=16)
    qlayer = ref.QuantLlamaDecoderLayer(hf_cfg, ori, args).float()
    _detach_buffers(qlayer)
    ref_losses, _ = _ref_calibration_loop(
        ref, qlayer, inps.clone(), mask, position_ids, act_scales, None,
        pairs, is_llama=True, q_out=h, epochs=epochs, nsamples=nsamples,
        bs=bs, let_lr=5e-3, lwc_lr=1e-2)

    cfg = jllama.LlamaConfig.from_hf(hf_cfg)
    params = jllama.from_hf_state_dict(hf_model.state_dict(), cfg)
    cc = CalibConfig(wbits=4, abits=8, group_size=16, lwc=True, let=True,
                     epochs=epochs, nsamples=nsamples, batch_size=bs)
    our_losses = []

    class Log:
        def info(self, msg):
            if "loss:" in msg:
                our_losses.append(float(msg.split("loss:")[1].split()[0]))

    scales_l = [{"q_proj": act_scales["self_attn.q_proj"],
                 "o_proj": act_scales["self_attn.o_proj"],
                 "up_proj": act_scales["mlp.up_proj"]}]
    params, omni = calibrate(LLAMA, params, cfg, jnp.asarray(tokens), cc,
                             scales_l, None, logger=Log())

    ref_epoch = np.asarray(ref_losses).reshape(epochs, -1).mean(axis=1)
    np.testing.assert_allclose(np.asarray(our_losses), ref_epoch,
                               rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(omni[0]["let"]["out_smooth_scale"]),
        qlayer.out_smooth_scale.detach().numpy(), rtol=1e-3, atol=2e-5)

    blk = params["layers"][0]
    _compare_folded(blk["gate_proj"]["weight"],
                    qlayer.mlp.gate_proj.weight.detach().numpy(), "gate_proj")
    _compare_folded(blk["o_proj"]["weight"],
                    qlayer.self_attn.o_proj.weight.detach().numpy(), "o_proj")
    np.testing.assert_allclose(
        np.asarray(blk["input_layernorm"]["weight"]),
        qlayer.input_layernorm.weight.detach().numpy(),
        rtol=1e-3, atol=2e-5)
    # LET fold materializes a bias on RMSNorm (reference transformation
    # registers a bias buffer, models/transformation.py:78-80)
    np.testing.assert_allclose(
        np.asarray(blk["input_layernorm"]["bias"]),
        qlayer.input_layernorm.bias.detach().numpy(),
        rtol=1e-3, atol=2e-5)


def test_llama_gqa_lwc_calibration_loop_matches_reference(ref):
    """GQA geometry (2 kv heads under 4 query heads) over MORE steps
    (epochs 5): LWC-only — the reference's LET q<->k algebra is MHA-only,
    but its GQA attention (repeat_kv, int_llama_layer.py:138-139) and LWC
    training must still agree step-for-step. VERDICT r2 #10: keep the
    strongest offline proxy growing until real checkpoints are reachable
    (docs/parity_reproduction.md)."""
    import torch as _torch_mod  # noqa: F401 (via ref.torch below)
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    import omniquant_tpu.models.llama as jllama
    from omniquant_tpu.calib.engine import CalibConfig, calibrate
    from omniquant_tpu.models.registry import LLAMA

    torch = ref.torch
    hf_cfg = HFLlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2,  # GQA
        max_position_embeddings=64, rms_norm_eps=1e-6,
        attn_implementation="eager", tie_word_embeddings=False)
    torch.manual_seed(21)
    hf_model = LlamaForCausalLM(hf_cfg).eval().float()

    nsamples, seqlen, bs, epochs = 4, 12, 2, 5
    rng = np.random.default_rng(9)
    tokens = rng.integers(0, hf_cfg.vocab_size, (nsamples, seqlen))
    with torch.no_grad():
        inps = hf_model.model.embed_tokens(torch.from_numpy(tokens)).float()
    mask = _torch_mask(torch, seqlen)
    position_ids = torch.arange(seqlen)[None]

    ori = hf_model.model.layers[0]
    ori.self_attn.rotary_emb = _OldRotary(
        torch, hf_cfg.hidden_size // hf_cfg.num_attention_heads)
    args = _quant_args(wbits=3, abits=16, group_size=16)
    qlayer = ref.QuantLlamaDecoderLayer(hf_cfg, ori, args).float()
    _detach_buffers(qlayer)

    # reference inner loop, LWC-only (no LET registration, let stays False)
    qlayer.set_quant_state(weight_quant=False, act_quant=False)
    fp_inps = inps.clone()
    with torch.no_grad():
        for j in range(nsamples):
            fp_inps[j] = qlayer(
                fp_inps[j].unsqueeze(0), attention_mask=mask,
                position_ids=position_ids)[0]
    qlayer.set_quant_state(weight_quant=False, act_quant=True)
    qlayer.let = False  # LWC-only (the reference sets this in omniquant())
    qlayer.float()
    optimizer = torch.optim.AdamW(
        [{"params": list(qlayer.lwc_parameters()), "lr": 1e-2}],
        weight_decay=0.0)
    loss_fn_t = torch.nn.MSELoss()
    mask_b = mask.repeat(bs, 1, 1, 1)
    ref_losses = []
    for _ in range(epochs):
        for j in range(nsamples // bs):
            idx = j * bs
            qlayer.smooth_and_quant_temporary()
            out = qlayer(inps[idx:idx + bs], attention_mask=mask_b,
                         position_ids=position_ids)[0]
            loss = loss_fn_t(fp_inps[idx:idx + bs], out)
            ref_losses.append(float(loss))
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
    qlayer.clear_temp_variable()
    qlayer.smooth_and_quant_inplace()

    cfg = jllama.LlamaConfig.from_hf(hf_cfg)
    params = jllama.from_hf_state_dict(hf_model.state_dict(), cfg)
    cc = CalibConfig(wbits=3, abits=16, group_size=16, lwc=True, let=False,
                     epochs=epochs, nsamples=nsamples, batch_size=bs)
    our_losses = []

    class Log:
        def info(self, msg):
            if "loss:" in msg:
                our_losses.append(float(msg.split("loss:")[1].split()[0]))

    params, omni = calibrate(LLAMA, params, cfg, jnp.asarray(tokens), cc,
                             logger=Log())
    ref_epoch = np.asarray(ref_losses).reshape(epochs, -1).mean(axis=1)
    np.testing.assert_allclose(np.asarray(our_losses), ref_epoch,
                               rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(omni[0]["lwc"]["k_proj"]["upbound_factor"]),
        qlayer.self_attn.k_proj.weight_quantizer.upbound_factor
        .detach().numpy(), rtol=1e-3, atol=2e-5)
    blk = params["layers"][0]
    _compare_folded(blk["k_proj"]["weight"],
                    qlayer.self_attn.k_proj.weight.detach().numpy(),
                    "k_proj (GQA)")
    _compare_folded(blk["down_proj"]["weight"],
                    qlayer.mlp.down_proj.weight.detach().numpy(),
                    "down_proj")
