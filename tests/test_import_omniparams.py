"""Round-trip test for the reference omni_parameters.pth converter.

Generates a reference-FORMAT checkpoint by running the ACTUAL torch
reference layer (/root/reference models/int_llama_layer.py::omni_state_dict
— the same selector that writes omni_parameters.pth at
quantize/omniquant.py:249-250), converts it with
omniquant_tpu.utils.import_reference, and asserts (a) the npz matches the
torch values under our {let, lwc} naming and (b) the epochs-0 resume path
(`calibrate(resume=...)` — the reference README.md:105-116 reproduction
recipe) consumes it and folds exactly the resumed parameters.
"""
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from test_reference_parity import (  # same-dir test helpers
    _quant_args, _register_ref_let_params, _tiny_hf_llama, _OldRotary)


@pytest.fixture(scope="module")
def ref_checkpoint(tmp_path_factory):
    """A 2-layer reference-format omni_parameters.pth from the torch
    reference itself, plus the source layers for value comparison."""
    # path insertion INSIDE the fixture: a module-level insert would shadow
    # repo modules (main, models, ...) for every later-collected test
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from models.int_llama_layer import QuantLlamaDecoderLayer

    hf_cfg, hf_model = _tiny_hf_llama(layers=2)
    h = hf_cfg.hidden_size
    args = _quant_args(wbits=4, abits=8, group_size=16)
    rng = np.random.default_rng(21)
    sd = {}
    qlayers = []
    for i in range(2):
        ori = hf_model.model.layers[i]
        ori.self_attn.rotary_emb = _OldRotary(
            torch, hf_cfg.hidden_size // hf_cfg.num_attention_heads)
        qlayer = QuantLlamaDecoderLayer(hf_cfg, ori, args).float()
        qlayer.let = True
        names = ["self_attn.q_proj", "self_attn.o_proj", "mlp.up_proj"]
        act_scales = {n: rng.uniform(0.1, 3.0, h).astype(np.float32)
                      for n in names}
        pairs = {"q_proj": "qkv", "o_proj": "out", "up_proj": "fc1"}
        _register_ref_let_params(torch, qlayer, pairs, act_scales, None,
                                 alpha=0.5, is_llama=True, q_out=h)
        # perturb every learnable so the round-trip is value-meaningful
        with torch.no_grad():
            for _, p in qlayer.named_parameters():
                p.add_(torch.from_numpy(
                    rng.standard_normal(tuple(p.shape)).astype(np.float32))
                    * 0.3)
        sd[i] = qlayer.omni_state_dict()
        qlayers.append(qlayer)
    path = tmp_path_factory.mktemp("omni") / "omni_parameters.pth"
    torch.save(sd, str(path))
    return str(path), sd, hf_cfg


def test_convert_matches_torch_values(ref_checkpoint, tmp_path):
    from omniquant_tpu.utils.checkpoint import load_pytree
    from omniquant_tpu.utils.import_reference import convert_file

    pth, sd, _ = ref_checkpoint
    out = str(tmp_path / "omni_parameters.npz")
    converted = convert_file(pth, out)
    loaded = {int(k): v for k, v in load_pytree(out).items()}
    assert set(loaded) == {0, 1}
    for i in (0, 1):
        let, lwc = loaded[i]["let"], loaded[i]["lwc"]
        assert set(let) == {
            "qkv_smooth_scale", "qkv_smooth_shift", "fc1_smooth_scale",
            "fc1_smooth_shift", "out_smooth_scale", "out_smooth_shift",
            "qkt_smooth_scale"}
        assert set(lwc) == {"q_proj", "k_proj", "v_proj", "o_proj",
                            "gate_proj", "up_proj", "down_proj"}
        for tname, t in sd[i].items():
            want = t.detach().numpy()
            if "smooth" in tname:
                got = let[tname]
                np.testing.assert_array_equal(got, want.reshape(-1))
            else:
                linear = tname.split(".")[-3]
                got = lwc[linear][tname.split(".")[-1]]
                np.testing.assert_array_equal(got, want.reshape(-1, 1))
        # the npz equals the in-memory conversion (save/load fidelity)
        for k, v in converted[i]["let"].items():
            np.testing.assert_array_equal(loaded[i]["let"][k], v)


def test_epochs0_resume_consumes_converted_checkpoint(ref_checkpoint,
                                                      tmp_path):
    """The reference reproduction recipe shape: --epochs 0 --resume <npz>
    must fold the RESUMED params (not the fresh inits): folded weights
    equal effective_block_weights under the converted LET/LWC values."""
    import jax

    from omniquant_tpu.calib.engine import CalibConfig, calibrate
    from omniquant_tpu.models import LLAMA, llama as jllama
    from omniquant_tpu.quant import QuantConfig
    from omniquant_tpu.utils.import_reference import convert_file

    pth, _, hf_cfg = ref_checkpoint
    npz = str(tmp_path / "omni.npz")
    convert_file(pth, npz)

    cfg = jllama.LlamaConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_hidden_layers=2,
        num_attention_heads=hf_cfg.num_attention_heads,
        num_key_value_heads=hf_cfg.num_key_value_heads,
        max_position_embeddings=64)
    params = jllama.init_params(jax.random.PRNGKey(3), cfg)
    wcfg = QuantConfig(n_bits=4, group_size=16)
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)

    cc = CalibConfig(epochs=0, nsamples=2, lwc=True, let=True,
                     wbits=4, abits=16, group_size=16, resume=npz,
                     output_dir=str(tmp_path / "out"))
    # calibrate replaces elements of the layers list it is given — hand it
    # a copy so `params` keeps the pre-fold blocks for the oracle below
    out_params, omni = calibrate(
        LLAMA, {**params, "layers": list(params["layers"])}, cfg, data, cc,
        act_scales=None, act_shifts=None)

    from omniquant_tpu.utils.checkpoint import load_pytree

    resumed = {int(k): v for k, v in load_pytree(npz).items()}
    for i in (0, 1):
        # the engine stored EXACTLY the resumed params (not fresh inits)
        for k, v in resumed[i]["let"].items():
            np.testing.assert_array_equal(
                np.asarray(omni[i]["let"][k]), v)
        for lin, d in resumed[i]["lwc"].items():
            for k, v in d.items():
                np.testing.assert_array_equal(
                    np.asarray(omni[i]["lwc"][lin][k]), v)
        # folded weights match the functional oracle under the converted
        # params. Tolerance: the engine folds inside jit, the oracle runs
        # eagerly; float-order differences in the LET fold perturb the
        # per-group min/max and thus the quantization grid, so agreement
        # is asserted at grid granularity (<= ~1 step where the grids
        # disagree, tiny mean error overall) — far below the O(1) error a
        # fresh-init fold would show (checked explicitly below).
        want_block = LLAMA.effective_block_weights(
            params["layers"][i], wcfg,
            jax.tree.map(jnp.asarray, resumed[i]["lwc"]),
            jax.tree.map(jnp.asarray, resumed[i]["let"]),
            cfg)
        got_block = out_params["layers"][i]
        fresh_lwc = LLAMA.init_lwc_params_block(params["layers"][i], wcfg)
        fresh_block = LLAMA.effective_block_weights(
            params["layers"][i], wcfg, fresh_lwc, None, cfg)
        for name in jllama.LINEAR_NAMES:
            got = np.asarray(got_block[name]["weight"])
            want = np.asarray(want_block[name]["weight"])
            # upper bound on any group's quant step: the global range /
            # (2^4 - 1) dominates every per-group (max-min)/(2^4-1)
            step = float(want.max() - want.min()) / (2**4 - 1) + 1e-8
            diff = np.abs(got - want)
            assert diff.max() <= 1.5 * step, (name, diff.max(), step)
            assert diff.mean() <= 0.15 * step, (name, diff.mean(), step)
            fresh = np.asarray(fresh_block[name]["weight"])
            if name != "down_proj":  # LET-transformed sites
                assert np.abs(got - fresh).max() > 3 * step, name
