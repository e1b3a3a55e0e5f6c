"""Sequence-parallel (ring-attention) calibration at seqlen > 2048
(VERDICT r2 #6): block forwards sharded over an 8-device sp mesh match the
single-device dense path, and a full calibration run converges to the same
folded weights."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from omniquant_tpu.calib import CalibConfig, calibrate
from omniquant_tpu.models import LLAMA
from omniquant_tpu.models import llama as jllama


def tiny_cfg(max_pos):
    return jllama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=max_pos,
    )


def clone(t):
    return jax.tree.map(lambda x: None if x is None else jnp.array(x), t,
                        is_leaf=lambda x: x is None)


def test_sp_block_forward_matches_dense_seqlen_8192():
    """One llama block at seqlen 8192: ring attention over 8 devices ==
    the dense single-device forward (tight tolerance)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from omniquant_tpu.parallel.ring_attention import ring_attention_local

    cfg = tiny_cfg(8192)
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    layer = params["layers"][0]
    S = 8192
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, S, cfg.hidden_size)) * 0.1,
                    jnp.float32)
    want, _ = LLAMA.block_forward(layer, x, cfg)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    s_local = S // 8

    def inner(layer, x_l):
        pos = jax.lax.axis_index("sp") * s_local + jnp.arange(s_local)

        def attn(q, k, v, spec_):
            return ring_attention_local(q, k, v, axis="sp", n=8,
                                        causal=True, impl="jnp")

        y, _ = LLAMA.block_forward(layer, x_l, cfg, None, pos,
                                   attn_impl=attn)
        return y

    got = shard_map(
        inner, mesh=mesh,
        in_specs=(jax.tree.map(lambda a: P(), layer), P(None, "sp", None)),
        out_specs=P(None, "sp", None), check_vma=False)(layer, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_sp_calibration_run_matches_single_device():
    """A short LWC calibration at seqlen 4096 on the 8-device sp mesh
    converges to the same folded weights as the single-device run (the
    quantization grid absorbs ring-vs-dense float noise)."""
    cfg = tiny_cfg(4096)
    S, NS = 4096, 2
    params = jllama.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, 64, (NS, S)), jnp.int32)
    cc = CalibConfig(wbits=4, abits=16, group_size=16, lwc=True, epochs=1,
                     nsamples=NS, batch_size=1)

    p1, omni1 = calibrate(LLAMA, clone(params), cfg, tokens, cc)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    p2, omni2 = calibrate(LLAMA, clone(params), cfg, tokens, cc,
                          sp_mesh=mesh)

    w1 = np.asarray(p1["layers"][0]["q_proj"]["weight"])
    w2 = np.asarray(p2["layers"][0]["q_proj"]["weight"])
    np.testing.assert_allclose(w2, w1, rtol=1e-4, atol=1e-5)
    l1 = np.asarray(omni1[0]["lwc"]["q_proj"]["upbound_factor"])
    l2 = np.asarray(omni2[0]["lwc"]["q_proj"]["upbound_factor"])
    np.testing.assert_allclose(l2, l1, rtol=1e-3, atol=1e-5)


def test_sp_opt_block_forward_matches_dense():
    """One OPT block at seqlen 2048 over the 8-device ring: the attn_impl
    hook receives OPT's pre-scaled/pre-quantized q/k/v, so the ring runs
    at sm_scale=1.0 and must equal the dense single-device forward."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from omniquant_tpu.models import OPT
    from omniquant_tpu.models import opt as jopt
    from omniquant_tpu.parallel.ring_attention import ring_attention_local

    cfg = jopt.OPTConfig(
        vocab_size=64, hidden_size=32, ffn_dim=64, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=2048,
    )
    params = jopt.init_params(jax.random.PRNGKey(4), cfg)
    layer = params["layers"][0]
    S = 2048
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, S, cfg.hidden_size)) * 0.1,
                    jnp.float32)
    want, _ = OPT.block_forward(layer, x, cfg)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))

    def inner(layer, x_l):
        def attn(q, k, v, spec_):
            return ring_attention_local(q, k, v, axis="sp", n=8,
                                        sm_scale=1.0, causal=True,
                                        impl="jnp")

        y, _ = OPT.block_forward(layer, x_l, cfg, None, None,
                                 attn_impl=attn)
        return y

    got = shard_map(
        inner, mesh=mesh,
        in_specs=(jax.tree.map(lambda a: P(), layer), P(None, "sp", None)),
        out_specs=P(None, "sp", None), check_vma=False)(layer, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_sp_opt_calibration_run_matches_single_device():
    """OPT LWC+LET calibration at seqlen 4096 on the sp mesh converges to
    the same folded weights as the single-device run (VERDICT r4 next #8:
    SP calibration beyond llama)."""
    from omniquant_tpu.models import OPT
    from omniquant_tpu.models import opt as jopt

    cfg = jopt.OPTConfig(
        vocab_size=64, hidden_size=32, ffn_dim=64, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=4096,
    )
    S, NS = 4096, 2
    params = jopt.init_params(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(0, 64, (NS, S)), jnp.int32)
    cc = CalibConfig(wbits=4, abits=16, group_size=16, lwc=True, let=True,
                     epochs=1, nsamples=NS, batch_size=1)

    p1, omni1 = calibrate(OPT, clone(params), cfg, tokens, cc)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    p2, omni2 = calibrate(OPT, clone(params), cfg, tokens, cc,
                          sp_mesh=mesh)

    w1 = np.asarray(p1["layers"][0]["q_proj"]["weight"])
    w2 = np.asarray(p2["layers"][0]["q_proj"]["weight"])
    np.testing.assert_allclose(w2, w1, rtol=1e-4, atol=1e-5)
    l1 = np.asarray(omni1[0]["lwc"]["q_proj"]["upbound_factor"])
    l2 = np.asarray(omni2[0]["lwc"]["q_proj"]["upbound_factor"])
    np.testing.assert_allclose(l2, l1, rtol=1e-3, atol=1e-5)
