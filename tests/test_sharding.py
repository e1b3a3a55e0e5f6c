"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from omniquant_tpu.models import llama as jllama
from omniquant_tpu.models import LLAMA
from omniquant_tpu.parallel import make_mesh, model_specs, shard_params


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_tp_forward_matches_single_device(tiny_llama):
    cfg, params = tiny_llama
    assert len(jax.devices()) >= 8
    mesh = make_mesh(dp=1, tp=4)
    specs = model_specs("llama", params)
    sharded = shard_params(params, mesh, specs)

    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, (2, 16)), jnp.int32)
    ref = jllama.forward(params, tokens, cfg)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(
            lambda p, t: jllama.forward(p, t, cfg))(sharded, tokens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_dp_tp_calibration_step(tiny_llama):
    """A jitted calibration train step over a (dp=2, tp=4) mesh: block params
    tensor-sharded, activation batch data-sharded."""
    import optax

    from omniquant_tpu.quant import QuantConfig
    from omniquant_tpu.parallel import block_specs

    cfg, params = tiny_llama
    mesh = make_mesh(dp=2, tp=4)
    block = params["layers"][0]
    bspecs = block_specs("llama", block)
    block_sh = shard_params(block, mesh, bspecs)

    wcfg = QuantConfig(n_bits=4, group_size=16, lwc=True)
    lwc = jllama.init_lwc_params_block(block, wcfg)
    let = jllama.init_let_params(block, cfg, None)
    trainable = {"lwc": lwc, "let": let}
    opt = optax.adamw(1e-2)
    opt_state = opt.init(trainable)

    rng = np.random.default_rng(1)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((8, 16, cfg.hidden_size)), jnp.float32),
        NamedSharding(mesh, P("dp", None, None)))
    fp_out = jax.device_put(
        jnp.asarray(rng.standard_normal((8, 16, cfg.hidden_size)), jnp.float32),
        NamedSharding(mesh, P("dp", None, None)))

    def loss_fn(tr, block, x, fp_out):
        eff = LLAMA.effective_block_weights(
            block, wcfg, tr["lwc"], tr["let"], cfg)
        out, _ = LLAMA.block_forward(eff, x, cfg)
        return jnp.mean((out - fp_out) ** 2)

    @jax.jit
    def step(tr, opt_state, block, x, fp_out):
        loss, grads = jax.value_and_grad(loss_fn)(tr, block, x, fp_out)
        updates, opt_state = opt.update(grads, opt_state, tr)
        return optax.apply_updates(tr, updates), opt_state, loss

    with jax.sharding.set_mesh(mesh):
        tr2, opt_state, loss = step(trainable, opt_state, block_sh, x, fp_out)
        tr3, _, loss2 = step(tr2, opt_state, block_sh, x, fp_out)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    # matches the unsharded step numerically
    tr2_ref, _, loss_ref = jax.jit(step)(trainable, opt.init(trainable), block, x, fp_out)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
