"""Ring (sequence-sharded) attention == dense causal attention."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from omniquant_tpu.kernels.flash_attention import flash_attention_reference
from omniquant_tpu.parallel.ring_attention import ring_attention


@pytest.mark.parametrize("impl", ["jnp", "flash"])
@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_attention_matches_dense(sp, impl):
    mesh = Mesh(np.asarray(jax.devices()[:sp]), ("sp",))
    B, H, S, D = 2, 4, 64, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)

    want = flash_attention_reference(q, k, v, causal=True)
    got = ring_attention(q, k, v, mesh, axis="sp", causal=True, impl=impl)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", ["jnp", "flash"])
def test_ring_attention_noncausal(impl):
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    B, H, S, D = 1, 2, 32, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
    got = ring_attention(q, k, v, mesh, axis="sp", causal=False, impl=impl)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
