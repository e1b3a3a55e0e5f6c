"""kv_update kernels == the XLA scatter/set they replace."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniquant_tpu.kernels.kv_update import (
    kv_cache_prefill_write, kv_cache_write)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8])
def test_kv_cache_write_matches_scatter(dtype):
    B, H, S, D = 4, 2, 16, 128
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 10, dtype)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)) * 10, dtype)
    kn = jnp.asarray(rng.standard_normal((B, H, D)) * 10, dtype)
    vn = jnp.asarray(rng.standard_normal((B, H, D)) * 10, dtype)
    lengths = jnp.asarray(rng.integers(0, S, (B,)), jnp.int32)

    b_idx = jnp.arange(B)
    want_k = k.at[b_idx, :, lengths, :].set(kn)
    want_v = v.at[b_idx, :, lengths, :].set(vn)
    got_k, got_v = kv_cache_write((k, v), (kn, vn), lengths)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_kv_cache_write_with_scales():
    """int8 codes + scale-plane caches in one call."""
    from omniquant_tpu.kernels.kv_update import (
        scale_plane_init, scale_plane_view)

    B, H, S, D = 3, 2, 1024, 128
    rng = np.random.default_rng(1)
    kc = jnp.asarray(rng.integers(-127, 127, (B, H, S, D)), jnp.int8)
    ks = scale_plane_init(B, H, S) + jnp.asarray(
        rng.standard_normal((B, H, S // 128, 128)), jnp.float32)
    kcn = jnp.asarray(rng.integers(-127, 127, (B, H, D)), jnp.int8)
    ksn = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    lengths = jnp.asarray([1, 0, 1023], jnp.int32)

    b_idx = jnp.arange(B)
    want_c = kc.at[b_idx, :, lengths, :].set(kcn)
    want_s = scale_plane_view(ks).at[b_idx, :, lengths].set(ksn)
    got_c, got_s = kv_cache_write((kc, ks), (kcn, ksn), lengths)
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
    np.testing.assert_array_equal(
        np.asarray(scale_plane_view(got_s)), np.asarray(want_s))


def test_kv_cache_write_scales_nonmultiple_of_1024():
    """max_len=1536: ceil(S/128)=12 lane-rows round up to 16 sublanes so the
    flat-kind RMW tile at sa=(pos//128//8)*8 stays in bounds for pos >= 1024
    (a 12-sublane plane would clamp the slice base and corrupt rows)."""
    from omniquant_tpu.kernels.kv_update import (
        scale_plane_init, scale_plane_view)

    B, H, S, D = 2, 2, 1536, 128
    rng = np.random.default_rng(5)
    plane = scale_plane_init(B, H, S)
    assert plane.shape[2] % 8 == 0 and plane.shape[2] * 128 >= S
    kc = jnp.asarray(rng.integers(-127, 127, (B, H, S, D)), jnp.int8)
    ks = plane + jnp.asarray(
        rng.standard_normal(plane.shape), jnp.float32)
    kcn = jnp.asarray(rng.integers(-127, 127, (B, H, D)), jnp.int8)
    ksn = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    for lengths in ([1100, 1535], [1023, 1024]):
        lengths = jnp.asarray(lengths, jnp.int32)
        b_idx = jnp.arange(B)
        want_c = kc.at[b_idx, :, lengths, :].set(kcn)
        want_s = scale_plane_view(ks).at[b_idx, :, lengths].set(ksn)
        got_c, got_s = kv_cache_write((kc, ks), (kcn, ksn), lengths)
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
        np.testing.assert_array_equal(
            np.asarray(scale_plane_view(got_s)), np.asarray(want_s))


def test_kv_cache_prefill_write_matches_set():
    B, H, S, D = 6, 2, 32, 128
    N, S_p = 3, 16
    rng = np.random.default_rng(2)
    cache = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    new = jnp.asarray(rng.standard_normal((N, H, S_p, D)), jnp.bfloat16)
    slots = jnp.asarray([4, 0, 2], jnp.int32)

    want = cache.at[slots, :, :S_p].set(new)
    got = kv_cache_prefill_write(cache, new, slots)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
