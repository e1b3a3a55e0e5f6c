"""Fold-equivalence tests for the LET smoothing algebra.

Property: applying the smoothing transforms must leave the block's function
unchanged in exact arithmetic (reference models/transformation.py implements
the same identities via in-place module mutation).
"""
import numpy as np
import jax
import jax.numpy as jnp

from omniquant_tpu.quant import (
    smooth_ln_fcs,
    smooth_fc_fc,
    smooth_fc_fc_gqa,
    smooth_q_k,
    truncate_number,
)


def rms_norm(x, w, b=None, eps=1e-6):
    var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    y = y * w
    if b is not None:
        y = y + b
    return y


def linear(x, fc):
    y = x @ fc["weight"].T
    if fc.get("bias") is not None:
        y = y + fc["bias"]
    return y


def test_truncate_number():
    x = jnp.array([0.5, 0.005, -0.003, 0.0, -2.0])
    y = truncate_number(x)
    np.testing.assert_allclose(
        np.asarray(y), [0.5, 0.01, -0.01, 0.0, -2.0], atol=1e-8
    )
    g = jax.grad(lambda x: jnp.sum(truncate_number(x) * jnp.arange(5.0)))(x)
    np.testing.assert_allclose(np.asarray(g), np.arange(5.0), atol=1e-8)


def test_smooth_ln_fcs_equivalence():
    """RMSNorm -> linear is invariant under ln/fc smoothing.

    Note the identity holds for the *post-norm* function: if h = rmsnorm(x)*w
    then (h - shift)/scale @ (scale * W)^T + (b + W @ shift) == h @ W^T + b.
    """
    rng = np.random.default_rng(0)
    h, out = 16, 24
    ln = {"weight": jnp.asarray(rng.standard_normal(h), jnp.float32)}
    fc = {
        "weight": jnp.asarray(rng.standard_normal((out, h)), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(out), jnp.float32),
    }
    scales = jnp.asarray(rng.uniform(0.5, 2.0, h), jnp.float32)
    shifts = jnp.asarray(rng.standard_normal(h) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, 5, h)), jnp.float32)

    ref = linear(rms_norm(x, ln["weight"]), fc)
    ln2, (fc2,) = smooth_ln_fcs(ln, [fc], scales, shifts)
    got = linear(rms_norm(x, ln2["weight"], ln2["bias"]), fc2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_smooth_ln_fcs_layernorm_with_bias():
    rng = np.random.default_rng(1)
    h, out = 12, 20
    ln = {
        "weight": jnp.asarray(rng.standard_normal(h), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(h), jnp.float32),
    }
    fc = {"weight": jnp.asarray(rng.standard_normal((out, h)), jnp.float32),
          "bias": jnp.asarray(rng.standard_normal(out), jnp.float32)}
    scales = jnp.asarray(rng.uniform(0.5, 2.0, h), jnp.float32)
    shifts = jnp.asarray(rng.standard_normal(h) * 0.2, jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, h)), jnp.float32)

    def layer_norm(x, w, b, eps=1e-5):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.var(x, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * w + b

    ref = linear(layer_norm(x, ln["weight"], ln["bias"]), fc)
    ln2, (fc2,) = smooth_ln_fcs(ln, [fc], scales, shifts)
    got = linear(layer_norm(x, ln2["weight"], ln2["bias"]), fc2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_smooth_fc_fc_equivalence():
    """x -> v_proj -> o_proj invariant under fc-fc smoothing (MHA, elementwise path)."""
    rng = np.random.default_rng(2)
    h = 16
    v = {"weight": jnp.asarray(rng.standard_normal((h, h)), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(h), jnp.float32)}
    o = {"weight": jnp.asarray(rng.standard_normal((h, h)), jnp.float32),
         "bias": None}
    scales = jnp.asarray(rng.uniform(0.5, 2.0, h), jnp.float32)
    shifts = jnp.asarray(rng.standard_normal(h) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((5, h)), jnp.float32)

    ref = linear(linear(x, v), o)
    v2, o2 = smooth_fc_fc(v, o, scales, shifts)
    got = linear(linear(x, v2), o2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_smooth_fc_fc_gqa_equivalence():
    """GQA: v out (n_kv*hd) feeds o in (n_heads*hd) via repeat_kv."""
    rng = np.random.default_rng(3)
    n_kv, n_rep, hd = 2, 3, 4
    n_heads = n_kv * n_rep
    v = {"weight": jnp.asarray(rng.standard_normal((n_kv * hd, 16)), jnp.float32),
         "bias": None}
    o = {"weight": jnp.asarray(rng.standard_normal((16, n_heads * hd)), jnp.float32),
         "bias": None}
    scales = jnp.asarray(rng.uniform(0.5, 2.0, n_kv * hd), jnp.float32)
    shifts = jnp.asarray(rng.standard_normal(n_kv * hd) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)

    def repeat_kv(vout):  # (..., n_kv*hd) -> (..., n_heads*hd)
        s = vout.shape[:-1]
        r = vout.reshape(*s, n_kv, 1, hd)
        return jnp.broadcast_to(r, (*s, n_kv, n_rep, hd)).reshape(*s, -1)

    ref = linear(repeat_kv(linear(x, v)), o)
    v2, o2 = smooth_fc_fc_gqa(v, o, scales, shifts, head_dim=hd, n_rep=n_rep)
    got = linear(repeat_kv(linear(x, v2) + (0 if v2.get("bias") is None else 0)), o2)
    # note: repeat_kv(linear) must include v2 bias; linear() already adds it
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_smooth_q_k_equivalence():
    """q @ k^T per head invariant under q/k smoothing (MHA and GQA)."""
    rng = np.random.default_rng(4)
    for n_kv, n_rep in [(4, 1), (2, 2)]:
        hd = 4
        n_heads = n_kv * n_rep
        h = 16
        q = {"weight": jnp.asarray(rng.standard_normal((n_heads * hd, h)), jnp.float32),
             "bias": jnp.asarray(rng.standard_normal(n_heads * hd), jnp.float32)}
        k = {"weight": jnp.asarray(rng.standard_normal((n_kv * hd, h)), jnp.float32),
             "bias": jnp.asarray(rng.standard_normal(n_kv * hd), jnp.float32)}
        scales = jnp.asarray(rng.uniform(0.5, 2.0, n_kv * hd), jnp.float32)
        x = jnp.asarray(rng.standard_normal((5, h)), jnp.float32)

        def qk_logits(q, k):
            qs = linear(x, q).reshape(5, n_heads, hd)
            ks = linear(x, k).reshape(5, n_kv, hd)
            ks = jnp.broadcast_to(
                ks[:, :, None, :], (5, n_kv, n_rep, hd)
            ).reshape(5, n_heads, hd)
            return jnp.einsum("qhd,khd->hqk", qs, ks)

        ref = qk_logits(q, k)
        q2, k2 = smooth_q_k(q, k, scales, head_dim=hd, n_rep=n_rep)
        got = qk_logits(q2, k2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)
