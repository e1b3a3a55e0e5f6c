"""Unit tests for the pure-function uniform affine quantizer.

Includes a direct numerical cross-check against the reference torch semantics
(quantize/quantizer.py), re-derived in torch inside the test.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omniquant_tpu.quant import (
    QuantConfig,
    fake_quant_act,
    fake_quant_weight,
    init_lwc_params,
    quantize_weight_int,
    dequantize_weight_int,
    round_ste,
)


def torch_reference_fake_quant_weight(w_np, n_bits, symmetric, group_size,
                                      lwc_up=None, lwc_low=None):
    """Reference semantics (quantize/quantizer.py:84-147) re-derived in torch."""
    import torch

    x = torch.from_numpy(w_np).double()
    out_f, in_f = x.shape
    deficiency = 0
    if group_size and in_f % group_size:
        deficiency = group_size - in_f % group_size
        assert symmetric
        x = torch.cat([x, torch.zeros(out_f, deficiency, dtype=x.dtype)], 1)
    xq = x.reshape(-1, group_size) if group_size else x
    xmin = xq.amin(-1, keepdim=True)
    xmax = xq.amax(-1, keepdim=True)
    if lwc_up is not None:
        xmax = torch.sigmoid(torch.from_numpy(lwc_up).double()) * xmax
        xmin = torch.sigmoid(torch.from_numpy(lwc_low).double()) * xmin
    if symmetric:
        abs_max = torch.max(xmax.abs(), xmin.abs())
        scale = (abs_max / (2 ** (n_bits - 1) - 1)).clamp(1e-5, 1e4)
        rzp = ((2 ** (n_bits - 1) - 1) * torch.ones_like(scale)).clamp(-1e4, 1e4).round()
    else:
        scale = (xmax - xmin) / (2**n_bits - 1)  # unclamped (reference quirk :144-145)
        rzp = (-xmin / scale).clamp(-1e4, 1e4).round()
    x_int = (xq / scale).round().add(rzp).clamp(0, 2**n_bits - 1)
    x_deq = (x_int - rzp) * scale
    if group_size:
        x_deq = x_deq.reshape(out_f, -1)
    if deficiency:
        x_deq = x_deq[:, :-deficiency]
    return x_deq.numpy()


@pytest.mark.parametrize("n_bits,symmetric,group_size", [
    (4, False, None),
    (4, True, None),
    (4, False, 32),
    (3, False, 32),
    (2, False, 16),
    (8, False, None),
    (4, True, 24),   # deficiency path: 100 % 24 != 0
])
def test_matches_torch_reference(n_bits, symmetric, group_size):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 100 if group_size == 24 else 96)).astype(np.float32)
    cfg = QuantConfig(n_bits=n_bits, symmetric=symmetric, group_size=group_size)
    ours = np.asarray(fake_quant_weight(jnp.asarray(w), cfg))
    ref = torch_reference_fake_quant_weight(w, n_bits, symmetric, group_size)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_lwc_matches_torch_reference():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 64)).astype(np.float32)
    cfg = QuantConfig(n_bits=4, group_size=16, lwc=True)
    lwc = init_lwc_params(cfg, w.shape)
    # perturb so sigmoid != const
    up = np.asarray(lwc["upbound_factor"]) + rng.standard_normal(
        lwc["upbound_factor"].shape).astype(np.float32)
    low = np.asarray(lwc["lowbound_factor"]) + rng.standard_normal(
        lwc["lowbound_factor"].shape).astype(np.float32)
    lwc = {"upbound_factor": jnp.asarray(up), "lowbound_factor": jnp.asarray(low)}
    ours = np.asarray(fake_quant_weight(jnp.asarray(w), cfg, lwc))
    ref = torch_reference_fake_quant_weight(w, 4, False, 16, up, low)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_idempotent():
    """fake_quant(fake_quant(x)) == fake_quant(x)."""
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    cfg = QuantConfig(n_bits=4, group_size=16)
    q1 = fake_quant_weight(w, cfg)
    q2 = fake_quant_weight(q1, cfg)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)


def test_quant_error_bound():
    """|x - fake_quant(x)| <= scale/2 + eps for in-range values (no lwc)."""
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    cfg = QuantConfig(n_bits=4, group_size=None)
    q = fake_quant_weight(w, cfg)
    # per-row scale
    xmin = jnp.min(w, axis=-1, keepdims=True)
    xmax = jnp.max(w, axis=-1, keepdims=True)
    scale = (xmax - xmin) / 15.0
    err = jnp.abs(w - q)
    # rounding of zero-point adds up to one extra scale of error at the edges
    assert bool(jnp.all(err <= scale * 1.01))


def test_round_ste_gradient():
    g = jax.grad(lambda x: jnp.sum(round_ste(x) ** 2))(jnp.array([0.3, 1.7]))
    # d/dx (round(x)^2) with STE = 2*round(x)
    np.testing.assert_allclose(np.asarray(g), [0.0, 4.0], atol=1e-6)


def test_lwc_gradients_nonzero():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    cfg = QuantConfig(n_bits=3, lwc=True)
    lwc = init_lwc_params(cfg, w.shape)

    def loss(lwc):
        return jnp.sum((fake_quant_weight(w, cfg, lwc) - w) ** 2)

    g = jax.grad(loss)(lwc)
    assert float(jnp.sum(jnp.abs(g["upbound_factor"]))) > 0
    assert float(jnp.sum(jnp.abs(g["lowbound_factor"]))) > 0


def test_act_per_token():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 5, 32)).astype(np.float32))
    cfg = QuantConfig(n_bits=8, symmetric=False)
    q = fake_quant_act(x, cfg)
    assert q.shape == x.shape
    # per-token max error bounded by per-token scale
    xmin = jnp.min(x, axis=-1, keepdims=True)
    xmax = jnp.max(x, axis=-1, keepdims=True)
    scale = (xmax - xmin) / 255.0
    assert bool(jnp.all(jnp.abs(x - q) <= scale * 1.01))


def test_bits16_identity():
    x = jnp.asarray(np.random.default_rng(6).standard_normal((4, 8)), jnp.float32)
    cfg = QuantConfig(n_bits=16, metric="fix0to1")
    np.testing.assert_array_equal(np.asarray(fake_quant_act(x, cfg)), np.asarray(x))


def test_fix0to1():
    x = jnp.asarray([[0.0, 0.5, 1.0, 0.123]], jnp.float32)
    cfg = QuantConfig(n_bits=8, metric="fix0to1")
    q = fake_quant_act(x, cfg)
    np.testing.assert_allclose(
        np.asarray(q), np.round(np.asarray(x) * 255) / 255, atol=1e-7
    )


def test_int_roundtrip():
    """quantize_weight_int -> dequantize_weight_int == fake_quant_weight."""
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    for cfg in [QuantConfig(n_bits=4, group_size=16),
                QuantConfig(n_bits=2, group_size=32),
                QuantConfig(n_bits=3, symmetric=True, group_size=24)]:
        codes, scale, rzp = quantize_weight_int(w, cfg)
        assert codes.dtype == jnp.int32
        assert int(jnp.min(codes)) >= 0 and int(jnp.max(codes)) <= cfg.qmax
        deq = dequantize_weight_int(codes, scale, rzp, cfg, w.shape[1])
        fq = fake_quant_weight(w, cfg)
        np.testing.assert_allclose(np.asarray(deq), np.asarray(fq), atol=1e-5)
