"""Uniform affine quantization — pure-function JAX core.

TPU-native re-implementation of the reference quantizer semantics
(reference: quantize/quantizer.py:15-152). Everything here is a pure function
over arrays + a frozen config, differentiable via straight-through estimators,
so the calibration loop can `jax.grad` through it with no module state.

Semantics intentionally matched to the reference:
  * qmin = 0, qmax = 2**n - 1 (reference quantize/quantizer.py:44-45)
  * symmetric: scale = absmax / (2**(n-1) - 1), fixed zero_point = 2**(n-1)-1,
    scale clamped to [1e-5, 1e4] (reference :136-140)
  * asymmetric: scale = (xmax - xmin) / (2**n - 1); NOTE the reference
    *re-assigns* the unclamped scale after clamping (quantize/quantizer.py:144-145),
    making the clamp dead code on the asymmetric path. We reproduce that
    behavior (guarding only against exact zero to avoid 0/0 NaNs).
  * LWC: xmax' = sigmoid(upbound) * xmax, xmin' = sigmoid(lowbound) * xmin,
    factors initialized to 4.0 (reference :62-73,133-135)
  * group quantization reshapes to (-1, group_size) (reference :89-92,123-129)
  * "deficiency" zero-padding when in_features % group_size != 0, symmetric
    only (reference :64-69,85-87,103-104)
  * bits >= 16 => identity (reference :109)
  * metric "fix0to1": fixed [0,1] rounding for softmax probs (reference :111-112);
    only reachable when n_bits < 16 because the >=16 early-exit comes first.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

CLIPMIN = 1e-5


def round_ste(x: jax.Array) -> jax.Array:
    """Round with straight-through gradient (reference quantize/quantizer.py:15-19)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def clamp_ste(x: jax.Array, lo, hi) -> jax.Array:
    """Clamp with straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Static configuration for one quantizer (hashable; safe as jit static arg)."""

    n_bits: int = 8
    symmetric: bool = False
    group_size: Optional[int] = None
    lwc: bool = False
    metric: str = "minmax"  # "minmax" | "fix0to1"
    # Structural escape hatch: disables quantization entirely (e.g. n_bits >= 16).
    @property
    def enabled(self) -> bool:
        return self.n_bits < 16

    def __post_init__(self):
        if not (2 <= self.n_bits <= 16):
            raise ValueError(f"bitwidth {self.n_bits} not supported (need 2..16)")

    @property
    def qmax(self) -> int:
        return 2**self.n_bits - 1

    @property
    def qmin(self) -> int:
        return 0

    def deficiency(self, in_features: int) -> int:
        """Zero-padding needed to make in_features a multiple of group_size."""
        if not self.group_size:
            return 0
        rem = in_features % self.group_size
        if rem == 0:
            return 0
        if not self.symmetric:
            raise ValueError(
                "group_size must divide in_features for asymmetric quantization "
                "(deficiency padding is symmetric-only, for packed-format compat)"
            )
        return self.group_size - rem

    def num_groups(self, shape) -> int:
        """Number of scale rows for a weight of `shape` (out, in)."""
        if self.group_size:
            return int(shape[0] * math.ceil(shape[1] / self.group_size))
        return int(shape[0])


def init_lwc_params(cfg: QuantConfig, weight_shape, dtype=jnp.float32) -> dict:
    """LWC learnable clipping factors, init 4.0 (reference quantize/quantizer.py:62-73)."""
    dim1 = cfg.num_groups(weight_shape)
    return {
        "upbound_factor": jnp.full((dim1, 1), 4.0, dtype=dtype),
        "lowbound_factor": jnp.full((dim1, 1), 4.0, dtype=dtype),
    }


def _scale_zp(xmin, xmax, cfg: QuantConfig):
    """Compute (scale, round_zero_point) from per-row/group min/max.

    Matches reference per_token_dynamic_calibration (quantize/quantizer.py:136-147),
    including the asymmetric-path clamp quirk (:144-145).
    """
    if cfg.symmetric:
        abs_max = jnp.maximum(jnp.abs(xmax), jnp.abs(xmin))
        scale = abs_max / (2 ** (cfg.n_bits - 1) - 1)
        scale = jnp.clip(scale, CLIPMIN, 1e4)
        zero_point = jnp.full_like(scale, float(2 ** (cfg.n_bits - 1) - 1))
    else:
        rng = xmax - xmin
        scale = rng / (2**cfg.n_bits - 1)
        # Reference :144-145 overwrites the clamped scale with the raw one; we
        # match that (no [CLIPMIN, 1e4] clamp) but avoid exact-zero division.
        scale = jnp.where(scale == 0, CLIPMIN, scale)
        zero_point = -xmin / scale
    round_zero_point = jnp.round(jnp.clip(zero_point, -1e4, 1e4))
    return scale, round_zero_point


def _clip_torch_grad(x, lo, hi):
    """Clip with torch.clamp's gradient semantics: grad 1 on [lo, hi]
    INCLUSIVE of the boundaries, 0 outside. jnp.clip (min∘max) splits the
    gradient 0.5/0.5 at exact boundary hits — and after round_ste many
    values land EXACTLY on qmin/qmax, so the difference is systematic and
    breaks LWC-gradient parity with the reference (verified by
    tests/test_reference_parity.py::test_lwc_gradients_match_reference)."""
    inside = (x >= lo) & (x <= hi)
    return jnp.where(inside, x, jax.lax.stop_gradient(jnp.clip(x, lo, hi)))


def _fake_quant_core(x, scale, round_zero_point, cfg: QuantConfig):
    """STE fake-quantization given precomputed scale/zp (reference :84-105 core)."""
    x_int = round_ste(x / scale)
    if round_zero_point is not None:
        x_int = x_int + round_zero_point
    x_int = _clip_torch_grad(x_int, cfg.qmin, cfg.qmax)
    x_deq = x_int
    if round_zero_point is not None:
        x_deq = x_deq - round_zero_point
    return x_deq * scale


def fake_quant_weight(
    w: jax.Array,
    cfg: QuantConfig,
    lwc_params: Optional[dict] = None,
) -> jax.Array:
    """Fake-quantize a 2-D weight (out, in), per-channel axis 0 or grouped.

    Differentiable w.r.t. both `w` and `lwc_params` (sigmoid clipping bounds).
    Mirrors reference forward() -> per_token_dynamic_calibration -> fake_quant
    for the weight path (dynamic_method='per_channel').
    """
    if not cfg.enabled:
        return w
    out_f, in_f = w.shape
    deficiency = cfg.deficiency(in_f)
    xq = w
    if deficiency:
        xq = jnp.pad(xq, ((0, 0), (0, deficiency)))
    if cfg.group_size:
        xq = xq.reshape(-1, cfg.group_size)
    xmin = jnp.min(xq, axis=-1, keepdims=True)
    xmax = jnp.max(xq, axis=-1, keepdims=True)
    if cfg.lwc:
        if lwc_params is None:
            raise ValueError("cfg.lwc=True requires lwc_params")
        xmax = jax.nn.sigmoid(lwc_params["upbound_factor"]) * xmax
        xmin = jax.nn.sigmoid(lwc_params["lowbound_factor"]) * xmin
    scale, rzp = _scale_zp(xmin, xmax, cfg)
    xdq = _fake_quant_core(xq, scale, rzp, cfg)
    if cfg.group_size:
        xdq = xdq.reshape(out_f, in_f + deficiency)
    if deficiency:
        xdq = xdq[:, :in_f]
    return xdq


def weight_scale_zp(
    w: jax.Array, cfg: QuantConfig, lwc_params: Optional[dict] = None
):
    """Return (scale, round_zero_point) for a weight, shapes (num_groups, 1).

    The export-path analog of register_scales_and_zeros (reference :149-152).
    """
    out_f, in_f = w.shape
    deficiency = cfg.deficiency(in_f)
    xq = w
    if deficiency:
        xq = jnp.pad(xq, ((0, 0), (0, deficiency)))
    if cfg.group_size:
        xq = xq.reshape(-1, cfg.group_size)
    xmin = jnp.min(xq, axis=-1, keepdims=True)
    xmax = jnp.max(xq, axis=-1, keepdims=True)
    if cfg.lwc and lwc_params is not None:
        xmax = jax.nn.sigmoid(lwc_params["upbound_factor"]) * xmax
        xmin = jax.nn.sigmoid(lwc_params["lowbound_factor"]) * xmin
    return _scale_zp(xmin, xmax, cfg)


def quantize_weight_int(
    w: jax.Array, cfg: QuantConfig, lwc_params: Optional[dict] = None
):
    """Hard-quantize to integer codes. Returns (codes int32 (out, in_padded),
    scale, round_zero_point) — the real-quant export path
    (reference quantize/omniquant.py:255-277 packs these via AutoGPTQ)."""
    out_f, in_f = w.shape
    deficiency = cfg.deficiency(in_f)
    xq = w
    if deficiency:
        xq = jnp.pad(xq, ((0, 0), (0, deficiency)))
    grouped = xq.reshape(-1, cfg.group_size) if cfg.group_size else xq
    scale, rzp = weight_scale_zp(w, cfg, lwc_params)
    codes = jnp.clip(jnp.round(grouped / scale) + rzp, cfg.qmin, cfg.qmax)
    codes = codes.reshape(out_f, in_f + deficiency).astype(jnp.int32)
    return codes, scale, rzp


def dequantize_weight_int(codes, scale, rzp, cfg: QuantConfig, in_features: int):
    """Inverse of quantize_weight_int (strips deficiency padding)."""
    out_f = codes.shape[0]
    grouped = codes.reshape(-1, cfg.group_size) if cfg.group_size else codes
    deq = (grouped.astype(scale.dtype) - rzp) * scale
    deq = deq.reshape(out_f, -1)
    return deq[:, :in_features]


def fake_quant_act(x: jax.Array, cfg: QuantConfig) -> jax.Array:
    """Per-token dynamic fake-quantization over the last axis.

    The activation path (reference forward :108-120 with
    dynamic_method='per_token'): scale/zp recomputed per call from the data.
    Also handles metric='fix0to1' (fixed [0,1] grid, reference :111-112).
    Works for any rank; reduces the last axis (optionally grouped).
    """
    if not cfg.enabled:
        return x
    if cfg.metric == "fix0to1":
        q = 2**cfg.n_bits - 1
        return round_ste(x * q) / q
    orig_shape = x.shape
    if cfg.group_size:
        deficiency = cfg.deficiency(orig_shape[-1])
        if deficiency:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, deficiency)]
            x = jnp.pad(x, pad)
        x = x.reshape(-1, cfg.group_size)
    xmin = jnp.min(x, axis=-1, keepdims=True)
    xmax = jnp.max(x, axis=-1, keepdims=True)
    scale, rzp = _scale_zp(xmin, xmax, cfg)
    xdq = _fake_quant_core(x, scale, rzp, cfg)
    if cfg.group_size:
        xdq = xdq.reshape(*orig_shape[:-1], -1)[..., : orig_shape[-1]]
    return xdq
