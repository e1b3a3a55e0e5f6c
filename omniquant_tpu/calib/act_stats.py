"""Activation statistics for LET initialization.

TPU-native equivalent of generate_act_scale_shift.py (reference :25-94):
instead of forward hooks on nn.Linear, the functional block forwards expose
a `tap` dict of per-linear input activations; a jitted per-block pass folds
them into running statistics.

  scales[name] = running per-channel max of |x|        (reference :30-37)
  shifts[name] = EMA_{0.99,0.01} of (max+min)/2        (reference :64-72)
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.common import causal_mask
from ..models.registry import ModelFamily


def collect_act_stats(
    family: ModelFamily,
    params: dict,
    model_cfg,
    calib_tokens: jax.Array,  # (nsamples, seqlen)
    batch: int = 4,
    logger=None,
):
    """Returns (scales, shifts): lists (one dict per layer) of per-linear
    input-channel statistics, keyed by our linear names."""
    log = logger.info if logger else (lambda *a: None)
    n, seqlen = calib_tokens.shape
    mask = causal_mask(seqlen, seqlen)
    positions = jnp.arange(seqlen)
    emb_params = {k: v for k, v in params.items() if k != "layers"}

    embed_fn = jax.jit(lambda p, t: family.embed(p, t, model_cfg))

    @jax.jit
    def block_with_taps(layer, xs):
        tap = {}
        ys, _ = family.block_forward(
            layer, xs, model_cfg, mask, positions, tap=tap)
        stats = {}
        for name, act in tap.items():
            flat = act.reshape(-1, act.shape[-1]).astype(jnp.float32)
            stats[name] = {
                "absmax": jnp.max(jnp.abs(flat), axis=0),
                "mid": (jnp.max(flat, axis=0) + jnp.min(flat, axis=0)) / 2.0,
            }
        return ys, stats

    scales, shifts = [], []
    xs = jnp.concatenate(
        [embed_fn(emb_params, calib_tokens[i : i + 8]) for i in range(0, n, 8)]
    )
    for li, layer in enumerate(params["layers"]):
        layer_scales, layer_shifts = {}, {}
        outs = []
        for i in range(0, n, batch):
            ys, stats = block_with_taps(layer, xs[i : i + batch])
            outs.append(ys)
            for name, st in stats.items():
                if name not in layer_scales:
                    layer_scales[name] = st["absmax"]
                    layer_shifts[name] = st["mid"]
                else:
                    layer_scales[name] = jnp.maximum(
                        layer_scales[name], st["absmax"])
                    layer_shifts[name] = (
                        0.99 * layer_shifts[name] + 0.01 * st["mid"])
        xs = jnp.concatenate(outs)
        scales.append(layer_scales)
        shifts.append(layer_shifts)
        log(f"act stats: layer {li} done")
    return scales, shifts
