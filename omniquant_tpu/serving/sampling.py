"""On-device token sampling for the serving engine.

The reference's deployment path delegates sampling to MLC-LLM's ChatModule
(temperature / top-p runtime params, README.md:138-170 deployment recipe);
here it is a pure jnp function fused into the jitted decode step so the host
still only ever receives (B,) int32 tokens per step.

All controls are *per-slot* arrays — continuous batching means each live
request can carry its own temperature / top-k / top-p. Greedy slots
(temperature <= 0) take an argmax inside the same computation, so mixed
greedy/sampled batches run in one program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_tokens(logits, key, temperature, top_k, top_p):
    """Sample one token per row of `logits`.

    Args:
      logits: (B, V) float — unnormalized scores.
      key: jax PRNG key (shared; per-row independence comes from the
        per-row Gumbel draws of `jax.random.categorical`).
      temperature: (B,) float. <= 0 means greedy (argmax) for that row.
      top_k: (B,) int32. 0 (or >= V) disables top-k for that row.
      top_p: (B,) float in (0, 1]. 1.0 disables nucleus filtering.

    Returns:
      (B,) int32 token ids.
    """
    logits = logits.astype(jnp.float32)
    B, V = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp

    # One descending sort serves both filters.
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]  # (B, V)

    # top-k: threshold at the k-th largest scaled logit (1-indexed).
    k = jnp.where((top_k <= 0) | (top_k >= V), V, top_k)
    kth = jnp.take_along_axis(
        sorted_desc, (k.astype(jnp.int32) - 1)[:, None], axis=-1)  # (B, 1)
    keep = scaled >= kth

    # top-p (nucleus): keep the smallest prefix of the descending
    # distribution whose mass reaches top_p; `cum - p < top_p` includes the
    # token that crosses the boundary (standard nucleus convention).
    probs_desc = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_desc, axis=-1)
    in_nucleus = (cum - probs_desc) < top_p[:, None]
    # cutoff = smallest scaled logit still inside the nucleus
    cutoff = jnp.min(
        jnp.where(in_nucleus, sorted_desc, jnp.inf), axis=-1, keepdims=True)
    keep = keep & (scaled >= cutoff)

    masked = jnp.where(keep, scaled, -jnp.inf)
    drawn = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, drawn)
