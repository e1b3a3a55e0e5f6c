"""Strided-window perplexity evaluation (reference main.py:98-148).

Non-overlapping seqlen windows, shifted cross-entropy, f32 loss, and
ppl = exp(sum_nll / (nsamples * seqlen)) — exactly the reference's formula
so numbers are directly comparable.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.common import ActQuantSpec, NO_ACT_QUANT
from ..models.registry import ModelFamily


def evaluate_ppl(
    family: ModelFamily,
    params: dict,
    model_cfg,
    test_tokens,  # (1, total) int32
    seqlen: int = 2048,
    spec: ActQuantSpec = NO_ACT_QUANT,
    limit: Optional[int] = None,
    logger=None,
) -> float:
    log = logger.info if logger else (lambda *a: None)
    test_tokens = np.asarray(test_tokens).reshape(-1)
    nsamples = test_tokens.shape[0] // seqlen

    @jax.jit
    def window_nll(params, tokens):
        logits = family.forward(params, tokens[None], model_cfg, spec)
        logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
        tgt = tokens[1:]
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1).mean()
        return nll * seqlen

    nlls = []
    for i in range(nsamples):
        window = jnp.asarray(
            test_tokens[i * seqlen : (i + 1) * seqlen], jnp.int32)
        nlls.append(window_nll(params, window))
        if limit is not None and i == limit:
            break
    # NOTE: with limit set, the divisor stays the FULL nsamples — faithful to
    # the reference quirk (main.py:142-145 divides by `nsamples` even when
    # early-stopped at args.limit). Do not "fix" this side alone: limited-run
    # ppl values are only comparable against the reference's limited runs.
    ppl = float(jnp.exp(jnp.sum(jnp.stack(nlls)) / (nsamples * seqlen)))
    return ppl
