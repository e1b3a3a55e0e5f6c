"""Aggregation metrics + bootstrap stderr (reference lm_eval/metrics.py)."""
from __future__ import annotations

import math
import random
from typing import List

import numpy as np


def mean(arr):
    return sum(arr) / len(arr)


def median(arr):
    return sorted(arr)[len(arr) // 2]


def perplexity(items):
    return math.exp(-mean(items))


def weighted_mean(items):
    a, b = zip(*items)
    return sum(a) / sum(b)


def weighted_perplexity(items):
    """items: [(loglikelihood, weight)] (reference lm_eval/metrics.py:103)."""
    return math.exp(-weighted_mean(items))


def bits_per_byte(items):
    return -weighted_mean(items) / math.log(2)


def matthews_corrcoef(items):
    golds, preds = zip(*items)
    tp = sum(1 for g, p in items if g == 1 and p == 1)
    tn = sum(1 for g, p in items if g == 0 and p == 0)
    fp = sum(1 for g, p in items if g == 0 and p == 1)
    fn = sum(1 for g, p in items if g == 1 and p == 0)
    denom = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return ((tp * tn) - (fp * fn)) / denom if denom else 0.0


def f1_score(items):
    golds, preds = zip(*items)
    tp = sum(1 for g, p in items if g == 1 and p == 1)
    fp = sum(1 for g, p in items if g == 0 and p == 1)
    fn = sum(1 for g, p in items if g == 1 and p == 0)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0


def bootstrap_stderr(fn, xs, iters: int = 1000):
    """Single-process bootstrap (the reference parallelizes over a pool,
    lm_eval/metrics.py:207-233; iters kept modest instead)."""
    rnd = random.Random(1234)
    res = []
    n = len(xs)
    for _ in range(iters):
        sample = [xs[rnd.randrange(n)] for _ in range(n)]
        res.append(fn(sample))
    return float(np.std(res))


def stderr_for_metric(metric, bootstrap_iters: int = 1000):
    if metric is mean or metric == mean:
        def _mean_stderr(xs):
            if len(xs) <= 1:
                return 0.0
            return float(np.std(xs, ddof=1) / math.sqrt(len(xs)))
        return _mean_stderr
    bootstrappable = {median, matthews_corrcoef, f1_score,
                      weighted_perplexity, bits_per_byte, perplexity}
    if metric in bootstrappable:
        return lambda xs: bootstrap_stderr(metric, xs, bootstrap_iters)
    return None
