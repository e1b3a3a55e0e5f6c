"""Calibration & evaluation data pipeline.

Re-implementation of the reference's loaders (datautils.py:16-195) with the
same seeding/windowing semantics (python `random.seed(seed)` then
`random.randint` draws, so sampled windows are bit-identical to the
reference given the same tokenized corpus), plus a synthetic corpus for
network-free environments.

Each loader returns (train_windows, test_tokens):
  train_windows: int32 (nsamples, seqlen) — random seqlen-token windows
  test_tokens:   int32 (1, total_len) — the eval corpus encoding
"""
from __future__ import annotations

import random
from typing import Optional

import numpy as np


def sample_windows(token_ids: np.ndarray, nsamples: int, seed: int,
                   seqlen: int) -> np.ndarray:
    """The reference's sampling loop (datautils.py:45-53): seeded
    random.randint over [0, len - seqlen - 1]."""
    token_ids = np.asarray(token_ids).reshape(-1)
    rng = random.Random(seed)
    out = np.empty((nsamples, seqlen), dtype=np.int32)
    for s in range(nsamples):
        i = rng.randint(0, token_ids.shape[0] - seqlen - 1)
        out[s] = token_ids[i : i + seqlen]
    return out


def _tokenize_join(texts, tokenizer, joiner="\n\n"):
    return np.asarray(tokenizer(joiner.join(texts)).input_ids, dtype=np.int32)


def get_wikitext2(nsamples, seed, seqlen, tokenizer):
    """reference datautils.py:35-54."""
    from datasets import load_dataset

    train = load_dataset("wikitext", "wikitext-2-raw-v1", split="train")
    test = load_dataset("wikitext", "wikitext-2-raw-v1", split="test")
    trainenc = _tokenize_join(train["text"], tokenizer)
    testenc = _tokenize_join(test["text"], tokenizer)
    return sample_windows(trainenc, nsamples, seed, seqlen), testenc[None]


def get_ptb(nsamples, seed, seqlen, tokenizer, new: bool = False):
    """reference datautils.py:56-76 (val split) / :120-140 ('new': test
    split, space-joined)."""
    from datasets import load_dataset

    train = load_dataset("ptb_text_only", "penn_treebank", split="train")
    evals = load_dataset(
        "ptb_text_only", "penn_treebank", split="test" if new else "validation")
    joiner = " " if new else "\n\n"
    trainenc = _tokenize_join(train["sentence"], tokenizer, joiner)
    testenc = _tokenize_join(evals["sentence"], tokenizer, joiner)
    return sample_windows(trainenc, nsamples, seed, seqlen), testenc[None]


def get_c4(nsamples, seed, seqlen, tokenizer, new: bool = False):
    """reference datautils.py:78-118 / :143-171."""
    from datasets import load_dataset

    train = load_dataset(
        "allenai/c4", data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
        split="train")
    val = load_dataset(
        "allenai/c4",
        data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
        split="validation")

    rng = random.Random(seed)
    windows = np.empty((nsamples, seqlen), dtype=np.int32)
    for s in range(nsamples):
        while True:
            i = rng.randint(0, len(train) - 1)
            enc = np.asarray(tokenizer(train[i]["text"]).input_ids, np.int32)
            # accept at >= seqlen, exactly like the reference (datautils.py:96)
            if enc.shape[0] >= seqlen:
                break
        # The reference draws randint(0, len - seqlen - 1) (datautils.py:98),
        # which CRASHES when len == seqlen (randint over an empty range). We
        # clamp the upper bound to 0 there: bit-identical draw sequence
        # everywhere the reference doesn't crash, and a defined window (the
        # whole doc) where it does.
        i = rng.randint(0, max(0, enc.shape[0] - seqlen - 1))
        windows[s] = enc[i : i + seqlen]

    if new:
        valenc = _tokenize_join(val[:1100]["text"], tokenizer, " ")
        valenc = valenc[: 256 * seqlen]
    else:
        rng = random.Random(0)
        parts = []
        for _ in range(256):
            while True:
                i = rng.randint(0, len(val) - 1)
                enc = np.asarray(tokenizer(val[i]["text"]).input_ids, np.int32)
                if enc.shape[0] >= seqlen:
                    break
            i = rng.randint(0, max(0, enc.shape[0] - seqlen - 1))
            parts.append(enc[i : i + seqlen])
        valenc = np.concatenate(parts)
    return windows, valenc[None]


def get_synthetic(nsamples, seed, seqlen, vocab_size=256, total_len=200_000,
                  phrase_len=512, noise=0.1):
    """Network-free corpus: a fixed random phrase tiled with token noise.

    Every window is a (noisy, shifted) view of the same phrase, so a tiny
    LM generalizes from any train windows to the test split — which makes
    quantization-induced ppl degradation measurable, unlike a pure-noise
    corpus. Deterministic in (seed, sizes)."""
    rng = np.random.default_rng(seed)
    phrase = rng.integers(0, vocab_size, size=phrase_len)
    reps = total_len // phrase_len + 1
    stream = np.tile(phrase, reps)[:total_len]
    noise_toks = rng.integers(0, vocab_size, size=total_len)
    flip = rng.random(total_len) < noise
    corpus = np.where(flip, noise_toks, stream).astype(np.int32)
    split = int(total_len * 0.9)
    train, test = corpus[:split], corpus[split:]
    return sample_windows(train, nsamples, seed, seqlen), test[None]


def get_pile(nsamples, seed, seqlen, tokenizer, data_files=None):
    """reference datautils.py:16-32 (path made configurable instead of the
    hardcoded private cluster file)."""
    from datasets import load_dataset

    data_files = data_files or "val.jsonl.zst"
    train = load_dataset("json", data_files=data_files, split="train")
    trainenc = _tokenize_join(train["text"][:1000], tokenizer)
    return sample_windows(trainenc, nsamples, seed, seqlen), None


def get_loaders(name: str, nsamples=128, seed=0, seqlen=2048, tokenizer=None,
                vocab_size: int = 256, pile_data_files=None):
    """Dispatch mirroring reference get_loaders (datautils.py:174-195)."""
    if "synthetic" in name:
        return get_synthetic(nsamples, seed, seqlen, vocab_size)
    if tokenizer is None:
        raise ValueError(f"dataset '{name}' needs a tokenizer")
    if "pile" in name:
        return get_pile(nsamples, seed, seqlen, tokenizer, pile_data_files)
    if "wikitext2" in name:
        return get_wikitext2(nsamples, seed, seqlen, tokenizer)
    if "ptb" in name:
        return get_ptb(nsamples, seed, seqlen, tokenizer, new="new" in name)
    if "c4" in name:
        return get_c4(nsamples, seed, seqlen, tokenizer, new="new" in name)
    if "mix" in name:
        w, _ = get_wikitext2(nsamples // 3, seed, seqlen, tokenizer)
        p, _ = get_ptb(nsamples // 3, seed, seqlen, tokenizer)
        c, _ = get_c4(nsamples // 3, seed, seqlen, tokenizer)
        return np.concatenate([w, p, c]), None
    raise ValueError(f"unknown dataset {name}")
