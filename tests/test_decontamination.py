"""Decontamination (13-gram janitor, C extension + fallback), CachingLM,
DummyLM tests."""
import string

import pytest

from omniquant_tpu.decontamination import Janitor, get_train_overlap
from omniquant_tpu.decontamination.janitor import _py_clean_ngram, _try_build_ext
from omniquant_tpu.eval.harness import CachingLM, DummyLM


WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
         "kilo lima mike november oscar papa quebec romeo sierra tango")


def test_c_extension_builds_and_matches_python():
    ext = _try_build_ext()
    assert ext is not None, "C extension failed to build (cc available?)"
    text = "Hello, World! This is a TEST-case; punctuation gone. " + WORDS
    for n in (2, 5, 13):
        got = ext.clean_ngram(text, string.punctuation, n)
        ref = _py_clean_ngram(text, string.punctuation, n, False)
        assert got == ref, (n, got[:3], ref[:3])
        got_i = ext.clean_ngram_with_indices(text, string.punctuation, n)
        ref_i = _py_clean_ngram(text, string.punctuation, n, True)
        assert got_i == ref_i


def test_janitor_detects_contamination():
    jan = Janitor(ngram_n=5, minimum_slice_length=5, window_to_remove=10)
    test_doc = WORDS
    jan.register_contaminant(test_doc)
    dirty = "prefix words here " + WORDS + " suffix words after"
    assert jan.contaminated(dirty)
    clean_doc = "completely different text with no overlapping n grams at all " * 3
    assert not jan.contaminated(clean_doc)


def test_janitor_clean_splits_chunks():
    jan = Janitor(ngram_n=3, minimum_slice_length=10, window_to_remove=2)
    jan.register_contaminant("secret leaked phrase")
    doc = ("a long stretch of perfectly fine text here . " +
           "the secret leaked phrase appears . " +
           "and afterwards more fine text continues on for a while")
    chunks = jan.clean(doc)
    assert chunks, "should return surrounding clean chunks"
    assert all("secret leaked phrase" not in c for c in chunks)


def test_janitor_too_dirty_returns_empty():
    jan = Janitor(ngram_n=2, too_dirty_cutoff=2)
    jan.register_contaminant("bad words")
    doc = " junk ".join(["bad words"] * 10)
    assert jan.clean(doc) == []


def test_get_train_overlap():
    docs = {"taskA": [WORDS, "totally clean document text"]}
    train = ["irrelevant stuff", "... " + WORDS + " ..."]
    overlaps = get_train_overlap(docs, train_docs=train, ngrams_n_size=5)
    assert overlaps["taskA"] == {0}


def test_caching_lm(tmp_path):
    class CountingLM(DummyLM):
        calls = 0

        def loglikelihood(self, requests):
            CountingLM.calls += len(requests)
            return [(-1.5, True) for _ in requests]

    lm = CachingLM(CountingLM(), str(tmp_path / "cache.db"))
    reqs = [("ctx a", "cont a"), ("ctx b", "cont b")]
    r1 = lm.loglikelihood(reqs)
    assert CountingLM.calls == 2
    r2 = lm.loglikelihood(reqs)
    assert CountingLM.calls == 2  # served from cache
    assert r1 == r2 == [(-1.5, True), (-1.5, True)]


def test_dummy_lm():
    lm = DummyLM()
    lls = lm.loglikelihood([("a", "b")] * 3)
    assert len(lls) == 3 and all(-1 <= ll <= 0 for ll, _ in lls)
    assert lm.greedy_until([("x", ["\n"])]) == ["lol"]


def test_cachinglm_fingerprint_isolates_configs(tmp_path):
    """One sqlite db reused across model/quant configs must NOT serve
    another fingerprint's cached scores (a --wbits 3 run reading a
    --wbits 4 cache would silently report W4 accuracies)."""
    class Counting(DummyLM):
        def __init__(self):
            self.calls = 0

        def loglikelihood(self, requests):
            self.calls += len(requests)
            return [(-1.5, True) for _ in requests]

    db = str(tmp_path / "shared.db")
    a_inner, b_inner = Counting(), Counting()
    a = CachingLM(a_inner, db, fingerprint="w4")
    b = CachingLM(b_inner, db, fingerprint="w3")
    reqs = [("ctx", "cont")]
    a.loglikelihood(reqs)
    assert a_inner.calls == 1
    b.loglikelihood(reqs)
    assert b_inner.calls == 1  # different fingerprint: no cross-hit
    a.loglikelihood(reqs)
    assert a_inner.calls == 1  # same fingerprint: hit
