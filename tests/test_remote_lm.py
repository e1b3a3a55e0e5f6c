"""Remote-API LM adapters with fake transports (offline)."""
import math

import pytest

from omniquant_tpu.eval.harness.remote import (
    OpenAICompletionLM, TextSynthStyleLM, get_result, retry_with_backoff)


def tok_encode(s):
    """Stub codec: one token per character (ord)."""
    return [ord(c) for c in s]


def tok_decode(toks):
    return "".join(chr(t) for t in toks)


class FakeCompletionsAPI:
    """Echo-scoring fake: every token scores logprob -0.5; greedy unless the
    token is 'x'. Generation returns ' yes.' regardless of prompt."""

    def __init__(self):
        self.calls = []

    def __call__(self, payload):
        self.calls.append(payload)
        choices = []
        for inp in payload["prompt"]:
            toks = [chr(t) for t in inp]
            if payload.get("echo") and payload.get("max_tokens") == 0:
                choices.append({
                    "logprobs": {
                        "tokens": toks,
                        "token_logprobs": [-0.5] * len(toks),
                        "top_logprobs": [
                            {t: -0.5} if t != "x" else {"y": -0.1, t: -0.5}
                            for t in toks
                        ],
                    }
                })
            else:
                choices.append({"text": " yes. and more"})
        return {"choices": choices}


def make_lm(api=None):
    api = api or FakeCompletionsAPI()
    lm = OpenAICompletionLM(
        transport=api, tok_encode=tok_encode, tok_decode=tok_decode,
        eot_token_id=0, max_length=64, max_gen_toks=16,
        sleeper=lambda s: None)
    return lm, api


def test_loglikelihood_and_greedy_flag():
    lm, api = make_lm()
    res = lm.loglikelihood([("ab", "cd"), ("a", "bx")])
    # continuation logprobs: 2 tokens x -0.5
    assert res[0] == pytest.approx((-1.0, True))
    # the 'x' token's top token differs -> not greedy
    assert res[1][0] == pytest.approx(-1.0)
    assert res[1][1] is False
    # echo scoring payload shape
    assert api.calls[0]["echo"] and api.calls[0]["max_tokens"] == 0


def test_loglikelihood_chunking_and_order():
    lm, api = make_lm()
    reqs = [(f"ctx{i:02d}", "z" * (i % 5 + 1)) for i in range(45)]
    res = lm.loglikelihood(reqs)
    assert len(res) == 45
    # results are in ORIGINAL order with per-request continuation lengths
    for (_, cont), (lp, _) in zip(reqs, res):
        assert lp == pytest.approx(-0.5 * len(cont))
    # 45 requests / chunk 20 -> 3 calls
    assert len(api.calls) == 3


def test_context_window_truncation():
    lm, api = make_lm()
    long_ctx = "c" * 100  # max_length 64 -> window 65
    lm.loglikelihood([(long_ctx, "dd")])
    inp = api.calls[0]["prompt"][0]
    assert len(inp) == 65  # max_length + 1, left-truncated


def test_greedy_until_stops_and_orders():
    lm, api = make_lm()
    out = lm.greedy_until([("q1", ["."]), ("q2longer", ["."]),
                           ("q3", ["\n"])])
    assert out[0] == " yes" and out[1] == " yes"
    assert out[2] == " yes. and more"  # no stop hit
    # same-until chunking breaks whenever the stop set changes in the
    # length-sorted order (reference gpt3.py:179-186): q1/q3/q2longer
    # alternate stop sets -> three calls
    assert len(api.calls) == 3
    assert all(c["stop"] in (["."], ["\n"]) for c in api.calls)


def test_rolling_loglikelihood():
    lm, _ = make_lm()
    (total,) = lm.loglikelihood_rolling([("hello world",)])
    # every token scores -0.5; rolling covers all 11 tokens exactly once
    assert total == pytest.approx(-0.5 * 11)


def test_retry_backoff():
    sleeps = []
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise ConnectionError("boom")
        return 42

    assert retry_with_backoff(flaky, sleeper=sleeps.append) == 42
    assert sleeps == [3.0, 4.5]


def test_textsynth_style():
    calls = []

    def transport(path, payload):
        calls.append((path, payload))
        if path == "logprob":
            return {"logprob": -2.5, "is_greedy": True}
        return {"text": "generated!"}

    lm = TextSynthStyleLM(transport, sleeper=lambda s: None)
    assert lm.loglikelihood([("a", "b")]) == [(-2.5, True)]
    assert lm.greedy_until([("prompt", ["\n"])]) == ["generated!"]
    assert calls[1][1]["stop"] == ["\n"] and calls[1][1]["top_k"] == 1
    with pytest.raises(NotImplementedError):
        lm.loglikelihood_rolling([("s",)])
