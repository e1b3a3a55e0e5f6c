"""Evaluation-harness tests with injected offline task data and a tiny
char-level tokenizer (no network)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omniquant_tpu.eval.harness import (
    JaxLM,
    TASK_REGISTRY,
    get_rolling_token_windows,
    make_disjoint_window,
    mmlu_rollup,
    pattern_match,
    simple_evaluate,
    make_table,
)
from omniquant_tpu.models import OPT
from omniquant_tpu.models import opt as jopt


class CharTokenizer:
    """ASCII char-level tokenizer for offline tests."""

    eos_token_id = 0

    def encode(self, s, add_special_tokens=False):
        return [min(ord(c), 127) for c in s]

    def decode(self, tokens):
        return "".join(chr(max(1, t)) for t in tokens)


@pytest.fixture(scope="module")
def lm():
    cfg = jopt.OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=256,
    )
    params = jopt.init_params(jax.random.PRNGKey(0), cfg)
    return JaxLM(OPT, params, cfg, CharTokenizer(), seqlen=128, batch_size=4)


def test_pattern_match():
    names = pattern_match(["hendrycksTest-*"], TASK_REGISTRY.keys())
    assert len(names) == 57
    assert pattern_match(["piqa"], TASK_REGISTRY.keys()) == ["piqa"]


def test_rolling_windows():
    toks = list(range(10))
    windows = [make_disjoint_window(w) for w in
               get_rolling_token_windows(toks, -1, 4, 1)]
    # every token predicted exactly once
    predicted = [t for _, pred in windows for t in pred]
    assert predicted == toks
    assert windows[0][0] == [-1, 0, 1, 2][: len(windows[0][0])]


def test_loglikelihood_consistency(lm):
    """Sum of per-token logprobs via LM == direct forward computation."""
    ctx, cont = "hello ", "world"
    (ll, greedy), = lm.loglikelihood([(ctx, cont)])
    assert np.isfinite(ll) and ll < 0
    # additivity: ll(ctx, a+b) == ll(ctx, a) + ll(ctx+a, b)
    ll_ab = lm.loglikelihood([("ab", "cdef")])[0]
    ll_a, ll_b = lm.loglikelihood([("ab", "cd"), ("abcd", "ef")])
    np.testing.assert_allclose(ll_ab[0], ll_a[0] + ll_b[0], atol=1e-3)


def test_greedy_until(lm):
    out = lm.greedy_until([("abc", ["\n"])])
    assert isinstance(out[0], str)


def test_multiple_choice_task_end_to_end(lm):
    data = {
        "train": [
            {"goal": f"goal {i}", "sol1": "good answer", "sol2": "bad",
             "label": i % 2}
            for i in range(8)
        ],
        "validation": [
            {"goal": f"val goal {i}", "sol1": "alpha", "sol2": "beta",
             "label": i % 2}
            for i in range(6)
        ],
    }
    res = simple_evaluate(
        lm, ["piqa"], num_fewshot=0, limit=4, task_data={"piqa": data})
    assert "piqa" in res["results"]
    assert 0.0 <= res["results"]["piqa"]["acc"] <= 1.0
    assert "acc_stderr" in res["results"]["piqa"]
    table = make_table(res)
    assert "piqa" in table


def test_fewshot_context(lm):
    data = {
        "train": [
            {"goal": f"goal {i}", "sol1": "x", "sol2": "y", "label": 0}
            for i in range(8)
        ],
        "validation": [
            {"goal": "val", "sol1": "x", "sol2": "y", "label": 0}],
    }
    res = simple_evaluate(
        lm, ["piqa"], num_fewshot=2, limit=1, task_data={"piqa": data})
    assert "piqa" in res["results"]


def test_boolq_and_winogrande(lm):
    boolq_data = {
        "train": [],
        "validation": [
            {"passage": "The sky is blue.", "question": "is the sky blue",
             "label": 1},
            {"passage": "Grass is green.", "question": "is grass red",
             "label": 0},
        ],
    }
    wino_data = {
        "train": [],
        "validation": [
            {"sentence": "The cup fell because _ was heavy.",
             "option1": "the cup", "option2": "the table", "answer": "1"},
        ],
    }
    res = simple_evaluate(
        lm, ["boolq", "winogrande"], limit=None,
        task_data={"boolq": boolq_data, "winogrande": wino_data})
    assert set(res["results"]) == {"boolq", "winogrande"}


def test_hendrycks_and_rollup(lm):
    subj_data = {
        "validation": [],
        "test": [
            {"question": "2+2?", "choices": ["1", "4", "3", "2"], "answer": 1},
            {"question": "3+3?", "choices": ["6", "4", "3", "2"], "answer": 0},
        ],
    }
    res = simple_evaluate(
        lm, ["hendrycksTest-abstract_algebra", "hendrycksTest-anatomy"],
        task_data={"hendrycksTest-abstract_algebra": subj_data,
                   "hendrycksTest-anatomy": subj_data})
    rollup = mmlu_rollup(res["results"])
    assert "mmlu_average" in rollup
    assert "mmlu_category:STEM" in rollup


def test_perplexity_task(lm):
    data = {"test": ["hello world this is a test document",
                     "another doc here"]}

    class _WT(TASK_REGISTRY["wikitext"]):
        def _docs(self, split):
            return self._data["test"]

    from omniquant_tpu.eval.harness.evaluator import evaluate

    res = evaluate(lm, {"wikitext": _WT(data=data)})
    r = res["results"]["wikitext"]
    assert r["word_perplexity"] > 1.0
    assert r["byte_perplexity"] > 1.0
    assert r["bits_per_byte"] > 0.0
