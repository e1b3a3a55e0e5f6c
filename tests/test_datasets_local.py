"""Offline raw-file dataset loaders: parse synthetic raw artifacts in the
reference formats and feed the result straight into the matching tasks."""
import json
import os

import pytest

from omniquant_tpu.eval.harness import datasets_local as dl


def test_logiqa_loader(tmp_path):
    raw = ("b\nSome context.\nWhich option?\n"
           "A.first\nB.second\nC.third\nD.fourth\n\n"
           "a\nMore context.\nAnother question?\n"
           "A.one\nB.two\nC.three\nD.four\n")
    p = tmp_path / "Test.txt"
    p.write_text(raw)
    data = dl.load_logiqa(test_path=str(p))
    assert len(data["test"]) == 2
    doc = data["test"][0]
    assert doc["label"] == "b" and len(doc["options"]) == 4
    from omniquant_tpu.eval.harness.tasks_qa import LogiQA
    task = LogiQA(data=data)
    docs = list(task.test_docs())
    assert docs[0]["gold"] == 1


def test_unscramble_loader(tmp_path):
    p = tmp_path / "cycle_letters_in_word.jsonl"
    p.write_text(json.dumps({"context": "tac =", "completion": " cat"})
                 + "\n")
    data = dl.load_unscramble(str(p))
    assert data["validation"][0]["completion"] == " cat"


def test_asdiv_loader(tmp_path):
    xml = """<Machine-Reading-Corpus-File>
  <ProblemSet>
    <Problem ID="1" Grade="1" Source="x">
      <Body>Seven red apples.</Body>
      <Question>How many apples?</Question>
      <Solution-Type>Addition</Solution-Type>
      <Answer>7 (apples)</Answer>
      <Formula>7=7</Formula>
    </Problem>
  </ProblemSet>
</Machine-Reading-Corpus-File>"""
    p = tmp_path / "ASDiv.xml"
    p.write_text(xml)
    data = dl.load_asdiv(str(p))
    assert data["validation"][0]["answer"] == "7 (apples)"
    from omniquant_tpu.eval.harness.tasks_math import Asdiv
    task = Asdiv(data=data)
    doc = list(task.validation_docs())[0]
    assert task.doc_to_target(doc) == " 7"


def test_sat_analogies_loader(tmp_path):
    raw = ("# comment\n\n190 FROM REAL SATs\nlegend:legendary\n"
           "a:b\nc:d\ne:f\ng:h\ni:j\na\n")
    p = tmp_path / "SAT-package-V3.txt"
    p.write_text(raw)
    data = dl.load_sat_analogies(str(p))
    doc = data["validation"][0]
    assert doc["stem"] == "legend:legendary"
    assert doc["solution"] == "a" and len(doc["choices"]) == 5


def test_mutual_loader(tmp_path):
    base = tmp_path / "data" / "mutual" / "dev"
    os.makedirs(base)
    (base / "dev_1.txt").write_text(json.dumps({
        "article": "m : hello", "options": ["f : a", "f : b", "f : c",
                                            "f : d"], "answers": "B"}))
    data = dl.load_mutual(str(tmp_path))
    assert data["validation"][0]["answers"] == "B"


def test_coqa_loader(tmp_path):
    raw = {"data": [{
        "id": "x", "source": "wiki", "story": "A story.",
        "questions": [{"input_text": "q1?", "turn_id": 1}],
        "answers": [{"input_text": "a1", "turn_id": 1,
                     "span_start": 0, "span_end": 1, "span_text": "A"}],
        "additional_answers": {
            "0": [{"input_text": "a1x", "turn_id": 1,
                   "span_start": 0, "span_end": 1, "span_text": "A"}]},
    }]}
    p = tmp_path / "coqa-dev-v1.0.json"
    p.write_text(json.dumps(raw))
    data = dl.load_coqa(validation_json=str(p))
    from omniquant_tpu.eval.harness.tasks_gen import CoQA
    task = CoQA(data=data)
    doc = list(task.validation_docs())[0]
    assert task.get_answers(doc, 1) == ["a1", "a1x"]


def test_drop_loader(tmp_path):
    raw = {"sec1": {"passage": "P.", "qa_pairs": [{
        "query_id": "q1", "question": "How many?",
        "answer": {"number": "5", "date": {}, "spans": []},
        "validated_answers": [
            {"number": "5", "date": {}, "spans": []},
            {"number": "", "date": {}, "spans": ["five"]}],
    }]}}
    p = tmp_path / "drop_dataset_dev.json"
    p.write_text(json.dumps(raw))
    data = dl.load_drop(validation_json=str(p))
    from omniquant_tpu.eval.harness.tasks_gen import DROP
    task = DROP(data=data)
    doc = list(task.validation_docs())[0]
    assert ("5",) in doc["answers"] and ("five",) in doc["answers"]


def test_triviaqa_loader(tmp_path):
    raw = {"Data": [{"Question": "q?", "Answer": {
        "Value": "v", "Aliases": ["v", "vv"]},
        "SearchResults": []}]}
    p = tmp_path / "unfiltered-web-dev.json"
    p.write_text(json.dumps(raw))
    data = dl.load_triviaqa(validation_json=str(p))
    assert data["validation"][0]["answer"]["aliases"] == ["v", "vv"]


def test_quac_loader(tmp_path):
    raw = {"data": [{"title": "T", "section_title": "S", "paragraphs": [{
        "context": "ctx CANNOTANSWER",
        "qas": [{"question": "q?", "answers": [{"text": "ans"}]}]}]}]}
    p = tmp_path / "train_v0.2.json"
    p.write_text(json.dumps(raw))
    data = dl.load_quac(train_json=str(p))
    assert data["train"][0]["paragraph"] == "ctx "
    assert data["train"][0]["answer"] == "ans"


def test_ethics_loader(tmp_path):
    base = tmp_path / "ethics" / "justice"
    os.makedirs(base)
    (base / "justice_test.csv").write_text(
        "label,scenario\n1,I am fair.\n0,I am unfair.\n"
        "1,I share.\n0,I steal.\n")
    data = dl.load_hendrycks_ethics(str(tmp_path), "justice")
    assert len(data["test"]) == 4
    assert data["test"][0]["group_id"] == 0
    assert data["test"][3]["group_id"] == 0  # groups of 4


def test_ethics_virtue_sep_split(tmp_path):
    base = tmp_path / "ethics" / "virtue"
    os.makedirs(base)
    (base / "virtue_test.csv").write_text(
        "label,scenario\n1,He helped. [SEP] kindness\n")
    data = dl.load_hendrycks_ethics(str(tmp_path), "virtue")
    doc = data["test"][0]
    assert doc["scenario"] == "He helped." and doc["trait"] == "kindness"


def test_math_loader(tmp_path):
    base = tmp_path / "MATH" / "test" / "algebra"
    os.makedirs(base)
    (base / "1.json").write_text(json.dumps({
        "problem": "x?", "level": "Level 1", "type": "Algebra",
        "solution": "the answer is $\\boxed{4}$"}))
    data = dl.load_hendrycks_math(str(tmp_path), "algebra")
    from omniquant_tpu.eval.harness.tasks_math import MathAlgebra
    task = MathAlgebra(data=data)
    doc = list(task.test_docs())[0]
    assert doc["answer"] == "4"


def test_pile_loader(tmp_path):
    rows = [
        {"text": "code here", "meta": {"pile_set_name": "Github"}},
        {"text": "law here", "meta": {"pile_set_name": "FreeLaw"}},
    ]
    p = tmp_path / "test.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    data = dl.load_pile_subset(
        str(p), dl.PILE_SET_NAMES["github"])
    assert data["test"] == ["code here"]


def test_headqa_loader(tmp_path):
    raw = {"exams": {"e1": {"name": "n", "year": "2020 ", "category": "c ",
                            "data": [{
        "qid": " 1", "qtext": " q? ", "ra": " 2",
        "answers": [{"aid": 1, "atext": " x "}, {"aid": 2, "atext": "y"}],
    }]}}}
    p = tmp_path / "headqa.json"
    p.write_text(json.dumps(raw))
    data = dl.load_headqa(train_json=str(p))
    doc = data["train"][0]
    assert doc["ra"] == 2 and doc["answers"][0]["atext"] == "x"
