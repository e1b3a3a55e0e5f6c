"""Evaluator: docs -> fewshot contexts -> batched LM calls -> metrics.

Re-design of the reference's modified evaluator (lm_eval/evaluator.py:18-314):
fnmatch task patterns, doc shuffle with seed 42, requests grouped by type
with ONE batched LM call per type, per-doc process_results, aggregation +
bootstrap stderr, and the markdown table writer.
"""
from __future__ import annotations

import collections
import fnmatch
import random
from typing import List, Optional

from .base import LM
from .metrics import stderr_for_metric
from .tasks import TASK_REGISTRY


def pattern_match(patterns, source_list):
    """reference lm_eval/evaluator.py:11-16."""
    task_names = set()
    for pattern in patterns:
        for matching in fnmatch.filter(source_list, pattern):
            task_names.add(matching)
    return sorted(task_names)


def get_task_dict(task_names, task_data: Optional[dict] = None):
    out = {}
    for name in task_names:
        ctor = TASK_REGISTRY[name]
        data = (task_data or {}).get(name)
        out[name] = ctor(data=data) if data is not None else ctor()
    return out


def simple_evaluate(lm: LM, tasks: List[str], num_fewshot: int = 0,
                    limit: Optional[int] = None,
                    task_data: Optional[dict] = None,
                    bootstrap_iters: int = 1000):
    task_names = pattern_match(tasks, TASK_REGISTRY.keys())
    if not task_names:
        raise ValueError(f"no tasks match {tasks}")
    task_dict = get_task_dict(task_names, task_data)
    results = evaluate(lm, task_dict, num_fewshot=num_fewshot, limit=limit,
                       bootstrap_iters=bootstrap_iters)
    results["config"] = {
        "num_fewshot": num_fewshot,
        "limit": limit,
    }
    return results


def evaluate(lm: LM, task_dict: dict, num_fewshot: int = 0,
             limit: Optional[int] = None, bootstrap_iters: int = 1000):
    results = collections.defaultdict(dict)
    versions = {}

    requests = collections.defaultdict(list)
    requests_origin = collections.defaultdict(list)
    docs = {}

    for task_name, task in task_dict.items():
        versions[task_name] = task.VERSION
        if task.has_test_docs():
            task_doc_func = task.test_docs
        elif task.has_validation_docs():
            task_doc_func = task.validation_docs
        else:
            raise RuntimeError(f"Task {task_name} has no valid docs")

        task_docs = list(task_doc_func())
        rnd = random.Random()
        rnd.seed(42)
        rnd.shuffle(task_docs)  # reference lm_eval/evaluator.py:179-181

        for doc_id, doc in enumerate(task_docs):
            if limit is not None and doc_id >= limit:
                break
            docs[(task_name, doc_id)] = doc
            ctx = task.fewshot_context(
                doc=doc, num_fewshot=num_fewshot, rnd=rnd)
            reqs = task.construct_requests(doc, ctx)
            for i, req in enumerate(reqs):
                requests[req.request_type].append(req)
                requests_origin[req.request_type].append(
                    (i, task_name, doc, doc_id))

    # one batched LM call per request type (reference :224-237)
    process_res_queue = collections.defaultdict(list)
    for reqtype, reqs in requests.items():
        resps = getattr(lm, reqtype)([req.args for req in reqs])
        resps = [
            x if (req.index is None or not isinstance(x, tuple))
            else x[req.index]
            for x, req in zip(resps, reqs)
        ]
        for resp, (i, task_name, doc, doc_id) in zip(
                resps, requests_origin[reqtype]):
            process_res_queue[(task_name, doc_id)].append((i, resp))

    vals = collections.defaultdict(list)
    for (task_name, doc_id), reqs in process_res_queue.items():
        reqs.sort(key=lambda x: x[0])
        reqs = [x[1] for x in reqs]
        task = task_dict[task_name]
        doc = docs[(task_name, doc_id)]
        metrics = task.process_results(doc, reqs)
        for metric, value in metrics.items():
            vals[(task_name, metric)].append(value)

    for (task_name, metric), items in vals.items():
        task = task_dict[task_name]
        results[task_name][metric] = task.aggregation()[metric](items)
        stderr = stderr_for_metric(
            task.aggregation()[metric], bootstrap_iters)
        if stderr is not None:
            results[task_name][metric + "_stderr"] = stderr(items)

    return {"results": dict(results), "versions": versions}


def make_table(result_dict) -> str:
    """Markdown results table (reference lm_eval/evaluator.py:284-314)."""
    rows = ["|Task|Version|Metric|Value|Stderr|",
            "|---|---|---|---|---|"]
    for k, dic in sorted(result_dict["results"].items()):
        version = result_dict["versions"].get(k, "")
        for m, v in dic.items():
            if m.endswith("_stderr"):
                continue
            se = dic.get(m + "_stderr", "")
            se_s = f"{se:.4f}" if se != "" else ""
            rows.append(f"|{k}|{version}|{m}|{v:.4f}|{se_s}|")
    return "\n".join(rows)
