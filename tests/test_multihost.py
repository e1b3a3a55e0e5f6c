"""Multi-host (2-process) validation on CPU: the dp-across-hosts x
tp-within-host calibration step agrees with the single-process result.

The TPU-pod analog runs the same code with real ICI/DCN; here each process
gets 2 virtual CPU devices and collectives ride gloo over localhost
(SURVEY.md §4's fake-device strategy extended across process boundaries).
"""
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(nproc=2, local_devices=2, timeout=240):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_multihost_worker.py"),
             str(pid), str(nproc), str(port), str(local_devices)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    return outs


def test_two_process_calibration_step_matches_single_process():
    outs = _run_workers()
    losses = []
    for out in outs:
        m = re.search(r"LOSS ([0-9.eE+-]+)", out)
        assert m, out
        losses.append(float(m.group(1)))
    # both ranks observe the same global loss
    assert np.isclose(losses[0], losses[1], rtol=1e-6)

    # single-process oracle on the in-process 8-device CPU mesh
    from omniquant_tpu.parallel.multihost import global_mesh
    from tests._multihost_worker import calibration_step_global

    def shard_fn(mesh, arr):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            arr, NamedSharding(mesh, P("dp", *([None] * (arr.ndim - 1)))))

    oracle = float(calibration_step_global(
        global_mesh(tp=2, dp=2), shard_fn, lambda n: slice(0, n)))
    assert np.isclose(losses[0], oracle, rtol=1e-5), (losses[0], oracle)


def test_two_process_multistep_calibration_and_fold():
    """Multi-step dp x tp calibration with per-host data loading
    (process_slice over a real seeded loader), folded weights equal across
    ranks AND equal to the single-process oracle; also records the
    2-process vs 1-process wall-clock ratio as a directional scaling
    number (VERDICT r2 #9)."""
    import time

    outs = _run_workers()
    sums, heads, walls = [], [], []
    for out in outs:
        sums.append(float(re.search(r"FOLDSUM ([0-9.eE+-]+)", out).group(1)))
        heads.append(re.search(r"FOLDHEAD (.+)", out).group(1).split())
        walls.append(float(re.search(r"WALL ([0-9.eE+-]+)", out).group(1)))
    assert np.isclose(sums[0], sums[1], rtol=1e-7), sums
    assert heads[0] == heads[1], heads

    from omniquant_tpu.parallel.multihost import global_mesh
    from tests._multihost_worker import calibration_run_global

    def shard_fn(mesh, arr):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            arr, NamedSharding(mesh, P("dp", *([None] * (arr.ndim - 1)))))

    t0 = time.perf_counter()
    oracle_sum, oracle_head = calibration_run_global(
        global_mesh(tp=2, dp=2), shard_fn, lambda n: slice(0, n))
    wall_1p = time.perf_counter() - t0
    assert np.isclose(sums[0], oracle_sum, rtol=1e-6), (sums[0], oracle_sum)
    np.testing.assert_allclose(
        [float(v) for v in heads[0]], oracle_head, rtol=1e-6)
    # directional scaling evidence only: CPU-gloo over localhost with
    # process startup in the denominator — real ICI/DCN scaling needs pods
    ratio = max(walls) / max(wall_1p, 1e-9)
    print(f"2-process wall {max(walls):.2f}s vs 1-process {wall_1p:.2f}s "
          f"(ratio {ratio:.2f}; includes jax startup per process)")


def test_two_process_dp_serving_matches_single_process():
    """Cross-host continuous batching (dp over 2 processes): the GLOBAL
    token streams gathered by every rank equal each other AND the
    single-process engine's greedy streams for the same prompts
    (serving/dp_serving.DPServingCoordinator)."""
    import json

    outs = _run_workers()
    streams = [json.loads(re.search(r"SERVTOKS (.*)", o).group(1))
               for o in outs]
    assert streams[0] == streams[1], "ranks disagree on global streams"

    # single-process oracle (no jax.distributed in this pytest process —
    # run the same fixture through a worker-equivalent inline)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO / "tests"))
    from _multihost_worker import serving_fixture
    from omniquant_tpu.serving.engine import LlamaEngine

    cfg, packed, prompts = serving_fixture()
    eng = LlamaEngine(packed, cfg, max_batch=8, max_len=32,
                      dtype=jnp.float32)
    for stream, prompt in zip(streams[0], prompts):
        assert stream == eng.generate(prompt, max_new_tokens=9), prompt
