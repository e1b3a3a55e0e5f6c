"""Multi-host (multi-process) distribution: jax.distributed wiring.

The reference is strictly single-process (SURVEY.md §2.3 — its "multi-GPU"
story is layer placement inside one process, parallel_utils.py:89-163). The
TPU-native mapping is the JAX runtime itself: every host runs the same
program, `jax.distributed.initialize` joins them into one cluster, and the
global mesh lays data-parallel calibration across hosts (DCN) with tensor
parallelism inside each host (ICI). XLA partitions once over the global
device set; per-host code only ever touches its addressable shards.

Host-local calibration data becomes a global array via
`jax.make_array_from_process_local_data` — each host tokenizes/loads only
its dp shard of the 128 calibration samples (the multi-host data loading
SURVEY.md §2.3 calls for).

CPU validation path (no TPU pod needed): each process sets
  jax.config.update("jax_platforms", "cpu")
  jax.config.update("jax_cpu_collectives_implementation", "gloo")
  jax.config.update("jax_num_cpu_devices", <local>)
then `init_multihost(...)` — collectives ride gloo over localhost. This is
the test harness strategy (tests/test_multihost.py) per SURVEY.md §4.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MultihostConfig:
    coordinator_address: Optional[str] = None  # e.g. "10.0.0.1:8476"
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    # None = auto-detect (TPU pods self-discover via the metadata service;
    # explicit values are for CPU/gloo validation and manual clusters)


def init_multihost(cfg: MultihostConfig) -> None:
    """Join this process into the cluster. Call once, before any other JAX
    operation creates a backend. No-op when num_processes == 1."""
    if cfg.num_processes == 1:
        return
    jax.distributed.initialize(
        coordinator_address=cfg.coordinator_address,
        num_processes=cfg.num_processes,
        process_id=cfg.process_id,
    )


def global_mesh(tp: int = 1, dp: Optional[int] = None) -> Mesh:
    """(dp, tp) mesh over ALL processes' devices, dp-major so the dp axis
    spans hosts (DCN) and tp stays inside a host (ICI) whenever
    tp <= local_device_count — the axis layout the scaling-book recipe
    prescribes for collectives that must ride the fast interconnect."""
    devs = jax.devices()
    n = len(devs)
    if dp is None:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp <= n, (dp, tp, n)
    arr = np.asarray(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard_calibration_batch(mesh: Mesh, host_local: np.ndarray,
                            batch_axis: str = "dp") -> jax.Array:
    """Host-local (per-process) calibration rows -> one global dp-sharded
    array. Each process passes ONLY its own rows (global_batch /
    num_processes of them); the result is addressable-shard-backed with no
    cross-host transfer."""
    spec = P(batch_axis, *([None] * (host_local.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), host_local)


def process_slice(n_samples: int) -> slice:
    """Which rows of the global calibration set this process loads."""
    pid, np_ = jax.process_index(), jax.process_count()
    per = n_samples // np_
    assert per * np_ == n_samples, (n_samples, np_)
    return slice(pid * per, (pid + 1) * per)


def all_processes_agree(x) -> bool:
    """Cheap cross-host consistency check: gathers a scalar fingerprint from
    every process and compares (failure-detection aid for calibration — the
    reference has none, SURVEY.md §5)."""
    from jax.experimental import multihost_utils

    val = np.asarray(jax.device_get(x), np.float64).ravel()[:1]
    gathered = multihost_utils.process_allgather(val)
    return bool(np.all(np.isclose(gathered, gathered[0])))
