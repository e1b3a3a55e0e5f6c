"""Cross-host serving: data-parallel continuous batching across processes.

The north-star deployment (SURVEY.md §2.3 "continuous batching across
hosts for serving"; the reference has NO serving engine and no multi-host
anything — its parallel_utils.py:89-163 is single-process layer placement).
Topology: every host (process) runs a HOST-LOCAL engine replica — packed
weights replicated per host, tensor parallelism (if any) inside the host's
local devices over ICI — and owns a disjoint slot range of the global
batch. Requests are routed to hosts by a deterministic policy computed
identically on every process from the same global request log, so there is
NO scheduler network protocol: admission is pure SPMD bookkeeping, and the
only cross-host traffic is (a) nothing during steady-state decode (dp is
replication; each host decodes its own slots) and (b) an optional
`process_allgather` when a caller wants the GLOBAL token streams (DCN-side,
tiny: a few int32 per slot per sync).

Why this shape is TPU-native: decode throughput scales linearly with hosts
at zero collective cost (weights never cross DCN), while tp inside a host
keeps its psums on ICI — exactly the axis layout global_mesh() prescribes
for calibration. Continuous batching semantics (slot admission/release
mid-flight, step_n granularity) are inherited unchanged from the local
engine, so every correctness property tested for LlamaEngine/TP engines
holds per host.

Single-process validation: with processes == 1 the coordinator degrades to
a thin wrapper over one engine (used by the CPU tests' oracle); the
2-process gloo test (tests/test_multihost.py::test_two_process_dp_serving)
asserts the global streams equal the single-process engine's token-for-
token, and dryrun_multichip(n, processes=2) runs the same as a driver leg.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class DPServingCoordinator:
    """Data-parallel continuous batching across `jax.process_count()` hosts.

    engine: the HOST-LOCAL engine (LlamaEngine/OPTEngine/FalconEngine or a
        TP variant over the host's local devices). Built by the caller so
        all engine kwargs (kv_dtype, spec, auto_grow, overlap_chunks)
        compose.
    Request ids are GLOBAL; the mapping id -> (host, local slot) is the
    deterministic `route` below, evaluated identically on every process.
    """

    def __init__(self, engine):
        import jax

        self.engine = engine
        self.pid = jax.process_index()
        self.nproc = jax.process_count()
        self._next_id = 0
        # global bookkeeping, identical on every process: id -> host
        self._host_of: Dict[int, int] = {}
        # host-local: id -> engine slot (only for ids routed here)
        self._slot_of: Dict[int, int] = {}
        self._pending: Dict[int, int] = {}
        # per-id emitted tokens (LOCAL ids only; the allgather merges)
        self._tokens: Dict[int, List[int]] = {}

    # ------------------------------------------------------------------
    def route(self, req_id: int) -> int:
        """Deterministic admission: round-robin over hosts. Every process
        computes the same answer from the same request order."""
        return req_id % self.nproc

    def submit(self, prompts: List[List[int]], **kw) -> List[int]:
        """Admit a batch of prompts (same argument on every process).
        Returns their global request ids. Each host prefills only the
        prompts routed to it (host-local data: a real deployment tokenizes
        only its own shard — the serving analog of per-host calibration
        data loading).

        Admission control is SPMD-consistent: every rank computes every
        host's post-submit occupancy from the shared bookkeeping and
        raises the SAME error on ALL ranks when any host would exceed its
        engine capacity — a single-rank engine error here would leave the
        other ranks blocked forever in the next process_allgather."""
        cap = self.engine.max_batch  # same engine config on every host
        occupancy = [0] * self.nproc
        for rid, host in self._host_of.items():
            occupancy[host] += 1
        planned = [
            occupancy[self.route(self._next_id + i)]
            + sum(1 for j in range(i + 1)
                  if self.route(self._next_id + j)
                  == self.route(self._next_id + i))
            for i in range(len(prompts))
        ]
        for i, need in enumerate(planned):
            if need > cap:
                raise RuntimeError(
                    f"submit of {len(prompts)} prompts would put "
                    f"{need} requests on host "
                    f"{self.route(self._next_id + i)} (engine capacity "
                    f"{cap}); release requests or submit fewer "
                    "(raised identically on every rank)")
        ids = []
        mine = []
        for p in prompts:
            rid = self._next_id
            self._next_id += 1
            host = self.route(rid)
            self._host_of[rid] = host
            ids.append(rid)
            if host == self.pid:
                mine.append((rid, p))
        if mine:
            slots = self.engine.add_requests([p for _, p in mine], **kw)
            for (rid, _), slot in zip(mine, slots):
                self._slot_of[rid] = slot
                first = self.engine._pending_next[slot]
                self._pending[rid] = first
                self._tokens[rid] = [first]
        return ids

    def release(self, rid: int) -> None:
        self._host_of.pop(rid, None)
        if rid in self._slot_of:
            self.engine.release(self._slot_of.pop(rid))
            self._pending.pop(rid, None)
        self._tokens.pop(rid, None)

    # ------------------------------------------------------------------
    def step_n(self, n: int = 8) -> None:
        """All hosts advance their live slots by n tokens (host-local
        dispatch, zero cross-host traffic). Hosts with no live slots skip
        the device call — continuous batching keeps per-host batches
        independent."""
        if self._slot_of:
            last = {self._slot_of[rid]: self._pending[rid]
                    for rid in self._slot_of}
            out = self.engine.step_n(last, n)
            for rid, slot in self._slot_of.items():
                toks = out[slot]
                self._tokens[rid].extend(toks)
                self._pending[rid] = toks[-1]

    def gather_tokens(self) -> Dict[int, List[int]]:
        """GLOBAL view of every live request's emitted tokens: one
        process_allgather of the (padded) local token matrix over DCN.
        Every process returns the same dict."""
        import jax
        from jax.experimental import multihost_utils

        if self.nproc == 1:
            return {rid: list(t) for rid, t in self._tokens.items()}
        live = sorted(self._host_of)
        width = max([len(self._tokens[r]) for r in self._tokens] or [0])
        width = int(multihost_utils.process_allgather(
            np.asarray([width], np.int32)).max())
        per_host_rows = max(
            (sum(1 for r in live if self._host_of[r] == h)
             for h in range(self.nproc)), default=0)
        # rows: (req_id, n_tokens, tokens...) padded to fixed shape
        local = np.full((per_host_rows, width + 2), -1, np.int32)
        row = 0
        for rid in live:
            if self._host_of[rid] != self.pid:
                continue
            t = self._tokens[rid]
            local[row, 0] = rid
            local[row, 1] = len(t)
            local[row, 2 : 2 + len(t)] = t
            row += 1
        gathered = multihost_utils.process_allgather(local)
        gathered = gathered.reshape(-1, width + 2)
        out: Dict[int, List[int]] = {}
        for r in gathered:
            if r[0] >= 0:
                out[int(r[0])] = r[2 : 2 + int(r[1])].tolist()
        return out

    # ------------------------------------------------------------------
    def generate_all(self, prompts: List[List[int]],
                     max_new_tokens: int = 16,
                     step: int = 8) -> List[List[int]]:
        """Convenience: admit `prompts`, decode everyone to max_new_tokens
        (continuous step_n batching per host), gather, release. Every
        process returns the same global list, aligned with `prompts`."""
        ids = self.submit(prompts)
        made = 1
        while made < max_new_tokens:
            n = min(step, max_new_tokens - made)
            self.step_n(n)
            made += n
        global_toks = self.gather_tokens()
        for rid in ids:
            self.release(rid)
        return [global_toks[rid][:max_new_tokens] for rid in ids]
