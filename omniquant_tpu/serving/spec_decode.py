"""Speculative decoding for the serving engines.

Two acceptance modes: GREEDY-EXACT (argmax equality; fused multi-round
device dispatch) and SAMPLING (rejection-sampling acceptance, temperature
warping; host-paced) — `generate(temperature=...)` picks the mode.

Sequential decode streams + unpacks EVERY packed weight once per token;
measured on one v5e chip that puts a hard floor under the step time
(~13 ms at 7B for W2/W3/W4 alike at batch 8 — the VPU in-register unpack
cost is per-CODE, not per-bit, so sub-4-bit schemes can't ride their
smaller HBM footprint below it). Speculative decoding breaks the floor by
making ONE weight pass score s tokens:

  1. a cheap DRAFT model proposes `gamma` tokens autoregressively,
  2. the TARGET scores [last, p_1..p_gamma] in one `verify_step`
     (engine._verify_impl: one prefill-shaped pass, one weight stream),
  3. the longest prefix of proposals matching the target's argmaxes is
     accepted, plus the target's own next token (correction — or bonus
     token when everything matched).

With greedy acceptance the emitted stream is EXACTLY the target's greedy
decode (every emitted token is a target argmax given accepted context) —
tests/test_spec_decode.py asserts token-for-token equality against
engine.generate. Throughput multiplies by E[accepted + 1] per verify; the
draft must be cheap and aligned (its quality only affects SPEED, never
output).

The default draft is LAYER-SKIP self-speculation (arXiv 2309.08168 /
LayerSkip-style): the target's own first `draft_layers` blocks + its final
norm + lm_head, sharing the target's (already fused/packed) weight buffers
— zero extra weight HBM, only a d/L-sized extra KV cache. Any engine with
the same tokenizer works as a custom draft (e.g. the same checkpoint packed
at W2 as draft for a W4 target).

Cache-consistency invariant (why no rollback pass exists): both engines
mask attention at `pos <= lengths`, and every write lands at
`lengths + i`, so REJECTED positions are simply never attended and get
overwritten by the next round's writes. Acceptance is just host-side
`lengths += n_emitted`; the draft's lengths are re-synced from the
target's every round. The draft drafts gamma+1 steps (one beyond what is
verified) so its own cache covers position L+gamma when a fully-accepted
round (+ bonus token) advances the context to L+gamma+1.

Net-new vs the reference: OmniQuant's deployment path (MLC-LLM) has no
speculative decoding; this composes with every scheme the framework packs
(W2/W3/W4/W6 x A16/A4) and with the int8 KV cache.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def layer_skip_params(params: dict, n_layers: int) -> dict:
    """Draft params for layer-skip self-speculation: the first n_layers
    blocks (SHARED buffers — no copy) with the target's embed/norm/head."""
    draft = dict(params)
    draft["layers"] = list(params["layers"][:n_layers])
    return draft


class SpecDecoder:
    """Greedy speculative decoding over a (target, draft) engine pair.

    target: a serving engine (LlamaEngine/OPTEngine/FalconEngine or their
        TP variants) — its greedy stream is reproduced exactly.
    draft: an engine with the same tokenizer/vocab. Default: layer-skip
        self-draft built from `target` (draft_layers blocks).
    gamma: proposals per round; each round costs (gamma+1) draft steps +
        one target verify pass and emits 1..gamma+1 tokens.
    """

    def __init__(self, target, draft=None, draft_layers: int = 4,
                 gamma: int = 4, draft_head_bits: Optional[int] = None):
        self.target = target
        self.gamma = gamma
        if draft is None:
            d = min(draft_layers, len(target.params["layers"]))
            # the engine family's TRUE config: TP engines keep the GLOBAL
            # one at _gcfg (their .cfg is the per-shard local view); OPT /
            # falcon engines keep a llama-named adapter at .cfg with the
            # real one at _ocfg/_fcfg
            base_cfg = getattr(
                target, "_gcfg",
                getattr(target, "_fcfg", getattr(target, "_ocfg",
                                                 target.cfg)))
            dcfg = _clone_cfg(base_cfg, num_hidden_layers=d)
            kw = dict(
                max_batch=target.max_batch, max_len=target.max_len,
                dtype=target.dtype,
                kv_dtype="int8" if target.kv_int8 else "native",
                spec=target.spec, auto_grow=target.auto_grow,
                grow_limit=target.grow_limit)
            if hasattr(target, "mesh"):  # TP engines re-place from raw
                draft = type(target)(
                    layer_skip_params(target._raw_params, d), dcfg,
                    target.mesh, **kw)
            else:
                dparams = layer_skip_params(target.params, d)
                if draft_head_bits:
                    # pack the DRAFT's lm_head: at decode the dense bf16
                    # head (vocab x hidden, ~250 MB at 7B) costs as much
                    # HBM as ~2.4 packed layers per draft step; the
                    # target's head (whose argmaxes define the emitted
                    # stream) stays untouched — draft quality only
                    # affects speed, never output
                    from ..quant import QuantConfig, pack_weight

                    emb = (dparams.get("lm_head")
                           if dparams.get("lm_head") is not None
                           else dparams["embed_tokens"])
                    dparams = dict(dparams)
                    gs = 128 if emb.shape[1] % 128 == 0 else None
                    dparams["lm_head"] = pack_weight(
                        emb.astype(jnp.float32),
                        QuantConfig(n_bits=draft_head_bits,
                                    group_size=gs), layout="auto")
                draft = type(target)(dparams, dcfg, **kw)
        self.draft = draft
        # running stats: proposals made / accepted (speed diagnostics)
        self.proposed = 0
        self.accepted = 0
        self._round_fns = {}  # (g, r, kv_len) -> fused-round program
        # host-side randomness for the sampling-mode acceptance test /
        # residual draws (device keys drive the draft's proposal sampling)
        self._host_rng = np.random.default_rng(0)

    # ------------------------------------------------------------------
    def add_request(self, tokens, **kw) -> int:
        """Prefill BOTH engines; returns the (shared) slot id."""
        slot = self.target.add_request(tokens, **kw)
        dslot = self.draft.add_request(tokens, **kw)
        assert dslot == slot, (
            "target/draft slot allocation diverged — add/release requests "
            f"through the SpecDecoder only ({slot} vs {dslot})")
        return slot

    def release(self, slot: int):
        self.target.release(slot)
        self.draft.release(slot)

    @property
    def lengths(self):
        return self.target.lengths

    def _pending(self, slot: int) -> int:
        return self.target._pending_next[slot]

    def _require_greedy(self, last_tokens):
        t = self.target
        if any(t.temps[s] > 0 for s in last_tokens):
            raise ValueError(
                "this is the GREEDY spec-decode path (argmax-equality "
                "acceptance); slots with temperature > 0 must go through "
                "sample_spec_step / generate(temperature=...) instead")

    # ------------------------------------------------------------------
    def spec_step(self, last_tokens: Dict[int, int]) -> Dict[int, List[int]]:
        """One speculative round for the given slots ({slot: last emitted
        token}); returns {slot: [emitted tokens]} (1..gamma+1 each, exact
        greedy continuations of the target)."""
        g = self.gamma
        t = self.target
        self._require_greedy(last_tokens)
        # re-sync the draft to the accepted context (its over-advanced /
        # rejected tail from the previous round is abandoned in place)
        for s in last_tokens:
            self.draft.lengths[s] = t.lengths[s]
        # draft gamma+1 steps: proposals p_1..p_gamma come from the first
        # gamma; the extra step writes p_gamma's KV into the draft cache so
        # a fully-accepted round leaves no hole at L+gamma
        props = self.draft.step_n(dict(last_tokens), g + 1)
        ver_in = {s: [last_tokens[s]] + props[s][:g] for s in last_tokens}
        out = t.verify_step(ver_in)  # {slot: [g+1 argmaxes]}
        res = {}
        for s in last_tokens:
            emitted = []
            for i in range(g + 1):
                emitted.append(out[s][i])
                if i == g or out[s][i] != props[s][i]:
                    break
            t.lengths[s] += len(emitted)
            res[s] = emitted
            self.proposed += g
            self.accepted += len(emitted) - 1
        return res

    # ------------------------------------------------------------------
    # fused rounds: draft loop + verify + acceptance in ONE device dispatch
    def _build_round(self, g: int, r: int, kv_len: int):
        """Compile r whole speculative rounds into one program: per round,
        g+1 draft decode steps, one target verify pass over [last, p_1..
        p_g], the accepted-prefix count via a cumulative product of
        argmax-equality, and the device-side length/last-token advance.
        The host link carries (B,) tokens in, (r, B, g+1) tokens + (r, B)
        counts out — per-dispatch latency amortizes over up to r*(g+1)
        tokens (the same reason step_n exists)."""
        t, d = self.target, self.draft
        B = t.max_batch

        def round_impl(tparams, dparams, tcache, dcache, last, lengths,
                       key):
            zf = jnp.zeros((B,), jnp.float32)
            zi = jnp.zeros((B,), jnp.int32)
            of = jnp.ones((B,), jnp.float32)
            outs, n_emits = [], []
            for rd in range(r):
                dlens, toks, props = lengths, last, []
                for i in range(g + 1):
                    dcache, toks = d._decode_impl(
                        dparams, dcache, toks, dlens,
                        jax.random.fold_in(key, rd * (g + 2) + i),
                        zf, zi, of, kv_len=kv_len, do_sample=False)
                    dlens = dlens + 1
                    props.append(toks)
                props_t = jnp.stack(props[:g], axis=1)          # (B, g)
                ver = jnp.concatenate([last[:, None], props_t], axis=1)
                tcache, out = t._verify_impl(
                    tparams, tcache, ver, lengths, kv_len=kv_len, s=g + 1)
                match = (out[:, :g] == props_t).astype(jnp.int32)
                n_emit = 1 + jnp.sum(jnp.cumprod(match, axis=1), axis=1)
                last = jnp.take_along_axis(
                    out, (n_emit - 1)[:, None], axis=1)[:, 0]
                lengths = lengths + n_emit
                outs.append(out)
                n_emits.append(n_emit)
            return tcache, dcache, jnp.stack(outs), jnp.stack(n_emits)

        return jax.jit(round_impl, donate_argnums=(2, 3))

    def spec_steps(self, last_tokens: Dict[int, int],
                   rounds: int = 4) -> Dict[int, List[int]]:
        """`rounds` speculative rounds in ONE device dispatch (the fused
        analog of engine.step_n — on dispatch-latency-bound links the
        2-dispatch spec_step pays ~2 round trips per <= gamma+1 tokens,
        which eats the verify amortization). Greedy; emitted streams are
        exactly the target's. Falls back to per-round spec_step for TP
        engines (their impls are shard_map-wrapped individually)."""
        if hasattr(self.target, "mesh"):
            res = {s: [] for s in last_tokens}
            live = dict(last_tokens)
            for _ in range(rounds):
                out = self.spec_step(live)
                for s, toks in out.items():
                    res[s].extend(toks)
                    live[s] = toks[-1]
            return res
        g, t = self.gamma, self.target
        self._require_greedy(last_tokens)
        need = rounds * (g + 1)
        t._check_capacity(last_tokens, need)
        self.draft._check_capacity(last_tokens, need)
        for s in last_tokens:
            self.draft.lengths[s] = t.lengths[s]
        B = t.max_batch
        toks = np.zeros(B, np.int32)
        for s, v in last_tokens.items():
            toks[s] = v
        longest = int(t.lengths[t.active].max()) if t.active.any() else 0
        kv_len = min(t.max_len,
                     max(64, 1 << int(np.ceil(np.log2(longest + need + 1)))))
        fn_key = (g, rounds, kv_len)
        if fn_key not in self._round_fns:
            self._round_fns[fn_key] = self._build_round(g, rounds, kv_len)
        t.cache, self.draft.cache, outs, n_emits = self._round_fns[fn_key](
            t.params, self.draft.params, t.cache, self.draft.cache,
            jnp.asarray(toks), jnp.asarray(t.lengths), t._next_key())
        outs = np.asarray(outs)          # (r, B, g+1)
        n_emits = np.asarray(n_emits)    # (r, B)
        res = {s: [] for s in last_tokens}
        for rd in range(rounds):
            for s in last_tokens:
                n = int(n_emits[rd, s])
                res[s].extend(outs[rd, s, :n].tolist())
                t.lengths[s] += n
                self.proposed += g
                self.accepted += n - 1
        for s in last_tokens:
            self.draft.lengths[s] = t.lengths[s]
        return res

    # ------------------------------------------------------------------
    # sampling mode (rejection-sampling acceptance, Leviathan et al. 2022)
    def sample_spec_step(self, last_tokens: Dict[int, int]
                         ) -> Dict[int, List[int]]:
        """One SAMPLING speculative round: draft proposes gamma tokens by
        sampling q_i, the target scores them in one verify pass, and each
        proposal x_i is accepted with prob min(1, p_i(x_i)/q_i(x_i)); the
        first rejection is replaced by a sample from the residual
        normalize(max(p_i - q_i, 0)) and the round stops; full acceptance
        appends a bonus sample from p_gamma. The emitted stream follows
        the target's temperature-sampling distribution (the standard
        speculative-sampling identity: for any proposal q,
        P[emit = x] = q(x)·min(1, p(x)/q(x)) + (1 - alpha)·res(x) = p(x)).

        Exactness caveat: proposals are sampled from the DECODE program's
        draft logits while q_i/p_i come from the VERIFY programs; where
        the two compiled programs differ in low-order float bits (bf16
        serving), the identity holds only up to that numerical program
        difference — unlike the greedy path, whose argmax acceptance uses
        the verify program's own outputs and is bit-exact.

        Temperature-only warping: every requested slot needs temps > 0 and
        top_k == 0 / top_p == 1 (truncation warps would have to be applied
        to BOTH p and q; not wired). Host-paced (three dispatches per
        round: g draft steps ride one-by-one, then draft + target verify
        passes); the greedy fused path (spec_steps) stays the fast lane."""
        g, t, d = self.gamma, self.target, self.draft
        for s in last_tokens:
            if not t.temps[s] > 0:
                raise ValueError(
                    "sample_spec_step needs temperature > 0 for every "
                    f"requested slot (slot {s} is greedy — use spec_step)")
            if t.top_ks[s] != 0 or t.top_ps[s] != 1.0:
                raise ValueError(
                    "sampling-mode speculative decoding supports "
                    "temperature-only warping (top_k=0, top_p=1); slot "
                    f"{s} has top_k={t.top_ks[s]}, top_p={t.top_ps[s]}")
        t._check_capacity(last_tokens, g + 1)
        d._check_capacity(last_tokens, g + 1)
        for s in last_tokens:
            d.lengths[s] = t.lengths[s]
        # draft samples g proposals autoregressively (draft temps mirror
        # the target's via add_request; its KV rows L..L+g-1 are written)
        props = {s: [] for s in last_tokens}
        cur = dict(last_tokens)
        for _ in range(g):
            out = d.step(cur)
            for s in last_tokens:
                props[s].append(out[s])
            cur = dict(out)
        for s in last_tokens:  # step() advanced; verify re-scores from L
            d.lengths[s] = t.lengths[s]
        ver = {s: [last_tokens[s]] + props[s] for s in last_tokens}
        q_log = d.verify_step_logits(ver)   # draft rows (+ L+g KV row)
        p_log = t.verify_step_logits(ver)   # target rows
        res: Dict[int, List[int]] = {}
        for s in last_tokens:
            T = float(t.temps[s])
            p = _softmax_rows(p_log[s] / T)   # (g+1, V)
            q = _softmax_rows(q_log[s] / T)
            emitted: List[int] = []
            for i in range(g):
                x = props[s][i]
                if self._host_rng.uniform() < min(
                        1.0, p[i, x] / max(q[i, x], 1e-30)):
                    emitted.append(x)
                    continue
                resid = np.maximum(p[i] - q[i], 0.0)
                tot = resid.sum()
                if tot <= 0:  # p == q: residual empty, resample from p
                    resid, tot = p[i], p[i].sum()
                emitted.append(int(
                    self._host_rng.choice(len(resid), p=resid / tot)))
                break
            else:  # all g accepted: bonus token from the target's p_g
                emitted.append(int(
                    self._host_rng.choice(p.shape[1], p=p[g] / p[g].sum())))
            t.lengths[s] += len(emitted)
            self.proposed += g
            # emitted = accepted proposals + 1 (residual sample or bonus)
            self.accepted += len(emitted) - 1
            res[s] = emitted
        for s in last_tokens:
            d.lengths[s] = t.lengths[s]
        return res

    def generate(self, prompt_tokens, max_new_tokens: int = 32,
                 rounds_per_dispatch: int = 4,
                 temperature: float = 0.0) -> list:
        """Greedy generation (temperature 0): token-for-token equal to
        target.generate(prompt_tokens, max_new_tokens). With temperature >
        0: speculative SAMPLING (sample_spec_step) — the emitted stream is
        distributed as plain target sampling at that temperature."""
        if temperature > 0:
            slot = self.add_request(list(prompt_tokens),
                                    temperature=temperature)
            out = [self._pending(slot)]
            while len(out) < max_new_tokens:
                head = self.target.max_len - int(self.target.lengths[slot])
                if not self.target.auto_grow and head < self.gamma + 1:
                    res = self.target.step({slot: out[-1]})
                    self.draft.lengths[slot] = self.target.lengths[slot]
                    out.append(res[slot])
                    continue
                out.extend(self.sample_spec_step({slot: out[-1]})[slot])
            self.release(slot)
            return out[:max_new_tokens]
        slot = self.add_request(prompt_tokens)
        out = [self._pending(slot)]
        while len(out) < max_new_tokens:
            room = max_new_tokens - len(out)
            r = max(1, min(rounds_per_dispatch,
                           -(-room // (self.gamma + 1))))
            if not self.target.auto_grow:
                # spec_steps needs worst-case rounds*(gamma+1) rows of KV
                # headroom (every round may emit gamma+1 tokens); near the
                # max_len ceiling shrink the dispatch, and once a single
                # round no longer fits finish with plain sequential steps
                # (which need only 1 row) instead of raising where
                # engine.generate would have completed
                head = self.target.max_len - int(self.target.lengths[slot])
                r_fit = head // (self.gamma + 1)
                if r_fit == 0:
                    res = self.target.step({slot: out[-1]})
                    self.draft.lengths[slot] = self.target.lengths[slot]
                    out.append(res[slot])
                    continue
                r = min(r, r_fit)
            emitted = self.spec_steps({slot: out[-1]}, rounds=r)[slot]
            out.extend(emitted)
        self.release(slot)
        return out[:max_new_tokens]

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.proposed if self.proposed else 0.0


def _softmax_rows(logits: np.ndarray) -> np.ndarray:
    """Row-wise float64 softmax (host-side: the acceptance ratios and
    residual distributions want full precision)."""
    z = logits.astype(np.float64)
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def _clone_cfg(cfg, **overrides):
    """Engine configs may be dataclasses or ad-hoc adapter objects; clone
    structurally either way."""
    import dataclasses

    if dataclasses.is_dataclass(cfg):
        return dataclasses.replace(cfg, **overrides)

    class _Cfg:
        pass

    c = _Cfg()
    c.__dict__.update(cfg.__dict__)
    c.__dict__.update(overrides)
    return c
