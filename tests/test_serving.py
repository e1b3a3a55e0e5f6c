"""Serving engine tests: logits-equivalence vs the eval-path model
(the correctness oracle from SURVEY.md §7 'hard parts'), continuous
batching, int8 KV cache, and packed-weight serving."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omniquant_tpu.models import llama as jllama
from omniquant_tpu.serving.engine import LlamaEngine
from omniquant_tpu.serving.export import pack_model
from omniquant_tpu.models import LLAMA
from omniquant_tpu.quant import QuantConfig


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def greedy_reference(params, cfg, prompt, n, spec=None):
    from omniquant_tpu.models.common import NO_ACT_QUANT

    spec = spec if spec is not None else NO_ACT_QUANT
    toks = jnp.asarray(np.asarray(prompt, np.int32)[None])
    out = []
    for _ in range(n):
        logits = jllama.forward(
            params, toks, cfg, spec)  # f32 model
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        toks = jnp.concatenate([toks, jnp.asarray([[nxt]])], axis=1)
    return out


def _specs():
    from omniquant_tpu.models.common import ActQuantSpec

    return [None, ActQuantSpec.from_bits(4)]


@pytest.mark.parametrize("spec", _specs(), ids=["none", "w4a4"])
def test_engine_matches_full_forward(tiny_llama, spec):
    """Engine generation == eval-path forward, with and without the W4A4
    act-quant spec (VERDICT r2 #4: the engine must apply the q/k/p/v
    quantizers the eval path applies, not just spec.act at linears)."""
    from omniquant_tpu.models.common import NO_ACT_QUANT

    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=64, dtype=jnp.float32,
                      spec=spec if spec is not None else NO_ACT_QUANT)
    prompt = [5, 17, 99, 3]
    got = eng.generate(prompt, max_new_tokens=8)
    ref = greedy_reference(params, cfg, prompt, 8, spec)
    assert got == ref, (got, ref)


def test_engine_bf16_close(tiny_llama):
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=64, dtype=jnp.bfloat16)
    prompt = [5, 17, 99, 3]
    got = eng.generate(prompt, max_new_tokens=8)
    ref = greedy_reference(params, cfg, prompt, 8)
    # bf16 may diverge on near-ties; require the first few tokens to agree
    assert got[:3] == ref[:3], (got, ref)


def test_engine_int8_kv(tiny_llama):
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=64,
                      dtype=jnp.float32, kv_dtype="int8")
    prompt = [5, 17, 99, 3]
    got = eng.generate(prompt, max_new_tokens=8)
    ref = greedy_reference(params, cfg, prompt, 8)
    # int8 KV is lossy; prefix should still match for a tiny model
    assert got[:4] == ref[:4], (got, ref)


def test_engine_continuous_batching(tiny_llama):
    """Two interleaved requests produce the same tokens as run alone."""
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=64, dtype=jnp.float32)

    p1, p2 = [5, 17, 99], [42, 7]
    ref1 = greedy_reference(params, cfg, p1, 5)
    ref2 = greedy_reference(params, cfg, p2, 5)

    s1 = eng.add_request(p1)
    t1 = eng._pending_next[s1]
    out1 = [t1]
    # advance request 1 by two steps before request 2 arrives
    for _ in range(2):
        t1 = eng.step({s1: t1})[s1]
        out1.append(t1)
    s2 = eng.add_request(p2)
    t2 = eng._pending_next[s2]
    out2 = [t2]
    for _ in range(2):
        res = eng.step({s1: t1, s2: t2})
        t1, t2 = res[s1], res[s2]
        out1.append(t1)
        out2.append(t2)
    for _ in range(2):
        t2 = eng.step({s2: t2})[s2]
        out2.append(t2)
    assert out1 == ref1, (out1, ref1)
    assert out2 == ref2, (out2, ref2)


def test_engine_packed_weights(tiny_llama):
    """Serving from PackedWeight params matches serving from the fake-quant
    dense params (same integer grid)."""
    cfg, params = tiny_llama
    wcfg = QuantConfig(n_bits=4, group_size=16)
    fq = {k: v for k, v in params.items()}
    fq["layers"] = [
        LLAMA.effective_block_weights(b, wcfg, None, None, cfg)
        for b in params["layers"]
    ]
    packed = pack_model(LLAMA, fq, wcfg)
    prompt = [5, 17, 99, 3]
    eng_fq = LlamaEngine(fq, cfg, max_batch=1, max_len=64, dtype=jnp.float32)
    eng_pk = LlamaEngine(packed, cfg, max_batch=1, max_len=64,
                         dtype=jnp.float32)
    got_fq = eng_fq.generate(prompt, max_new_tokens=6)
    got_pk = eng_pk.generate(prompt, max_new_tokens=6)
    assert got_fq == got_pk, (got_fq, got_pk)


def test_slot_exhaustion_raises(tiny_llama):
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=1, max_len=32, dtype=jnp.float32)
    eng.add_request([1, 2, 3])
    with pytest.raises(RuntimeError, match="no free slots"):
        eng.add_request([4, 5])


def test_decode_past_max_len_raises(tiny_llama):
    """Decoding a slot whose write position would reach max_len must raise:
    the kv_update RMW kernel would clamp the slice base and silently
    overwrite live history at max_len-8."""
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=1, max_len=16,
                      dtype=jnp.float32)
    slot = eng.add_request([5, 17, 99, 3])
    tok = eng._pending_next[slot]
    for _ in range(16 - 4):  # last step writes position max_len-1
        tok = eng.step({slot: tok})[slot]
    with pytest.raises(RuntimeError, match="max_len"):
        eng.step({slot: tok})
    with pytest.raises(RuntimeError, match="max_len"):
        eng.step_n({slot: tok}, 4)


@pytest.mark.parametrize("spec", _specs(), ids=["none", "w4a4"])
def test_opt_engine_matches_full_forward(spec):
    """OPT's quant ordering is the tricky one: q pre-scaled then quantized,
    q/k/v quantized over the FULL hidden dim pre-reshape (reference
    int_opt_layer.py:96-118)."""
    from omniquant_tpu.models import opt as jopt
    from omniquant_tpu.models.common import NO_ACT_QUANT
    from omniquant_tpu.serving.engine import OPTEngine

    cfg = jopt.OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
    )
    params = jopt.init_params(jax.random.PRNGKey(3), cfg)
    sp = spec if spec is not None else NO_ACT_QUANT
    eng = OPTEngine(params, cfg, max_batch=2, max_len=64, dtype=jnp.float32,
                    spec=sp)
    prompt = [5, 17, 99, 3]
    got = eng.generate(prompt, max_new_tokens=8)

    toks = jnp.asarray(np.asarray(prompt, np.int32)[None])
    ref = []
    for _ in range(8):
        logits = jopt.forward(params, toks, cfg, sp)
        nxt = int(jnp.argmax(logits[0, -1]))
        ref.append(nxt)
        toks = jnp.concatenate([toks, jnp.asarray([[nxt]])], axis=1)
    assert got == ref, (got, ref)


def test_step_n_matches_single_steps(tiny_llama):
    cfg, params = tiny_llama
    prompt = [5, 17, 99, 3]
    eng1 = LlamaEngine(params, cfg, max_batch=1, max_len=64, dtype=jnp.float32)
    s = eng1.add_request(prompt)
    t = eng1._pending_next[s]
    singles = [t]
    for _ in range(6):
        t = eng1.step({s: t})[s]
        singles.append(t)

    eng2 = LlamaEngine(params, cfg, max_batch=1, max_len=64, dtype=jnp.float32)
    s2 = eng2.add_request(prompt)
    t2 = eng2._pending_next[s2]
    multi = [t2] + eng2.step_n({s2: t2}, 6)[s2]
    assert multi == singles, (multi, singles)


@pytest.mark.parametrize("kw", [
    dict(multi_query=True, parallel_attn=True),    # falcon-7b style
    dict(multi_query=False, parallel_attn=False),  # classic
    dict(multi_query=False, parallel_attn=False, alibi=True),  # rw-1b style
])
def test_falcon_engine_matches_full_forward(kw):
    from omniquant_tpu.models import falcon as jfalcon
    from omniquant_tpu.serving.engine import FalconEngine

    cfg = jfalcon.FalconConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, bias=False, **{"alibi": False, **kw})
    params = jfalcon.init_params(jax.random.PRNGKey(4), cfg)
    eng = FalconEngine(params, cfg, max_batch=2, max_len=64,
                       dtype=jnp.float32)
    prompt = [5, 17, 99, 3]
    got = eng.generate(prompt, max_new_tokens=8)

    toks = jnp.asarray(np.asarray(prompt, np.int32)[None])
    ref = []
    for _ in range(8):
        logits = jfalcon.forward(params, toks, cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        ref.append(nxt)
        toks = jnp.concatenate([toks, jnp.asarray([[nxt]])], axis=1)
    assert got == ref, (got, ref)


def test_falcon_mqa_cache_stores_single_kv_head():
    """MQA caches n_kv=1 (not replicated per query head) and still matches
    the full forward (VERDICT r1 weak #6)."""
    from omniquant_tpu.models import falcon as jfalcon
    from omniquant_tpu.serving.engine import FalconEngine

    cfg = jfalcon.FalconConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        bias=False)
    params = jfalcon.init_params(jax.random.PRNGKey(7), cfg)
    eng = FalconEngine(params, cfg, max_batch=2, max_len=64,
                       dtype=jnp.float32)
    assert eng.cache.k[0].shape[1] == 1  # one kv head, 71x less at 7b scale
    prompt = [5, 17, 99, 3]
    got = eng.generate(prompt, max_new_tokens=6)
    toks = jnp.asarray(np.asarray(prompt, np.int32)[None])
    ref = []
    for _ in range(6):
        logits = jfalcon.forward(params, toks, cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        ref.append(nxt)
        toks = jnp.concatenate([toks, jnp.asarray([[nxt]])], axis=1)
    assert got == ref, (got, ref)


def test_falcon_alibi_prefill_uses_flash_and_matches():
    """ALiBi falcon prefill >= flash_min_len routes through the flash kernel
    (slopes passed in) and matches the dense eval forward."""
    from omniquant_tpu.models import falcon as jfalcon
    from omniquant_tpu.serving.engine import FalconEngine

    cfg = jfalcon.FalconConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, multi_query=False, parallel_attn=False,
        alibi=True, bias=False)
    params = jfalcon.init_params(jax.random.PRNGKey(8), cfg)
    eng = FalconEngine(params, cfg, max_batch=1, max_len=128,
                       dtype=jnp.float32, flash_min_len=16)
    assert eng._alibi_slopes() is not None and eng._flash_ok()
    rng = np.random.default_rng(8)
    prompt = [int(t) for t in rng.integers(1, 127, 48)]  # >= flash_min_len
    slot = eng.add_request(prompt)
    first = eng._pending_next[slot]
    logits = jfalcon.forward(
        params, jnp.asarray(np.asarray(prompt, np.int32)[None]), cfg)
    assert first == int(jnp.argmax(logits[0, -1]))


def test_auto_grow_matches_large_engine(tiny_llama):
    """auto_grow doubles the cache mid-generation; tokens must equal an
    engine built with the big cache from the start (serving beyond the
    initial bucket ceiling — the growing-KV-cache story)."""
    cfg, params = tiny_llama
    prompt = [5, 17, 99, 3]
    n_new = 40  # prompt 4 + 40 > 16: forces two growths (16->32->64)
    big = LlamaEngine(params, cfg, max_batch=1, max_len=64,
                      dtype=jnp.float32)
    want = big.generate(prompt, max_new_tokens=n_new)
    small = LlamaEngine(params, cfg, max_batch=1, max_len=16,
                        dtype=jnp.float32, auto_grow=True)
    got = small.generate(prompt, max_new_tokens=n_new)
    assert small.max_len == 64 and got == want, (small.max_len, got, want)


def test_auto_grow_int8_kv(tiny_llama):
    """Growth copies the int8 codes AND the scale planes."""
    cfg, params = tiny_llama
    prompt = [5, 17, 99, 3]
    big = LlamaEngine(params, cfg, max_batch=1, max_len=64,
                      dtype=jnp.float32, kv_dtype="int8")
    want = big.generate(prompt, max_new_tokens=24)
    small = LlamaEngine(params, cfg, max_batch=1, max_len=16,
                        dtype=jnp.float32, kv_dtype="int8", auto_grow=True)
    got = small.generate(prompt, max_new_tokens=24)
    assert got == want, (got, want)


def test_auto_grow_long_prompt_and_limit(tiny_llama):
    """A prompt beyond max_len grows the cache at prefill; the growth cap
    (cfg.max_position_embeddings) still raises."""
    cfg, params = tiny_llama  # max_position_embeddings=128
    eng = LlamaEngine(params, cfg, max_batch=1, max_len=16,
                      dtype=jnp.float32, auto_grow=True)
    prompt = list(range(2, 30))  # bucket 32 > 16
    big = LlamaEngine(params, cfg, max_batch=1, max_len=64,
                      dtype=jnp.float32)
    assert eng.generate(prompt, max_new_tokens=4) == big.generate(
        prompt, max_new_tokens=4)
    assert eng.max_len == 32
    with pytest.raises(RuntimeError, match="grow_limit"):
        eng._grow(4096)


def test_auto_grow_prefetch_matches_and_uses_aot():
    """prefetch_grow: the background-compiled grown-shape executables are
    picked up by _grow/_aot_call and the token stream is identical to an
    engine built big enough to never grow."""
    import jax.numpy as jnp
    from omniquant_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    big = LlamaEngine(params, cfg, max_batch=1, max_len=64,
                      dtype=jnp.float32)
    want = big.generate([5, 17, 9], max_new_tokens=24)
    eng = LlamaEngine(params, cfg, max_batch=1, max_len=16,
                      dtype=jnp.float32, auto_grow=True)
    eng.prefetch_grow(steps={(1, False)})
    eng._grow_prep[1].join()
    got = eng.generate([5, 17, 9], max_new_tokens=24)
    assert got == want, (got, want)
    assert eng.max_len == 32
    # the grown-shape decode executable was installed and dispatched
    assert any(k[0] == "decode" and k[1] == 32 for k in eng._aot), (
        list(eng._aot))


def test_auto_grow_occupancy_trigger_prefetches():
    """Crossing 3/4 occupancy starts the background prep automatically."""
    import jax.numpy as jnp
    from omniquant_tpu.models import llama as jllama

    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    params = jllama.init_params(jax.random.PRNGKey(1), cfg)
    eng = LlamaEngine(params, cfg, max_batch=1, max_len=32,
                      dtype=jnp.float32, auto_grow=True)
    slot = eng.add_request([5, 17, 9])
    tok = eng._pending_next[slot]
    assert eng._grow_prep is None
    eng.lengths[slot] = 26  # > 3/4 of 32
    res = eng.step({slot: tok})
    assert eng._grow_prep is not None
    eng._grow_prep[1].join()
    # keep decoding into the growth: stream must stay valid
    for _ in range(8):
        res = eng.step({slot: res[slot]})
    assert eng.max_len == 64
