"""Speculative decoding: the greedy stream must be EXACTLY the target
engine's greedy stream, for any draft (the draft only affects speed).
Covers: layer-skip self-draft, a custom (W2-packed) draft over a W4
target, int8 KV caches, OPT family, multi-slot batching with divergent
per-slot acceptance, the verify_step contract itself, and the TP engine."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omniquant_tpu.models import LLAMA
from omniquant_tpu.models import llama as jllama
from omniquant_tpu.quant import QuantConfig
from omniquant_tpu.serving.engine import LlamaEngine
from omniquant_tpu.serving.export import pack_model
from omniquant_tpu.serving.spec_decode import SpecDecoder, layer_skip_params


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = jllama.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_verify_step_matches_sequential_decode(tiny_llama):
    """verify_step on tokens the engine itself just generated must (a)
    return those same tokens as its argmaxes shifted by one, and (b)
    leave the engine in a state equivalent to having decoded them."""
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=64, dtype=jnp.float32)
    prompt = [5, 17, 99, 3]
    ref = eng.generate(prompt, max_new_tokens=9)  # greedy chain

    slot = eng.add_request(prompt)
    first = eng._pending_next[slot]
    assert first == ref[0]
    # verify the engine's own continuation: all argmaxes must reproduce it
    out = eng.verify_step({slot: ref[:8]})
    assert out[slot] == ref[1:9]
    # accept all 8 and keep decoding — the stream must continue the chain
    eng.lengths[slot] += 8
    nxt = eng.step({slot: ref[8]})[slot]
    ref_long = LlamaEngine(params, cfg, max_batch=1, max_len=64,
                           dtype=jnp.float32).generate(
        prompt, max_new_tokens=10)
    assert nxt == ref_long[9]


def test_verify_step_unaccepted_tail_is_harmless(tiny_llama):
    """Rejected verify positions (written to cache but never accepted)
    must not affect later decoding."""
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=1, max_len=64, dtype=jnp.float32)
    prompt = [9, 4, 88]
    ref = eng.generate(prompt, max_new_tokens=6)

    slot = eng.add_request(prompt)
    # verify garbage tokens — cache positions L..L+3 get junk KV
    eng.verify_step({slot: [1, 2, 3, 4]})
    # lengths unchanged; decode the true continuation as if nothing happened
    got = [eng._pending_next[slot]]
    for _ in range(5):
        got.append(eng.step({slot: got[-1]})[slot])
    assert got == ref


@pytest.mark.parametrize("kv", ["native", "int8"])
@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_layer_skip_spec_equals_greedy(tiny_llama, kv, gamma):
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=128,
                      dtype=jnp.float32, kv_dtype=kv)
    prompt = [5, 17, 99, 3, 42]
    ref = eng.generate(prompt, max_new_tokens=16)
    sd = SpecDecoder(eng, draft_layers=1, gamma=gamma)
    got = sd.generate(prompt, max_new_tokens=16)
    assert got == ref
    assert sd.proposed > 0


def test_self_draft_full_acceptance(tiny_llama):
    """Draft == target (all layers) must accept every proposal and emit
    gamma+1 tokens per round (the bonus-token path + the draft-cache
    coverage invariant at full acceptance)."""
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=128,
                      dtype=jnp.float32)
    ref = eng.generate([7, 30, 2], max_new_tokens=13)
    sd = SpecDecoder(eng, draft_layers=cfg.num_hidden_layers, gamma=3)
    got = sd.generate([7, 30, 2], max_new_tokens=13)
    assert got == ref
    assert sd.acceptance_rate == 1.0


def test_packed_w2_draft_for_w4_target(tiny_llama):
    """A coarser quantization of the same checkpoint as draft: W2-packed
    draft proposes for the W4-packed target — output must equal the W4
    engine's greedy stream regardless of the W2 model's quality."""
    cfg, params = tiny_llama
    def packed(bits):
        wcfg = QuantConfig(n_bits=bits, group_size=16)
        fq = dict(params)
        fq["layers"] = [
            LLAMA.effective_block_weights(b, wcfg, None, None, cfg)
            for b in params["layers"]
        ]
        return pack_model(LLAMA, fq, wcfg, tile_k=16)

    t_eng = LlamaEngine(packed(4), cfg, max_batch=2, max_len=128,
                        dtype=jnp.float32)
    d_eng = LlamaEngine(packed(2), cfg, max_batch=2, max_len=128,
                        dtype=jnp.float32)
    prompt = [11, 63, 2, 9]
    ref = t_eng.generate(prompt, max_new_tokens=12)
    sd = SpecDecoder(t_eng, draft=d_eng, gamma=3)
    got = sd.generate(prompt, max_new_tokens=12)
    assert got == ref


def test_multi_slot_divergent_acceptance(tiny_llama):
    """Slots in one spec_step accept different counts; every slot's stream
    must match its own single-slot greedy reference."""
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=4, max_len=128,
                      dtype=jnp.float32)
    prompts = [[5, 17, 99], [3, 42, 7, 1], [88, 2]]
    refs = [eng.generate(p, max_new_tokens=12) for p in prompts]

    sd = SpecDecoder(eng, draft_layers=1, gamma=3)
    slots = [sd.add_request(p) for p in prompts]
    outs = {s: [sd._pending(s)] for s in slots}
    while any(len(outs[s]) < 12 for s in slots):
        live = {s: outs[s][-1] for s in slots if len(outs[s]) < 12}
        res = sd.spec_step(live)
        for s, toks in res.items():
            outs[s].extend(toks)
    for s, ref in zip(slots, refs):
        assert outs[s][:12] == ref


def test_opt_family_spec_decode():
    from omniquant_tpu.models import opt as jopt
    from omniquant_tpu.serving.engine import OPTEngine

    cfg = jopt.OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=128,
    )
    params = jopt.init_params(jax.random.PRNGKey(1), cfg)
    eng = OPTEngine(params, cfg, max_batch=2, max_len=64, dtype=jnp.float32)
    prompt = [5, 17, 9]
    ref = eng.generate(prompt, max_new_tokens=10)
    sd = SpecDecoder(eng, draft_layers=1, gamma=2)
    got = sd.generate(prompt, max_new_tokens=10)
    assert got == ref


@pytest.mark.parametrize("kw", [
    dict(multi_query=True, parallel_attn=True),                # falcon-7b
    dict(multi_query=False, parallel_attn=False, alibi=True),  # rw-1b
])
def test_falcon_family_spec_decode(kw):
    """Falcon verify path: the (B,1,s,kv_len) verify mask against the
    ALiBi bias broadcast and the MQA kv-head layout (ADVICE r3 #4)."""
    from omniquant_tpu.models import falcon as jfalcon
    from omniquant_tpu.serving.engine import FalconEngine

    cfg = jfalcon.FalconConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, bias=False, **{"alibi": False, **kw})
    params = jfalcon.init_params(jax.random.PRNGKey(4), cfg)
    eng = FalconEngine(params, cfg, max_batch=2, max_len=64,
                       dtype=jnp.float32)
    prompt = [5, 17, 99, 3]
    ref = eng.generate(prompt, max_new_tokens=10)
    sd = SpecDecoder(eng, draft_layers=1, gamma=2)
    got = sd.generate(prompt, max_new_tokens=10)
    assert got == ref
    assert sd.proposed > 0


def test_spec_generate_near_max_len_falls_back(tiny_llama):
    """With auto_grow off, SpecDecoder.generate near the max_len ceiling
    must shrink/abandon spec rounds (which need gamma+1 headroom each) and
    still complete exactly like engine.generate (ADVICE r3 #2)."""
    cfg, params = tiny_llama
    prompt = [5, 17, 99, 3]
    # max_len 16: prompt 4 + 12 new tokens exactly fills the cache; a
    # worst-case spec dispatch (4 rounds x gamma+1=3) would need 12 rows
    # of headroom and raise without the fallback
    ref = LlamaEngine(params, cfg, max_batch=2, max_len=16,
                      dtype=jnp.float32,
                      auto_grow=False).generate(prompt, max_new_tokens=12)
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=16,
                      dtype=jnp.float32, auto_grow=False)
    sd = SpecDecoder(eng, draft_layers=1, gamma=2)
    got = sd.generate(prompt, max_new_tokens=12)
    assert got == ref


def test_bystander_slot_capacity_guard(tiny_llama):
    """_check_capacity covers ACTIVE bystander slots: decode writes KV for
    every batch slot, so stepping slot A while active slot B sits at
    max_len-1 must raise (not silently corrupt B) (ADVICE r3 #1)."""
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=16,
                      dtype=jnp.float32, auto_grow=False)
    a = eng.add_request([5, 17, 99, 3])
    b = eng.add_request([1, 2, 3])
    eng.lengths[b] = 15  # bystander one row below the ceiling
    with pytest.raises(RuntimeError, match="max_len"):
        eng.step_n({a: 7}, 4)


def test_tp_engine_spec_decode(tiny_llama):
    """Spec decoding over the tensor-parallel engine (tp=2): layer-skip
    draft re-placed from raw params, streams equal the TP engine's own."""
    from omniquant_tpu.parallel import make_mesh
    from omniquant_tpu.serving.tp_engine import TPLlamaEngine

    cfg, params = tiny_llama
    wcfg = QuantConfig(n_bits=4, group_size=16)
    fq = dict(params)
    fq["layers"] = [
        LLAMA.effective_block_weights(b, wcfg, None, None, cfg)
        for b in params["layers"]
    ]
    packed = pack_model(LLAMA, fq, wcfg, tile_k=16)
    mesh = make_mesh(dp=1, tp=2)
    eng = TPLlamaEngine(packed, cfg, mesh, max_batch=2, max_len=64,
                        dtype=jnp.float32)
    prompt = [5, 17, 99, 3]
    ref = eng.generate(prompt, max_new_tokens=10)
    eng2 = TPLlamaEngine(packed, cfg, mesh, max_batch=2, max_len=64,
                         dtype=jnp.float32)
    sd = SpecDecoder(eng2, draft_layers=1, gamma=2)
    got = sd.generate(prompt, max_new_tokens=10)
    assert got == ref


# ---------------------------------------------------------------------------
# sampling mode (rejection-sampling acceptance)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_llama_v16():
    """Small vocab so empirical distributions converge fast."""
    cfg = jllama.LlamaConfig(
        vocab_size=16, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    params = jllama.init_params(jax.random.PRNGKey(5), cfg)
    return cfg, params


def test_sampling_spec_full_acceptance_when_draft_is_target(tiny_llama):
    """draft == target => q == p bit-for-bit => every proposal accepted
    and rounds emit gamma+1 tokens."""
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=128,
                      dtype=jnp.float32)
    sd = SpecDecoder(eng, draft_layers=cfg.num_hidden_layers, gamma=3)
    slot = sd.add_request([5, 17, 9], temperature=0.7)
    out = [sd._pending(slot)]
    for _ in range(4):
        emitted = sd.sample_spec_step({slot: out[-1]})[slot]
        assert len(emitted) == sd.gamma + 1  # full acceptance + bonus
        out.extend(emitted)
    assert sd.acceptance_rate == 1.0


def test_sampling_spec_rejects_greedy_slots_and_truncation(tiny_llama):
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=64,
                      dtype=jnp.float32)
    sd = SpecDecoder(eng, draft_layers=1, gamma=2)
    s0 = sd.add_request([5, 17])  # greedy
    with pytest.raises(ValueError, match="temperature"):
        sd.sample_spec_step({s0: 3})
    sd.release(s0)
    s1 = sd.add_request([5, 17], temperature=0.5, top_k=4)
    with pytest.raises(ValueError, match="top_k"):
        sd.sample_spec_step({s1: 3})


def test_sampling_spec_first_token_distribution(tiny_llama_v16):
    """The speculative-sampling identity: the FIRST emitted token of a
    round is distributed exactly as target temperature sampling —
    empirical frequencies over repeated rounds (same context, host rng
    advancing) must match softmax(target_logits / T) in total variation."""
    cfg, params = tiny_llama_v16
    T = 0.9
    eng = LlamaEngine(params, cfg, max_batch=1, max_len=256,
                      dtype=jnp.float32)
    sd = SpecDecoder(eng, draft_layers=1, gamma=2)
    prompt = [5, 3, 11, 7]
    slot = sd.add_request(prompt, temperature=T)
    last = sd._pending(slot)
    L = int(eng.lengths[slot])

    # oracle p at this context from the full forward
    toks = jnp.asarray(np.asarray(prompt + [last], np.int32)[None])
    logits = np.asarray(jllama.forward(params, toks, cfg))[0, -1]
    z = (logits / T).astype(np.float64)
    z -= z.max()
    p = np.exp(z) / np.exp(z).sum()

    n = 1200
    counts = np.zeros(cfg.vocab_size)
    for _ in range(n):
        emitted = sd.sample_spec_step({slot: last})[slot]
        counts[emitted[0]] += 1
        eng.lengths[slot] = L          # rewind: same context every trial
        sd.draft.lengths[slot] = L
    emp = counts / n
    tv = 0.5 * np.abs(emp - p).sum()
    # E[TV] ~ sqrt(V / (2 pi n)) ~ 0.046 here; 0.12 is a ~2.5x margin
    assert tv < 0.12, (tv, emp, p)


def test_sampling_spec_generate_runs(tiny_llama):
    """generate(temperature>0) routes through sampling rounds and emits
    max_new_tokens valid ids, falling back near the max_len ceiling."""
    cfg, params = tiny_llama
    eng = LlamaEngine(params, cfg, max_batch=2, max_len=32,
                      dtype=jnp.float32, auto_grow=False)
    sd = SpecDecoder(eng, draft_layers=1, gamma=2)
    out = sd.generate([5, 17, 9, 2], max_new_tokens=24, temperature=0.8)
    assert len(out) == 24
    assert all(0 <= t < cfg.vocab_size for t in out)


def test_layer_skip_packed_draft_head_exact(tiny_llama):
    """draft_head_bits packs the DRAFT's lm_head; the emitted stream must
    still be the target's exact greedy continuation (draft quality only
    affects speed)."""
    cfg, params = tiny_llama
    target = LlamaEngine(params, cfg, max_batch=1, max_len=64,
                         dtype=jnp.float32)
    want = target.generate([5, 17, 9], max_new_tokens=16)
    target2 = LlamaEngine(params, cfg, max_batch=1, max_len=64,
                          dtype=jnp.float32)
    sd = SpecDecoder(target2, draft_layers=1, gamma=3, draft_head_bits=4)
    from omniquant_tpu.quant.packing import PackedWeight

    assert isinstance(sd.draft.params.get("lm_head"), PackedWeight)
    got = sd.generate([5, 17, 9], max_new_tokens=16)
    assert got == want, (got, want)
