"""omniquant_tpu CLI — quantize + evaluate (reference main.py equivalent).

Examples:
  # synthetic smoke run (no network, CPU or TPU)
  python main.py --synthetic --net tiny-opt --wbits 3 --abits 16 --lwc \
      --epochs 4 --nsamples 8 --seqlen 32 --eval_ppl

  # real model from a local HF checkpoint
  python main.py --model /path/to/opt-125m --net opt-125m --wbits 4 \
      --abits 16 --group_size 128 --lwc --epochs 20 --eval_ppl
"""
import argparse
import json
import os
import random
import sys
import time
from pathlib import Path

import numpy as np


def build_parser():
    # flag surface mirrors reference main.py:193-229
    p = argparse.ArgumentParser(description="TPU-native OmniQuant")
    p.add_argument("--model", type=str, default=None,
                   help="local HF model path (no-network env: must be local)")
    p.add_argument("--synthetic", action="store_true",
                   help="use a small randomly-initialized model + synthetic data")
    p.add_argument("--net", type=str, default=None,
                   help="model family tag, e.g. opt-125m / llama-7b / tiny-opt")
    p.add_argument("--cache_dir", default="./cache", type=str)
    p.add_argument("--output_dir", default="./log/", type=str)
    p.add_argument("--save_dir", default=None, type=str,
                   help="save fake-quant model (npz pytree)")
    p.add_argument("--export_autogptq", default=False, action="store_true",
                   help="with --real_quant --save_dir: also write an "
                        "AutoGPTQ-format .pt checkpoint (the reference's "
                        "real-quant deployment layout)")
    p.add_argument("--real_quant", default=False, action="store_true",
                   help="additionally save packed int32 weights")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--calib_dataset", type=str, default="wikitext2",
                   choices=["wikitext2", "ptb", "c4", "mix", "pile",
                            "synthetic"])
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--tasks", default="")
    p.add_argument("--eval_cache", default="",
                   help="sqlite path: cache task-eval LM responses "
                        "(CachingLM) so interrupted/repeated runs skip "
                        "already-scored requests")
    p.add_argument("--eval_ppl", action="store_true")
    p.add_argument("--num_fewshot", type=int, default=0)
    p.add_argument("--wbits", type=int, default=4)
    p.add_argument("--abits", type=int, default=4)
    p.add_argument("--group_size", type=int, default=None)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--let_lr", type=float, default=5e-3)
    p.add_argument("--lwc_lr", type=float, default=1e-2)
    p.add_argument("--wd", type=float, default=0)
    # reference default: 20 (reference main.py:204); recipes set it explicitly
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--let", default=False, action="store_true")
    p.add_argument("--lwc", default=False, action="store_true")
    p.add_argument("--aug_loss", default=False, action="store_true")
    p.add_argument("--symmetric", default=False, action="store_true")
    p.add_argument("--limit", type=int, default=-1)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree for evaluation (the "
                        "reference's --multigpu analog, but real TP over a "
                        "device mesh with XLA collectives)")
    p.add_argument("--tp_overlap", type=int, default=1,
                   help="SERVING path (--serve_prompt with --tp>1): split "
                        "each TP column-parallel site into this many "
                        "independent (quant-matmul -> psum) chunks so XLA "
                        "overlaps all-reduce k with matmul k+1. The eval "
                        "path's dense TP is XLA-auto-partitioned and "
                        "ignores this flag")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel degree for calibration at "
                        "seqlen > 2048: activation buffers shard on the "
                        "sequence axis and block forwards run ring "
                        "attention (llama family)")
    p.add_argument("--offload_layers", action="store_true",
                   help="host-stream decoder layers during calibration (one on device at a time)")
    p.add_argument("--bf16_buffers", action="store_true",
                   help="store calibration activations in bfloat16")
    p.add_argument("--act-scales", dest="act_scales", type=str, default=None)
    p.add_argument("--act-shifts", dest="act_shifts", type=str, default=None)
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host: coordinator address host:port "
                        "(jax.distributed); omit on TPU pods for "
                        "auto-detection with --num_processes set")
    p.add_argument("--num_processes", type=int, default=1,
                   help="multi-host: total process count (1 = single host)")
    p.add_argument("--process_id", type=int, default=None,
                   help="multi-host: this process's rank")
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (cpu for testing)")
    p.add_argument("--debug_nans", action="store_true",
                   help="trap NaNs at the op that produced them "
                        "(jax_debug_nans; the reference dropped into pdb "
                        "only after a whole block went NaN)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the run")
    p.add_argument("--serve_prompt", type=str, default=None,
                   help="after quantization, generate from this prompt with "
                        "the continuous-batching serving engine (tensor-"
                        "sharded when --tp > 1)")
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--serve_kv_dtype", type=str, default="native",
                   choices=["native", "int8"],
                   help="serving KV-cache dtype (int8 = quantized cache)")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="serving sampling temperature (0 = greedy)")
    p.add_argument("--spec_decode", type=int, default=0, metavar="GAMMA",
                   help="speculative decoding with GAMMA proposals per "
                        "round (layer-skip self-draft of --draft_layers "
                        "blocks). Greedy (--temperature 0): output is "
                        "exactly the plain greedy stream; with "
                        "--temperature > 0: rejection-sampling acceptance "
                        "(distributed as plain target sampling)")
    p.add_argument("--draft_layers", type=int, default=4,
                   help="blocks in the layer-skip self-draft")
    return p


TINY_CONFIGS = {
    "tiny-opt": dict(vocab_size=256, hidden_size=64, ffn_dim=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     max_position_embeddings=2048),
    "tiny-llama": dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=2048),
    "tiny-falcon": dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=4, multi_query=True,
                        parallel_attn=True),
}


class CharTokenizer:
    """ASCII char-level tokenizer for --synthetic runs (lets the --tasks
    harness path run without a real tokenizer)."""

    eos_token_id = 0

    def __init__(self, vocab_size=256):
        self.vocab_size = vocab_size

    def encode(self, s, add_special_tokens=False):
        return [min(ord(c), self.vocab_size - 1) for c in s]

    def decode(self, tokens):
        return "".join(chr(max(1, int(t))) for t in tokens)

    def __call__(self, s, **kw):
        import types

        return types.SimpleNamespace(input_ids=self.encode(s))


def load_model(args, logger):
    """Returns (family, model_cfg, params, tokenizer)."""
    import jax
    from omniquant_tpu.models import get_family

    if args.synthetic:
        name = args.net or "tiny-opt"
        fam = get_family(name)
        kwargs = TINY_CONFIGS.get(name)
        if kwargs is None:
            raise SystemExit(
                f"--synthetic supports nets {sorted(TINY_CONFIGS)}; got {name}")
        cfg = fam.config_cls(**kwargs)
        params = fam.init_params(jax.random.PRNGKey(args.seed), cfg)
        return fam, cfg, params, CharTokenizer(cfg.vocab_size)

    if not args.model:
        raise SystemExit("need --model <local-hf-path> or --synthetic")
    from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer

    hf_cfg = AutoConfig.from_pretrained(args.model)
    fam = get_family(args.net or hf_cfg.model_type)
    cfg = fam.config_cls.from_hf(hf_cfg)
    logger.info(f"loading HF weights from {args.model} ...")
    hf_model = AutoModelForCausalLM.from_pretrained(
        args.model, torch_dtype="float32", low_cpu_mem_usage=True)
    params = fam.from_hf_state_dict(hf_model.state_dict(), cfg)
    del hf_model
    tokenizer = AutoTokenizer.from_pretrained(args.model, use_fast=False)
    return fam, cfg, params, tokenizer


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and max(args.tp, args.sp) > 1:
            # virtual CPU devices so --tp/--sp can be exercised off-TPU
            jax.config.update(
                "jax_num_cpu_devices", max(args.tp, args.sp, 1))
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.num_processes > 1:
        from omniquant_tpu.parallel.multihost import (
            MultihostConfig, init_multihost)

        init_multihost(MultihostConfig(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id))
    import jax.numpy as jnp

    from omniquant_tpu.calib import (
        CalibConfig, calibrate, collect_act_stats, get_loaders)
    from omniquant_tpu.eval import evaluate_ppl
    from omniquant_tpu.utils import create_logger, load_pytree, save_pytree

    random.seed(args.seed)
    np.random.seed(args.seed)

    if args.epochs > 0 and (args.wbits < 16 or args.abits < 16):
        assert args.lwc or args.let, "--epochs>0 requires --lwc or --let"
    for d in (args.output_dir, args.cache_dir, args.save_dir):
        if d:
            Path(d).mkdir(parents=True, exist_ok=True)
    logger = create_logger(args.output_dir)
    logger.info(args)
    if args.net is None and args.model:
        args.net = args.model.split("/")[-1]

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    family, model_cfg, params, tokenizer = load_model(args, logger)
    seqlen = args.seqlen
    results = {}

    cc = CalibConfig(
        wbits=args.wbits, abits=args.abits, group_size=args.group_size,
        symmetric=args.symmetric, lwc=args.lwc, let=args.let,
        alpha=args.alpha, epochs=args.epochs, nsamples=args.nsamples,
        batch_size=args.batch_size, let_lr=args.let_lr, lwc_lr=args.lwc_lr,
        wd=args.wd, aug_loss=args.aug_loss, offload_layers=args.offload_layers,
        buffer_dtype=jnp.bfloat16 if args.bf16_buffers else jnp.float32,
        output_dir=args.output_dir, resume=args.resume,
    )

    if args.wbits < 16 or args.abits < 16:
        logger.info("=== start quantization ===")
        tick = time.time()
        calib_name = "synthetic" if args.synthetic else args.calib_dataset
        cache = Path(args.cache_dir) / (
            f"calib_{args.net}_{calib_name}_{args.nsamples}_{seqlen}.npz")
        if cache.exists():
            train_tokens = np.load(cache)["tokens"]
            logger.info(f"loaded calibration tokens from {cache}")
        else:
            train_tokens, _ = get_loaders(
                calib_name, nsamples=args.nsamples, seed=args.seed,
                seqlen=seqlen, tokenizer=tokenizer,
                vocab_size=model_cfg.vocab_size)
            np.savez(cache, tokens=train_tokens)
        train_tokens = jnp.asarray(train_tokens)

        act_scales = act_shifts = None
        if args.let:
            if args.act_scales and os.path.exists(args.act_scales):
                act_scales = load_pytree(args.act_scales)
                act_shifts = load_pytree(args.act_shifts)
                logger.info("loaded act scales/shifts from disk")
            else:
                logger.info("collecting act scales/shifts ...")
                act_scales, act_shifts = collect_act_stats(
                    family, params, model_cfg, train_tokens, logger=logger)
                save_pytree(f"{args.output_dir}/act_scales.npz", act_scales)
                save_pytree(f"{args.output_dir}/act_shifts.npz", act_shifts)

        sp_mesh = None
        if args.sp > 1:
            from jax.sharding import Mesh

            sp_mesh = Mesh(np.asarray(jax.devices()[: args.sp]), ("sp",))
            logger.info(
                f"sequence-parallel calibration over {args.sp} devices "
                f"(ring attention, seqlen {args.seqlen})")
        params, omni_parameters = calibrate(
            family, params, model_cfg, train_tokens, cc,
            act_scales, act_shifts, logger=logger, sp_mesh=sp_mesh)
        logger.info(f"quantization took {time.time() - tick:.1f}s")
    else:
        omni_parameters = None

    if args.save_dir:
        logger.info(f"saving fake-quant model to {args.save_dir}")
        save_pytree(f"{args.save_dir}/model_fakequant.npz", params)
        with open(f"{args.save_dir}/config.json", "w") as f:
            json.dump({"family": family.name,
                       "config": model_cfg.__dict__,
                       "wbits": args.wbits, "abits": args.abits,
                       "group_size": args.group_size,
                       "symmetric": args.symmetric}, f, indent=2)
        if args.real_quant:
            from omniquant_tpu.serving.export import pack_model

            packed = pack_model(
                family, params, cc.weight_quant_config, omni_parameters)
            save_pytree(f"{args.save_dir}/model_packed.npz", packed)
            logger.info("saved packed real-quant weights")
            if args.export_autogptq:
                from omniquant_tpu.serving.export_autogptq import (
                    save_autogptq_checkpoint)

                save_autogptq_checkpoint(
                    family.name, packed,
                    f"{args.save_dir}/model_autogptq.pt")
                logger.info(
                    "saved AutoGPTQ-format checkpoint (reference "
                    "real-quant interop, quantize/omniquant.py:255-277)")

    if args.tp > 1:
        from omniquant_tpu.parallel import make_mesh, model_specs, shard_params

        logger.info(f"sharding model tensor-parallel over {args.tp} devices")
        mesh = make_mesh(dp=1, tp=args.tp)
        params = shard_params(
            params, mesh, model_specs(family.name, params))

    if args.eval_ppl:
        eval_sets = (["synthetic"] if args.synthetic
                     else ["wikitext2", "ptb", "c4", "ptb-new", "c4-new"])
        spec = cc.act_quant_spec
        for ds in eval_sets:
            cache = Path(args.cache_dir) / f"testloader_{args.net}_{ds}.npz"
            if cache.exists():
                test_tokens = np.load(cache)["tokens"]
            else:
                try:
                    _, test_tokens = get_loaders(
                        ds, nsamples=0, seed=args.seed, seqlen=seqlen,
                        tokenizer=tokenizer, vocab_size=model_cfg.vocab_size)
                except Exception as e:  # dataset unavailable offline
                    logger.info(f"skipping {ds}: {e}")
                    continue
                np.savez(cache, tokens=test_tokens)
            ppl = evaluate_ppl(
                family, params, model_cfg, test_tokens, seqlen=seqlen,
                spec=spec,
                limit=None if args.limit < 0 else args.limit, logger=logger)
            logger.info(f"{ds} : {ppl}")
            results[ds] = ppl

    if args.tasks:
        from omniquant_tpu.eval.harness import run_tasks

        t_results = run_tasks(
            family, params, model_cfg, tokenizer, args.tasks.split(","),
            num_fewshot=args.num_fewshot,
            limit=None if args.limit < 0 else args.limit,
            spec=cc.act_quant_spec, logger=logger,
            cache_db=args.eval_cache or None,
            # every flag that influences the evaluated model must land in
            # the fingerprint, or two runs differing only in (say)
            # --calib_dataset would silently share cached task scores
            cache_fingerprint="|".join(map(str, (
                args.net, args.model, args.wbits, args.abits,
                args.group_size, args.lwc, args.let, args.symmetric,
                args.epochs, args.resume, args.seed,
                args.calib_dataset, args.nsamples, args.batch_size,
                args.seqlen, args.alpha, args.aug_loss,
                args.act_scales, args.act_shifts,
                args.let_lr, args.lwc_lr, args.wd,
                args.sp, args.offload_layers, args.bf16_buffers,
                args.synthetic))))
        results.update(t_results)

    if args.serve_prompt is not None:
        from omniquant_tpu.serving.engine import (
            FalconEngine, LlamaEngine, OPTEngine)

        eng_map = {"llama": LlamaEngine, "opt": OPTEngine,
                   "falcon": FalconEngine}
        seqlen = min(getattr(model_cfg, "max_position_embeddings", 2048),
                     2048)
        if args.tp > 1:
            from omniquant_tpu.parallel import make_mesh
            from omniquant_tpu.serving.tp_engine import TP_ENGINES

            eng = TP_ENGINES[family.name](
                params, model_cfg, make_mesh(dp=1, tp=args.tp),
                max_batch=1, max_len=seqlen,
                kv_dtype=args.serve_kv_dtype, auto_grow=False,
                overlap_chunks=args.tp_overlap)
            logger.info(f"serving tensor-sharded over tp={args.tp}")
        else:
            eng = eng_map[family.name](
                params, model_cfg, max_batch=1, max_len=seqlen,
                kv_dtype=args.serve_kv_dtype, auto_grow=False)
        toks = tokenizer.encode(args.serve_prompt, add_special_tokens=False)
        if args.spec_decode > 0:
            from omniquant_tpu.serving.spec_decode import SpecDecoder

            sd = SpecDecoder(eng, draft_layers=args.draft_layers,
                             gamma=args.spec_decode)
            # temperature > 0 routes through speculative SAMPLING
            # (rejection-sampling acceptance; emitted stream distributed
            # as plain target sampling) — serving/spec_decode.py
            out = sd.generate(list(toks),
                              max_new_tokens=args.max_new_tokens,
                              temperature=args.temperature)
            logger.info(
                f"spec-decode acceptance {sd.acceptance_rate:.2f} "
                f"({sd.accepted}/{sd.proposed})")
        else:
            out = eng.generate(list(toks),
                               max_new_tokens=args.max_new_tokens,
                               temperature=args.temperature)
        text = tokenizer.decode(out)
        logger.info(f"generated {len(out)} tokens")
        results["generation"] = text
        print(text)

    if args.profile_dir:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {args.profile_dir}")
    logger.info(json.dumps(results))
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
