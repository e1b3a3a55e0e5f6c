"""Standalone activation-statistics tool (reference generate_act_scale_shift.py).

Collects per-linear input abs-max scales and EMA midrange shifts over a
calibration set and saves them as npz pytrees for --act-scales/--act-shifts.

  python generate_act_stats.py --model /path/to/model --calib_dataset wikitext2
  python generate_act_stats.py --synthetic --net tiny-opt
"""
import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--net", type=str, default=None)
    p.add_argument("--calib_dataset", type=str, default="wikitext2")
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--output_dir", type=str, default="./act_stats")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from main import load_model
    from omniquant_tpu.calib import collect_act_stats, get_loaders
    from omniquant_tpu.utils import create_logger, save_pytree

    logger = create_logger(args.output_dir)
    family, cfg, params, tokenizer = load_model(args, logger)
    name = args.net or (args.model or "model").split("/")[-1]
    calib = "synthetic" if args.synthetic else args.calib_dataset
    tokens, _ = get_loaders(
        calib, nsamples=args.nsamples, seed=args.seed, seqlen=args.seqlen,
        tokenizer=tokenizer, vocab_size=cfg.vocab_size)
    scales, shifts = collect_act_stats(
        family, params, cfg, jnp.asarray(tokens), logger=logger)
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    save_pytree(f"{args.output_dir}/{name}_scales.npz", scales)
    save_pytree(f"{args.output_dir}/{name}_shifts.npz", shifts)
    logger.info(f"saved act scales/shifts for {name} to {args.output_dir}")


if __name__ == "__main__":
    main()
