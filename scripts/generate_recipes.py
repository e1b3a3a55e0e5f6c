#!/usr/bin/env python
"""Generate the blessed hyperparameter recipe matrix as shell scripts.

Mirrors the reference's scripts/{family}/{size}/{scheme}.sh matrix
(SURVEY.md §5 "Config / flag system": epochs 20 default, 40 + nsamples 32
for falcon-180b, --aug_loss for w4a4 llama/chat/falcon, --let for all OPT
including weight-only, --alpha 0.75 for opt-6.7b w4a4), retargeted at this
framework's CLI.

Run: python scripts/generate_recipes.py  (writes scripts/<family>/<size>/)
"""
import os
from pathlib import Path

ROOT = Path(__file__).resolve().parent

WEIGHT_ONLY = ["w2a16", "w2a16g128", "w2a16g64", "w3a16", "w3a16g128",
               "w4a16", "w4a16g128"]
WEIGHT_ACT = ["w4a4", "w6a6"]

MODELS = {
    "llama": ["llama-7b", "llama-13b", "llama-30b", "llama-65b"],
    "Llama-2": ["Llama-2-7b", "Llama-2-13b", "Llama-2-70b"],
    "Llama-2-chat": ["Llama-2-7b-chat", "Llama-2-13b-chat"],
    "opt": ["opt-125m", "opt-1.3b", "opt-2.7b", "opt-6.7b", "opt-13b",
            "opt-30b", "opt-66b"],
    "falcon": ["falcon-7b", "falcon-180b"],
}


def parse_scheme(scheme):
    w = int(scheme[1])
    rest = scheme.split("a", 1)[1]
    if "g" in rest:
        a, g = rest.split("g")
        return w, int(a), int(g)
    return w, int(rest), None


def flags_for(family, model, scheme):
    w, a, g = parse_scheme(scheme)
    flags = [f"--wbits {w}", f"--abits {a}"]
    if g:
        flags.append(f"--group_size {g}")
    flags.append("--lwc")
    epochs = 20
    nsamples = None
    if family in ("llama", "Llama-2", "Llama-2-chat"):
        if a < 16:
            flags.append("--let")
            flags.append("--aug_loss")
    elif family == "opt":
        flags.append("--let")  # reference uses LET for all OPT schemes
        if model == "opt-6.7b" and scheme == "w4a4":
            flags.append("--alpha 0.75")
    elif family == "falcon":
        # falcon is LWC-only; 180b uses the long-calibration recipe
        if model == "falcon-180b":
            epochs = 40
            nsamples = 32
            flags.append("--aug_loss")
    flags.insert(0, f"--epochs {epochs}")
    if nsamples:
        flags.append(f"--nsamples {nsamples}")
    return flags


def main():
    count = 0
    for family, models in MODELS.items():
        schemes = list(WEIGHT_ONLY)
        if family != "falcon":
            schemes += WEIGHT_ACT
        if family == "falcon":
            schemes += ["w3a16g512"]
        for model in models:
            for scheme in schemes:
                flags = flags_for(family, model, scheme)
                d = ROOT / family / model
                d.mkdir(parents=True, exist_ok=True)
                body = (
                    "python main.py \\\n"
                    f"--model /PATH/TO/{family}/{model} --eval_ppl \\\n"
                    f"--output_dir ./log/{model}-{scheme} \\\n"
                    + " ".join(flags) + "\n"
                )
                (d / f"{scheme}.sh").write_text(body)
                count += 1
    print(f"wrote {count} recipe scripts under {ROOT}")


if __name__ == "__main__":
    main()
