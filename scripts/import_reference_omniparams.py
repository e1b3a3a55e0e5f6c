"""CLI: convert a reference omni_parameters.pth to the npz resume format.

Usage:
    python scripts/import_reference_omniparams.py \
        omni_parameters.pth omni_parameters.npz

Then reproduce the reference's published perplexity with the epochs-0
resume recipe (reference README.md:105-116; docs/parity_reproduction.md):

    python main.py --model huggyllama/llama-7b --net llama-7b \
        --wbits 4 --abits 16 --group_size 128 --lwc \
        --epochs 0 --resume omni_parameters.npz --eval_ppl
"""
import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pth", help="reference omni_parameters.pth (torch)")
    ap.add_argument("npz", help="output .npz resume file")
    args = ap.parse_args()

    from omniquant_tpu.utils.import_reference import convert_file

    converted = convert_file(args.pth, args.npz)
    n_let = sum("let" in v for v in converted.values())
    n_lwc = sum("lwc" in v for v in converted.values())
    print(f"converted {len(converted)} layers "
          f"({n_lwc} with LWC, {n_let} with LET) -> {args.npz}")


if __name__ == "__main__":
    main()
