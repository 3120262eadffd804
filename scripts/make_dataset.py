#!/usr/bin/env python
"""Dataset builder CLI — the reference's ``src/make_dataset.jl`` without its
hardcoded Windows paths: AWGN-degraded ``x/`` + clean-copy ``y/`` pairs from
any directory of clean images.

Usage::

    python scripts/make_dataset.py --src /data/clean --dest /data/awgn_25_25 \
        --min-sigma 25 --max-sigma 25
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from admm_deconv_tpu.data import generate_awgn_dataset


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True, help="directory of clean images")
    p.add_argument("--dest", required=True, help="output dataset directory")
    p.add_argument("--min-sigma", type=float, default=25.0)
    p.add_argument("--max-sigma", type=float, default=25.0)
    p.add_argument("--extension", default=".png")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    n = generate_awgn_dataset(
        args.src, args.dest, args.min_sigma, args.max_sigma, args.extension, args.seed
    )
    print(f"wrote {n} pairs to {args.dest}/x and {args.dest}/y")


if __name__ == "__main__":
    main()
