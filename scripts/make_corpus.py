#!/usr/bin/env python
"""Build a small natural-image training corpus from package-bundled photos.

Extracts deterministic 256x256 crops (plus flips) from the same three
source photographs as ``scripts/make_fixtures.py`` (CC-BY 2.0 / public
domain — see ``tests/fixtures/ATTRIBUTION.md``) into ``<dest>/train`` and
``<dest>/test`` clean splits, ready for ``scripts/make_dataset.py`` to
degrade into an AWGN training set — the reference's GOPRO corpus flow
(``src/make_dataset.jl:54-96``) scaled to what ships offline.

Usage::

    python scripts/make_corpus.py --dest /tmp/corpus [--train 24 --test 6]
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image


def _sources():
    import sklearn.datasets as skd

    imgs = skd.load_sample_images()
    out = [np.asarray(im) for im in imgs.images]  # china, flower (427x640)
    import matplotlib

    hopper = os.path.join(
        os.path.dirname(matplotlib.__file__), "mpl-data", "sample_data",
        "grace_hopper.jpg",
    )
    out.append(np.asarray(Image.open(hopper).convert("RGB")))  # 600x512
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dest", required=True)
    p.add_argument("--train", type=int, default=24)
    p.add_argument("--test", type=int, default=6)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--seed", type=int, default=11)
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    srcs = _sources()
    crops = []
    n_total = args.train + args.test
    for i in range(n_total):
        src = srcs[i % len(srcs)]
        h, w = src.shape[:2]
        top = int(rng.integers(0, h - args.size + 1))
        left = int(rng.integers(0, w - args.size + 1))
        c = src[top : top + args.size, left : left + args.size]
        if rng.random() < 0.5:
            c = c[:, ::-1]
        if rng.random() < 0.5:
            c = c[::-1]
        crops.append(np.ascontiguousarray(c))
    for split, lo, hi in (
        ("train", 0, args.train), ("test", args.train, n_total),
    ):
        d = os.path.join(args.dest, split)
        os.makedirs(d, exist_ok=True)
        for j in range(lo, hi):
            Image.fromarray(crops[j]).save(
                os.path.join(d, f"crop{j:03d}.png")
            )
        print(f"wrote {hi - lo} images to {d}")


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
