#!/usr/bin/env python
"""Generate the committed natural-image test fixtures.

The reference's E2E solver test validates on real photographs
(``/root/reference/src/tests/admm_deconv_test.jl:7-13`` pulls
fabio/lena/monarch from TestImages.jl).  This environment has no network,
so the fixtures are 256x256 crops of photographs that ship inside
locally-installed packages, each with a clear license:

* ``china.png`` / ``flower.png`` — scikit-learn's bundled sample photos
  (CC-BY 2.0, photographer danielbuechele/vultilion; see
  sklearn/datasets/images/README.txt for the attribution chain).
* ``hopper.png`` — matplotlib's bundled ``grace_hopper.jpg`` portrait
  (official U.S. Navy photograph, public domain).

Run ``python scripts/make_fixtures.py`` to regenerate
``tests/fixtures/*.png`` byte-for-byte (deterministic crops, no RNG).
"""

import os
import sys

import numpy as np
from PIL import Image

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

ATTRIBUTION = """\
# Natural-image fixtures

256x256 RGB crops of photographs bundled with locally-installed packages
(no network); regenerate with `python scripts/make_fixtures.py`.

| file | source | license |
|---|---|---|
| china.png | scikit-learn `datasets/images/china.jpg` (Flickr, danielbuechele) | CC-BY 2.0 |
| flower.png | scikit-learn `datasets/images/flower.jpg` (Flickr, vultilion) | CC-BY 2.0 |
| hopper.png | matplotlib `mpl-data/sample_data/grace_hopper.jpg` (official U.S. Navy photo) | public domain |

These serve the reference's E2E scenario
(`/root/reference/src/tests/admm_deconv_test.jl:7-13`: three real
photographs, 7x7 motion blur, tvd_fft, SSIM/PSNR before/after) with real
natural-image statistics rather than synthetic piecewise-constant scenes.
"""


def _crop(img: np.ndarray, top: int, left: int, size: int = 256) -> np.ndarray:
    return img[top : top + size, left : left + size]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    import sklearn.datasets as skd

    imgs = skd.load_sample_images()
    by_name = {
        os.path.basename(f): np.asarray(im)
        for f, im in zip(imgs.filenames, imgs.images)
    }
    import matplotlib

    hopper_path = os.path.join(
        os.path.dirname(matplotlib.__file__), "mpl-data", "sample_data",
        "grace_hopper.jpg",
    )
    hopper = np.asarray(Image.open(hopper_path).convert("RGB"))

    # Deterministic crops chosen for texture/edge content (427x640 sources;
    # hopper is 600x512).
    fixtures = {
        "china.png": _crop(by_name["china.jpg"], 100, 200),
        "flower.png": _crop(by_name["flower.jpg"], 140, 250),
        "hopper.png": _crop(hopper, 80, 120),
    }
    for name, arr in fixtures.items():
        assert arr.shape == (256, 256, 3), (name, arr.shape)
        Image.fromarray(arr.astype(np.uint8)).save(os.path.join(OUT, name))
        print("wrote", os.path.join(OUT, name))
    with open(os.path.join(OUT, "ATTRIBUTION.md"), "w") as f:
        f.write(ATTRIBUTION)
    print("wrote ATTRIBUTION.md")


if __name__ == "__main__":
    sys.exit(main())
