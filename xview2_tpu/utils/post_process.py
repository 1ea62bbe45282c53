"""Offline prediction post-processing.

Behavior-identical rewrite of ``/root/reference/utils/post_process.py``:

* pairs sorted ``*localization*.npy`` with ``*damage*.npy`` prob dumps,
* damage label map = argmax+1 when the dump is 4-channel (softmax) else the
  dump already holds labels (CORAL/MSE heads),
* building mask = ``loc > 0.3  OR  (loc > 0.1 AND dmg > 1)``,
* damage gated by the mask,
* optional connected-component majority vote per building (scipy label),
* optional square dilation (``scipy.ndimage.maximum_filter`` — equivalent to
  ``skimage.morphology.dilation(img, square(n))``),
* writes ``{basename}_prediction.png`` pairs.

Unlike the reference, the results root is a parameter instead of a hardcoded
``/results`` (reference ``post_process.py:20, 58-63``).
"""

from __future__ import annotations

import os
import shutil
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from glob import glob
from typing import Optional

import numpy as np
from joblib import Parallel, delayed
from PIL import Image
from scipy import ndimage

LOC_THRESH_HIGH = 0.3
LOC_THRESH_LOW = 0.1


def process_pair(loc_path: str, dmg_path: str, out_dir: str, *,
                 components: bool = False, dilate: bool = False,
                 dilation_rate: int = 3) -> None:
    loc = np.load(loc_path)
    dmg = np.load(dmg_path)

    if dmg.ndim == 3 and dmg.shape[0] == 4:
        dmg_labels = np.argmax(dmg, axis=0) + 1
    else:
        dmg_labels = dmg

    building = np.zeros(loc.shape, np.float64)
    keep = (loc > LOC_THRESH_HIGH) | ((loc > LOC_THRESH_LOW) & (dmg_labels > 1))
    building[keep] = 1
    dmg_labels = dmg_labels * building

    if components:
        comp, n = ndimage.label(dmg_labels > 0)
        for b in range(1, n + 1):
            sel = comp == b
            vals, counts = np.unique(dmg_labels[sel], return_counts=True)
            dmg_labels[sel] = vals[np.argmax(counts)]
    if dilate:
        building = ndimage.maximum_filter(building, size=dilation_rate)
        dmg_labels = ndimage.maximum_filter(dmg_labels, size=dilation_rate)

    def save(arr, src):
        name = os.path.basename(src).replace(".npy", "_prediction.png")
        Image.fromarray(arr.astype(np.uint8)).save(os.path.join(out_dir, name))

    save(building, loc_path)
    save(dmg_labels, dmg_path)


def post_process_dir(results: str = "/results", *, components: bool = False,
                     dilate: bool = False, dilation_rate: int = 3,
                     n_jobs: int = -1) -> str:
    out_dir = os.path.join(results, "predictions")
    # start from an empty dir: stale predictions from a previous, larger run
    # would otherwise survive into the scorer's sorted-glob pairing
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    loc_paths = sorted(glob(os.path.join(results, "probs", "*localization*")))
    dmg_paths = sorted(glob(os.path.join(results, "probs", "*damage*")))
    Parallel(n_jobs=n_jobs)(
        delayed(process_pair)(lp, dp, out_dir, components=components,
                              dilate=dilate, dilation_rate=dilation_rate)
        for lp, dp in zip(loc_paths, dmg_paths)
    )
    return out_dir


def main(argv=None) -> int:
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    arg = parser.add_argument
    arg("--results", type=str, default="/results", help="Results root directory")
    arg("--components", action="store_true",
        help="Enable connected component analysis for post disaster")
    arg("--dilate", action="store_true", help="Dilate pre and post images")
    arg("--dilation_rate", type=int, default=3, help="Dilation rate")
    args = parser.parse_args(argv)
    post_process_dir(args.results, components=args.components,
                     dilate=args.dilate, dilation_rate=args.dilation_rate)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
