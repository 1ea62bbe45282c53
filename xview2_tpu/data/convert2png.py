"""xBD GeoJSON label rasterizer: ``labels/*.json`` -> ``targets/*.png``.

Equivalent of ``/root/reference/utils/convert2png.py``: WKT polygons from the
``features.xy`` list are filled into a 1024x1024 uint8 mask; pre-disaster
masks get value 1, post-disaster masks get the damage code
{no-damage: 1, minor-damage: 2, major-damage: 3, destroyed: 4,
un-classified: 255}.

shapely is not available in this environment, so exterior rings are pulled
from the WKT with a minimal parser (xBD polygons are simple exteriors).
"""

from __future__ import annotations

import glob
import json
import os
import re
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from typing import List

import cv2
import numpy as np
from joblib import Parallel, delayed

DAMAGE_DICT = {"no-damage": 1, "minor-damage": 2, "major-damage": 3,
               "destroyed": 4, "un-classified": 255}


def wkt_polygon_exterior(wkt: str) -> np.ndarray:
    """Parse the exterior ring of a WKT POLYGON into int32 (N, 2) xy coords."""
    wkt = wkt.strip()
    if not wkt.upper().startswith("POLYGON"):
        raise ValueError(f"expected POLYGON WKT, got {wkt[:30]!r}")
    # the first parenthesized ring is the exterior
    m = re.search(r"\(\(([^()]*)\)", wkt)
    if not m:
        raise ValueError(f"malformed WKT: {wkt[:60]!r}")
    pts = []
    for pair in m.group(1).split(","):
        x, y = pair.split()[:2]
        pts.append((float(x), float(y)))
    return np.round(np.array(pts)).astype(np.int32)


def convert_label(json_path: str, mode: str, save_path: str,
                  size: int = 1024) -> None:
    fname = os.path.basename(json_path).replace(".json", ".png")
    with open(json_path) as f:
        payload = json.load(f)
    mask = np.zeros((size, size), np.uint8)
    for feat in payload["features"]["xy"]:
        ring = wkt_polygon_exterior(feat["wkt"])
        fill = np.zeros((size, size), np.uint8)
        cv2.fillPoly(fill, [ring], 1)
        if mode == "pre":
            mask[fill > 0] = 1
        else:
            mask[fill > 0] = DAMAGE_DICT[feat["properties"]["subtype"]]
    cv2.imwrite(os.path.join(save_path, fname), mask,
                [cv2.IMWRITE_PNG_COMPRESSION, 9])


def convert_dataset(data_dir: str, n_jobs: int = -1) -> str:
    save_path = os.path.join(data_dir, "targets")
    os.makedirs(save_path, exist_ok=True)
    for mode in ("pre", "post"):
        files = sorted(glob.glob(os.path.join(data_dir, "labels", f"*{mode}*")))
        Parallel(n_jobs=n_jobs)(
            delayed(convert_label)(f, mode, save_path) for f in files)
    return save_path


def main(argv=None) -> int:
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("--data", type=str, required=True,
                        help="Dataset split dir containing labels/")
    parser.add_argument("--n_jobs", type=int, default=-1, help="Number of jobs")
    args = parser.parse_args(argv)
    convert_dataset(args.data, args.n_jobs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
