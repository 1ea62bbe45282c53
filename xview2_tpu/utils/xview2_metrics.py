"""Official xView2 scorer, behavior-identical rewrite.

Reproduces ``/root/reference/utils/xview2_metrics.py`` exactly — this is the
parity contract (SURVEY.md §6):

* strict input validation: 1024x1024 uint8 PNGs with values in {0..4},
* per-image TP/FN/FP rows computed in a process pool,
* damage scored only where the *target* damage map has buildings, with the
  damage prediction gated by the *predicted* localization mask,
* localization F1 over class 1; per-class damage F1 for classes 1..4,
* damage aggregate = harmonic mean with the 1e-6 guard,
* final score = 0.3 * loc_f1 + 0.7 * damage_f1,
* JSON output with the same keys.

CLI uses argparse instead of ``fire`` (not available here):
``python -m xview2_tpu.utils.xview2_metrics PRED_DIR TARG_DIR OUT_JSON``.
"""

from __future__ import annotations

import json
import os
from multiprocessing import Pool, cpu_count
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np
from PIL import Image


def load_and_validate(path: Path) -> np.ndarray:
    assert path.is_file(), f"file '{path}' does not exist or is not a file"
    img = np.array(Image.open(path))
    assert img.dtype == np.uint8, f"{path.name} is of wrong format {img.dtype} - should be np.uint8"
    assert set(np.unique(img)) <= {0, 1, 2, 3, 4}, \
        f"values must ints 0-4, found {np.unique(img)}, path: {path}"
    assert img.shape == (1024, 1024), f"{path} must be a 1024x1024 image"
    return img


def tp_fn_fp(pred: np.ndarray, targ: np.ndarray, c: int) -> List[int]:
    tp = int(np.logical_and(pred == c, targ == c).sum())
    fn = int(np.logical_and(pred != c, targ == c).sum())
    fp = int(np.logical_and(pred == c, targ != c).sum())
    return [tp, fn, fp]


def image_rows(paths: Tuple[str, str, str, str]) -> Tuple[List[int], List[int]]:
    """(localization row, damage row) for one image quadruple
    (loc pred, dmg pred, loc target, dmg target)."""
    lp, dp, lt, dt = (load_and_validate(Path(p)) for p in paths)
    lp_b = (lp > 0).astype(lp.dtype)
    lt_b = (lt > 0).astype(lt.dtype)
    dt_b = (dt > 0).astype(dt.dtype)

    dp = dp * lp_b  # damage prediction only counts where buildings predicted
    sel = dt_b == 1  # ...and scored only where the target has buildings
    dp_sel, dt_sel = dp[sel], dt[sel]

    lrow = tp_fn_fp(lp_b, lt_b, 1)
    drow: List[int] = []
    for c in range(1, 5):
        drow += tp_fn_fp(dp_sel, dt_sel, c)
    return lrow, drow


def f1_from_counts(tp: int, fp: int, fn: int) -> float:
    if tp == 0:
        return 0.0
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    if precision == 0 or recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def harmonic_mean(xs) -> float:
    return len(xs) / sum((x + 1e-6) ** -1 for x in xs)


def discover_pairs(pred_dir: str, targ_dir: str) -> List[Tuple[str, str, str, str]]:
    """One quadruple per ``*_localization_*_target.png`` in targ_dir
    (reference xview2_metrics.py:191-201)."""
    pred_dir_p, targ_dir_p = Path(pred_dir), Path(targ_dir)
    assert pred_dir_p.is_dir(), f"Could not find prediction directory: '{pred_dir}'"
    assert targ_dir_p.is_dir(), f"Could not find target directory: '{targ_dir}'"
    quads = []
    for path in sorted(targ_dir_p.glob("*.png")):
        test_hold, loc_dmg, img_id, target = path.name.rstrip(".png").split("_")
        assert loc_dmg in ("localization", "damage"), \
            f"target filenames must have 'localization' or 'damage' in filename, got {path}"
        assert target == "target", f"{target} should equal 'target' when getting path handlers"
        if loc_dmg != "localization":
            continue
        quads.append((
            str(pred_dir_p / f"{test_hold}_localization_{img_id}_prediction.png"),
            str(pred_dir_p / f"{test_hold}_damage_{img_id}_prediction.png"),
            str(targ_dir_p / f"{test_hold}_localization_{img_id}_target.png"),
            str(targ_dir_p / f"{test_hold}_damage_{img_id}_target.png"),
        ))
    return quads


def compute_score(pred_dir: str, targ_dir: str, out_fp: str, *,
                  processes: int = 0) -> Dict[str, float]:
    print(f"Calculating metrics using {cpu_count()} cpus...")
    quads = discover_pairs(pred_dir, targ_dir)
    if processes == 1:
        rows = [image_rows(q) for q in quads]
    else:
        with Pool(processes or None) as pool:
            rows = pool.map(image_rows, quads)

    lsum = np.array([lrow for lrow, _ in rows]).sum(axis=0) if rows else np.zeros(3, int)
    loc_f1 = f1_from_counts(lsum[0], lsum[2], lsum[1])

    dsum = np.array([drow for _, drow in rows]).sum(axis=0) if rows else np.zeros(12, int)
    dmg_f1s = [f1_from_counts(dsum[3 * i], dsum[3 * i + 2], dsum[3 * i + 1]) for i in range(4)]
    dmg_f1 = harmonic_mean(dmg_f1s)

    d = {
        "score": 0.3 * loc_f1 + 0.7 * dmg_f1,
        "damage_f1": dmg_f1,
        "localization_f1": loc_f1,
        "damage_f1_no_damage": dmg_f1s[0],
        "damage_f1_minor_damage": dmg_f1s[1],
        "damage_f1_major_damage": dmg_f1s[2],
        "damage_f1_destroyed": dmg_f1s[3],
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_fp)), exist_ok=True)
    with open(out_fp, "w") as f:
        json.dump(d, f)
    print(f"Wrote metrics to {out_fp}")
    return d


def main(argv=None) -> int:
    from argparse import ArgumentParser

    parser = ArgumentParser(description="xView2 metric scorer")
    parser.add_argument("pred_dir")
    parser.add_argument("targ_dir")
    parser.add_argument("out_fp")
    args = parser.parse_args(argv)
    compute_score(args.pred_dir, args.targ_dir, args.out_fp)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
