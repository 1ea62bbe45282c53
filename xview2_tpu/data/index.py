"""Train-index builder: ``index.csv`` generation.

Equivalent of ``/root/reference/utils/generate_idx.py``: for every pre/post
image pair, drop excluded indices, drop tiles whose pre-AND-post foreground
bounding box is smaller than 512px in either dimension, and record per-image
presence flags for damage classes 1-4.  The resulting CSV drives train-set
selection (pre: all rows; post: rows with any damage flag).
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
import time
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from typing import List, Optional

import numpy as np
import pandas as pd
from joblib import Parallel, delayed
from PIL import Image

from xview2_tpu.data.exclude_list import default_excluded


def _foreground_box(img_pre: np.ndarray, img_post: np.ndarray):
    """Intersection bbox of the non-black regions of the pair."""
    h_pre, w_pre = np.where(img_pre.max(axis=-1) > 0)
    h_post, w_post = np.where(img_post.max(axis=-1) > 0)
    if h_pre.size == 0 or h_post.size == 0:
        return 0, 0, 0, 0
    min_h = max(h_pre.min(), h_post.min())
    max_h = min(h_pre.max(), h_post.max())
    min_w = max(w_pre.min(), w_post.min())
    max_w = min(w_pre.max(), w_post.max())
    return min_h, max_h, min_w, max_w


def build_row(idx: int, img_pre_path: str, img_post_path: str,
              lbl_post_path: str, excluded: set, min_size: Optional[int] = 512):
    """One index row; ``min_size=None`` scales the reference's 512-px
    foreground threshold (``generate_idx.py:18-32``, designed for 1024^2
    tiles) to half the tile height, so it is exact parity on real xBD data
    and still meaningful on smaller synthetic tiles."""
    if idx in excluded:
        return None
    img_pre = np.asarray(Image.open(img_pre_path).convert("RGB"))
    img_post = np.asarray(Image.open(img_post_path).convert("RGB"))
    if min_size is None:
        min_size = 512 * img_pre.shape[0] // 1024
    min_h, max_h, min_w, max_w = _foreground_box(img_pre, img_post)
    if (max_h - min_h) < min_size or (max_w - min_w) < min_size:
        return None
    lbl = np.asarray(Image.open(lbl_post_path))
    present = set(np.unique(lbl).tolist())
    row = {"idx": idx}
    for c in (1, 2, 3, 4):
        row[str(c)] = 1 if c in present else 0
    return row


def generate_index(data_dir: str, out_csv: str,
                   exclude_path: Optional[str] = None, n_jobs: int = -1,
                   min_size: Optional[int] = 512) -> pd.DataFrame:
    imgs_pre = sorted(glob.glob(os.path.join(data_dir, "images", "*pre*")))
    imgs_post = sorted(glob.glob(os.path.join(data_dir, "images", "*post*")))
    lbls_post = sorted(glob.glob(os.path.join(data_dir, "targets", "*post*")))
    assert len(imgs_pre) == len(imgs_post) == len(lbls_post) and imgs_pre, \
        f"unpaired data under {data_dir}"
    if exclude_path and os.path.exists(exclude_path):
        with open(exclude_path) as f:
            excluded = set(json.load(f))
    else:
        # the reference unconditionally drops its bundled exclude indices
        # (generate_idx.py:15); default_excluded applies them only when the
        # tree is xBD-shaped so synthetic/subset trees are unaffected
        excluded = set(default_excluded(len(imgs_pre)))
    rows = Parallel(n_jobs=n_jobs)(
        delayed(build_row)(i, imgs_pre[i], imgs_post[i], lbls_post[i], excluded,
                           min_size)
        for i in range(len(imgs_pre)))
    rows = [r for r in rows if r is not None]
    df = pd.DataFrame(rows, columns=["idx", "1", "2", "3", "4"])
    if len(df) == 0:
        # do NOT write an empty index: a later run would silently reuse it
        # (0 train samples, 0 steps/epoch) via the exists() early-out
        raise RuntimeError(
            f"train index is empty: every tile under {data_dir} was excluded "
            "or failed the foreground-size filter")
    out_dir = os.path.dirname(os.path.abspath(out_csv))
    os.makedirs(out_dir, exist_ok=True)
    # atomic publish: concurrent writers (multi-host training into a shared
    # --results) each complete a private temp file and os.replace it — readers
    # never observe a partially written index
    fd, tmp = tempfile.mkstemp(prefix=".index.", suffix=".csv", dir=out_dir)
    try:
        with os.fdopen(fd, "w") as f:
            df.to_csv(f, index=False)
        os.replace(tmp, out_csv)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return df


def _wait_for_file(path: str, timeout_s: float = 600.0) -> None:
    deadline = time.monotonic() + timeout_s
    while not os.path.exists(path):
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"timed out waiting for host 0 to publish {path}")
        time.sleep(0.5)


def ensure_index(cfg) -> str:
    """Resolve the train index for a run, generating it when absent.

    The reference *always* restricts training through ``utils/index.csv``
    (hardcoded read, ``pytorch_loader.py:64, 101-107``); it ships the file
    precomputed.  On first train with no ``--index_csv`` we build it once
    under ``--results`` with the same foreground-bbox filter (threshold scaled
    to tile size: exact 512 px on 1024^2 tiles) and class-presence flags.

    Exclusion precedence (reference ``generate_idx.py:15``): an explicit
    ``--exclude`` JSON file, else ``{data}/train/exclude.txt`` when present,
    else the bundled reference list (applied only on xBD-shaped trees,
    ``data/exclude_list.py``).

    Under multi-host training into a shared ``--results``, only process 0
    generates (single-writer); other hosts wait for the atomic publish.
    """
    if cfg.index_csv:
        if not os.path.exists(cfg.index_csv):
            raise FileNotFoundError(f"--index_csv {cfg.index_csv} does not exist")
        return cfg.index_csv
    out_csv = os.path.join(cfg.results, "index.csv")
    if not os.path.exists(out_csv):
        exclude = getattr(cfg, "exclude", None)
        if exclude and not os.path.exists(exclude):
            raise FileNotFoundError(f"--exclude {exclude} does not exist")
        train_dir = os.path.join(cfg.data, "train")
        if not exclude:
            tree_exclude = os.path.join(train_dir, "exclude.txt")
            exclude = tree_exclude if os.path.exists(tree_exclude) else None
        import jax

        if jax.process_count() > 1 and jax.process_index() != 0:
            _wait_for_file(out_csv)
            return out_csv
        print(f"generating train index {out_csv} (no --index_csv given)", flush=True)
        generate_index(train_dir, out_csv, exclude_path=exclude, min_size=None)
    return out_csv


def main(argv=None) -> int:
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("--data", type=str, default="/data/train",
                        help="Train split dir with images/ and targets/")
    parser.add_argument("--out", type=str, required=True, help="Output CSV path")
    parser.add_argument("--exclude", type=str, default=None,
                        help="JSON list of excluded indices")
    parser.add_argument("--n_jobs", type=int, default=-1)
    args = parser.parse_args(argv)
    generate_index(args.data, args.out, args.exclude, args.n_jobs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
