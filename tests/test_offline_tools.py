"""Offline tool tests: label rasterizer (WKT) and train-index builder."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from xview2_tpu.data.convert2png import convert_label, wkt_polygon_exterior
from xview2_tpu.data.index import generate_index


def test_wkt_parser_simple_polygon():
    ring = wkt_polygon_exterior("POLYGON ((10 20, 30 20, 30 40, 10 40, 10 20))")
    np.testing.assert_array_equal(ring, [[10, 20], [30, 20], [30, 40], [10, 40], [10, 20]])


def test_wkt_parser_rounds_and_rejects():
    ring = wkt_polygon_exterior("POLYGON((1.4 2.6, 3.5 0.2, 0.0 0.0, 1.4 2.6))")
    assert ring.dtype == np.int32
    np.testing.assert_array_equal(ring[0], [1, 3])
    with pytest.raises(ValueError):
        wkt_polygon_exterior("LINESTRING (0 0, 1 1)")


def _write_label_json(path, features):
    payload = {"features": {"xy": features}}
    with open(path, "w") as f:
        json.dump(payload, f)


def test_convert_label_pre_and_post(tmp_path):
    # one 20x20 square building at (10,10)
    feat = {"wkt": "POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))",
            "properties": {"subtype": "major-damage"}}
    jpath = tmp_path / "x_pre_disaster.json"
    _write_label_json(jpath, [feat])
    out = tmp_path / "out"
    out.mkdir()
    convert_label(str(jpath), "pre", str(out), size=64)
    mask = np.array(Image.open(out / "x_pre_disaster.png"))
    assert mask.shape == (64, 64)
    assert mask[20, 20] == 1 and mask[5, 5] == 0

    convert_label(str(jpath), "post", str(out), size=64)
    mask = np.array(Image.open(out / "x_pre_disaster.png"))
    assert mask[20, 20] == 3  # major-damage

    feat2 = dict(feat, properties={"subtype": "un-classified"})
    _write_label_json(jpath, [feat2])
    convert_label(str(jpath), "post", str(out), size=64)
    mask = np.array(Image.open(out / "x_pre_disaster.png"))
    assert mask[20, 20] == 255  # un-classified code (reference convert2png.py:24)


def _make_train_tree(root, n, size, fg_size=None, damage=2):
    """Synthetic train split with controllable foreground extent."""
    img_dir = os.path.join(root, "images")
    tgt_dir = os.path.join(root, "targets")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(tgt_dir, exist_ok=True)
    for i in range(n):
        img = np.zeros((size, size, 3), np.uint8)
        fs = fg_size[i] if fg_size else size
        img[:fs, :fs] = 128  # foreground block
        lbl = np.zeros((size, size), np.uint8)
        lbl[4:10, 4:10] = damage
        base = f"t_{i:08d}"
        Image.fromarray(img).save(os.path.join(img_dir, f"{base}_pre_disaster.png"))
        Image.fromarray(img).save(os.path.join(img_dir, f"{base}_post_disaster.png"))
        Image.fromarray((lbl > 0).astype(np.uint8)).save(
            os.path.join(tgt_dir, f"{base}_pre_disaster.png"))
        Image.fromarray(lbl).save(os.path.join(tgt_dir, f"{base}_post_disaster.png"))


def test_generate_index_filters_and_flags(tmp_path):
    root = str(tmp_path / "train")
    # 4 tiles: idx 1 has tiny foreground (dropped), idx 3 excluded
    _make_train_tree(root, 4, size=64, fg_size=[64, 16, 64, 64])
    exclude = tmp_path / "exclude.txt"
    exclude.write_text("[3]")
    out_csv = str(tmp_path / "index.csv")
    # min_size default 512 drops everything at size 64 — generate_index must
    # refuse to write an empty index (poisoning guard) — then apply the
    # filter sized for the test via build_row directly
    with pytest.raises(RuntimeError, match="train index is empty"):
        generate_index(root, out_csv, str(exclude), n_jobs=1)
    assert not os.path.exists(out_csv)
    from xview2_tpu.data.index import build_row
    import glob
    imgs_pre = sorted(glob.glob(os.path.join(root, "images", "*pre*")))
    imgs_post = sorted(glob.glob(os.path.join(root, "images", "*post*")))
    lbls_post = sorted(glob.glob(os.path.join(root, "targets", "*post*")))
    rows = [build_row(i, imgs_pre[i], imgs_post[i], lbls_post[i], {3}, min_size=32)
            for i in range(4)]
    kept = [r for r in rows if r is not None]
    assert [r["idx"] for r in kept] == [0, 2]  # 1 dropped (small fg), 3 excluded
    assert all(r["2"] == 1 and r["1"] == 0 for r in kept)  # damage-2 flag set


def test_bundled_exclude_list_gating():
    """The bundled reference exclude list (utils/exclude.txt values,
    generate_idx.py:15) applies only on xBD-shaped trees."""
    from xview2_tpu.data.exclude_list import EXCLUDE_IDX, default_excluded

    assert len(EXCLUDE_IDX) == 361 and len(set(EXCLUDE_IDX)) == 361
    assert min(EXCLUDE_IDX) == 2 and max(EXCLUDE_IDX) == 9134
    # xBD train split: 9,168 pre/post pairs -> full list applies
    assert default_excluded(9168) == frozenset(EXCLUDE_IDX)
    # synthetic/subset trees: no silent exclusions
    assert default_excluded(100) == frozenset()
    assert default_excluded(9134) == frozenset()


def test_generate_index_uses_bundled_excludes_by_default(tmp_path, monkeypatch):
    """With no exclude file, generate_index falls back to the bundled list
    (here monkeypatched so a 4-tile tree counts as xBD-shaped)."""
    import xview2_tpu.data.index as index_mod

    root = str(tmp_path / "train")
    _make_train_tree(root, 4, size=64)
    monkeypatch.setattr(index_mod, "default_excluded",
                        lambda n: frozenset({1, 3}) if n == 4 else frozenset())
    df = index_mod.generate_index(root, str(tmp_path / "index.csv"),
                                  exclude_path=None, n_jobs=1, min_size=32)
    assert list(df["idx"]) == [0, 2]
    # an explicit (empty) exclude file overrides the bundled list
    exclude = tmp_path / "exclude.txt"
    exclude.write_text("[]")
    df = index_mod.generate_index(root, str(tmp_path / "index2.csv"),
                                  exclude_path=str(exclude), n_jobs=1, min_size=32)
    assert list(df["idx"]) == [0, 1, 2, 3]


def test_generate_index_atomic_publish(tmp_path):
    """The index appears via atomic rename: no temp leftovers, complete file."""
    root = str(tmp_path / "train")
    _make_train_tree(root, 2, size=64)
    out_csv = tmp_path / "res" / "index.csv"
    generate_index(root, str(out_csv), n_jobs=1, min_size=32)
    assert out_csv.exists()
    leftovers = [p for p in os.listdir(out_csv.parent) if p != "index.csv"]
    assert leftovers == []


def test_ensure_index_explicit_exclude_flag(tmp_path):
    """--exclude overrides both the tree file and the bundled list."""
    from xview2_tpu.config import Config
    from xview2_tpu.data.index import ensure_index
    import pandas as pd

    root = tmp_path / "data"
    _make_train_tree(str(root / "train"), 3, size=64)
    # a tree-level exclude.txt that would drop idx 2 ...
    (root / "train" / "exclude.txt").write_text("[2]")
    # ... overridden by an explicit --exclude dropping idx 0
    explicit = tmp_path / "my_exclude.json"
    explicit.write_text("[0]")
    results = tmp_path / "results"
    cfg = Config(data=str(root), results=str(results), exclude=str(explicit))
    import xview2_tpu.data.index as index_mod
    orig = index_mod.generate_index
    index_mod.generate_index = lambda d, o, exclude_path=None, **kw: orig(
        d, o, exclude_path=exclude_path, min_size=32)
    try:
        path = ensure_index(cfg)
    finally:
        index_mod.generate_index = orig
    assert list(pd.read_csv(path)["idx"]) == [1, 2]

    with pytest.raises(FileNotFoundError, match="--exclude"):
        ensure_index(Config(data=str(root), results=str(tmp_path / "r2"),
                            exclude=str(tmp_path / "missing.json")))
