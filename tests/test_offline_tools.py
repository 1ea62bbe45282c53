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
