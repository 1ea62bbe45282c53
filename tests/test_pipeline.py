"""Data-pipeline tests: discovery, index selection, batching, padding."""

import os

import numpy as np
import pandas as pd
import pytest

from xview2_tpu.data.pipeline import Loader, XView2Dataset, read_index_csv
from xview2_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("xbd")
    make_synthetic_dataset(str(root), n_train=5, n_val=3, n_test=2, size=96)
    return str(root)


def test_discovery_and_pairing(synth_root):
    ds = XView2Dataset(os.path.join(synth_root, "train"), "pre", True)
    assert len(ds) == 5
    img, mask = ds.load_item(0)
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    assert mask.shape == (96, 96)


def test_post_task_concatenates_pair(synth_root):
    ds = XView2Dataset(os.path.join(synth_root, "train"), "post", True)
    img, mask = ds.load_item(0)
    assert img.shape == (96, 96, 6)
    # label is the post-disaster one: values span 0..4
    assert mask.max() >= 1


def test_index_csv_selection(tmp_path):
    csv = tmp_path / "index.csv"
    pd.DataFrame([
        {"idx": 0, "1": 1, "2": 0, "3": 0, "4": 0},
        {"idx": 1, "1": 0, "2": 0, "3": 0, "4": 0},
        {"idx": 2, "1": 0, "2": 1, "3": 1, "4": 0},
        {"idx": 3, "1": 0, "2": 0, "3": 0, "4": 1},
    ]).to_csv(csv, index=False)
    # pre: all rows (reference pytorch_loader.py:64-65)
    assert read_index_csv(str(csv), "pre") == [0, 1, 2, 3]
    # post: union of rows with any damage flag (pytorch_loader.py:101-107)
    assert read_index_csv(str(csv), "post") == [0, 2, 3]


def test_train_loader_shuffles_and_drops_last(synth_root):
    ds = XView2Dataset(os.path.join(synth_root, "train"), "pre", True)
    loader = Loader(ds, batch_size=2, shuffle=True, drop_last=True, num_workers=2, seed=7)
    batches = list(loader)
    assert len(batches) == 2  # 5 // 2
    assert all(b.image.shape == (2, 96, 96, 3) for b in batches)
    # different epochs see different orders (statistically certain for seed 7)
    order1 = [b.image.sum() for b in batches]
    order2 = [b.image.sum() for b in loader]
    assert order1 != order2


def test_eval_loader_pads_with_valid_mask(synth_root):
    ds = XView2Dataset(os.path.join(synth_root, "test"), "pre", False)
    loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # ceil(3/2)
    assert batches[0].valid.tolist() == [1.0, 1.0]
    assert batches[1].valid.tolist() == [1.0, 0.0]
    assert batches[1].image.shape == (2, 96, 96, 3)


def test_native_decoder_matches_pil(synth_root):
    from xview2_tpu.data import native
    if not native.is_available():
        pytest.skip("native decoder not built")
    ds = XView2Dataset(os.path.join(synth_root, "train"), "post", True)
    loader = Loader(ds, batch_size=2, shuffle=False, drop_last=True, num_workers=2)
    batch_native = next(iter(loader))
    # force PIL path
    loader2 = Loader(ds, batch_size=2, shuffle=False, drop_last=True, num_workers=2)
    loader2._hw = None
    batch_pil = next(iter(loader2))
    np.testing.assert_array_equal(batch_native.image, batch_pil.image)
    np.testing.assert_array_equal(batch_native.mask, batch_pil.mask)


def test_raw_cache_roundtrip_and_speed(synth_root, tmp_path):
    ds1 = XView2Dataset(os.path.join(synth_root, "train"), "post", True,
                        cache_dir=str(tmp_path / "cache"))
    img1, msk1 = ds1.load_item(0)   # decode + write cache
    img2, msk2 = ds1.load_item(0)   # served from cache
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(msk1, msk2)
    # cache matches the uncached decode exactly
    ds2 = XView2Dataset(os.path.join(synth_root, "train"), "post", True)
    img3, msk3 = ds2.load_item(0)
    np.testing.assert_array_equal(img1, img3)
    np.testing.assert_array_equal(msk1, msk3)
    files = os.listdir(str(tmp_path / "cache" / "train_post"))
    assert files == ["00000000.npy"]


def test_decode_is_rgb(tmp_path):
    """Pin the channel-order policy: decode delivers RGB (BASELINE.md
    deviations; the reference's cv2.imread delivers BGR)."""
    from PIL import Image

    from xview2_tpu.data.pipeline import _decode_image

    arr = np.zeros((8, 8, 3), np.uint8)
    arr[..., 0] = 200  # red
    p = tmp_path / "x_pre_disaster.png"
    Image.fromarray(arr).save(p)
    out = _decode_image(str(p))
    assert out[0, 0, 0] == 200 and out[0, 0, 2] == 0


def test_abandoned_iterator_shuts_down_producer(synth_root):
    """An abandoned epoch (early stop / exception) must not leak the producer
    thread blocked on q.put with a decoded batch."""
    import threading
    import time

    ds = XView2Dataset(os.path.join(synth_root, "train"), "pre", True)
    loader = Loader(ds, batch_size=1, shuffle=False, drop_last=False,
                    num_workers=2, prefetch=1)
    base = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # GeneratorExit -> finally must unblock + join the producer
    deadline = time.time() + 10.0
    while threading.active_count() > base and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= base


def test_default_train_restricts_post_samples(tmp_path):
    """Default-flag train runs must restrict the post task exactly per
    reference pytorch_loader.py:101-107: union of rows with any damage flag,
    after exclusions — via the auto-generated index (data/index.ensure_index)."""
    import json
    from glob import glob as _glob

    from PIL import Image

    from xview2_tpu.config import Config
    from xview2_tpu.data.pipeline import make_loaders

    root = tmp_path / "data"
    make_synthetic_dataset(str(root), n_train=4, n_val=2, n_test=2, size=96)
    # tile 1: no damage anywhere -> no class flags -> dropped from post union
    tgt = sorted(_glob(os.path.join(str(root), "train", "targets", "*post*")))[1]
    Image.fromarray(np.zeros((96, 96), np.uint8)).save(tgt)
    # tile 0: excluded via the exclude list (reference generate_idx.py:15)
    with open(os.path.join(str(root), "train", "exclude.txt"), "w") as f:
        json.dump([0], f)

    cfg = Config(type="post", data=str(root), results=str(tmp_path / "res"),
                 num_workers=1)
    train, _, _ = make_loaders(cfg)
    assert sorted(train.ds.indices) == [2, 3]
    assert os.path.exists(os.path.join(cfg.results, "index.csv"))

    # pre task reuses the same generated index: all non-excluded rows
    cfg_pre = cfg.replace(type="pre")
    train_pre, _, _ = make_loaders(cfg_pre)
    assert sorted(train_pre.ds.indices) == [1, 2, 3]


def test_explicit_index_csv_must_exist(tmp_path):
    from xview2_tpu.config import Config
    from xview2_tpu.data.index import ensure_index

    cfg = Config(index_csv=str(tmp_path / "missing.csv"))
    with pytest.raises(FileNotFoundError):
        ensure_index(cfg)


def test_empty_index_not_written(tmp_path, synth_root):
    """A failed index generation must NOT leave an empty index.csv behind —
    a later run would silently reuse it (0 train samples)."""
    from xview2_tpu.data.index import generate_index

    train_dir = os.path.join(synth_root, "train")
    exclude = tmp_path / "exclude.txt"
    import glob as _glob
    n = len(_glob.glob(os.path.join(train_dir, "images", "*pre*")))
    exclude.write_text(str(list(range(n))))  # exclude everything
    out = tmp_path / "index.csv"
    with pytest.raises(RuntimeError, match="train index is empty"):
        generate_index(train_dir, str(out), exclude_path=str(exclude))
    assert not out.exists()
