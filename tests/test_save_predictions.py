"""Prediction artifact format tests (reference plt.py:126-144 semantics)."""

import os

import numpy as np
import pytest
from PIL import Image

from xview2_tpu.config import Config
from xview2_tpu.train.trainer import _save_predictions

RNG = np.random.default_rng(0)


def run(cfg, logits, targets, tmp_path, start_idx=0):
    valid = np.ones((logits.shape[0],), np.float32)
    cfg = cfg.replace(results=str(tmp_path))
    return _save_predictions(cfg, logits, targets, valid, start_idx), cfg


def test_pre_saves_sigmoid_channel1(tmp_path):
    logits = RNG.normal(size=(2, 8, 8, 2)).astype(np.float32)
    targets = RNG.integers(0, 2, (2, 8, 8)).astype(np.uint8)
    nxt, cfg = run(Config(type="pre"), logits, targets, tmp_path)
    assert nxt == 2
    prob = np.load(os.path.join(cfg.results, "probs", "test_localization_00000.npy"))
    want = 1 / (1 + np.exp(-logits[0, ..., 1]))
    np.testing.assert_allclose(prob, want, rtol=1e-5)
    tgt = np.array(Image.open(os.path.join(cfg.results, "targets",
                                           "test_localization_00000_target.png")))
    np.testing.assert_array_equal(tgt, targets[0])


def test_post_softmax_saved_channel_first(tmp_path):
    logits = RNG.normal(size=(1, 8, 8, 4)).astype(np.float32)
    targets = RNG.integers(0, 5, (1, 8, 8)).astype(np.uint8)
    _, cfg = run(Config(type="post", loss_str="focal+dice"), logits, targets, tmp_path)
    prob = np.load(os.path.join(cfg.results, "probs", "test_damage_00000.npy"))
    assert prob.shape == (4, 8, 8)  # channel-first, as post_process expects
    e = np.exp(logits[0] - logits[0].max(-1, keepdims=True))
    want = np.transpose(e / e.sum(-1, keepdims=True), (2, 0, 1))
    np.testing.assert_allclose(prob, want, rtol=1e-4)


def test_post_coral_labels(tmp_path):
    logits = np.array([[[[2.0, 1.0, -3.0]]]], np.float32)  # 2 sigmoids > .5 -> 3
    targets = np.ones((1, 1, 1), np.uint8)
    _, cfg = run(Config(type="post", loss_str="coral"), logits, targets, tmp_path)
    prob = np.load(os.path.join(cfg.results, "probs", "test_damage_00000.npy"))
    assert prob.reshape(-1).tolist() == [3.0]


def test_post_mse_labels(tmp_path):
    logits = np.array([[[[1.6], [-2.0]]]], np.float32)
    targets = np.ones((1, 1, 2), np.uint8)
    _, cfg = run(Config(type="post", loss_str="mse"), logits, targets, tmp_path)
    prob = np.load(os.path.join(cfg.results, "probs", "test_damage_00000.npy"))
    assert prob.reshape(-1).tolist() == [3.0, 1.0]  # round(relu)+1


def test_padded_samples_skipped(tmp_path):
    logits = RNG.normal(size=(3, 4, 4, 2)).astype(np.float32)
    targets = RNG.integers(0, 2, (3, 4, 4)).astype(np.uint8)
    valid = np.array([1.0, 0.0, 1.0], np.float32)
    cfg = Config(type="pre").replace(results=str(tmp_path))
    nxt = _save_predictions(cfg, logits, targets, valid, 0)
    assert nxt == 2  # padding slot skipped, indices stay dense
    files = sorted(os.listdir(os.path.join(cfg.results, "probs")))
    assert files == ["test_localization_00000.npy", "test_localization_00001.npy"]
