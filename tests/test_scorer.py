"""Golden tests for post-processing and the xView2 scorer on synthetic PNGs."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from xview2_tpu.utils.post_process import post_process_dir, process_pair
from xview2_tpu.utils.xview2_metrics import compute_score, f1_from_counts, harmonic_mean


def _save_png(arr, path):
    Image.fromarray(arr.astype(np.uint8)).save(path)


@pytest.fixture()
def artifact_dirs(tmp_path):
    probs = tmp_path / "probs"
    targets = tmp_path / "targets"
    probs.mkdir()
    targets.mkdir()
    return tmp_path


def test_post_process_thresholds(artifact_dirs):
    root = artifact_dirs
    loc = np.zeros((1024, 1024), np.float32)
    loc[0:100, 0:100] = 0.5    # strong loc -> building
    loc[200:300, 0:100] = 0.2  # weak loc, damaged -> building
    loc[400:500, 0:100] = 0.2  # weak loc, undamaged -> background
    dmg = np.zeros((4, 1024, 1024), np.float32)
    dmg[0] += 1.0              # default argmax -> class 1 (no damage)
    dmg[2, 200:300, 0:100] = 9.0  # class 3 where weak loc
    np.save(root / "probs" / "test_localization_00000.npy", loc)
    np.save(root / "probs" / "test_damage_00000.npy", dmg)

    post_process_dir(str(root))
    pre = np.array(Image.open(root / "predictions" / "test_localization_00000_prediction.png"))
    post = np.array(Image.open(root / "predictions" / "test_damage_00000_prediction.png"))
    assert pre[50, 50] == 1 and post[50, 50] == 1
    assert pre[250, 50] == 1 and post[250, 50] == 3
    assert pre[450, 50] == 0 and post[450, 50] == 0


def test_post_process_component_vote(tmp_path):
    (tmp_path / "out").mkdir()
    loc = np.zeros((1024, 1024), np.float32)
    loc[0:10, 0:10] = 0.9
    dmg = np.zeros((4, 1024, 1024), np.float32)
    dmg[0] += 1.0
    # one building, mixed damage: 60 pixels class 2, 40 pixels class 4
    dmg[:, 0:10, 0:10] = 0.0
    dmg[1, 0:6, 0:10] = 9.0
    dmg[3, 6:10, 0:10] = 9.0
    np.save(tmp_path / "loc_localization.npy", loc)
    np.save(tmp_path / "dmg_damage.npy", dmg)
    process_pair(str(tmp_path / "loc_localization.npy"), str(tmp_path / "dmg_damage.npy"),
                 str(tmp_path / "out"), components=True)
    post = np.array(Image.open(tmp_path / "out" / "dmg_damage_prediction.png"))
    assert (post[0:10, 0:10] == 2).all()  # majority vote -> class 2 everywhere


def test_scorer_perfect_prediction(tmp_path):
    preds = tmp_path / "predictions"
    targs = tmp_path / "targets"
    preds.mkdir()
    targs.mkdir()
    loc = np.zeros((1024, 1024), np.uint8)
    loc[10:200, 10:200] = 1
    dmg = np.zeros((1024, 1024), np.uint8)
    dmg[10:200, 10:100] = 2
    dmg[10:200, 100:200] = 4
    for d in (preds, targs):
        suffix = "prediction" if d == preds else "target"
        _save_png(loc, d / f"test_localization_00000_{suffix}.png")
        _save_png(dmg, d / f"test_damage_00000_{suffix}.png")
    out = compute_score(str(preds), str(targs), str(tmp_path / "score.json"), processes=1)
    assert out["localization_f1"] == pytest.approx(1.0)
    # classes 1 and 3 never occur -> F1 0 -> harmonic mean ~ 0 (1e-6 guard)
    want_dmg = harmonic_mean([0.0, 1.0, 0.0, 1.0])
    assert out["damage_f1"] == pytest.approx(want_dmg)
    assert out["score"] == pytest.approx(0.3 * 1.0 + 0.7 * want_dmg)
    assert json.load(open(tmp_path / "score.json"))["score"] == pytest.approx(out["score"])


def test_scorer_gates_damage_by_predicted_loc(tmp_path):
    preds = tmp_path / "predictions"
    targs = tmp_path / "targets"
    preds.mkdir()
    targs.mkdir()
    # target: one building with damage 1
    lt = np.zeros((1024, 1024), np.uint8)
    lt[0:10, 0:10] = 1
    dt = np.zeros((1024, 1024), np.uint8)
    dt[0:10, 0:10] = 1
    # prediction: damage correct, but localization missed -> dp*lp_b = 0 -> FN
    lp = np.zeros((1024, 1024), np.uint8)
    dp = dt.copy()
    _save_png(lp, preds / "test_localization_00000_prediction.png")
    _save_png(dp, preds / "test_damage_00000_prediction.png")
    _save_png(lt, targs / "test_localization_00000_target.png")
    _save_png(dt, targs / "test_damage_00000_target.png")
    out = compute_score(str(preds), str(targs), str(tmp_path / "s.json"), processes=1)
    assert out["damage_f1_no_damage"] == 0.0


def test_scorer_validates_inputs(tmp_path):
    preds = tmp_path / "predictions"
    targs = tmp_path / "targets"
    preds.mkdir()
    targs.mkdir()
    bad = np.full((512, 512), 1, np.uint8)  # wrong size
    _save_png(bad, preds / "test_localization_00000_prediction.png")
    _save_png(bad, preds / "test_damage_00000_prediction.png")
    _save_png(bad, targs / "test_localization_00000_target.png")
    _save_png(bad, targs / "test_damage_00000_target.png")
    with pytest.raises(AssertionError):
        compute_score(str(preds), str(targs), str(tmp_path / "s.json"), processes=1)


def test_f1_counts_edge_cases():
    assert f1_from_counts(0, 0, 0) == 0.0
    assert f1_from_counts(10, 0, 0) == 1.0
    assert f1_from_counts(5, 5, 5) == pytest.approx(0.5)


def test_full_artifact_chain(tmp_path):
    """probs dump -> post_process -> scorer, end to end on synthetic arrays
    (the L0 offline pipeline of SURVEY.md §3.3 without a model)."""
    probs = tmp_path / "probs"
    targets = tmp_path / "targets"
    probs.mkdir()
    targets.mkdir()
    # ground truth: one building block with damage class 2
    lt = np.zeros((1024, 1024), np.uint8)
    lt[100:300, 100:300] = 1
    dt = np.zeros((1024, 1024), np.uint8)
    dt[100:300, 100:300] = 2
    _save_png(lt, targets / "test_localization_00000_target.png")
    _save_png(dt, targets / "test_damage_00000_target.png")
    # model outputs: confident sigmoid probs + softmax damage probs
    loc = np.where(lt > 0, 0.95, 0.02).astype(np.float32)
    dmg = np.full((4, 1024, 1024), 0.1, np.float32)
    dmg[1][dt == 2] = 0.9  # class 2 = channel 1 (argmax+1)
    np.save(probs / "test_localization_00000.npy", loc)
    np.save(probs / "test_damage_00000.npy", dmg)

    post_process_dir(str(tmp_path))
    out = compute_score(str(tmp_path / "predictions"), str(targets),
                        str(tmp_path / "score.json"), processes=1)
    assert out["localization_f1"] == pytest.approx(1.0)
    assert out["damage_f1_minor_damage"] == pytest.approx(1.0)
    assert out["score"] == pytest.approx(
        0.3 + 0.7 * harmonic_mean([0.0, 1.0, 0.0, 0.0]), abs=1e-6)


def test_post_process_clears_stale_predictions(tmp_path):
    """predictions/ is recreated empty: stale files from a previous, larger
    run must not reach the scorer's sorted-glob pairing."""
    import glob as _glob

    probs = tmp_path / "probs"
    probs.mkdir()
    np.save(probs / "test_localization_00000.npy", np.full((8, 8), 0.9, np.float32))
    np.save(probs / "test_damage_00000.npy", np.ones((8, 8), np.float32))
    pred_dir = tmp_path / "predictions"
    pred_dir.mkdir()
    (pred_dir / "test_localization_00007_prediction.png").write_bytes(b"stale")
    post_process_dir(str(tmp_path), n_jobs=1)
    names = sorted(os.path.basename(p) for p in _glob.glob(str(pred_dir / "*")))
    assert names == ["test_damage_00000_prediction.png",
                     "test_localization_00000_prediction.png"]
