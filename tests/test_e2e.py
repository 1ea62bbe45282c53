"""End-to-end slice: synthetic data -> fit -> checkpoints -> eval artifacts.

This is the SURVEY.md §7.2 "minimum end-to-end slice" exercised in miniature:
small synthetic tiles, ResNet-50 localization U-Net, 2 epochs, then eval-mode
artifact dump and metric logging.  Runs fully on the CPU backend.
"""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xview2_tpu.config import Config
from xview2_tpu.data.synthetic import make_synthetic_dataset
from xview2_tpu.parallel import checkpoint as ckpt_lib
from xview2_tpu.train import trainer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("xbd_e2e")
    make_synthetic_dataset(str(root), n_train=4, n_val=2, n_test=2, size=96)
    return str(root)


@pytest.fixture(scope="module")
def trained(synth_root, tmp_path_factory):
    results = str(tmp_path_factory.mktemp("results"))
    cfg = Config(type="pre", encoder="resnet50", precision=32, loss_str="ce+dice",
                 data=synth_root, results=results, batch_size=2, val_batch_size=2,
                 epochs=2, num_workers=2, train_crop=64, gpus=1)
    best = trainer.fit(cfg)
    return cfg, best


def test_fit_writes_checkpoints_and_logs(trained):
    cfg, best = trained
    assert ckpt_lib.checkpoint_exists(best)
    assert ckpt_lib.checkpoint_exists(os.path.join(cfg.results, "checkpoints", "last"))
    log_path = os.path.join(cfg.results, "logs.json")
    lines = [json.loads(l) for l in open(log_path)]
    assert len(lines) == 2  # one line per epoch
    for line in lines:
        assert {"f1", "val_loss", "top_f1"} <= set(line["data"].keys())
    meta = ckpt_lib.load_metadata(best)
    assert meta["config"]["encoder"] == "resnet50"


def test_resume_continues_epochs(trained):
    cfg, _ = trained
    last = os.path.join(cfg.results, "checkpoints", "last")
    cfg2 = cfg.replace(epochs=3, ckpt=last)
    trainer.fit(cfg2)
    lines = [json.loads(l) for l in open(os.path.join(cfg.results, "logs.json"))]
    # 2 original + 1 resumed epoch
    assert [l["step"] for l in lines] == [0, 1, 2]


def test_eval_dumps_artifacts(trained, synth_root):
    cfg, best = trained
    eval_cfg = Config(type="pre", exec_mode="eval", data=synth_root,
                      results=cfg.results, ckpt=best, val_batch_size=2,
                      num_workers=2, gpus=1)
    metrics = trainer.test(eval_cfg)
    assert "f1" in metrics
    probs = sorted(glob.glob(os.path.join(cfg.results, "probs", "*.npy")))
    targets = sorted(glob.glob(os.path.join(cfg.results, "targets", "*.png")))
    assert len(probs) == 2 and len(targets) == 2  # holdout has 2 tiles
    prob = np.load(probs[0])
    assert prob.shape == (96, 96)  # sigmoid of channel 1 (reference plt.py:128)
    assert prob.min() >= 0.0 and prob.max() <= 1.0
    assert os.path.basename(probs[0]) == "test_localization_00000.npy"
    assert os.path.basename(targets[0]) == "test_localization_00000_target.png"


def test_checkpoint_roundtrip(tmp_path):
    from xview2_tpu.parallel.steps import TrainState

    state = TrainState(step=jnp.asarray(7), params={"w": jnp.ones((2, 2))},
                       batch_stats={"bn": {"mean": jnp.zeros((3,))}},
                       opt_state={"mu": jnp.full((2, 2), 0.5)})
    cfg = Config(type="pre")
    path = str(tmp_path / "ckpt")
    ckpt_lib.save_checkpoint(path, state, epoch=3, best_f1=55.5, best_epoch=2, cfg=cfg)
    restored, meta = ckpt_lib.restore_checkpoint(path, state)
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(restored["opt_state"]["mu"]),
                                  np.full((2, 2), 0.5))
    assert meta["epoch"] == 3 and meta["best_f1"] == 55.5
    assert ckpt_lib.load_config(path) == cfg


def test_bit_reproducibility(synth_root, tmp_path):
    """Same seed -> bit-identical first-step loss (SURVEY.md §5.2: the
    reference traded determinism away; JAX threaded PRNG gives it for free)."""
    import optax
    from xview2_tpu.models.unet import build_model
    from xview2_tpu.parallel.steps import init_train_state, make_train_step
    from xview2_tpu.train.optimizers import build_optimizer

    cfg = Config(type="pre", encoder="resnet50", precision=32, loss_str="ce",
                 data=synth_root, batch_size=2, train_crop=64)
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    rng = jax.random.PRNGKey(cfg.seed)
    imgs = jnp.zeros((2, 96, 96, 3), jnp.uint8)
    msks = jnp.zeros((2, 96, 96), jnp.uint8)
    step = jax.jit(make_train_step(cfg, model, tx, crop=64))
    losses = []
    for _ in range(2):
        state = init_train_state(cfg, model, tx, rng, (64, 64, 3))
        _, loss = step(state, imgs, msks, jax.random.PRNGKey(42))
        losses.append(float(loss))
    assert losses[0] == losses[1]


def test_best_ckpt_selection_nan_guard():
    """NaN F1 (damage class absent from val split) must still produce exactly
    one best checkpoint, and must never poison best_f1 (VERDICT weak #5)."""
    from xview2_tpu.train.trainer import _is_improvement

    nan = float("nan")
    assert _is_improvement(nan, 0.0, best_exists=False)       # write best once
    assert not _is_improvement(nan, 0.0, best_exists=True)    # never again on NaN
    assert not _is_improvement(nan, 50.0, best_exists=True)
    assert _is_improvement(50.0, 50.0, best_exists=True)      # ties improve (>=)
    assert not _is_improvement(49.0, 50.0, best_exists=True)


@pytest.mark.slow  # cross-impl/behavioral heavyweight; quick gate = -m 'not slow'
def test_profile_trace_stops_on_short_run(synth_root, tmp_path):
    """--profile on a run shorter than the 6-step stop window must still close
    the trace (VERDICT weak #4) and write an xplane artifact."""
    results = str(tmp_path / "res_profile")
    cfg = Config(type="pre", encoder="resnet50", precision=32, loss_str="ce",
                 data=synth_root, results=results, batch_size=2, val_batch_size=2,
                 epochs=1, num_workers=2, train_crop=64, gpus=1, profile=True)
    trainer.fit(cfg)  # 4 tiles / batch 2 = 2 steps < 6
    traces = glob.glob(os.path.join(results, "profile", "**", "*.xplane.pb"),
                       recursive=True)
    assert traces, "profiler trace was not stopped/written"
    # and a second profiled run must not die with "trace already running"
    trainer.fit(cfg.replace(results=str(tmp_path / "res_profile2")))


def test_eval_clears_stale_task_artifacts(trained, synth_root):
    """Stale dumps from a previous, larger eval must not survive into the
    sorted-zip pairing of post_process (reference intent, main.py:15-17);
    dumps of the *other* task must survive (pre+post share --results)."""
    cfg, best = trained
    probs_dir = os.path.join(cfg.results, "probs")
    targets_dir = os.path.join(cfg.results, "targets")
    # stale current-task file beyond this holdout's 2 tiles + other-task file
    stale = os.path.join(probs_dir, "test_localization_00009.npy")
    np.save(stale, np.zeros((4, 4), np.float32))
    stale_t = os.path.join(targets_dir, "test_localization_00009_target.png")
    open(stale_t, "wb").write(open(os.path.join(
        targets_dir, "test_localization_00000_target.png"), "rb").read())
    other = os.path.join(probs_dir, "test_damage_00000.npy")
    np.save(other, np.zeros((4, 4), np.float32))

    eval_cfg = Config(type="pre", exec_mode="eval", data=synth_root,
                      results=cfg.results, ckpt=best, val_batch_size=2,
                      num_workers=2, gpus=1)
    trainer.test(eval_cfg)
    loc_probs = sorted(glob.glob(os.path.join(probs_dir, "*localization*")))
    assert [os.path.basename(p) for p in loc_probs] == [
        "test_localization_00000.npy", "test_localization_00001.npy"]
    assert not os.path.exists(stale_t)
    assert os.path.exists(other)  # other task untouched
    os.unlink(other)


def test_fit_with_remat_tail(synth_root, tmp_path):
    """--remat plumbs through fit (numerics-identical recompute knob for
    geometries that exceed HBM, e.g. cfg4 b4/b16 on the 2026-08-19 re-imaged
    relay stack — BASELINE.md round-5 rows).  The remat-vs-stock numeric
    equivalence itself is pinned in test_remat_tail.py; this covers the CLI
    surface."""
    results = str(tmp_path / "res_remat")
    cfg = Config(type="pre", encoder="resnet50", precision=32, loss_str="ce",
                 data=synth_root, results=results, batch_size=2, val_batch_size=2,
                 epochs=1, num_workers=2, train_crop=64, gpus=1, remat="tail")
    best = trainer.fit(cfg)
    assert ckpt_lib.checkpoint_exists(best)
    lines = [json.loads(l) for l in open(os.path.join(results, "logs.json"))]
    assert np.isfinite(lines[-1]["data"]["val_loss"])


def test_nan_f1_warning_names_absent_classes(capsys):
    """When the damage harmonic-mean F1 is NaN (class absent from val,
    reference f1.py:44-49) the trainer names the absent classes instead of
    burning patience silently."""
    from xview2_tpu.train.trainer import _warn_nan_f1

    per_class = np.array([80.0, float("nan"), 75.0, float("nan")])
    _warn_nan_f1(float("nan"), per_class, epoch=3, patience_left=7)
    out = capsys.readouterr().out
    assert "val F1 is NaN at epoch 3" in out
    assert "[2, 4]" in out and "patience" in out
    # no warning when F1 is finite or per_class is absent (pre task)
    _warn_nan_f1(55.0, per_class, epoch=4, patience_left=7)
    _warn_nan_f1(float("nan"), None, epoch=4, patience_left=7)
    assert capsys.readouterr().out == ""


@pytest.mark.slow  # cross-impl/behavioral heavyweight; quick gate = -m 'not slow'
def test_resume_is_bit_faithful(synth_root, tmp_path):
    """A resumed 1+1-epoch run must equal an unbroken 2-epoch run bit-for-bit
    (VERDICT r4 item 5 / SURVEY §5.3 step-accurate pipeline resume).

    The load-bearing piece is the train Loader's shuffle epoch: its per-epoch
    shuffle seed is ``seed*100003 + epoch`` and a fresh Loader restarts at
    epoch 0, so without ``trainer.fit``'s restore of ``train_loader.epoch``
    the resumed run replays epoch 0's sample order and diverges (the
    reference's resume, ``/root/reference/main.py:110``, has the same hole).
    """
    common = dict(type="pre", encoder="resnet50", precision=32, loss_str="ce",
                  data=synth_root, batch_size=2, val_batch_size=2,
                  num_workers=2, train_crop=64, gpus=1)
    res_a = str(tmp_path / "unbroken")
    trainer.fit(Config(results=res_a, epochs=2, **common))

    res_b = str(tmp_path / "resumed")
    trainer.fit(Config(results=res_b, epochs=1, **common))
    last_b = os.path.join(res_b, "checkpoints", "last")
    trainer.fit(Config(results=res_b, epochs=2, ckpt=last_b, **common))

    pa, _ = ckpt_lib.restore_raw(os.path.join(res_a, "checkpoints", "last"))
    pb, _ = ckpt_lib.restore_raw(last_b)
    for coll in ("params", "batch_stats", "opt_state"):
        la = jax.tree_util.tree_leaves_with_path(pa[coll])
        lb = {jax.tree_util.keystr(p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(pb[coll])}
        assert {jax.tree_util.keystr(p) for p, _ in la} == set(lb)
        for p, va in la:
            np.testing.assert_array_equal(
                np.asarray(va), lb[jax.tree_util.keystr(p)],
                err_msg=f"resume diverged at {coll}{jax.tree_util.keystr(p)}")
    # per-epoch metrics also line up (epoch 1's row in both logs)
    row_a = [json.loads(l) for l in open(os.path.join(res_a, "logs.json"))][-1]
    row_b = [json.loads(l) for l in open(os.path.join(res_b, "logs.json"))][-1]
    assert row_a["step"] == row_b["step"] == 1
    assert row_a["data"]["val_loss"] == row_b["data"]["val_loss"]
    assert row_a["data"]["f1"] == row_b["data"]["f1"]


def test_eval_overrides_fused_tail_and_einsum(trained):
    """--eval_fused_tail / --eval_einsum_1x1 override the checkpoint's
    compute-path knobs at eval exactly like --eval_tta (VERDICT r4 weak #3):
    a STOCK checkpoint can A/B the fused eval chain (identical variable
    trees), and the forced-on path must reproduce the stock metrics (the
    fused chain is parity-exact)."""
    cfg, best = trained
    base = cfg.replace(exec_mode="eval", ckpt=best)
    stock = trainer.test(base)
    forced = trainer.test(base.replace(eval_fused_tail="on",
                                       eval_einsum_1x1="on"))
    assert np.isfinite(forced["f1"])
    assert forced["f1"] == pytest.approx(stock["f1"], abs=1e-3)


def test_fit_and_eval_with_round4_levers(synth_root, tmp_path):
    """The user surface of the round-4 levers: --fused_tail, --einsum_1x1,
    --fold_eval_bn and --eval_tta plumb through main-level fit/eval (Pallas
    kernels auto-interpret on the CPU backend)."""
    results = str(tmp_path / "results")
    cfg = Config(type="pre", encoder="resnet50", precision=32,
                 loss_str="focal+dice", data=synth_root, results=results,
                 batch_size=2, val_batch_size=2, epochs=1, num_workers=0,
                 train_crop=64, gpus=1, fused_tail=True, einsum_1x1=True)
    best = trainer.fit(cfg)
    assert ckpt_lib.checkpoint_exists(best)
    lines = [json.loads(l) for l in open(os.path.join(results, "logs.json"))]
    assert np.isfinite(lines[-1]["data"]["val_loss"])

    eval_cfg = cfg.replace(exec_mode="eval", ckpt=best, eval_tta="on")
    data = trainer.test(eval_cfg)
    assert np.isfinite(data["f1"])
    assert glob.glob(os.path.join(results, "probs", "test_localization_*"))
    # the converse override: a checkpoint TRAINED with the fused chain can be
    # forced through the stock eval path (it is not frozen in, VERDICT r4
    # weak #3) and must reproduce the fused metrics (parity-exact chain)
    stock = trainer.test(eval_cfg.replace(eval_fused_tail="off",
                                          eval_einsum_1x1="off"))
    assert stock["f1"] == pytest.approx(data["f1"], abs=1e-3)
