"""Epoch driver: fit/test orchestration (replaces PL Trainer, reference main.py:96-122).

Semantics map:

* DDP over N GPUs  ->  1-D ``data`` mesh over ``--gpus`` devices; the global
  train batch is ``batch_size * num_devices`` (the reference DataLoader was
  per-rank, ``main.py:35``), and ``steps_per_epoch`` for the Noam schedule is
  ``len(train_ds) // (batch_size * devices)`` (reference ``plt.py:170``).
* AMP fp16 + loss scaling  ->  bf16 compute policy (no scaling needed).
* sync-BN / gradient all-reduce / metric reduction  ->  GSPMD collectives
  derived from shardings; nothing explicit here.
* ModelCheckpoint(best by f1_score, save_last) + EarlyStopping(patience) ->
  Orbax best/last checkpoints + patience counter.  NB the reference sets
  ``min_epochs == max_epochs`` (``main.py:103-104``) which de-facto disables
  early stopping; we honor ``--patience`` as documented/intended.
* dllogger JSON-lines schema preserved (see train/logging.py).

Eval artifacts (``--exec_mode eval``) reproduce ``plt.py:126-144`` bit-for-
class: localization probs = sigmoid of channel 1; damage probs = softmax
(channel-first, as post_process expects), CORAL/MSE label maps; filenames
``test_{localization|damage}_{idx:05d}.npy`` + ``..._target.png``.
"""

from __future__ import annotations

import glob
import math
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from xview2_tpu.config import Config
from xview2_tpu.data.pipeline import Loader, XView2Dataset, make_loaders
from xview2_tpu.models.unet import build_model
from xview2_tpu.ops.metrics import compute_f1, init_f1_state
from xview2_tpu.parallel import checkpoint as ckpt_lib
from xview2_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, sample_sharding
from xview2_tpu.parallel.steps import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
)
from xview2_tpu.parallel.transplant import transplant_encoder
from xview2_tpu.train.logging import MetricsLogger, epoch_metrics, test_metrics
from xview2_tpu.train.optimizers import build_optimizer
from xview2_tpu.train.scheduler import noam_schedule


def _pad_to(batch: int, devices: int) -> int:
    return -(-batch // devices) * devices


def _is_improvement(f1: float, best_f1: float, best_exists: bool) -> bool:
    """Best-checkpoint selection, NaN-safe.

    The post-task harmonic-mean F1 is NaN when a damage class is absent from
    the val split (parity-faithful, ops/metrics.py); ``NaN >= x`` is always
    False, which would mean a best checkpoint is never written.  Under NaN we
    still persist a best checkpoint once so eval always has one, but never
    treat NaN as an improvement afterwards.
    """
    if math.isnan(f1):
        return not best_exists
    return f1 >= best_f1


def _warn_nan_f1(f1: float, per_class, epoch: int, patience_left: int) -> None:
    """Surface WHY val F1 is NaN instead of burning patience silently.

    The NaN itself is parity-faithful (reference ``f1.py:44-49``: the damage
    harmonic mean is 0/0 when a class never occurs in the val split), but the
    reference gave the operator no signal before early stopping fired.
    """
    if not math.isnan(f1) or per_class is None:
        return
    absent = [i + 1 for i, v in enumerate(per_class) if math.isnan(float(v))]
    print(f"WARNING: val F1 is NaN at epoch {epoch}: damage class(es) {absent} "
          f"never occur in the val split (no predictions or targets); "
          f"early-stopping patience is still being consumed "
          f"({patience_left} epoch(s) left)", flush=True)


class Runner:
    """Holds mesh, model, steps and state for one run."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.mesh = make_mesh(cfg.gpus, cfg.spatial_shards)
        self.n_data = cfg.gpus // cfg.spatial_shards
        self.batch_sharding = batch_sharding(self.mesh)
        self.sample_sharding = sample_sharding(self.mesh)
        self.replicated = replicated(self.mesh)
        self.model = build_model(cfg)
        self.global_train_batch = cfg.batch_size * self.n_data
        self.global_eval_batch = _pad_to(cfg.val_batch_size * self.n_data, self.n_data)

    # ---- optimizer / schedule ----
    def build_tx(self, steps_per_epoch: int):
        cfg = self.cfg
        if cfg.use_scheduler:
            lr = noam_schedule(cfg.init_lr, cfg.lr, cfg.final_lr,
                               cfg.warmup, cfg.epochs, max(steps_per_epoch, 1))
        else:
            lr = cfg.lr
        return build_optimizer(cfg, lr)

    # ---- state ----
    def init_state(self, tx) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed)
        sample = (64, 64, self.cfg.in_channels)
        state = init_train_state(self.cfg, self.model, tx, rng, sample)
        return jax.device_put(state, self.replicated)

    def put_batch(self, *arrays):
        return tuple(
            jax.device_put(a, self.batch_sharding if getattr(a, "ndim", 1) > 1
                           else self.sample_sharding)
            for a in arrays)

    def prefetch(self, loader: Loader, fields=("image", "mask")):
        """Iterate device-resident batches one step ahead of consumption.

        ``jax.device_put`` is async; holding the next batch's transfer in
        flight while the current step executes overlaps host->device copies
        with TPU compute (the reference relied on pinned-memory DataLoader
        prefetch for the same effect).
        """
        it = iter(loader)
        prev = None
        for batch in it:
            nxt = self.put_batch(*(getattr(batch, f) for f in fields))
            if prev is not None:
                yield prev
            prev = nxt
        if prev is not None:
            yield prev

    # ---- eval loop ----
    def run_eval(self, eval_step, params, batch_stats, loader: Loader):
        f1_state = jax.device_put(init_f1_state(self.cfg.n_metric_class), self.replicated)
        losses = []
        for imgs, msks, valid in self.prefetch(loader, ("image", "mask", "valid")):
            f1_state, loss, _ = eval_step(params, batch_stats, f1_state, imgs, msks, valid)
            losses.append(loss)
        val_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        f1, per_class = compute_f1(jax.device_get(f1_state), self.cfg.n_metric_class)
        per_class = None if per_class is None else np.asarray(per_class)
        return float(f1), per_class, val_loss


def fit(cfg: Config) -> str:
    """Train with per-epoch validation; returns the best checkpoint path."""
    runner = Runner(cfg)
    train_loader, val_loader, _ = make_loaders_for(runner)
    steps_per_epoch = len(train_loader)
    tx = runner.build_tx(steps_per_epoch)
    state = runner.init_state(tx)

    # Initialization precedence (mirrors the reference): ImageNet-pretrained
    # encoder (baked-in `pretrained=True`, unet.py:45) < localization
    # transplant (--ckpt_pre, main.py:76-94) < checkpoint resume (--ckpt).
    if cfg.pretrained_enc and os.path.exists(cfg.pretrained_enc):
        from xview2_tpu.models.pretrained import load_encoder_npz
        from xview2_tpu.parallel.transplant import transplant_collection

        pre_p, pre_s = load_encoder_npz(cfg.pretrained_enc)
        # "siamese" places the encoder under ["unet"], which matches UNetLoc
        variant = "siamese" if cfg.type == "pre" else cfg.dmg_model
        new_params = transplant_collection(variant, jax.device_get(state.params),
                                           {"unet": pre_p})
        new_stats = transplant_collection(variant, jax.device_get(state.batch_stats),
                                          {"unet": pre_s})
        state = jax.device_put(state.replace(params=new_params, batch_stats=new_stats),
                               runner.replicated)
        print(f"loaded pretrained encoder from {cfg.pretrained_enc}", flush=True)

    if cfg.type == "post" and cfg.ckpt_pre and ckpt_lib.checkpoint_exists(cfg.ckpt_pre):
        loc_payload, _ = ckpt_lib.restore_raw(cfg.ckpt_pre)
        new_params, new_stats = transplant_encoder(
            cfg.dmg_model, jax.device_get(state.params), jax.device_get(state.batch_stats),
            loc_payload["params"], loc_payload.get("batch_stats", {}))
        state = state.replace(params=new_params, batch_stats=new_stats)
        state = jax.device_put(state, runner.replicated)
        print(f"transplanted localization encoder from {cfg.ckpt_pre}", flush=True)

    start_epoch = 0
    best_f1, best_epoch = 0.0, 0
    resume_path = cfg.ckpt if ckpt_lib.checkpoint_exists(cfg.ckpt) else None
    if resume_path:
        payload, meta = ckpt_lib.restore_checkpoint(resume_path, state)
        state = TrainState(step=jnp.asarray(payload["step"]), params=payload["params"],
                           batch_stats=payload["batch_stats"], opt_state=payload["opt_state"])
        state = jax.device_put(state, runner.replicated)
        start_epoch = meta["epoch"] + 1
        best_f1, best_epoch = meta["best_f1"], meta["best_epoch"]
        # Step-accurate input-pipeline resume (SURVEY §5.3): the Loader's
        # shuffle seed is a function of its epoch counter, which starts at 0
        # for every fresh Loader — without this a resumed run replays epoch
        # 0's sample order instead of epoch E's, breaking the bit-
        # reproducibility guarantee (resumed 1+1 epochs == unbroken 2 epochs;
        # the reference's resume_from_checkpoint, main.py:110, has the same
        # hole — SURVEY set step-accurate loader state as the rebuild's bar).
        train_loader.epoch = start_epoch
        print(f"resumed from {resume_path} at epoch {start_epoch}", flush=True)

    train_step = jax.jit(make_train_step(cfg, runner.model, tx, crop=cfg.train_crop,
                                         remat=cfg.remat, mesh=runner.mesh),
                         donate_argnums=0)
    eval_step = jax.jit(make_eval_step(cfg, runner.model, mesh=runner.mesh))
    logger = MetricsLogger(cfg.results, cfg.logname)
    base_rng = jax.random.PRNGKey(cfg.seed ^ 0x5EED)

    best_path = os.path.join(cfg.results, "checkpoints", "best")
    last_path = os.path.join(cfg.results, "checkpoints", "last")
    patience_left = cfg.patience

    global_step = int(jax.device_get(state.step))
    profiling = False
    if cfg.profile:
        jax.profiler.start_trace(os.path.join(cfg.results, "profile"))
        profiling = True
    # stop after 6 steps *from here* (resume-safe), or at loop exit if the
    # run is shorter — a trace must never be left running.
    profile_stop_at = global_step + 6

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        n_imgs = 0
        for imgs, msks in runner.prefetch(train_loader):
            rng = jax.random.fold_in(base_rng, global_step)
            state, loss = train_step(state, imgs, msks, rng)
            global_step += 1
            n_imgs += imgs.shape[0]
            if profiling and global_step >= profile_stop_at:
                jax.profiler.stop_trace()
                profiling = False
        train_time = time.time() - t0

        f1, per_class, val_loss = runner.run_eval(eval_step, state.params,
                                                  state.batch_stats, val_loader)
        _warn_nan_f1(f1, per_class, epoch, patience_left)
        improved = _is_improvement(f1, best_f1, ckpt_lib.checkpoint_exists(best_path))
        if improved:
            if not math.isnan(f1):  # never poison best_f1 with NaN
                best_f1, best_epoch = f1, epoch
                patience_left = cfg.patience
            ckpt_lib.save_checkpoint(best_path, jax.device_get(state), epoch=epoch,
                                     best_f1=best_f1, best_epoch=best_epoch, cfg=cfg)
        else:
            patience_left -= 1
        ckpt_lib.save_checkpoint(last_path, jax.device_get(state), epoch=epoch,
                                 best_f1=best_f1, best_epoch=best_epoch, cfg=cfg)

        data = epoch_metrics(f1, val_loss, best_f1, per_class)
        data["imgs_per_sec"] = round(n_imgs / max(train_time, 1e-9), 2)
        logger.log(epoch, data)

        if patience_left <= 0:
            print(f"early stopping at epoch {epoch} (patience {cfg.patience})", flush=True)
            break

    if profiling:  # run shorter than the 6-step window
        jax.profiler.stop_trace()
    logger.close()
    return best_path


def make_loaders_for(runner: Runner):
    """Loaders with device-count-aware global batch sizes."""
    cfg = runner.cfg
    train_loader, val_loader, test_loader = make_loaders(cfg)
    train_loader.batch_size = runner.global_train_batch
    val_loader.batch_size = runner.global_eval_batch
    test_loader.batch_size = runner.global_eval_batch
    return train_loader, val_loader, test_loader


def _save_predictions(cfg: Config, logits: np.ndarray, targets: np.ndarray,
                      valid: np.ndarray, start_idx: int) -> int:
    """Write per-image prob .npy + target .png (reference plt.py:126-144)."""
    probs_dir = os.path.join(cfg.results, "probs")
    targets_dir = os.path.join(cfg.results, "targets")
    os.makedirs(probs_dir, exist_ok=True)
    os.makedirs(targets_dir, exist_ok=True)
    task = "localization" if cfg.type == "pre" else "damage"
    idx = start_idx
    for logit, target, v in zip(logits, targets, valid):
        if v <= 0:
            continue
        if cfg.type == "pre":
            prob = jax.nn.sigmoid(logit[..., 1])
            prob = np.asarray(prob, np.float32)
        elif cfg.loss_str == "coral":
            prob = np.asarray(np.sum(jax.nn.sigmoid(logit) > 0.5, axis=-1) + 1, np.float32)
        elif cfg.loss_str == "mse":
            prob = np.asarray(np.round(np.maximum(logit[..., 0], 0)) + 1, np.float32)
        else:
            prob = np.asarray(jax.nn.softmax(logit, axis=-1), np.float32)
            prob = np.transpose(prob, (2, 0, 1))  # channel-first, as post_process expects
        fname = os.path.join(probs_dir, f"test_{task}_{idx:05d}")
        np.save(fname, prob)
        Image.fromarray(target.astype(np.uint8)).save(
            os.path.join(targets_dir, f"test_{task}_{idx:05d}_target.png"))
        idx += 1
    return idx


def _clear_task_artifacts(cfg: Config) -> None:
    """Drop stale eval dumps of the current task before re-dumping.

    The reference intends to empty ``probs/`` and ``targets/`` before eval
    (``main.py:15-17, 116-121``) but guards ``make_empty_dir`` with
    ``if not os.path.exists`` — so stale ``.npy``/``.png`` from a previous,
    larger run survive and silently corrupt ``post_process``'s sorted-zip
    pairing.  We clear per *task* (not the whole dir): the standard pipeline
    evals pre then post into the same ``--results``, and a blanket wipe before
    the post eval would delete the localization dumps it is paired with.
    """
    task = "localization" if cfg.type == "pre" else "damage"
    for sub in ("probs", "targets"):
        d = os.path.join(cfg.results, sub)
        os.makedirs(d, exist_ok=True)
        for p in glob.glob(os.path.join(d, f"test_{task}_*")):
            os.unlink(p)


def test(cfg: Config) -> dict:
    """Eval mode: restore checkpoint, run holdout, dump artifacts + metrics
    (reference main.py:113-122 eval branch)."""
    assert cfg.ckpt is not None and ckpt_lib.checkpoint_exists(cfg.ckpt), \
        "No checkpoint found for evaluation"
    # model hyperparameters come from the checkpoint (Model.load_from_checkpoint,
    # main.py:74); infra flags from the current CLI.  TTA is an eval-time
    # behavior, not an architecture knob (the variable tree is identical), so
    # --eval_tta can override the checkpoint's --tta: "auto" keeps the
    # reference-faithful restore, on/off force it (e.g. BASELINE config 5
    # TTA-evals a checkpoint trained without --tta).
    saved = ckpt_lib.load_config(cfg.ckpt)
    tta = {"auto": saved.tta, "on": True, "off": False}[cfg.eval_tta]
    # fused_tail / einsum_1x1 are compute-path knobs with variable trees
    # identical to stock, so like TTA they are eval-time overridable: a stock
    # checkpoint can A/B the fused eval chain, and a checkpoint trained with
    # --fused_tail 1 is not forced through it forever (VERDICT r4 weak #3).
    fused = {"auto": saved.fused_tail, "on": True, "off": False}[cfg.eval_fused_tail]
    einsum = {"auto": saved.einsum_1x1, "on": True, "off": False}[cfg.eval_einsum_1x1]
    cfg = saved.replace(exec_mode="eval", data=cfg.data, results=cfg.results,
                        gpus=cfg.gpus, num_workers=cfg.num_workers,
                        val_batch_size=cfg.val_batch_size, logname=cfg.logname,
                        ckpt=cfg.ckpt, tta=tta, fold_eval_bn=cfg.fold_eval_bn,
                        fused_tail=fused, einsum_1x1=einsum)
    runner = Runner(cfg)
    payload, _ = ckpt_lib.restore_raw(cfg.ckpt)
    params = jax.device_put(payload["params"], runner.replicated)
    batch_stats = jax.device_put(payload["batch_stats"], runner.replicated)

    _clear_task_artifacts(cfg)
    _, _, test_loader = make_loaders_for(runner)
    eval_step = jax.jit(make_eval_step(cfg, runner.model, mesh=runner.mesh))
    f1_state = jax.device_put(init_f1_state(cfg.n_metric_class), runner.replicated)
    idx = 0
    for batch in test_loader:
        imgs, msks, valid = runner.put_batch(batch.image, batch.mask, batch.valid)
        f1_state, _, logits = eval_step(params, batch_stats, f1_state, imgs, msks, valid)
        idx = _save_predictions(cfg, np.asarray(jax.device_get(logits), np.float32),
                                batch.mask, batch.valid, idx)
    f1, per_class = compute_f1(jax.device_get(f1_state), cfg.n_metric_class)
    logger = MetricsLogger(cfg.results, cfg.logname)
    data = test_metrics(float(f1), None if per_class is None else np.asarray(per_class))
    logger.log((), data)
    logger.close()
    return data
