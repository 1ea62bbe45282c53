"""Per-config TPU measurement: wall + trace device time + roofline position.

The round-3/4 measurement harness, promoted from ``.scratch`` (which a VM
re-image wiped) into the repo.  For one named BASELINE config it builds the
full fused step, runs a wall-timed loop, captures a profiler trace, and
prints a summary row with the HBM/MXU roofline position computed from the
compiled executable's own cost analysis.

Usage (ONE of these per process — jit caches don't respect contextvar-scope
A/Bs, CLAUDE.md):

    PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline_configs.py \
        headline --fused_tail 1 --einsum_1x1 0 [--batch N] [--steps N]

Configs (BASELINE.json parity set; measured rows in BASELINE.md):
    headline  train: resnet50 UNetLoc, focal+dice, batch 16
    cfg2      train: resnest50 + attention + DS + AutoAugment, batch 16
    cfg3      train: siamese resnest50 damage, ohem+dice, batch 8
    cfg4      train: fused dual-branch damage + CORAL + PPM, batch 8
    cfg5      eval:  resnest269 siamese, 4-flip TTA, 1024^2, batch 4

Lever flags map 1:1 onto the CLI extensions (``--fused_tail``,
``--einsum_1x1``, ``--fold_eval_bn``); ``--im2col 0`` / ``--bwd xla`` select
the fused kernel's alternate GEMM/backward forms (module knobs in
``ops/packed_fused_conv.py``).

Wall numbers through the tunneled relay carry ~5 ms/step of streaming
overhead no program change removes (BASELINE.md round-3 ladder); device-op
time from the trace is the scheduling-facing number.  Reference counterpart
being measured: the cuDNN train loop of ``/root/reference/model/plt.py:50-54``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))  # parse_trace sibling import

import jax
import jax.numpy as jnp
import numpy as np

from xview2_tpu.config import Config
from xview2_tpu.models.unet import build_model
from xview2_tpu.ops.metrics import init_f1_state
from xview2_tpu.parallel.steps import (init_train_state, make_eval_step,
                                       make_train_step)
from xview2_tpu.train.optimizers import build_optimizer
from xview2_tpu.utils.cache import enable_compilation_cache

import parse_trace

HBM_RATE = 746e9       # measured v5e stream rate (BASELINE.md round-1 probe)
MXU_RATE = 197e12      # v5e bf16 peak
TRACE_DIR = ".scratch/trace_{name}"

CONFIGS = {
    # name -> (config kwargs, batch, eval_mode, tile size)
    "headline": (dict(type="pre", encoder="resnet50", loss_str="focal+dice"),
                 16, False),
    "cfg2": (dict(type="pre", encoder="resnest50", attention=True,
                  deep_supervision=True, loss_str="focal+dice",
                  autoaugment=True), 16, False),
    "cfg3": (dict(type="post", dmg_model="siamese", encoder="resnest50",
                  loss_str="ohem+dice"), 8, False),
    "cfg4": (dict(type="post", dmg_model="fused", encoder="resnest200",
                  loss_str="coral", ppm=True), 8, False),
    "cfg5": (dict(type="post", dmg_model="siamese", encoder="resnest269",
                  tta=True), 4, True),
}


def _cost(compiled) -> tuple[float, float]:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=sorted(CONFIGS))
    ap.add_argument("--fused_tail", type=int, default=0)
    ap.add_argument("--einsum_1x1", type=int, default=0)
    ap.add_argument("--fold_eval_bn", type=int, default=1)
    ap.add_argument("--im2col", type=int, default=1,
                    help="fused-conv fwd form: 1 im2col GEMM, 0 per-tap GEMMs")
    ap.add_argument("--bwd", choices=["pallas", "xla"], default="pallas")
    ap.add_argument("--batch", type=int, default=0, help="override batch size")
    ap.add_argument("--remat", default="none",
                    choices=["none", "tail", "dots", "full", "act", "bn_act"],
                    help="train-step remat policy (make_train_step's knob — "
                         "kept for configs that no longer fit HBM, e.g. cfg4 "
                         "b4/b16 OOM on the 2026-08-19 re-imaged relay stack). "
                         "NOTE: before the round-5 vocabulary fix this arg "
                         "passed unknown strings through and mapped full→dots; "
                         "the campaign_r5 'full' rows measured the dots "
                         "program (relabeled in BASELINE.md).")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--trace_steps", type=int, default=4)
    ap.add_argument("--tag", default="", help="extra label for the output row")
    ap.add_argument("--donate", type=int, default=0,
                    help="1 donates the eval F1 state (train state is always "
                         "donated). Default off: the 2026-08-18 re-imaged "
                         "relay stack fails eval-step execution with a runtime "
                         "INVALID_ARGUMENT when the F1 state is donated "
                         "(compile succeeds; --donate 0 runs green at round-3 "
                         "timings). Harness-only: the trainer never donates "
                         "at eval.")
    args = ap.parse_args()

    import xview2_tpu.ops.packed_fused_conv as pfc
    pfc.IM2COL = bool(args.im2col)
    pfc.BWD_PALLAS = args.bwd == "pallas"

    enable_compilation_cache()
    kwargs, batch, eval_mode = CONFIGS[args.config]
    if args.batch:
        batch = args.batch
    cfg = Config(precision=16, batch_size=batch,
                 fused_tail=bool(args.fused_tail),
                 einsum_1x1=bool(args.einsum_1x1),
                 fold_eval_bn=bool(args.fold_eval_bn), **kwargs)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    rnp = np.random.default_rng(0)
    nlab = 2 if cfg.type == "pre" else 5
    images = jnp.asarray(rnp.integers(0, 256, (batch, 1024, 1024, cfg.in_channels),
                                      np.uint8))
    masks = jnp.asarray(rnp.integers(0, nlab, (batch, 1024, 1024), np.uint8))

    if eval_mode:
        variables = jax.jit(model.init, static_argnums=2)(
            rng, jnp.zeros((1, 64, 64, cfg.in_channels), jnp.float32), True)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        f1 = init_f1_state(cfg.n_metric_class)
        valid = jnp.ones((batch,), jnp.float32)
        step = jax.jit(make_eval_step(cfg, model),
                       donate_argnums=(2,) if args.donate else ())
        compiled = step.lower(params, batch_stats, f1, images, masks, valid).compile()

        def run(i):
            nonlocal f1
            f1, loss, _ = step(params, batch_stats, f1, images, masks, valid)
            return loss
    else:
        tx = build_optimizer(cfg, cfg.lr)
        state = init_train_state(cfg, model, tx, rng, (64, 64, cfg.in_channels))
        step = jax.jit(make_train_step(cfg, model, tx, crop=cfg.train_crop,
                                       remat=args.remat),
                       donate_argnums=0)
        compiled = step.lower(state, images, masks, rng).compile()

        def run(i):
            nonlocal state
            state, loss = step(state, images, masks, jax.random.fold_in(rng, i))
            return loss

    flops, byts = _cost(compiled)
    t_compile_done = time.perf_counter()

    for i in range(args.warmup):
        loss = run(i)
    jax.block_until_ready(loss)
    print(f"warmup done ({time.perf_counter() - t_compile_done:.1f}s), "
          f"loss={float(jnp.mean(loss)):.4f}", flush=True)

    t0 = time.perf_counter()
    for i in range(args.steps):
        loss = run(100 + i)
    jax.block_until_ready(loss)
    wall_ms = (time.perf_counter() - t0) / args.steps * 1000

    trace_dir = TRACE_DIR.format(name=args.config + (args.tag or ""))
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for i in range(args.trace_steps):
            loss = run(200 + i)
        jax.block_until_ready(loss)
    dev_ms = parse_trace.total_device_ms(trace_dir) / args.trace_steps

    hbm_ms = byts / HBM_RATE * 1000
    mxu_ms = flops / MXU_RATE * 1000
    row = {
        "config": args.config, "tag": args.tag, "batch": batch,
        "fused_tail": args.fused_tail, "einsum_1x1": args.einsum_1x1,
        "fold_eval_bn": args.fold_eval_bn, "im2col": args.im2col,
        "bwd": args.bwd, "remat": args.remat,
        "wall_ms": round(wall_ms, 1),
        "wall_tiles_s": round(batch / wall_ms * 1000, 1),
        "dev_ms": round(dev_ms, 1),
        "dev_tiles_s": round(batch / dev_ms * 1000, 1) if dev_ms else None,
        "gb_step": round(byts / 1e9, 1),
        "tf_step": round(flops / 1e12, 2),
        "hbm_bound_ms": round(hbm_ms, 1),
        "mxu_floor_ms": round(mxu_ms, 1),
        "pct_of_hbm_bound": round(dev_ms / hbm_ms * 100, 1) if hbm_ms else None,
        "loss": round(float(jnp.mean(loss)), 4),
    }
    print("ROOFLINE " + json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
