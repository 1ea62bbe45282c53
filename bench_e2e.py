"""Sustained END-TO-END training throughput with real files.

Unlike ``bench.py`` (device-only, one in-memory batch), this drives the full
host pipeline: PNG files on disk -> ``Loader`` (native C++ decoder / PIL
fallback, threaded prefetch) -> host->device transfer -> fused
augment+train step — so the host/device balance is measured, not argued.

Generates a synthetic 1024^2 xBD-style dataset on first run (default 96
tiles) and reports sustained tiles/s for (a) cold PNG decode and (b) the
``--raw_cache`` path (epochs 2+ skip PNG inflate).

Prints one JSON line per phase:
  {"metric": "e2e_train_tiles1024_per_sec", "phase": "png"|"raw_cache", ...}
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from xview2_tpu.config import Config
from xview2_tpu.data.pipeline import Loader, XView2Dataset
from xview2_tpu.data.synthetic import make_synthetic_split
from xview2_tpu.models.unet import build_model
from xview2_tpu.parallel.steps import init_train_state, make_train_step
from xview2_tpu.train.optimizers import build_optimizer
from xview2_tpu.utils.cache import enable_compilation_cache


def run_epoch(loader, step, state, rng) -> tuple:
    n, t0 = 0, time.perf_counter()
    loss = None
    for batch in loader:
        imgs = jax.device_put(batch.image)
        msks = jax.device_put(batch.mask)
        state, loss = step(state, imgs, msks, jax.random.fold_in(rng, n))
        n += imgs.shape[0]
    jax.block_until_ready(loss)
    return state, n / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=96)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--data", type=str, default=".scratch/e2e_bench_data")
    args = ap.parse_args()

    enable_compilation_cache()
    if not os.path.isdir(os.path.join(args.data, "train", "images")):
        print(f"generating {args.tiles} synthetic 1024^2 tiles under {args.data}...",
              flush=True)
        make_synthetic_split(args.data, "train", args.tiles, size=1024)

    cfg = Config(type="pre", encoder="resnet50", precision=16,
                 loss_str="focal+dice", batch_size=args.batch_size)
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, model, tx, rng, (64, 64, 3))
    step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=0)

    train_dir = os.path.join(args.data, "train")
    cache_dir = os.path.join(args.data, "raw_cache")

    # warm up compile with one batch
    ds = XView2Dataset(train_dir, "pre", True)
    loader = Loader(ds, args.batch_size, shuffle=True, drop_last=True,
                    num_workers=args.num_workers, seed=1)
    first = next(iter(loader))
    state, loss = step(state, jax.device_put(first.image),
                       jax.device_put(first.mask), rng)
    jax.block_until_ready(loss)

    state, png_rate = run_epoch(loader, step, state, rng)
    print(json.dumps({"metric": "e2e_train_tiles1024_per_sec", "phase": "png",
                      "value": round(png_rate, 2), "unit": "tiles/s"}), flush=True)

    ds_c = XView2Dataset(train_dir, "pre", True, cache_dir=cache_dir)
    loader_c = Loader(ds_c, args.batch_size, shuffle=True, drop_last=True,
                      num_workers=args.num_workers, seed=2)
    state, _ = run_epoch(loader_c, step, state, rng)      # epoch 1 fills cache
    state, raw_rate = run_epoch(loader_c, step, state, rng)
    print(json.dumps({"metric": "e2e_train_tiles1024_per_sec", "phase": "raw_cache",
                      "value": round(raw_rate, 2), "unit": "tiles/s"}), flush=True)


if __name__ == "__main__":
    main()
