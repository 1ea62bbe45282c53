"""Headline benchmark: fused augment+train throughput on one TPU chip.

Measures end-to-end training throughput of the localization U-Net on the
reference's training geometry — raw uint8 1024x1024 xBD-style tiles in, one
fused XLA program doing on-device augmentation (zoom/crop/flip/noise/
normalize to 512^2), bf16 forward/backward, and the optimizer update.  Each
processed sample corresponds to one 1024^2 tile, so the metric is
"train tiles/sec/chip" (BASELINE.json headline).

``vs_baseline`` divides by EST_REF_TILES_PER_SEC — an *estimated* reference
throughput (PyTorch DDP AMP fp16, ResNet-50 U-Net, batch 16, V100-class GPU,
CPU-side albumentations input pipeline).  The reference publishes no numbers
(BASELINE.md); replace with a measured value when a GPU host is available.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from xview2_tpu.config import Config
from xview2_tpu.models.unet import build_model
from xview2_tpu.parallel.steps import init_train_state, make_train_step
from xview2_tpu.train.optimizers import build_optimizer
from xview2_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

# Estimated reference per-GPU train throughput (tiles/sec): ResNet-50 U-Net,
# 512^2 crops, batch 16, fp16 AMP on the NGC 21.03 stack.  See BASELINE.md.
EST_REF_TILES_PER_SEC = 40.0

BATCH = 16
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def _run() -> dict:
    cfg = Config(type="pre", encoder="resnet50", precision=16,
                 loss_str="focal+dice", batch_size=BATCH)
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, model, tx, rng, (64, 64, 3))

    rnp = np.random.default_rng(0)
    images = jnp.asarray(rnp.integers(0, 256, (BATCH, 1024, 1024, 3), np.uint8))
    masks = jnp.asarray((rnp.random((BATCH, 1024, 1024)) > 0.9).astype(np.uint8))

    step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=0)
    for i in range(WARMUP_STEPS):
        state, loss = step(state, images, masks, jax.random.fold_in(rng, i))
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, loss = step(state, images, masks, jax.random.fold_in(rng, 100 + i))
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    tiles_per_sec = BATCH * MEASURE_STEPS / dt
    return {
        "metric": "train_tiles1024_per_sec_per_chip",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_sec / EST_REF_TILES_PER_SEC, 3),
    }


def main() -> None:
    # Bounded retry on transient backend-init failures: round 3's driver
    # capture was zeroed by a relay blip ("Unable to initialize backend
    # 'axon': UNAVAILABLE" at first device use) even though the chip came
    # back minutes later.  One cleared-backend retry after 60 s absorbs that
    # class of outage without masking real errors.
    #
    # The round-4 outage showed a second failure mode: backend init HANGS
    # instead of raising (probes sat >15 min at first device use), which an
    # exception-based retry never sees.  A SIGALRM bound around device
    # discovery turns the hang into a retryable timeout.
    import signal

    def _probe_devices(timeout_s: int = 600) -> None:
        def _on_alarm(signum, frame):
            raise TimeoutError("backend init timed out")

        old = signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(timeout_s)
        try:
            jax.devices()
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    attempts = 2
    for attempt in range(attempts):
        try:
            _probe_devices()
            result = _run()
            break
        except Exception as err:  # noqa: BLE001 - classify then re-raise
            msg = str(err)
            transient = ("UNAVAILABLE" in msg or "initialize backend" in msg
                         or isinstance(err, TimeoutError))
            if attempt + 1 < attempts and transient:
                print(f"bench: transient backend failure ({msg.splitlines()[0]}); "
                      "retrying in 60 s", file=sys.stderr, flush=True)
                jax.extend.backend.clear_backends()
                time.sleep(60)
            else:
                raise
    print(json.dumps(result))


if __name__ == "__main__":
    main()
