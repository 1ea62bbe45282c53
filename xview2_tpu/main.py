"""CLI entry point: ``python -m xview2_tpu.main --exec_mode {train,eval} ...``

Flag surface identical to the reference driver (``/root/reference/main.py``);
see ``xview2_tpu/config.py`` for the full mapping.  GPU-affinity pinning
(``utils/gpu_affinity.py``) has no TPU equivalent — host threading is handled
by the input pipeline.
"""

from __future__ import annotations

import sys

import os

from xview2_tpu.config import parse_args


def _maybe_init_distributed() -> None:
    """Multi-host (DCN) scaling: one global mesh across hosts.

    The reference's multi-GPU story was single-node NCCL DDP (SURVEY.md §5.8).
    TPU pods span hosts; when launched under a multi-host coordinator
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES`` or a TPU-pod
    environment), ``jax.distributed.initialize`` makes ``jax.devices()``
    global and the same 1-D data mesh covers every chip — no separate
    backend layer.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("TPU_WORKER_ID"):
        import jax

        try:
            jax.distributed.initialize()
        except Exception as e:  # single-process fallback
            print(f"jax.distributed.initialize skipped: {e}", flush=True)


def main(argv=None) -> int:
    cfg = parse_args(argv)
    # heavy imports after arg parsing so --help stays fast
    from xview2_tpu.train import trainer
    from xview2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    _maybe_init_distributed()

    if cfg.exec_mode == "train":
        best = trainer.fit(cfg)
        print(f"best checkpoint: {best}")
    else:
        metrics = trainer.test(cfg)
        print(f"test metrics: {metrics}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
