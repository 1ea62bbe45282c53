"""CLI entry point: ``python -m xview2_tpu.main --exec_mode {train,eval} ...``

Flag surface identical to the reference driver (``/root/reference/main.py``);
see ``xview2_tpu/config.py`` for the full mapping.  GPU-affinity pinning
(``utils/gpu_affinity.py``) has no TPU equivalent — host threading is handled
by the input pipeline.
"""

from __future__ import annotations

import sys

from xview2_tpu.config import parse_args


def main(argv=None) -> int:
    cfg = parse_args(argv)
    # heavy imports after arg parsing so --help stays fast
    from xview2_tpu.train import trainer
    from xview2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if cfg.exec_mode == "train":
        best = trainer.fit(cfg)
        print(f"best checkpoint: {best}")
    else:
        metrics = trainer.test(cfg)
        print(f"test metrics: {metrics}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
