"""Multi-host smoke: 2 processes, one global mesh, sharded train step.

Validates the DCN scaling path (SURVEY.md §5.8): each process owns 4 virtual
CPU devices; ``jax.distributed.initialize`` joins them into one 8-device
global mesh; a jitted data-parallel train step runs with globally-sharded
batches (process-local shards via ``jax.make_array_from_process_local_data``).

Run:  python tools/multihost_smoke.py            # spawns both processes
      python tools/multihost_smoke.py --rank N   # worker entry
"""

from __future__ import annotations

import os
import subprocess
import sys


def worker(rank: int) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address="localhost:12321",
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, f"global devices: {len(jax.devices())}"

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from xview2_tpu.config import Config
    from xview2_tpu.models.unet import build_model
    from xview2_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from xview2_tpu.parallel.steps import init_train_state, make_train_step
    from xview2_tpu.train.optimizers import build_optimizer

    cfg = Config(type="pre", encoder="resnet50", precision=32, loss_str="ce",
                 gpus=8, batch_size=1)
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    state = init_train_state(cfg, model, tx, jax.random.PRNGKey(0), (64, 64, 3))
    mesh = make_mesh(8)
    state = jax.device_put(state, replicated(mesh))

    rnp = np.random.default_rng(0)
    global_imgs = rnp.integers(0, 256, (8, 128, 128, 3), np.uint8)
    global_msks = (rnp.random((8, 128, 128)) > 0.9).astype(np.uint8)
    bs = batch_sharding(mesh)
    # each process contributes its local half of the global batch
    imgs = jax.make_array_from_process_local_data(bs, global_imgs[rank * 4:(rank + 1) * 4])
    msks = jax.make_array_from_process_local_data(bs, global_msks[rank * 4:(rank + 1) * 4])

    step = jax.jit(make_train_step(cfg, model, tx, crop=64, mesh=mesh),
                   donate_argnums=0)
    state, loss = step(state, imgs, msks, jax.random.PRNGKey(1))
    loss = float(loss)
    assert np.isfinite(loss)
    print(f"[rank {rank}] global-mesh train step OK, loss={loss:.4f}", flush=True)
    jax.distributed.shutdown()


def main() -> int:
    if "--rank" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--rank") + 1]))
        return 0
    procs = [subprocess.Popen([sys.executable, os.path.abspath(__file__), "--rank", str(r)])
             for r in range(2)]
    rc = [p.wait() for p in procs]
    assert rc == [0, 0], f"worker exit codes: {rc}"
    print("MULTIHOST OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
