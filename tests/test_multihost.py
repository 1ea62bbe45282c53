"""Recorded multi-host (DCN) execution (VERDICT r4 item 4 / SURVEY §5.8).

Runs ``tools/multihost_smoke.py`` as a real 2-process job: each process owns
4 virtual CPU devices, ``jax.distributed.initialize`` joins them into ONE
8-device global mesh, and a jitted data-parallel train step executes with
globally-sharded batches assembled from process-local shards
(``jax.make_array_from_process_local_data``).  This is the cross-host
topology of the reference's multi-node DDP launch
(``/root/reference/main.py:107``) expressed the JAX way — the same
``make_train_step`` the single-host tests exercise, scaled over processes
with no code changes, which is the whole point of the GSPMD design.

Subprocess-spawned so the coordinator/client processes are genuinely
separate (in-process the distributed service cannot be joined twice).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # two full UNet step compiles on a 1-vCPU host

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = os.path.join(REPO, "tools", "multihost_smoke.py")


def test_two_process_global_mesh_train_step():
    env = dict(os.environ)
    # the conftest forces an 8-device single-process mesh; the workers set
    # their own 4-device count — strip ours so the flags don't conflict
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run([sys.executable, SMOKE], env=env, timeout=1200,
                          capture_output=True, text=True)
    assert proc.returncode == 0, \
        f"multihost smoke failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "MULTIHOST OK" in proc.stdout
    # both ranks ran the sharded step to a finite loss
    assert proc.stdout.count("global-mesh train step OK") == 2, proc.stdout
