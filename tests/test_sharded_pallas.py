"""TPU-branch Pallas paths under a sharded step (VERDICT r2 item 2).

The relayout identity (`ops/layout.py`) and the AutoAugment row-shift kernel
(`ops/rowshift.py`) only execute on TPU in production; these tests force the
branches in interpret mode on the 8-device CPU mesh and assert

* values match the unsharded / XLA-fallback computation bit-for-bit, and
* the partitioned HLO contains NO collective around the custom calls — an
  unregistered custom call would be replicated by the partitioner, i.e. an
  all-gather of the full tensor per step (only one real chip exists in CI,
  so the HLO is the evidence; reference counterpart: DDP's per-rank
  uniformity, main.py:107).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import xview2_tpu.ops.autoaugment as aa
import xview2_tpu.ops.layout as layout
from xview2_tpu.parallel.mesh import make_mesh
from xview2_tpu.parallel.steps import _augment_batch

COLLECTIVES = ("all-gather", "all-reduce", "collective-permute", "all-to-all")


def _assert_no_collectives(hlo: str, what: str):
    for c in COLLECTIVES:
        assert c not in hlo, f"{c} inserted around {what}"


@pytest.fixture
def data_sharding():
    mesh = make_mesh(8)
    return mesh, NamedSharding(mesh, P("data"))


def test_relayout_partitions_without_collectives(data_sharding, monkeypatch):
    mesh, sh = data_sharding
    monkeypatch.setattr(layout, "force_interpret", True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 16, 16, 4)),
                    jnp.float32)
    xs = jax.device_put(x, sh)
    f = jax.jit(lambda t: layout.relayout_standard(t, mesh=mesh) * 2.0,
                in_shardings=sh, out_shardings=sh)
    np.testing.assert_array_equal(np.asarray(f(xs)), np.asarray(x) * 2.0)
    _assert_no_collectives(f.lower(xs).compile().as_text(), "relayout_standard")
    # backward: the cotangent relayout must partition the same way
    g = jax.jit(jax.grad(
        lambda t: (layout.relayout_standard(t, mesh=mesh) ** 2).sum()),
        in_shardings=sh, out_shardings=sh)
    np.testing.assert_allclose(np.asarray(g(xs)), 2 * np.asarray(x), rtol=1e-6)
    _assert_no_collectives(g.lower(xs).compile().as_text(), "relayout bwd")


def test_augment_shard_map_pallas_branch(data_sharding, monkeypatch):
    """The full augmentation (incl. the Pallas row-shift TPU branch, forced
    into interpret mode) runs per-shard under shard_map: values bit-equal to
    the unsharded XLA-fallback pipeline, no collectives in the HLO."""
    mesh, sh = data_sharding
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(0, 255, (8, 96, 96, 3)), jnp.uint8)
    msks = jnp.asarray(rng.integers(0, 2, (8, 96, 96)), jnp.uint8)

    # reference values: same forced Pallas branch (incl. the 3-shear rotate,
    # which deliberately differs from the XLA-fallback exact gather), unsharded
    monkeypatch.setattr(aa, "force_pallas_interpret", True)
    want_x, want_y = jax.jit(_augment_batch(True, 64, False, None))(keys, imgs, msks)

    f = jax.jit(_augment_batch(True, 64, False, mesh))
    got_x, got_y = f(jax.device_put(keys, sh), jax.device_put(imgs, sh),
                     jax.device_put(msks, sh))
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(want_x))
    np.testing.assert_array_equal(np.asarray(got_y), np.asarray(want_y))
    _assert_no_collectives(f.lower(keys, imgs, msks).compile().as_text(),
                           "shard_map augmentation")


@pytest.mark.slow  # cross-impl/behavioral heavyweight; quick gate = -m 'not slow'
def test_train_step_with_mesh_matches_meshless(data_sharding):
    """One full sharded train step with the shard_map augmentation produces
    the same loss as the meshless step (both on the XLA fallback paths)."""
    from xview2_tpu.config import Config
    from xview2_tpu.models.unet import build_model
    from xview2_tpu.parallel.mesh import batch_sharding, replicated
    from xview2_tpu.parallel.steps import init_train_state, make_train_step
    from xview2_tpu.train.optimizers import build_optimizer

    mesh, _ = data_sharding
    cfg = Config(type="pre", encoder="resnet50", precision=32, loss_str="ce",
                 gpus=8, autoaugment=True)
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    state = init_train_state(cfg, model, tx, jax.random.PRNGKey(0), (32, 32, 3))
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3)), np.uint8)
    msks = jnp.asarray((rng.random((8, 64, 64)) > 0.9), np.uint8)
    key = jax.random.PRNGKey(7)

    _, loss_ref = jax.jit(make_train_step(cfg, model, tx, crop=32))(
        state, imgs, msks, key)

    state_s = jax.device_put(state, replicated(mesh))
    bs = batch_sharding(mesh)
    _, loss_sh = jax.jit(make_train_step(cfg, model, tx, crop=32, mesh=mesh))(
        state_s, jax.device_put(imgs, bs), jax.device_put(msks, bs), key)
    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=1e-5)
