"""GSPMD spatial partitioning: sharded-H forward matches unsharded.

The CNN analog of sequence parallelism (SURVEY.md §5.7): the image height
dimension is sharded over a second mesh axis and XLA inserts the convolution
halo exchanges.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from xview2_tpu.config import Config
from xview2_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from xview2_tpu.models.unet import build_model


def test_spatial_sharded_forward_matches_unsharded():
    assert len(jax.devices()) == 8
    cfg = Config(type="pre", encoder="resnet50", precision=32, gpus=8, spatial_shards=4)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 128, 128, 3)), jnp.float32)
    v = model.init(rng, x, False)
    ref = model.apply(v, x, False)

    mesh = make_mesh(8, 4)
    assert mesh.shape == {"data": 2, "space": 4}
    xs = jax.device_put(x, batch_sharding(mesh))
    vs = jax.device_put(v, replicated(mesh))
    out = jax.jit(lambda v, x: model.apply(v, x, False))(vs, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_config_validates_spatial_divisibility():
    with pytest.raises(ValueError):
        Config(type="pre", gpus=4, spatial_shards=3)


@pytest.mark.slow  # cross-impl/behavioral heavyweight; quick gate = -m 'not slow'
def test_full_train_step_on_2d_mesh():
    """The FULL train step on the 2-D (data, space) mesh (VERDICT r3 #4).

    Exercises every 2-D-mesh special case end to end: the augmentation
    shard_map's space-unmapped branch (parallel/steps.py::_augment_batch,
    AutoAugment Pallas row-shift included), the spatially-sharded fwd/bwd with
    GSPMD conv halo exchanges, global-batch BN stats, the gradient reduction,
    and the optimizer update.  Reference counterpart: DDP runs the whole step
    identically per-rank (main.py:107)."""
    from xview2_tpu.parallel.steps import init_train_state, make_train_step
    from xview2_tpu.train.optimizers import build_optimizer

    cfg = Config(type="post", dmg_model="siamese", encoder="resnet50",
                 precision=16, loss_str="focal+dice", autoaugment=True,
                 gpus=8, spatial_shards=2)
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    state = init_train_state(cfg, model, tx, jax.random.PRNGKey(0), (64, 64, 6))

    mesh = make_mesh(8, 2)
    assert mesh.shape == {"data": 4, "space": 2}
    state = jax.device_put(state, replicated(mesh))
    rnp = np.random.default_rng(3)
    images = jax.device_put(
        jnp.asarray(rnp.integers(0, 256, (4, 128, 128, 6), np.uint8)),
        batch_sharding(mesh))
    masks = jax.device_put(
        jnp.asarray((rnp.random((4, 128, 128)) > 0.9).astype(np.uint8)),
        batch_sharding(mesh))

    step = jax.jit(make_train_step(cfg, model, tx, crop=64, mesh=mesh))
    old_param = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    new_state, loss = step(state, images, masks, jax.random.PRNGKey(1))
    jax.block_until_ready(loss)

    assert np.isfinite(float(loss)), f"non-finite loss {loss}"
    new_param = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    assert not np.array_equal(old_param, new_param), "params did not update"
    assert int(new_state.step) == int(state.step) + 1
