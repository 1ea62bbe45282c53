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
