"""Channel/spatial geometry pins (reference unet.py:49-54, 80-110)."""

import jax
import jax.numpy as jnp
import pytest

from xview2_tpu.config import Config
from xview2_tpu.models.encoder import encoder_channels, make_encoder_stages
from xview2_tpu.models.unet import UNetTemplate

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("encoder,stem", [
    ("resnet50", 64), ("resnet101", 64), ("resnet152", 64),
    ("resnest50", 64), ("resnest101", 128), ("resnest200", 128), ("resnest269", 128),
])
def test_encoder_channel_table(encoder, stem):
    # reference unet.py:49-54
    assert encoder_channels(encoder) == [stem, 256, 512, 1024, 2048]


def test_encoder_stage_shapes_resnet50():
    chans, stages = make_encoder_stages("resnet50", 1, jnp.float32)

    x = jnp.zeros((1, 64, 64, 3))
    shapes = []
    for stage in stages:
        out_shape = jax.eval_shape(
            lambda xx, stage=stage: stage.init_with_output(KEY, xx, False)[0], x)
        x = jnp.zeros(out_shape.shape)
        shapes.append(out_shape.shape)
    assert shapes == [(1, 32, 32, 64), (1, 16, 16, 256), (1, 8, 8, 512),
                      (1, 4, 4, 1024), (1, 2, 2, 2048)]


@pytest.mark.parametrize("dilation,last_shapes", [
    (1, [(1, 4, 4, 1024), (1, 2, 2, 2048)]),
    (2, [(1, 4, 4, 1024), (1, 4, 4, 2048)]),   # layer4 dilated, keeps 1/16
    (4, [(1, 8, 8, 1024), (1, 8, 8, 2048)]),   # layer3+4 dilated, keep 1/8
])
def test_dilation_preserves_resolution(dilation, last_shapes):
    _, stages = make_encoder_stages("resnet50", dilation, jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    shapes = []
    for stage in stages:
        out_shape = jax.eval_shape(
            lambda xx, stage=stage: stage.init_with_output(KEY, xx, False)[0], x)
        x = jnp.zeros(out_shape.shape)
        shapes.append(out_shape.shape)
    assert shapes[-2:] == last_shapes


def test_unet_template_decoder_channels():
    # reference decoder channels [512,256,128,64,32] (unet.py:90); returned
    # maps are (dec5, dec4, dec3).  dec5 is s2d-packed (half resolution,
    # 4x channels, phase-major — layers.py packed tail; equivalence to the
    # fine grid is pinned by tests/test_packed_tail.py); dec4/dec3 are fine
    # half/quarter-resolution maps.
    cfg = Config(type="pre", encoder="resnet50", precision=32)
    m = UNetTemplate(cfg)
    out_shapes = jax.eval_shape(
        lambda x: m.init_with_output(KEY, x, False)[0], jnp.zeros((1, 64, 64, 3)))
    dec5, dec4, dec3 = out_shapes
    assert dec5.shape == (1, 32, 32, 4 * 32)
    assert dec4.shape == (1, 32, 32, 64)
    assert dec3.shape == (1, 16, 16, 128)
    # --dec_interp uses the unpacked path: dec5 comes back fine-grid
    cfg2 = Config(type="pre", encoder="resnet50", precision=32, dec_interp=True)
    m2 = UNetTemplate(cfg2)
    dec5f, _, _ = jax.eval_shape(
        lambda x: m2.init_with_output(KEY, x, False)[0], jnp.zeros((1, 64, 64, 3)))
    assert dec5f.shape == (1, 64, 64, 32)
