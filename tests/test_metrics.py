"""F1 metric tests vs hand-computed values and the reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xview2_tpu.ops.metrics import (
    F1State,
    compute_f1,
    convert_to_labels,
    init_f1_state,
    update_f1_state,
)


def test_pre_task_binary_f1():
    # 4 pixels: preds [1,1,0,0], targets [1,0,1,0] -> tp=1 fp=1 fn=1, F1=50
    logits = np.zeros((1, 2, 2, 2), np.float32)
    logits[0, 0, 0, 1] = 5  # pred 1
    logits[0, 0, 1, 1] = 5  # pred 1
    logits[0, 1, 0, 0] = 5  # pred 0
    logits[0, 1, 1, 0] = 5  # pred 0
    targets = np.array([[[1, 0], [1, 0]]], np.int32)
    st = update_f1_state(init_f1_state(2), jnp.array(logits), jnp.array(targets),
                         n_class=2, loss_str="focal+dice")
    f1, per_class = compute_f1(st, 2)
    assert per_class is None
    assert float(f1) == pytest.approx(200 * 1 / (2 * 1 + 1 + 1))


def test_post_task_masks_background_and_harmonic_mean():
    # 2x4 image, targets row0 = [1,2,3,4], row1 = background (ignored)
    targets = np.array([[[1, 2, 3, 4], [0, 0, 0, 0]]], np.int32)
    # predictions via argmax+1: predict [1,2,3,3]
    logits = np.zeros((1, 2, 4, 4), np.float32)
    for j, cls in enumerate([0, 1, 2, 2]):
        logits[0, 0, j, cls] = 9.0
    # background row would "predict" class 1 but must not count
    logits[0, 1, :, 0] = 9.0
    st = update_f1_state(init_f1_state(5), jnp.array(logits), jnp.array(targets),
                         n_class=5, loss_str="focal+dice")
    f1, per_class = compute_f1(st, 5)
    pc = np.asarray(per_class)
    # class1: tp=1 -> 100; class2: tp=1 -> 100; class3: tp=1, fp=1 -> 200/3; class4: fn=1 -> 0
    assert pc[0] == pytest.approx(100.0)
    assert pc[1] == pytest.approx(100.0)
    assert pc[2] == pytest.approx(200 / 3)
    assert pc[3] == pytest.approx(0.0)
    want = 4 / sum(1 / (x + 1e-6) for x in [100.0, 100.0, 200 / 3, 0.0])
    assert float(f1) == pytest.approx(want, rel=1e-4)


def test_convert_to_labels_mse_and_coral():
    # mse: round(relu(x))+1 clipped at 4 (reference f1.py:8-10)
    logits = np.array([-1.0, 0.4, 1.6, 7.0], np.float32).reshape(1, 1, 4, 1)
    out = np.asarray(convert_to_labels("mse", jnp.array(logits)))
    assert out.reshape(-1).tolist() == [1, 1, 3, 4]
    # coral: count of sigmoid>0.5 plus 1 (f1.py:11-12)
    logits = np.array([[2.0, 1.0, -1.0]], np.float32).reshape(1, 1, 1, 3)
    out = np.asarray(convert_to_labels("coral", jnp.array(logits)))
    assert out.reshape(-1).tolist() == [3]


def test_update_accumulates_across_batches():
    rng = np.random.default_rng(1)
    logits1 = rng.normal(size=(2, 4, 4, 2)).astype(np.float32)
    logits2 = rng.normal(size=(2, 4, 4, 2)).astype(np.float32)
    t1 = rng.integers(0, 2, size=(2, 4, 4)).astype(np.int32)
    t2 = rng.integers(0, 2, size=(2, 4, 4)).astype(np.int32)
    st = init_f1_state(2)
    st = update_f1_state(st, jnp.array(logits1), jnp.array(t1), n_class=2, loss_str="ce")
    st = update_f1_state(st, jnp.array(logits2), jnp.array(t2), n_class=2, loss_str="ce")
    both = update_f1_state(
        init_f1_state(2),
        jnp.array(np.concatenate([logits1, logits2])),
        jnp.array(np.concatenate([t1, t2])),
        n_class=2, loss_str="ce",
    )
    np.testing.assert_allclose(np.asarray(st.tp), np.asarray(both.tp))
    np.testing.assert_allclose(np.asarray(st.fp), np.asarray(both.fp))
    np.testing.assert_allclose(np.asarray(st.fn), np.asarray(both.fn))


def test_sharded_update_matches_single_device():
    """The GSPMD equivalent of dist_reduce_fx='sum' (reference f1.py:24-26)."""
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(8, 4, 4, 2)).astype(np.float32)
    targets = rng.integers(0, 2, size=(8, 4, 4)).astype(np.int32)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    logits_s = jax.device_put(jnp.array(logits), sharding)
    targets_s = jax.device_put(jnp.array(targets), sharding)

    @jax.jit
    def step(logits, targets):
        return update_f1_state(init_f1_state(2), logits, targets, n_class=2, loss_str="ce")

    sharded = step(logits_s, targets_s)
    local = update_f1_state(init_f1_state(2), jnp.array(logits), jnp.array(targets),
                            n_class=2, loss_str="ce")
    np.testing.assert_allclose(np.asarray(sharded.tp), np.asarray(local.tp))
    np.testing.assert_allclose(np.asarray(sharded.fp), np.asarray(local.fp))
    np.testing.assert_allclose(np.asarray(sharded.fn), np.asarray(local.fn))
