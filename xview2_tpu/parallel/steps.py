"""Jitted train / eval steps: augmentation + forward + loss + update, fused.

The whole step — on-device augmentation, bf16 forward, deep-supervision loss,
gradient, optimizer update, BN stat update — is one XLA program (reference
equivalents: ``model/plt.py:50-77`` + apex/DDP machinery).  Under a sharded
batch, GSPMD inserts the gradient/BN/metric collectives; there is no explicit
pmean in user code.

TTA evaluation mirrors ``plt.py:30, 42-48``: mean of logits over
{identity, flip-H, flip-W, flip-HW}.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from jax.sharding import Mesh, PartitionSpec as P

from xview2_tpu.config import Config
from xview2_tpu.models.layers import (einsum_1x1_scope, fold_eval_bn_scope,
                                      fused_tail_scope, remat_tail_scope)
from xview2_tpu.models.unet import emits_packed_loss_view, fused_head_defer_ok
from xview2_tpu.ops.augment import augment_sample, eval_batch
from xview2_tpu.ops.layout import relayout_standard
from xview2_tpu.ops.losses import (deep_supervision_loss, make_loss_fn,
                                   packed_loss_view_labels)
from xview2_tpu.ops.metrics import F1State, update_f1_state
from xview2_tpu.parallel.mesh import DATA_AXIS

Array = jax.Array


def _augment_batch(use_autoaugment: bool, crop: int, bgr: bool,
                   mesh: Optional[Mesh]):
    """Batched augmentation, explicitly data-parallel over the mesh.

    The per-sample augmentation pipeline ends in Pallas custom calls (the
    AutoAugment row-shift kernel, ``ops/rowshift.py``); an unregistered custom
    call has no GSPMD/shardy partitioning rule, so a multi-chip step would
    *replicate* the whole vmapped augmentation — an all-gather of the raw
    batch per step.  With a mesh, the vmapped pipeline runs under
    ``shard_map`` over the ``data`` axis: each chip augments only its batch
    shard, locally (the op is independent per sample; warps and channel swaps
    are global *within* a sample, so samples are never split).  On a 2-D
    ``--spatial_shards`` mesh the body is unmapped over ``space`` — each space
    shard augments its data shard replicated, and GSPMD re-shards the output
    height downstream.  Reference counterpart: DDP runs the CPU augmentation
    identically per-rank (``main.py:107``).

    (``custom_partitioning`` would be the annotation-only alternative, but it
    rejects functions whose jaxprs carry constants — the AutoAugment policy
    tables and ImageNet normalization constants are exactly that.)
    """

    def impl(keys, images, masks):
        aug = functools.partial(augment_sample, use_autoaugment=use_autoaugment,
                                crop=crop, bgr=bgr)
        return jax.vmap(aug)(keys, images, masks)

    if mesh is None or mesh.size == 1:
        return impl
    spec = P(DATA_AXIS)
    return jax.shard_map(impl, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=(spec, spec), check_vma=False)


class TrainState(flax.struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def init_train_state(cfg: Config, model, tx: optax.GradientTransformation,
                     rng: Array, sample_shape: Tuple[int, ...]) -> TrainState:
    # jit both inits: run eagerly they execute op-by-op, and on the tunneled
    # TPU every tiny eager compile is a >1 s relay RPC — a ResNet UNet init
    # alone took ~10 minutes that way (one jitted program compiles once and
    # persists in the compilation cache)
    variables = jax.jit(model.init, static_argnums=2)(
        rng, jnp.zeros((1,) + tuple(sample_shape), jnp.float32), True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=jax.jit(tx.init)(params),
    )


def make_train_step(cfg: Config, model, tx: optax.GradientTransformation,
                    crop: int = 512, remat: bool = False,
                    mesh: Optional[Mesh] = None,
                    ) -> Callable[[TrainState, Array, Array, Array], Tuple[TrainState, Array]]:
    """Build the fused augment+train step.

    ``images`` are raw uint8 (B, 1024, 1024, C) tiles, ``masks`` raw uint8
    labels; augmentation to ``crop``-size crops (512, reference
    ``pytorch_loader.py:57``) runs on device inside the same program.

    ``remat`` rematerializes the forward in the backward (``jax.checkpoint``).
    Default off: a controlled sweep on v5e (batch 16, resnet50 UNetLoc,
    donated state) measured every whole-policy remat *slower* than none
    (none 189 ms / full 290 / dots 289 / dots-batch 266) — activations fit in
    HBM (10.4 GB temp), so recompute only adds FLOPs.  The knob remains for
    larger models/batches where temp memory would otherwise spill.

    ``remat`` accepts the CLI vocabulary directly (``--remat`` in
    ``config.py``): ``"none"``/``False`` (off), ``"tail"`` (surgical: each
    BN+activation runs in a local nothing-saveable checkpoint region — the
    elementwise tails are re-derived from the conv outputs in the backward,
    see ``layers.remat_tail_scope``), ``"dots"``/``True``
    (``dots_saveable`` policy: matmul/conv outputs saved, everything else
    recomputed), ``"full"`` (no-policy ``jax.checkpoint``: nothing saved,
    the whole forward recomputed — strictly minimal residual memory), plus
    ``"act"``/``"bn_act"`` (whole-function except-names policies, kept as
    measured negatives: they make flax BN's f32 pre-cast internals saveable
    and OOM HBM at batch 16).  Unknown values raise — a silent fallthrough
    here once mislabeled a roofline A/B (BASELINE.md round-5 remat rows).
    """
    loss_fn = make_loss_fn(cfg.loss_str, cfg.type)
    use_aa = cfg.autoaugment
    rl = functools.partial(relayout_standard, mesh=mesh)
    # the packed output head emits train logits as a (B, H/2, 2W, n) pixel
    # permutation (no depth-to-space transpose); pair it with the same
    # permutation of the labels — every loss term is permutation-invariant
    packed_view = emits_packed_loss_view(cfg)

    def forward_loss(params, batch_stats, x, y, y_main):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, True, mutable=["batch_stats"])
        # standard-layout seam between model and loss: without it the
        # augmentation gathers' batch-minor layout propagates into ~11.5 ms of
        # lane-starved loss ops (ops/layout.py; -10.6 ms on the headline step)
        if isinstance(outs, list):
            loss = deep_supervision_loss(loss_fn, [rl(o) for o in outs],
                                         y, main_labels=y_main)
        else:
            loss = loss_fn(rl(outs), y_main)
        return loss, mutated["batch_stats"]

    if remat in (False, None, "", "none") or remat == "tail":
        # "tail" is handled at trace time inside step_fn via
        # layers.remat_tail_scope: each BN+activation runs in a local
        # nothing-saveable checkpoint region whose only large residual is
        # the conv output.  The global except-names policies below are kept
        # for reference but measured HARMFUL: marking everything else
        # saveable makes partial-eval store flax BatchNorm's f32 pre-cast
        # internals (2x bytes; HBM OOM at batch 16 on v5e).
        pass
    elif remat == "act":
        forward_loss = jax.checkpoint(
            forward_loss,
            policy=jax.checkpoint_policies.save_anything_except_these_names("act"))
    elif remat == "bn_act":
        forward_loss = jax.checkpoint(
            forward_loss,
            policy=jax.checkpoint_policies.save_anything_except_these_names("bn", "act"))
    elif remat == "full":
        # no policy: nothing saveable, the entire forward recomputes in the
        # backward — the strictly-minimal-residual form for geometries that
        # exceed HBM even under dots_saveable.
        forward_loss = jax.checkpoint(forward_loss)
    elif remat is True or remat == "dots":
        forward_loss = jax.checkpoint(
            forward_loss, policy=jax.checkpoint_policies.dots_saveable)
    else:
        raise ValueError(
            f"remat must be none/tail/dots/full (or act/bn_act), got {remat!r}")

    augment = _augment_batch(use_aa, crop, cfg.bgr, mesh)

    def step_fn(state: TrainState, images: Array, masks: Array, rng: Array):
        keys = jax.random.split(rng, images.shape[0])
        x, y = augment(keys, images, masks)
        if packed_view:
            y_main = rl(packed_loss_view_labels(y))
            # fine labels are only consumed by the DS-head loss terms
            y = rl(y) if cfg.deep_supervision else y_main
        else:
            y = y_main = rl(y)

        with remat_tail_scope(remat == "tail"), \
                einsum_1x1_scope(bool(cfg.einsum_1x1)), \
                fused_tail_scope(bool(cfg.fused_tail), mesh,
                                 defer_head=fused_head_defer_ok(cfg)):
            (loss, new_stats), grads = jax.value_and_grad(forward_loss, has_aux=True)(
                state.params, state.batch_stats, x, y, y_main)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt_state)
        return new_state, loss

    return step_fn


def make_train_multistep(cfg: Config, model, tx: optax.GradientTransformation,
                         nsteps: int, crop: int = 512, remat: bool = False,
                         mesh: Optional[Mesh] = None,
                         ) -> Callable[[TrainState, Array, Array, Array], Tuple[TrainState, Array]]:
    """``nsteps`` fused train steps in ONE device program (``lax.scan``).

    Through the tunneled single-chip relay every program launch costs ~5 ms of
    wall time over device time (BASELINE.md wall−device gap); batching K steps
    into one launch amortizes it to ~5/K ms.  Inputs are stacked per-step
    batches ``images (K, B, 1024, 1024, C)`` / ``masks (K, B, 1024, 1024)``
    already on device (the trainer's prefetcher uploads batch k+1 while step k
    runs); semantics are IDENTICAL to calling :func:`make_train_step` K times
    with per-step rng folds.  Returns the final state and the (K,) losses.

    The reference has no counterpart (per-step Python loop,
    ``/root/reference/main.py:107``); this is a launch-overhead optimization,
    not a semantic change.

    EXPERIMENTAL — not wired into the trainer.  On the tunneled relay the
    per-launch overhead turned out to be pipelined streaming, not dispatch
    latency, so K-step batching recovered <1% (BASELINE.md round-3 ladder);
    the builder is kept (tested in ``tests/test_multistep.py``) for real
    multi-host deployments where launch overhead differs.  Wire it by
    replacing the trainer's per-batch ``step()`` call with stacked K-batches.
    """
    step_fn = make_train_step(cfg, model, tx, crop=crop, remat=remat, mesh=mesh)

    def multi_step(state: TrainState, images: Array, masks: Array, rng: Array):
        keys = jax.random.split(rng, nsteps)

        def body(carry, xs):
            img, msk, key = xs
            new_state, loss = step_fn(carry, img, msk, key)
            return new_state, loss

        state, losses = jax.lax.scan(body, state, (images, masks, keys))
        return state, losses

    return multi_step


def tta_forward(model, variables, x: Array, use_tta: bool) -> Array:
    """Flip-averaged logits (reference plt.py:42-48); NHWC flip axes (1, 2).

    The four flip variants run as ONE forward over a 4x-stacked batch —
    identical per-sample math (eval-mode BN uses running stats), +16%
    throughput over four sequential applies on v5e (better MXU utilization
    at small eval batches).
    """
    if not use_tta:
        return model.apply(variables, x, False)
    xs = jnp.concatenate(
        [x, jnp.flip(x, axis=1), jnp.flip(x, axis=2), jnp.flip(x, axis=(1, 2))])
    preds = model.apply(variables, xs, False)
    p0, p1, p2, p3 = jnp.split(preds, 4)
    return (p0 + jnp.flip(p1, axis=1) + jnp.flip(p2, axis=2)
            + jnp.flip(p3, axis=(1, 2))) / 4.0


def make_eval_step(cfg: Config, model, mesh: Optional[Mesh] = None):
    """Build the eval step: normalize, TTA forward, loss, F1 accumulate.

    Returns ``(f1_state, loss_sum, loss_count, logits)``; ``valid`` is a (B,)
    0/1 vector so padded tail batches don't pollute metrics.  ``logits`` are
    returned for prediction dumping in ``--exec_mode eval``.
    """
    loss_fn = make_loss_fn(cfg.loss_str, cfg.type)
    n_class = cfg.n_metric_class

    def step_fn(params, batch_stats, f1_state: F1State,
                images: Array, masks: Array, valid: Array):
        x = eval_batch(images, bgr=cfg.bgr)
        variables = {"params": params, "batch_stats": batch_stats}
        # contextvar read at trace time inside the module bodies (same
        # pattern as remat_tail_scope in make_train_step); the fused packed
        # chain applies at eval too (folds come from running stats there)
        with fold_eval_bn_scope(bool(cfg.fold_eval_bn)), \
                einsum_1x1_scope(bool(cfg.einsum_1x1)), \
                fused_tail_scope(bool(cfg.fused_tail), mesh,
                                 defer_head=fused_head_defer_ok(cfg)):
            logits = tta_forward(model, variables, x, cfg.tta).astype(jnp.float32)
        logits = relayout_standard(logits, mesh=mesh)  # see make_train_step
        loss = loss_fn(logits, masks.astype(jnp.int32), sample_valid=valid)
        f1_state = update_f1_state(f1_state, logits, masks, n_class=n_class,
                                   loss_str=cfg.loss_str, sample_valid=valid)
        return f1_state, loss, logits

    return step_fn
