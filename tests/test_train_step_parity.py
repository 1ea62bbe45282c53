"""Training-NUMERICS torch parity: gradients and one optimizer update.

The forward-only oracles (``test_full_net_parity``) cannot catch backward
or optimizer drift — a wrong BN backward, a loss-reduction mismatch, or an
optimizer semantics bug would train to a different model while every forward
test stays green.  Here the SAME weights and the SAME batch run through

* torch autograd on the reference-equation UNetLoc + focal+dice
  (reference train step, ``/root/reference/model/plt.py:50-54``), and
* ``jax.value_and_grad`` over the framework's train-mode forward + loss
  (the gradient core of ``parallel/steps.make_train_step``, minus the
  augmentation — the crop is fed directly, as the reference's DataLoader
  feeds its augmented crop),

and the full gradient pytrees are compared leaf-for-leaf.  A second test
pins optimizer-update numerics (adamw default + sgd; reference
``plt.py:150-160``) on identical synthetic gradients, isolating optimizer
semantics from gradient noise.  Together they cover the whole training
numerics chain: forward (existing tests) -> grads (here) -> update (here).

The gradient comparison runs in float64 on BOTH sides (torch ``.double()``;
Config precision=64 + jax x64 mode).  In fp32 the comparison is blind: deep
leaves' gradients cancel to ~1e-6 from O(1) intermediates, and measured
fp32-vs-fp64 noise reaches 37% of leaf scale *within torch itself*
(.scratch/grad_parity_dbg.py) — any tolerance wide enough to absorb that
would also hide real wiring bugs.  In f64 the noise floor drops ~1e8x while
a structural bug stays O(1), so tight tolerances become meaningful.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch
import torch.nn.functional as tF

from tests.test_full_net_parity import TUNetLoc, convert_full

from xview2_tpu.config import Config
from xview2_tpu.models.unet import UNetLoc, emits_packed_loss_view
from xview2_tpu.ops.losses import make_loss_fn, packed_loss_view_labels
from xview2_tpu.train.optimizers import build_optimizer

pytestmark = pytest.mark.slow  # whole-net/oracle tier; quick gate = -m 'not slow'



def torch_focal_dice_pre(logits: torch.Tensor, labels: torch.Tensor) -> torch.Tensor:
    """Differentiable torch focal(gamma=2) + dice for the 2-class pre task.

    monai 0.4.0 semantics (reference ``model/loss.py:7-21``): dice softmax +
    one-hot-y + batch=True with background EXCLUDED for 2 channels; focal is
    the global pixel mean of the focal NLL divided by the class count.
    """
    c = logits.shape[1]
    probs = torch.softmax(logits, 1)
    onehot = tF.one_hot(labels, c).permute(0, 3, 1, 2).float()
    p, o = probs[:, 1:], onehot[:, 1:]  # background excluded (2-channel)
    inter = (p * o).sum(dim=(0, 2, 3))
    denom = p.sum(dim=(0, 2, 3)) + o.sum(dim=(0, 2, 3))
    dice = (1.0 - (2.0 * inter + 1e-5) / (denom + 1e-5)).mean()

    logp = torch.log_softmax(logits, 1)
    logpt = logp.gather(1, labels.unsqueeze(1)).squeeze(1)
    pt = logpt.exp()
    focal = (-((1.0 - pt) ** 2.0) * logpt).mean() / c
    return focal + dice


def _grads_as_tree(t: TUNetLoc, dilation: int):
    """Convert torch .grad tensors into the jax param-tree layout by
    temporarily swapping each param's data for its grad and reusing the
    value converter (grads transform exactly like their params)."""
    saved = [p.data for p in t.parameters()]
    try:
        with torch.no_grad():
            for p in t.parameters():
                p.data = p.grad.clone()
        grads, _ = convert_full(t, dilation)
    finally:
        with torch.no_grad():
            for p, s in zip(t.parameters(), saved):
                p.data = s
    return grads


def test_train_gradients_match_torch():
    # seed INSIDE the test: module-level seeding is not hermetic under the
    # full suite (other modules consume torch randomness before this runs)
    torch.manual_seed(11)
    t = TUNetLoc(dilation=1).double().train()
    x = torch.randn(2, 3, 64, 64, dtype=torch.float64)
    y = (torch.rand(2, 64, 64) > 0.7).long()

    loss_t = torch_focal_dice_pre(t(x), y)
    loss_t.backward()
    want = _grads_as_tree(t, 1)

    with jax.enable_x64():
        cfg = Config(type="pre", encoder="resnet50", precision=64,
                     loss_str="focal+dice")
        model = UNetLoc(cfg)
        params, stats = convert_full(t, 1)
        params = jax.tree.map(jnp.asarray, params)
        stats = jax.tree.map(jnp.asarray, stats)
        loss_fn = make_loss_fn("focal+dice", "pre")
        packed = emits_packed_loss_view(cfg)

        xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
        yj = jnp.asarray(y.numpy().astype(np.int32))
        y_main = packed_loss_view_labels(yj) if packed else yj

        def forward_loss(p):
            outs, _ = model.apply({"params": p, "batch_stats": stats},
                                  xj, True, mutable=["batch_stats"])
            return loss_fn(outs, y_main)

        loss_j, grads = jax.jit(jax.value_and_grad(forward_loss))(params)

        # residual ~2-4e-8 rel: f64 reassociation amplified through ~50 layers
        # of BN-conditioned reductions (fp32 would differ at ~1e-4 here)
        assert float(loss_j) == pytest.approx(float(loss_t.item()), rel=2e-7)

        flat_w = {jax.tree_util.keystr(p): np.asarray(l)
                  for p, l in jax.tree_util.tree_leaves_with_path(want)}
        flat_g = {jax.tree_util.keystr(p): np.asarray(l)
                  for p, l in jax.tree_util.tree_leaves_with_path(grads)}
    assert set(flat_w) == set(flat_g)
    for key, gw in flat_w.items():
        gj = flat_g[key]
        assert gj.dtype == np.float64, key
        # worst observed f64 torch-vs-jax deviation: ~4e-7 of leaf scale
        # (reassociation amplified through ~50 BN-conditioned reductions);
        # a structural bug is O(1) of it, so 1e-5 keeps ~5 orders of margin
        # while sitting ~1e2 below what fp32 noise would force (~4e-1).
        scale = max(np.abs(gw).max(), 1e-12)
        np.testing.assert_allclose(
            gj, gw, atol=1e-5 * scale, rtol=1e-5,
            err_msg=f"gradient mismatch at {key}")


@pytest.mark.parametrize("name", ["adamw", "sgd"])
def test_optimizer_update_matches_torch(name):
    """optax update == torch optimizer step on identical grads (3 steps).

    Isolates optimizer numerics from gradient noise; with the gradient test
    above this closes the chain grads -> update.  adamw: decoupled weight
    decay (torch.optim.AdamW); sgd: momentum 0.9, no nesterov/dampening
    (reference ``plt.py:152-159`` defaults).
    """
    rng = np.random.default_rng(5)
    shapes = [(3, 3, 8, 16), (16,), (1, 1, 16, 2)]
    values = [rng.normal(size=s).astype(np.float32) for s in shapes]
    grad_seq = [[rng.normal(size=s).astype(np.float32) for s in shapes]
                for _ in range(3)]

    tparams = [torch.nn.Parameter(torch.tensor(v)) for v in values]
    if name == "adamw":
        topt = torch.optim.AdamW(tparams, lr=3e-4, betas=(0.9, 0.999),
                                 eps=1e-8, weight_decay=1e-2)
        cfg = Config(type="pre", optimizer="adamw", lr=3e-4, weight_decay=1e-2)
    else:
        topt = torch.optim.SGD(tparams, lr=3e-4, momentum=0.9)
        cfg = Config(type="pre", optimizer="sgd", lr=3e-4, momentum=0.9)

    tx = build_optimizer(cfg, cfg.lr)
    jparams = {f"p{i}": jnp.asarray(v) for i, v in enumerate(values)}
    opt_state = tx.init(jparams)

    for grads in grad_seq:
        topt.zero_grad()
        for p, g in zip(tparams, grads):
            p.grad = torch.tensor(g)
        topt.step()

        jgrads = {f"p{i}": jnp.asarray(g) for i, g in enumerate(grads)}
        updates, opt_state = tx.update(jgrads, opt_state, jparams)
        jparams = optax.apply_updates(jparams, updates)

    for i, p in enumerate(tparams):
        np.testing.assert_allclose(np.asarray(jparams[f"p{i}"]),
                                   p.detach().numpy(), rtol=1e-5, atol=1e-7,
                                   err_msg=f"{name} param {i} diverged")


# ---------------------------------------------------------------------------
# damage-task (siamese) gradient parity: post loss masking + two-branch head
# ---------------------------------------------------------------------------

def torch_focal_dice_post(logits: torch.Tensor, labels: torch.Tensor) -> torch.Tensor:
    """Differentiable torch focal+dice for the 4-class post task, replicating
    ops/losses.make_loss_fn("focal+dice", "post"): supervision restricted to
    building pixels (y > 0, != 255), labels shifted down by one; dice is
    4-channel (background NOT excluded — only the 2-channel head excludes it),
    masked monai batch=True sums; focal is the masked pixel mean / n_class."""
    w = ((labels > 0) & (labels != 255)).double()
    # clamp 255's shift into one-hot range; those pixels are w-masked anyway
    # (ours one-hots clip(labels-1, 0, 3) identically, ops/losses.py)
    shifted = (labels - 1).clamp(min=0, max=3)
    probs = torch.softmax(logits, 1)
    onehot = tF.one_hot(shifted, 4).permute(0, 3, 1, 2).to(logits.dtype)
    wc = w.unsqueeze(1)
    inter = (wc * probs * onehot).sum(dim=(0, 2, 3))
    denom = (wc * probs).sum(dim=(0, 2, 3)) + (wc * onehot).sum(dim=(0, 2, 3))
    dice = (1.0 - (2.0 * inter + 1e-5) / (denom + 1e-5)).mean()

    logp = torch.log_softmax(logits, 1)
    logpt = logp.gather(1, shifted.unsqueeze(1)).squeeze(1)
    pt = logpt.exp()
    focal = ((-((1.0 - pt) ** 2.0) * logpt) * w).sum() / w.sum().clamp(min=1.0) / 4.0
    return focal + dice


class TSiamese(torch.nn.Module):
    """Reference SiameseUNet equations (unet.py:218-236): ONE shared
    UNetTemplate on pre and post, head over the dec5 concat."""

    def __init__(self):
        super().__init__()
        self.t = TUNetLoc(dilation=1)  # its own 1x1 head goes unused
        self.head = torch.nn.Conv2d(64, 4, 1, bias=True)

    def _dec5(self, x):
        t = self.t
        e1 = tF.relu(t.enc.bn1(t.enc.conv1(x)))
        e2 = t.enc.layer1(t.enc.maxpool(e1))
        e3 = t.enc.layer2(e2)
        e4 = t.enc.layer3(e3)
        e5 = t.enc.layer4(e4)
        u = t.ups
        d = u["d2"](u["d1"](e5, e4), e3)
        d = u["d3"](d, e2)
        d = u["d4"](d, e1)
        return u["d5"](d)

    def forward(self, x):
        return self.head(torch.cat([self._dec5(x[:, :3]), self._dec5(x[:, 3:])], 1))


def test_siamese_damage_train_gradients_match_torch():
    """Training-numerics parity for the DAMAGE task: shared-template siamese
    forward, two-branch packed head, and the masked post-task focal+dice —
    the gradient chain of the actual competition configuration
    (reference plt.py:50-54 with SiameseUNet + get_loss('post'))."""
    torch.manual_seed(23)
    t = TSiamese().double().train()
    x = torch.randn(2, 6, 64, 64, dtype=torch.float64)
    y = (torch.rand(2, 64, 64) * 5.6).long().clamp(max=5)
    y[y == 5] = 255  # some un-classified pixels exercise the 255 mask

    loss_t = torch_focal_dice_post(t(x), y)
    loss_t.backward()

    # grads -> jax layout via the value converters (swap data for grads)
    saved = [p.data for p in t.parameters()]
    try:
        with torch.no_grad():
            for p in t.parameters():
                p.data = (p.grad if p.grad is not None else torch.zeros_like(p)).clone()
        full, _ = convert_full(t.t, 1)
        want = {"unet": full["unet"],
                "output_block": {"output_block": {"conv": {
                    "kernel": np.transpose(t.head.weight.detach().numpy(), (2, 3, 1, 0)),
                    "bias": t.head.bias.detach().numpy()}}}}
    finally:
        with torch.no_grad():
            for p, s in zip(t.parameters(), saved):
                p.data = s

    from xview2_tpu.models.unet import SiameseUNet

    with jax.enable_x64():
        cfg = Config(type="post", dmg_model="siamese", encoder="resnet50",
                     precision=64, loss_str="focal+dice")
        model = SiameseUNet(cfg)
        full_v, stats = convert_full(t.t, 1)
        params = {"unet": jax.tree.map(jnp.asarray, full_v["unet"]),
                  "output_block": {"output_block": {"conv": {
                      "kernel": jnp.asarray(np.transpose(
                          t.head.weight.detach().numpy(), (2, 3, 1, 0))),
                      "bias": jnp.asarray(t.head.bias.detach().numpy())}}}}
        bstats = {"unet": jax.tree.map(jnp.asarray, stats["unet"])}
        loss_fn = make_loss_fn("focal+dice", "post")
        assert emits_packed_loss_view(cfg)

        xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
        yj = jnp.asarray(y.numpy().astype(np.int32))
        y_main = packed_loss_view_labels(yj)

        def forward_loss(p):
            outs, _ = model.apply({"params": p, "batch_stats": bstats},
                                  xj, True, mutable=["batch_stats"])
            return loss_fn(outs, y_main)

        loss_j, grads = jax.jit(jax.value_and_grad(forward_loss))(params)
        assert float(loss_j) == pytest.approx(float(loss_t.item()), rel=2e-7)

        flat_w = {jax.tree_util.keystr(p): np.asarray(l)
                  for p, l in jax.tree_util.tree_leaves_with_path(want)}
        flat_g = {jax.tree_util.keystr(p): np.asarray(l)
                  for p, l in jax.tree_util.tree_leaves_with_path(grads)}
    assert set(flat_w) == set(flat_g)
    for key, gw in flat_w.items():
        gj = flat_g[key]
        scale = max(np.abs(gw).max(), 1e-12)
        np.testing.assert_allclose(
            gj, gw, atol=1e-5 * scale, rtol=1e-5,
            err_msg=f"gradient mismatch at {key}")
