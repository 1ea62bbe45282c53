"""The xView2 U-Net zoo: localization net + 8 dual-branch damage variants.

Flax/NHWC re-design of ``/root/reference/model/unet.py``.  Inputs are NHWC:
``(B, H, W, 3)`` for localization, ``(B, H, W, 6)`` (pre ++ post channels) for
damage.  Every module takes ``train: bool`` and returns either logits
``(B, H, W, n_class)`` or, in train mode with deep supervision, a list
``[out, ds4, ds3]`` (train-only DS heads, reference ``unet.py:193-196``).

Variant registry (reference ``unet.py:29-42``): siamese, siameseEnc, fused,
fusedEnc, parallel, parallelEnc, diff, cat.

Deliberate fixes of reference bugs (SURVEY.md §7.3), each flagged inline:
 * ParallelUNet reruns ``unet_pre`` on the pre image for both branches
   (``unet.py:443``); we run ``unet_post`` on the post image as intended.
 * FusedUNet/FusedEncUNet pass ``args.dec_interp`` into ``get_decoder``'s
   ``no_skip`` positional slot (``unet.py:349, 355, 404``); we wire
   ``dec_interp`` to its proper parameter.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from xview2_tpu.config import Config
from xview2_tpu.models.encoder import encoder_channels, make_encoder_stages
from xview2_tpu.models.layers import (ASPP, PPM, FusionBlock, OutputBlock,
                                      UpsampleBlock, concat_registered)

Array = jax.Array

DECODER_CHANNELS = (512, 256, 128, 64, 32)  # reference unet.py:90


def make_decoder_stages(encf, dilation, attention, no_skip, dec_interp, dtype,
                        packed_tail=True):
    """Build the 5 decoder UpsampleBlocks with dilation-aware truncation
    (reference ``unet.py:89-110``).  Returns ``[dec_l1..dec_l5]`` with leading
    ``None``s when dilation removes stages.

    ``packed_tail`` keeps the final (skipless) stage s2d-packed — the 512^2
    x32ch tail runs 2.2x faster with full TPU lanes (layers.py) — and requires
    the consuming head to use ``OutputBlock(packed_in=True)``.  Param trees
    are identical either way.
    """
    decf = DECODER_CHANNELS
    packed = packed_tail and not dec_interp

    def up(out_ch, skip_ch, last=False):
        return UpsampleBlock(out_ch, 0 if no_skip else skip_ch, attention=attention,
                             dec_interp=dec_interp, packed_out=packed and last,
                             dtype=dtype)

    if dilation == 1:
        return [up(decf[0], encf[-2]), up(decf[1], encf[-3]), up(decf[2], encf[-4]),
                up(decf[3], encf[-5]), up(decf[4], 0, last=True)]
    if dilation == 2:
        return [None, up(decf[1], encf[-3]), up(decf[2], encf[-4]),
                up(decf[3], encf[-5]), up(decf[4], 0, last=True)]
    if dilation == 4:
        return [None, None, up(decf[2], encf[-4]), up(decf[3], encf[-5]),
                up(decf[4], 0, last=True)]
    raise ValueError("Dilation can be set to 1, 2 or 4")


def _run_decoder(dec_layers, dilation, no_skip, encs, train):
    """Shared decoder chain (reference ``UNetTemplate.forward``, unet.py:148-170)."""
    enc1, enc2, enc3, enc4, enc5 = encs
    dec_l1, dec_l2, dec_l3, dec_l4, dec_l5 = dec_layers
    if no_skip:
        enc1 = enc2 = enc3 = enc4 = None
    if dilation == 1:
        dec1 = dec_l1(enc5, enc4, train)
        dec2 = dec_l2(dec1, enc3, train)
    elif dilation == 2:
        dec2 = dec_l2(enc5, enc3, train)
    else:  # dilation == 4
        dec3 = dec_l3(enc5, enc2, train)
        dec4 = dec_l4(dec3, enc1, train)
        dec5 = dec_l5(dec4, None, train)
        return dec5, dec4, dec3
    dec3 = dec_l3(dec2, enc2, train)
    dec4 = dec_l4(dec3, enc1, train)
    dec5 = dec_l5(dec4, None, train)
    return dec5, dec4, dec3



def _tail_packed(cfg: Config) -> bool:
    """dec_l5 is s2d-packed unless the decoder is absent (--interpolate) or
    uses the interpolation upsample path (--dec_interp)."""
    return not cfg.interpolate and not cfg.dec_interp


def emits_packed_loss_view(cfg: Config) -> bool:
    """True when ``build_model(cfg)``'s TRAIN-mode main logits come out in the
    packed loss view (B, H/2, 2W, n) instead of the fine grid (see
    ``layers.OutputBlock(emit_loss_view=True)``).  Mirrors each variant's
    ``packed`` head wiring; the loss consumer pairs it with
    ``ops.losses.packed_loss_view_labels``."""
    if cfg.type == "pre":
        return _tail_packed(cfg)
    if cfg.dmg_model in ("fused", "fusedEnc"):
        return not cfg.dec_interp
    return _tail_packed(cfg)


def fused_head_defer_ok(cfg: Config) -> bool:
    """True when the fused packed chain (``--fused_tail``) may defer dec5's
    final BN fold into the packed head (``fused_tail_scope(defer_head=True)``).

    The head must receive dec5 either unchanged (single-branch variants) or
    as a branch concat whose folds ``layers.concat_registered`` propagates
    (siamese/parallel, and ``fused`` whose cross-fusion FusionBlock emits
    deferred folds for both group-conv outputs)."""
    return _tail_packed(cfg)


class UNetTemplate(nn.Module):
    """Shared encoder + optional PPM/ASPP bottleneck + decoder
    (reference ``unet.py:113-172``).  Returns ``(dec5, dec4, dec3)``, or
    ``(enc5, None, None)`` under ``--interpolate``."""

    cfg: Config

    def setup(self):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        chans, stages = make_encoder_stages(cfg.encoder, cfg.dilation, dtype)
        self.enc_l1, self.enc_l2, self.enc_l3, self.enc_l4, self.enc_l5 = stages
        if cfg.ppm:
            self.ppm = PPM(dtype=dtype)
        elif cfg.aspp:
            self.aspp = ASPP(dilation=cfg.dilation, dtype=dtype)
        if not cfg.interpolate:
            self.dec_layers = make_decoder_stages(
                chans, cfg.dilation, cfg.attention, cfg.no_skip, cfg.dec_interp, dtype)

    def __call__(self, data: Array, train: bool = False):
        cfg = self.cfg
        enc1 = self.enc_l1(data, train)
        enc2 = self.enc_l2(enc1, train)
        enc3 = self.enc_l3(enc2, train)
        enc4 = self.enc_l4(enc3, train)
        enc5 = self.enc_l5(enc4, train)
        if cfg.ppm:
            enc5 = self.ppm(enc5, train)
        elif cfg.aspp:
            enc5 = self.aspp(enc5, train)
        if cfg.interpolate:
            return enc5, None, None
        return _run_decoder(self.dec_layers, cfg.dilation, cfg.no_skip,
                            (enc1, enc2, enc3, enc4, enc5), train)


class OutputTemplate(nn.Module):
    """Final head + train-only deep-supervision heads (reference unet.py:175-197).

    ``packed``/``packed_groups``: the main head consumes the s2d-packed
    decoder tail (DS heads see the unpacked dec4/dec3 and are unaffected).
    """

    n_class: int
    deep_supervision: bool
    interpolate: bool = False
    packed: bool = False
    packed_groups: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        ds = self.deep_supervision and not self.interpolate
        self.ds_active = ds
        if ds:
            self.output_block_ds3 = OutputBlock(self.n_class, dtype=self.dtype)
            self.output_block_ds4 = OutputBlock(self.n_class, dtype=self.dtype)
        self.output_block = OutputBlock(self.n_class, interpolate=self.interpolate,
                                        packed_in=self.packed and not self.interpolate,
                                        packed_groups=self.packed_groups,
                                        emit_loss_view=self.packed and not self.interpolate,
                                        dtype=self.dtype)

    def __call__(self, dec5, dec4, dec3, train: bool = False):
        out = self.output_block(dec5, train)
        if train and self.ds_active:
            return [out, self.output_block_ds4(dec4, train), self.output_block_ds3(dec3, train)]
        return out


class UNetLoc(nn.Module):
    """Localization U-Net (reference unet.py:200-215)."""

    cfg: Config
    n_class: int = 2

    def setup(self):
        self.unet = UNetTemplate(self.cfg)
        self.output_block = OutputTemplate(self.n_class, self.cfg.deep_supervision,
                                           self.cfg.interpolate,
                                           packed=_tail_packed(self.cfg),
                                           dtype=self.cfg.compute_dtype)

    def __call__(self, data: Array, train: bool = False):
        dec5, dec4, dec3 = self.unet(data, train)
        return self.output_block(dec5, dec4, dec3, train)


def _split_pair(data: Array) -> Tuple[Array, Array]:
    return data[..., :3], data[..., 3:]


def _concat(x: Optional[Array], y: Optional[Array]) -> Optional[Array]:
    if x is None or y is None:
        return None
    return concat_registered(x, y)


class SiameseUNet(nn.Module):
    """True siamese: one shared UNetTemplate on pre and post, per-scale concat,
    doubled head channels (reference unet.py:218-236)."""

    cfg: Config
    n_class: int = 4

    def setup(self):
        self.unet = UNetTemplate(self.cfg)
        self.output_block = OutputTemplate(self.n_class, self.cfg.deep_supervision,
                                           self.cfg.interpolate,
                                           packed=_tail_packed(self.cfg), packed_groups=2,
                                           dtype=self.cfg.compute_dtype)

    def __call__(self, data: Array, train: bool = False):
        pre, post = _split_pair(data)
        p5, p4, p3 = self.unet(pre, train)
        q5, q4, q3 = self.unet(post, train)
        return self.output_block(_concat(p5, q5), _concat(p4, q4), _concat(p3, q3), train)


class SiameseEncUNet(nn.Module):
    """Shared encoder, concat per encoder scale, single decoder over doubled
    channels (reference unet.py:239-317)."""

    cfg: Config
    n_class: int = 4

    def setup(self):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        chans, stages = make_encoder_stages(cfg.encoder, cfg.dilation, dtype)
        self.enc_l1, self.enc_l2, self.enc_l3, self.enc_l4, self.enc_l5 = stages
        if cfg.ppm:
            self.ppm = PPM(dtype=dtype)
        elif cfg.aspp:
            self.aspp = ASPP(dilation=cfg.dilation, dtype=dtype)
        doubled = [2 * c for c in chans]
        # packed_tail must track the head's packed flag: under --interpolate
        # (ignored by this variant's decoder otherwise) the fine head applies,
        # so the tail must stay fine-grid too
        self.dec_layers = make_decoder_stages(
            doubled, cfg.dilation, cfg.attention, cfg.no_skip, cfg.dec_interp, dtype,
            packed_tail=_tail_packed(cfg))
        # n_class already reflects the loss head rule (Config.n_class: mse -> 1,
        # coral -> 3); get_dmg_unet passes it in — no duplicated derivation here.
        self.output_block = OutputTemplate(self.n_class, cfg.deep_supervision,
                                           packed=_tail_packed(cfg), dtype=dtype)

    def _encode(self, data, train):
        enc1 = self.enc_l1(data, train)
        enc2 = self.enc_l2(enc1, train)
        enc3 = self.enc_l3(enc2, train)
        enc4 = self.enc_l4(enc3, train)
        enc5 = self.enc_l5(enc4, train)
        if self.cfg.ppm:
            enc5 = self.ppm(enc5, train)
        elif self.cfg.aspp:
            enc5 = self.aspp(enc5, train)
        return enc1, enc2, enc3, enc4, enc5

    def __call__(self, data: Array, train: bool = False):
        pre, post = _split_pair(data)
        pre_encs = self._encode(pre, train)
        post_encs = self._encode(post, train)
        encs = tuple(_concat(a, b) for a, b in zip(pre_encs, post_encs))
        dec5, dec4, dec3 = _run_decoder(self.dec_layers, self.cfg.dilation,
                                        self.cfg.no_skip, encs, train)
        return self.output_block(dec5, dec4, dec3, train)


class FusedUNet(nn.Module):
    """Two encoders + two decoders with cross-branch fusion at every stage
    (reference unet.py:320-376).  Dilation is forced to 1.

    NB the reference passes ``args.dec_interp`` into ``get_decoder``'s
    ``no_skip`` slot (unet.py:349-356); here ``dec_interp`` selects the
    interpolation upsample path as intended.
    """

    cfg: Config
    n_class: int = 4

    def setup(self):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        chans, pre_stages = make_encoder_stages(cfg.encoder, 1, dtype)
        _, post_stages = make_encoder_stages(cfg.encoder, 1, dtype)
        self.enc_fusion = [
            FusionBlock(pre_layer=pre_stages[i], post_layer=post_stages[i],
                        features=chans[i], dtype=dtype)
            for i in range(5)
        ]
        packed = not cfg.dec_interp
        pre_dec = make_decoder_stages(chans, 1, cfg.attention, False, cfg.dec_interp,
                                      dtype, packed_tail=packed)
        post_dec = make_decoder_stages(chans, 1, cfg.attention, False, cfg.dec_interp,
                                       dtype, packed_tail=packed)
        decf = DECODER_CHANNELS
        self.dec_fusion = [
            FusionBlock(pre_layer=pre_dec[i], post_layer=post_dec[i],
                        features=decf[i], decoder_mode=True,
                        packed_last=packed and i == 4, dtype=dtype)
            for i in range(5)
        ]
        # the cross-fused last stage emits two packed branches; the head
        # consumes their concat exactly like siamese (packed_groups=2)
        self.output_block = OutputTemplate(self.n_class, cfg.deep_supervision,
                                           packed=packed, packed_groups=2,
                                           dtype=dtype)

    def __call__(self, data: Array, train: bool = False):
        pre, post = _split_pair(data)
        e_pre, e_post = [], []
        for fb in self.enc_fusion:
            pre, post = fb(pre, post, train=train)
            e_pre.append(pre)
            e_post.append(post)
        d_pre, d_post = e_pre[4], e_post[4]
        decs = []
        for i, fb in enumerate(self.dec_fusion):
            if i < 4:
                d_pre, d_post = fb(d_pre, d_post, e_pre[3 - i], e_post[3 - i], train=train)
            else:
                d_pre, d_post = fb(d_pre, d_post, last_dec=True, train=train)
            decs.append((d_pre, d_post))
        dec5 = _concat(*decs[4])
        dec4 = _concat(*decs[3])
        dec3 = _concat(*decs[2])
        return self.output_block(dec5, dec4, dec3, train)


class FusedEncUNet(nn.Module):
    """Fused encoders, single decoder on the post branch (reference
    unet.py:379-424)."""

    cfg: Config
    n_class: int = 4

    def setup(self):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        chans, pre_stages = make_encoder_stages(cfg.encoder, 1, dtype)
        _, post_stages = make_encoder_stages(cfg.encoder, 1, dtype)
        self.enc_fusion = [
            FusionBlock(pre_layer=pre_stages[i], post_layer=post_stages[i],
                        features=chans[i], dtype=dtype)
            for i in range(5)
        ]
        self.dec_layers = make_decoder_stages(chans, 1, cfg.attention, False,
                                              cfg.dec_interp, dtype)
        self.output_block = OutputTemplate(self.n_class, cfg.deep_supervision,
                                           packed=not cfg.dec_interp, dtype=dtype)

    def __call__(self, data: Array, train: bool = False):
        pre, post = _split_pair(data)
        e_post = []
        for fb in self.enc_fusion:
            pre, post = fb(pre, post, train=train)
            e_post.append(post)
        dec5, dec4, dec3 = _run_decoder(self.dec_layers, 1, False,
                                        tuple(e_post), train)
        return self.output_block(dec5, dec4, dec3, train)


class ParallelUNet(nn.Module):
    """Two independent UNetTemplates, per-scale concat (reference
    unet.py:427-446).  The reference's forward reruns ``unet_pre`` on the pre
    image for both branches (unet.py:443, ``unet_post`` dead); we apply
    ``unet_post`` to the post image as intended — flagged for parity runs."""

    cfg: Config
    n_class: int = 4

    def setup(self):
        self.unet_pre = UNetTemplate(self.cfg)
        self.unet_post = UNetTemplate(self.cfg)
        self.output_block = OutputTemplate(self.n_class, self.cfg.deep_supervision,
                                           self.cfg.interpolate,
                                           packed=_tail_packed(self.cfg), packed_groups=2,
                                           dtype=self.cfg.compute_dtype)

    def __call__(self, data: Array, train: bool = False):
        pre, post = _split_pair(data)
        p5, p4, p3 = self.unet_pre(pre, train)
        q5, q4, q3 = self.unet_post(post, train)
        return self.output_block(_concat(p5, q5), _concat(p4, q4), _concat(p3, q3), train)


class ParallelEncUNet(nn.Module):
    """Two independent encoders (+ per-branch PPM/ASPP), concat per scale,
    shared decoder (reference unet.py:449-539)."""

    cfg: Config
    n_class: int = 4

    def setup(self):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        chans, pre_stages = make_encoder_stages(cfg.encoder, cfg.dilation, dtype)
        _, post_stages = make_encoder_stages(cfg.encoder, cfg.dilation, dtype)
        self.enc_pre = pre_stages
        self.enc_post = post_stages
        if cfg.ppm:
            self.ppm_pre = PPM(dtype=dtype)
            self.ppm_post = PPM(dtype=dtype)
        elif cfg.aspp:
            self.aspp_pre = ASPP(dilation=cfg.dilation, dtype=dtype)
            self.aspp_post = ASPP(dilation=cfg.dilation, dtype=dtype)
        doubled = [2 * c for c in chans]
        if not cfg.interpolate:
            self.dec_layers = make_decoder_stages(
                doubled, cfg.dilation, cfg.attention, cfg.no_skip, cfg.dec_interp, dtype)
        self.output_block = OutputTemplate(self.n_class, cfg.deep_supervision,
                                           cfg.interpolate,
                                           packed=_tail_packed(cfg), dtype=dtype)

    def _encode(self, stages, data, train):
        feats = []
        x = data
        for stage in stages:
            x = stage(x, train)
            feats.append(x)
        return feats

    def __call__(self, data: Array, train: bool = False):
        cfg = self.cfg
        pre, post = _split_pair(data)
        pre_encs = self._encode(self.enc_pre, pre, train)
        post_encs = self._encode(self.enc_post, post, train)
        if cfg.ppm:
            pre_encs[4] = self.ppm_pre(pre_encs[4], train)
            post_encs[4] = self.ppm_post(post_encs[4], train)
        elif cfg.aspp:
            pre_encs[4] = self.aspp_pre(pre_encs[4], train)
            post_encs[4] = self.aspp_post(post_encs[4], train)
        if cfg.interpolate:
            return self.output_block(_concat(pre_encs[4], post_encs[4]), None, None, train)
        encs = tuple(_concat(a, b) for a, b in zip(pre_encs, post_encs))
        dec5, dec4, dec3 = _run_decoder(self.dec_layers, cfg.dilation, cfg.no_skip,
                                        encs, train)
        return self.output_block(dec5, dec4, dec3, train)


class DiffUNet(nn.Module):
    """UNetLoc on the pre-post channel difference (reference unet.py:542-550)."""

    cfg: Config
    n_class: int = 4

    def setup(self):
        self.unet = UNetLoc(self.cfg, self.n_class)

    def __call__(self, data: Array, train: bool = False):
        pre, post = _split_pair(data)
        return self.unet(pre - post, train)


class CatUNet(nn.Module):
    """UNetLoc on 6 stacked channels (reference unet.py:553-560)."""

    cfg: Config
    n_class: int = 4

    def setup(self):
        self.unet = UNetLoc(self.cfg, self.n_class)

    def __call__(self, data: Array, train: bool = False):
        return self.unet(data, train)


DMG_UNETS = {
    "siamese": SiameseUNet,
    "siameseEnc": SiameseEncUNet,
    "fused": FusedUNet,
    "fusedEnc": FusedEncUNet,
    "parallel": ParallelUNet,
    "parallelEnc": ParallelEncUNet,
    "diff": DiffUNet,
    "cat": CatUNet,
}


def get_dmg_unet(cfg: Config) -> nn.Module:
    """Damage-variant factory (reference unet.py:29-42) with ``n_class`` from
    the loss head rule (unet.py:21-26)."""
    return DMG_UNETS[cfg.dmg_model](cfg, cfg.n_class)


def build_model(cfg: Config) -> nn.Module:
    """Task-level model factory (reference plt.py:26)."""
    if cfg.type == "pre":
        return UNetLoc(cfg)
    return get_dmg_unet(cfg)
