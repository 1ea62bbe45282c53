"""Localization -> damage encoder transplant as pytree surgery.

Reference behavior: ``main.py:76-94`` copies every ``"enc"``-named tensor from
a localization checkpoint into the damage model, with variant-specific key
remapping.  Here the remap cases are expressed structurally on the param /
batch-stats pytrees.  Reference bugs fixed deliberately (SURVEY.md §7.3.5 and
§3.5):

* the ``parallel`` case wrote via ``model.state_dict()[keys]`` (a dict indexed
  by the whole OrderedDict — crash); intent was to fill *both* branches;
* ``diff``/``cat``/``fused*``/``parallelEnc`` same-name copies silently missed
  because the reference key strings differ; we place the encoder subtree where
  each variant actually keeps it;
* ``cat`` has a 6-channel stem conv — mismatching-shape leaves are skipped
  (the reference patched conv1 to 6 channels at construction, so its weights
  were fresh anyway; ``unet.py:66-78``).

The same mapping is applied to both ``params`` and ``batch_stats`` (the torch
state_dict carried BN running stats under the same names).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)

ENC_KEYS = ("enc_l1", "enc_l2", "enc_l3", "enc_l4", "enc_l5")


def _loc_encoder_subtrees(loc_tree: Dict[str, Any]) -> Dict[str, Any]:
    """Extract ``{enc_l*: subtree}`` from a UNetLoc collection tree."""
    unet = loc_tree.get("unet", {})
    return {k: unet[k] for k in ENC_KEYS if k in unet}


def _copy_matching(dst, src, path=""):
    """Structurally copy src into dst, skipping mismatching-shape leaves."""
    if isinstance(dst, dict) and isinstance(src, dict):
        out = dict(dst)
        for k in dst:
            if k in src:
                out[k] = _copy_matching(dst[k], src[k], f"{path}/{k}")
        return out
    if hasattr(dst, "shape") and hasattr(src, "shape"):
        if tuple(dst.shape) == tuple(src.shape):
            return jnp.asarray(src, dtype=dst.dtype)
        log.warning("transplant: shape mismatch at %s (%s vs %s), keeping target",
                    path, tuple(dst.shape), tuple(src.shape))
        return dst
    return dst


def transplant_collection(dmg_model: str, dst_tree: Dict[str, Any],
                          loc_tree: Dict[str, Any]) -> Dict[str, Any]:
    """Place the localization encoder into one collection of a damage model."""
    enc = _loc_encoder_subtrees(loc_tree)
    if not enc:
        return dst_tree
    dst = jax.tree.map(lambda x: x, dst_tree)  # shallow-ish copy via rebuild
    dst = dict(dst)

    def into(container_path: List[str]):
        """Copy enc_l* into the dict at container_path (relative to dst)."""
        node = dst
        for i, key in enumerate(container_path):
            if key not in node:
                return
            node[key] = dict(node[key])
            node = node[key]
        for k, sub in enc.items():
            if k in node:
                node[k] = _copy_matching(node[k], sub, f"{'/'.join(container_path)}/{k}")

    if dmg_model in ("siamese",):
        into(["unet"])
    elif dmg_model == "siameseEnc":
        for k, sub in enc.items():
            if k in dst:
                dst[k] = _copy_matching(dst[k], sub, k)
    elif dmg_model == "parallel":
        into(["unet_pre"])
        into(["unet_post"])
    elif dmg_model == "parallelEnc":
        for i, k in enumerate(ENC_KEYS):
            for branch in ("enc_pre", "enc_post"):
                name = f"{branch}_{i}"
                if name in dst and k in enc:
                    dst[name] = _copy_matching(dst[name], enc[k], name)
    elif dmg_model in ("fused", "fusedEnc"):
        for i, k in enumerate(ENC_KEYS):
            name = f"enc_fusion_{i}"
            if name in dst and k in enc:
                fb = dict(dst[name])
                for branch in ("pre_layer", "post_layer"):
                    if branch in fb:
                        fb[branch] = _copy_matching(fb[branch], enc[k], f"{name}/{branch}")
                dst[name] = fb
    elif dmg_model in ("diff", "cat"):
        into(["unet", "unet"])
    else:
        raise ValueError(f"unknown dmg_model {dmg_model!r}")
    return dst


def transplant_encoder(dmg_model: str, dst_params, dst_stats,
                       loc_params, loc_stats) -> Tuple[Any, Any]:
    """Apply the transplant to params and batch_stats collections."""
    new_params = transplant_collection(dmg_model, dst_params, loc_params)
    new_stats = transplant_collection(dmg_model, dst_stats, loc_stats) \
        if dst_stats and loc_stats else dst_stats
    return new_params, new_stats
