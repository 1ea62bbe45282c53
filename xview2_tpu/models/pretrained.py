"""Load converted pretrained encoder weights into a model's pytree.

Counterpart of ``tools/convert_weights.py``: reads the ``.npz`` produced from
torchvision/ResNeSt ``.pth`` files and grafts the encoder subtrees
(``enc_l1..enc_l5``) into freshly initialized model variables, skipping
mismatching-shape leaves (e.g. the 6-channel ``cat`` stem).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from xview2_tpu.parallel.transplant import ENC_KEYS, _copy_matching


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def load_encoder_npz(path: str) -> Tuple[Dict, Dict]:
    """Returns (params_tree, batch_stats_tree) with enc_l1..enc_l5 roots."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    tree = _unflatten(flat)
    return tree.get("params", {}), tree.get("batch_stats", {})


def apply_pretrained_encoder(variables: Dict[str, Any], npz_path: str,
                             unet_path: Tuple[str, ...] = ("unet",)) -> Dict[str, Any]:
    """Graft pretrained encoder weights into ``variables`` (init output).

    ``unet_path``: tree path from each collection root to the dict holding
    ``enc_l*`` (e.g. ``("unet",)`` for UNetLoc/SiameseUNet, ``()`` for
    SiameseEncUNet).
    """
    pre_params, pre_stats = load_encoder_npz(npz_path)
    out = dict(variables)
    for coll, pre in (("params", pre_params), ("batch_stats", pre_stats)):
        if coll not in out or not pre:
            continue
        tree = dict(out[coll])
        node = tree
        parents = []
        for p in unet_path:
            if p not in node:
                node = None
                break
            node[p] = dict(node[p])
            parents.append((node, p))
            node = node[p]
        if node is None:
            continue
        for k in ENC_KEYS:
            if k in node and k in pre:
                node[k] = _copy_matching(node[k], pre[k], k)
        out[coll] = tree
    return out
