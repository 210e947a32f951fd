"""Warm-start the TPU-native flagship encoder from reference-exact weights.

The `tpu_optimized` recipe is NOT checkpoint-compatible with the reference
(space-to-depth front end replaces stem+stages 1-2; deep-stage widths are
remapped to 128-multiples — models/efficientnet.py). But its deep stages keep
the reference topology and block NAMES, so a reference-exact checkpoint
(either trained here or imported from the public `.tar`s via
`convert/torch_import.py`) can seed most of the flagship's parameters instead
of training from scratch:

* text tower, projection heads, logit_scale: copied verbatim (identical);
* deep image blocks (`block_{i}` for i >= the front's skip): every tensor is
  copied on the OVERLAPPING channel slab — e.g. a (1,1,64,384) expand kernel
  seeds the first [64, :384] rows of the flagship's (1,1,128,384); widths that
  shrank (176->128) are truncated. Non-overlapping channels keep their fresh
  initialization;
* the s2d front (`tpu_stem_*`, `tpu_front_block_*`) has no reference
  analogue and keeps its fresh init.

This is a warm START, not a function-preserving conversion — truncated /
fresh channels change the network output; finetuning is expected. Reference
analogue: the pretrained-backbone bootstrap every downstream path of the
reference relies on (Classifiers/experiments.py loading chk_pt encoders).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _embed_slab(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Copy src into dst over the overlapping hyperslab; keep dst elsewhere."""
    src = np.asarray(src)
    dst = np.array(dst, copy=True)
    if src.shape == dst.shape:
        return src.astype(dst.dtype, copy=False)
    if src.ndim != dst.ndim:
        return dst  # structurally different leaf (shouldn't happen) — keep init
    sl = tuple(slice(0, min(s, d)) for s, d in zip(src.shape, dst.shape))
    dst[sl] = src[sl]
    return dst


def _overlay(src: Dict[str, Any], dst: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, dv in dst.items():
        if k in src and isinstance(dv, dict):
            out[k] = _overlay(src[k], dv)
        elif k in src:
            out[k] = _embed_slab(src[k], dv)
        else:
            out[k] = dv  # no source (s2d front, wider-only leaves): fresh init
    return out


def flagship_warm_start(compat_variables: Dict, flagship_variables: Dict) -> Dict:
    """Seed flagship (tpu_optimized) variables from reference-exact variables.

    Both arguments are full MammoCLIP variable dicts ({'params', 'batch_stats'}).
    Returns a new dict with the flagship's structure and the compat weights
    overlaid wherever names + overlapping shapes allow (see module docstring).
    """
    import jax

    compat = jax.tree_util.tree_map(np.asarray, compat_variables)
    flagship = jax.tree_util.tree_map(np.asarray, flagship_variables)
    return {col: _overlay(compat.get(col, {}), tree)
            for col, tree in flagship.items()}
