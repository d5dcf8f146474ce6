"""Mapping between the reference's parameter order and flax leaf order.

Per-layer CLI lists (`-cpl`, `-issv`) follow torch's `model.parameters()`
order: modules in definition order, weight before bias (e.g. the CelebA
default [1000, 200, 1000, 100, ...] alternates conv weights and biases,
options.py:80). JAX's tree flattening sorts dict keys, which puts `bias`
before `kernel` inside each module. These helpers convert user-facing
torch-order vectors to flax leaf order and back (used for clipping params,
IS scaling vectors, and per-layer log columns).
"""

from __future__ import annotations

from typing import List, Sequence

import jax

_WITHIN_MODULE_ORDER = {"kernel": 0, "bias": 1, "scale": 0, "embedding": 0}


def leaf_paths(params) -> List[tuple]:
    """Flattened leaf key paths in JAX (sorted) order."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    paths = []
    for path, _leaf in flat:
        keys = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        paths.append(keys)
    return paths


def torch_order_indices(params) -> List[int]:
    """indices[j] = leaf index (sorted order) of the j-th torch-order param.

    Torch order: modules in definition order (which matches sorted order for
    the numbered flax names used here), weight/kernel before bias.
    """
    paths = leaf_paths(params)
    keyed = []
    for i, p in enumerate(paths):
        module, leafname = p[:-1], p[-1]
        keyed.append((module, _WITHIN_MODULE_ORDER.get(leafname, 2), i))
    keyed.sort(key=lambda t: (t[0], t[1]))
    return [i for _, _, i in keyed]


def from_torch_order(values: Sequence[float], params) -> List[float]:
    """Reorder a torch-order per-layer vector into flax leaf order."""
    idx = torch_order_indices(params)
    if len(values) != len(idx):
        raise ValueError(
            f"per-layer vector has {len(values)} entries but model has "
            f"{len(idx)} parameters")
    out = [0.0] * len(idx)
    for j, leaf_i in enumerate(idx):
        out[leaf_i] = float(values[j])
    return out


def to_torch_order(values: Sequence[float], params) -> List[float]:
    """Reorder a leaf-order per-layer vector into torch order (for logs)."""
    idx = torch_order_indices(params)
    return [float(values[leaf_i]) for leaf_i in idx]
