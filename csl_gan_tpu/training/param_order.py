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

import re
from typing import List, Sequence

import jax

_WITHIN_MODULE_ORDER = {"kernel": 0, "bias": 1, "scale": 0, "embedding": 0}

_NUM_SUFFIX = re.compile(r"^(.*?)(\d+)$")


def _natural(key) -> tuple:
    """Sort key splitting a trailing number so TorchConv_2 < TorchConv_10
    (plain lexicographic order would mis-map per-layer CLI vectors for
    models with >=10 auto-numbered flax modules)."""
    s = str(key)
    m = _NUM_SUFFIX.match(s)
    if m:
        return (m.group(1), int(m.group(2)))
    return (s, -1)


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
        keyed.append((tuple(_natural(k) for k in module),
                      _WITHIN_MODULE_ORDER.get(leafname, 2), i))
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


def torch_order_names(params) -> List[str]:
    """Human-readable torch-order parameter names (for error messages)."""
    paths = leaf_paths(params)
    return [".".join(str(k) for k in paths[i]) for i in torch_order_indices(params)]


# ---- structure-aware per-layer defaults for the DCResNet discriminator ----
#
# The reference ships a single 9-entry CelebA default for -cpl / -issv
# (reference options.py:80,79) that only fits the UNCONDITIONAL 64px D
# (4 convs x {kernel,bias} + critic kernel = 9 leaves). Conditional
# (ACGAN/WCGAN) discriminators add an aux head (2 leaves) and the 48px preset
# drops a conv block, so the positional vector mis-maps or crashes there.
# These builders generalize the default by leaf ROLE instead of position and
# reproduce the reference vectors exactly on the 9-leaf D.

def _conv_index(path) -> int | None:
    for k in path:
        m = re.fullmatch(r"TorchConv_(\d+)", str(k))
        if m:
            return int(m.group(1))
    return None


def _dcresnet_role_vector(params, conv_w, conv_b, head_w, head_b) -> List[float]:
    """Leaf-order vector; conv_w/conv_b are fns of (conv_idx, n_convs)."""
    paths = leaf_paths(params)
    conv_idxs = [ci for ci in (_conv_index(p) for p in paths) if ci is not None]
    n_convs = (max(conv_idxs) + 1) if conv_idxs else 0
    vals = []
    for p in paths:
        ci = _conv_index(p)
        if ci is not None:
            vals.append(conv_w(ci, n_convs) if p[-1] == "kernel"
                        else conv_b(ci, n_convs))
        elif p[-1] == "kernel":
            vals.append(head_w)
        else:
            vals.append(head_b)
    return vals


def default_clipping_per_layer(params) -> List[float]:
    """Conditional/size-aware generalization of the CelebA -cpl default
    [1000, 200, 1000, 100, 1000, 100, 1000, 5, 2500] (reference
    options.py:80): conv kernels 1000; conv biases 200 (first) / 100 (mid) /
    5 (last); critic + aux-head kernels 2500; aux-head bias 5."""
    return _dcresnet_role_vector(
        params,
        conv_w=lambda i, n: 1000.0,
        conv_b=lambda i, n: 200.0 if i == 0 else (5.0 if i == n - 1 else 100.0),
        head_w=2500.0, head_b=5.0)


def default_is_scaling_per_layer(params) -> List[float]:
    """Conditional/size-aware generalization of the CelebA -issv default
    [20, 2, 15, 1.5, 10, 1.5, 10, 1, 30] (reference options.py:79):
    conv kernels 20/15/10...; conv biases 2 (first) / 1.5 (mid) / 1 (last);
    critic + aux-head kernels 30; aux-head bias 1."""
    return _dcresnet_role_vector(
        params,
        conv_w=lambda i, n: 20.0 if i == 0 else (15.0 if i == 1 else 10.0),
        conv_b=lambda i, n: 2.0 if i == 0 else (1.0 if i == n - 1 else 1.5),
        head_w=30.0, head_b=1.0)
