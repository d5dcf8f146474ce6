"""Reference (torch) checkpoint -> csl_gan_tpu state conversion.

The reference ecosystem's artifacts are torch-pickle ``saves/{G|D}-N`` files
holding ``{epoch, model_state_dict, optimizer_state_dict, loss}``
(reference util.py:16-22). This module maps those onto this framework's
param/optimizer trees so every rebuilt tool (gensamples.py, downstream.py,
mem_inf_attack.py, temp_file.py, resume) can evaluate models trained by the
original code — the strongest behavioral-parity demonstration available
offline (tests/test_ref_convert.py checks converted G/D outputs against the
torch modules to ~1e-5).

Layout transforms (NCHW/torch -> NHWC/flax):
  - dense weights  [out, in]        -> kernel [in, out]
  - conv weights   [O, I, kh, kw]   -> kernel [kh, kw, I, O]
  - the DCResNet G stem (linIn) reshapes its output to an IMAGE, so its
    out-dim is permuted (C, ff, ff) -> (ff, ff, C) (torch reshapes to NCHW,
    DCResNet_models.py:98; this model to NHWC)
  - the DCResNet D heads (linOut/linOutAux) read the FLATTENED conv stack,
    so their in-dim is permuted (C, h, w) -> (h, w, C)
    (DCResNet_models.py:137)
  - BatchNorm/GroupNorm weight/bias -> scale/bias; running_mean/var ->
    batch_stats mean/var; num_batches_tracked is dropped
  - Adam exp_avg/exp_avg_sq map with the same per-tensor transforms into
    optax's mu/nu; `step` becomes `count`

The generator's upsampling needs special handling: the reference's
UpsampleConv upsamples via cat-x4 + pixel_shuffle, a phase-dependent channel
PERMUTATION (see models/common.ref_pixel_shuffle_upsample_2x), which the
trained conv weights bake in. Converted DCResNet configs therefore set
``ref_pixel_shuffle=true`` in their opt.txt and the G runs the reference's
exact upsampling instead of the phase-fused clean path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# per-tensor layout transforms
# ---------------------------------------------------------------------------

def _t_dense(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _t_lin_in(w, c, ff):
    """G stem weight [C*ff*ff, in] -> kernel [in, ff*ff*C] (out-dim permuted
    from torch's (c, h, w) reshape order to NHWC's (h, w, c))."""
    w = np.asarray(w)
    out, inp = w.shape
    assert out == c * ff * ff, (out, c, ff)
    return np.ascontiguousarray(
        w.reshape(c, ff, ff, inp).transpose(1, 2, 0, 3).reshape(ff * ff * c, inp).T)


def _t_lin_in_bias(b, c, ff):
    b = np.asarray(b)
    return np.ascontiguousarray(
        b.reshape(c, ff, ff).transpose(1, 2, 0).reshape(-1))


def _t_flat_head(w, c, h):
    """D head weight [out, C*h*h] -> kernel [h*h*C, out] (in-dim permuted
    from torch's NCHW flatten to NHWC's)."""
    w = np.asarray(w)
    out = w.shape[0]
    assert w.shape[1] == c * h * h, (w.shape, c, h)
    return np.ascontiguousarray(
        w.reshape(out, c, h, h).transpose(2, 3, 1, 0).reshape(h * h * c, out))


def _t_copy(w):
    return np.ascontiguousarray(np.asarray(w))


# ---------------------------------------------------------------------------
# torch-key -> (flax path, transform) maps, in torch REGISTRATION order
# (which is also torch's parameters()/state_dict order — the Adam state's
# param indices follow it)
# ---------------------------------------------------------------------------

def g_key_map(opt, G) -> List[Tuple[str, Optional[tuple], callable]]:
    """[(torch_key, flax_params_path_or_None, transform)]; running stats map
    separately (see g_stats_map). Paths are None for dropped keys."""
    if opt.model == "Vanilla":
        return [
            ("lin1.weight", ("TorchDense_0", "kernel"), _t_dense),
            ("lin1.bias", ("TorchDense_0", "bias"), _t_copy),
            ("lin2.weight", ("TorchDense_1", "kernel"), _t_dense),
            ("lin2.bias", ("TorchDense_1", "bias"), _t_copy),
        ]
    # DCResNet generator (reference DCResNet_models.py:72-107).
    bn = not bool(getattr(opt, "per_sample_grad", False))
    norm = "BatchNorm" if bn else "GroupNorm"
    c0, ff = G.channels[0], G.first_filter_size
    entries = []
    if getattr(G, "n_classes", 0) > 1 and G.emb_mode == "embed":
        entries.append(("emb.weight", ("Embed_0", "embedding"), _t_copy))
    entries += [
        ("linIn.weight", ("TorchDense_0", "kernel"),
         lambda w: _t_lin_in(w, c0, ff)),
        ("linIn.bias", ("TorchDense_0", "bias"),
         lambda b: _t_lin_in_bias(b, c0, ff)),
    ]
    n_blocks = len(G.channels) - 1
    for i in range(n_blocks):
        rb = f"ResBlockUp_{i}"
        entries += [
            (f"blocks.{i}.shortcut.conv.weight",
             (rb, "UpsampleConv_0", "TorchConv_0", "Conv_0", "kernel"), _t_conv),
            (f"blocks.{i}.shortcut.conv.bias",
             (rb, "UpsampleConv_0", "TorchConv_0", "Conv_0", "bias"), _t_copy),
            (f"blocks.{i}.bn1.weight", (rb, f"{norm}_0", "scale"), _t_copy),
            (f"blocks.{i}.bn1.bias", (rb, f"{norm}_0", "bias"), _t_copy),
            (f"blocks.{i}.convUp.conv.weight",
             (rb, "UpsampleConv_1", "TorchConv_0", "Conv_0", "kernel"), _t_conv),
            (f"blocks.{i}.bn2.weight", (rb, f"{norm}_1", "scale"), _t_copy),
            (f"blocks.{i}.bn2.bias", (rb, f"{norm}_1", "bias"), _t_copy),
            (f"blocks.{i}.conv.weight",
             (rb, "TorchConv_0", "Conv_0", "kernel"), _t_conv),
            (f"blocks.{i}.conv.bias",
             (rb, "TorchConv_0", "Conv_0", "bias"), _t_copy),
        ]
    entries += [
        ("bn.weight", (f"{norm}_0", "scale"), _t_copy),
        ("bn.bias", (f"{norm}_0", "bias"), _t_copy),
        ("convOut.weight", ("TorchConv_0", "Conv_0", "kernel"), _t_conv),
        ("convOut.bias", ("TorchConv_0", "Conv_0", "bias"), _t_copy),
    ]
    return entries


def g_stats_map(opt, G) -> List[Tuple[str, tuple]]:
    """BatchNorm running stats -> batch_stats paths (BN configs only)."""
    if opt.model == "Vanilla" or getattr(opt, "per_sample_grad", False):
        return []
    entries = []
    for i in range(len(G.channels) - 1):
        rb = f"ResBlockUp_{i}"
        for tb, fb in (("bn1", "BatchNorm_0"), ("bn2", "BatchNorm_1")):
            entries += [
                (f"blocks.{i}.{tb}.running_mean", (rb, fb, "mean")),
                (f"blocks.{i}.{tb}.running_var", (rb, fb, "var")),
            ]
    entries += [("bn.running_mean", ("BatchNorm_0", "mean")),
                ("bn.running_var", ("BatchNorm_0", "var"))]
    return entries


def d_key_map(opt, D) -> List[Tuple[str, Optional[tuple], callable]]:
    if opt.model == "Vanilla":
        entries = [
            ("lin1.weight", ("lin1", "kernel"), _t_dense),
            ("lin1.bias", ("lin1", "bias"), _t_copy),
            ("lin2.weight", ("lin2", "kernel"), _t_dense),
            ("lin2.bias", ("lin2", "bias"), _t_copy),
        ]
        if opt.conditional and opt.n_classes > 1 and \
                opt.conditional_arch == "ACGAN":
            entries += [
                ("linOutAux.weight", ("linOutAux", "kernel"), _t_dense),
                ("linOutAux.bias", ("linOutAux", "bias"), _t_copy),
            ]
        return entries
    # DCResNet discriminator (reference DCResNet_models.py:109-153).
    c_last, lf = D.channels[-1], D.last_filter_size
    entries = []
    for i in range(len(D.channels) - 1):
        entries += [
            (f"blocks.{i}.weight", (f"TorchConv_{i}", "Conv_0", "kernel"), _t_conv),
            (f"blocks.{i}.bias", (f"TorchConv_{i}", "Conv_0", "bias"), _t_copy),
        ]
    conditional = opt.conditional and opt.n_classes > 1
    if not (conditional and opt.conditional_arch == "WCGAN"):
        entries.append(("linOut.weight", ("linOut", "kernel"),
                        lambda w: _t_flat_head(w, c_last, lf)))
    if conditional and opt.conditional_arch in ("ACGAN", "WCGAN"):
        entries += [
            ("linOutAux.weight", ("linOutAux", "kernel"),
             lambda w: _t_flat_head(w, c_last, lf)),
            ("linOutAux.bias", ("linOutAux", "bias"), _t_copy),
        ]
    return entries


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------

def _set_path(tree: dict, path: tuple, value, torch_key: str):
    node = tree
    for k in path[:-1]:
        if k not in node:
            raise KeyError(
                f"converted {torch_key!r}: path {'/'.join(path)} not in the "
                f"target tree (have: {sorted(node)})")
        node = node[k]
    leaf = path[-1]
    if leaf not in node:
        raise KeyError(
            f"converted {torch_key!r}: leaf {'/'.join(path)} not in the "
            f"target tree (have: {sorted(node)})")
    if tuple(np.shape(node[leaf])) != tuple(value.shape):
        raise ValueError(
            f"converted {torch_key!r} -> {'/'.join(path)}: shape "
            f"{value.shape} != expected {np.shape(node[leaf])}")
    node[leaf] = value.astype(np.float32)


def _as_np(t):
    # torch tensor or numpy: keep this module torch-import-free at runtime.
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_model_state(torch_sd: Dict[str, "np.ndarray"], key_map,
                        params_tmpl, stats_map=(), stats_tmpl=None):
    """Returns (params, batch_stats) as plain nested dicts of np arrays.

    Every mapped torch key must exist; unmapped torch keys other than
    num_batches_tracked are an error (a silently-dropped weight is a parity
    trap)."""
    import jax
    from flax import serialization

    params = serialization.to_state_dict(
        jax.tree.map(lambda x: np.asarray(x), params_tmpl))
    consumed = set()
    for tk, path, tf in key_map:
        if tk not in torch_sd:
            raise KeyError(f"reference state_dict is missing {tk!r} "
                           f"(has: {sorted(torch_sd)})")
        _set_path(params, path, tf(_as_np(torch_sd[tk])), tk)
        consumed.add(tk)
    stats = None
    if stats_tmpl is not None:
        stats = serialization.to_state_dict(
            jax.tree.map(lambda x: np.asarray(x), stats_tmpl))
        for tk, path in stats_map:
            if tk not in torch_sd:
                raise KeyError(f"reference state_dict is missing {tk!r}")
            _set_path(stats, path, _as_np(torch_sd[tk]), tk)
            consumed.add(tk)
    leftovers = [k for k in torch_sd
                 if k not in consumed and not k.endswith("num_batches_tracked")]
    if leftovers:
        raise KeyError(f"unmapped reference keys: {leftovers}")
    return params, stats


def convert_adam_state(torch_opt_sd: Optional[dict], key_map, opt_state_tmpl):
    """Map torch Adam {state: {i: {step, exp_avg, exp_avg_sq}}} onto an optax
    adam/chain state (mu/nu trees + count), using the same per-tensor
    transforms; param index i follows torch registration order = the
    key_map's parameter entries in order. Returns a state_dict-form nested
    dict (flax serialization layout) or None to keep the fresh init."""
    import jax
    from flax import serialization

    if not torch_opt_sd or not torch_opt_sd.get("state"):
        return None
    sd = serialization.to_state_dict(
        jax.tree.map(lambda x: np.asarray(x), opt_state_tmpl))
    # Locate the ScaleByAdamState entry ({count, mu, nu}) inside the chain.
    adam_key = None
    for k, v in sd.items():
        if isinstance(v, dict) and {"count", "mu", "nu"} <= set(v):
            adam_key = k
            break
    if adam_key is None:
        raise ValueError("optimizer state template has no Adam entry")
    state = torch_opt_sd["state"]
    # torch keys may be ints or strings depending on the pickle.
    state = {int(k): v for k, v in state.items()}
    count = 0
    for i, (tk, path, tf) in enumerate(key_map):
        if i not in state:
            continue  # param never updated: keep zeros
        ent = state[i]
        count = max(count, int(_as_np(ent["step"])))
        for moment, slot in (("exp_avg", "mu"), ("exp_avg_sq", "nu")):
            val = tf(_as_np(ent[moment]))
            _set_path(sd[adam_key][slot], path, val, f"{tk}:{moment}")
    sd[adam_key]["count"] = np.asarray(count, np.int32)
    return sd
