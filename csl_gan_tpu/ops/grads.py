"""Per-sample gradient computation, clipping, and noising.

TPU-native replacement for the Opacus backward-hook machinery the reference
depends on (train.py:372-402 and the twosixlabs fork's clipper; contract in
SURVEY.md §2.1):

  - `p.grad_sample` materialization  ->  jax.vmap(jax.grad(per_sample_loss)),
    optionally chunked with lax.scan so per-sample-grad memory is bounded by
    chunk_size x params instead of batch x params (SURVEY.md §5.7).
  - `privacy_engine.clip()`          ->  clipped_grad_sum: per-sample L2 norms
    (flat or per-layer), clip factors min(1, C/norm), and the *weighted sum*
    are fused into one jitted computation — the clipped per-sample grads are
    never materialized; only a [batch] weight vector contracts against the
    per-sample grad tree.
  - noise addition at optimizer.step() -> add_gaussian_noise with std
    sigma*C (flat) or sigma*C_l per layer, which keeps the effective noise
    multiplier exactly sigma in both modes.

Everything here is pure and jit/pjit-safe; batch axes may be sharded over a
mesh, in which case the sums become XLA psums automatically.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Pytree = Any


class ClipStats(NamedTuple):
    """Per-layer per-sample-norm statistics for logging (train.py:310-329)."""
    norm_mean: jnp.ndarray   # [n_layers]
    norm_std: jnp.ndarray    # [n_layers]
    norm_max: jnp.ndarray    # [n_layers]
    frac_clipped: jnp.ndarray  # [n_layers] fraction of samples with factor < 0.999


def _leaf_norms(grads_ps: Pytree) -> jnp.ndarray:
    """Per-sample L2 norm of each leaf: returns [n_leaves, batch]."""
    leaves = jax.tree_util.tree_leaves(grads_ps)
    return jnp.stack([
        jnp.sqrt(jnp.sum(jnp.reshape(g, (g.shape[0], -1)) ** 2, axis=1))
        for g in leaves
    ])


def clip_factors(leaf_norms: jnp.ndarray, max_norm: Union[float, Sequence[float]],
                 per_layer: bool) -> jnp.ndarray:
    """Clipping factors per (layer, sample), shape [n_leaves, batch].

    Flat mode: one global norm per sample; the same factor for every layer.
    Per-layer: each layer clipped independently to its own threshold
    (Opacus norm_clipper semantics, SURVEY.md §2.1).
    """
    if per_layer:
        thresholds = jnp.asarray(max_norm, jnp.float32)[:, None]  # [n_leaves, 1]
        return jnp.minimum(1.0, thresholds / (leaf_norms + 1e-12))
    flat = jnp.sqrt(jnp.sum(leaf_norms ** 2, axis=0, keepdims=True))  # [1, batch]
    factor = jnp.minimum(1.0, jnp.asarray(max_norm, jnp.float32) / (flat + 1e-12))
    return jnp.broadcast_to(factor, leaf_norms.shape)


def _weighted_sum(grads_ps: Pytree, factors: jnp.ndarray) -> Pytree:
    """sum_i factors[l, i] * grads_ps[l][i] without materializing clipped grads."""
    leaves, treedef = jax.tree_util.tree_flatten(grads_ps)
    out = []
    for idx, g in enumerate(leaves):
        w = factors[idx].reshape((g.shape[0],) + (1,) * (g.ndim - 1))
        out.append(jnp.sum(g * w, axis=0))
    return jax.tree_util.tree_unflatten(treedef, out)


def _stats_from_norms(leaf_norms: jnp.ndarray, factors: jnp.ndarray) -> ClipStats:
    return ClipStats(
        norm_mean=jnp.mean(leaf_norms, axis=1),
        norm_std=jnp.std(leaf_norms, axis=1),
        norm_max=jnp.max(leaf_norms, axis=1),
        frac_clipped=jnp.mean((factors < 0.999).astype(jnp.float32), axis=1),
    )


def _pad_rows(b: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """Zero-pad the leading (batch) axis to n_pad rows."""
    extra = n_pad - b.shape[0]
    if extra == 0:
        return b
    return jnp.concatenate(
        [b, jnp.zeros((extra,) + b.shape[1:], b.dtype)], axis=0)


def per_sample_grads(loss_fn: Callable, params: Pytree, *batch,
                     chunk: Optional[int] = None) -> Pytree:
    """Materialized per-sample grads: tree with a leading [batch] axis.

    loss_fn(params, *example) must return the scalar per-sample loss. Used by
    the tm/sv engines and as the reference implementation the fused paths are
    tested against. Batches that don't divide by `chunk` are zero-padded to
    the next multiple; pad-row grads are discarded.
    """
    gfn = jax.vmap(jax.grad(loss_fn), in_axes=(None,) + (0,) * len(batch))
    if chunk is None:
        return gfn(params, *batch)
    n = batch[0].shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    chunked = [jnp.reshape(_pad_rows(b, n_pad),
                           (n_pad // chunk, chunk) + b.shape[1:])
               for b in batch]

    def body(_, bc):
        return None, gfn(params, *bc)

    _, stacked = jax.lax.scan(body, None, tuple(chunked))
    return jax.tree.map(lambda g: jnp.reshape(g, (n_pad,) + g.shape[2:])[:n],
                        stacked)


def _noise_stds(tree: Pytree, sigma: float,
                max_norm, per_layer: bool) -> jnp.ndarray:
    """Per-leaf DP noise std: sigma*C (flat) or sigma*C_l (per-layer)."""
    n = len(jax.tree_util.tree_leaves(tree))
    if per_layer:
        return jnp.asarray(max_norm, jnp.float32) * sigma
    return jnp.broadcast_to(jnp.asarray(max_norm, jnp.float32) * sigma, (n,))


def _weighted_sum_fused_noise(grads_ps: Pytree, factors: jnp.ndarray,
                              key: jax.Array, stds: jnp.ndarray) -> Pytree:
    """Weighted sum with DP noise fused in: large leaves go through the
    Pallas MXU kernel (one HBM pass, in-register noise); small leaves use
    the XLA path + jax.random noise."""
    from csl_gan_tpu.ops import pallas_clip

    leaves, treedef = jax.tree_util.tree_flatten(grads_ps)
    seeds = jax.random.randint(key, (len(leaves),), 0, np.iinfo(np.int32).max)
    use_pallas = [
        (int(np.prod(g.shape[1:])) if g.ndim > 1 else 1)
        >= pallas_clip.MIN_PALLAS_ELEMS for g in leaves]
    # XLA-branch leaves share ONE flat normal draw: a per-leaf
    # jax.random.normal is an rng-bit-generator kernel plus a key-derivation
    # chain, and on the launch-bound MNIST epoch scan the per-leaf draws
    # cost ~3-5 us of the ~68 us step (xplane-measured). Disjoint slices of
    # one draw are independent normals, so the DP guarantee is unchanged.
    sizes = [int(np.prod(g.shape[1:])) if g.ndim > 1 else 1
             for g in leaves]
    xla_total = sum(s for s, up in zip(sizes, use_pallas) if not up)
    k_eps = jax.random.fold_in(key, 0x5eed)
    # Same size gate as add_gaussian_noise: one flat draw only while small.
    eps_flat = (jax.random.normal(k_eps, (xla_total,), jnp.float32)
                if 0 < xla_total <= _FLAT_DRAW_MAX else None)
    out = []
    off = 0
    for idx, g in enumerate(leaves):
        b = g.shape[0]
        if use_pallas[idx]:
            out.append(pallas_clip.leaf_weighted_sum_noise(
                g, factors[idx], seeds[idx], stds[idx]))
        else:
            w = factors[idx].reshape((b,) + (1,) * (g.ndim - 1))
            s = jnp.sum(g * w, axis=0)
            if eps_flat is None:
                eps = jax.random.normal(jax.random.fold_in(k_eps, idx),
                                        (sizes[idx],), jnp.float32)
            else:
                eps = jax.lax.slice(eps_flat, (off,), (off + sizes[idx],))
                off += sizes[idx]
            out.append(s + stds[idx] * eps.astype(s.dtype).reshape(s.shape))
    return jax.tree_util.tree_unflatten(treedef, out)


def two_pass_clipped_grad_sum(loss_fn: Callable, params: Pytree, *batch,
                              max_norm: Union[float, Sequence[float]],
                              per_layer: bool = False
                              ) -> Tuple[Pytree, ClipStats]:
    """Clipped gradient sum without re-reading materialized per-sample grads.

    Pass 1 computes only the per-sample norms (vmap(grad) -> immediate norm
    reduction; XLA can retire the per-sample grad buffers as soon as each
    norm is formed). Pass 2 is ONE standard batched backward of
    sum_i w_i * loss_i with the clip factors treated as constants — exactly
    the clipped sum, since d/dp sum_i w_i l_i(p) = sum_i w_i g_i.

    Halves the [batch, params] HBM traffic of the one-pass path for models
    where XLA cannot algebraically eliminate the materialization (convs);
    the natural fit for the DCResNet discriminator.
    """

    def norms_of(*example):
        g = jax.grad(loss_fn)(params, *example)
        return jnp.stack([jnp.sqrt(jnp.sum(leaf.astype(jnp.float32) ** 2))
                          for leaf in jax.tree_util.tree_leaves(g)])

    norms = jax.vmap(norms_of)(*batch).T            # [n_leaves, batch]
    factors = clip_factors(norms, max_norm, per_layer)
    stats = _stats_from_norms(norms, factors)

    if per_layer:
        # Per-layer factors differ across leaves; a single weighted backward
        # only supports one weight per sample. Fall back to the generic path.
        summed, _ = clipped_grad_sum(loss_fn, params, *batch,
                                     max_norm=max_norm, per_layer=True)
        return summed, stats

    w = jax.lax.stop_gradient(factors[0])           # flat: same per leaf

    def weighted_total(p):
        losses_ps = jax.vmap(lambda *ex: loss_fn(p, *ex))(*batch)
        return jnp.sum(w * losses_ps)

    summed = jax.grad(weighted_total)(params)
    return summed, stats


def clipped_grad_sum(loss_fn: Callable, params: Pytree, *batch,
                     max_norm: Union[float, Sequence[float]],
                     per_layer: bool = False,
                     chunk: Optional[int] = None,
                     fused_noise: Optional[Tuple[jax.Array, float]] = None
                     ) -> Tuple[Pytree, ClipStats]:
    """Sum over samples of per-sample-clipped gradients, plus norm statistics.

    Equivalent of Opacus `clip()` + the grad-norm logging pass
    (train.py:396-399) in one fused computation. With `chunk` set, runs a
    lax.scan over batch chunks, so peak memory is chunk x params.

    With `fused_noise=(key, sigma)` (TPU, unchunked only), the Gaussian DP
    noise is generated inside the same Pallas kernel that performs the
    weighted sum — no separate noise tensor touches HBM. Noise addition
    commutes with the penalty-gradient addition that may follow, so fusing
    it here is mathematically identical to the reference's noise-at-step.
    """

    def one_chunk(batch_chunk):
        g_ps = jax.vmap(jax.grad(loss_fn), in_axes=(None,) + (0,) * len(batch_chunk))(
            params, *batch_chunk)
        norms = _leaf_norms(g_ps)
        factors = clip_factors(norms, max_norm, per_layer)
        return g_ps, norms, factors

    if chunk is None:
        g_ps, norms, factors = one_chunk(batch)
        if fused_noise is not None:
            key, sigma = fused_noise
            stds = _noise_stds(params, sigma, max_norm, per_layer)
            summed = _weighted_sum_fused_noise(g_ps, factors, key, stds)
        else:
            summed = _weighted_sum(g_ps, factors)
        return summed, _stats_from_norms(norms, factors)

    n = batch[0].shape[0]
    # Pad to a chunk multiple (e.g. the --poisson static buffer B+8*sqrt(B)
    # rarely divides); pad rows get factor 0 so they contribute nothing to
    # the sum, and are dropped from the norm statistics.
    n_pad = ((n + chunk - 1) // chunk) * chunk
    chunked = tuple(jnp.reshape(_pad_rows(b, n_pad),
                                (n_pad // chunk, chunk) + b.shape[1:])
                    for b in batch)
    rows = jnp.reshape(jnp.arange(n_pad) < n, (n_pad // chunk, chunk))
    zero = jax.tree.map(jnp.zeros_like, params)

    if fused_noise is not None:
        raise ValueError("fused_noise is not supported with chunked "
                         "per-sample grads; add noise separately")

    def body(acc, inp):
        mask, bc = inp
        g_ps, norms, factors = one_chunk(bc)
        factors = factors * mask[None, :]
        s = _weighted_sum(g_ps, factors)
        return jax.tree.map(jnp.add, acc, s), (norms, factors)

    summed, (norms_all, factors_all) = jax.lax.scan(body, zero, (rows, chunked))
    # [n_chunks, n_leaves, chunk] -> [n_leaves, batch] (pad rows dropped)
    norms = jnp.reshape(jnp.transpose(norms_all, (1, 0, 2)),
                        (norms_all.shape[1], n_pad))[:, :n]
    factors = jnp.reshape(jnp.transpose(factors_all, (1, 0, 2)),
                          (factors_all.shape[1], n_pad))[:, :n]
    return summed, _stats_from_norms(norms, factors)


# One flat normal draw per dtype group only up to this many elements
# (1 MB f32); see add_gaussian_noise.
_FLAT_DRAW_MAX = 1 << 18


def add_gaussian_noise(key: jax.Array, tree: Pytree, sigma: float,
                       max_norm: Union[float, Sequence[float]],
                       per_layer: bool = False) -> Pytree:
    """Add N(0, (sigma*C)^2) noise per parameter (std sigma*C_l in per-layer
    mode), the Opacus noise-at-step semantics (SURVEY.md §2.1).

    One flat draw per dtype group instead of one draw per leaf — for SMALL
    groups: each jax.random.normal is an rng-bit-generator kernel plus a
    key-derivation chain, and on the launch-bound MNIST epoch scan the 5
    per-leaf draws cost ~5-8 us of the 81 us step (xplane-measured).
    Disjoint slices of one draw are independent normals, so the DP
    guarantee is unchanged (the noise stream for a given seed differs from
    earlier versions — an internal stream, nothing persists it).

    Groups past _FLAT_DRAW_MAX elements draw PER LEAF, shaped: inside a
    lax.scan body XLA materializes the full flat buffer plus a
    low-lane-utilization [N/2, 2] relayout of it that measured 3.3 ms/step
    on the CelebA bf16 D step (4.33M-param group, round-3 xplane trace of
    the production scan; the per-call compile of the same source sank the
    slices into per-leaf shaped generation on its own). Per-leaf keys
    derive positionally (fold_in(group_key, leaf_index)), one fused
    generate+convert kernel per leaf."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    # max_norm may be a traced value (adaptive clipping updates C on-device,
    # train.py:204-245), so stay in jnp ops.
    if per_layer:
        stds = jnp.asarray(max_norm, jnp.float32) * sigma          # [n_leaves]
    else:
        stds = jnp.broadcast_to(jnp.asarray(max_norm, jnp.float32) * sigma,
                                (len(leaves),))
    by_dtype: dict = {}
    for i, g in enumerate(leaves):
        by_dtype.setdefault(jnp.dtype(g.dtype), []).append(i)
    flat = {}
    gkeys = {}
    for j, (dt, idxs) in enumerate(sorted(by_dtype.items(),
                                          key=lambda kv: kv[0].name)):
        kd = key if len(by_dtype) == 1 else jax.random.fold_in(key, j)
        gkeys[dt] = kd
        total = sum(int(np.prod(leaves[i].shape)) for i in idxs)
        flat[dt] = (jax.random.normal(kd, (total,), dt)
                    if total <= _FLAT_DRAW_MAX else None)
    offs = {dt: 0 for dt in flat}
    noised = []
    for i, g in enumerate(leaves):
        dt = jnp.dtype(g.dtype)
        if flat[dt] is None:
            eps = jax.random.normal(jax.random.fold_in(gkeys[dt], i),
                                    g.shape, dt)
        else:
            n = int(np.prod(g.shape))
            o = offs[dt]
            offs[dt] = o + n
            eps = jax.lax.slice(flat[dt], (o,), (o + n,)).reshape(g.shape)
        noised.append(g + stds[i] * eps)  # same dtype promotion as before
    return jax.tree_util.tree_unflatten(treedef, noised)


def global_norm(tree: Pytree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))


def per_leaf_norms(tree: Pytree) -> jnp.ndarray:
    """L2 norm of each leaf -> [n_leaves]."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.stack([jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2)) for g in leaves])
