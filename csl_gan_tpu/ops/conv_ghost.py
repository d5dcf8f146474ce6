"""Ghost (norm-factorized) per-sample clipping for the DCResNet discriminator.

TPU-native fast path for the private REAL pass of the conv D (the reference's
hot loop, train.py:386-399, runs Opacus hook-based per-sample grads there).
Instead of materializing [batch, params] gradients (vmap path) or running a
second per-sample backward (two-pass path), this computes per-sample gradient
NORMS analytically from layer inputs and output cotangents, then forms the
clip-weighted gradient sum as ONE standard batched backward per layer with the
cotangents pre-scaled by the clip factors:

    sum_i w_i g_W(i) = d/dW sum_i w_i loss_i   (w treated as constants)

Per-sample conv-kernel norms use the im2col factorization g_W(i) = U_i^T C_i
(U: unfolded patches [S, K], C: output cotangent [S, O]) with a per-layer
choice between two evaluation orders (the "mixed ghost clipping" rule,
Bu et al. 2022/2023, arXiv:2205.10683 / 2210.00038):

    direct:  ||g_W(i)||^2 = || U_i^T C_i ||_F^2          cost S*K*O / sample
    ghost:   ||g_W(i)||^2 = <U_i U_i^T, C_i C_i^T>       cost S^2*(K+O) / sample

picking ghost iff S*(K+O) < K*O. Dense heads use the classic factorization
||g_W(i)|| = ||a_i|| * ||c_i|| (Goodfellow 2015) like ops/ghost.py.

Everything is one jitted computation: forward, head-loss cotangents
(hand-derived for the wgan family — reference DCResNet_models.py:106-153 and
models.py:51-67), layer-by-layer input backprop via jax.vjp, norms, clip
factors, weighted sums, and (optionally) the DP noise. Exact-equivalence
against ops/grads.clipped_grad_sum is pinned by tests/test_conv_ghost.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from csl_gan_tpu.ops.grads import ClipStats, add_gaussian_noise, clip_factors

_DN = ("NHWC", "HWIO", "NHWC")

# Clip-bound safety margin under bf16 compute: the clip factors are applied
# by scaling the (bf16) cotangents, whose rounding perturbs each per-sample
# contribution by <= 2^-8 relative; inflating the norms by 2^-7 keeps
# ||f_i * g_i|| <= C rigorously (at a <=0.8% utility cost on the threshold).
_BF16_NORM_MARGIN = 1.0 + 2.0 ** -7


def _prec(dtype):
    # HIGHEST forces the fp32 multi-pass path; for bf16 inputs the MXU
    # fast path with fp32 accumulation is the point.
    return lax.Precision.DEFAULT if dtype is not None else lax.Precision.HIGHEST


def _conv(a, kernel, stride, pad, dtype=None):
    if dtype is not None:
        a = a.astype(dtype)
        kernel = kernel.astype(dtype)
    return lax.conv_general_dilated(
        a, kernel, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], dimension_numbers=_DN,
        precision=_prec(dtype))


def _patches(a, kh, kw, stride, pad, dtype=None):
    """im2col: [B, H', W', K] with K = kh*kw*Cin (ordering irrelevant: only
    norms and Gram matrices are taken)."""
    return lax.conv_general_dilated_patches(
        a, filter_shape=(kh, kw), window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], dimension_numbers=_DN,
        precision=_prec(dtype))


def _ghost_order(s: int, k: int, o: int) -> bool:
    """Roofline-aware order choice: per sample, ghost costs ~2*S^2*(K+O)
    flops and ~12*S^2 bytes; direct costs ~2*S*K*O flops but WRITES AND
    RE-READS the [K, O] per-sample gradient (~8*K*O bytes) — and the
    flagship D step is bandwidth-bound (RESULTS.md: ~75% of HBM peak),
    so each order is scored as max(flop_time, byte_time) with the TPU's
    arithmetic intensity (~240 flop/byte at bf16 peak). Vs the pure-flops
    rule this flips exactly the middle layers (e.g. CelebA conv2,
    S=256 K=1600 O=128: 105 MB of per-sample-grad traffic avoided)."""
    ai = 240.0
    ghost_cost = max(2.0 * s * s * (k + o), ai * 12.0 * s * s)
    direct_cost = max(2.0 * s * k * o, ai * 8.0 * k * o)
    return ghost_cost < direct_cost


def _conv_kernel_sq_norms(u, c, dtype=None):
    """Per-sample squared Frobenius norm of the conv kernel gradient, from
    unfolded patches u [B, H', W', K] and cotangents c [B, H', W', O].

    Both operands stay in their natural 4-D conv layouts and the einsums
    contract the two spatial axes directly — flattening (H', W') into one
    S axis breaks the TPU (8,128) tiling of the minor dims and forced XLA
    to materialize full relayout copies of the patch tensor (~100 MB per
    instance on the CelebA flagship).

    With a bf16 compute dtype, the einsums take bf16 inputs and accumulate
    fp32 (preferred_element_type) — exact for bf16-valued inputs up to
    accumulation rounding, so the norms describe the SAME gradients the
    weighted sum (_conv_kernel_weighted_sum, same u/c) produces."""
    s = u.shape[1] * u.shape[2]
    k, o = u.shape[3], c.shape[3]
    kw_e = dict(precision=_prec(dtype),
                preferred_element_type=jnp.float32)
    if _ghost_order(s, k, o):
        # ghost order: <U U^T, C C^T> — cheaper when the spatial extent is
        # small relative to the kernel param count (deep layers). The Gram
        # matmuls flatten (H', W') -> S locally: a [B, S, S] batched matmul
        # maps onto the MXU directly, measurably better than the 5-D
        # two-free-dims form (micro: 1.3 vs 3.0 ms on the CelebA conv2).
        b = u.shape[0]
        u3 = u.reshape(b, s, k)
        c3 = c.reshape(b, s, o)
        gu = jnp.einsum("bsk,btk->bst", u3, u3, **kw_e)
        gc = jnp.einsum("bso,bto->bst", c3, c3, **kw_e)
        return jnp.einsum("bst,bst->b", gu, gc,
                          precision=lax.Precision.HIGHEST)
    # direct order: materialize the [K, O] per-sample grad (small for early
    # layers) and reduce, straight from the 4-D layouts.
    g = jnp.einsum("bhwk,bhwo->bko", u, c, **kw_e)
    return jnp.sum(g ** 2, axis=(1, 2))


def _conv_kernel_weighted_sum(u, c, w, kernel_shape, dtype=None):
    """sum_i w_i * U_i^T C_i as ONE fp32-accumulated, fp32-OUTPUT einsum,
    from 4-D patches u [B, H', W', K] and cotangents c [B, H', W', O].

    The fp32 output matters for DP rigor under bf16: a bf16-valued summed
    gradient would be rounded at the magnitude of the SUM (up to B*C), far
    beyond the per-sample clip bound; here only the per-sample products go
    through bf16 (covered by the _BF16_NORM_MARGIN on the norms).

    conv_general_dilated_patches emits features channel-major, i.e. the K
    axis is ordered (cin, kh, kw) — verified against the conv vjp by
    tests/test_conv_ghost.py.

    (A backprop-filter lax.conv with preferred_element_type=f32 reading the
    raw activations was measured here and is SLOWER — 17.3 vs 15.7 ms on
    the flagship step: the (batch<->feature)-swapped dimension numbers cost
    more in operand relayouts than the einsum's patch layout copies.)"""
    kh, kw, cin, cout = kernel_shape
    cw = c * w[:, None, None, None]
    if dtype is not None:
        cw = cw.astype(dtype)
    g = jnp.einsum("bhwk,bhwo->ko", u, cw, precision=_prec(dtype),
                   preferred_element_type=jnp.float32)
    return g.reshape(cin, kh, kw, cout).transpose(1, 2, 0, 3)


def dcresnet_real_ghost(d_params, x, y: Optional[jnp.ndarray],
                        *, n_classes: int, arch: str, aux_type: str,
                        aux_scalar: float, row_w: Optional[jnp.ndarray],
                        concat_planes: bool,
                        max_norm, per_layer: bool,
                        stride: int = 2, pad: int = 2,
                        compute_dtype=None, valid=None,
                        norms_only: bool = False,
                        noise: Optional[Tuple[jax.Array, float]] = None):
    """Clipped(+noised) summed gradient of the per-sample REAL wgan loss.

    Per-sample loss_i = -out_i [+ aux terms per arch/aux_type — the exact
    per-sample losses of steps._real_ps_args / models/losses.py].

    d_params: the DCResNetDiscriminator param tree (TorchConv_i/Conv_0 convs,
    optional linOut / linOutAux heads). Returns (summed_grads_tree, ClipStats,
    (out, aux_out)); stats/factors are in tree-leaf order, matching
    ops/grads.clipped_grad_sum.

    `valid` (Poisson subsampling mask, [B] float) scales the head cotangents,
    so masked rows get exactly zero gradient and zero norm (factor 1,
    contribution 0). With `norms_only=True`, returns just the [L, B]
    per-sample leaf norms (the adaptive-clipping statistic) — no weighted
    sums or noise.
    """
    b = x.shape[0]
    dt = compute_dtype

    conv_names = sorted((k for k in d_params if k.startswith("TorchConv_")),
                        key=lambda s: int(s.rsplit("_", 1)[1]))
    has_aux = "linOutAux" in d_params
    has_lin_out = "linOut" in d_params

    def head_mm(a, w):
        # Mirrors models.common.TorchDense: bf16 operands, fp32 accumulation.
        if dt is not None:
            a, w = a.astype(dt), w.astype(dt)
        return jnp.dot(a, w, precision=_prec(dt),
                       preferred_element_type=jnp.float32)

    # ---- forward (matches DCResNetDiscriminator.__call__) ----
    o = x
    if concat_planes and n_classes > 1 and y is not None:
        planes = jax.nn.one_hot(y, n_classes)[:, None, None, :]
        planes = jnp.broadcast_to(
            planes, (b, x.shape[1], x.shape[2], n_classes))
        o = jnp.concatenate([o, planes], axis=-1)
    if dt is not None:
        o = o.astype(dt)

    acts = []   # per conv layer: (a_prev, z)
    for name in conv_names:
        p = d_params[name]["Conv_0"]
        bias = p["bias"].astype(dt) if dt is not None else p["bias"]
        z = _conv(o, p["kernel"], stride, pad, dt) + bias
        acts.append((o, z))
        o = jnp.where(z >= 0, z, jnp.asarray(0.2, z.dtype) * z)  # leaky(0.2)

    flat = o.reshape(b, -1)
    flat32 = flat.astype(jnp.float32)   # head math stays fp32-exact

    aux_out = None
    if has_aux:
        aux_out = head_mm(flat, d_params["linOutAux"]["kernel"]) \
            + d_params["linOutAux"]["bias"]
    if has_aux and arch == "WCGAN":
        onehot = jax.nn.one_hot(y, n_classes)
        out = jnp.sum(aux_out * onehot, axis=1, keepdims=True)
    else:
        out = head_mm(flat, d_params["linOut"]["kernel"])

    # ---- head cotangents (d per-sample-loss / d pre-activation) ----
    # adversarial: loss_i = -out_i  =>  c_out = -1 (wgan real,
    # models/losses.py d_real_loss).
    c_out = -jnp.ones_like(out)
    c_aux = None
    if has_aux and arch == "WCGAN":
        # out_i = aux_i . onehot_i; WCGAN aux loss is zero.
        c_aux = -jax.nn.one_hot(y, n_classes)
    elif has_aux:  # ACGAN
        onehot = jax.nn.one_hot(y, n_classes)
        if aux_type == "cross_entropy":
            c_aux = aux_scalar * (jax.nn.softmax(aux_out, axis=-1) - onehot)
        else:  # class-balanced +-sigmoid sum (models/losses.py aux_loss)
            w_row = row_w if row_w is not None else jnp.ones((b,))
            sign = onehot * (-2.0) + 1.0
            sig = jax.nn.sigmoid(aux_out)
            c_aux = aux_scalar * w_row[:, None] * sign * sig * (1.0 - sig)

    if valid is not None:
        # Poisson mask: zeroing the head cotangents zeroes every per-sample
        # gradient (and its norm) for masked rows.
        c_out = c_out * valid[:, None]
        if c_aux is not None:
            c_aux = c_aux * valid[:, None]

    c_flat = jnp.zeros_like(flat32)
    if has_lin_out and not (has_aux and arch == "WCGAN"):
        c_flat = c_flat + c_out @ d_params["linOut"]["kernel"].T
    if c_aux is not None:
        c_flat = c_flat + c_aux @ d_params["linOutAux"]["kernel"].T

    # ---- backprop input cotangents through the conv stack ----
    c_a = c_flat.reshape(o.shape)
    if dt is not None:
        c_a = c_a.astype(dt)
    cots = [None] * len(conv_names)   # cotangent of each conv's pre-activation
    vjps = [None] * len(conv_names)
    for li in reversed(range(len(conv_names))):
        a_prev, z = acts[li]
        c_z = c_a * jnp.where(z >= 0, jnp.asarray(1.0, c_a.dtype),
                              jnp.asarray(0.2, c_a.dtype))
        cots[li] = c_z
        kernel = d_params[conv_names[li]]["Conv_0"]["kernel"]
        _, vjps[li] = jax.vjp(
            lambda a, k: _conv(a, k, stride, pad, dt), a_prev, kernel)
        if li > 0:
            c_a, _ = vjps[li](c_z)

    # ---- per-sample per-leaf squared norms + weighted-sum closures,
    #      assembled in tree-leaf order via the params treedef ----
    from csl_gan_tpu.ops import pallas_conv_ghost as pcg
    use_pk = pcg.use_pallas(dt)
    sq_by_path = {}
    sum_by_path = {}
    for li, name in enumerate(conv_names):
        a_prev, _ = acts[li]
        c_z = cots[li]
        kshape = d_params[name]["Conv_0"]["kernel"].shape
        kh, kw = kshape[:2]
        s_sp = c_z.shape[1] * c_z.shape[2]
        k_feat = kh * kw * a_prev.shape[-1]
        if (use_pk and _ghost_order(s_sp, k_feat, c_z.shape[-1])
                and pcg.supported(kshape)):
            # Ghost-order layers on single-device TPU: Pallas kernels that
            # never materialize the im2col patch tensor (the step's largest
            # HLO — see ops/pallas_conv_ghost.py). Same bf16-operand /
            # fp32-accumulation math as the einsum path below, so the
            # _BF16_NORM_MARGIN rigor argument is unchanged.
            hwio = (kshape[2] == a_prev.shape[-1])
            assert hwio, f"unexpected kernel layout {kshape}"
            phases = pcg.prepare_phases(a_prev, stride, pad)
            sq_by_path[(name, "Conv_0", "kernel")] = pcg.ghost_sq_norms(
                a_prev, c_z, kh, kw, stride, pad, phases=phases)
            sum_by_path[(name, "Conv_0", "kernel")] = \
                lambda w, a_prev=a_prev, c_z=c_z, kshape=kshape, \
                phases=phases: \
                pcg.weighted_kernel_grad(a_prev, c_z, w, kshape, stride,
                                         pad, phases=phases)
        else:
            # Unfolded patches, shared by the norms and (under bf16) the
            # weighted sum — the bound is exact because both read the SAME
            # u/c tensors.
            # 4-D natural conv layouts throughout (no [B, S, K] flatten —
            # see _conv_kernel_sq_norms on why the reshape costs relayout
            # copies).
            u = _patches(a_prev, kh, kw, stride, pad, dt)
            c2 = c_z
            sq_by_path[(name, "Conv_0", "kernel")] = _conv_kernel_sq_norms(
                u, c2, dt)
            if dt is not None:
                # fp32-OUTPUT einsum: a bf16 summed gradient would be
                # rounded at the SUM's magnitude, breaking the clip bound.
                sum_by_path[(name, "Conv_0", "kernel")] = \
                    lambda w, u=u, c2=c2, kshape=kshape: \
                    _conv_kernel_weighted_sum(u, c2, w, kshape, dt)
            else:
                # fp32: the conv vjp is exact (fp32 output) and faster than
                # a HIGHEST-precision einsum.
                def k_sum(w, vjp=vjps[li], c_z=c_z):
                    _, gw = vjp(c_z * w[:, None, None, None])
                    return gw

                sum_by_path[(name, "Conv_0", "kernel")] = k_sum
        g_b = jnp.sum(c_z.astype(jnp.float32), axis=(1, 2))      # [B, O]
        sq_by_path[(name, "Conv_0", "bias")] = jnp.sum(g_b ** 2, axis=1)
        sum_by_path[(name, "Conv_0", "bias")] = \
            lambda w, g_b=g_b: jnp.sum(g_b * w[:, None], axis=0)

    hp = jax.lax.Precision.HIGHEST
    sq_flat = jnp.sum(flat32 ** 2, axis=1)
    if has_lin_out and not (has_aux and arch == "WCGAN"):
        sq_by_path[("linOut", "kernel")] = sq_flat * jnp.sum(c_out ** 2, axis=1)
        sum_by_path[("linOut", "kernel")] = \
            lambda w: jnp.einsum("bi,bo->io", flat32 * w[:, None], c_out,
                                 precision=hp)
    elif has_lin_out:
        # WCGAN computes out from the aux head; linOut gets zero gradient.
        sq_by_path[("linOut", "kernel")] = jnp.zeros((b,))
        sum_by_path[("linOut", "kernel")] = \
            lambda w: jnp.zeros_like(d_params["linOut"]["kernel"])
    if c_aux is not None:
        sq_ca = jnp.sum(c_aux ** 2, axis=1)
        sq_by_path[("linOutAux", "bias")] = sq_ca
        sq_by_path[("linOutAux", "kernel")] = sq_flat * sq_ca
        sum_by_path[("linOutAux", "bias")] = \
            lambda w: jnp.sum(c_aux * w[:, None], axis=0)
        sum_by_path[("linOutAux", "kernel")] = \
            lambda w: jnp.einsum("bi,bo->io", flat32 * w[:, None], c_aux,
                                 precision=hp)

    flat_paths, treedef = jax.tree_util.tree_flatten_with_path(d_params)
    paths = [tuple(getattr(p, "key") for p in path)
             for path, _leaf in flat_paths]
    leaf_norms = jnp.stack([jnp.sqrt(jnp.maximum(sq_by_path[p], 0.0))
                            for p in paths])                     # [L, B]
    if norms_only:
        return leaf_norms
    clip_norms = leaf_norms * _BF16_NORM_MARGIN if dt is not None \
        else leaf_norms
    factors = clip_factors(clip_norms, max_norm, per_layer)

    summed = jax.tree_util.tree_unflatten(
        treedef, [sum_by_path[p](factors[i]) for i, p in enumerate(paths)])

    if noise is not None:
        key, sigma = noise
        summed = add_gaussian_noise(key, summed, sigma, max_norm,
                                    per_layer=per_layer)

    stats = ClipStats(
        norm_mean=jnp.mean(leaf_norms, axis=1),
        norm_std=jnp.std(leaf_norms, axis=1),
        norm_max=jnp.max(leaf_norms, axis=1),
        frac_clipped=jnp.mean((factors < 0.999).astype(jnp.float32), axis=1),
    )
    return summed, stats, (out, aux_out)
