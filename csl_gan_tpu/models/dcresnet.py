"""DCResNet WGAN models (reference DCResNet_models.py:8-153), NHWC + Flax.

Generator: linear stem -> stack of upsampling residual blocks
(nearest-2x upsample + 5x5 conv; BatchNorm<->GroupNorm(32) switch keyed on
per-sample-grad mode) -> norm -> relu -> 3x3 conv -> tanh.

Discriminator: strided 5x5 convs with leaky-relu(0.2), flatten, linear
critic head; conditional variants per reference:
  - CGAN concat: label one-hot broadcast as extra input channel planes
    (DCResNet_models.py:130, after arxiv.org/abs/1705.02894-style concat)
  - ACGAN: no input conditioning (base Discriminator nulls emb_mode,
    models.py:36-37); auxiliary classifier head instead
  - WCGAN: per-class critic head, output = head[y] (DCResNet_models.py:141-143)

family = "wgan" (Wasserstein losses; see models/losses.py).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import jax
from jax import lax

from csl_gan_tpu.models.common import (TorchConv, TorchDense, one_hot,
                                       ref_pixel_shuffle_upsample_2x,
                                       torch_kernel_init, upsample_nearest_2x)
from csl_gan_tpu.ops import pallas_groupnorm


class _GroupNormRelu(nn.Module):
    """relu(GroupNorm(x)) with nn.GroupNorm's param names/shapes/inits
    (instantiated with name="GroupNorm_i" so the param tree is identical to
    the unfused nn.GroupNorm + nn.relu formulation). Dispatches through
    ops/pallas_groupnorm.group_norm_relu — the XLA formulation by default
    (measured faster than the hand-written Pallas kernel there; see that
    module's docstring); stats always fp32, output in x.dtype."""
    groups: int = 32
    eps: float = 1e-5
    phase_tiles: int = 1   # channel axis = phase_tiles stacked copies of C
    #                        (raw [N,H,W,4F] fused-upsample-conv output)

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // self.phase_tiles
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          jnp.float32)
        return pallas_groupnorm.group_norm_relu(x, scale, bias,
                                                self.groups, self.eps,
                                                tiles=self.phase_tiles)


def collapse_phase_kernel(kernel, features):
    """Collapse a [k, k, cin, f] kernel into the four phase kernels of the
    fused upsample-conv, returned as one [mk, mk, cin, 4*f] conv kernel
    (see _PhaseConv): output pixel (2i+a, 2j+b) reads upsampled pixel
    (2i+a+dy, 2j+b+dx) = x[i + (a+dy)//2, j + (b+dx)//2] (floor division).

    Module-level so the segment runner can recompute caches from a bare
    param tree (collapse_phase_kernels) with EXACTLY the math _PhaseConv
    uses inline — bit-identical training between the carried-cache and
    inline paths depends on this being the same computation.
    """
    k = kernel.shape[0]
    r = (k - 1) // 2
    cin = kernel.shape[2]
    m_lo = (0 - r) // 2
    m_hi = (1 + r) // 2
    mk = m_hi - m_lo + 1
    # Static 0/1 tap-collapse map: amap[a, dy+r, p] = 1 iff full-res tap
    # dy of phase a lands on low-res tap p. One einsum replaces the
    # k^2 x 4 per-tap scatter-adds of the naive construction (which
    # traced ~100 ops per conv call — dominating CelebA graph traces —
    # and bloated the compiled graph the same way).
    amap = np.zeros((2, k, mk), np.float32)
    for a in (0, 1):
        for dy in range(-r, r + 1):
            amap[a, dy + r, (a + dy) // 2 - m_lo] = 1.0
    if os.environ.get("CSL_PHASE_COLLAPSE") == "einsum":
        # Previous form, kept A/B-able: direct 6-D einsum. Its fused
        # backward (tap contraction + Adam) ran at ~1 ms per [5,5,C,C]
        # layer on v5e — the [5,5,C,C]/pqcabf intermediates tile poorly.
        amap_j = jnp.asarray(amap, kernel.dtype)
        k4 = jnp.einsum("ayp,bxq,yxcf->pqcabf", amap_j, amap_j, kernel,
                        precision=lax.Precision.HIGHEST)
        return k4.reshape(mk, mk, cin, 4 * features)
    # MXU form: one static [k^2, mk^2*4] 0/1 matrix applied to the
    # kernel flattened to [k^2, cin*f] — the big (cin*f) axis stays
    # minor and contiguous through the whole transform (fwd AND its
    # transpose in the backward), so XLA lowers it as one clean
    # matmul instead of a badly-tiled 6-D contraction.
    # Rows (y, x); columns ordered (p, q, a, b).
    tapmat = np.einsum("ayp,bxq->yxpqab", amap, amap)
    tapmat = jnp.asarray(tapmat.reshape(k * k, mk * mk * 4),
                         kernel.dtype)
    k4_flat = jnp.matmul(tapmat.T, kernel.reshape(k * k, -1),
                         precision=lax.Precision.HIGHEST)
    # [p, q, a, b, c, f] -> [p, q, c, a, b, f]; the transpose sits
    # next to the conv's own kernel relayout and fuses there.
    k4 = k4_flat.reshape(mk, mk, 2, 2, cin, features)
    k4 = k4.transpose(0, 1, 4, 2, 3, 5)
    return k4.reshape(mk, mk, cin, 4 * features)


def collapse_phase_kernels(g_params):
    """Build the "phase_cache" collection for a DCResNet generator param
    tree: {module path of each fused upsample-conv: {"k4": collapsed}}.

    Phase convs live at .../UpsampleConv_*/TorchConv_0/Conv_0 with a
    k>1 kernel (the UpsampleConv_0 1x1 shortcut runs conv-then-upsample
    and has no phase form; ResBlockUp's plain final conv sits directly
    under TorchConv_0 with no UpsampleConv parent). Returns {} when the
    tree has no phase convs (ref_pixel_shuffle mode, non-DCResNet G);
    tests/test_models.py pins cache-fed == inline outputs exactly.
    Accepts any Mapping tree (plain dicts or flax FrozenDicts — a frozen
    checkpoint restore must not silently disable the phase carry).
    """
    from collections.abc import Mapping

    def walk(node, path):
        if not isinstance(node, Mapping) or "kernel" in node:
            if (isinstance(node, Mapping) and "kernel" in node
                    and len(path) >= 3
                    and path[-1] == "Conv_0"
                    and path[-2] == "TorchConv_0"
                    and path[-3].startswith("UpsampleConv")
                    and getattr(node["kernel"], "ndim", 0) == 4
                    and node["kernel"].shape[0] > 1):
                return {"k4": collapse_phase_kernel(
                    node["kernel"], node["kernel"].shape[-1])}
            return None
        out = {}
        for key, sub in node.items():
            r = walk(sub, path + (key,))
            if r is not None:
                out[key] = r
        return out or None

    return walk(dict(g_params), ()) or {}


class _PhaseConv(nn.Module):
    """Param-owning core of the fused upsample-conv (stands in for the
    nn.Conv inside TorchConv: same name, param names, shapes, and inits, so
    checkpoints/param-order/weights_seed are unchanged).

    Computes conv_k(upsample_nearest_2x(x)) WITHOUT materializing the 2x
    image: because upsampled pixels repeat in 2x2 blocks, each of the 4
    output phases (a,b) sees the k-tap kernel collapsed onto
    ceil((k+1)/2) low-res taps — for k=5, four 3x3 phase kernels evaluated
    as ONE conv with 4x output features + depth-to-space. 36 vs 100 MACs
    per low-res pixel per channel pair (2.78x fewer; 25->4 for the 1x1
    shortcut, handled in UpsampleConv). Exact up to kernel-tap pre-summing
    (float-level). Zero `SAME` padding of the 2x image corresponds 1:1 to
    zero padding of the low-res input, so boundaries are exact too.
    """
    features: int
    kernel_size: int
    use_bias: bool = True
    dtype: object = None
    defer_d2s: bool = False
    raw4: bool = False   # with defer_d2s: return the conv's raw
    #                      [N, H, W, 4F] output (full-lane layout; the 6-D
    #                      phase view halves lane utilization for F<128 and
    #                      forces a relayout copy at the conv boundary)

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        r = (k - 1) // 2
        cin = x.shape[-1]
        fan_in = cin * k * k
        bound = 1.0 / (fan_in ** 0.5)
        kernel = self.param("kernel", torch_kernel_init(),
                            (k, k, cin, self.features))
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda kk, s, d=jnp.float32: jax.random.uniform(
                    kk, s, d, -bound, bound),
                (self.features,))

        if self.has_variable("phase_cache", "k4"):
            # Pre-collapsed kernels supplied by the caller: the segment
            # runner carries collapse_phase_kernels(g_params) across D
            # steps and recomputes it only on G updates — the collapse is
            # a weight-only transform that otherwise re-runs inside EVERY
            # D step's fresh-fake G forward (~0.3-0.4 ms/step on the
            # CelebA bf16 flagship, round-3 scan-form trace). Only valid
            # when gradients need not flow to `kernel` (the D steps
            # stop_gradient the fakes; the G update computes the collapse
            # inline from params so its grads are exact).
            k4 = self.get_variable("phase_cache", "k4")
        else:
            k4 = collapse_phase_kernel(kernel, self.features)

        # Same dtype rule as nn.Conv/promote_dtype: with dtype=None, inputs
        # and params promote to a common type (raw lax.conv does not).
        cdtype = self.dtype
        if cdtype is None:
            cdtype = jnp.result_type(x.dtype, kernel.dtype)
        x = x.astype(cdtype)
        k4 = k4.astype(cdtype)
        pad = -((0 - r) // 2)
        # No preferred_element_type: like nn.Conv, output dtype == cdtype
        # (the MXU still accumulates fp32 internally for bf16 inputs), and
        # the conv transpose rule then sees matching cotangent/kernel dtypes.
        o = jax.lax.conv_general_dilated(
            x, k4, window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.defer_d2s and self.raw4:
            # Raw [N, H, W, 4F] phase-stacked output: channel = phase*F + f
            # (the k4 column order), so the per-feature bias tiles 4x.
            # The caller normalizes with _GroupNormRelu(phase_tiles=4) and
            # the 6-D view first appears inside the final depth-to-space
            # transpose (phase_d2s), where it is free.
            if bias is not None:
                o = o + jnp.tile(bias.astype(cdtype), 4)
            return o
        n, h, w, _ = o.shape
        # (a, b, feature) minor order set by the k4 reshape; the bias is
        # per-feature, so adding it in phase layout is exact.
        o = o.reshape(n, h, w, 2, 2, self.features)
        if bias is not None:
            o = o + bias.astype(cdtype)
        if self.defer_d2s:
            # Phase layout [N, H, W, 2, 2, F]: the caller applies its
            # (spatial-permutation-invariant) norm + relu here and runs
            # phase_d2s afterwards, so the depth-to-space transpose lands
            # next to its single consumer instead of being materialized
            # fp32 for the norm's three uses (measured 2x134 MB relayout
            # copies per ResBlockUp_3 on the CelebA flagship G step).
            return o
        return phase_d2s(o)


def phase_d2s(o):
    """Depth-to-space for a [N, H, W, 2, 2, F] phase-layout tensor, or a
    raw [N, H, W, 4F] phase-stacked one (channel = (a*2+b)*F + f); the
    reshape fuses into the transpose copy."""
    if o.ndim == 4:
        n, h, w, c4 = o.shape
        o = o.reshape(n, h, w, 2, 2, c4 // 4)
    n, h, w = o.shape[:3]
    f = o.shape[-1]
    return o.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, f)


class _FusedUpConv(nn.Module):
    """Name-compatible stand-in for the TorchConv child of UpsampleConv."""
    features: int
    kernel_size: int
    use_bias: bool = True
    dtype: object = None
    defer_d2s: bool = False
    raw4: bool = False

    @nn.compact
    def __call__(self, x):
        return _PhaseConv(self.features, self.kernel_size,
                          use_bias=self.use_bias, dtype=self.dtype,
                          defer_d2s=self.defer_d2s, raw4=self.raw4,
                          name="Conv_0")(x)


class UpsampleConv(nn.Module):
    """Nearest-2x upsample + same-padded conv (reference DCResNet_models.py:8-17).

    Computed in collapsed phase form (see _PhaseConv); for the 1x1 shortcut
    the conv commutes with the upsample exactly, so it runs at low res
    (4x fewer MACs). Param tree is identical to the naive
    TorchConv(upsample(x)) formulation.
    """
    features: int
    kernel_size: int
    use_bias: bool = True
    dtype: object = None
    defer_d2s: bool = False   # k>1 only: return [N,H,W,2,2,F] phase layout
    raw4: bool = False        # with defer_d2s: raw [N,H,W,4F] instead
    ref_ps: bool = False      # reference-interop: cat-x4 + pixel_shuffle
    #                           upsampling (channel-scrambled; see
    #                           common.ref_pixel_shuffle_upsample_2x)

    @nn.compact
    def __call__(self, x):
        if self.ref_ps:
            # Naive correctness path for converted reference checkpoints:
            # the scramble makes the conv's effective input-channel wiring
            # phase-dependent, so the phase-fused form does not apply.
            # Param tree is unchanged (TorchConv_0/Conv_0 in both branches).
            up = ref_pixel_shuffle_upsample_2x(x)
            return TorchConv(self.features, self.kernel_size, padding="SAME",
                             use_bias=self.use_bias, dtype=self.dtype,
                             name="TorchConv_0")(up)
        if self.kernel_size == 1:
            if self.defer_d2s:
                raise ValueError(
                    "defer_d2s requires kernel_size > 1 (the 1x1 shortcut "
                    "path has no phase layout)")
            return upsample_nearest_2x(
                TorchConv(self.features, 1, padding="SAME",
                          use_bias=self.use_bias, dtype=self.dtype)(x))
        return _FusedUpConv(self.features, self.kernel_size,
                            use_bias=self.use_bias, dtype=self.dtype,
                            defer_d2s=self.defer_d2s, raw4=self.raw4,
                            name="TorchConv_0")(x)


class ResBlockUp(nn.Module):
    """Upsampling residual block (reference DCResNet_models.py:19-38)."""
    features: int
    kernel_size: int = 5
    bn: bool = True
    dtype: object = None
    ref_ps: bool = False
    phase_gn4: bool = True   # GroupNorm_1 consumes the fused upsample-
    #                          conv's raw [N,H,W,4F] output (phase_tiles=4)
    #                          instead of the 6-D phase view — same math,
    #                          full-lane layout (--phase_gn4)
    phase_gn4_max_f: int = -1  # apply the raw-4F form only to blocks with
    #                            features <= this (-1 = all): the 6-D view
    #                            only wastes lanes for F < 128, and wide
    #                            blocks' raw-4F GN BACKWARD is a measured
    #                            cost — so the G-update call site may cap
    #                            it while forward-only sites (D-step fakes,
    #                            sampling) use all blocks
    #                            (--phase_gn4_max_f).

    @nn.compact
    def __call__(self, x, train: bool = True):
        s = UpsampleConv(self.features, 1, dtype=self.dtype,
                         ref_ps=self.ref_ps)(x)

        # Norm layers compute fp32 even under --bf16 (precision-sensitive;
        # the convs carry the MXU bf16 win).
        if self.bn:
            o = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                             use_running_average=not train)(x.astype(jnp.float32))
            o = nn.relu(o)
        else:
            o = _GroupNormRelu(name="GroupNorm_0")(x)
        # The second norm + relu runs in the phase layout the fused
        # upsample-conv produces: both are spatial-permutation-invariant
        # (per-channel/per-group stats over all non-feature axes, then
        # elementwise), so the values are identical and the depth-to-space
        # transpose moves next to its single consumer (the conv below)
        # instead of being materialized fp32 for the norm's reads.
        # BatchNorm is per-channel over ALL other axes, which is only
        # phase-correct in the 6-D view; the raw-4F form is GN-only.
        max_f = self.phase_gn4_max_f if self.phase_gn4_max_f >= 0 \
            else (1 << 30)
        use4 = (self.phase_gn4 and not self.ref_ps and not self.bn
                and self.features <= max_f)
        o = UpsampleConv(self.features, self.kernel_size, use_bias=False,
                         dtype=self.dtype, defer_d2s=not self.ref_ps,
                         raw4=use4, ref_ps=self.ref_ps)(o)
        if self.bn:
            o = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                             use_running_average=not train)(o.astype(jnp.float32))
            o = nn.relu(o)
        else:
            o = _GroupNormRelu(name="GroupNorm_1",
                               phase_tiles=4 if use4 else 1)(o)
        if not self.ref_ps:   # ref_ps path is already full-res
            o = phase_d2s(o)
        o = TorchConv(self.features, self.kernel_size, padding="SAME",
                      dtype=self.dtype)(o)

        return o + s


class DCResNetGenerator(nn.Module):
    """Reference DCResNet_models.py:72-107."""
    channels: Sequence[int]
    first_filter_size: int
    z_dim: int = 128
    out_ch: int = 3
    n_classes: int = 0
    emb_mode: str = "concat"
    bn: bool = True
    dtype: object = None   # compute dtype (--bf16); params stay fp32
    ref_ps: bool = False   # reference-interop upsampling (see UpsampleConv)
    phase_gn4: bool = True  # raw-4F GroupNorm in the upsample blocks
    phase_gn4_max_f: int = -1  # per-block feature cutoff for phase_gn4
    #                            (-1 = all blocks; see ResBlockUp)

    family = "wgan"

    @nn.compact
    def __call__(self, z, y: Optional[jnp.ndarray] = None, train: bool = True):
        x = z
        if y is not None:
            if self.emb_mode == "embed":
                emb = nn.Embed(self.n_classes, self.z_dim,
                               embedding_init=nn.initializers.normal(1.0))(y)
                x = z * emb
            elif self.emb_mode == "concat":
                x = jnp.concatenate([z, one_hot(y, self.n_classes)], axis=1)

        x = TorchDense(self.first_filter_size ** 2 * self.channels[0],
                       dtype=self.dtype)(x)
        x = x.reshape(z.shape[0], self.first_filter_size, self.first_filter_size,
                      self.channels[0])

        for ch in self.channels[1:]:
            x = ResBlockUp(ch, 5, bn=self.bn, dtype=self.dtype,
                           ref_ps=self.ref_ps,
                           phase_gn4=self.phase_gn4,
                           phase_gn4_max_f=self.phase_gn4_max_f)(
                x, train=train)

        if self.bn:
            x = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                             use_running_average=not train)(x.astype(jnp.float32))
            x = nn.relu(x)
        else:
            x = _GroupNormRelu(name="GroupNorm_0")(x)
        x = TorchConv(self.out_ch, 3, padding="SAME", dtype=self.dtype)(x)
        return nn.tanh(x.astype(jnp.float32))


class DCResNetDiscriminator(nn.Module):
    """Reference DCResNet_models.py:109-153."""
    channels: Sequence[int]          # [in_ch, c1, c2, ...]
    last_filter_size: int
    n_classes: int = 0
    emb_mode: str = "concat"
    conditional_arch: str = "ACGAN"
    aux_loss_type: str = "wasserstein"
    aux_loss_scalar: float = 1.0
    dtype: object = None   # compute dtype (--bf16); params stay fp32

    family = "wgan"

    @property
    def effective_emb_mode(self):
        # Base Discriminator nulls emb_mode for ACGAN (reference models.py:36-37).
        if self.n_classes > 1 and self.conditional_arch == "ACGAN":
            return None
        return self.emb_mode

    @nn.compact
    def __call__(self, x, y: Optional[jnp.ndarray] = None, aux: bool = True):
        if self.n_classes > 1 and self.emb_mode == "embed":
            raise Exception("Embed for D not implemented")

        o = x
        if self.effective_emb_mode == "concat" and self.n_classes > 1 and y is not None:
            planes = one_hot(y, self.n_classes)[:, None, None, :]
            planes = jnp.broadcast_to(
                planes, (x.shape[0], x.shape[1], x.shape[2], self.n_classes))
            o = jnp.concatenate([o, planes], axis=-1)

        for ch in self.channels[1:]:
            o = nn.leaky_relu(TorchConv(ch, 5, strides=2, padding=2,
                                        dtype=self.dtype)(o),
                              negative_slope=0.2)

        o = o.reshape(x.shape[0], -1)

        aux_out = None
        # For WCGAN the aux head IS the critic, so it is computed regardless
        # of the `aux` flag (calling reference D(aux=False) under WCGAN would
        # crash on the missing linOut — do-not-copy list, SURVEY.md §7).
        if self.n_classes > 1 and self.conditional_arch in ("ACGAN", "WCGAN") \
                and (aux or self.conditional_arch == "WCGAN"):
            aux_out = TorchDense(self.n_classes, use_bias=True,
                                 dtype=self.dtype, name="linOutAux")(o)

        if aux_out is not None and self.conditional_arch == "WCGAN":
            out = jnp.sum(aux_out * one_hot(y, self.n_classes), axis=1, keepdims=True)
        else:
            out = TorchDense(1, use_bias=False, dtype=self.dtype,
                             name="linOut")(o)

        return out, aux_out


# --- Dataset-specific presets (reference CelebA_models.py, MNIST_models.py:54-60) ---

def celeba_g64(**kw):
    return DCResNetGenerator(channels=[512, 512, 256, 128, 64], first_filter_size=4,
                             out_ch=3, **kw)


def celeba_d64(**kw):
    return DCResNetDiscriminator(channels=[3, 64, 128, 256, 512], last_filter_size=4, **kw)


def celeba_g48(**kw):
    return DCResNetGenerator(channels=[512, 512, 256, 128], first_filter_size=6,
                             out_ch=3, **kw)


def celeba_d48(**kw):
    return DCResNetDiscriminator(channels=[3, 128, 256, 512], last_filter_size=6, **kw)


def mnist_dcrn_g(**kw):
    kw.setdefault("z_dim", 128)
    return DCResNetGenerator(channels=[128, 128, 64], first_filter_size=7,
                             out_ch=1, **kw)


def mnist_dcrn_d(**kw):
    return DCResNetDiscriminator(channels=[1, 64, 128], last_filter_size=7, **kw)
