"""Fused GroupNorm + ReLU: XLA formulation + an opt-in Pallas kernel pair.

The DCResNet generator's norm layers (reference DCResNet_models.py:24-36
``nn.GroupNorm(32)`` when per-sample-grad mode disables BatchNorm) are a
bandwidth hotspot of both CelebA train steps. This module provides the
relu(GroupNorm(x)) op used by models/dcresnet.py `_GroupNormRelu` with two
implementations:

- `_gn_relu_xla` (DEFAULT): layout-aware jnp formulation (fp32-accumulated
  per-channel spatial sums, tiny [B, C] group collapse, one elementwise
  normalize+relu; autodiff backward). XLA fuses the stats into the
  producing pass and the normalize+relu into the consumers, with no
  materialized fp32 copy of the activation (see the function docstring).
- A hand-written Pallas kernel pair (forward + custom-vjp backward) doing
  the whole op in one HBM read + one write per tensor: per-(sample, group)
  mean/var in fp32 in VMEM, normalize+affine+ReLU from the resident block;
  backward recomputes the stats and forms

      dx = rstd * (dz*g - mean_grp(dz*g) - xhat * mean_grp(dz*g*xhat))

  with dz = dy * 1[z > 0], plus per-block dgamma/dbeta rows, from one read
  of (x, dy). Group collapse / broadcast-back use tiny one-hot [C, G]
  matmuls on the MXU at HIGHEST precision (exact; DEFAULT precision's bf16
  truncation measurably perturbs the stats).

MEASURED RESULT (v5e-1, CelebA bf16 flagship, RESULTS.md): the Pallas
version LOSES to XLA's lowering — D step 14.2 -> 16.0 ms device-busy,
G step 17.7 -> 21.8 ms, and slower standalone too ([128,64,64,64]
fwd+bwd: pallas 3.2 ms vs XLA 2.1 ms incl. dispatch). Causes: pallas_call
is a fusion barrier (residual adds / casts XLA previously folded into the
norm passes become standalone HBM round-trips), the C=64 layers fill only
half the VPU lanes, and the VMEM-bounded tb=1 grid (128 sequential steps)
pays per-step overhead. Lane-packing would at best reach parity, so the
Pallas path stays OPT-IN (`FORCE = True`; exercised by
tests/test_groupnorm.py in interpret mode and tests/test_pallas.py on
real TPU) and the default dispatch is the XLA formulation everywhere.

Numerics of both paths match flax ``nn.GroupNorm(num_groups, epsilon)``
applied to the fp32-cast input followed by ``nn.relu`` up to reduction
order (tests/test_groupnorm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FORCE=True opts in to the Pallas kernels (measured slower than the XLA
# path on v5e — module docstring); INTERPRET runs them interpreted (CPU
# tests). Only meaningful on a single-device backend: under GSPMD sharding
# a pallas_call would force a gather.
FORCE: bool | None = None
INTERPRET: bool = False

# VMEM budget heuristic: block element cap. The bwd kernel holds x, dy, dx
# plus a few fp32 temporaries (~22 B/elem worst case); 256K elems keeps the
# live set well under the ~16 MB/core VMEM.
_BLOCK_ELEMS = 256 * 1024


def use_pallas() -> bool:
    # Default False: the XLA formulation measured faster (module docstring).
    return bool(FORCE)


def _batch_tile(b: int, hw: int, c: int) -> int:
    """Largest divisor of b with tb*hw*c <= _BLOCK_ELEMS (min 1)."""
    cap = max(1, _BLOCK_ELEMS // max(1, hw * c))
    for tb in range(min(b, cap), 0, -1):
        if b % tb == 0:
            return tb
    return 1


def _group_mats(c: int, groups: int):
    """One-hot collapse [C, G] and broadcast [G, C] matrices (fp32)."""
    cg = c // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch // cg == gr).astype(jnp.float32)          # [C, G]
    ch2 = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1)
    gr2 = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
    m_t = (ch2 // cg == gr2).astype(jnp.float32)      # [G, C]
    return m, m_t


def _stats(xf, groups: int, eps: float):
    """Per-(sample, group) mean/rstd of xf [TB, HW, C], broadcast to [TB, C]."""
    tb, hw, c = xf.shape
    m, m_t = _group_mats(c, groups)
    n = hw * (c // groups)
    s = jnp.sum(xf, axis=1)                            # [TB, C]
    sq = jnp.sum(xf * xf, axis=1)                      # [TB, C]
    gs = jnp.dot(s, m, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) / n     # [TB, G]
    gsq = jnp.dot(sq, m, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) / n   # [TB, G]
    var = jnp.maximum(gsq - gs * gs, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mu_c = jnp.dot(gs, m_t, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)    # [TB, C]
    rstd_c = jnp.dot(rstd, m_t, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    return mu_c, rstd_c, m, m_t


def _fwd_kernel(x_ref, scale_ref, bias_ref, y_ref, *, groups: int, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    mu_c, rstd_c, _, _ = _stats(xf, groups, eps)
    xhat = (xf - mu_c[:, None, :]) * rstd_c[:, None, :]
    z = xhat * scale_ref[0][None, None, :] + bias_ref[0][None, None, :]
    y_ref[:] = jnp.maximum(z, 0.0).astype(y_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, scale_ref, bias_ref,
                dx_ref, dg_ref, db_ref, *, groups: int, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    mu_c, rstd_c, m, m_t = _stats(xf, groups, eps)
    xhat = (xf - mu_c[:, None, :]) * rstd_c[:, None, :]
    g = scale_ref[0][None, None, :]
    z = xhat * g + bias_ref[0][None, None, :]
    dz = dy_ref[:].astype(jnp.float32) * (z > 0.0)
    # per-channel reductions for the param grads (summed over this block's
    # samples; the caller sums the per-block rows). The [nb, C] buffers are
    # whole-array blocks (TPU tiling forbids 1-row blocks); each grid step
    # writes its own row.
    i = pl.program_id(0)
    dg_ref[i] = jnp.sum(dz * xhat, axis=(0, 1))
    db_ref[i] = jnp.sum(dz, axis=(0, 1))
    # GroupNorm input cotangent.
    n = xf.shape[1] * (xf.shape[2] // groups)
    dxh = dz * g                                       # [TB, HW, C]
    s2 = jnp.dot(jnp.sum(dxh, axis=1), m,
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) / n          # [TB, G]
    s1 = jnp.dot(jnp.sum(dxh * xhat, axis=1), m,
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) / n          # [TB, G]
    s2_c = jnp.dot(s2, m_t, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    s1_c = jnp.dot(s1, m_t, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    dx = rstd_c[:, None, :] * (dxh - s2_c[:, None, :]
                               - xhat * s1_c[:, None, :])
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pallas_fwd(x3, scale, bias, groups: int, eps: float):
    b, hw, c = x3.shape
    tb = _batch_tile(b, hw, c)
    grid = (b // tb,)
    kern = functools.partial(_fwd_kernel, groups=groups, eps=eps)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
        interpret=INTERPRET,
    )(x3, scale[None], bias[None])


def _pallas_bwd(x3, dy3, scale, bias, groups: int, eps: float):
    b, hw, c = x3.shape
    tb = _batch_tile(b, hw, c)
    nb = b // tb
    kern = functools.partial(_bwd_kernel, groups=groups, eps=eps)
    dx, dg_rows, db_rows = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
            jax.ShapeDtypeStruct((nb, c), jnp.float32),
            jax.ShapeDtypeStruct((nb, c), jnp.float32),
        ),
        interpret=INTERPRET,
    )(x3, dy3, scale[None], bias[None])
    return dx, jnp.sum(dg_rows, axis=0), jnp.sum(db_rows, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_relu_pallas(x3, scale, bias, groups, eps):
    return _pallas_fwd(x3, scale, bias, groups, eps)


def _gn_relu_pallas_fwd(x3, scale, bias, groups, eps):
    return _pallas_fwd(x3, scale, bias, groups, eps), (x3, scale, bias)


def _gn_relu_pallas_bwd(groups, eps, res, dy3):
    x3, scale, bias = res
    dx, dg, db = _pallas_bwd(x3, dy3, scale, bias, groups, eps)
    return dx, dg, db


_gn_relu_pallas.defvjp(_gn_relu_pallas_fwd, _gn_relu_pallas_bwd)


def _gn_relu_xla(x, scale, bias, groups: int, eps: float, tiles: int = 1):
    """Reference/fallback: flax-GroupNorm math (fp32 stats) + relu, output
    in x.dtype (autodiff backward).

    ``tiles > 1``: the channel axis is ``tiles`` stacked copies of the
    logical C channels (the fused upsample-conv's raw [N, H, W, 4F] output,
    channel index = phase*F + f — models/dcresnet.py). Stats for logical
    channel f pool the spatial axes AND the ``tiles`` phase copies: the
    per-(B, tiles*C) spatial sums collapse over the tiny phase axis first,
    and the [B, C] affine tiles back to [B, tiles*C]. Identical math to
    reshaping to [..., 2, 2, F] and normalizing there (phases are spatial
    positions), but every big-tensor op keeps the conv's own full-lane
    layout — the 6-D phase view halves lane utilization for F=64 stages
    and forced relayout copies at the conv/GN boundary.

    Layout-aware formulation: reduce over the SPATIAL axes per channel
    first (channel-minor, well-tiled, fuses into the producing pass with
    fp32 accumulation via the reduction dtype), then collapse channels to
    groups on the tiny [B, C] sums. The naive
    ``x.astype(f32).reshape(b, -1, g, c//g).mean((1, 3))`` form makes the
    minor dimension c//g (= 2 for the DCResNet 64-channel layers), which
    wastes 126/128 lanes of every (8,128) tile and forced XLA to
    materialize two full fp32 relayout copies of the activation
    (~270 MB/step on the CelebA flagship); this form keeps every big
    tensor bf16 and channel-minor."""
    b = x.shape[0]
    c = x.shape[-1] // tiles
    sp_axes = tuple(range(1, x.ndim - 1))   # spatial axes, in place
    n_spatial = 1
    for d in x.shape[1:-1]:
        n_spatial *= d
    # fp32-accumulated per-channel sums; the convert fuses into the reduce.
    # No reshape anywhere on the big tensor — flattening (H, W) (or the
    # grouped [.., G, C/G] split) breaks the (8,128) tiling of the minor
    # dims and XLA materializes full relayout copies.
    s_c = jnp.sum(x.astype(jnp.float32), axis=sp_axes)         # [B, tiles*C]
    ss_c = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=sp_axes)
    if tiles > 1:
        # Collapse the phase copies on the tiny sums (channel f pools its
        # `tiles` stacked copies).
        s_c = jnp.sum(s_c.reshape(b, tiles, c), axis=1)        # [B, C]
        ss_c = jnp.sum(ss_c.reshape(b, tiles, c), axis=1)
    n = n_spatial * tiles * (c // groups)
    s_g = jnp.sum(s_c.reshape(b, groups, c // groups), axis=2)
    ss_g = jnp.sum(ss_c.reshape(b, groups, c // groups), axis=2)
    mu_g = s_g / n                                              # [B, G]
    var_g = ss_g / n - jnp.square(mu_g)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels ([B, C], tiny)
    mu_c = jnp.repeat(mu_g, c // groups, axis=1)
    rstd_c = jnp.repeat(rstd_g, c // groups, axis=1)
    bcast = (b,) + (1,) * len(sp_axes) + (c * tiles,)
    a = rstd_c * scale[None, :]
    d_ = bias[None, :] - mu_c * rstd_c * scale[None, :]
    if tiles > 1:
        # Tile the [B, C] affine back over the phase copies.
        a = jnp.tile(a, (1, tiles))
        d_ = jnp.tile(d_, (1, tiles))
    a = a.reshape(bcast)
    d_ = d_.reshape(bcast)
    # Apply the affine in x.dtype, with the f32->x.dtype convert as the LAST
    # op after an explicit broadcast_to. Op order is what autodiff
    # transposes: this way (a) the saved relu residual and every big
    # cotangent stay bf16 in --bf16 mode (the f32 form made XLA write f32
    # copies of every GN input cotangent AND save the pre-relu z as f32 —
    # ~0.5 GB/step extra on the CelebA G step, measured 20.7 -> 18.8 ms),
    # and (b) the transposed broadcast still REDUCES IN F32: astype^T =
    # convert-to-f32 runs before the sum and fuses into it, so
    # d(scale)/d(bias)/group-mean accumulations keep fp32 precision (only
    # per-element products round to bf16, the standard mixed-precision
    # contract; measured l2 error of d(scale) vs the f32 path: 8e-4).
    # Cast-before-broadcast would instead transpose to a bf16-accumulated
    # reduce (~20% random-walk error at CelebA sizes).
    #
    # The relu MASK is taken from the f32 affine (stop_gradient, so no f32
    # cotangent path exists): a bf16 z flips the hinge on ~0.2% of elements
    # vs the f32 reference, each flip an O(1) gradient outlier. As a bonus
    # the saved residual is a 1-byte bool instead of the old f32 z. In a
    # no-grad forward the compare fuses into the where, nothing extra
    # materializes; for f32 x everything below folds back to exactly the
    # old `relu(x*a + d)` math.
    af = jnp.broadcast_to(a, x.shape)
    df = jnp.broadcast_to(d_, x.shape)
    pos = (jax.lax.stop_gradient(x).astype(jnp.float32) * af + df) > 0
    pos = jax.lax.stop_gradient(pos)
    z = x * af.astype(x.dtype) + df.astype(x.dtype)
    return jnp.where(pos, z, jnp.zeros((), x.dtype))


def group_norm_relu(x, scale, bias, groups: int = 32, eps: float = 1e-5,
                    tiles: int = 1):
    """relu(GroupNorm(x)) over the channel-last axis of NHWC (or [B, ..., C])
    input; stats in fp32, output in x.dtype. ``tiles``: phase-stacked
    channel axis (see _gn_relu_xla). Pallas-fused on single-device
    TPU (opt-in), identical-math XLA elsewhere."""
    if x.shape[-1] % tiles != 0:
        raise ValueError(
            f"channel axis {x.shape[-1]} not divisible by tiles={tiles} "
            "(phase-stacked input must hold `tiles` whole copies of C)")
    if (x.shape[-1] // tiles) % groups != 0:
        raise ValueError(
            f"channels {x.shape[-1] // tiles} not divisible by "
            f"{groups} groups")
    if tiles > 1 or not use_pallas():
        return _gn_relu_xla(x, scale, bias, groups, eps, tiles)
    b, c = x.shape[0], x.shape[-1]
    x3 = x.reshape(b, -1, c)
    y3 = _gn_relu_pallas(x3, scale.astype(jnp.float32),
                         bias.astype(jnp.float32), groups, eps)
    return y3.reshape(x.shape)
