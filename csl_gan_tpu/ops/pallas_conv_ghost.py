"""Pallas TPU kernels for the conv ghost-clipping hot path (ops/conv_ghost.py).

The ghost-order layers of `dcresnet_real_ghost` need, per conv layer,

    norms:  ||g_W(i)||^2 = < U_i U_i^T , C_i C_i^T >          (per sample)
    sum:    sum_i w_i U_i^T C_i                               (clipped grad)

with U_i the im2col patches of the layer input and C_i the output cotangent.
XLA evaluates these through a MATERIALIZED patch tensor: on the CelebA bf16
flagship, conv2's [128, 16, 16, 1600] im2col buffer alone is 105 MB written
and re-read twice per step — the single largest HLO in the step trace
(tools/xplane_summary.py: 0.93 ms the patch fusion + 0.21 ms a relayout
copy, of a 14.2 ms step; conv3's buffer adds 0.44 ms).

These kernels never form the patch tensor. Both exploit the δ-decomposition
of im2col — with X_δ[t, c] = x[s*t + δ, c] a plain slice of the (pre-padded,
stride-phase-split — see prepare_phases) input, U = concat_δ X_δ along the
feature axis — so

    U U^T  = Σ_δ X_δ X_δ^T            (ghost_sq_norms)
    U^T Cw = rows_δ( X_δ^T Cw )       (weighted_kernel_grad)

and every operand is a strided VMEM view of an activation block that is read
from HBM exactly once. δ-pairs are packed so each MXU dot runs at K (norms)
or M (sum) = 2*C = 128 lanes — full systolic-array width for the flagship's
64-channel layer. The weighted sum additionally concatenates the block's
samples along the contraction axis (K = tb*S) and accumulates the [K_w, O]
gradient across grid steps in the revisited output block, so the whole
clipped sum is one pass over (x, c).

HBM traffic per ghost layer drops from ~3 reads + 1 write of the patch
tensor (+ two [B, S, S] Gram round-trips) to one read of x and c per
kernel. Per-sample Gram/product math is bf16-operand, fp32-accumulated —
the same contract as the XLA path, so conv_ghost's _BF16_NORM_MARGIN
rigor argument carries over unchanged.

MEASURED (v5e-1, CelebA bf16 flagship, RESULTS.md): in isolation the
jitted (norms + wsum) pair beats the XLA im2col formulation 2.73 -> 1.40 ms
(conv1 shapes) and 2.08 -> 1.47 ms (conv2), and the isolated
dcresnet_real_ghost pass drops 5.07 -> 3.50 ms — but the FULL donated
d_step only improves 14.65 -> 14.43 ms best-of-10: most of the kernel-level
win is given back to layout-conversion copies XLA inserts around the
pallas_call boundary (operands are forced to DEFAULT layouts, so the
{3,0,2,1}-laid-out cotangents/activations of the surrounding convs are
re-copied; the trace swaps the 0.93 ms patch fusion for ~0.7 ms of new
copy/slice traffic). Kept: the win is real if small, the math is exact,
and the kernels are the platform for future layout work (passing
physically-matching logical transposes would make the boundary copies
bitcasts).

Used by ops/conv_ghost.py when `use_pallas(dt)` (TPU backend, single device,
bf16 compute —
under GSPMD sharding a pallas_call would force a gather; multi-chip uses
the XLA path). CPU equivalence tests run in interpret mode
(tests/test_pallas_conv_ghost.py); real-TPU checks in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FORCE=True/False overrides the backend auto-detection (tests); INTERPRET
# runs the kernels interpreted (CPU equivalence tests).
FORCE: bool | None = None
INTERPRET: bool = False

# Per-grid-step VMEM budget for the input blocks (bytes). The padded-x and
# cotangent blocks are double-buffered by the pipeline; norms adds two
# [S, S] fp32 Grams, the sum a [K_w, O] fp32 accumulator.
_IN_BLOCK_BYTES = 4 * 1024 * 1024

# Mosaic's default scoped-VMEM (stack) limit is 16 MB; the wsum kernel's
# unrolled δ-pair loop keeps ~K/2 concatenated [tb*T, 2C] slices live on
# the stack (conv2 at tb=16: 20.3 MB — compile-time OOM at the default).
# v5e has 128 MB of VMEM; 64 MB leaves the double-buffered blocks ample room.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def use_pallas(compute_dtype=None) -> bool:
    """Auto-dispatch gate: single-device TPU AND bf16 compute only.

    The kernels' Gram/product dots are written for bf16 operands (MXU fast
    path, fp32 accumulation). With fp32 operands they LOSE badly: the full
    fp32 flagship d_step measured 39.7 ms with the kernels vs 23.7 ms on
    the XLA im2col path (A/B with fresh closures + clear_caches, v5e-1),
    because fp32 dots run the MXU at a fraction of bf16 rate while the
    fp32 XLA path gets the conv-vjp weighted sum for free. FORCE overrides
    everything (tests)."""
    if FORCE is not None:
        return bool(FORCE)
    return (compute_dtype is not None
            and jax.default_backend() == "tpu" and jax.device_count() == 1)


# The weighted-sum kernel holds the full [kh*kw*cin, cout] fp32 gradient
# accumulator resident in VMEM; deep layers (CelebA conv4: [6400, 512] =
# 13 MB) don't fit next to the double-buffered input blocks.
_MAX_ACC_BYTES = 4 * 1024 * 1024


def supported(kernel_shape) -> bool:
    kh, kw, cin, cout = kernel_shape
    return kh * kw * cin * cout * 4 <= _MAX_ACC_BYTES


def _batch_tile(b: int, in_bytes_per_sample: int) -> int:
    cap = max(1, _IN_BLOCK_BYTES // max(1, in_bytes_per_sample))
    for tb in range(min(b, cap), 0, -1):
        if b % tb == 0:
            return tb
    return 1


def _geometry(a_shape, c_shape, kh, kw, stride, pad):
    b, h, w, cin = a_shape
    _, ho, wo, o = c_shape
    hp, wp = h + 2 * pad, w + 2 * pad
    assert kh + stride * (ho - 1) <= hp and kw + stride * (wo - 1) <= wp, (
        a_shape, c_shape, kh, kw, stride, pad)
    return hp, wp, ho, wo, cin, o


def prepare_phases(a, stride: int, pad: int):
    """Pad and split the layer input into stride-phases:
    [B, s, s, ceil(Hp/s), ceil(Wp/s), C] with
    out[b, ph, pw, i, j, c] = x_padded[b, s*i + ph, s*j + pw, c].

    Mosaic has no strided vector slices, so X_δ must be a UNIT-stride
    in-kernel slice: X_δ[t=(i,j)] = x_pad[s*i + dh, s*j + dw] =
    phases[dh % s, dw % s][dh//s + i, dw//s + j]. The relayout is one
    XLA transpose of the (already-read) activation, shared by both
    kernels of a layer (call once, pass to both)."""
    b, h, w, cin = a.shape
    hp, wp = h + 2 * pad, w + 2 * pad
    hr = -(-hp // stride) * stride
    wr = -(-wp // stride) * stride
    # The barrier decouples layout assignment: pallas custom-calls force
    # DEFAULT layouts on their operands, and without it XLA flips the
    # activation's canonical layout ({3,0,2,1} batch-second-minor, chosen
    # by the fake/penalty backprop convs) to feed this chain, slowing every
    # OTHER consumer (measured: +1.1 ms/step across the conv3 update and
    # the backprop-filter fusions — more than the kernels save).
    a = jax.lax.optimization_barrier(a)
    ap = jnp.pad(a, ((0, 0), (pad, pad + hr - hp), (pad, pad + wr - wp),
                     (0, 0)))
    ap = ap.reshape(b, hr // stride, stride, wr // stride, stride, cin)
    return ap.transpose(0, 2, 4, 1, 3, 5)


def _delta_slice(phases_j, dh, dw, ho, wo, stride):
    """X_δ: [Ho*Wo, C] unit-stride slice of one sample's phase view
    phases_j [s, s, Hp/s, Wp/s, C]."""
    av = phases_j[dh % stride, dw % stride]
    sl = av[dh // stride: dh // stride + ho,
            dw // stride: dw // stride + wo, :]
    return sl.reshape(ho * wo, av.shape[-1])


def _delta_pairs(kh, kw):
    """δ offsets grouped in pairs (lane-packing the per-δ C columns to 2C)."""
    deltas = [(dh, dw) for dh in range(kh) for dw in range(kw)]
    return [tuple(deltas[i:i + 2]) for i in range(0, len(deltas), 2)]


def _norms_kernel(ap_ref, c_ref, out_ref, *, kh, kw, stride, ho, wo,
                  precision):
    tb = ap_ref.shape[0]
    t = ho * wo
    kw_dot = dict(preferred_element_type=jnp.float32, precision=precision)
    i = pl.program_id(0)
    for j in range(tb):
        av = ap_ref[j]          # [s, s, Hp/s, Wp/s, C] phase view
        c3 = c_ref[j].reshape(t, c_ref.shape[-1])
        gb = jax.lax.dot_general(c3, c3, (((1,), (1,)), ((), ())), **kw_dot)
        ga = jnp.zeros((t, t), jnp.float32)
        for pair in _delta_pairs(kh, kw):
            xs = [_delta_slice(av, dh, dw, ho, wo, stride) for dh, dw in pair]
            xp = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1)
            ga = ga + jax.lax.dot_general(
                xp, xp, (((1,), (1,)), ((), ())), **kw_dot)
        # out is the WHOLE [nb, tb] array as one revisited SMEM block (TPU
        # block rules forbid a (1, tb) row block); step i owns row i.
        out_ref[i, j] = jnp.sum(ga * gb)


def ghost_sq_norms(a, c, kh: int, kw: int, stride: int, pad: int,
                   phases=None):
    """Per-sample squared conv-kernel-grad norms < U U^T, C C^T > — the
    ghost-order factorization of ops/conv_ghost._conv_kernel_sq_norms —
    without materializing the im2col patch tensor.

    a: layer input [B, H, W, Cin]; c: pre-activation cotangent
    [B, Ho, Wo, O]. Returns [B] fp32. bf16 inputs use MXU fast dots with
    fp32 accumulation (same contract as the XLA einsum path); fp32 inputs
    use HIGHEST precision (exact multi-pass). `phases` (optional) is the
    shared prepare_phases(a, stride, pad) relayout.
    """
    b = a.shape[0]
    hp, wp, ho, wo, cin, o = _geometry(a.shape, c.shape, kh, kw, stride, pad)
    if phases is None:
        phases = prepare_phases(a, stride, pad)
    _, s1, s2, hr, wr, _ = phases.shape
    c = jax.lax.optimization_barrier(c)   # see prepare_phases on layouts
    esz = a.dtype.itemsize
    tb = _batch_tile(b, (s1 * s2 * hr * wr * cin + ho * wo * o) * esz)
    precision = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kern = functools.partial(_norms_kernel, kh=kh, kw=kw, stride=stride,
                             ho=ho, wo=wo, precision=precision)
    out = pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, s1, s2, hr, wr, cin),
                         lambda i: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, ho, wo, o), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b // tb, tb), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b // tb, tb), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(phases, c)
    return out.reshape(b)


def _wsum_kernel(ap_ref, cw_ref, out_ref, *, kh, kw, stride, ho, wo,
                 precision):
    i = pl.program_id(0)
    tb = ap_ref.shape[0]
    t = ho * wo
    o = cw_ref.shape[-1]

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cw = cw_ref[:].reshape(tb * t, o)
    kw_dot = dict(preferred_element_type=jnp.float32, precision=precision)
    phases = [ap_ref[j] for j in range(tb)]
    row = 0
    for pair in _delta_pairs(kh, kw):
        xs = []
        for dh, dw in pair:
            # samples concatenated along the contraction axis: the pair
            # block is [tb*T, len(pair)*C], contracted against cw [tb*T, O].
            xs.append(jnp.concatenate(
                [_delta_slice(phases[j], dh, dw, ho, wo, stride)
                 for j in range(tb)], axis=0))
        xp = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1)
        g = jax.lax.dot_general(xp, cw, (((0,), (0,)), ((), ())), **kw_dot)
        out_ref[pl.ds(row, g.shape[0]), :] = out_ref[pl.ds(row, g.shape[0]), :] + g
        row += g.shape[0]


def weighted_kernel_grad(a, c, w_fac, kernel_shape, stride: int, pad: int,
                         phases=None):
    """sum_i w_i U_i^T C_i -> conv kernel grad [kh, kw, cin, cout] fp32,
    accumulated across the batch grid in the revisited output block — one
    HBM pass over (x, c), no patch tensor, fp32 output (the DP-rigor
    requirement of ops/conv_ghost._conv_kernel_weighted_sum).

    The clip factors scale the cotangent at the INPUT dtype (bf16 rounding
    covered by conv_ghost._BF16_NORM_MARGIN, same as the XLA path).
    """
    kh, kw, cin, cout = kernel_shape
    b = a.shape[0]
    hp, wp, ho, wo, _, o = _geometry(a.shape, c.shape, kh, kw, stride, pad)
    assert cin == a.shape[-1] and cout == o
    if phases is None:
        phases = prepare_phases(a, stride, pad)
    _, s1, s2, hr, wr, _ = phases.shape
    c = jax.lax.optimization_barrier(c)   # see prepare_phases on layouts
    cw = (c.astype(jnp.float32) * w_fac[:, None, None, None]).astype(c.dtype)
    esz = a.dtype.itemsize
    tb = _batch_tile(b, (s1 * s2 * hr * wr * cin + ho * wo * o) * esz)
    precision = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kern = functools.partial(_wsum_kernel, kh=kh, kw=kw, stride=stride,
                             ho=ho, wo=wo, precision=precision)
    k_rows = kh * kw * cin
    out = pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, s1, s2, hr, wr, cin),
                         lambda i: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, ho, wo, o), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_rows, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_rows, cout), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(phases, cw)
    # rows are (dh, dw, cin)-major by construction
    return out.reshape(kh, kw, cin, cout)
