"""Pallas TPU kernel: fused per-sample-weighted gradient sum + DP noise.

The DP-SGD second pass — `out[p] = sum_b w[b] * g[b, p] + std * N(0, 1)` —
is the bandwidth-bound step of gradient-clipping DP: it reads the whole
[B, P] per-sample-gradient block from HBM. XLA implements it as a reduce
plus a separately generated noise tensor (one extra P-sized HBM write+read);
this kernel does it in one pass:

  - the weighted sum runs as a [1, B] x [B, TILE] matmul per tile on the MXU;
  - Gaussian noise is generated in-register from the per-core PRNG
    (Box-Muller over `pltpu.prng_random_bits`) and fused into the same tile.

Used by the gc train step for large parameter leaves on TPU when
``--pallas true``; small leaves and non-TPU backends use the XLA path in
ops/grads.py (same weighted sum, different — but equally valid — noise
stream).

Measured tradeoff (v5e, MNIST cond gc bs=600): standalone, this kernel beats
the equivalent XLA einsum+noise by ~19% (one HBM pass instead of two). In
the FULL train step, however, XLA's transpose/fusion rules rewrite
vmap(grad)->weighted-sum into a single matmul that never materializes the
[B, P] per-sample-grad block at all (the "ghost clipping" rewrite, for
free), so forcing this kernel — which requires the materialized block —
makes the whole step ~2x slower. Hence --pallas defaults to off; the kernel
is the right tool only where per-sample grads are materialized anyway
(tm/sv-style aggregations or ad-hoc analyses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_TILE = 2048  # elements per grid step (multiple of LANE)
MIN_PALLAS_ELEMS = 1 << 14  # leaves smaller than this use the XLA path


def _normal_from_bits(shape):
    """Standard normals via Box-Muller over two uint32 draws."""
    # prng_random_bits yields int32 bit patterns; bitcast before shifting so
    # the shift is logical, not arithmetic (else negative "uniforms" -> NaN).
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # 24-bit mantissa uniforms in (0, 1): (bits >> 8) * 2^-24 + 2^-25.
    # Mosaic can't cast uint32->f32; after the logical shift the top byte is
    # zero, so bitcast to int32 (non-negative) and cast from there.
    i1 = pltpu.bitcast(b1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(b2 >> 8, jnp.int32)
    u1 = i1.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
    u2 = i2.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * np.pi * u2)


def _kernel(seed_ref, std_ref, w_ref, g_ref, out_ref):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    # HIGHEST precision: the clipped-grad sum is the DP signal; a single
    # bf16 MXU pass would cost ~1e-3 relative error.
    acc = jax.lax.dot_general(
        w_ref[:], g_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [1, TILE]
    std = std_ref[0]
    out_ref[:] = acc + std * _normal_from_bits(acc.shape)


def weighted_sum_noise_2d(g2d: jnp.ndarray, w: jnp.ndarray, seed,
                          std, tile: int = DEFAULT_TILE) -> jnp.ndarray:
    """out[p] = sum_b w[b] g2d[b, p] + std * N(0,1), via the fused kernel.

    g2d: [B, P] with P a multiple of 128 (caller pads); w: [B];
    seed: int32 scalar; std: f32 scalar (0 => deterministic, noise skipped
    mathematically but still generated — pass std=0.0 for exactness tests).
    """
    b, p = g2d.shape
    assert p % LANE == 0, "P must be padded to a lane multiple"
    tile = min(tile, p)
    while p % tile:
        tile //= 2
    grid = p // tile

    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # seed, std
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, b), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, tile), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, p), jnp.float32),
    )(jnp.asarray([seed], jnp.int32).reshape(1),
      jnp.asarray([std], jnp.float32).reshape(1),
      w.reshape(1, b).astype(jnp.float32),
      g2d.astype(jnp.float32))
    return out[0]


def leaf_weighted_sum_noise(g: jnp.ndarray, w: jnp.ndarray, seed, std):
    """Apply the fused kernel to one per-sample-grad leaf [B, ...] -> [...],
    padding the flattened parameter dim to a lane multiple."""
    b = g.shape[0]
    shape = g.shape[1:]
    p = int(np.prod(shape)) if shape else 1
    p_pad = ((p + LANE - 1) // LANE) * LANE
    g2d = g.reshape(b, p)
    if p_pad != p:
        g2d = jnp.pad(g2d, ((0, 0), (0, p_pad - p)))
    out = weighted_sum_noise_2d(g2d, w, seed, std)
    return out[:p].reshape(shape)


def available() -> bool:
    return jax.default_backend() == "tpu"
