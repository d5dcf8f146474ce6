"""Interpret-mode equivalence of the Pallas conv-ghost kernels
(ops/pallas_conv_ghost.py) against the XLA im2col formulation in
ops/conv_ghost.py — per-sample ghost norms and the clip-weighted kernel-grad
sum, across geometries (odd batches, non-divisible spatial sizes, stride 1
and 2). Real-TPU runs of the same checks live in tests/test_pallas.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csl_gan_tpu.ops import conv_ghost as cg
from csl_gan_tpu.ops import pallas_conv_ghost as pcg


@pytest.fixture(autouse=True)
def interpret_mode():
    old_force, old_interp = pcg.FORCE, pcg.INTERPRET
    pcg.FORCE, pcg.INTERPRET = True, True
    yield
    pcg.FORCE, pcg.INTERPRET = old_force, old_interp


GEOMS = [
    # (B, H, Cin, Cout, k, stride, pad) — first two are the CelebA flagship
    # ghost-order layers (conv2/conv3) at a reduced batch.
    (8, 32, 64, 128, 5, 2, 2),
    (4, 16, 128, 256, 5, 2, 2),
    (6, 28, 3, 16, 5, 2, 2),     # MNIST-like odd spatial chain
    (8, 8, 16, 32, 3, 1, 1),     # stride 1
    (7, 16, 24, 40, 5, 2, 2),    # odd batch -> tb degrades to a divisor
]


def _data(B, H, C, O, k, st, pad, seed=0):
    ka, kc, kw_ = jax.random.split(jax.random.PRNGKey(seed), 3)
    a = jax.random.normal(ka, (B, H, H, C))
    Ho = (H + 2 * pad - k) // st + 1
    c = jax.random.normal(kc, (B, Ho, Ho, O))
    w = jax.random.uniform(kw_, (B,), minval=0.1, maxval=1.0)
    return a, c, w


@pytest.mark.parametrize("B,H,C,O,k,st,pad", GEOMS)
def test_ghost_sq_norms_matches_xla(B, H, C, O, k, st, pad):
    a, c, _ = _data(B, H, C, O, k, st, pad)
    u = cg._patches(a, k, k, st, pad)
    u3 = u.reshape(B, -1, u.shape[-1])
    c3 = c.reshape(B, -1, O)
    want = jnp.einsum("bst,bst->b",
                      jnp.einsum("bsk,btk->bst", u3, u3),
                      jnp.einsum("bso,bto->bst", c3, c3))
    got = pcg.ghost_sq_norms(a, c, k, k, st, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


@pytest.mark.parametrize("B,H,C,O,k,st,pad", GEOMS)
def test_weighted_kernel_grad_matches_vjp(B, H, C, O, k, st, pad):
    """Pins both the math AND the (kh, kw, cin, cout) row layout against the
    conv vjp oracle (accumulation-order tolerance)."""
    a, c, w = _data(B, H, C, O, k, st, pad)
    kern0 = jnp.zeros((k, k, C, O))
    _, vjp = jax.vjp(lambda kk: cg._conv(a, kk, st, pad), kern0)
    (want,) = vjp(c * w[:, None, None, None])
    got = pcg.weighted_kernel_grad(a, c, w, (k, k, C, O), st, pad)
    scale = float(np.abs(np.asarray(want)).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-5 * max(scale, 1.0))


def test_full_conv_ghost_with_pallas_matches_generic(tmp_path):
    """dcresnet_real_ghost with the Pallas dispatch forced on (interpret)
    must still match the generic vmap-materialized clipped sum."""
    from csl_gan_tpu import options
    from csl_gan_tpu.models.registry import init_models
    from csl_gan_tpu.ops import grads as gops
    from csl_gan_tpu.training.steps import TrainStepBuilder

    opt = options.parse(["MNIST", "--model", "DeepConvResNet", "-dpm", "gc",
                         "--conditional", "-o", str(tmp_path / "o"),
                         "-bs", "8", "--manual_seed", "17"])
    (G, Gv), (D, Dv) = init_models(opt)
    b = TrainStepBuilder(opt, G, D)
    state = b.init_state(Gv, Dv)
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(kx, (8, 28, 28, 1), minval=-1, maxval=1)
    y = jax.random.randint(ky, (8,), 0, 10)

    f, args = b._real_ps_args(x, y, b._row_weights(y))
    want, want_stats = gops.clipped_grad_sum(
        f, state.d_params, *args, max_norm=0.05, per_layer=False)
    got, got_stats, _ = cg.dcresnet_real_ghost(
        state.d_params, x, y, n_classes=b.n_classes, arch=b.arch,
        aux_type=b.aux_type, aux_scalar=b.aux_scalar,
        row_w=b._row_weights(y), concat_planes=False, max_norm=0.05,
        per_layer=False)
    for a_, g_ in zip(jax.tree_util.tree_leaves(want),
                      jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(a_),
                                   rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_stats.norm_mean),
                               np.asarray(want_stats.norm_mean),
                               rtol=1e-3, atol=1e-6)


def test_use_pallas_gating():
    """Auto-detection: off on the CPU test backend unless forced, and only
    for bf16 compute (fp32 measured 39.7 vs 23.7 ms on the flagship step —
    use_pallas docstring)."""
    old = pcg.FORCE
    try:
        pcg.FORCE = None
        assert pcg.use_pallas() is False  # suite pins the cpu backend
        assert pcg.use_pallas(jnp.bfloat16) is False
        pcg.FORCE = True
        assert pcg.use_pallas() is True  # FORCE overrides dtype gating too
    finally:
        pcg.FORCE = old
