"""Fused GroupNorm+ReLU (ops/pallas_groupnorm.py) equivalence tests.

Pins (a) the XLA fallback against flax nn.GroupNorm + relu (the formulation
the reference's torch GroupNorm matches, DCResNet_models.py:24-36), and
(b) the Pallas kernels (interpret mode on CPU) against the fallback —
forward values and gradients w.r.t. x, scale, and bias."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from csl_gan_tpu.ops import pallas_groupnorm as pgn


SHAPES = [
    ((4, 8, 8, 64), 32),    # channels > lanes/2, multi-sample tile
    ((2, 4, 4, 128), 32),   # small spatial
    ((3, 7, 7, 64), 32),    # non-aligned spatial (MNIST-DCRN-like)
    ((2, 5, 5, 8), 4),      # tiny groups
]


def _ref(x, scale, bias, groups, eps=1e-5):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    y = gn.apply({"params": {"scale": scale, "bias": bias}},
                 x.astype(jnp.float32))
    return nn.relu(y).astype(x.dtype)


@pytest.mark.parametrize("shape,groups", SHAPES)
def test_xla_fallback_matches_flax(shape, groups):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, shape) * 2.0 + 0.3
    scale = jax.random.normal(jax.random.fold_in(k, 1), (shape[-1],)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(k, 2), (shape[-1],)) * 0.1
    got = pgn._gn_relu_xla(x, scale, bias, groups, 1e-5)
    want = _ref(x, scale, bias, groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,groups", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_interpret_matches_fallback(shape, groups, dtype):
    k = jax.random.PRNGKey(7)
    x = (jax.random.normal(k, shape) * 2.0 + 0.3).astype(dtype)
    scale = jax.random.normal(jax.random.fold_in(k, 1), (shape[-1],)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(k, 2), (shape[-1],)) * 0.1

    old_force, old_interp = pgn.FORCE, pgn.INTERPRET
    pgn.FORCE, pgn.INTERPRET = True, True
    try:
        got = pgn.group_norm_relu(x, scale, bias, groups)

        def loss_p(x, s, b):
            y = pgn.group_norm_relu(x, s, b, groups)
            return jnp.sum(jnp.sin(y.astype(jnp.float32) * 0.7))

        gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, scale, bias)
    finally:
        pgn.FORCE, pgn.INTERPRET = old_force, old_interp

    want = pgn._gn_relu_xla(x, scale, bias, groups, 1e-5)

    def loss_x(x, s, b):
        y = pgn._gn_relu_xla(x, s, b, groups, 1e-5)
        return jnp.sum(jnp.sin(y.astype(jnp.float32) * 0.7))

    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, scale, bias)

    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)
    for a, b in zip(gp, gx):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if dtype == jnp.float32:
            np.testing.assert_allclose(a, b, rtol=tol, atol=tol)
        else:
            # bf16: the Pallas kernel applies the affine in f32, the XLA
            # fallback in bf16 (by design — it keeps every big tensor and
            # cotangent bf16). They are grads of two *slightly different
            # functions*; per-element comparison breaks on channels where
            # d(scale) terms cancel (|sum| << sum|terms|, the 2^-9 product
            # rounding shows as a large relative error on a tiny total).
            # Compare in norm instead.
            assert np.linalg.norm(a - b) <= tol * (np.linalg.norm(b) + 1.0)


def test_batch_tile_divisors():
    assert pgn._batch_tile(128, 16, 512) * 16 * 512 <= pgn._BLOCK_ELEMS
    assert 128 % pgn._batch_tile(128, 16, 512) == 0
    assert pgn._batch_tile(500, 49, 128) in {25, 20, 10, 5, 4, 2, 1}
    assert 500 % pgn._batch_tile(500, 49, 128) == 0
    assert pgn._batch_tile(128, 4096, 64) == 1


def test_model_param_tree_unchanged():
    """_GroupNormRelu(name="GroupNorm_i") must produce the same param paths
    and init values as nn.GroupNorm (checkpoint/param-order compatibility)."""
    from csl_gan_tpu.models.dcresnet import DCResNetGenerator
    G = DCResNetGenerator(channels=[64, 64], first_filter_size=4,
                          z_dim=16, n_classes=0, bn=False)
    v = G.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)))
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    paths = {"/".join(str(getattr(p, "key", p)) for p in path)
             for path, _ in flat}
    assert any("ResBlockUp_0/GroupNorm_0/scale" == p for p in paths), paths
    assert any("ResBlockUp_0/GroupNorm_1/bias" == p for p in paths), paths
    assert any("GroupNorm_0/scale" == p for p in paths), paths


def test_bf16_backward_keeps_f32_accumulation():
    """The bf16 affine staging must not degrade the GRADIENT reductions:
    d(scale)/d(bias) sum thousands of per-element products, and the
    broadcast_to-then-astype op order in _gn_relu_xla transposes to a
    convert-into-f32-reduce. A cast-before-broadcast form (bf16-accumulated
    sums) shows ~10% random-walk l2 error on this size and fails both
    checks below (measured: l2rel 8e-4 for the shipped form)."""
    k = jax.random.PRNGKey(3)
    shape, groups = (8, 32, 32, 64), 32
    x32 = jax.random.normal(k, shape) * 1.5 + 0.2
    scale = jax.random.normal(jax.random.fold_in(k, 1), (shape[-1],)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(k, 2), (shape[-1],)) * 0.1

    def loss(x, s, b):
        y = pgn._gn_relu_xla(x, s, b, groups, 1e-5)
        return jnp.sum(jnp.sin(y.astype(jnp.float32) * 0.7))

    g32 = jax.grad(loss, argnums=(1, 2))(x32, scale, bias)
    g16 = jax.grad(loss, argnums=(1, 2))(x32.astype(jnp.bfloat16),
                                         scale, bias)
    for a, b in zip(g16, g32):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        l2rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert float(l2rel) < 5e-3, float(l2rel)

    # Structural guard: every big-tensor reduce in the bf16 backward must
    # accumulate in f32 (a convert feeding the reduce, fused by XLA).
    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(
        x32.astype(jnp.bfloat16), scale, bias)
    for eqn in jaxpr.jaxpr.eqns:
        if eqn.primitive.name == "reduce_sum":
            (invar,) = eqn.invars
            if invar.aval.shape == shape:
                assert invar.aval.dtype == jnp.float32, eqn


def test_gn4_matches_phase_layout():
    """group_norm_relu(tiles=4) on the raw [N,H,W,4F] phase-stacked layout
    must equal normalizing the 6-D [N,H,W,2,2,F] phase view (phases are
    spatial positions; --phase_gn4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from csl_gan_tpu.ops.pallas_groupnorm import group_norm_relu

    k = jax.random.PRNGKey(3)
    f = 64
    x4 = jax.random.normal(k, (2, 8, 8, 4 * f)) * 2 + 0.3
    scale = jax.random.normal(jax.random.fold_in(k, 1), (f,))
    bias = jax.random.normal(jax.random.fold_in(k, 2), (f,))
    out4 = group_norm_relu(x4, scale, bias, groups=32, tiles=4)
    x6 = x4.reshape(2, 8, 8, 2, 2, f)
    out6 = group_norm_relu(x6, scale, bias, groups=32)
    np.testing.assert_allclose(np.asarray(out4),
                               np.asarray(out6.reshape(out4.shape)),
                               rtol=1e-5, atol=1e-5)


def test_gn4_generator_matches_6d():
    """DCResNet G with phase_gn4 on vs off: same params, same outputs and
    gradients (fp reassociation tolerance only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from csl_gan_tpu.models import dcresnet

    G4 = dcresnet.mnist_dcrn_g(n_classes=10, emb_mode="concat", bn=False,
                               phase_gn4=True)
    G6 = dcresnet.mnist_dcrn_g(n_classes=10, emb_mode="concat", bn=False,
                               phase_gn4=False)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 128))
    y = jnp.arange(4) % 10
    v = G4.init(jax.random.PRNGKey(0), z, y, train=True)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        G6.init(jax.random.PRNGKey(0), z, y, train=True))
    np.testing.assert_allclose(np.asarray(G4.apply(v, z, y, train=True)),
                               np.asarray(G6.apply(v, z, y, train=True)),
                               rtol=1e-5, atol=2e-6)

    def loss(G):
        return lambda p: jnp.sum(
            G.apply({"params": p}, z, y, train=True) ** 2)
    g4 = jax.grad(loss(G4))(v["params"])
    g6 = jax.grad(loss(G6))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g4),
                    jax.tree_util.tree_leaves(g6)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
