"""Ghost clipping (ops/ghost.py) must exactly reproduce the generic
vmap-materialized path for the vanilla D real pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csl_gan_tpu import options
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.ops import ghost, grads as gops
from csl_gan_tpu.training.steps import TrainStepBuilder


def setup(tmp_path, *argv, bs=24):
    opt = options.parse(["MNIST", *argv, "-o", str(tmp_path / "o"),
                         "-bs", str(bs), "--manual_seed", "17"])
    (G, Gv), (D, Dv) = init_models(opt)
    b = TrainStepBuilder(opt, G, D)
    return opt, b, b.init_state(Gv, Dv)


@pytest.mark.parametrize("argv,conditional", [
    ((), False),
    (("--conditional",), True),
    (("--conditional", "--conditional_arch", "CGAN"), True),
])
def test_ghost_matches_generic(tmp_path, argv, conditional):
    opt, b, state = setup(tmp_path, "-dpm", "gc", *argv)
    assert b.use_ghost
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(kx, (24, 28, 28, 1))
    y = jax.random.randint(ky, (24,), 0, 10) if conditional else None

    for C, per_layer in [(0.05, False), (1e6, False)]:
        f, args = b._real_ps_args(x, y, b._row_weights(y) if conditional else None)
        want, want_stats = gops.clipped_grad_sum(
            f, state.d_params, *args, max_norm=C, per_layer=per_layer)
        y_onehot = jax.nn.one_hot(y, 10) if conditional else None
        aux_labels = y if (conditional and b.use_aux) else None
        got, got_stats, outs = ghost.vanilla_real_ghost(
            state.d_params, x, y_onehot, aux_labels, b.aux_scalar, C, per_layer)
        for a, g in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                       rtol=5e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_stats.norm_mean),
                                   np.asarray(want_stats.norm_mean), rtol=5e-4)
        np.testing.assert_allclose(np.asarray(got_stats.frac_clipped),
                                   np.asarray(want_stats.frac_clipped), atol=1e-6)


def test_ghost_per_layer(tmp_path):
    opt, b, state = setup(tmp_path, "-dpm", "gc", "--conditional",
                          "-gcm", "constant-pl",
                          "-cpl", "1", "0.1", "2", "0.2", "3", "0.3")
    kx, ky = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.uniform(kx, (24, 28, 28, 1))
    y = jax.random.randint(ky, (24,), 0, 10)
    C = state.clipping  # leaf order
    f, args = b._real_ps_args(x, y, None)
    want, _ = gops.clipped_grad_sum(f, state.d_params, *args, max_norm=C,
                                    per_layer=True)
    got, _, _ = ghost.vanilla_real_ghost(state.d_params, x,
                                         jax.nn.one_hot(y, 10), y,
                                         b.aux_scalar, C, True)
    for a, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=5e-4, atol=1e-6)


def test_ghost_step_matches_generic_step(tmp_path):
    """Full gc D-step with ghost on vs forced off (sigma=0)."""
    opt1, b1, s1 = setup(tmp_path, "-dpm", "gc", "--conditional", "--sigma", "0")
    opt2, b2, s2 = setup(tmp_path, "-dpm", "gc", "--conditional", "--sigma", "0")
    b2.use_ghost = False
    kx, ky = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.uniform(kx, (24, 28, 28, 1))
    y = jax.random.randint(ky, (24,), 0, 10)
    rng = jax.random.PRNGKey(4)
    n1, m1 = b1.d_step_dp(s1, x, y, x, y, x, y, rng)
    n2, m2 = b2.d_step_dp(s2, x, y, x, y, x, y, rng)
    for a, g in zip(jax.tree_util.tree_leaves(n1.d_params),
                    jax.tree_util.tree_leaves(n2.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g),
                                   rtol=2e-3, atol=2e-5)
