"""Backprop clipping tests (ops/backprop_clip.py + model/train wiring)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train as train_cli  # noqa: E402
from csl_gan_tpu.ops import backprop_clip as bpc  # noqa: E402


def test_l2_clip_per_sample():
    x = jnp.array([[3.0, 4.0], [0.3, 0.4]])  # norms 5 and 0.5
    out = np.asarray(bpc.l2_clip(x, 1.0))
    np.testing.assert_allclose(np.linalg.norm(out[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(out[1], [0.3, 0.4], rtol=1e-6)  # untouched


def test_cotangent_clip_forward_identity_backward_clips():
    x = jnp.ones((2, 3))
    np.testing.assert_allclose(np.asarray(bpc.cotangent_clip(x, 0.1)),
                               np.asarray(x))

    def f(x):
        return jnp.sum(bpc.cotangent_clip(x, 0.5) * 100.0)

    g = np.asarray(jax.grad(f)(x))
    # raw cotangent per sample = [100,100,100] (norm 173) -> clipped to 0.5
    for row in g:
        np.testing.assert_allclose(np.linalg.norm(row), 0.5, rtol=1e-5)


def test_derive_bpc_manual_linear():
    layers = [bpc.LayerSpec("linear", (10,), (4,), 40, True)]
    cfg = bpc.derive_bpc(layers, back_clip_params=[2.0], input_clip_params=[3.0])
    # weight bound = ic*bc = 6; bias bound = bc = 2 (backprop_clip.py:87-89)
    assert cfg.grad_l2_bounds == [6.0, 2.0]


def test_derive_bpc_auto():
    layers = bpc.mnist_vanilla_d_layers(0)
    cfg = bpc.derive_bpc(layers, None, None, auto_activation_scale=0.2,
                         auto_weight_grad_scale=1e-3)
    assert len(cfg.grad_l2_bounds) == 4  # lin1 w/b, lin2 w/b
    assert cfg.grad_l2_bounds[0] == pytest.approx(
        bpc.l2_size(784 * 128, 1e-3))
    # bias bound = weight bound / input clip
    assert cfg.grad_l2_bounds[1] == pytest.approx(
        cfg.grad_l2_bounds[0] / bpc.l2_size(784, 0.2))


def test_bpc_bounds_actually_hold():
    """Per-sample parameter grads of the clipped model must respect the
    derived bounds — the whole point of the scheme."""
    from csl_gan_tpu import options
    from csl_gan_tpu.models import losses
    from csl_gan_tpu.models.registry import init_models
    from csl_gan_tpu.ops import grads as gops

    opt = options.parse(["MNIST", "-bpc", "true", "-dpm", "gc",
                         "--bpc_forward_clip_param", "20",
                         "--bpc_back_clip_param", "0.01",
                         "-o", "/tmp/bpc_t", "--manual_seed", "1", "-bs", "8"])
    (G, Gv), (D, Dv) = init_models(opt)
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 28, 28, 1)) * 100.0

    def loss_ps(params, xi):
        out, _ = D.apply({"params": params}, xi[None], None, bpc=True)
        return losses.d_real_loss("vanilla", out, "none")[0]

    ps = gops.per_sample_grads(loss_ps, Dv["params"], x)
    cfg = bpc.bpc_config_for(opt)
    # torch order: lin1.w, lin1.b, lin2.w, lin2.b
    bounds = {("lin1", "kernel"): cfg.grad_l2_bounds[0],
              ("lin1", "bias"): cfg.grad_l2_bounds[1],
              ("lin2", "kernel"): cfg.grad_l2_bounds[2],
              ("lin2", "bias"): cfg.grad_l2_bounds[3]}
    for (mod, leaf), bound in bounds.items():
        g = ps[mod][leaf]
        norms = np.linalg.norm(np.asarray(g).reshape(g.shape[0], -1), axis=1)
        assert norms.max() <= bound * (1 + 1e-4), (mod, leaf, norms.max(), bound)


def test_bpc_training_cli(tmp_path):
    out = str(tmp_path / "bpc")
    train_cli.main(["MNIST", "-tss", "200", "-ne", "1", "-bs", "50",
                    "--manual_seed", "2", "--log_every", "200",
                    "--sample_every", "100000", "--save_every", "1",
                    "-dpm", "gc", "-bpc", "true", "-o", out])
    assert os.path.exists(out + "/saves/G-1")


def test_bpc_bounds_survive_per_layer_resolution(tmp_path):
    """Regression: the BPC-derived per-layer clip vector must be applied
    verbatim (it is programmatically set, not CLI-set; round-2 review found
    it being replaced by the dataset-default builder)."""
    from csl_gan_tpu import options
    from csl_gan_tpu.models.registry import init_models
    from csl_gan_tpu.training import checkpoint, param_order
    from csl_gan_tpu.training.steps import TrainStepBuilder

    out = str(tmp_path / "bpcpl")
    train_cli.main(["MNIST", "-tss", "100", "-ne", "1", "-bs", "25",
                    "--manual_seed", "2", "--log_every", "100",
                    "--sample_every", "100000", "--save_every", "1",
                    "-dpm", "gc", "-bpc", "true", "-gcm", "constant-pl",
                    "-o", out])
    opt = options.load_opt(out + "/opt.txt")
    cfg = bpc.bpc_config_for(opt)
    want = [c * opt.batch_size for c in cfg.grad_l2_bounds]
    (G, Gv), (D, Dv) = init_models(opt)
    builder = TrainStepBuilder(opt, G, D)
    state = builder.init_state(Gv, Dv)
    state, _, _ = checkpoint.load_d(out + "/saves/D-1", state)
    got = param_order.to_torch_order(np.asarray(state.clipping), Dv["params"])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bpc_rejects_dcresnet(tmp_path):
    from csl_gan_tpu import options
    opt = options.parse(["CelebA", "-bpc", "true", "-dpm", "gc", "-nms", "1",
                        "-o", str(tmp_path / "o"), "--manual_seed", "1"])
    with pytest.raises(Exception, match="Vanilla"):
        bpc.bpc_config_for(opt)
