"""Model layer tests: shapes, param counts vs the reference architectures,
conditioning variants, loss functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csl_gan_tpu import options
from csl_gan_tpu.models import losses
from csl_gan_tpu.models.registry import init_models


def parse(tmp_path, *argv):
    return options.parse(list(argv) + ["-o", str(tmp_path / "o"), "--manual_seed", "3"])


def n_params(variables):
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))


def test_mnist_vanilla_shapes_and_counts(tmp_path):
    opt = parse(tmp_path, "MNIST", "--conditional")
    (G, Gv), (D, Dv) = init_models(opt)
    z = jnp.ones((4, 100))
    y = jnp.arange(4, dtype=jnp.int32) % 10
    img = G.apply(Gv, z, y)
    assert img.shape == (4, 28, 28, 1)
    assert float(img.min()) >= 0 and float(img.max()) <= 1  # sigmoid output
    out, aux = D.apply(Dv, img, y)
    assert out.shape == (4, 1) and aux.shape == (4, 10)
    # Exact reference parameter counts (MNIST_models.py:14-15, 36-39):
    assert n_params(Gv) == (110 * 128 + 128) + (128 * 784 + 784)
    assert n_params(Dv) == (794 * 128 + 128) + (128 + 1) + (128 * 10 + 10)


def test_mnist_unconditional(tmp_path):
    opt = parse(tmp_path, "MNIST")
    (G, Gv), (D, Dv) = init_models(opt)
    img = G.apply(Gv, jnp.ones((2, 100)), None)
    out, aux = D.apply(Dv, img, None)
    assert out.shape == (2, 1) and aux is None
    assert n_params(Gv) == (100 * 128 + 128) + (128 * 784 + 784)


def test_celeba_d64_param_count(tmp_path):
    # CGAN concat: D input channels = 3 + n_classes (DCResNet_models.py:114).
    opt = parse(tmp_path, "CelebA", "--conditional", "--conditional_arch", "CGAN")
    (G, Gv), (D, Dv) = init_models(opt)
    want = (5 * 64 * 25 + 64) + (64 * 128 * 25 + 128) + (128 * 256 * 25 + 256) \
        + (256 * 512 * 25 + 512) + 512 * 16
    assert n_params(Dv) == want == 4317952


def test_acgan_d_ignores_input_labels(tmp_path):
    # ACGAN nulls emb_mode for D (models.py:36-37) -> y must not change D out.
    opt = parse(tmp_path, "CelebA", "--conditional", "--conditional_arch", "ACGAN",
                "--im_size", "48")
    (_, _), (D, Dv) = init_models(opt)
    x = jnp.ones((2, 48, 48, 3))
    o1, a1 = D.apply(Dv, x, jnp.zeros((2,), jnp.int32))
    o2, a2 = D.apply(Dv, x, jnp.ones((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
    assert a1.shape == (2, 2)


def test_wcgan_head_select(tmp_path):
    opt = parse(tmp_path, "CelebA", "--conditional", "--conditional_arch", "WCGAN",
                "--im_size", "48")
    (_, _), (D, Dv) = init_models(opt)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 48, 48, 3))
    y = jnp.array([0, 1, 0], jnp.int32)
    out, aux = D.apply(Dv, x, y)
    # out must equal the label-selected aux column (DCResNet_models.py:141-143)
    want = jnp.take_along_axis(aux, y[:, None], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)


def test_g_batchstats_only_when_bn(tmp_path):
    # bn = not per_sample_grad (init_util.py:46).
    opt_bn = parse(tmp_path, "CelebA", "--im_size", "48")
    (G, Gv), _ = init_models(opt_bn, init_D=False)
    assert "batch_stats" in Gv
    opt_gn = parse(tmp_path, "CelebA", "--im_size", "48", "-dpm", "gc", "-nms", "1")
    (G2, Gv2), _ = init_models(opt_gn, init_D=False)
    assert "batch_stats" not in Gv2


def test_dcresnet_g_output_range(tmp_path):
    opt = parse(tmp_path, "CelebA", "--im_size", "48")
    (G, Gv), _ = init_models(opt, init_D=False)
    img, _ = G.apply(Gv, jax.random.normal(jax.random.PRNGKey(1), (2, 128)), None,
                     train=True, mutable=["batch_stats"])
    assert img.shape == (2, 48, 48, 3)
    assert float(img.min()) >= -1 and float(img.max()) <= 1  # tanh output


def test_torch_default_init_distribution(tmp_path):
    # Weights ~ U(+-1/sqrt(fan_in)) like torch defaults.
    opt = parse(tmp_path, "MNIST")
    (G, Gv), _ = init_models(opt, init_D=False)
    w = np.asarray(Gv["params"]["TorchDense_0"]["kernel"])
    bound = 1 / np.sqrt(100)
    assert w.min() >= -bound and w.max() <= bound
    assert abs(w.mean()) < bound / 10


# --- losses ---

def test_bce_matches_manual():
    logits = jnp.array([[0.3], [-1.2], [2.0]])
    t = jnp.ones_like(logits)
    got = losses.bce_with_logits(logits, t)
    want = float(np.mean(-np.log(1 / (1 + np.exp(-np.asarray(logits))))))
    assert float(got) == pytest.approx(want, rel=1e-6)


def test_per_sample_losses_sum_to_mean():
    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 1))
    for fam in ["vanilla", "wgan"]:
        for fn in [losses.d_real_loss, losses.d_fake_loss, losses.g_adv_loss]:
            ps = fn(fam, logits, reduction="none")
            assert ps.shape == (8,)
            assert float(jnp.mean(ps)) == pytest.approx(float(fn(fam, logits)), rel=1e-6)


def test_wgan_loss_signs():
    good = jnp.ones((4, 1)) * 3.0
    assert float(losses.d_real_loss("wgan", good)) == -3.0
    assert float(losses.d_fake_loss("wgan", good)) == 3.0
    assert float(losses.g_adv_loss("wgan", good)) == -3.0


def test_aux_ce_matches_manual():
    logits = jax.random.normal(jax.random.PRNGKey(2), (6, 10))
    labels = jnp.arange(6, dtype=jnp.int32)
    got = losses.aux_loss("ACGAN", "cross_entropy", 2.0, logits, labels, 10)
    lp = jax.nn.log_softmax(logits)
    want = -2.0 * float(jnp.mean(lp[jnp.arange(6), labels]))
    assert float(got) == pytest.approx(want, rel=1e-6)


def test_aux_wasserstein_per_sample_sums_to_total():
    logits = jax.random.normal(jax.random.PRNGKey(3), (6, 2))
    labels = jnp.array([0, 1, 0, 0, 1, 1], jnp.int32)
    total = losses.aux_loss("ACGAN", "wasserstein", 1.0, logits, labels, 2)
    ps = losses.aux_loss("ACGAN", "wasserstein", 1.0, logits, labels, 2, reduction="none")
    assert float(jnp.sum(ps)) == pytest.approx(float(total), rel=1e-5)


def test_wcgan_aux_loss_zero():
    labels = jnp.zeros((4,), jnp.int32)
    assert float(losses.aux_loss("WCGAN", "wasserstein", 1.0, jnp.ones((4, 2)), labels, 2)) == 0.0


def test_mnist_dcresnet_shapes(tmp_path):
    opt = parse(tmp_path, "MNIST", "--model", "DeepConvResNet", "--conditional")
    (G, Gv), (D, Dv) = init_models(opt)
    z = jnp.ones((2, opt.g_latent_dim))
    y = jnp.zeros((2,), jnp.int32)
    img, _ = G.apply(Gv, z, y, train=True, mutable=["batch_stats"])
    assert img.shape == (2, 28, 28, 1)
    out, aux = D.apply(Dv, img, y)
    assert out.shape == (2, 1) and aux.shape == (2, 10)


def test_g_embed_mode(tmp_path):
    # DCResNet G with embed conditioning: z * Embed(y) (DCResNet_models.py:91)
    opt = parse(tmp_path, "MNIST", "--model", "DeepConvResNet", "--conditional",
                "--g_label_emb_mode", "embed")
    (G, Gv), _ = init_models(opt, init_D=False)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, opt.g_latent_dim))
    img0, _ = G.apply(Gv, z, jnp.zeros((2,), jnp.int32), train=True,
                      mutable=["batch_stats"])
    img1, _ = G.apply(Gv, z, jnp.ones((2,), jnp.int32), train=True,
                      mutable=["batch_stats"])
    assert img0.shape == (2, 28, 28, 1)
    assert not np.allclose(np.asarray(img0), np.asarray(img1))  # label matters
    # embedding table exists with shape [n_classes, z_dim]
    flat = jax.tree_util.tree_flatten_with_path(Gv["params"])[0]
    emb = [l for p, l in flat if any("Embed" in str(k) for k in p)]
    assert emb and emb[0].shape == (10, opt.g_latent_dim)


def test_fused_upsample_conv_equals_naive():
    """UpsampleConv's collapsed phase form (models/dcresnet.py _PhaseConv)
    must equal conv_k(upsample_nearest_2x(x)) — same param tree, same init
    values (identical flax param paths), float-level output/grad agreement."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from csl_gan_tpu.models.common import TorchConv, upsample_nearest_2x
    from csl_gan_tpu.models.dcresnet import UpsampleConv

    class Naive(nn.Module):
        features: int
        kernel_size: int

        @nn.compact
        def __call__(self, x):
            return TorchConv(self.features, self.kernel_size, padding="SAME")(
                upsample_nearest_2x(x))

    for k, (h, w, cin, cout) in [(5, (7, 7, 8, 16)), (3, (4, 6, 3, 5)),
                                 (1, (5, 5, 4, 4))]:
        x = jax.random.normal(jax.random.PRNGKey(2), (2, h, w, cin))
        fused, naive = UpsampleConv(cout, k), Naive(cout, k)
        vf = fused.init(jax.random.PRNGKey(11), x)
        vn = naive.init(jax.random.PRNGKey(11), x)
        for a, b in zip(jax.tree_util.tree_leaves(vf),
                        jax.tree_util.tree_leaves(vn)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        of = fused.apply(vn, x)
        on = naive.apply(vn, x)
        assert of.shape == (2, 2 * h, 2 * w, cout)
        np.testing.assert_allclose(np.asarray(of), np.asarray(on),
                                   rtol=1e-5, atol=1e-5)
        gf = jax.grad(lambda v: jnp.sum(jnp.sin(fused.apply(v, x))))(vn)
        gn = jax.grad(lambda v: jnp.sum(jnp.sin(naive.apply(v, x))))(vn)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gn)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def test_phase_deferred_norm_relu_equals_post_d2s():
    """Norm + relu are spatial-permutation-invariant, so applying them in
    the phase layout [N,H,W,2,2,F] before depth-to-space (ResBlockUp's
    fast path) must equal applying them to the depth-to-space'd tensor."""
    import jax
    import jax.numpy as jnp

    from csl_gan_tpu.models.dcresnet import UpsampleConv, phase_d2s
    from csl_gan_tpu.ops.pallas_groupnorm import group_norm_relu

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 7, 8))
    m_def = UpsampleConv(64, 5, use_bias=False, defer_d2s=True)
    m_ref = UpsampleConv(64, 5, use_bias=False)
    v = m_def.init(jax.random.PRNGKey(4), x)
    o_phase = m_def.apply(v, x)
    assert o_phase.shape == (2, 7, 7, 2, 2, 64)
    o_full = m_ref.apply(v, x)
    np.testing.assert_allclose(np.asarray(phase_d2s(o_phase)),
                               np.asarray(o_full), rtol=1e-6, atol=1e-6)

    scale = jnp.linspace(0.5, 1.5, 64)
    bias = jnp.linspace(-0.3, 0.3, 64)
    got = phase_d2s(group_norm_relu(o_phase, scale, bias, groups=32))
    want = group_norm_relu(o_full, scale, bias, groups=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_phase_gn4_max_f_per_call_site_policy(tmp_path):
    """--phase_gn4_max_f: the per-block raw-4F cutoff applies at the
    G-UPDATE call site only (builder.G), while the forward-only fake path
    and sampling (builder.G_fwd) keep the all-blocks layout; both layouts
    are value-preserving, so outputs agree across policies on the SAME
    params."""
    import jax
    from csl_gan_tpu import options
    from csl_gan_tpu.models.registry import init_models
    from csl_gan_tpu.training.steps import TrainStepBuilder

    base = ["MNIST", "--model", "DeepConvResNet", "--conditional",
            "-dpm", "gc", "-bs", "4", "--manual_seed", "5",
            "-o", str(tmp_path / "o")]
    opt_cut = options.parse(base + ["--phase_gn4_max_f", "64"])
    (G, Gv), (D, Dv) = init_models(opt_cut)
    assert G.phase_gn4_max_f == 64
    b_cut = TrainStepBuilder(opt_cut, G, D)
    # Forward-only clone: all blocks (max_f disabled), same param tree.
    assert b_cut.G_fwd.phase_gn4_max_f == -1
    s_cut = b_cut.init_state(Gv, Dv)

    opt_all = options.parse(base + ["-o", str(tmp_path / "p")])
    (G2, Gv2), (D2, Dv2) = init_models(opt_all)
    b_all = TrainStepBuilder(opt_all, G2, D2)
    assert b_all.G_fwd is b_all.G  # default: no clone needed

    z = jax.random.normal(jax.random.PRNGKey(1), (4, opt_cut.g_latent_dim))
    y = jax.random.randint(jax.random.PRNGKey(2), (4,), 0, 10)
    # Same params through all three layout policies -> same images.
    img_fwd = b_cut.G_fwd.apply({"params": s_cut.g_params}, z, y,
                                train=True)
    img_cut = b_cut.G.apply({"params": s_cut.g_params}, z, y, train=True)
    img_all = b_all.G.apply({"params": s_cut.g_params}, z, y, train=True)
    np.testing.assert_allclose(np.asarray(img_fwd), np.asarray(img_cut),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(img_fwd), np.asarray(img_all),
                               rtol=1e-6, atol=1e-6)

    # Round-trips through opt.txt (resume/tool compatibility).
    options.save_opt(opt_cut, str(tmp_path / "opt.txt"))
    re = options.load_opt(str(tmp_path / "opt.txt"))
    assert re.phase_gn4_max_f == 64
