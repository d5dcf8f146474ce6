"""Model selection and initialization (reference init_util.py:44-71).

Differences from the reference, by design:
  - Weight init uses an explicit `jax.random` key derived from
    ``opt.weights_seed`` (instead of mutating torch's global RNG around the
    ctor, init_util.py:63-68), so run RNG and weight RNG are independent by
    construction.
  - Returns (module, variables) pairs; variables separate "params" from
    "batch_stats" (G's BatchNorm running stats when bn is on).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from csl_gan_tpu.models import dcresnet, mnist
from csl_gan_tpu.options import opt_get


def model_classes(opt):
    """Resolve (G_ctor, D_ctor) for opt.dataset/opt.model (init_util.py:49-61)."""
    if opt.dataset == "MNIST":
        if opt.model == "DeepConvResNet":
            return dcresnet.mnist_dcrn_g, dcresnet.mnist_dcrn_d
        if opt.model == "Vanilla":
            return (lambda **kw: mnist.MNISTVanillaG(**kw),
                    lambda **kw: mnist.MNISTVanillaD(**kw))
    elif opt.dataset == "CelebA":
        if opt.model == "DeepConvResNet":
            if opt.im_size == 48:
                return dcresnet.celeba_g48, dcresnet.celeba_d48
            return dcresnet.celeba_g64, dcresnet.celeba_d64
        if opt.model == "Vanilla":
            raise Exception("No vanilla architecture for CelebA.")
    raise Exception(f"Unknown dataset/model: {opt.dataset}/{opt.model}")


def _image_shape(opt):
    if opt.dataset == "MNIST":
        return (28, 28, 1)
    return (opt.im_size, opt.im_size, 3)


def init_models(opt, init_G: bool = True, init_D: bool = True,
                abstract: bool = False):
    """Build (G, G_vars), (D, D_vars) per config.

    Mirrors init_util.py:44-71: ``n_classes = opt.n_classes if conditional
    else 0``, and ``bn = not per_sample_grad`` — BatchNorm is swapped for
    GroupNorm when per-sample gradients are required (applies to G; D has no
    norm layers in either family).

    ``abstract=True`` skips the (expensive) real weight init: variables are
    shape-inferred via ``jax.eval_shape`` and materialized as zeros — for
    consumers that only need correctly-shaped trees (shape/trace tests,
    structure inspection).
    """
    n_classes = opt.n_classes if opt.conditional else 0
    bn = not opt_get(opt, "per_sample_grad", False)
    g_ctor, d_ctor = model_classes(opt)
    dtype = jnp.bfloat16 if opt_get(opt, "bf16", False) else None

    key = jax.random.PRNGKey(opt.weights_seed)
    g_key, d_key = jax.random.split(key)

    def run_init(fn, *args):
        if not abstract:
            return fn(*args)
        shapes = jax.eval_shape(fn, *args)
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    G = G_vars = D = D_vars = None
    if init_G:
        g_kwargs = {}
        if opt.model == "DeepConvResNet":
            # Raw-4F GroupNorm in the upsample blocks (--phase_gn4; see
            # models/dcresnet.py ResBlockUp.phase_gn4). The per-block
            # cutoff applies at the G-UPDATE call site only; the builder
            # clones a forward-only all-blocks variant for the D-step
            # fake path and sampling (steps.py G_fwd).
            g_kwargs["phase_gn4"] = bool(opt_get(opt, "phase_gn4", True))
            mf = opt_get(opt, "phase_gn4_max_f", None)
            g_kwargs["phase_gn4_max_f"] = -1 if mf is None else int(mf)
        if opt_get(opt, "ref_pixel_shuffle", False) and \
                opt.model == "DeepConvResNet":
            # Reference-checkpoint interop (convert_reference_checkpoint.py):
            # converted conv weights expect the reference's channel-scrambled
            # pixel-shuffle upsampling.
            g_kwargs["ref_ps"] = True
        G = g_ctor(z_dim=opt.g_latent_dim, bn=bn, n_classes=n_classes,
                   emb_mode=opt.g_label_emb_mode, dtype=dtype, **g_kwargs)
        z = jnp.zeros((1, opt.g_latent_dim), jnp.float32)
        y = jnp.zeros((1,), jnp.int32) if n_classes > 0 else None
        G_vars = run_init(lambda k: G.init(k, z, y, train=True), g_key)
    if init_D:
        d_kwargs = {}
        if opt_get(opt, "backprop_clip", False):
            from csl_gan_tpu.ops.backprop_clip import bpc_config_for
            cfg = bpc_config_for(opt)
            d_kwargs = {"bpc_fwd": tuple(cfg.input_clip_params),
                        "bpc_back": tuple(cfg.back_clip_params)}
        D = d_ctor(n_classes=n_classes, emb_mode=opt.d_label_emb_mode,
                   conditional_arch=opt.conditional_arch,
                   aux_loss_type=opt.aux_loss_type,
                   aux_loss_scalar=opt.aux_loss_scalar, dtype=dtype,
                   **d_kwargs)
        x = jnp.zeros((1,) + _image_shape(opt), jnp.float32)
        y = jnp.zeros((1,), jnp.int32) if n_classes > 0 else None
        D_vars = run_init(lambda k: D.init(k, x, y), d_key)

    return (G, G_vars), (D, D_vars)
