"""GAN loss functions (functional equivalents of reference models.py:20-67).

Every loss supports ``reduction='mean' | 'none'``. ``'none'`` returns one
value per sample (trailing dims averaged), which is what the DP engines
vmap/grad over; ``'mean'`` averages those per-sample values, matching the
reference's element-mean since trailing dims are uniform.

Model families:
  - "vanilla": BCE-with-logits GAN (reference MNIST_models.py:25-52)
  - "wgan":    Wasserstein losses (reference DCResNet_models.py:106-153)

Auxiliary (conditional) losses follow reference models.py:51-67:
  ACGAN + cross_entropy, ACGAN + wasserstein (the class-balanced sigmoid
  sum formulation), and WCGAN (always zero; its conditioning lives in the
  per-class critic head instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _per_sample(x):
    """Average all trailing (non-batch) dims -> shape [B]."""
    if x.ndim == 1:
        return x
    return x.reshape(x.shape[0], -1).mean(axis=-1)


def _reduce(elementwise, reduction):
    ps = _per_sample(elementwise)
    if reduction == "mean":
        return jnp.mean(ps)
    if reduction == "sum":
        return jnp.sum(ps)
    if reduction == "none":
        return ps
    raise ValueError(f"unknown reduction {reduction}")


def bce_with_logits(logits, targets, reduction="mean"):
    """Numerically-stable binary cross entropy on logits."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _reduce(loss, reduction)


def softmax_cross_entropy(logits, labels, reduction="mean"):
    logp = jax.nn.log_softmax(logits, axis=-1)
    # One-hot dot instead of take_along_axis: picks the identical single
    # term (the other summands are exact 0.0), so the value is bit-equal —
    # but it lowers to a dense multiply+reduce instead of a gather whose
    # jvp/transpose pair cost ~6.5 us EACH on TPU for a [600,10] pick
    # (gathers are latency-bound "custom fusions"; 2 per MNIST DP step
    # = 16% of the launch-bound epoch, xplane-measured).
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    loss = -jnp.sum(logp * onehot, axis=-1)
    return _reduce(loss, reduction)


# --- Adversarial losses ---

def g_adv_loss(family: str, d_out, reduction="mean"):
    """Generator adversarial loss given D's output on fakes."""
    if family == "vanilla":
        # BCE vs ones (MNIST_models.py:25-26)
        return bce_with_logits(d_out, jnp.ones_like(d_out), reduction)
    if family == "wgan":
        # -mean(d_out) (DCResNet_models.py:106-107)
        return _reduce(-d_out, reduction)
    raise ValueError(family)


def d_real_loss(family: str, d_out, reduction="mean"):
    if family == "vanilla":
        return bce_with_logits(d_out, jnp.ones_like(d_out), reduction)
    if family == "wgan":
        return _reduce(-d_out, reduction)
    raise ValueError(family)


def d_fake_loss(family: str, d_out, reduction="mean"):
    if family == "vanilla":
        return bce_with_logits(d_out, jnp.zeros_like(d_out), reduction)
    if family == "wgan":
        return _reduce(d_out, reduction)
    raise ValueError(family)


# --- Auxiliary (conditional) losses ---

def aux_loss(conditional_arch: str, aux_loss_type: str, aux_loss_scalar: float,
             aux_out, labels, n_classes: int, fake: bool = False, reduction="mean"):
    """Conditional auxiliary loss (reference models.py:51-67).

    ACGAN/cross_entropy: mean CE (nn.CrossEntropyLoss).
    ACGAN/wasserstein: the class-balanced +-sigmoid *sum* (models.py:54) — a
      sum-formulated loss, so 'mean' returns the batch total for value parity
      and 'none' returns per-sample terms that sum to it.
    WCGAN: zero (conditioning is in the critic head, models.py:57-67).
    """
    if aux_out is None:
        return jnp.zeros(labels.shape[0]) if reduction == "none" else jnp.asarray(0.0)

    if conditional_arch == "ACGAN":
        if aux_loss_type == "cross_entropy":
            return aux_loss_scalar * softmax_cross_entropy(aux_out, labels, reduction)
        onehot = jax.nn.one_hot(labels, n_classes)
        sign = onehot * (-2.0) + 1.0
        class_counts = jnp.sum(onehot, axis=0)            # [n_classes]
        # one-hot dot == class_counts[labels] exactly (single nonzero term),
        # avoiding a latency-bound TPU gather (see softmax_cross_entropy).
        row_norm = (onehot @ class_counts)[:, None]       # count of own class per row
        per_elem = sign * jax.nn.sigmoid(aux_out) / row_norm
        if reduction == "none":
            return aux_loss_scalar * jnp.sum(per_elem, axis=-1)
        return aux_loss_scalar * jnp.sum(per_elem)

    if conditional_arch == "WCGAN":
        if reduction == "none":
            return jnp.zeros(labels.shape[0])
        return jnp.asarray(0.0)

    raise ValueError(conditional_arch)
