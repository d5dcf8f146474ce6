"""Gradient penalties (WGAN-GP / DRAGAN) as nested-grad functions.

Functional equivalents of reference gradient_penalty.py:4-65. The reference's
`autograd.grad(out, inputs, grad_outputs=ones, create_graph=True)` double
backward becomes a `jax.grad` of the input-gradient norm inside the same
jitted step — XLA fuses the whole double-vjp.

Since D has no cross-sample layers (no norm layers in either family), the
gradient of sum_i out_i w.r.t. the input batch equals the stacked per-sample
input gradients, so one vjp yields all per-sample Lipschitz gradients.

Penalty weight is fixed at 10.0 and multiple penalties are averaged
(reference gradient_penalty.py:6,20,31; opt.gp_lambda is dead config,
SURVEY.md §5.6).

DRAGAN divergence note: the reference's noise `empty(shape).random_(0,1)`
draws integers in {0} — i.e. zero noise — and its std broadcast would error
(gradient_penalty.py:27); the intended perturbation x + std*U(0,1) is
implemented here (do-not-copy list, SURVEY.md §7).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

PENALTY_WEIGHT = 10.0


def lipschitz_penalty_wrt(d_apply: Callable, d_params, inputs, input_labels,
                          one_sided: bool = False, aux_penalty: bool = True,
                          n_classes: int = 0, per_sample: bool = False):
    """((||d D(x)/d x||_2 - 1)_+)^2 per sample (reference gradient_penalty.py:43-65).

    d_apply(params, x, y) -> (out, aux_out). With aux_penalty, each aux-head
    column contributes its own Lipschitz term (gradient_penalty.py:56-63).
    """
    inputs = jax.lax.stop_gradient(inputs)

    def grads_of_column(col: Optional[int]):
        def scalar_out(x):
            out, aux_out = d_apply(d_params, x, input_labels)
            if col is None:
                return jnp.sum(out)
            return jnp.sum(aux_out[:, col])
        return jax.grad(scalar_out)(inputs)

    def penalty_from_grads(g):
        norms = jnp.sqrt(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1) + 1e-12)
        if one_sided:
            return jnp.maximum(norms - 1.0, 0.0) ** 2
        return (norms - 1.0) ** 2

    gp = penalty_from_grads(grads_of_column(None))

    # Column terms only when the D actually has an aux head (reference
    # gradient_penalty.py:57 `if aux_penalty and not aux_out is None` — a
    # CGAN D returns aux_out=None). The probe forward is unused except for
    # its Python-level None-ness, so XLA dead-code-eliminates it.
    _, aux_probe = d_apply(d_params, inputs, input_labels)
    if aux_penalty and n_classes > 1 and aux_probe is not None:
        for col in range(n_classes):
            gp = gp + penalty_from_grads(grads_of_column(col))

    return gp if per_sample else jnp.mean(gp)


def wgan_gp_penalty(d_apply, d_params, real_data, real_labels, fake_data,
                    fake_labels, key, one_sided=False, aux_penalty=False,
                    n_classes: int = 0, per_sample: bool = False,
                    weight: float = PENALTY_WEIGHT):
    """Penalty on x-interpolates (reference gradient_penalty.py:31-41)."""
    b = real_data.shape[0]
    alpha = jax.random.uniform(key, (b,) + (1,) * (real_data.ndim - 1))
    interpolates = alpha * real_data + (1 - alpha) * fake_data
    return weight * lipschitz_penalty_wrt(
        d_apply, d_params, interpolates, real_labels, one_sided=one_sided,
        aux_penalty=aux_penalty, n_classes=n_classes, per_sample=per_sample)


def dragan_penalty(d_apply, d_params, real_data, real_labels, key,
                   one_sided=False, aux_penalty=False, n_classes: int = 0,
                   per_sample: bool = False, weight: float = PENALTY_WEIGHT):
    """Penalty around noise-perturbed real data (gradient_penalty.py:20-29,
    with the intended U(0,1)*std noise)."""
    noise_std = jnp.std(real_data)
    noise = noise_std * jax.random.uniform(key, real_data.shape)
    return weight * lipschitz_penalty_wrt(
        d_apply, d_params, real_data + noise, real_labels, one_sided=one_sided,
        aux_penalty=aux_penalty, n_classes=n_classes, per_sample=per_sample)


def calc_penalty(d_apply, d_params, penalty_types: Sequence[str], real_data,
                 real_labels, fake_data, fake_labels, key, aux_penalty=False,
                 n_classes: int = 0, per_sample: bool = False):
    """Weighted (1/len) sum over configured penalties (gradient_penalty.py:4-18)."""
    if not penalty_types:
        return jnp.asarray(0.0)
    total = 0.0
    keys = jax.random.split(key, len(penalty_types))
    w = 1.0 / len(penalty_types)
    for i, ptype in enumerate(penalty_types):
        one_sided = ptype.endswith("1")
        if ptype.startswith("DRAGAN"):
            p = dragan_penalty(d_apply, d_params, real_data, real_labels,
                               keys[i], one_sided=one_sided,
                               aux_penalty=aux_penalty, n_classes=n_classes,
                               per_sample=per_sample)
        elif ptype.startswith("WGAN-GP"):
            p = wgan_gp_penalty(d_apply, d_params, real_data, real_labels,
                                fake_data, fake_labels, keys[i],
                                one_sided=one_sided, aux_penalty=aux_penalty,
                                n_classes=n_classes, per_sample=per_sample)
        else:
            raise Exception("Unknown penalty type: " + ptype)
        total = total + w * p
    return total
