"""Ghost clipping for the MNIST vanilla discriminator's private pass.

For Dense layers, the per-sample gradient is the outer product of the layer
input and the output cotangent, so its norm factorizes:

    ||g_W(i)||_F = ||a(i)||_2 * ||c(i)||_2,     ||g_b(i)||_2 = ||c(i)||_2

("fast per-example gradient clipping", Lee & Kifer 2020 / Goodfellow 2015).
The DP-clipped gradient sum then needs NO [batch, params] materialization:

    sum_i w_i g_W(i) = A^T diag(w) C        (one MXU matmul per layer)

The generic vmap path materializes ~batch x params floats per step (the
measured bandwidth bound: ~170k samples/s for the MNIST DP step); this path
touches only activations and cotangents (batch x width) and runs the sums as
matmuls. It reproduces ops/grads.clipped_grad_sum exactly (tests) and is
used automatically for the vanilla D's gradient-clipping pass (the flagship
BASELINE.md operating point).

The forward/backward of the 2-3 Dense layers and the per-sample loss
derivatives (BCE-vs-ones adversarial + optional ACGAN cross-entropy aux,
reference MNIST_models.py:28-52) are written out analytically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from csl_gan_tpu.ops.grads import ClipStats, add_gaussian_noise, clip_factors


def vanilla_real_ghost(d_params, x, y_onehot: Optional[jnp.ndarray],
                       aux_labels: Optional[jnp.ndarray],
                       aux_scalar: float,
                       max_norm, per_layer: bool,
                       valid: Optional[jnp.ndarray] = None,
                       noise: Optional[Tuple[jax.Array, float]] = None):
    """Clipped(+noised) summed gradient of the per-sample REAL loss for the
    vanilla D: per-sample loss_i = BCE(out_i, 1) [+ aux_scalar * CE_i].

    d_params: {"lin1": {kernel,bias}, "lin2": {...}[, "linOutAux": {...}]}
    x: [B, 28, 28, 1]; y_onehot: [B, n_classes] or None (input concat);
    aux_labels: [B] int labels when the ACGAN aux head is active, else None.

    Returns (summed_grads_tree, ClipStats, (out, aux_out)) — the forward
    outputs are reused by the caller for metrics (no duplicate D forward).
    """
    b = x.shape[0]
    a0 = x.reshape(b, -1)
    if y_onehot is not None:
        a0 = jnp.concatenate([a0, y_onehot], axis=1)          # [B, 784+nc]

    w1, b1 = d_params["lin1"]["kernel"], d_params["lin1"]["bias"]
    w2, b2 = d_params["lin2"]["kernel"], d_params["lin2"]["bias"]
    z1 = a0 @ w1 + b1                                          # [B, 128]
    h = jax.nn.relu(z1)
    out = h @ w2 + b2                                          # [B, 1]

    # d/d_out of per-sample BCE-vs-ones (mean over the single logit).
    c_out = jax.nn.sigmoid(out) - 1.0                          # [B, 1]

    use_aux = aux_labels is not None and "linOutAux" in d_params
    if use_aux:
        wa, ba = d_params["linOutAux"]["kernel"], d_params["linOutAux"]["bias"]
        aux = h @ wa + ba                                      # [B, nc]
        onehot_t = jax.nn.one_hot(aux_labels, aux.shape[1])
        c_aux = aux_scalar * (jax.nn.softmax(aux, axis=-1) - onehot_t)
    else:
        c_aux = None
    if valid is not None:
        # Poisson mask: zeroed cotangents give masked rows exactly zero
        # gradient and zero norm (factor 1, contribution 0).
        c_out = c_out * valid[:, None]
        if c_aux is not None:
            c_aux = c_aux * valid[:, None]
    c_h = c_out @ w2.T + (c_aux @ wa.T if use_aux else 0.0)
    c_z1 = c_h * (z1 > 0)                                      # [B, 128]

    # Per-sample squared norms per leaf (ghost factorization).
    sq_a0 = jnp.sum(a0 ** 2, axis=1)
    sq_h = jnp.sum(h ** 2, axis=1)
    sq_cz = jnp.sum(c_z1 ** 2, axis=1)
    sq_co = jnp.sum(c_out ** 2, axis=1)
    # leaf (sorted-key) order: lin1/bias, lin1/kernel, lin2/bias, lin2/kernel,
    # [linOutAux/bias, linOutAux/kernel]
    norms = [jnp.sqrt(sq_cz), jnp.sqrt(sq_a0 * sq_cz),
             jnp.sqrt(sq_co), jnp.sqrt(sq_h * sq_co)]
    if use_aux:
        sq_ca = jnp.sum(c_aux ** 2, axis=1)
        norms += [jnp.sqrt(sq_ca), jnp.sqrt(sq_h * sq_ca)]
    leaf_norms = jnp.stack(norms)                              # [L, B]

    factors = clip_factors(leaf_norms, max_norm, per_layer)    # [L, B]

    def wsum_mat(a, c, f):
        # sum_i f_i * outer(a_i, c_i) = a^T diag(f) c
        return jnp.einsum("bi,bo->io", a * f[:, None], c,
                          precision=jax.lax.Precision.HIGHEST)

    def wsum_vec(c, f):
        return jnp.sum(c * f[:, None], axis=0)

    summed = {
        "lin1": {"bias": wsum_vec(c_z1, factors[0]),
                 "kernel": wsum_mat(a0, c_z1, factors[1])},
        "lin2": {"bias": wsum_vec(c_out, factors[2]),
                 "kernel": wsum_mat(h, c_out, factors[3])},
    }
    if use_aux:
        summed["linOutAux"] = {"bias": wsum_vec(c_aux, factors[4]),
                               "kernel": wsum_mat(h, c_aux, factors[5])}

    if noise is not None:
        key, sigma = noise
        # One flat draw for all leaves (grads.add_gaussian_noise): the
        # per-leaf jax.random.normal calls were 5 rng-bit-generator kernels
        # plus key-derivation chains per step — ~5 us of the launch-bound
        # ~68 us MNIST DP step (xplane-measured).
        summed = add_gaussian_noise(key, summed, sigma, max_norm,
                                    per_layer=per_layer)

    stats = ClipStats(
        norm_mean=jnp.mean(leaf_norms, axis=1),
        norm_std=jnp.std(leaf_norms, axis=1),
        norm_max=jnp.max(leaf_norms, axis=1),
        frac_clipped=jnp.mean((factors < 0.999).astype(jnp.float32), axis=1),
    )
    return summed, stats, (out, aux if use_aux else None)
