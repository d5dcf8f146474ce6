"""csl_gan_tpu — TPU-native DP-GAN framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
twosixlabs/csl-gan (reference: /root/reference): GAN training on MNIST and
CelebA under differential privacy (per-sample gradient clipping and immediate
sensitivity, plus experimental trimmed-mean / sign-vote aggregation),
conditional CGAN/ACGAN/WCGAN variants, RDP budget accounting, mean-sample
public surrogates, WGAN-GP/DRAGAN penalties, and the full evaluation tool
suite (budget analysis, sample generation, downstream classification,
membership-inference + FID).

Architecture stance (TPU-first, not a port):
  - One pure-functional train step compiled with jit/pjit over a
    jax.sharding.Mesh replaces the reference's mutable-hook architecture.
  - Per-sample gradients via jax.vmap(jax.grad) (optionally chunked with
    lax.scan) replace Opacus backward hooks.
  - DP clip+noise is a fused device computation (Pallas kernel on the hot
    path) instead of per-parameter Python loops.
  - Immediate sensitivity and WGAN-GP are nested-vjp computations inside the
    same jitted step.
  - Explicit PRNG threading replaces global torch seeds.
  - The RDP accountant is pure NumPy with no model coupling.
"""

__version__ = "0.1.0"
