"""A/B timing of the DCResNet CelebA DP step: conv ghost vs two-pass.

Run on the real TPU: python tools/bench_conv_ghost.py [--pl]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def force(x):
    # On this backend block_until_ready can return early; reading a derived
    # value forces execution (see bench.py).
    return float(jax.device_get(jnp.sum(x)))


def build(tmpdir, conv_ghost: bool, per_layer: bool):
    from csl_gan_tpu import options
    from csl_gan_tpu.models.registry import init_models
    from csl_gan_tpu.training.steps import TrainStepBuilder

    argv = ["CelebA", "--conditional", "-dpm", "gc", "-bs", "128",
            "--manual_seed", "7", "-o", tmpdir, "-nms", "1",
            "--mean_sample_size", "8",
            "--conv_ghost", "true" if conv_ghost else "false"]
    if per_layer:
        argv += ["-gcm", "constant-pl"]
    opt = options.parse(argv)
    (G, Gv), (D, Dv) = init_models(opt)
    b = TrainStepBuilder(opt, G, D)
    return opt, b, b.init_state(Gv, Dv)


def time_step(b, state, n=30):
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (128, 64, 64, 3), minval=-1, maxval=1)
    y = jax.random.randint(k, (128,), 0, 2)
    t0 = time.time()
    state, m = b.d_step_dp(state, x, y, x, y, x, y, k)
    force(m["d_adv_loss"])
    compile_s = time.time() - t0
    # warm
    for i in range(3):
        state, m = b.d_step_dp(state, x, y, x, y, x, y,
                               jax.random.fold_in(k, i))
    force(m["d_adv_loss"])
    t0 = time.time()
    for i in range(n):
        state, m = b.d_step_dp(state, x, y, x, y, x, y,
                               jax.random.fold_in(k, 100 + i))
    force(m["d_adv_loss"])
    dt = (time.time() - t0) / n
    return compile_s, dt


if __name__ == "__main__":
    pl = "--pl" in sys.argv
    for cg in (True, False):
        opt, b, state = build(f"/tmp/bcg_{cg}", cg, pl)
        label = "conv_ghost" if cg else ("generic-pl" if pl else "two_pass")
        assert b.use_conv_ghost == cg
        comp, dt = time_step(b, state)
        print(f"{label:12s} per_layer={pl}  compile={comp:6.1f}s  "
              f"step={dt * 1e3:8.2f} ms  ({128 / dt:,.0f} samples/s)")
