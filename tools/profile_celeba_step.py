"""Per-component timing of the CelebA DP D step (conv ghost path).

Times each piece of _d_step_gc in isolation (jitted separately): G forward,
conv-ghost real pass, fake backward, WGAN-GP penalty grads, Adam update.
Run on TPU: python tools/profile_celeba_step.py [--bf16] [--trace DIR]

--bf16 profiles the mixed-precision flagship; --trace DIR additionally wraps
the full d_step in jax.profiler.trace (feed DIR to tools/xplane_summary.py
for per-HLO device-time totals).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def force(x):
    return jax.device_get(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def timeit(name, fn, *args, n=20):
    fn(*args)  # compile
    force(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    from csl_gan_tpu import options
    from csl_gan_tpu.models.registry import init_models
    from csl_gan_tpu.ops import conv_ghost
    from csl_gan_tpu.training.steps import TrainStepBuilder
    from csl_gan_tpu.training import penalty as penalty_mod
    from csl_gan_tpu.models import losses

    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--trace", type=str, default=None,
                    help="capture a jax.profiler trace of the full d_step")
    ap.add_argument("--trace_target", choices=("d", "g"), default="d",
                    help="which step the --trace capture loops over")
    ap.add_argument("--full_only", action="store_true",
                    help="skip the per-component breakdown (each piece is "
                         "a 40-60 s TPU compile); time + trace only the "
                         "full step selected by --trace_target")
    args = ap.parse_args()

    b = 128
    opt = options.parse(["CelebA", "--conditional", "-dpm", "gc", "-bs",
                         str(b), "--manual_seed", "7", "-nms", "1",
                         "--bf16", "true" if args.bf16 else "false",
                         "--mean_sample_size", "8", "-o", "/tmp/prof_celeba"])
    (G, Gv), (D, Dv) = init_models(opt)
    bld = TrainStepBuilder(opt, G, D)
    state = bld.init_state(Gv, Dv)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (b, 64, 64, 3), minval=-1, maxval=1)
    y = jax.random.randint(k, (b,), 0, 2)
    z = bld.gen_z(k, b)

    g_fwd = jax.jit(lambda s, z, y: bld._fake_images(s, z, y)[0])

    if args.full_only and args.trace_target == "d":
        full = jax.jit(bld._d_step_gc, donate_argnums=())
        timeit("FULL d_step_gc", full, state, x, y, x, y, x, y, k)
        if args.trace:
            with jax.profiler.trace(args.trace):
                out = None
                for i in range(10):
                    out = full(state, x, y, x, y, x, y, k)
                force(out)
            print(f"trace written to {args.trace}; summarize with "
                  f"python tools/xplane_summary.py {args.trace}")
        return

    if args.trace_target == "g":
        # Fast path: skip the d-step component breakdown (each CelebA jit
        # is a 40-60 s TPU compile); time + trace only the g_step.
        timeit("G forward (fakes)", g_fwd, state, z, y)
        gs = jax.jit(bld._g_step, donate_argnums=())
        timeit("g_step", gs, state, k)
        if args.trace:
            with jax.profiler.trace(args.trace):
                out = None
                for i in range(10):
                    out = gs(state, k)
                force(out)
            print(f"trace written to {args.trace}; summarize with "
                  f"python tools/xplane_summary.py {args.trace}")
        return

    fake = g_fwd(state, z, y)

    timeit("G forward (fakes)", g_fwd, state, z, y)

    ghost = jax.jit(lambda p, x, y: conv_ghost.dcresnet_real_ghost(
        p, x, y, n_classes=2, arch="ACGAN", aux_type="wasserstein",
        aux_scalar=1.0, row_w=bld._row_weights(y), concat_planes=False,
        max_norm=200.0, per_layer=False,
        compute_dtype=bld.compute_dtype)[0])
    timeit("conv-ghost real pass", ghost, state.d_params, x, y)

    def fake_bwd(p, fake, y):
        def fs(p):
            out, aux_o = bld._d_apply(p, fake, y, aux=True, bpc=True)
            return jnp.sum(losses.d_fake_loss(bld.family, out, "none"))
        return jax.grad(fs)(p)
    timeit("fake backward", jax.jit(fake_bwd), state.d_params, fake, y)

    def pen(p, px, py, fake, y, key):
        return bld._penalty_grads(p, px, py, fake, y, key)[1]
    timeit("WGAN-GP penalty grads", jax.jit(pen), state.d_params, x, y,
           fake, y, k)

    def adam(s, g):
        u, o = bld.d_tx.update(g, s.d_opt_state, s.d_params)
        import optax
        return optax.apply_updates(s.d_params, u)
    g0 = jax.jit(fake_bwd)(state.d_params, fake, y)
    timeit("Adam update", jax.jit(adam), state, g0)

    full = jax.jit(bld._d_step_gc, donate_argnums=())
    timeit("FULL d_step_gc", full, state, x, y, x, y, x, y, k)

    gs = jax.jit(bld._g_step, donate_argnums=())
    timeit("g_step", gs, state, k)

    if args.trace:
        if args.trace_target == "g":
            with jax.profiler.trace(args.trace):
                out = None
                for i in range(10):
                    out = gs(state, k)
                force(out)
        else:
            with jax.profiler.trace(args.trace):
                out = None
                for i in range(10):
                    out = full(state, x, y, x, y, x, y, k)
                force(out)
        print(f"trace written to {args.trace}; summarize with "
              f"python tools/xplane_summary.py {args.trace}")


if __name__ == "__main__":
    main()
