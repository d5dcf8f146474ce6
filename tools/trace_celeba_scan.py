"""Xplane-trace the CelebA flagship D step in its PRODUCTION scan form.

The per-call compile of the same step sinks/fuses differently from the
lax.scan body the Trainer actually runs (RESULTS.md round 3: the flat-noise
relayout pathology only appeared in the scan form), so roofline accounting
must trace the scan. Mirrors bench.py bench_celeba_jax; writes a trace dir
for tools/xplane_summary.py.

Usage (TPU): python tools/trace_celeba_scan.py [--fp32] [--steps N] [--g]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--g", action="store_true",
                    help="scan the G step instead of the D step")
    ap.add_argument("--out", default="/tmp/celeba_scan_trace")
    args = ap.parse_args()

    from csl_gan_tpu import options
    from csl_gan_tpu.models.registry import init_models
    from csl_gan_tpu.training.steps import TrainStepBuilder

    b = 128
    opt = options.parse([
        "CelebA", "--conditional", "-dpm", "gc", "-bs", str(b),
        "--manual_seed", "7", "-nms", "1", "--mean_sample_size", "8",
        "--bf16", "false" if args.fp32 else "true",
        "-o", "/tmp/trace_celeba_scan"])
    (G, Gv), (D, Dv) = init_models(opt)
    bld = TrainStepBuilder(opt, G, D)
    state = bld.init_state(Gv, Dv)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (b, 64, 64, 3), minval=-1, maxval=1)
    y = jax.random.randint(k, (b,), 0, 2)
    n = args.steps

    if args.g:
        def loop(st, key):
            def body(carry, i):
                st, m = bld._g_step(carry, jax.random.fold_in(key, i))
                return st, m["g_adv_loss"]
            st, losses = jax.lax.scan(body, st, jnp.arange(n))
            return bld._constrain_state(st), losses[-1]
    else:
        def loop(st, key):
            # Production parity: D steps between G updates consume the
            # carried pre-collapsed phase kernels (--phase_carry).
            pcache = bld.phase_collapse(st.g_params)

            def body(carry, i):
                st, m = bld._d_core(carry, x, y, x, y, x, y,
                                    jax.random.fold_in(key, i), True, None,
                                    pcache)
                return st, m["d_adv_loss"]
            st, losses = jax.lax.scan(body, st, jnp.arange(n))
            return bld._constrain_state(st), losses[-1]

    loop = jax.jit(loop, donate_argnums=(0,))
    t0 = time.perf_counter()
    state, last = loop(state, k)
    float(jax.device_get(last))
    print(f"compile + first {n} steps: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    state, last = loop(state, jax.random.fold_in(k, 1))
    float(jax.device_get(last))
    wall = (time.perf_counter() - t0) / n
    print(f"steady: {wall * 1e3:.2f} ms/step wall", file=sys.stderr)
    with jax.profiler.trace(args.out):
        state, last = loop(state, jax.random.fold_in(k, 2))
        float(jax.device_get(last))
    print(f"trace written to {args.out}; summarize with\n"
          f"  python tools/xplane_summary.py {args.out} 60", file=sys.stderr)


if __name__ == "__main__":
    main()
