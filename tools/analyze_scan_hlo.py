"""Categorize the compiled MNIST interval-scan while-body instructions.

The MNIST epoch scan is launch-overhead-bound (RESULTS.md): each while-loop
iteration pays ~5us per fusion/copy. This dumps the optimized HLO of the
production segment runner and counts instructions inside the scan body, to
direct per-iteration kernel-count reductions.

Run: python tools/analyze_scan_hlo.py [--platform cpu]
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if "--platform" in sys.argv:
        plat = sys.argv[sys.argv.index("--platform") + 1]
        import jax
        jax.config.update("jax_platforms", plat)
    import jax
    import jax.numpy as jnp
    import numpy as np

    # Production PRNG (train.py main / bench.py flip this too): without it
    # the lowered scan would include the threefry key-split fusions that the
    # rbg default exists to eliminate, and counts would not match the
    # shipped program.
    jax.config.update("jax_default_prng_impl", "rbg")

    from csl_gan_tpu import options
    from csl_gan_tpu.training.loop import Trainer

    opt = options.parse([
        "MNIST", "--conditional", "-dpm", "gc", "--sigma", "10",
        "-bs", "600", "-tss", "60000", "--manual_seed", "7",
        "-ne", "1", "--log_every", "100000000", "--sample_every", "100000000",
        "--save_every", "10000", "-o", "/tmp/hlo_mnist",
    ])
    trainer = Trainer(opt)
    assert trainer._scan_mode()
    runner = trainer._get_runner(True)

    n = len(trainer.dataloader)
    g_mask = jnp.asarray(np.arange(n) % opt.n_d_steps == 0)
    args = (trainer.state, trainer._seg_rng, *trainer._dev_data,
            trainer._perm_key, 0, g_mask,
            trainer._ms_dummy, trainer._thresh_acc)
    # Match the production specialization: acc_in tuple + epoch arg.
    zero_acc = trainer._zero_scan_acc(runner, args + (None, 0))
    args = args + (zero_acc, 0)
    lowered = jax.jit(runner.__wrapped__ if hasattr(runner, "__wrapped__")
                      else runner).lower(*args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/scan_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped to /tmp/scan_hlo.txt ({len(txt)} chars)")

    # Find the while body computation: largest computation with 'body' in name
    bodies = re.findall(r"%?([\w.\-]*body[\w.\-]*) \([^)]*\) -> ", txt)
    print("body computations:", set(bodies))
    # Count top-level instructions per computation
    comp = None
    counts = {}
    for line in txt.splitlines():
        # Computation headers: params may be tuple-typed (contain parens),
        # so anchor on the final " -> ... {" instead of a paren-free group.
        m = re.match(r"(?:ENTRY )?%?([\w.\-]+) \(.*\) -> .* \{", line)
        if m:
            comp = m.group(1)
            counts[comp] = Counter()
            continue
        if comp and line.startswith("}"):
            comp = None
            continue
        if comp:
            lm = re.match(r"\s+(?:ROOT )?%?[\w.\-]+ = ", line)
            if lm:
                # The opcode is the first lowercase word directly followed
                # by "(" after the result type. Types/layouts never match:
                # shapes are followed by "[", layout tokens T(/S( start
                # uppercase. Handles tuple-typed results, which the old
                # `\S+ opname(` form silently skipped.
                om = re.search(r"\b([a-z][a-z0-9\-]*)\(", line[lm.end():])
                if om:
                    counts[comp][om.group(1)] += 1
    for name, c in sorted(counts.items(),
                          key=lambda kv: -sum(kv[1].values()))[:6]:
        total = sum(c.values())
        if "body" in name or total > 30:
            print(f"\n== {name} ({total} instrs) ==")
            for op, k in c.most_common(15):
                print(f"  {op:25s} {k}")


if __name__ == "__main__":
    main()
