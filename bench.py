#!/usr/bin/env python
"""Benchmark: MNIST conditional DP-GAN (gc, sigma=10, bs=600) full train step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

value  = samples/sec/chip of the full DP train step (per-sample-clipped D
         update + noise + G update) on the default JAX backend (TPU).
vs_baseline = value / baseline where the baseline is the same step math
         executed by torch on this host's CPU (the reference's default
         devices are cpu, reference options.py:141-142; its CUDA path and
         Opacus fork are not installable here, BASELINE.md). The torch
         baseline implements the identical computation — vectorized
         per-sample grads (torch.func.vmap(grad), what Opacus hooks
         compute), flat clipping, Gaussian noise, Adam — on the same
         architecture and batch size, and is cached in
         BENCH_TORCH_BASELINE.json after first measurement.

All progress chatter goes to stderr; stdout carries only the JSON line.
"""

import json
import os
import sys
import time

BATCH = 600
REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BENCH_TORCH_BASELINE.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_jax() -> float:
    """End-to-end training throughput through the real Trainer loop
    (device-resident dataset + per-interval lax.scan), the production path."""
    import jax

    from csl_gan_tpu import options
    from csl_gan_tpu.training.loop import Trainer

    tss = 60000
    opt = options.parse([
        "MNIST", "--conditional", "-dpm", "gc", "--sigma", "10",
        "-bs", str(BATCH), "-tss", str(tss), "--manual_seed", "7",
        "-ne", "1", "--log_every", "100000000", "--sample_every", "100000000",
        "--save_every", "10000", "-o", "/tmp/bench_out",
    ])
    trainer = Trainer(opt)
    assert trainer._scan_mode(), "bench expects the device-side scan path"
    steps_per_epoch = len(trainer.dataloader)

    def force():
        # On this backend block_until_ready can return before the program
        # finishes; pulling a param value forces full execution.
        float(jax.device_get(
            jax.tree_util.tree_leaves(trainer.state.d_params)[0].ravel()[0]))

    t0 = time.perf_counter()
    trainer._epoch_scan(0)
    force()
    log(f"compile + first epoch: {time.perf_counter() - t0:.1f}s")

    # Tunneled-TPU variance: best of several trials.
    n_epochs, n_trials = 5, 3
    best = float("inf")
    e = 1
    for _ in range(n_trials):
        t0 = time.perf_counter()
        for _ in range(n_epochs):
            trainer._epoch_scan(e)
            e += 1
        force()
        best = min(best, (time.perf_counter() - t0) / n_epochs)
    sps = steps_per_epoch * BATCH / best
    log(f"steady state (best of {n_trials}): {best * 1e3:.1f} ms/epoch "
        f"({steps_per_epoch} steps), {sps:,.0f} samples/s")
    return sps


def bench_torch_cpu() -> float:
    """Same step math in torch on CPU (reference-equivalent baseline)."""
    import torch
    import torch.nn.functional as F
    from torch.func import functional_call, grad, vmap

    torch.manual_seed(0)
    n_classes, z_dim, sigma, clip_c = 10, 100, 10.0, 4.0
    eye = torch.eye(n_classes)

    class G(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = torch.nn.Linear(z_dim + n_classes, 128)
            self.l2 = torch.nn.Linear(128, 784)

        def forward(self, z, y):
            x = torch.cat([z, eye[y]], 1)
            return torch.sigmoid(self.l2(F.relu(self.l1(x))))

    class D(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = torch.nn.Linear(784 + n_classes, 128)
            self.l2 = torch.nn.Linear(128, 1)
            self.aux = torch.nn.Linear(128, n_classes)

        def forward(self, x, y):
            h = torch.cat([x.reshape(x.size(0), -1), eye[y]], 1)
            h = F.relu(self.l1(h))
            return self.l2(h), self.aux(h)

    g, d = G(), D()
    g_opt = torch.optim.Adam(g.parameters(), lr=2e-4)
    d_opt = torch.optim.Adam(d.parameters(), lr=2e-4)
    d_params = {k: v.detach() for k, v in d.named_parameters()}

    x = torch.rand(BATCH, 784)
    y = torch.randint(0, n_classes, (BATCH,))
    z = torch.randn(BATCH, z_dim)

    def real_loss_one(params, xi, yi):
        out, aux = functional_call(d, params, (xi.unsqueeze(0), yi.unsqueeze(0)))
        adv = F.binary_cross_entropy_with_logits(out, torch.ones_like(out))
        return adv + F.cross_entropy(aux, yi.unsqueeze(0))

    per_sample_grad = vmap(grad(real_loss_one), in_dims=(None, 0, 0))

    def step():
        # D: per-sample clipped real pass + clean fake pass + noise (gc mode)
        fake = g(z, y).detach()
        ps = per_sample_grad(d_params, x, y)
        flat = torch.sqrt(sum(gp.reshape(BATCH, -1).pow(2).sum(1)
                              for gp in ps.values()))
        factors = (clip_c / (flat + 1e-12)).clamp(max=1.0)
        d_opt.zero_grad()
        f_out, f_aux = d(fake, y)
        fake_loss = BATCH * (F.binary_cross_entropy_with_logits(
            f_out, torch.zeros_like(f_out)) + F.cross_entropy(f_aux, y))
        fake_loss.backward()
        with torch.no_grad():
            for (name, p) in d.named_parameters():
                summed = (ps[name] * factors.view(-1, *([1] * (ps[name].dim() - 1)))).sum(0)
                noise = sigma * clip_c * torch.randn_like(p)
                p.grad = (p.grad + summed + noise) / BATCH
        d_opt.step()
        # G update
        g_opt.zero_grad()
        out, aux = d(g(z, y), y)
        (F.binary_cross_entropy_with_logits(out, torch.ones_like(out))
         + F.cross_entropy(aux, y)).backward()
        g_opt.step()

    step()  # warmup
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        step()
    dt = (time.perf_counter() - t0) / n_iters
    sps = BATCH / dt
    log(f"torch-cpu baseline: {dt * 1e3:.1f} ms/step, {sps:,.0f} samples/s")
    return sps


def main():
    value = bench_jax()
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f)["samples_per_sec"]
        log(f"torch baseline (cached): {baseline:,.0f} samples/s")
    else:
        baseline = bench_torch_cpu()
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"samples_per_sec": baseline,
                       "desc": "torch-cpu same-step-math MNIST cond gc bs600"}, f)
    print(json.dumps({
        "metric": "mnist_cond_dpgan_gc_train_throughput",
        "value": round(value, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
