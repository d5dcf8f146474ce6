"""Device mesh and sharding presets.

The reference's only multi-device strategy is a two-GPU G/D split with
explicit `.to(device)` copies and a hand-written micro-batch pipeline
(train.py:163-184; SURVEY.md §2.2). The TPU-native replacement is a single
`jax.sharding.Mesh` over the slice with one `data` axis:

  - the batch (and therefore the per-sample-gradient computation, the
    dominant cost axis, SURVEY.md §5.7) is sharded over `data`;
  - G and D parameters are replicated (they are tiny: <25M params);
  - the G->D activation handoff disappears — fake images stay sharded on
    the same axis, so no collective is needed between G and D;
  - the only collectives are the psums XLA inserts for the clipped-grad
    sums and loss reductions, riding ICI.

The `-gd`/`-dd` device flags are kept for CLI/opt.txt compatibility but only
select how many mesh devices to use via `--mesh_shape`.

`--fsdp` additionally shards the model state itself (G/D params, Adam
moments, and therefore the noisy summed gradients) over the same `data`
axis, ZeRO-3 style: each large leaf is split on its biggest divisible
dimension, GSPMD inserts the all-gathers at use sites and keeps the
per-leaf optimizer update local to the shard. For these GAN sizes this is
a memory/scaling capability, not a speed win — per-device param+optimizer
memory drops ~n_devices×, which is what unlocks much larger D's whose
per-sample-grad working set (the O(batch x params) axis, SURVEY.md §5.7)
would not fit replicated.

`--tp N` adds a second `model` mesh axis (the mesh becomes
(data, model) = (n/N, N)): conv/dense kernels and biases shard their
output-channel dim over `model` (column-parallel), so each layer's MACs
are channel-split across the axis and GSPMD propagates the activation
shardings / inserts the gathers (annotate-params-and-propagate in place
of hand-placed collectives). Composes with --fsdp, which then takes a
different kernel dim on the `data` axis. See state_spec.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this stay replicated under --fsdp/--tp: sharding tiny
# biases/scalars only buys collectives (the clipping vector, Adam counts,
# and GroupNorm scales all land here).
_FSDP_MIN_LEAF = 2 ** 11


def state_spec(shape, dp: int, tp: int, fsdp: bool) -> P:
    """PartitionSpec for one model-state leaf under --tp / --fsdp.

    --tp (tensor parallelism, `model` mesh axis): shard the LAST dim —
    the output-channel/feature dim of conv [H, W, I, O] and dense [I, O]
    kernels and of their [O] biases — column-parallel style. The compute
    for each layer is then channel-split across the `model` axis and GSPMD
    propagates the activation shardings / inserts the gathers where a
    consumer (norm stats, the next layer's full-input contraction) needs
    all channels. Annotate-params-and-propagate is the TPU-native tensor-
    parallel recipe (in place of hand-placed NCCL collectives).

    --fsdp (ZeRO-3, `data` mesh axis): additionally shard the largest
    dp-divisible dim NOT already taken by tp.

    Replicates when the leaf is small or no dimension divides (shard
    shapes must be uniform; padding a remainder shard would corrupt the
    DP-noise and Adam arithmetic for no benefit at these sizes).
    """
    size = 1
    for d in shape:
        size *= d
    if not shape or size < _FSDP_MIN_LEAF:
        return P()
    spec = [None] * len(shape)
    if tp > 1 and shape[-1] % tp == 0:
        spec[-1] = "model"
    if fsdp and dp > 1:
        cands = [(d, ax) for ax, d in enumerate(shape)
                 if d % dp == 0 and spec[ax] is None]
        if cands:
            spec[max(cands)[1]] = "data"
    if not any(spec):
        return P()
    return P(*spec)


def fsdp_spec(shape, n: int) -> P:
    """ZeRO-3-only spec (no tp): largest n-divisible dim over `data`."""
    return state_spec(shape, n, 1, True)


@dataclass
class MeshContext:
    mesh: Mesh
    batch: NamedSharding      # shard leading (batch) axis over `data`
    replicated: NamedSharding
    fsdp: bool = False
    tp: int = 1               # size of the `model` (tensor-parallel) axis
    multihost: bool = False   # mesh spans >1 process (DCN, jax.distributed)

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size

    @property
    def dp(self) -> int:
        return dict(zip(self.mesh.axis_names, self.mesh.devices.shape))["data"]

    @property
    def state_sharded(self) -> bool:
        """True when model-state leaves live sharded (ZeRO-3 and/or tp)."""
        return self.fsdp or self.tp > 1

    def _put(self, x, sharding):
        """device_put, or the multihost equivalent.

        Multihost contract (SURVEY.md §5.8: cross-host = DCN via
        jax.distributed): every process computes/loads IDENTICAL host values
        (same seeds, same synthetic/real data), and
        make_array_from_process_local_data with global_shape == local shape
        slices each process's addressable shards out of its own full copy —
        no cross-host transfer at feed time.
        """
        if x is None:
            return None
        if not self.multihost:
            return jax.device_put(x, sharding)
        local = np.asarray(jax.device_get(x))
        return jax.make_array_from_process_local_data(sharding, local,
                                                      local.shape)

    def put_batch(self, *arrays):
        out = tuple(self._put(a, self.batch) for a in arrays)
        return out if len(out) > 1 else out[0]

    def put_replicated(self, tree):
        return jax.tree.map(lambda l: self._put(l, self.replicated), tree)

    # ---- model-state sharding (--fsdp ZeRO-3 and/or --tp tensor axis) ----

    def _leaf_spec(self, shape) -> P:
        return state_spec(shape, self.dp, self.tp, self.fsdp)

    def leaf_sharding(self, leaf) -> NamedSharding:
        return NamedSharding(self.mesh, self._leaf_spec(np.shape(leaf)))

    def state_shardings(self, tree):
        """A NamedSharding per leaf: state_spec when --fsdp/--tp, else
        replicated.

        Applied uniformly over the whole TrainState: params and the Adam
        mu/nu moments share shapes, so they shard identically; batch_stats,
        the clipping vector, and scalars fall under the size floor and stay
        replicated.
        """
        if not self.state_sharded:
            return jax.tree.map(lambda _: self.replicated, tree)
        return jax.tree.map(self.leaf_sharding, tree)

    def put_state(self, tree):
        """Commit a TrainState to the mesh (sharded under --fsdp/--tp)."""
        if not self.state_sharded:
            return self.put_replicated(tree)
        return jax.tree.map(
            lambda l, s: self._put(l, s), tree,
            self.state_shardings(tree))

    def constrain_state(self, tree):
        """with_sharding_constraint pinning a traced TrainState to its
        sharded layout — applied at jitted-step outputs so GSPMD keeps the
        updated params/moments sharded instead of gathering them."""
        if not self.state_sharded:
            return tree
        return jax.tree.map(
            lambda l: jax.lax.with_sharding_constraint(
                l, NamedSharding(self.mesh, self._leaf_spec(l.shape))),
            tree)


def make_mesh(opt=None, devices=None, n: Optional[int] = None,
              fsdp: Optional[bool] = None,
              tp: Optional[int] = None) -> MeshContext:
    devices = jax.devices() if devices is None else devices
    if n is None:
        n = getattr(opt, "mesh_shape", None) if opt is not None else None
    n = len(devices) if not n else min(n, len(devices))
    if fsdp is None:
        fsdp = bool(getattr(opt, "fsdp", False)) if opt is not None else False
    if tp is None:
        tp = int(getattr(opt, "tp", 1) or 1) if opt is not None else 1
    tp = max(1, min(tp, n))
    if n % tp != 0:
        raise ValueError(f"--tp {tp} must divide the mesh size {n}")
    if tp > 1:
        mesh = Mesh(np.asarray(devices[:n]).reshape(n // tp, tp),
                    ("data", "model"))
    else:
        mesh = Mesh(np.asarray(devices[:n]), ("data",))
    multihost = jax.process_count() > 1 and \
        any(d.process_index != jax.process_index() for d in devices[:n])
    return MeshContext(mesh=mesh,
                       batch=NamedSharding(mesh, P("data")),
                       replicated=NamedSharding(mesh, P()),
                       fsdp=fsdp and n // tp > 1,
                       tp=tp,
                       multihost=multihost)
