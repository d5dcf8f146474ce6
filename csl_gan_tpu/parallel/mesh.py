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
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class MeshContext:
    mesh: Mesh
    batch: NamedSharding      # shard leading (batch) axis over `data`
    replicated: NamedSharding

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size

    def put_batch(self, *arrays):
        out = tuple(None if a is None else jax.device_put(a, self.batch)
                    for a in arrays)
        return out if len(out) > 1 else out[0]

    def put_replicated(self, tree):
        return jax.device_put(tree, self.replicated)


def make_mesh(opt=None, devices=None, n: Optional[int] = None) -> MeshContext:
    devices = jax.devices() if devices is None else devices
    if n is None:
        n = getattr(opt, "mesh_shape", None) if opt is not None else None
    n = len(devices) if not n else min(n, len(devices))
    mesh = Mesh(np.asarray(devices[:n]), ("data",))
    return MeshContext(mesh=mesh,
                       batch=NamedSharding(mesh, P("data")),
                       replicated=NamedSharding(mesh, P()))
