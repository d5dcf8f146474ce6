#!/usr/bin/env python
"""Convert the pytorch_fid InceptionV3 checkpoint to the npz format used by
csl_gan_tpu.tools.inception.

Usage (on a machine that has the standard FID checkpoint):

    python convert_inception_weights.py pt_inception-2015-12-05-6726825d.pth \
        fid_inception_v3.npz
    export FID_INCEPTION_WEIGHTS=$PWD/fid_inception_v3.npz

Key mapping: torch `<block>.conv.weight` (OIHW) -> HWIO; BN
weight/bias/running_mean/running_var pass through. The `fc` head and
num_batches_tracked buffers are dropped (FID uses pool3 features only).
"""

import sys

import numpy as np


def main(src: str, dst: str) -> None:
    import torch

    state = torch.load(src, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()

    from csl_gan_tpu.tools.inception import param_shapes
    wanted = param_shapes()

    out = {}
    for name, shape in wanted.items():
        t = state[name]
        arr = t.detach().numpy()
        if name.endswith(".conv.weight"):
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        assert tuple(arr.shape) == shape, (name, arr.shape, shape)
        out[name] = arr.astype(np.float32)

    np.savez_compressed(dst, **out)
    print(f"wrote {len(out)} arrays to {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
