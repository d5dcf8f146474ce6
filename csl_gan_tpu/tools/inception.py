"""InceptionV3 (FID variant) feature extractor in pure JAX.

Functional port of the pytorch_fid InceptionV3 network (the reference's FID
protocol, mem_inf_attack.py:416: 2048-d pool3 features), including the
FID-specific pooling quirks (count_include_pad=False average pools in the
A/C/E blocks; a max pool in the last E block's pool branch).

Weights load from an .npz keyed by the torch state-dict names (conv weights
stored HWIO); `convert_inception_weights.py` (repo root) produces that file
from the standard pt_inception-2015-12-05 checkpoint on a machine that has
it. Point $FID_INCEPTION_WEIGHTS at the npz and tools/fid.py reports
canonical FID; without it, the pixel-feature fallback is used.

Input: NHWC float images in [0, 1] of any resolution — resized to 299x299
bilinear and mapped to [-1, 1], matching pytorch_fid's preprocessing.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-3  # torchvision BasicConv2d BatchNorm eps


class _Params:
    """Parameter accessor: reads from a dict, or records shapes/creates
    random values when collecting (for structural tests)."""

    def __init__(self, params: Optional[Dict[str, np.ndarray]] = None,
                 rng: Optional[np.random.Generator] = None):
        self.params = params
        self.rng = rng
        self.shapes: Dict[str, tuple] = {}

    def get(self, name: str, shape: tuple) -> jnp.ndarray:
        self.shapes[name] = shape
        if self.params is not None:
            arr = self.params[name]
            assert tuple(arr.shape) == shape, (name, arr.shape, shape)
            return jnp.asarray(arr)
        scale = 0.1 if name.endswith(".conv.weight") else 1.0
        if name.endswith((".bn.weight",)):
            return jnp.ones(shape)
        if name.endswith((".bn.bias", ".bn.running_mean")):
            return jnp.zeros(shape)
        if name.endswith(".bn.running_var"):
            return jnp.ones(shape)
        return jnp.asarray(self.rng.normal(0, scale, shape), jnp.float32)


def _conv_bn(p: _Params, name: str, x, cout: int, kernel, stride=1, padding=0):
    kh, kw = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    cin = x.shape[-1]
    w = p.get(name + ".conv.weight", (kh, kw, cin, cout))
    if isinstance(padding, tuple):
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    else:
        pad = [(padding, padding), (padding, padding)]
    x = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    gamma = p.get(name + ".bn.weight", (cout,))
    beta = p.get(name + ".bn.bias", (cout,))
    mean = p.get(name + ".bn.running_mean", (cout,))
    var = p.get(name + ".bn.running_var", (cout,))
    x = (x - mean) * jax.lax.rsqrt(var + EPS) * gamma + beta
    return jax.nn.relu(x)


def _max_pool(x, window=3, stride=2, padding=0):
    pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1),
                                 (1, stride, stride, 1), pad)


def _avg_pool_fid(x, window=3, stride=1, padding=1):
    """Average pool with count_include_pad=False (the FID quirk)."""
    pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                   (1, window, window, 1),
                                   (1, stride, stride, 1), pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                                   (1, window, window, 1),
                                   (1, stride, stride, 1), pad)
    return summed / counts


def _inception_a(p, name, x, pool_features):
    b1 = _conv_bn(p, f"{name}.branch1x1", x, 64, 1)
    b5 = _conv_bn(p, f"{name}.branch5x5_1", x, 48, 1)
    b5 = _conv_bn(p, f"{name}.branch5x5_2", b5, 64, 5, padding=2)
    b3 = _conv_bn(p, f"{name}.branch3x3dbl_1", x, 64, 1)
    b3 = _conv_bn(p, f"{name}.branch3x3dbl_2", b3, 96, 3, padding=1)
    b3 = _conv_bn(p, f"{name}.branch3x3dbl_3", b3, 96, 3, padding=1)
    bp = _avg_pool_fid(x)
    bp = _conv_bn(p, f"{name}.branch_pool", bp, pool_features, 1)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, name, x):
    b3 = _conv_bn(p, f"{name}.branch3x3", x, 384, 3, stride=2)
    bd = _conv_bn(p, f"{name}.branch3x3dbl_1", x, 64, 1)
    bd = _conv_bn(p, f"{name}.branch3x3dbl_2", bd, 96, 3, padding=1)
    bd = _conv_bn(p, f"{name}.branch3x3dbl_3", bd, 96, 3, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, name, x, c7):
    b1 = _conv_bn(p, f"{name}.branch1x1", x, 192, 1)
    b7 = _conv_bn(p, f"{name}.branch7x7_1", x, c7, 1)
    b7 = _conv_bn(p, f"{name}.branch7x7_2", b7, c7, (1, 7), padding=(0, 3))
    b7 = _conv_bn(p, f"{name}.branch7x7_3", b7, 192, (7, 1), padding=(3, 0))
    bd = _conv_bn(p, f"{name}.branch7x7dbl_1", x, c7, 1)
    bd = _conv_bn(p, f"{name}.branch7x7dbl_2", bd, c7, (7, 1), padding=(3, 0))
    bd = _conv_bn(p, f"{name}.branch7x7dbl_3", bd, c7, (1, 7), padding=(0, 3))
    bd = _conv_bn(p, f"{name}.branch7x7dbl_4", bd, c7, (7, 1), padding=(3, 0))
    bd = _conv_bn(p, f"{name}.branch7x7dbl_5", bd, 192, (1, 7), padding=(0, 3))
    bp = _avg_pool_fid(x)
    bp = _conv_bn(p, f"{name}.branch_pool", bp, 192, 1)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, name, x):
    b3 = _conv_bn(p, f"{name}.branch3x3_1", x, 192, 1)
    b3 = _conv_bn(p, f"{name}.branch3x3_2", b3, 320, 3, stride=2)
    b7 = _conv_bn(p, f"{name}.branch7x7x3_1", x, 192, 1)
    b7 = _conv_bn(p, f"{name}.branch7x7x3_2", b7, 192, (1, 7), padding=(0, 3))
    b7 = _conv_bn(p, f"{name}.branch7x7x3_3", b7, 192, (7, 1), padding=(3, 0))
    b7 = _conv_bn(p, f"{name}.branch7x7x3_4", b7, 192, 3, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, name, x, pool_max: bool):
    b1 = _conv_bn(p, f"{name}.branch1x1", x, 320, 1)
    b3 = _conv_bn(p, f"{name}.branch3x3_1", x, 384, 1)
    b3a = _conv_bn(p, f"{name}.branch3x3_2a", b3, 384, (1, 3), padding=(0, 1))
    b3b = _conv_bn(p, f"{name}.branch3x3_2b", b3, 384, (3, 1), padding=(1, 0))
    b3 = jnp.concatenate([b3a, b3b], axis=-1)
    bd = _conv_bn(p, f"{name}.branch3x3dbl_1", x, 448, 1)
    bd = _conv_bn(p, f"{name}.branch3x3dbl_2", bd, 384, 3, padding=1)
    bda = _conv_bn(p, f"{name}.branch3x3dbl_3a", bd, 384, (1, 3), padding=(0, 1))
    bdb = _conv_bn(p, f"{name}.branch3x3dbl_3b", bd, 384, (3, 1), padding=(1, 0))
    bd = jnp.concatenate([bda, bdb], axis=-1)
    if pool_max:
        # FIDInceptionE_2: max pool in the pool branch (pytorch_fid quirk).
        bp = _max_pool(x, 3, 1, 1)
    else:
        bp = _avg_pool_fid(x)
    bp = _conv_bn(p, f"{name}.branch_pool", bp, 192, 1)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def _resize_bilinear(x, size=299):
    return jax.image.resize(x, (x.shape[0], size, size, x.shape[3]), "bilinear")


def inception_features(p: _Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: NHWC in [0,1] -> [N, 2048] pool3 features."""
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    x = _resize_bilinear(x)
    x = x * 2.0 - 1.0
    x = _conv_bn(p, "Conv2d_1a_3x3", x, 32, 3, stride=2)
    x = _conv_bn(p, "Conv2d_2a_3x3", x, 32, 3)
    x = _conv_bn(p, "Conv2d_2b_3x3", x, 64, 3, padding=1)
    x = _max_pool(x)
    x = _conv_bn(p, "Conv2d_3b_1x1", x, 80, 1)
    x = _conv_bn(p, "Conv2d_4a_3x3", x, 192, 3)
    x = _max_pool(x)
    x = _inception_a(p, "Mixed_5b", x, 32)
    x = _inception_a(p, "Mixed_5c", x, 64)
    x = _inception_a(p, "Mixed_5d", x, 64)
    x = _inception_b(p, "Mixed_6a", x)
    x = _inception_c(p, "Mixed_6b", x, 128)
    x = _inception_c(p, "Mixed_6c", x, 160)
    x = _inception_c(p, "Mixed_6d", x, 160)
    x = _inception_c(p, "Mixed_6e", x, 192)
    x = _inception_d(p, "Mixed_7a", x)
    x = _inception_e(p, "Mixed_7b", x, pool_max=False)
    x = _inception_e(p, "Mixed_7c", x, pool_max=True)
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [N, 2048]


def param_shapes() -> Dict[str, tuple]:
    """All parameter names/shapes (drives the converter and tests)."""
    p = _Params(rng=np.random.default_rng(0))
    inception_features(p, jnp.zeros((1, 32, 32, 3)))
    return p.shapes


def random_params(seed: int = 0) -> Dict[str, np.ndarray]:
    shapes = param_shapes()
    p = _Params(rng=np.random.default_rng(seed))
    return {name: np.asarray(p.get(name, shape)) for name, shape in shapes.items()}


def load_params(weights_path: str) -> Dict[str, np.ndarray]:
    data = np.load(weights_path)
    return {k: data[k] for k in data.files}


def make_inception_features(weights_path: str):
    """Returns feature_fn(images NHWC [0,1]) -> [N, 2048] using loaded
    weights (tools/fid.py plugs this in when $FID_INCEPTION_WEIGHTS is set)."""
    params = load_params(weights_path)

    @jax.jit
    def feature_fn(images):
        return inception_features(_Params(params), jnp.asarray(images))

    return feature_fn
