"""Shared building blocks for all model families.

Initializers reproduce torch's nn.Linear / nn.Conv2d defaults
(kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for weights, and
U(+-1/sqrt(fan_in)) for biases) so weight distributions match the reference
at init; exact bitwise RNG parity with torch is impossible and parity is
defined distributionally (SURVEY.md §7).

All image tensors are NHWC — the TPU-native layout (channels on the minor,
128-lane axis) — instead of the reference's NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_kernel_init(in_axes=None):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) over the kernel's fan-in axes."""

    def init(key, shape, dtype=jnp.float32):
        # Dense kernels are (fan_in, fan_out); conv kernels (kh, kw, in, out).
        fan_in = 1
        for d in shape[:-1]:
            fan_in *= d
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class TorchDense(nn.Module):
    """nn.Linear with torch-default init.

    `dtype` is the COMPUTE dtype (flax convention): params are stored fp32
    and cast for the matmul — bf16 puts the contraction on the MXU fast path
    with fp32 accumulation.
    """
    features: int
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / (fan_in ** 0.5)
        kernel = self.param("kernel", torch_kernel_init(), (fan_in, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -bound, bound),
                (self.features,),
            )
            y = y + bias
        return y


class TorchConv(nn.Module):
    """nn.Conv2d (NHWC) with torch-default init.

    `dtype` is the COMPUTE dtype (params stay fp32); bf16 convs hit the MXU
    fast path with fp32 accumulation.
    """
    features: int
    kernel_size: int
    strides: int = 1
    padding: str | int = "SAME"
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        ks = (self.kernel_size, self.kernel_size)
        fan_in = x.shape[-1] * ks[0] * ks[1]
        bound = 1.0 / (fan_in ** 0.5)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        y = nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=(self.strides, self.strides),
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_kernel_init(),
            bias_init=lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -bound, bound),
        )(x)
        return y


def norm_layer(bn: bool, name_prefix: str = ""):
    """BatchNorm <-> GroupNorm(32) switch keyed on per-sample-grad mode.

    The reference swaps BatchNorm2d for GroupNorm(32, ch) when per-sample
    gradients are enabled (DCResNet_models.py:23,25; init_util.py:46) because
    batch norm couples samples. Same rule here.
    """
    if bn:
        return nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_running_average=False)
    return nn.GroupNorm(num_groups=32, epsilon=1e-5)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample (NHWC).

    The reference implements this as torch.cat([x]*4, C) + F.pixel_shuffle(2)
    (DCResNet_models.py:13-17), a port of TF depth_to_space-based upsampling.
    (Torch's pixel-shuffle channel ordering actually scrambles channels vs the
    TF original; the following learned conv absorbs the fixed rearrangement,
    so the clean nearest-neighbor semantics is implemented here.)
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def ref_pixel_shuffle_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """The reference UpsampleConv's upsampling EXACTLY: torch.cat([x]*4, C)
    + F.pixel_shuffle(2) in NCHW (reference DCResNet_models.py:13-17).

    Unlike clean nearest-neighbor upsampling, this applies a PHASE-DEPENDENT
    CHANNEL PERMUTATION: out[2i+a, 2j+b, c] = x[i, j, (4c + 2a + b) mod C]
    (pixel_shuffle reads cat-channel 4c + 2a + b, and cat([x]*4) maps
    cat-channel u to x-channel u mod C). A conv trained after it absorbs the
    fixed rearrangement, so fresh training uses upsample_nearest_2x; this op
    exists for reference-checkpoint interop, where the converted conv
    weights expect exactly this arrangement
    (convert_reference_checkpoint.py)."""
    b, h, w, c = x.shape
    idx = jnp.arange(c)
    phases = jnp.stack([x[..., (4 * idx + 2 * a + bb) % c]
                        for a in (0, 1) for bb in (0, 1)], axis=-2)
    o = phases.reshape(b, h, w, 2, 2, c)
    return o.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def one_hot(y, n_classes, dtype=jnp.float32):
    return jax.nn.one_hot(y, n_classes, dtype=dtype)
