"""DCResNet WGAN models (reference DCResNet_models.py:8-153), NHWC + Flax.

Generator: linear stem -> stack of upsampling residual blocks
(nearest-2x upsample + 5x5 conv; BatchNorm<->GroupNorm(32) switch keyed on
per-sample-grad mode) -> norm -> relu -> 3x3 conv -> tanh.

Discriminator: strided 5x5 convs with leaky-relu(0.2), flatten, linear
critic head; conditional variants per reference:
  - CGAN concat: label one-hot broadcast as extra input channel planes
    (DCResNet_models.py:130, after arxiv.org/abs/1705.02894-style concat)
  - ACGAN: no input conditioning (base Discriminator nulls emb_mode,
    models.py:36-37); auxiliary classifier head instead
  - WCGAN: per-class critic head, output = head[y] (DCResNet_models.py:141-143)

family = "wgan" (Wasserstein losses; see models/losses.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from csl_gan_tpu.models.common import (TorchConv, TorchDense, one_hot,
                                       upsample_nearest_2x)


class UpsampleConv(nn.Module):
    """Nearest-2x upsample + same-padded conv (reference DCResNet_models.py:8-17)."""
    features: int
    kernel_size: int
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        return TorchConv(self.features, self.kernel_size, padding="SAME",
                         use_bias=self.use_bias,
                         dtype=self.dtype)(upsample_nearest_2x(x))


class ResBlockUp(nn.Module):
    """Upsampling residual block (reference DCResNet_models.py:19-38)."""
    features: int
    kernel_size: int = 5
    bn: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        s = UpsampleConv(self.features, 1, dtype=self.dtype)(x)

        # Norm layers compute fp32 even under --bf16 (precision-sensitive;
        # the convs carry the MXU bf16 win).
        if self.bn:
            o = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                             use_running_average=not train)(x.astype(jnp.float32))
        else:
            o = nn.GroupNorm(num_groups=32, epsilon=1e-5)(x.astype(jnp.float32))
        o = nn.relu(o)
        o = UpsampleConv(self.features, self.kernel_size, use_bias=False,
                         dtype=self.dtype)(o)
        if self.bn:
            o = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                             use_running_average=not train)(o.astype(jnp.float32))
        else:
            o = nn.GroupNorm(num_groups=32, epsilon=1e-5)(o.astype(jnp.float32))
        o = nn.relu(o)
        o = TorchConv(self.features, self.kernel_size, padding="SAME",
                      dtype=self.dtype)(o)

        return o + s


class DCResNetGenerator(nn.Module):
    """Reference DCResNet_models.py:72-107."""
    channels: Sequence[int]
    first_filter_size: int
    z_dim: int = 128
    out_ch: int = 3
    n_classes: int = 0
    emb_mode: str = "concat"
    bn: bool = True
    dtype: object = None   # compute dtype (--bf16); params stay fp32

    family = "wgan"

    @nn.compact
    def __call__(self, z, y: Optional[jnp.ndarray] = None, train: bool = True):
        x = z
        if y is not None:
            if self.emb_mode == "embed":
                emb = nn.Embed(self.n_classes, self.z_dim,
                               embedding_init=nn.initializers.normal(1.0))(y)
                x = z * emb
            elif self.emb_mode == "concat":
                x = jnp.concatenate([z, one_hot(y, self.n_classes)], axis=1)

        x = TorchDense(self.first_filter_size ** 2 * self.channels[0],
                       dtype=self.dtype)(x)
        x = x.reshape(z.shape[0], self.first_filter_size, self.first_filter_size,
                      self.channels[0])

        for ch in self.channels[1:]:
            x = ResBlockUp(ch, 5, bn=self.bn, dtype=self.dtype)(x, train=train)

        if self.bn:
            x = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                             use_running_average=not train)(x.astype(jnp.float32))
        else:
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5)(x.astype(jnp.float32))
        x = nn.relu(x)
        x = TorchConv(self.out_ch, 3, padding="SAME", dtype=self.dtype)(x)
        return nn.tanh(x.astype(jnp.float32))


class DCResNetDiscriminator(nn.Module):
    """Reference DCResNet_models.py:109-153."""
    channels: Sequence[int]          # [in_ch, c1, c2, ...]
    last_filter_size: int
    n_classes: int = 0
    emb_mode: str = "concat"
    conditional_arch: str = "ACGAN"
    aux_loss_type: str = "wasserstein"
    aux_loss_scalar: float = 1.0
    dtype: object = None   # compute dtype (--bf16); params stay fp32

    family = "wgan"

    @property
    def effective_emb_mode(self):
        # Base Discriminator nulls emb_mode for ACGAN (reference models.py:36-37).
        if self.n_classes > 1 and self.conditional_arch == "ACGAN":
            return None
        return self.emb_mode

    @nn.compact
    def __call__(self, x, y: Optional[jnp.ndarray] = None, aux: bool = True):
        if self.n_classes > 1 and self.emb_mode == "embed":
            raise Exception("Embed for D not implemented")

        o = x
        if self.effective_emb_mode == "concat" and self.n_classes > 1 and y is not None:
            planes = one_hot(y, self.n_classes)[:, None, None, :]
            planes = jnp.broadcast_to(
                planes, (x.shape[0], x.shape[1], x.shape[2], self.n_classes))
            o = jnp.concatenate([o, planes], axis=-1)

        for ch in self.channels[1:]:
            o = nn.leaky_relu(TorchConv(ch, 5, strides=2, padding=2,
                                        dtype=self.dtype)(o),
                              negative_slope=0.2)

        o = o.reshape(x.shape[0], -1)

        aux_out = None
        # For WCGAN the aux head IS the critic, so it is computed regardless
        # of the `aux` flag (calling reference D(aux=False) under WCGAN would
        # crash on the missing linOut — do-not-copy list, SURVEY.md §7).
        if self.n_classes > 1 and self.conditional_arch in ("ACGAN", "WCGAN") \
                and (aux or self.conditional_arch == "WCGAN"):
            aux_out = TorchDense(self.n_classes, use_bias=True,
                                 dtype=self.dtype, name="linOutAux")(o)

        if aux_out is not None and self.conditional_arch == "WCGAN":
            out = jnp.sum(aux_out * one_hot(y, self.n_classes), axis=1, keepdims=True)
        else:
            out = TorchDense(1, use_bias=False, dtype=self.dtype,
                             name="linOut")(o)

        return out, aux_out


# --- Dataset-specific presets (reference CelebA_models.py, MNIST_models.py:54-60) ---

def celeba_g64(**kw):
    return DCResNetGenerator(channels=[512, 512, 256, 128, 64], first_filter_size=4,
                             out_ch=3, **kw)


def celeba_d64(**kw):
    return DCResNetDiscriminator(channels=[3, 64, 128, 256, 512], last_filter_size=4, **kw)


def celeba_g48(**kw):
    return DCResNetGenerator(channels=[512, 512, 256, 128], first_filter_size=6,
                             out_ch=3, **kw)


def celeba_d48(**kw):
    return DCResNetDiscriminator(channels=[3, 128, 256, 512], last_filter_size=6, **kw)


def mnist_dcrn_g(**kw):
    kw.setdefault("z_dim", 128)
    return DCResNetGenerator(channels=[128, 128, 64], first_filter_size=7,
                             out_ch=1, **kw)


def mnist_dcrn_d(**kw):
    return DCResNetDiscriminator(channels=[1, 64, 128], last_filter_size=7, **kw)
