"""MNIST vanilla MLP GAN (reference MNIST_models.py:9-52), NHWC + Flax.

family = "vanilla" (BCE losses; see models/losses.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from csl_gan_tpu.models.common import TorchDense, one_hot


class MNISTVanillaG(nn.Module):
    """z (+one-hot y) -> 128 -> 784 -> sigmoid, reshaped to (B, 28, 28, 1)."""
    z_dim: int = 100
    n_classes: int = 0          # 0 => unconditional
    emb_mode: str = "concat"    # vanilla supports concat only (options.py:255)
    bn: bool = True             # unused by the MLP; kept for a uniform ctor
    out_ch: int = 1
    dtype: object = None        # accepted for a uniform ctor; the tiny MLP
    #                             always computes fp32 (no bf16 win)

    family = "vanilla"

    @nn.compact
    def __call__(self, z, y: Optional[jnp.ndarray] = None, train: bool = True):
        x = z
        if y is not None:
            x = jnp.concatenate([x, one_hot(y, self.n_classes)], axis=1)
        x = nn.relu(TorchDense(128)(x))
        x = TorchDense(784 * self.out_ch)(x)
        x = nn.sigmoid(x)
        return x.reshape(z.shape[0], 28, 28, self.out_ch)


class MNISTVanillaD(nn.Module):
    """flatten(x) (+one-hot y) -> 128 -> {1, aux n_classes}.

    Unlike DCResNet's D, the vanilla D concatenates the label one-hot for
    *any* conditional arch including ACGAN (reference MNIST_models.py:41-46).

    When `bpc_fwd`/`bpc_back` are set and `bpc=True` is passed, each layer's
    input activations are L2-clipped in the forward pass and its output
    cotangent in the backward pass — the backprop-clipping scheme of
    reference backprop_clip.py (see ops/backprop_clip.py).
    """
    n_classes: int = 0
    emb_mode: str = "concat"
    conditional_arch: str = "ACGAN"
    aux_loss_type: str = "cross_entropy"
    dtype: object = None        # accepted for a uniform ctor; fp32 compute
    aux_loss_scalar: float = 1.0
    bpc_fwd: Optional[tuple] = None   # per-layer input clip levels
    bpc_back: Optional[tuple] = None  # per-layer cotangent clip levels

    family = "vanilla"

    def setup(self):
        if self.n_classes > 1 and self.aux_loss_type != "cross_entropy":
            raise Exception("Cross entropy loss is the only aux loss supported for "
                            "vanilla architecture.")
        if self.n_classes > 1 and self.emb_mode == "embed":
            raise Exception("Embed for D not implemented")
        self.lin1 = TorchDense(128)
        self.lin2 = TorchDense(1)
        if self.n_classes > 1 and self.conditional_arch == "ACGAN":
            self.linOutAux = TorchDense(self.n_classes)

    def _layer(self, idx, fn, o, bpc: bool):
        if bpc and self.bpc_fwd is not None:
            from csl_gan_tpu.ops.backprop_clip import cotangent_clip, l2_clip
            return cotangent_clip(fn(l2_clip(o, self.bpc_fwd[idx])),
                                  self.bpc_back[idx])
        return fn(o)

    def __call__(self, x, y: Optional[jnp.ndarray] = None, aux: bool = True,
                 bpc: bool = False):
        o = x.reshape(x.shape[0], -1)
        if y is not None:
            o = jnp.concatenate([o, one_hot(y, self.n_classes)], axis=1)
        o = nn.relu(self._layer(0, self.lin1, o, bpc))
        out = self._layer(1, self.lin2, o, bpc)
        aux_out = None
        if aux and self.conditional_arch == "ACGAN" and self.n_classes > 1:
            aux_out = self._layer(2, self.linOutAux, o, bpc)
        return out, aux_out
