"""Shared flax building blocks.

Conventions (TPU-first):
  * NHWC layout everywhere (XLA's preferred conv layout on TPU), vs the
    reference's NCHW torch layout.
  * BatchNorm matches the reference's hyperparameters (eps 1e-3,
    torch momentum 0.01 → flax momentum 0.99; `rpn.py:1064-1068`).
  * Convs carry no bias when followed by a norm, like the reference's
    `change_default_args(bias=False)` pattern (`torchplus/tools.py:32-45`).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    """Conv2D → (BatchNorm | GroupNorm | none) → ReLU.

    `dtype` is the compute dtype (bf16 under mixed precision); params and
    normalization statistics stay fp32.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: str | Sequence = "SAME"
    use_norm: bool = True
    use_groupnorm: bool = False
    num_groups: int = 32
    act: Callable = nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), padding=self.padding,
                    use_bias=not self.use_norm, dtype=self.dtype)(x)
        if self.use_norm:
            if self.use_groupnorm:
                x = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-3)(x)
            else:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3)(x)
        return self.act(x)


class DeconvBlock(nn.Module):
    """ConvTranspose2D → norm → ReLU (RPN upsample path)."""
    features: int
    stride: int = 1
    use_norm: bool = True
    use_groupnorm: bool = False
    num_groups: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features, (self.stride, self.stride),
            strides=(self.stride, self.stride), padding="VALID",
            use_bias=not self.use_norm, dtype=self.dtype)(x)
        if self.use_norm:
            if self.use_groupnorm:
                x = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-3)(x)
            else:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3)(x)
        return nn.relu(x)


class DenseBNReLU(nn.Module):
    """Linear → BatchNorm → ReLU over the last axis (VFE layers)."""
    features: int
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, use_bias=not self.use_norm)(x)
        if self.use_norm:
            # reference normalizes over the feature axis with BatchNorm1d on
            # flattened [N*T, C] (`voxel_encoder.py:36-66`)
            shape = x.shape
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3)(x.reshape(-1, shape[-1]))
            x = x.reshape(shape)
        return nn.relu(x)
