"""BEV region-proposal heads (flax, NHWC).

Equivalent of the reference's `second/pytorch/models/rpn.py` trunk heads:
`RPN :1028-1211` (fixed 3 blocks) and `RPNV2 :1213+` (arbitrary stages) are
unified here as one `RPN` module with per-stage (layer_nums, stride, filters)
lists, transposed-conv upsampling of each stage to a common resolution,
concatenation, and 1×1 cls/box/dir heads. The camera-fusion variant
(`RPN_FUSION :753-1023`) lives in `models/fusion.py`.

Outputs keep the reference's anchor layout: the head axis is ordered
[anchor, code] per spatial cell, flattened row-major over (H, W, anchors).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBlock, DeconvBlock


class RPNBase(nn.Module):
    """Shared conv trunk: staged downsampling blocks + upsample-concat."""
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (128, 128, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    num_upsample_filters: Sequence[int] = (256, 256, 256)
    use_norm: bool = True
    use_groupnorm: bool = False
    num_groups: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (len(self.layer_nums) == len(self.layer_strides)
                == len(self.num_filters) == len(self.upsample_strides)
                == len(self.num_upsample_filters))
        ups = []
        dtype = jnp.dtype(self.dtype) if self.dtype is not None else None
        if dtype is not None:
            x = x.astype(dtype)
        for i, n_layers in enumerate(self.layer_nums):
            x = ConvBlock(self.num_filters[i], 3, self.layer_strides[i],
                          use_norm=self.use_norm,
                          use_groupnorm=self.use_groupnorm,
                          num_groups=self.num_groups, dtype=dtype)(x, train)
            for _ in range(n_layers):
                x = ConvBlock(self.num_filters[i], 3, 1,
                              use_norm=self.use_norm,
                              use_groupnorm=self.use_groupnorm,
                              num_groups=self.num_groups,
                              dtype=dtype)(x, train)
            ups.append(DeconvBlock(self.num_upsample_filters[i],
                                   self.upsample_strides[i],
                                   use_norm=self.use_norm,
                                   use_groupnorm=self.use_groupnorm,
                                   num_groups=self.num_groups,
                                   dtype=dtype)(x, train))
        out = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        return out


class RPNHead(nn.Module):
    """1×1 cls / box / direction heads over a trunk feature map.

    Head outputs are always fp32 (decode/loss numerics) regardless of the
    trunk compute dtype.
    """
    num_class: int = 1
    num_anchor_per_loc: int = 2
    box_code_size: int = 7
    encode_background_as_zeros: bool = True
    use_direction_classifier: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)
        num_cls = self.num_anchor_per_loc * (
            self.num_class if self.encode_background_as_zeros
            else self.num_class + 1)
        box_preds = nn.Conv(self.num_anchor_per_loc * self.box_code_size,
                            (1, 1))(x)
        cls_preds = nn.Conv(num_cls, (1, 1))(x)
        out = {"box_preds": box_preds, "cls_preds": cls_preds}
        if self.use_direction_classifier:
            out["dir_cls_preds"] = nn.Conv(self.num_anchor_per_loc * 2,
                                           (1, 1))(x)
        return out


class RPN(nn.Module):
    """Trunk + heads (reference RPN / RPNV2)."""
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (128, 128, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    num_upsample_filters: Sequence[int] = (256, 256, 256)
    num_class: int = 1
    num_anchor_per_loc: int = 2
    box_code_size: int = 7
    encode_background_as_zeros: bool = True
    use_direction_classifier: bool = False
    use_norm: bool = True
    use_groupnorm: bool = False
    num_groups: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        trunk = RPNBase(self.layer_nums, self.layer_strides, self.num_filters,
                        self.upsample_strides, self.num_upsample_filters,
                        self.use_norm, self.use_groupnorm, self.num_groups,
                        self.dtype, name="trunk")(x, train)
        out = RPNHead(self.num_class, self.num_anchor_per_loc,
                      self.box_code_size, self.encode_background_as_zeros,
                      self.use_direction_classifier, name="head")(trunk)
        out["trunk"] = trunk
        return out


RPN_REGISTRY = {
    "RPN": RPN,
    "RPNV2": RPN,
}
