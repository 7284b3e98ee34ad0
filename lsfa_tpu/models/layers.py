"""Shared NN building blocks (flax.linen, NHWC, TPU dtype policy).

Replaces the reference's sym_common.py conv/bn/relu wrappers
(dff_rfcn/symbols/sym_common.py) — but weight sharing is expressed by
applying the same module twice (functional), not by a global variable
registry.

BatchNorm convention: eps 2e-5 and frozen ("use_global_stats") by default,
matching the reference fine-tuning recipe (sym_common.py:6-9,92-102).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

BN_EPS = 2e-5
BN_MOMENTUM = 0.9


class BatchNorm(nn.Module):
    """BN with the reference's eps/momentum. When ``frozen`` the moving
    stats are always used (reference use_global_stats=True) and never
    updated; otherwise standard train/eval behavior."""

    frozen: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = self.frozen or (not train)
        # no axis_name: under jit+GSPMD the batch dim is globally sharded,
        # so the plain batch mean/var already reduce over all devices (XLA
        # inserts the collectives); axis_name is only for pmap/shard_map.
        return nn.BatchNorm(
            use_running_average=use_ra,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )(x)


def mx_pad(kernel: int, dilate: int = 1):
    """MXNet's symmetric pad for an odd kernel: ((k-1)*d+1)//2 per side
    (sym_common.py conv: pad = ((kernel-1)*dilate+1)//2). NOT the same as
    XLA 'SAME' for stride>1 on even inputs — SAME splits an odd total pad
    as (lo, lo+1) while MXNet pads (p, p), shifting windows by one pixel.
    Exact weight import requires the MXNet convention."""
    p = ((kernel - 1) * dilate + 1) // 2
    return ((p, p), (p, p))


# the reference's init for every NEW (non-pretrained) head: weights ~
# Normal(0, 0.01), bias 0 (init_weight, resnet_v1_101_flownet_rfcn.py:
# 763-868). Matters most for small-fan-in inputs: a lecun-normal 1x1 conv
# on the 3-channel residual has std ~0.58 and its output (O(100) residual
# values) swamps the pretrained features it is ADDED to.
INIT01 = nn.initializers.normal(stddev=0.01)
# FGFA embedding convs use MSRA std instead (get_msra_std, :748-751)
INIT_MSRA = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def conv(x, features: int, kernel: int = 1, stride: int = 1, dilate: int = 1,
         use_bias: bool = True, name: str | None = None, dtype=jnp.float32,
         kernel_init=None):
    """Odd-kernel conv with MXNet pad=(k-1)/2*dilate convention."""
    kw = {} if kernel_init is None else {"kernel_init": kernel_init}
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        kernel_dilation=(dilate, dilate), padding=mx_pad(kernel, dilate),
        use_bias=use_bias, name=name, dtype=dtype, **kw,
    )(x)


def deconv_x2(x, features: int, name: str | None = None, dtype=jnp.float32):
    """4x4 stride-2 transposed conv producing exactly 2x spatial size —
    the reference's Deconvolution(pad=0) + Crop(offset=(1,1)) pair
    (dff_rfcn/symbols/resnet_v1_101_flownet_rfcn.py:174-175): a VALID
    transposed conv yields (2*in + 2); dropping one border row/col on each
    side reproduces the Crop alignment."""
    y = nn.ConvTranspose(
        features, (4, 4), strides=(2, 2), padding="VALID",
        name=name, dtype=dtype,
    )(x)
    return y[..., 1:-1, 1:-1, :]


def leaky_relu(x, slope: float = 0.1):
    return nn.leaky_relu(x, negative_slope=slope)


def avg_pool(x, window: int, stride: int | None = None):
    stride = stride or window
    return nn.avg_pool(x, (window, window), strides=(stride, stride), padding="VALID")


def max_pool_3x3_s2(x):
    """MXNet pool(kernel=3, stride=2, pad=1) 'valid' convention."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def global_avg_pool(x):
    return jnp.mean(x, axis=(-3, -2), keepdims=True)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilate: int = 1
    frozen_bn: bool = True
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv(x, self.features, self.kernel, self.stride, self.dilate,
                 use_bias=False, name="conv", dtype=self.dtype)
        x = BatchNorm(frozen=self.frozen_bn, dtype=self.dtype, name="bn")(x, train)
        if self.relu:
            x = nn.relu(x)
        return x


class MLPConvs(nn.Module):
    """A chain of convs with relu between (not after the last unless asked)."""

    specs: Sequence[tuple]  # (features, kernel)
    final_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = len(self.specs)
        for i, (f, k) in enumerate(self.specs):
            x = conv(x, f, k, name=f"conv{i}", dtype=self.dtype)
            if i < n - 1 or self.final_relu:
                x = nn.relu(x)
        return x
