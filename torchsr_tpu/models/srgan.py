"""SRGAN generator and discriminator, TPU-native (flax.linen, NHWC).

Capability parity with the reference SRGAN networks
(/root/reference/torchsr/srgan/generator.py:23-81,
residual.py:16-92, discriminator.py:17-88), redesigned for TPU:

  * NHWC layout so XLA tiles convs directly onto the MXU.
  * PixelShuffle -> ``depth_to_space`` (pure reshape/transpose XLA fuses
    with the producing conv) instead of a channel-shuffle op.
  * Compute dtype is configurable (bfloat16 for training = AMP
    equivalent); params are always float32.

Architecture (identical compute graph to the reference):
  generator: conv9x9(3->64)+PReLU -> 16x[conv3-BN-PReLU-conv3-BN + skip]
    -> conv3+BN -> long skip add -> log2(scale) x [conv3(64->256),
    depth_to_space(2), PReLU] -> conv9x9(64->3); no output activation.
  discriminator: 8 conv3 stages 64->512 alternating stride 1/2 with
    BN+LeakyReLU(0.2) (no BN on the first), flatten, Linear->1024,
    LeakyReLU, Linear->1, Sigmoid (probability output for plain BCE).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from torchsr_tpu.models.layers import (
    BatchNorm,
    Conv,
    Dense,
    SubpixelSpaceConv,
    PReLU,
    leaky_relu,
)
from torchsr_tpu.ops.pixel_shuffle import depth_to_space

NUM_RESIDUAL = 16


class ResidualBlock(nn.Module):
    """conv3-BN-PReLU-conv3-BN with an identity skip (64 channels)."""

    channels: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        out = Conv(self.channels, (3, 3), use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(use_running_average=not train,
                        dtype=self.dtype, name="bn1")(out)
        out = PReLU(name="prelu")(out)
        out = Conv(self.channels, (3, 3), use_bias=False,
                   dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(use_running_average=not train,
                        dtype=self.dtype, name="bn2")(out)
        return out + x


class SubpixelConv(nn.Module):
    """conv3(C->4C) -> depth_to_space(2) -> PReLU (one x2 upsample stage).

    ``shuffle=False`` returns the PRE-depth_to_space tensor
    (H, W, 4C) with PReLU applied pre-shuffle — identical values under
    a channel/space permutation (the PReLU slope is a single shared
    scalar, so it commutes with the shuffle).  Used by the generator's
    fused head path, which folds the final depth_to_space into the
    head conv (ops/subpixel_conv.py:conv_head_partially_folded).
    """

    channels: int = 64
    dtype: Any = None
    shuffle: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = Conv(self.channels * 4, (3, 3), dtype=self.dtype,
                   name="conv")(x)
        if self.shuffle:
            out = depth_to_space(out, 2)
        return PReLU(name="prelu")(out)


class _ScanResidualBody(nn.Module):
    """nn.scan body: one ResidualBlock as a (carry, _) step (see
    ``models.scan_compat`` for the param-layout conversion)."""

    dtype: Any = None
    train: bool = True

    @nn.compact
    def __call__(self, carry, _):
        out = ResidualBlock(64, dtype=self.dtype, name="block")(
            carry, train=self.train
        )
        return out, None


class SRGANGenerator(nn.Module):
    """4x SRGAN generator; input/output NHWC in [0, 1] pixel space.

    The residual tower is unrolled by default: measured head-to-head on
    v5e, an nn.scan tower runs 1.6x slower per step (54 vs 87 TFLOP/s)
    because the small 64-channel convs leave no room for scan's
    per-iteration overhead; the longer straightline compile is
    amortized by the persistent compilation cache
    (utils/compile_cache.py).  ``scan_blocks=True`` (--fast-compile)
    trades that runtime for a much shorter cold compile.
    """

    scale_factor: int = 4
    num_residual: int = NUM_RESIDUAL
    dtype: Any = None
    # Compute the 9x9 -> 3ch HR head conv in subpixel space
    # (ops/subpixel_conv.py): mathematically identical, ~7x faster on
    # TPU (3 output channels strand 125/128 MXU lanes at 4x resolution
    # otherwise; measured ~75% of inference time).
    fused_head: bool = True
    scan_blocks: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        dtype = self.dtype or jnp.float32
        x = x.astype(dtype)
        conv1 = Conv(64, (9, 9), dtype=self.dtype, name="conv1")(x)
        conv1 = PReLU(name="prelu1")(conv1)

        out = conv1
        if self.scan_blocks:
            scan = nn.scan(
                _ScanResidualBody,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
                length=self.num_residual,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )(dtype=self.dtype, train=train, name="blocks_scan")
            out, _ = scan(out, None)
        else:
            for i in range(self.num_residual):
                out = ResidualBlock(64, dtype=self.dtype,
                                    name=f"block{i}")(out, train=train)

        out = Conv(64, (3, 3), use_bias=False, dtype=self.dtype,
                   name="conv2")(out)
        out = BatchNorm(use_running_average=not train,
                        dtype=self.dtype, name="bn2")(out)
        out = conv1 + out

        n_up = int(math.log2(self.scale_factor))
        # Fused head path: the LAST upsample stage skips its
        # depth_to_space (PReLU commutes — scalar slope) and the head
        # conv consumes the pre-shuffle tensor directly with a
        # partially-folded kernel: mathematically identical, and the
        # full-resolution d2s + the head's space_to_depth relayout
        # passes are never materialized.
        fold_last = self.fused_head and self.scale_factor == 4
        for i in range(n_up):
            last = fold_last and i == n_up - 1
            out = SubpixelConv(64, dtype=self.dtype,
                               shuffle=not last,
                               name=f"upsample{i}")(out)

        if fold_last:
            out = SubpixelSpaceConv(3, (9, 9), self.scale_factor,
                                    dtype=self.dtype, in_fold=2,
                                    name="conv3")(out)
        elif self.fused_head:
            out = SubpixelSpaceConv(3, (9, 9), self.scale_factor,
                                    dtype=self.dtype, name="conv3")(out)
        else:
            out = Conv(3, (9, 9), dtype=self.dtype, name="conv3")(out)
        return out.astype(jnp.float32)


class SRGANDiscriminator(nn.Module):
    """SRGAN discriminator; outputs a probability (sigmoid head)."""

    image_size: int = 96
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        dtype = self.dtype or jnp.float32
        out = x.astype(dtype)

        # (features, stride, batchnorm); first stage has bias and no BN.
        stages = [
            (64, 1, False),
            (64, 2, True),
            (128, 1, True),
            (128, 2, True),
            (256, 1, True),
            (256, 2, True),
            (512, 1, True),
            (512, 2, True),
        ]
        for i, (feat, stride, use_bn) in enumerate(stages):
            out = Conv(feat, (3, 3), strides=(stride, stride),
                       use_bias=not use_bn, dtype=self.dtype,
                       name=f"conv{i}")(out)
            if use_bn:
                out = BatchNorm(use_running_average=not train,
                                dtype=self.dtype, name=f"bn{i}")(out)
            out = leaky_relu(out, 0.2)

        out = out.reshape(out.shape[0], -1)
        out = Dense(1024, dtype=self.dtype, name="fc1")(out)
        out = leaky_relu(out, 0.2)
        out = Dense(1, dtype=self.dtype, name="fc2")(out)
        out = nn.sigmoid(out.astype(jnp.float32))
        return out
