"""ESRGAN generator (RRDB) and discriminator, TPU-native (flax, NHWC).

Capability parity with the reference ESRGAN networks
(/root/reference/torchsr/esrgan/generator.py:23-81, residual.py:17-129,
discriminator.py:17-95), redesigned for TPU:

  * NHWC layout; dense-concat growth along the channel (minor) axis keeps
    concatenations layout-friendly for the MXU.
  * ``F.interpolate(mode='nearest')`` becomes a broadcast-reshape
    ``nearest_upsample`` XLA fuses into the following conv.
  * RDB conv kernels use kaiming-normal scaled by 0.1 with zero biases
    (reference residual.py:58-63).

Architecture (identical compute graph to the reference):
  generator: conv3(3->64) -> 23 RRDB (each = 3 residual-dense blocks of 5
    dense convs with growth 32, residual scale 0.2) -> conv3 trunk ->
    long skip add -> 2x [nearest x2 + conv3 + LeakyReLU] ->
    conv3+LeakyReLU -> conv3(64->3).
  discriminator: 10 conv3 stages to 512 (strided every other), BN+Leaky,
    flatten -> Linear(100) -> Leaky -> Linear(1); *logits* output (the
    relativistic loss uses BCE-with-logits).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchsr_tpu.models.layers import (
    BatchNorm,
    Conv,
    Dense,
    SubpixelSpaceConv,
    _ConvParams,
    leaky_relu,
)
from torchsr_tpu.ops.resize import nearest_upsample

NUM_RESIDUAL = 23

# kaiming_normal (gain sqrt2, fan_in) then x0.1 => variance 0.02/fan_in.
_rdb_kernel_init = nn.initializers.variance_scaling(
    0.02, "fan_in", "normal"
)
_zero_bias = nn.initializers.zeros


class _RDBConvParams(nn.Module):
    """Bare RDB conv params (no compute) with the exact param-tree
    layout of the ``Conv`` wrapper (``conv{i}/conv/{kernel,bias}``), so
    fused- and unfused-compute checkpoints are interchangeable."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _ConvParams(
            self.features, (3, 3), self.in_features,
            _rdb_kernel_init, name="conv",
        )()


def _use_fused_rdb(flag, x, fwd_only: bool = False) -> bool:
    """Resolve the fused-kernel auto default: the Pallas RDB kernel
    needs the Mosaic TPU backend and a per-image spatial extent that
    fits its VMEM block budget (ops/pallas/rdb.py).  Forward-only
    calls (generator ``train=False`` — inference/serving/eval) allow
    the larger fwd cap: without the backward kernel's working set a
    single-image block fits VMEM up to a 128px LR tile (round 4)."""
    if flag is not None:
        return flag
    from torchsr_tpu.ops.pallas.rdb import (
        _MAX_IMAGE_ROWS,
        _MAX_IMAGE_ROWS_FWD,
    )

    cap = _MAX_IMAGE_ROWS_FWD if fwd_only else _MAX_IMAGE_ROWS
    return (
        jax.default_backend() == "tpu"
        and x.shape[1] * x.shape[2] <= cap
    )


class ResidualDenseBlock(nn.Module):
    """5-conv dense block: each conv sees all previous outputs.

    ``fused=True`` (auto on TPU) computes the whole block in one Pallas
    kernel (ops/pallas/rdb.py: VMEM-resident dense concat, lane-packed
    GEMMs, custom-VJP backward) — measured 1.62x faster forward than
    the XLA conv lowering on v5e (tiled inference 1.53x end to end);
    fwd+bwd is at parity, so training is unharmed (round-3 corrected
    protocol, docs/benchmarks.md — the round-2 "6.9x fwd+bwd" was a
    first-timing-loop measurement artifact on the XLA baseline).
    Identical math and identical param tree; ``None`` auto-selects.
    """

    channels: int = 64
    growth_channels: int = 32
    scale_ratio: float = 0.2
    dtype: Any = None
    fused: bool | None = None
    pallas_interpret: bool = False  # CI-only: interpret mode off-TPU
    # Mesh for multi-device runs: the fused kernel must run under
    # shard_map over the batch axis (ops/pallas/rdb.py docstring).
    mesh: Any = None
    # True when this forward will never be differentiated (generator
    # train=False): unlocks the larger forward-only tile cap.
    fwd_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if (
            self.channels == 64
            and self.growth_channels == 32
            and _use_fused_rdb(self.fused, x, self.fwd_only)
        ):
            from torchsr_tpu.ops.pallas.rdb import fused_rdb

            ks, bs = [], []
            for i in range(5):
                cin = self.channels + self.growth_channels * i
                cout = self.growth_channels if i < 4 else self.channels
                k, b = _RDBConvParams(
                    cout, cin, name=f"conv{i + 1}"
                )()
                ks.append(k)
                bs.append(b)
            dtype = self.dtype or jnp.float32
            return fused_rdb(
                x.astype(dtype), tuple(ks), tuple(bs),
                scale_ratio=self.scale_ratio,
                interpret=self.pallas_interpret,
                mesh=self.mesh,
            )

        def conv(features, name):
            return Conv(
                features, (3, 3), dtype=self.dtype,
                kernel_init=_rdb_kernel_init, name=name,
            )

        feats = [x]
        for i in range(4):
            out = conv(self.growth_channels, f"conv{i + 1}")(
                jnp.concatenate(feats, axis=-1)
            )
            out = leaky_relu(out, 0.2)
            feats.append(out)
        out = conv(self.channels, "conv5")(
            jnp.concatenate(feats, axis=-1)
        )
        return out * jnp.asarray(self.scale_ratio, out.dtype) + x


class RRDB(nn.Module):
    """Residual-in-residual dense block: 3 RDBs with a scaled skip."""

    channels: int = 64
    growth_channels: int = 32
    scale_ratio: float = 0.2
    dtype: Any = None
    fused: bool | None = None
    pallas_interpret: bool = False
    mesh: Any = None
    fwd_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = x
        for i in range(3):
            out = ResidualDenseBlock(
                self.channels, self.growth_channels, self.scale_ratio,
                dtype=self.dtype, fused=self.fused,
                pallas_interpret=self.pallas_interpret,
                mesh=self.mesh, fwd_only=self.fwd_only,
                name=f"rdb{i + 1}",
            )(out)
        return out * jnp.asarray(self.scale_ratio, out.dtype) + x


class _ScanRRDBBody(nn.Module):
    """nn.scan body: one RRDB as a (carry, _) -> (carry, None) step.

    The inner child is named ``block`` so the stacked param tree is
    ``blocks_scan/block/...`` — convertible to/from the unrolled
    ``block{i}/...`` layout with ``models.scan_compat``."""

    dtype: Any = None
    fused: bool | None = None
    pallas_interpret: bool = False
    mesh: Any = None
    fwd_only: bool = False

    @nn.compact
    def __call__(self, carry, _):
        out = RRDB(64, 32, 0.2, dtype=self.dtype, fused=self.fused,
                   pallas_interpret=self.pallas_interpret,
                   mesh=self.mesh, fwd_only=self.fwd_only,
                   name="block")(carry)
        return out, None


class ESRGANGenerator(nn.Module):
    """ESRGAN RRDB generator; NHWC in/out, [0, 1] pixel space.

    ``scale_factor`` (power of two; the reference hard-codes 4,
    esrgan/generator.py:73-78) sets the number of nearest+conv
    upsample stages to log2(scale).

    The RRDB tower is unrolled (345 convs): an nn.scan variant compiles
    much faster but costs significant per-step runtime (measured on the
    SRGAN tower: 8x slower), so the one-time compile is paid instead
    and amortized by the persistent compilation cache.
    """

    scale_factor: int = 4
    num_rrdb_blocks: int = NUM_RESIDUAL
    dtype: Any = None
    # Run the final 3-output-channel HR conv in subpixel space
    # (ops/subpixel_conv.py) — 3 output channels strand 125/128 MXU
    # lanes at 4x resolution otherwise.  The 64-channel tail convs stay
    # direct: folding them was measured ~10% slower (the repacked
    # kernel's zero-padding inflates FLOPs more than the lane win).
    fused_tail: bool = True
    # Fused Pallas RDB kernel for the RRDB tower (None = auto: on for
    # the Mosaic TPU backend when the spatial extent fits VMEM).
    fused_rdb: bool | None = None
    pallas_interpret: bool = False
    mesh: Any = None
    # Fast-compile mode: the RRDB tower runs as ONE nn.scan'd block with
    # params stacked on a leading axis (XLA traces/compiles a single
    # block body instead of 345 straightline convs).  Runtime is slower
    # (measured: scan towers leave no room for per-iteration overhead
    # at these conv sizes; see docs/benchmarks.md) — this is the
    # iteration/debug knob (--fast-compile), not the production path.
    # Param layout: 'blocks_scan' with stacked leaves; convert to/from
    # the unrolled block{i} layout with models.scan_compat.
    scan_blocks: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # No batch statistics in the ESRGAN generator; train=False marks
        # the forward as never-differentiated, unlocking the fused RDB
        # kernel's larger forward-only tile cap (_use_fused_rdb).
        fwd_only = not train
        dtype = self.dtype or jnp.float32
        x = x.astype(dtype)

        conv1 = Conv(64, (3, 3), dtype=self.dtype, name="conv1")(x)

        out = conv1
        if self.scan_blocks:
            scan = nn.scan(
                _ScanRRDBBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.num_rrdb_blocks,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )(dtype=self.dtype, fused=self.fused_rdb,
              pallas_interpret=self.pallas_interpret, mesh=self.mesh,
              fwd_only=fwd_only, name="blocks_scan")
            out, _ = scan(out, None)
        else:
            for i in range(self.num_rrdb_blocks):
                out = RRDB(64, 32, 0.2, dtype=self.dtype,
                           fused=self.fused_rdb,
                           pallas_interpret=self.pallas_interpret,
                           mesh=self.mesh, fwd_only=fwd_only,
                           name=f"block{i}")(out)

        out = Conv(64, (3, 3), dtype=self.dtype, name="conv2")(out)
        out = conv1 + out

        for i in range(int(math.log2(self.scale_factor))):
            out = nearest_upsample(out, 2)
            out = Conv(64, (3, 3), dtype=self.dtype,
                       name=f"upsample{i + 1}")(out)
            out = leaky_relu(out, 0.2)

        out = Conv(64, (3, 3), dtype=self.dtype, name="conv3")(out)
        out = leaky_relu(out, 0.2)
        if self.fused_tail:
            out = SubpixelSpaceConv(3, (3, 3), self.scale_factor,
                                    dtype=self.dtype,
                                    name="conv4")(out)
        else:
            out = Conv(3, (3, 3), dtype=self.dtype, name="conv4")(out)
        return out.astype(jnp.float32)


class ESRGANDiscriminator(nn.Module):
    """ESRGAN discriminator; outputs raw logits (no sigmoid)."""

    image_size: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        dtype = self.dtype or jnp.float32
        out = x.astype(dtype)

        stages = [
            (64, 1, False),
            (64, 2, True),
            (128, 1, True),
            (128, 2, True),
            (256, 1, True),
            (256, 2, True),
            (512, 1, True),
            (512, 2, True),
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
        out = Dense(100, dtype=self.dtype, name="fc1")(out)
        out = leaky_relu(out, 0.2)
        out = Dense(1, dtype=self.dtype, name="fc2")(out)
        return out.astype(jnp.float32)
