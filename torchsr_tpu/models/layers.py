"""Shared flax.linen building blocks (NHWC, torch-compatible initialization).

These are new TPU-first implementations of the primitives the reference
builds from ``torch.nn`` (srgan/residual.py, esrgan/residual.py): the
convs map to the MXU through XLA's conv lowering, PixelShuffle becomes a
``depth_to_space`` fused with its producing conv, and activations fuse on
the VPU.

Initialization matches torch defaults so training dynamics are comparable:
  * conv/dense kernels: kaiming-uniform with a=sqrt(5)  -> uniform with
    variance 1/(3*fan_in) (``variance_scaling(1/3, 'fan_in', 'uniform')``)
  * biases: uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# torch's default kaiming_uniform(a=sqrt(5)) kernel init.
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_bias_init(fan_in: int) -> Callable:
    """torch's default bias init: uniform(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


class Conv(nn.Module):
    """2D convolution, NHWC, torch-style symmetric padding and init.

    Padding is explicit ``(k//2, k//2)`` per spatial dim — torch's
    ``padding=k//2`` — NOT XLA "SAME": for the discriminators' stride-2
    3x3 convs on even inputs SAME pads asymmetrically (0, 1), which is a
    one-pixel-shifted, non-identical convolution vs the reference
    (srgan/discriminator.py:31-62).  Output sizes are unchanged; values
    now match torch exactly for every conv in the repo (all odd kernels).

    ``kernel_scale`` post-scales the kernel init — used by ESRGAN's
    residual dense blocks which initialize kaiming-normal then multiply by
    0.1 (reference esrgan/residual.py:58-63).
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    use_bias: bool = True
    dtype: Dtype | None = None
    kernel_init: Callable | None = None
    kernel_scale: float | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        fan_in = in_features * int(
            self.kernel_size[0] * self.kernel_size[1]
        )
        kinit = self.kernel_init or torch_kernel_init
        if self.kernel_scale is not None:
            base = kinit
            scale = self.kernel_scale

            def kinit(key, shape, dtype=jnp.float32, _base=base, _s=scale):
                return _base(key, shape, dtype) * _s

        kh, kw = int(self.kernel_size[0]), int(self.kernel_size[1])
        return nn.Conv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kinit,
            bias_init=torch_bias_init(fan_in),
            name="conv",
        )(x)


class _ConvParams(nn.Module):
    """Bare conv parameters (kernel HWIO + bias), no compute.

    Named 'conv' by its parent so the param tree is identical to the
    ``Conv`` wrapper's inner ``nn.Conv`` — checkpoints are
    interchangeable between compute strategies.
    """

    features: int
    kernel_size: Sequence[int]
    in_features: int
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        fan_in = self.in_features * int(kh * kw)
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, self.in_features, self.features),
        )
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        return kernel, bias


class SubpixelSpaceConv(nn.Module):
    """HR conv computed in subpixel space (polyphase repacking).

    Drop-in replacement for ``Conv`` on tensors produced by a
    ``scale``-x upsampling chain: identical math and identical param
    tree, but the conv runs folded by ``space_to_depth(scale)`` so the
    MXU's lanes are filled — decisive for few-channel HR convs (the
    SRGAN 9x9->3 head: ~7x) and still beneficial for 64-channel HR
    convs (same FLOPs at C*r^2 channels; see ops/subpixel_conv.py).
    """

    features: int
    kernel_size: Sequence[int]
    scale: int
    dtype: Dtype | None = None
    # in_fold > 1: the input is the PRE-depth_to_space(in_fold) tensor
    # of a subpixel upsample stage; the shuffle is folded into this
    # conv's kernel (ops/subpixel_conv.py:conv_head_partially_folded)
    # so the full-resolution relayout is never materialized.  Identical
    # math and identical param tree.
    in_fold: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from torchsr_tpu.ops.subpixel_conv import (
            conv_head_partially_folded,
            conv_subpixel_space,
        )

        dtype = self.dtype or jnp.float32
        in_features = x.shape[-1] // (self.in_fold * self.in_fold)
        kernel, bias = _ConvParams(
            self.features, tuple(self.kernel_size), in_features,
            torch_kernel_init, name="conv",
        )()
        if self.in_fold > 1:
            return conv_head_partially_folded(
                x.astype(dtype), kernel.astype(dtype),
                bias.astype(dtype), self.scale, self.in_fold,
            )
        return conv_subpixel_space(
            x.astype(dtype), kernel.astype(dtype), bias.astype(dtype),
            self.scale,
        )


class Dense(nn.Module):
    """Fully connected layer with torch-style init."""

    features: int
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            name="dense",
        )(x)


class PReLU(nn.Module):
    """Parametric ReLU with a single shared learnable slope (init 0.25).

    Matches ``torch.nn.PReLU()`` defaults as used throughout the SRGAN
    generator (reference srgan/generator.py:39, residual.py:29, :68).
    """

    init_value: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha",
            lambda _key: jnp.full((1,), self.init_value, jnp.float32),
        )
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """LeakyReLU(0.2) — the discriminator/ESRGAN activation."""
    return jnp.where(x >= 0, x, x * jnp.asarray(negative_slope, x.dtype))


class BatchNorm(nn.Module):
    """Batch normalization with torch-exact semantics (momentum 0.1,
    eps 1e-5, UNBIASED running-variance updates).

    Train mode normalizes with the batch's biased variance (gradients
    flow through the batch statistics) and updates the running averages
    as ``ra = 0.9*ra + 0.1*stat`` — with torch's ``n/(n-1)`` Bessel
    correction applied to the running VARIANCE only (torch
    BatchNorm2d's documented behavior; flax's nn.BatchNorm uses the
    biased variance for the running update, a small but real deviation
    the step-parity tests would catch).

    Statistics are ALWAYS computed in float32, like torch AMP (autocast
    runs BatchNorm in fp32): in bf16, variance computed in low precision
    can go negative once activations drift during GAN training,
    producing NaNs through rsqrt.  The variance uses running-mean-
    shifted ONE-PASS moments (round 4): ``d = x - stop_grad(ra_mean);
    var = E[d^2] - E[d]^2``.  Identical math to the two-pass
    ``mean((x - mean)^2)`` in exact arithmetic (same gradients), and
    numerically safe unlike the naive ``E[x^2] - E[x]^2`` because the
    shift tracks the batch mean, keeping ``E[d]`` near zero (probe:
    max var deviation 6e-8 f32 at tower shapes).  The win: E[d] and
    E[d^2] are sibling reductions over one activation sweep that XLA
    fuses, where the two-pass form forces a second data-dependent
    sweep — SRGAN tower fwd+bwd 84.8 -> 103.7 TF/s (order-swapped
    confirm 92.7 -> 104.2; tools/probe_bn_stats.py, real v5e).  The
    f32 result is cast back to the surrounding compute dtype.
    """

    use_running_average: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = _TorchBN(
            use_running_average=self.use_running_average, name="bn"
        )(x.astype(jnp.float32))
        return out.astype(self.dtype or x.dtype)


class _TorchBN(nn.Module):
    """Inner BN scope (named 'bn' by the wrapper so the param/stats tree
    layout matches the previous nn.BatchNorm-based implementation and
    existing checkpoints)."""

    use_running_average: bool
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            # Running-mean-shifted one-pass moments: one fused sweep
            # instead of two (see BatchNorm docstring for numerics).
            shift = jax.lax.stop_gradient(ra_mean.value)
            d = x - shift
            s1 = jnp.mean(d, axes)
            mean = shift + s1
            var = jnp.maximum(jnp.mean(d * d, axes) - jnp.square(s1), 0.0)
            if not self.is_initializing():
                n = x.size // c
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (
                    (1.0 - m) * ra_var.value + m * var * bessel
                )
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (x - mean) * inv + bias
