"""Building blocks for the model zoo.

Flax re-designs of the reference's Flux combinators and conv blocks
(``src/nets/net_build.jl:6-54``): channel-concat parallel branches, skip
connections, ConvTranspose->Conv up/down blocks with per-image
normalization, and stride-1 same-pad max-pool variants.  NHWC layout,
orthogonal init as in the reference.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def relu1(x: jnp.ndarray) -> jnp.ndarray:
    """``min(relu(x), 1)`` (reference ``net_build.jl:8``)."""
    return jnp.minimum(jnp.maximum(x, 0.0), 1.0)


def chcat(*xs: jnp.ndarray) -> jnp.ndarray:
    """Channel-axis concat (reference ``chcat``, ``net_build.jl:6``; NHWC)."""
    return jnp.concatenate(xs, axis=-1)


def normalise(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-image standardization over (H, W, C), no learned affine.

    Mirrors ``Flux.normalise(x, dims=(1,2,3))`` (``net_build.jl:17``):
    subtract the per-batch-element mean and divide by the (uncorrected)
    std + eps.
    """
    axes = tuple(range(1, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    sigma = jnp.sqrt(jnp.var(x, axis=axes, keepdims=True)) + eps
    return (x - mu) / sigma


class Activation(nn.Module):
    """Elementwise activation wrapper (reference ``net_build.jl:11-15``)."""

    fn: Callable

    def __call__(self, x):
        return self.fn(x)


class Chain(nn.Module):
    """Sequential composition (Flux ``Chain``)."""

    layers: Sequence[Any]

    @nn.compact
    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class Parallel(nn.Module):
    """Apply branches to the same input and merge (Flux ``Parallel``)."""

    branches: Sequence[Any]
    merge: Callable = chcat

    @nn.compact
    def __call__(self, x):
        return self.merge(*[branch(x) for branch in self.branches])


class SkipConnection(nn.Module):
    """``merge(inner(x), x)`` (Flux ``SkipConnection``)."""

    inner: Any
    merge: Callable = chcat

    @nn.compact
    def __call__(self, x):
        return self.merge(self.inner(x), x)


_ORTHO = nn.initializers.orthogonal()


class UpDownBlock(nn.Module):
    """ConvTranspose(valid) -> Conv(valid) -> normalise -> relu6.

    Spatial-size preserving when both kernels match (grow k-1, shrink k-1) —
    reference ``updownblock`` (``net_build.jl:20-27``).
    """

    up_kernel: tuple[int, int]
    down_kernel: tuple[int, int]
    up_features: int
    down_features: int

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.up_features, self.up_kernel, padding="VALID", kernel_init=_ORTHO
        )(x)
        x = nn.Conv(
            self.down_features, self.down_kernel, padding="VALID", kernel_init=_ORTHO
        )(x)
        return relu6(normalise(x))


class DownBlock(nn.Module):
    """Conv(valid) -> normalise -> MaxPool(same, stride 1) -> relu6
    (reference ``downblock``, ``net_build.jl:30-37``)."""

    kernel: tuple[int, int]
    features: int
    pool_window: tuple[int, int]

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, padding="VALID", kernel_init=_ORTHO)(x)
        x = normalise(x)
        x = nn.max_pool(x, self.pool_window, strides=(1, 1), padding="SAME")
        return relu6(x)


class UpBlock(nn.Module):
    """ConvTranspose(valid) -> normalise -> MaxPool(same, stride 1) -> relu6
    (reference ``upblock``, ``net_build.jl:40-47``)."""

    kernel: tuple[int, int]
    features: int
    pool_window: tuple[int, int]

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, self.kernel, padding="VALID", kernel_init=_ORTHO)(x)
        x = normalise(x)
        x = nn.max_pool(x, self.pool_window, strides=(1, 1), padding="SAME")
        return relu6(x)


class UpDownResidualBlock(nn.Module):
    """Parallel(chcat, Chain(inner...), UpDownBlock x2) — the recursive
    residual assembly of the autoencoder (reference ``updownresidualblock``,
    ``net_build.jl:50-54``)."""

    inner: Sequence[Any]
    up_kernel: tuple[int, int]
    down_kernel: tuple[int, int]
    up_features: int
    down_features: int

    @nn.compact
    def __call__(self, x):
        fwd = x
        for layer in self.inner:
            fwd = layer(fwd)
        updown = UpDownBlock(
            self.up_kernel, self.down_kernel, self.up_features, self.down_features
        )(x)
        updown = UpDownBlock(
            self.up_kernel, self.down_kernel, self.down_features, self.down_features
        )(updown)
        return chcat(fwd, updown)
