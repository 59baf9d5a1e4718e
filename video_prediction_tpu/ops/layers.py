"""Layer primitives with string-registry variants.

TPU-native counterpart of the reference's ``video_prediction/ops.py``
(``conv2d/deconv2d/dense/pool2d/upsample_conv2d/conv_pool2d/lrelu/
instancenorm/get_norm_layer``...).  The registries (norm / activation /
upsample / downsample) are the single choke point for swapping variants via
string hparams, mirroring the reference's ``get_*_layer`` helpers.

All convolutions are NHWC (TPU-preferred layout). Modules are thin wrappers
over ``flax.linen`` so spectral-norm variants (see ``spectral.py``) can share
one code path.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def lrelu(x: jax.Array, alpha: float = 0.2) -> jax.Array:
    """Leaky ReLU (reference default slope 0.2: ``ops.py#lrelu``)."""
    return nn.leaky_relu(x, negative_slope=alpha)


def pool2d(x: jax.Array, pool_size: int = 2, mode: str = "avg") -> jax.Array:
    """2-D pooling over NHWC, window == stride (reference ``ops.py#pool2d``)."""
    window = (1, pool_size, pool_size, 1)
    if mode == "avg":
        return nn.avg_pool(x, (pool_size, pool_size), strides=(pool_size, pool_size))
    if mode == "max":
        return nn.max_pool(x, (pool_size, pool_size), strides=(pool_size, pool_size))
    raise ValueError(f"unknown pool mode {mode!r} (want 'avg'|'max'), window={window}")


def upsample2d(x: jax.Array, scale: int = 2, method: str = "nearest") -> jax.Array:
    """Spatial upsample of NHWC by integer ``scale``.

    ``nearest`` is a pure reshape/broadcast (no gather -> fast on TPU);
    ``bilinear`` uses ``jax.image.resize``.
    """
    b, h, w, c = x.shape
    if method == "nearest":
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
        return x.reshape(b, h * scale, w * scale, c)
    return jax.image.resize(x, (b, h * scale, w * scale, c), method=method)


class Dense(nn.Module):
    """Fully connected layer (reference ``ops.py#dense``)."""

    features: int
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype)(x)


class Conv2D(nn.Module):
    """2-D convolution, NHWC, SAME padding (reference ``ops.py#conv2d``)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bias: bool = True
    padding: str = "SAME"
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class Conv3D(nn.Module):
    """3-D convolution over (T, H, W) for video discriminators
    (reference ``ops.py#conv3d`` used by ``networks.py`` video SN-disc)."""

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (1, 1, 1)
    use_bias: bool = True
    padding: str = "SAME"
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.features,
            tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


def local2d_apply(x: jax.Array, weights: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Locally-connected 2-D convolution: every output pixel owns a kernel.

    Args:
      x: ``[B, H, W, Cin]`` NHWC input.
      weights: ``[H, W, kh, kw, Cin, Cout]`` per-pixel kernels, SAME padding.
      bias: optional ``[Cout]``.

    Reference ``ops.py#local2d``. TPU formulation: kh*kw shifted per-pixel
    matmuls (``einsum bhwc,hwcd->bhwd``) that XLA batches on the MXU with
    (h, w) as batch dims — no ``[B,H,W,kh,kw,Cin]`` patch tensor in HBM
    (same design as ``ops/cdna.py``).
    """
    b, h, w, cin = x.shape
    hh, ww, kh, kw, cin2, cout = weights.shape
    assert (hh, ww, cin2) == (h, w, cin), (weights.shape, x.shape)
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    padded = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    acc = jnp.zeros((b, h, w, cout), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            tap = jax.lax.slice(padded, (0, i, j, 0), (b, i + h, j + w, cin))
            acc = acc + jnp.einsum(
                "bhwc,hwcd->bhwd",
                tap.astype(jnp.float32),
                weights[:, :, i, j].astype(jnp.float32),
            )
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(x.dtype)


def separable_local2d_apply(
    x: jax.Array,
    vertical: jax.Array,
    horizontal: jax.Array,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Separable locally-connected 2-D conv: every output pixel owns a
    rank-``R`` factorized kernel ``K[i,j] = sum_r v[i,r] * h[j,r]``.

    Args:
      x: ``[B, H, W, C]`` NHWC input.
      vertical: ``[H, W, kh, R, C]`` per-pixel vertical 1-D kernels.
      horizontal: ``[W, kw... ]`` — ``[H, W, kw, R, C]`` per-pixel
        horizontal 1-D kernels.
      bias: optional ``[C]``.

    Reference ``ops.py#separable_local2d`` (reconstruction — the mount is
    empty; the factorized-rank depthwise form is the standard separable
    variant of ``local2d``, cutting per-pixel params from ``kh*kw`` to
    ``(kh+kw)*R`` per channel). TPU formulation mirrors
    ``local2d_apply``: shifted-FMA taps with the per-tap weight composed
    on the fly (``sum_r v_i h_j``, an [H,W,C]-sized contraction per tap)
    — no ``[B,H,W,kh,kw,C]`` patch tensor in HBM. NOTE the factorization
    is per OUTPUT pixel, so the two 1-D passes do NOT compose (untied
    weights would be read at shifted pixels); the tap-product form is the
    correct one.
    """
    b, h, w, c = x.shape
    hh, ww, kh, r, c2 = vertical.shape
    hh2, ww2, kw, r2, c3 = horizontal.shape
    assert (hh, ww, c2) == (h, w, c) and (hh2, ww2, r2, c3) == (h, w, r, c), (
        vertical.shape,
        horizontal.shape,
        x.shape,
    )
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xf = x.astype(jnp.float32)
    vf = vertical.astype(jnp.float32)
    hf = horizontal.astype(jnp.float32)
    padded = jnp.pad(xf, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            tap = jax.lax.slice(padded, (0, i, j, 0), (b, i + h, j + w, c))
            wij = jnp.einsum("hwrc,hwrc->hwc", vf[:, :, i], hf[:, :, j])
            acc = acc + tap * wij[None]
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(x.dtype)


class SeparableLocal2D(nn.Module):
    """Separable locally-connected conv layer (reference
    ``ops.py#separable_local2d``); per-pixel kernels factorized as a sum of
    ``rank`` vertical x horizontal outer products, applied depthwise."""

    kernel_size: int = 3
    rank: int = 1
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        k = self.kernel_size
        init = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
        vertical = self.param("vertical", init, (h, w, k, self.rank, c), jnp.float32)
        horizontal = self.param("horizontal", init, (h, w, k, self.rank, c), jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        return separable_local2d_apply(x.astype(dtype), vertical, horizontal, bias)


class Local2D(nn.Module):
    """Locally-connected conv layer (reference ``ops.py#local2d``); weights
    are untied across spatial positions, so the parameter count scales with
    H*W — use only at small resolutions (as the reference does)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, cin = x.shape
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (h, w, k, k, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        return local2d_apply(x.astype(dtype), kernel, bias)


class ConvTranspose2D(nn.Module):
    """Transposed conv (reference ``ops.py#deconv2d``)."""

    features: int
    kernel_size: int = 3
    strides: int = 2
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.ConvTranspose(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class UpsampleConv2D(nn.Module):
    """Resize-then-conv upsampling (reference ``ops.py#upsample_conv2d``).

    Avoids checkerboard artifacts of transposed convs; on TPU the nearest
    upsample is a free reshape and the conv lands on the MXU.
    """

    features: int
    kernel_size: int = 3
    scale: int = 2
    method: str = "nearest"
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = upsample2d(x, self.scale, self.method)
        return Conv2D(self.features, self.kernel_size, 1, self.use_bias, dtype=self.dtype)(x)


class ConvPool2D(nn.Module):
    """Conv-then-pool downsampling (reference ``ops.py#conv_pool2d``)."""

    features: int
    kernel_size: int = 3
    pool_size: int = 2
    pool_mode: str = "avg"
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv2D(self.features, self.kernel_size, 1, self.use_bias, dtype=self.dtype)(x)
        return pool2d(x, self.pool_size, self.pool_mode)


class _Identity(nn.Module):
    dtype: Dtype | None = None  # accepted for registry-uniformity, unused

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x


def get_norm_layer(name: str) -> Callable[..., nn.Module]:
    """Normalization registry (reference ``ops.py#get_norm_layer``).

    ``instance`` is the reference's default for generators.
    Instance norm == GroupNorm with one channel per group.
    """
    if name in ("none", None, ""):
        return _Identity
    if name == "instance":
        return functools.partial(nn.GroupNorm, num_groups=None, group_size=1, use_bias=True, use_scale=True)
    if name == "layer":
        return nn.LayerNorm
    if name == "group":
        return functools.partial(nn.GroupNorm, num_groups=8)
    raise ValueError(f"unknown norm layer {name!r}")


def get_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    if name in ("none", None, ""):
        return lambda x: x
    table = {
        "relu": nn.relu,
        "lrelu": lrelu,
        "leaky_relu": lrelu,
        "elu": nn.elu,
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "swish": nn.swish,
    }
    if name not in table:
        raise ValueError(f"unknown activation {name!r}")
    return table[name]


def get_upsample_layer(name: str) -> Callable[..., nn.Module]:
    """Upsample registry (reference ``ops.py#get_upsample_layer``)."""
    if name == "upsample_conv2d":
        return UpsampleConv2D
    if name == "deconv2d":
        return ConvTranspose2D
    if name == "bilinear_conv2d":
        return functools.partial(UpsampleConv2D, method="bilinear")
    raise ValueError(f"unknown upsample layer {name!r}")


def get_downsample_layer(name: str) -> Callable[..., nn.Module]:
    """Downsample registry (reference ``ops.py#get_downsample_layer``)."""
    if name == "conv_pool2d":
        return ConvPool2D
    if name == "max_pool_conv2d":
        return functools.partial(ConvPool2D, pool_mode="max")
    if name == "conv2d":
        return functools.partial(Conv2D, strides=2)
    raise ValueError(f"unknown downsample layer {name!r}")
