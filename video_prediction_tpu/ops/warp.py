"""Dense-flow bilinear image warping.

TPU-native counterpart of the reference's ``video_prediction/flow_ops.py#
image_warp`` (itself modeled on ``tf.contrib.image.dense_image_warp``):
``output[b, y, x] = image[b, y - flow[b,y,x,0], x - flow[b,y,x,1]]`` with
bilinear interpolation and edge clamping.

Implementation: gathers are expressed as ``jnp.take`` on a flattened spatial
axis with precomputed corner indices — four gathers + a weighted sum, all
static shapes. This supports the ``transformation='flow'`` generator variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_to_warp_grid(flow: jax.Array) -> jax.Array:
    """Convert a flow field ``[B,H,W,2]`` (dy, dx) into absolute sample
    coordinates ``[B,H,W,2]`` (query = grid - flow, per dense_image_warp)."""
    b, h, w, _ = flow.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    gx = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    qy = gy - flow[..., 0]
    qx = gx - flow[..., 1]
    return jnp.stack([qy, qx], axis=-1)


def bilinear_sample(image: jax.Array, qy: jax.Array, qx: jax.Array) -> jax.Array:
    """Sample ``image [B,H,W,C]`` at pixel coords ``qy``/``qx`` ``[B, ...]``
    with bilinear interpolation and edge clamping; returns ``[B, ..., C]``.

    Four ``jnp.take_along_axis`` gathers on the flattened spatial axis —
    static shapes, shared by the flow and affine (STP) warps.
    """
    b, h, w, c = image.shape
    out_shape = qy.shape[1:]
    qy = jnp.clip(qy.astype(jnp.float32), 0.0, h - 1.0).reshape(b, -1)
    qx = jnp.clip(qx.astype(jnp.float32), 0.0, w - 1.0).reshape(b, -1)

    y0 = jnp.floor(qy)
    x0 = jnp.floor(qx)
    y1 = jnp.minimum(y0 + 1.0, h - 1.0)
    x1 = jnp.minimum(x0 + 1.0, w - 1.0)
    wy = qy - y0
    wx = qx - x0

    y0i = y0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)

    flat = image.reshape(b, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi)[..., None]  # [B, M, 1]
        return jnp.take_along_axis(flat, idx, axis=1)  # [B, M, C]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wy = wy[..., None].astype(image.dtype)
    wx = wx[..., None].astype(image.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.reshape((b,) + out_shape + (c,))


def image_warp(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear-warp ``image [B,H,W,C]`` by ``flow [B,H,W,2]`` (dy, dx)."""
    coords = flow_to_warp_grid(flow.astype(jnp.float32))
    return bilinear_sample(image, coords[..., 0], coords[..., 1])


def apply_affine_kernels(image: jax.Array, params: jax.Array) -> jax.Array:
    """STP: warp ``image [B,H,W,C]`` by N per-sample affine transforms.

    Args:
      image: ``[B, H, W, C]`` previous frame.
      params: ``[B, N, 6]`` rows of a 2x3 affine matrix in the spatial
        transformer convention (Jaderberg et al.; normalized [-1, 1] coords,
        output grid -> source coords), as DELTAS from the identity transform
        so a zero-initialized head starts at the identity warp — same as the
        reference's identity-biased STP head
        (``models/dna_model.py`` STP transformation, Finn et al. 2016).

    Returns:
      ``[B, N, H, W, C]`` transformed images.
    """
    b, h, w, c = image.shape
    n = params.shape[1]
    identity = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], jnp.float32)
    theta = (params.astype(jnp.float32) + identity).reshape(b, n, 2, 3)

    # normalized output grid [3, H, W]: rows (x_t, y_t, 1)
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W] each
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)])  # [3, H, W]

    src = jnp.einsum("bnij,jhw->bnihw", theta, grid)  # [B, N, 2(x,y), H, W]
    qx = (src[:, :, 0] + 1.0) * (w - 1.0) / 2.0
    qy = (src[:, :, 1] + 1.0) * (h - 1.0) / 2.0
    return bilinear_sample(image, qy, qx)  # [B, N, H, W, C]
