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


def image_warp(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear-warp ``image [B,H,W,C]`` by ``flow [B,H,W,2]`` (dy, dx)."""
    b, h, w, c = image.shape
    coords = flow_to_warp_grid(flow.astype(jnp.float32))
    qy = jnp.clip(coords[..., 0], 0.0, h - 1.0)
    qx = jnp.clip(coords[..., 1], 0.0, w - 1.0)

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
        idx = yi * w + xi  # [B,H,W]
        return jnp.take_along_axis(flat, idx.reshape(b, h * w, 1), axis=1).reshape(b, h, w, c)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wy = wy[..., None].astype(image.dtype)
    wx = wx[..., None].astype(image.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
