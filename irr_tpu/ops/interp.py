"""Batched bilinear sampling at arbitrary float coords (NHWC).

Mirrors reference utils/interpolation.py:
  - `interp2` (Interp2, :60-141): corners are index-clamped before gathering
    (so queries in [W-1, W) replicate the border), full bilinear blend, then
    the whole output pixel is zeroed iff the *query itself* is out of range
    (xq < 0 | xq >= W | yq < 0 | yq >= H). With clamp=True the query is
    clamped instead and nothing is zeroed.
  - `interp2_mask_binary` (Interp2MaskBinary, :144-244): same gather but each
    corner is weighted by a validity mask; the blend is renormalized by the
    accumulated mask weight, a pixel is invalid when the mask weight is too
    small (mw such that (1-mw)/(mw+eps) > 0.5), and the updated binary mask
    is returned. Used by the KITTI augmentation to warp sparse flow.

These run inside the jitted on-device augmentation path.
"""

import jax.numpy as jnp

from .warp import _gather_pixels


def _corners(xq, yq, h, w):
    x0 = jnp.clip(jnp.floor(xq).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(yq).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = (xq - x0.astype(xq.dtype))[..., None]
    fy = (yq - y0.astype(yq.dtype))[..., None]
    return x0, x1, y0, y1, fx, fy


def interp2(v: jnp.ndarray, xq: jnp.ndarray, yq: jnp.ndarray,
            clamp: bool = False) -> jnp.ndarray:
    """v: (B, H, W, C); xq, yq: (B, H, W) float. Returns (B, H, W, C)."""
    b, h, w, c = v.shape
    xq = xq.astype(jnp.float32)
    yq = yq.astype(jnp.float32)
    if clamp:
        xq = jnp.clip(xq, 0, w - 1)
        yq = jnp.clip(yq, 0, h - 1)

    x0, x1, y0, y1, fx, fy = _corners(xq, yq, h, w)
    v_flat = v.reshape(b, h * w, c)
    v00 = _gather_pixels(v_flat, y0, x0, w)
    v01 = _gather_pixels(v_flat, y0, x1, w)
    v10 = _gather_pixels(v_flat, y1, x0, w)
    v11 = _gather_pixels(v_flat, y1, x1, w)

    values = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
              + v10 * fy * (1 - fx) + v11 * fy * fx)
    if clamp:
        return values
    invalid = ((xq < 0) | (xq >= w) | (yq < 0) | (yq >= h))[..., None]
    return jnp.where(invalid, jnp.zeros_like(values), values)


def interp2_mask_binary(v: jnp.ndarray, xq: jnp.ndarray, yq: jnp.ndarray,
                        mask: jnp.ndarray, clamp: bool = False):
    """Mask-weighted bilinear sample. Returns (values, new_mask).

    v: (B, H, W, C); xq, yq: (B, H, W); mask: (B, H, W, Cm) with Cm == C or
    Cm dividing C (reference repeats it; here it broadcasts).
    """
    b, h, w, c = v.shape
    xq = xq.astype(jnp.float32)
    yq = yq.astype(jnp.float32)
    if clamp:
        xq = jnp.clip(xq, 0, w - 1)
        yq = jnp.clip(yq, 0, h - 1)

    if mask.shape[-1] != c:
        reps = c // mask.shape[-1]
        mask = jnp.tile(mask, (1, 1, 1, reps))

    x0, x1, y0, y1, fx, fy = _corners(xq, yq, h, w)
    v_flat = v.reshape(b, h * w, c)
    m_flat = mask.reshape(b, h * w, c)
    v00 = _gather_pixels(v_flat, y0, x0, w)
    v01 = _gather_pixels(v_flat, y0, x1, w)
    v10 = _gather_pixels(v_flat, y1, x0, w)
    v11 = _gather_pixels(v_flat, y1, x1, w)
    m00 = _gather_pixels(m_flat, y0, x0, w)
    m01 = _gather_pixels(m_flat, y0, x1, w)
    m10 = _gather_pixels(m_flat, y1, x0, w)
    m11 = _gather_pixels(m_flat, y1, x1, w)

    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx

    values = m00 * v00 * w00 + m01 * v01 * w01 + m10 * v10 * w10 + m11 * v11 * w11
    m_weights = m00 * w00 + m01 * w01 + m10 * w10 + m11 * w11
    values = values / (m_weights + 1e-12)
    invalid_mask = (((1 - m_weights) / (m_weights + 1e-12)) > 0.5)[..., 0:1]

    if clamp:
        return values, (1.0 - invalid_mask.astype(values.dtype))

    invalid = ((xq < 0) | (xq >= w) | (yq < 0) | (yq >= h))[..., None] | invalid_mask
    values = jnp.where(invalid, jnp.zeros_like(values), values)
    return values, (1.0 - invalid_mask.astype(values.dtype))
