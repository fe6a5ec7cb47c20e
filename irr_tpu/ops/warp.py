"""Flow-based warping via bilinear sampling (NHWC).

Mirrors two distinct reference samplers:
  - PWC warping layer (reference models/pwc_modules.py:107-133):
    grid_sample(align_corners=True, padding_mode='zeros') followed by
    multiplication with a mask that zeroes any pixel whose sampling
    footprint leaves the image (the reference warps an all-ones image and
    thresholds `mask >= 1.0`; analytically that is "query fully in-bounds").
  - FlowNet warping layer (reference models/flownet_modules.py:93-107):
    same grid_sample, no mask, and a slightly different flow normalization
    (divides by W instead of max(W-1,1)).

Design note (TPU): sampling is one batched row-gather per corner via
`jnp.take_along_axis` on a (B, H*W, C) view — XLA lowers this to a single
gather with contiguous C-vectors, the fastest general formulation short of a
Pallas kernel. Out-of-bounds corners contribute zero (torch 'zeros' padding).
"""

import jax.numpy as jnp


def _gather_pixels(x_flat: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray, w: int) -> jnp.ndarray:
    """x_flat: (B, H*W, C); yi, xi: (B, Ho, Wo) int32. Returns (B, Ho, Wo, C)."""
    b, _, c = x_flat.shape
    ho, wo = yi.shape[1], yi.shape[2]
    idx = (yi * w + xi).reshape(b, ho * wo, 1)
    out = jnp.take_along_axis(x_flat, idx, axis=1)
    return out.reshape(b, ho, wo, c)


def grid_sample_aligned(x: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of NHWC `x` at float pixel coords (ix, iy): (B, Ho, Wo).

    torch.nn.functional.grid_sample(align_corners=True, padding_mode='zeros')
    semantics: each of the 4 corner taps contributes only if that integer
    corner lies inside the image; the tap weight is the usual bilinear one.
    """
    b, h, w, c = x.shape
    compute_dtype = x.dtype
    ix = ix.astype(jnp.float32)
    iy = iy.astype(jnp.float32)

    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    fx = (ix - x0f).astype(compute_dtype)[..., None]
    fy = (iy - y0f).astype(compute_dtype)[..., None]

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def valid(yc, xc):
        return ((yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)).astype(compute_dtype)[..., None]

    v00m, v01m = valid(y0, x0), valid(y0, x1)
    v10m, v11m = valid(y1, x0), valid(y1, x1)

    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y1, 0, h - 1)

    x_flat = x.reshape(b, h * w, c)
    v00 = _gather_pixels(x_flat, y0c, x0c, w) * v00m
    v01 = _gather_pixels(x_flat, y0c, x1c, w) * v01m
    v10 = _gather_pixels(x_flat, y1c, x0c, w) * v10m
    v11 = _gather_pixels(x_flat, y1c, x1c, w) * v11m

    one = jnp.asarray(1.0, compute_dtype)
    return (v00 * (one - fy) * (one - fx) + v01 * (one - fy) * fx
            + v10 * fy * (one - fx) + v11 * fy * fx)


def inbounds_mask(ix: jnp.ndarray, iy: jnp.ndarray, h: int, w: int, dtype) -> jnp.ndarray:
    """1.0 where the query point is fully inside [0, W-1] x [0, H-1].

    Analytic form of the reference's warped-ones `mask >= 1.0` test
    (pwc_modules.py:129-131).
    """
    m = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
    return m.astype(dtype)[..., None]


def _flow_to_coords(x: jnp.ndarray, flow: jnp.ndarray, height_im: int, width_im: int,
                    div_flow: float, pwc_norm: bool):
    """Pixel sampling coords at feature resolution from image-scale flow.

    The reference builds a [-1,1] grid and adds normalized flow; composed,
    the pixel coordinate is  x + u * (Wf-1) / (norm_w * div_flow)  where
    norm_w = max(W_im-1, 1) for the PWC layer (pwc_modules.py:121-122) and
    W_im for the FlowNet layer (flownet_modules.py:99-100).
    """
    b, h, w, _ = x.shape
    if pwc_norm:
        norm_w = max(width_im - 1, 1)
        norm_h = max(height_im - 1, 1)
    else:
        norm_w = width_im
        norm_h = height_im
    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ix = gx + u * ((w - 1) / (norm_w * div_flow))
    iy = gy + v * ((h - 1) / (norm_h * div_flow))
    return ix, iy


def warp_masked(x: jnp.ndarray, flow: jnp.ndarray, height_im: int, width_im: int,
                div_flow: float) -> jnp.ndarray:
    """PWC WarpingLayer (reference pwc_modules.py:115-133): warp + zero mask."""
    ix, iy = _flow_to_coords(x, flow, height_im, width_im, div_flow, pwc_norm=True)
    out = grid_sample_aligned(x, ix, iy)
    return out * inbounds_mask(ix, iy, x.shape[1], x.shape[2], out.dtype)


def warp_unmasked(x: jnp.ndarray, flow: jnp.ndarray, height_im: int, width_im: int,
                  div_flow: float) -> jnp.ndarray:
    """FlowNet WarpingLayer (reference flownet_modules.py:93-107): no mask."""
    ix, iy = _flow_to_coords(x, flow, height_im, width_im, div_flow, pwc_norm=False)
    return grid_sample_aligned(x, ix, iy)
