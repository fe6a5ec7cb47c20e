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

Design note (TPU): gathers are descriptor-rate bound (~16 ns/descriptor
on v5e regardless of slice shape/bytes — see PERF.md), so the sampler
fetches each pixel's full 2x2 bilinear footprint with ONE flat-indexed
descriptor: the image's row pair is packed into channels
(rowpair[y, x] = [img[y, x]; img[y+1, x]]) and a (2, 2C) slice covers all
four taps (`_gather_taps`). `warp_multi` additionally concatenates
tensors sharing one flow field so they ride a single gather. The custom
VJP saves the taps as residuals (no backward regather) and scatters d_x
as one quad-packed 4C-channel segment-sum item per pixel. Out-of-bounds
corners contribute zero (torch 'zeros' padding), enforced by analytic
per-corner masks.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _gather_pixels(x_flat: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray, w: int) -> jnp.ndarray:
    """x_flat: (B, H*W, C); yi, xi: (B, Ho, Wo) int32. Returns (B, Ho, Wo, C).

    Kept for the interp2 samplers (clamped-index semantics differ from the
    zero-padded patch fetch below)."""
    b, _, c = x_flat.shape
    ho, wo = yi.shape[1], yi.shape[2]
    idx = (yi * w + xi).reshape(b, ho * wo, 1)
    out = jnp.take_along_axis(x_flat, idx, axis=1)
    return out.reshape(b, ho, wo, c)


def _gather_taps(x: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray):
    """Fetch the 4 bilinear taps at integer corners (y0, x0).

    x: (B, H, W, C); y0, x0: (B, Ho, Wo) int32 (may be out of range; OOB
    taps read garbage that the caller's validity masks zero out — exactly
    like the previous padded-clip formulation).
    Returns (t00, t01, t10, t11), each (B, Ho, Wo, C) with t<dy><dx>.

    TPU descriptor economics (measured, v5e): XLA gather cost is ~purely
    per-descriptor (~46M/s for (2,2,C) 2-D-indexed patches, independent of
    slice bytes/layout/locality). Packing the row pair into channels
    (rowpair[y, x] = [xp[y, x]; xp[y+1, x]]) lets ONE flat-indexed
    descriptor of slice (2, 2C) fetch the whole 2x2 footprint — measured
    1.67x faster (13.5 ns/px vs 21.8 ns/px) for a ~0.2% packing cost.
    """
    b, h, w, c = x.shape
    ho, wo = y0.shape[1], y0.shape[2]
    # zero-pad by 1 (+1 extra bottom row for the row-pair shift)
    xpp = jnp.pad(x, ((0, 0), (1, 2), (1, 1), (0, 0)))
    rp = jnp.concatenate([xpp[:, :-1], xpp[:, 1:]], axis=-1)  # (B,H+2,W+2,2C)
    rpf = rp.reshape(b, (h + 2) * (w + 2), 2 * c)
    y0c = jnp.clip(y0, -1, h) + 1
    x0c = jnp.clip(x0, -1, w) + 1
    idx = (y0c * (w + 2) + x0c).reshape(b, ho * wo, 1)

    def g(img, ind):
        return jax.lax.gather(
            img, ind,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(2, 2 * c), mode="clip")

    taps = jax.vmap(g)(rpf, idx).reshape(b, ho, wo, 2, 2 * c)
    # axis -2 is the x-offset; the 2C lanes are [dy=0 | dy=1]
    return (taps[..., 0, :c], taps[..., 1, :c],
            taps[..., 0, c:], taps[..., 1, c:])


def _gather_patches(x: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray) -> jnp.ndarray:
    """Compat wrapper: (B, Ho, Wo, 2, 2, C) stacked patches."""
    t00, t01, t10, t11 = _gather_taps(x, y0, x0)
    top = jnp.stack([t00, t01], axis=-2)
    bot = jnp.stack([t10, t11], axis=-2)
    return jnp.stack([top, bot], axis=-3)


def _corner_data(x, ix, iy):
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

    def valid(yc, xc):
        return ((yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)).astype(compute_dtype)[..., None]

    masks = (valid(y0, x0), valid(y0, x0 + 1), valid(y0 + 1, x0), valid(y0 + 1, x0 + 1))
    return x0, y0, fx, fy, masks


@jax.custom_vjp
def grid_sample_aligned(x: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of NHWC `x` at float pixel coords (ix, iy): (B, Ho, Wo).

    torch.nn.functional.grid_sample(align_corners=True, padding_mode='zeros')
    semantics: each of the 4 corner taps contributes only if that integer
    corner lies inside the image; the tap weight is the usual bilinear one.

    Custom VJP: the default transpose of the gather scatters the 4 corner
    taps separately (pathologically slow on TPU). The custom backward
    scatters each pixel's whole footprint as ONE quad-packed 4C-channel
    segment-sum item and computes coordinate grads from the forward taps
    saved as residuals (no regather) — see `_gs_fwd`/`_gs_bwd`.
    """
    b, h, w, c = x.shape
    compute_dtype = x.dtype
    ix = ix.astype(jnp.float32)
    iy = iy.astype(jnp.float32)

    x0, y0, fx, fy, (m00, m01, m10, m11) = _corner_data(x, ix, iy)
    t00, t01, t10, t11 = _gather_taps(x, y0, x0)
    one = jnp.asarray(1.0, compute_dtype)
    return (t00 * m00 * (one - fy) * (one - fx)
            + t01 * m01 * (one - fy) * fx
            + t10 * m10 * fy * (one - fx)
            + t11 * m11 * fy * fx)


def _gs_fwd(x, ix, iy):
    # recompute the forward INLINE so the taps become VJP residuals: the
    # backward then needs NO regather (a full descriptor-rate gather saved;
    # the tap tensors cost 4C/px of activation memory, ~0.4 ms of HBM
    # traffic where the regather costs tens of ms of descriptor time)
    compute_dtype = x.dtype
    x0, y0, fx, fy, (m00, m01, m10, m11) = _corner_data(x, ix, iy)
    t00, t01, t10, t11 = _gather_taps(x, y0, x0)
    one = jnp.asarray(1.0, compute_dtype)
    out = (t00 * m00 * (one - fy) * (one - fx)
           + t01 * m01 * (one - fy) * fx
           + t10 * m10 * fy * (one - fx)
           + t11 * m11 * fy * fx)
    return out, (x, ix, iy, (t00, t01, t10, t11))


def _gs_bwd(res, g):
    x, ix, iy, taps_saved = res
    b, h, w, c = x.shape
    ho, wo = ix.shape[1], ix.shape[2]
    dt = x.dtype
    g = g.astype(dt)

    x0f = jnp.floor(ix.astype(jnp.float32))
    y0f = jnp.floor(iy.astype(jnp.float32))
    fx = (ix.astype(jnp.float32) - x0f).astype(dt)[..., None]
    fy = (iy.astype(jnp.float32) - y0f).astype(dt)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def valid(yc, xc):
        return ((yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)).astype(dt)[..., None]

    m00 = valid(y0, x0)
    m01 = valid(y0, x0 + 1)
    m10 = valid(y0 + 1, x0)
    m11 = valid(y0 + 1, x0 + 1)
    one = jnp.asarray(1.0, dt)
    w00 = m00 * (one - fy) * (one - fx)
    w01 = m01 * (one - fy) * fx
    w10 = m10 * fy * (one - fx)
    w11 = m11 * fy * fx

    # ---- d_x: quad-packed segment-sum -------------------------------------
    # ONE segment id per pixel scatters a 4C-channel block holding all four
    # tap contributions; static shifts fold the quadrants back. segment_sum
    # cost is per-ITEM (like gather's per-descriptor cost), so packing the
    # quad is ~4x fewer scatter items than the previous 4 separate
    # segment_sums (which were themselves ~5.5x faster than scatter_add).
    y0c = (jnp.clip(y0, -1, h) + 1).reshape(b, ho * wo)
    x0c = (jnp.clip(x0, -1, w) + 1).reshape(b, ho * wo)
    stride_b = (h + 2) * (w + 2)
    base = jnp.arange(b, dtype=jnp.int32)[:, None] * stride_b
    ids = (base + y0c * (w + 2) + x0c).reshape(-1)
    vals = jnp.concatenate([g * w00, g * w01, g * w10, g * w11],
                           axis=-1).reshape(-1, 4 * c)
    # scatter rows must fill whole lane groups: narrow rows (4C < 64
    # lanes) hit a masked read-modify-write path measured ~6x slower
    # (98 vs 16 ns/item at 4C=20) — zero-pad to the next multiple of 64
    lanes = 4 * c
    pad_to = -(-lanes // 64) * 64
    if pad_to != lanes:
        vals = jnp.pad(vals, ((0, 0), (0, pad_to - lanes)))
    acc = jax.ops.segment_sum(vals, ids, num_segments=b * stride_b)
    acc = acc[:, :lanes].reshape(b, h + 2, w + 2, 4, c)
    # quadrant (dy,dx) stored at base (y0c, x0c) contributes to image pixel
    # (y0+dy, x0+dx) = padded (y0c+dy, x0c+dx); read back with the shifts
    dx = (acc[:, 1:h + 1, 1:w + 1, 0]
          + acc[:, 1:h + 1, 0:w, 1]
          + acc[:, 0:h, 1:w + 1, 2]
          + acc[:, 0:h, 0:w, 3])

    # ---- d_ix / d_iy: saved taps, differentiate the weights ---------------
    t00, t01, t10, t11 = taps_saved
    v00 = t00 * m00
    v01 = t01 * m01
    v10 = t10 * m10
    v11 = t11 * m11
    gd = g
    d_fx = jnp.sum(gd * ((one - fy) * (v01 - v00) + fy * (v11 - v10)), axis=-1)
    d_fy = jnp.sum(gd * ((one - fx) * (v10 - v00) + fx * (v11 - v01)), axis=-1)
    return dx, d_fx.astype(jnp.float32), d_fy.astype(jnp.float32)


grid_sample_aligned.defvjp(_gs_fwd, _gs_bwd)


def inbounds_mask(ix: jnp.ndarray, iy: jnp.ndarray, h: int, w: int, dtype) -> jnp.ndarray:
    """1.0 where the query point is fully inside [0, W-1] x [0, H-1].

    Analytic (idealized) form of the reference's warped-ones `mask >= 1.0`
    test. NOTE: the reference's actual mask is NOT this — see
    `pwc_reference_mask` below for the bit-faithful version used by the
    model warp path.
    """
    m = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
    return m.astype(dtype)[..., None]


def _torch_linspace(n: int) -> jnp.ndarray:
    """torch.linspace(-1, 1, n) bit patterns (the reference's get_grid,
    pwc_modules.py:107-112). Computed with torch at trace time so the
    constants match the reference exactly; numpy fallback if torch is
    unavailable."""
    try:
        import torch
        return jnp.asarray(torch.linspace(-1.0, 1.0, n).numpy())
    except Exception:
        i = np.arange(n, dtype=np.float64)
        step = 2.0 / max(n - 1, 1)
        return jnp.asarray((-1.0 + i * step).astype(np.float32))


def _exact_div_f32(x: jnp.ndarray, c: float) -> jnp.ndarray:
    """IEEE-correctly-rounded f32 division x / f32(c).

    XLA lowers f32 divide-by-constant to a reciprocal multiply that is off
    by 1 ulp for ~5% of inputs (measured on XLA:CPU). The reference mask
    threshold (see pwc_reference_mask) sits exactly on a rounding boundary,
    so those ulps flip mask pixels. Emulate exact f32 division through f64
    (correct except ~2^-29-probability double-rounding ties). On TPU f64 is
    unsupported; fall back to plain division there (sporadic 1-ulp mask
    flips vs the reference are accepted on-device; the CPU fidelity gate is
    bit-faithful).
    """
    if jax.default_backend() == "tpu":
        return x / jnp.float32(c)
    with jax.enable_x64():
        x64 = jax.lax.convert_element_type(x, jnp.float64)
        q = x64 / np.float64(np.float32(c))
        return jax.lax.convert_element_type(q, jnp.float32)


def pwc_reference_mask(shape_hw, flow, height_im: int, width_im: int,
                       div_flow: float, dtype) -> jnp.ndarray:
    """The reference WarpingLayer mask, bit-faithfully.

    The reference warps an all-ones tensor through grid_sample
    (align_corners=True, zeros padding) and keeps pixels where the result
    is >= 1.0 (pwc_modules.py:127-133). In exact math that is "query fully
    in-bounds", but the warped-ones value is the f32 sum of the four
    bilinear tap weights, which ROUNDS BELOW 1.0 for a small fraction of
    interior query points — the reference zeroes those pixels too. To match
    reference outputs (checkpoint fidelity), this replicates torch's exact
    f32 op order: linspace grid + normalized flow, unnormalize, per-tap
    weight products, nw+ne+sw+se accumulation, >= 1.0 threshold.
    """
    h, w = shape_hw
    one = jnp.float32(1.0)
    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)
    # flo_w = flow[:, 0] * 2 / max(W_im - 1, 1) / div_flow (pwc_modules.py:121-122)
    fw = _exact_div_f32(_exact_div_f32(u * jnp.float32(2.0),
                                       max(width_im - 1, 1)), div_flow)
    fh = _exact_div_f32(_exact_div_f32(v * jnp.float32(2.0),
                                       max(height_im - 1, 1)), div_flow)
    gx = _torch_linspace(w)[None, None, :] + fw
    gy = _torch_linspace(h)[None, :, None] + fh
    # grid_sampler_unnormalize(align_corners=True): ((coord + 1) / 2) * (size - 1)
    x = ((gx + one) / jnp.float32(2.0)) * jnp.float32(w - 1)
    y = ((gy + one) / jnp.float32(2.0)) * jnp.float32(h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + one
    y1 = y0 + one
    nw = (x1 - x) * (y1 - y)
    ne = (x - x0) * (y1 - y)
    sw = (x1 - x) * (y - y0)
    se = (x - x0) * (y - y0)

    def ib(yc, xc):
        return (yc >= 0) & (yc <= h - 1) & (xc >= 0) & (xc <= w - 1)

    zero = jnp.float32(0.0)
    s = jnp.where(ib(y0, x0), nw, zero)
    s = s + jnp.where(ib(y0, x1), ne, zero)
    s = s + jnp.where(ib(y1, x0), sw, zero)
    s = s + jnp.where(ib(y1, x1), se, zero)
    return (s >= one).astype(dtype)[..., None]


def _flow_to_coords(shape_hw, flow: jnp.ndarray, height_im: int, width_im: int,
                    div_flow: float, pwc_norm: bool):
    """Pixel sampling coords at feature resolution from image-scale flow.

    The reference builds a [-1,1] grid and adds normalized flow; composed,
    the pixel coordinate is  x + u * (Wf-1) / (norm_w * div_flow)  where
    norm_w = max(W_im-1, 1) for the PWC layer (pwc_modules.py:121-122) and
    W_im for the FlowNet layer (flownet_modules.py:99-100).
    """
    h, w = shape_hw
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


# The reference mask's >=1.0 threshold is CHAOTIC: which knife-edge pixels
# flip depends on the low bits of the flow, so any ulp-level numerical
# reordering (GSPMD sharding, backend change) produces sporadic mask flips
# — exactly as the reference itself would differ between torch CPU and GPU.
# "reference" (default) is bit-faithful to torch; "analytic" is the
# idealized interior test, numerically stable, for equality-style tests
# (sharded == unsharded) and for users who prefer robustness over
# checkpoint-exactness.
_MASK_MODE = {"mode": "reference"}


def set_warp_mask_mode(mode: str):
    assert mode in ("reference", "analytic"), mode
    _MASK_MODE["mode"] = mode


def _pwc_mask(shape_hw, flow, height_im, width_im, div_flow, dtype):
    if _MASK_MODE["mode"] == "analytic":
        ix, iy = _flow_to_coords(shape_hw, flow, height_im, width_im,
                                 div_flow, pwc_norm=True)
        return inbounds_mask(ix, iy, shape_hw[0], shape_hw[1], dtype)
    return pwc_reference_mask(shape_hw, flow, height_im, width_im,
                              div_flow, dtype)


def warp_masked(x: jnp.ndarray, flow: jnp.ndarray, height_im: int, width_im: int,
                div_flow: float) -> jnp.ndarray:
    """PWC WarpingLayer (reference pwc_modules.py:115-133): warp + zero mask."""
    ix, iy = _flow_to_coords(x.shape[1:3], flow, height_im, width_im, div_flow,
                             pwc_norm=True)
    out = grid_sample_aligned(x, ix, iy)
    return out * _pwc_mask(x.shape[1:3], flow, height_im, width_im,
                           div_flow, out.dtype)


def warp_unmasked(x: jnp.ndarray, flow: jnp.ndarray, height_im: int, width_im: int,
                  div_flow: float) -> jnp.ndarray:
    """FlowNet WarpingLayer (reference flownet_modules.py:93-107): no mask."""
    ix, iy = _flow_to_coords(x.shape[1:3], flow, height_im, width_im, div_flow,
                             pwc_norm=False)
    return grid_sample_aligned(x, ix, iy)


def _upsample_even(x: jnp.ndarray, h: int, w: int, stride: int) -> jnp.ndarray:
    """Factor-`stride` linear reconstruction anchored at sample positions.

    x holds samples taken at rows/cols 0, stride, 2*stride, ... of an
    (h, w) grid; those output positions reproduce them bit-exactly
    (out[stride*j] == x[j] — the k=0 phase IS x, no arithmetic touches
    it), and in-between positions are linearly interpolated between their
    two anchors (edge-clamped). Unlike align-corners resize, the sample
    positions don't drift with the output size.
    """
    s = int(stride)
    b, hs, ws, c = x.shape

    def _axis_up(t, n_lo, full, axis):
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(t, 1, n_lo, axis=axis),
             jax.lax.slice_in_dim(t, n_lo - 1, n_lo, axis=axis)], axis=axis)
        phases = [t]
        for k in range(1, s):
            wk = jnp.asarray(k / s, t.dtype)
            phases.append(t * (jnp.asarray(1.0, t.dtype) - wk) + nxt * wk)
        t = jnp.stack(phases, axis=axis + 1)
        shape = list(t.shape)
        shape[axis:axis + 2] = [n_lo * s]
        return jax.lax.slice_in_dim(t.reshape(shape), 0, full, axis=axis)

    x = _axis_up(x, hs, h, axis=1)
    return _axis_up(x, ws, w, axis=2)


def _upsample2x_even(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Back-compat shim for the original fixed-stride-2 reconstruction."""
    return _upsample_even(x, h, w, 2)


def warp_multi(tensors, flow, height_im, width_im, div_flow,
               masked=True, pwc_norm=True, approx=False):
    """Warp several NHWC tensors by ONE flow field with a single fused
    gather (concat on channels, sample once, split). Exact same result as
    warping each tensor separately.

    approx: OPT-IN reduced-density mode for the full-resolution guidance
    warps (the eval gather wall, PERF.md). `True` (back-compat) or an
    int stride s >= 2: the bilinear gather runs only at every s-th pixel
    position (s^2-fold fewer descriptors) with the EXACT full-resolution
    coordinates and source taps, and skipped positions are linearly
    interpolated from their warped neighbors. Exact wherever the warped
    signal is locally linear between sampled pixels; differs at
    texture/motion discontinuities (more so as s grows). The zero-mask
    stays exact full-res.
    """
    splits = [t.shape[-1] for t in tensors]
    stacked = jnp.concatenate(tensors, axis=-1)
    h, w = stacked.shape[1:3]
    ix, iy = _flow_to_coords((h, w), flow, height_im, width_im,
                             div_flow, pwc_norm=pwc_norm)
    if approx:
        s = 2 if approx is True else int(approx)
        assert s >= 2, f"approx stride must be >= 2, got {s}"
        out = grid_sample_aligned(stacked, ix[:, ::s, ::s], iy[:, ::s, ::s])
        out = _upsample_even(out, h, w, s)
    else:
        out = grid_sample_aligned(stacked, ix, iy)
    if masked:
        out = out * _pwc_mask(stacked.shape[1:3], flow, height_im,
                              width_im, div_flow, out.dtype)
    outs = []
    start = 0
    for s in splits:
        outs.append(out[..., start:start + s])
        start += s
    return outs
