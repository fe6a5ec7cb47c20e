"""Resizing ops with exact PyTorch semantics, built as dense matmuls.

TPU-first design: instead of gathers, every 1-D resample is expressed as a
small dense (n_out, n_in) matrix applied per axis with an einsum — XLA lowers
these to MXU matmuls, which beats gather-based interpolation on TPU by a wide
margin. Matrices are computed with numpy at trace time (static shapes) and
embedded as constants, so they are folded/hoisted by XLA.

Reference semantics mirrored here:
  - `upsample2d_as`: bilinear, align_corners=True
    (reference models/pwc_modules.py:65-67, losses.py:20-22)
  - `adaptive_avg_pool`: torch.nn.functional.adaptive_avg_pool2d
    (reference losses.py:16-18, utils/interpolation.py:247-258)
  - `resize2d`: avg-pool down / bilinear-up dispatch
    (reference models/flownet_modules.py:35-49)
  - `upsample_factor2`: nearest x2 then bilinear align_corners=False fixup
    (reference models/irr_modules.py:21-27)
  - `rescale_flow`: image-scale*div_flow units <-> level-local pixel units
    (reference models/pwc_modules.py:70-82)
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _linear_matrix_aligned(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear resample matrix, align_corners=True."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        src = i * scale
        lo = int(np.floor(src))
        lo = min(lo, n_in - 1)
        hi = min(lo + 1, n_in - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


@functools.lru_cache(maxsize=None)
def _linear_matrix_half(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear resample matrix, align_corners=False.

    src = (i + 0.5) * (n_in / n_out) - 0.5, clamped to the border
    (replicate edge), matching torch.nn.functional.interpolate defaults.
    """
    m = np.zeros((n_out, n_in), dtype=np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), n_in - 1)
        lo = int(np.floor(src))
        lo = min(lo, n_in - 1)
        hi = min(lo + 1, n_in - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


@functools.lru_cache(maxsize=None)
def _avg_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) adaptive average pooling matrix.

    Output cell i averages input range [floor(i*n/o), ceil((i+1)*n/o)) with
    equal weights — exactly torch adaptive_avg_pool semantics.
    """
    m = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -((-(i + 1) * n_in) // n_out)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


@functools.lru_cache(maxsize=None)
def _kron_eye(mw_key, c: int):
    """kron(Mw^T, I_c): folds tiny channel counts into the matmul width so
    the W-pass feeds the MXU with N = Wo*C instead of N = C."""
    mw = _MW_CACHE[mw_key]
    return np.kron(mw.T, np.eye(c, dtype=np.float32))


_MW_CACHE = {}


def _apply_hw(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply per-axis resample matrices to NHWC x."""
    dt = x.dtype
    mh_ = jnp.asarray(mh, dtype=dt)
    # (B,H,W,C) -> (B,Ho,W,C) -> (B,Ho,Wo,C); both become MXU matmuls.
    # HIGHEST precision: resize weights must not round to bf16 — checkpoint
    # parity of the pyramid depends on exact align_corners arithmetic.
    x = jnp.einsum("oh,bhwc->bowc", mh_, x, precision=jax.lax.Precision.HIGHEST)
    b, ho, w, c = x.shape
    if c <= 8:
        # W-pass with C folded in: out[(p,c)] = sum_(w,c') kron(Mw^T, I)[(w,c'),(p,c)]
        key = (id(mw), mw.shape)
        _MW_CACHE[key] = mw
        kmat = jnp.asarray(_kron_eye(key, c), dtype=dt)
        xf = x.reshape(b, ho, w * c)
        out = jnp.einsum("bok,kq->boq", xf, kmat,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(b, ho, mw.shape[0], c)
    mw_ = jnp.asarray(mw, dtype=dt)
    return jnp.einsum("pw,bowc->bopc", mw_, x, precision=jax.lax.Precision.HIGHEST)


def upsample2d(x: jnp.ndarray, size, mode: str = "bilinear") -> jnp.ndarray:
    """Bilinear align_corners=True resize of NHWC x to `size`=(Ho, Wo)."""
    ho, wo = int(size[0]), int(size[1])
    b, h, w, c = x.shape
    if (h, w) == (ho, wo):
        return x
    if mode == "bilinear":
        return _apply_hw(x, _linear_matrix_aligned(h, ho), _linear_matrix_aligned(w, wo))
    if mode == "nearest":
        # torch nearest: src = floor(i * n_in / n_out)
        mh = np.zeros((ho, h), np.float32)
        mh[np.arange(ho), (np.arange(ho) * h // ho)] = 1.0
        mw = np.zeros((wo, w), np.float32)
        mw[np.arange(wo), (np.arange(wo) * w // wo)] = 1.0
        return _apply_hw(x, mh, mw)
    raise ValueError(f"unknown mode {mode}")


def upsample2d_as(x: jnp.ndarray, target: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """Resize NHWC x to target's spatial shape (reference pwc_modules.py:65-67)."""
    return upsample2d(x, (target.shape[1], target.shape[2]), mode=mode)


def adaptive_avg_pool(x: jnp.ndarray, size) -> jnp.ndarray:
    """Adaptive average pooling of NHWC x to `size`=(Ho, Wo)."""
    ho, wo = int(size[0]), int(size[1])
    b, h, w, c = x.shape
    if (h, w) == (ho, wo):
        return x
    return _apply_hw(x, _avg_matrix(h, ho), _avg_matrix(w, wo))


def downsample2d_as(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Adaptive-avg-pool x down to target's spatial shape (losses.py:16-18)."""
    return adaptive_avg_pool(x, (target.shape[1], target.shape[2]))


def resize2d(x: jnp.ndarray, size, mode: str = "bilinear") -> jnp.ndarray:
    """Reference flownet_modules.py:35-45 dispatch.

    The reference compares python lists: equal -> no-op; `[ho,wo] < [h,w]`
    (lexicographic!) -> adaptive avg pool; otherwise bilinear
    align_corners=True upsample. We reproduce that dispatch exactly.
    """
    h, w = x.shape[1], x.shape[2]
    ho, wo = int(size[0]), int(size[1])
    if [h, w] == [ho, wo]:
        return x
    if [ho, wo] < [h, w]:  # lexicographic, as in the reference
        return adaptive_avg_pool(x, (ho, wo))
    return upsample2d(x, (ho, wo), mode=mode)


def resize2d_as(x: jnp.ndarray, target: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    return resize2d(x, (target.shape[1], target.shape[2]), mode=mode)


def upsample_factor2(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Nearest x2 upsample; bilinear align_corners=False fixup on mismatch.

    Mirrors reference models/irr_modules.py:21-27 (used by OccUpsampleNetwork).
    """
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    h, w = x.shape[1], x.shape[2]
    ho, wo = target.shape[1], target.shape[2]
    if (h, w) == (ho, wo):
        return x
    return _apply_hw(x, _linear_matrix_half(h, ho), _linear_matrix_half(w, wo))


def rescale_flow(flow: jnp.ndarray, div_flow: float, width_im: int, height_im: int,
                 to_local: bool = True) -> jnp.ndarray:
    """Convert NHWC flow (..., 2) between image-scale*div_flow units and
    level-local pixel units (reference pwc_modules.py:70-82).

    Channel 0 is u (x-displacement), channel 1 is v (y-displacement).
    """
    h, w = flow.shape[1], flow.shape[2]
    if to_local:
        u_scale = float(w / width_im / div_flow)
        v_scale = float(h / height_im / div_flow)
    else:
        u_scale = float(width_im * div_flow / w)
        v_scale = float(height_im * div_flow / h)
    scale = jnp.asarray([u_scale, v_scale], dtype=flow.dtype)
    return flow * scale
