"""Cost volume (local correlation), the hot kernel of the PWC family.

Semantics mirror reference models/pwc_modules.py:42-62 (which is also the
math of the legacy CUDA extension, models/correlation_package/):
for displacement (dy, dx) in [-max_disp, max_disp]^2 (row-major order),
    out[..., k] = mean_c( f1[y, x, c] * f2[y + dy, x + dx, c] )
with zero padding of f2, k = (dy + max_disp) * (2*max_disp+1) + (dx + max_disp).

Two implementations:
  - `cost_volume_xla`: 81 static shifted elementwise products; correct,
    differentiable via autodiff, lets XLA fuse. Used on CPU and as the
    golden reference in tests. A fused XLA kernel re-reads f1 once per
    output channel (81x HBM traffic), hence:
  - `cost_volume_pallas`: fused Pallas TPU kernel — one pass over a VMEM
    tile of f1 and a haloed window of padded f2 (assembled from two
    adjacent pipelined blocks) produces all 81 channels: ~2x HBM reads of
    each feature map instead of 81x.
    Custom VJP whose backward is the two correlation-style shift-gathers
    (same math as the reference CUDA backward,
    correlation_cuda_kernel.cu:117-300, expressed as XLA pad/slice adds).

`cost_volume` dispatches to the Pallas kernel on TPU, XLA otherwise.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cost_volume_xla(f1: jnp.ndarray, f2: jnp.ndarray, max_disp: int = 4) -> jnp.ndarray:
    """NHWC cost volume via static shifts. f1, f2: (B, H, W, C) -> (B, H, W, D^2)."""
    b, h, w, c = f1.shape
    md = max_disp
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    outs = []
    for i in range(2 * md + 1):
        for j in range(2 * md + 1):
            prod = f1 * f2p[:, i:i + h, j:j + w, :]
            outs.append(jnp.mean(prod, axis=-1))
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _cv_fwd_kernel(f1_ref, f2a_ref, f2b_ref, out_ref, *, md: int):
    """All operands are standard pipelined VMEM blocks over grid (B, H/ht).
    The haloed window of padded f2 is assembled from two ADJACENT row
    blocks (f2a = rows of this tile, f2b = next tile's rows): overlap
    without Element-indexed specs (which would force whole-array VMEM
    staging) and without manual DMA (which requires 128-aligned lanes).
"""
    n = 2 * md + 1
    f1 = f1_ref[0]                      # (h_tile, W, C)
    ht, w, c = f1.shape
    inv_c = 1.0 / c
    window = jnp.concatenate([f2a_ref[0], f2b_ref[0, :2 * md]], axis=0)
    f1f = f1.astype(jnp.float32)
    # one displacement at a time, written straight to the output ref, so
    # only a single shifted slice is live in VMEM at once; inputs may be
    # bf16 (half the HBM traffic), accumulation is f32
    for i in range(n):
        rows = window[i:i + ht]
        for j in range(n):
            f2s = rows[:, j:j + w, :].astype(jnp.float32)
            corr = jnp.sum(f1f * f2s, axis=-1) * inv_c
            out_ref[0, :, :, i * n + j] = corr.astype(out_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


def _pick_h_tile(h: int, w: int, c: int, md: int) -> int:
    """Largest h tile that keeps the pipelined blocks within VMEM.

    Block footprints use the real Mosaic layout: the last dim is padded to
    128 lanes, the second-to-last to 8 sublanes, and the pipeline holds two
    buffers per operand (double buffering).
    """
    n2 = (2 * md + 1) ** 2
    c_pad = _round_up(c, 128)
    n2_pad = _round_up(n2, 128)
    budget = 11 * 1024 * 1024
    for ht in (64, 32, 16, 8):  # ht >= 2*md so two blocks cover the halo
        if ht > h and ht > 8:
            continue
        f1_b = ht * _round_up(w, 8) * c_pad * 4
        f2_b = ht * _round_up(w + 2 * md, 8) * c_pad * 4
        out_b = ht * _round_up(w, 8) * n2_pad * 4
        total = 2 * (f1_b + 2 * f2_b + out_b)  # double-buffered
        if total <= budget:
            return ht
    return 8


def _cv_pallas_fwd(f1, f2, max_disp, interpret=False):
    b, h, w, c = f1.shape
    md = max_disp
    n2 = (2 * md + 1) ** 2
    ht = _pick_h_tile(h, w, c, md)
    # pad H to a multiple of the tile; padded rows compute garbage we slice off
    h_pad = -(-h // ht) * ht
    out_dtype = f1.dtype if f1.dtype == jnp.bfloat16 else jnp.float32
    f2p = jnp.pad(f2, ((0, 0), (md, md + (h_pad - h)), (md, md), (0, 0)))
    if h_pad != h:
        f1 = jnp.pad(f1, ((0, 0), (0, h_pad - h), (0, 0), (0, 0)))
    # pad f2p rows so the "next block" spec is always in range
    f2p = jnp.pad(f2p, ((0, 0), (0, ht), (0, 0), (0, 0)))
    num_h = h_pad // ht
    out = pl.pallas_call(
        functools.partial(_cv_fwd_kernel, md=md),
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w, n2), out_dtype),
        grid=(b, num_h),
        in_specs=[
            pl.BlockSpec((1, ht, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, w + 2 * md, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, w + 2 * md, c), lambda bi, hi: (bi, hi + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, w, n2), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(f1, f2p, f2p)
    return out[:, :h] if h_pad != h else out


def _cv_bwd_xla(res, g, max_disp):
    """Backward via XLA autodiff of the shift-loop forward (the same
    correlation-gather math as correlation_cuda_kernel.cu:117-300, but
    XLA's transpose of pad/slice/mean schedules the 81 accumulations
    better than hand-written .at[].add updates — measured ~4x faster)."""
    f1, f2 = res
    _, vjp = jax.vjp(lambda a, b: cost_volume_xla(a, b, max_disp), f1, f2)
    return vjp(g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _cv_pallas(f1, f2, max_disp, interpret):
    return _cv_pallas_fwd(f1, f2, max_disp, interpret)


def _cv_pallas_vjp_fwd(f1, f2, max_disp, interpret):
    return _cv_pallas_fwd(f1, f2, max_disp, interpret), (f1, f2)


def _cv_pallas_vjp_bwd(max_disp, interpret, res, g):
    return _cv_bwd_xla(res, g, max_disp)


_cv_pallas.defvjp(_cv_pallas_vjp_fwd, _cv_pallas_vjp_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def cost_volume_pallas(f1: jnp.ndarray, f2: jnp.ndarray, max_disp: int = 4,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Fused Pallas cost volume (interpreted off-TPU for testability)."""
    if interpret is None:
        interpret = not _on_tpu()
    return _cv_pallas(f1, f2, max_disp, interpret)


def cost_volume(f1: jnp.ndarray, f2: jnp.ndarray, max_disp: int = 4) -> jnp.ndarray:
    """Dispatching cost volume: fused Pallas kernel on TPU, XLA elsewhere."""
    if _on_tpu():
        return cost_volume_pallas(f1, f2, max_disp)
    return cost_volume_xla(f1, f2, max_disp)
