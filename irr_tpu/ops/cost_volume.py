"""Cost volume (local correlation), the hot kernel of the PWC family.

Semantics mirror reference models/pwc_modules.py:42-62 (which is also the
math of the legacy CUDA extension, models/correlation_package/):
for displacement (dy, dx) in [-max_disp, max_disp]^2 (row-major order),
    out[..., k] = mean_c( f1[y, x, c] * f2[y + dy, x + dx, c] )
with zero padding of f2, k = (dy + max_disp) * (2*max_disp+1) + (dx + max_disp).

Two implementations:
  - `cost_volume_xla`: 81 static shifted elementwise products,
    differentiable via autodiff. XLA fuses the pad/slice/multiply/mean
    chain into tiled register-resident loops — measured (in-graph, v5e)
    ~6x faster than the hand Pallas kernel below, so this is the
    production path on every backend (see `cost_volume` docstring).
  - `cost_volume_pallas`: fused Pallas TPU kernel — one pass over a VMEM
    tile of f1 and a haloed window of padded f2 (assembled from two
    adjacent pipelined blocks) produces all 81 channels (channel-first)
    with an optional fused LeakyReLU epilogue. Kept tested-but-unused:
    its 81 unaligned (ht, w, c) window slices each relayout through the
    VPU, which currently loses to XLA's fusion.

`cost_volume` dispatches to the XLA formulation everywhere.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cost_volume_xla(f1: jnp.ndarray, f2: jnp.ndarray, max_disp: int = 4) -> jnp.ndarray:
    """NHWC cost volume via static shifts. f1, f2: (B, H, W, C) -> (B, H, W, D^2).

    The per-shift means are stacked CHANNEL-FIRST (axis=1) and transposed
    once at the end: stacking on the last axis would broadcast each
    (B, H, W) mean to (B, H, W, 1), a layout whose single-lane channel is
    tile-padded 128x — at B=16 Sintel scale XLA's remat materialized 81
    such 218 MB copies (1.7 MB unpadded) and blew HBM.
    """
    b, h, w, c = f1.shape
    md = max_disp
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    outs = []
    for i in range(2 * md + 1):
        for j in range(2 * md + 1):
            prod = f1 * f2p[:, i:i + h, j:j + w, :]
            outs.append(jnp.mean(prod, axis=-1))
    return jnp.moveaxis(jnp.stack(outs, axis=1), 1, -1)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _cv_fwd_kernel(f1_ref, f2a_ref, f2b_ref, out_ref, win_ref, *, md: int,
                   relu: bool):
    """All operands are standard pipelined VMEM blocks over grid (B, H/ht).
    The haloed window of padded f2 is assembled from two ADJACENT row
    blocks (f2a = rows of this tile, f2b = next tile's rows): overlap
    without Element-indexed specs (which would force whole-array VMEM
    staging) and without manual DMA (which requires 128-aligned lanes).

    The output is CHANNEL-FIRST (B, D^2, H, W): each displacement writes a
    full lane-aligned (ht, W) tile at out_ref[0, k]. (The previous NHWC
    kernel wrote one LANE of the 128-lane output tile per displacement —
    81 read-modify-write masked stores per block, measured ~10x slower.)
    """
    n = 2 * md + 1
    f1 = f1_ref[0]                      # (h_tile, W, C)
    ht, w, c = f1.shape
    inv_c = 1.0 / c
    # assemble the haloed window in a VMEM scratch ref (dynamic slicing of
    # VALUES is not lowerable on TPU; dynamic REF indexing is)
    win_ref[0:ht] = f2a_ref[0]
    win_ref[ht:ht + 2 * md] = f2b_ref[0, :2 * md]
    f1f = f1.astype(jnp.float32)

    # fori_loop over the row offset i only (dynamic indexing is allowed on
    # untiled dim 0 of the ref); the n column offsets j are static slices of
    # the loaded value. Full 81-way Python unroll blew Mosaic's 16 MB scoped
    # stack; an 81-trip fori with dynamic j hit the sublane-alignment rule
    # ("index in dimension 1 must be a multiple of 8") for C not a lane
    # multiple. n live slices per trip is the workable middle.
    def body(i, _):
        rows = win_ref[pl.ds(i, ht)]        # (ht, w + 2*md, c)
        for j in range(n):
            f2s = rows[:, j:j + w, :].astype(jnp.float32)
            corr = jnp.sum(f1f * f2s, axis=-1) * inv_c
            if relu:
                corr = jnp.where(corr >= 0, corr, corr * 0.1)
            out_ref[0, i * n + j] = corr.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _round_up(x, m):
    return -(-x // m) * m


def _pick_h_tile(h: int, w: int, c: int, md: int, bytes_per_el: int) -> int:
    """Largest h tile that keeps the pipelined blocks within VMEM.

    Block footprints use the real Mosaic layout: the last dim is padded to
    128 lanes, the second-to-last to 8 sublanes, and the pipeline holds two
    buffers per operand (double buffering). The output block is
    channel-first (n2, ht, w): lanes = w, sublanes = ht.
    """
    n2 = (2 * md + 1) ** 2
    c_pad = _round_up(c, 128)
    budget = 11 * 1024 * 1024
    for ht in (64, 32, 16, 8):  # ht >= 2*md so two blocks cover the halo
        if ht > h and ht > 8:
            continue
        f1_b = ht * _round_up(w, 8) * c_pad * bytes_per_el
        f2_b = ht * _round_up(w + 2 * md, 8) * c_pad * bytes_per_el
        out_b = n2 * _round_up(ht, 8) * _round_up(w, 128) * bytes_per_el
        # window concat scratch (ht + 2md rows of the f2 block)
        win_b = (ht + 2 * md) * _round_up(w + 2 * md, 8) * c_pad * 4
        total = 2 * (f1_b + 2 * f2_b + out_b) + win_b  # double-buffered
        if total <= budget:
            return ht
    return 8


def _cv_pallas_fwd(f1, f2, max_disp, interpret=False, relu=False,
                   channels_first_out=False):
    """Fused forward. Returns NHWC (B, H, W, D^2) by default; the kernel
    itself produces channel-first (B, D^2, H, W) (lane-aligned writes) and
    the NHWC transpose is left to XLA (one pass, usually fused downstream).
    `relu` fuses the LeakyReLU(0.1) epilogue (IRR_PWC.py:94-95)."""
    b, h, w, c = f1.shape
    md = max_disp
    n2 = (2 * md + 1) ** 2
    ht = _pick_h_tile(h, w, c, md, 2 if f1.dtype == jnp.bfloat16 else 4)
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
        functools.partial(_cv_fwd_kernel, md=md, relu=relu),
        out_shape=jax.ShapeDtypeStruct((b, n2, h_pad, w), out_dtype),
        grid=(b, num_h),
        in_specs=[
            pl.BlockSpec((1, ht, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, w + 2 * md, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, w + 2 * md, c), lambda bi, hi: (bi, hi + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n2, ht, w), lambda bi, hi: (bi, 0, hi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ht + 2 * md, w + 2 * md, c), f1.dtype)],
        interpret=interpret,
    )(f1, f2p, f2p)
    out = out[:, :, :h] if h_pad != h else out
    if channels_first_out:
        return out
    return jnp.transpose(out, (0, 2, 3, 1))


def _cv_bwd_xla(res, g, max_disp):
    """Backward via XLA autodiff of the shift-loop forward (the same
    correlation-gather math as correlation_cuda_kernel.cu:117-300, but
    XLA's transpose of pad/slice/mean schedules the 81 accumulations
    better than hand-written .at[].add updates — measured ~4x faster)."""
    f1, f2 = res
    _, vjp = jax.vjp(lambda a, b: cost_volume_xla(a, b, max_disp), f1, f2)
    return vjp(g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _cv_pallas(f1, f2, max_disp, interpret, relu):
    return _cv_pallas_fwd(f1, f2, max_disp, interpret, relu)


def _cv_pallas_vjp_fwd(f1, f2, max_disp, interpret, relu):
    out = _cv_pallas_fwd(f1, f2, max_disp, interpret, relu)
    return out, (f1, f2, out if relu else None)


def _cv_pallas_vjp_bwd(max_disp, interpret, relu, res, g):
    f1, f2, out = res
    if relu:
        # LeakyReLU epilogue grad: the fused output preserves the sign of
        # the pre-activation, so the slope can be recovered from it.
        g = g * jnp.where(out >= 0, 1.0, 0.1).astype(g.dtype)
    return _cv_bwd_xla((f1, f2), g, max_disp)


_cv_pallas.defvjp(_cv_pallas_vjp_fwd, _cv_pallas_vjp_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def cost_volume_pallas(f1: jnp.ndarray, f2: jnp.ndarray, max_disp: int = 4,
                       interpret: bool | None = None,
                       relu: bool = False) -> jnp.ndarray:
    """Fused Pallas cost volume (interpreted off-TPU for testability)."""
    if interpret is None:
        interpret = not _on_tpu()
    return _cv_pallas(f1, f2, max_disp, interpret, relu)


def cost_volume(f1: jnp.ndarray, f2: jnp.ndarray, max_disp: int = 4,
                relu: bool = False) -> jnp.ndarray:
    """Cost volume with optional fused LeakyReLU(0.1) epilogue (the model
    applies it to every correlation output, reference IRR_PWC.py:94-95).

    Dispatches to the XLA shift-product formulation on ALL backends: when
    measured in-graph on TPU v5e (scan-loop repetition, scalar sync — NOT
    standalone dispatch, which is dominated by tunnel overhead and full
    result transfer), XLA's fusion of the 81 static shifted products beats
    the hand-written Pallas kernel ~6x (0.96 ms vs 6.0 ms at B=8
    112x256x32 bf16), and the full IRR_PWC eval forward is 45 ms faster.
    XLA keeps the products in registers and fuses the LeakyReLU + mean;
    the Pallas kernel's unaligned static window slices relayout each of
    the 81 (ht, w, c) tiles through the VPU. `cost_volume_pallas` remains
    available (tested) as the starting point if Mosaic gains cheap
    unaligned sublane slicing.
    """
    out = cost_volume_xla(f1, f2, max_disp)
    if relu:
        from ..nn.core import leaky_relu
        out = leaky_relu(out)
    return out
