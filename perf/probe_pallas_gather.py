"""Probe: can Mosaic (jax 0.9.0) lower a vectorized dynamic gather inside a
Pallas TPU kernel, and at what per-element rate?

Round-2 rejected the Pallas gather path as "not lowerable in this Mosaic
version"; VERDICT asks for a re-test on current jax. Three formulations are
probed at the L6 guidance-warp shape:

  A. jnp.take_along_axis along the SUBLANE axis (per-lane row select inside
     a VMEM-resident tile) — Mosaic's tpu.DynamicGatherOp candidate.
  B. jnp.take_along_axis along axis 0 of a flat (H*W, C) VMEM buffer —
     general gather.
  C. one dynamic slice per output row via pl.ds with a scalar row index
     (loop over rows; tests scalar-indexed addressing cost).

Usage: python perf/probe_pallas_gather.py
"""

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def probe_a():
    """Per-lane sublane select: out[i, j] = src[idx[i, j], j] within a
    (S, 128) tile. S=8 (one vreg) and S=436 (full column band)."""
    for s in (8, 64, 436):
        src = jnp.asarray(np.random.rand(s, 128).astype(np.float32))
        idx = jnp.asarray(np.random.randint(0, s, (s, 128)).astype(np.int32))

        def kernel(src_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)

        @jax.jit
        def run(src, idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(src, idx)

        try:
            ms = timeit(run, src, idx)
            ref = np.take_along_axis(np.asarray(src), np.asarray(idx), 0)
            ok = np.allclose(np.asarray(run(src, idx)), ref)
            per = ms * 1e6 / (s * 128)
            print(f"A sublane-gather ({s},128): OK={ok} {ms:.3f} ms = {per:.2f} ns/elem")
        except Exception as e:
            print(f"A sublane-gather ({s},128): FAIL {type(e).__name__}: {str(e)[:200]}")


def probe_b():
    """Flat gather: out[i, :] = src[idx[i], :] for (H*W, C) src in VMEM."""
    hw, c = 436 * 1024 // 8, 8  # 1/8 of L6 to stay in VMEM
    src = jnp.asarray(np.random.rand(hw, c).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, hw, (hw,)).astype(np.int32))

    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(src_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(src, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((hw, c), src.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)

    try:
        ms = timeit(run, src, idx)
        ref = np.asarray(src)[np.asarray(idx)]
        ok = np.allclose(np.asarray(run(src, idx)), ref)
        print(f"B flat-gather ({hw},{c}): OK={ok} {ms:.3f} ms = {ms*1e6/hw:.2f} ns/row")
    except Exception as e:
        print(f"B flat-gather: FAIL {type(e).__name__}: {str(e)[:200]}")


def probe_c():
    """Scalar dynamic-slice addressing: one pl.ds row fetch per output row."""
    h, w = 436, 128
    src = jnp.asarray(np.random.rand(h, w).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, h, (h,)).astype(np.int32))

    def kernel(idx_ref, src_ref, out_ref):
        def body(i, _):
            out_ref[pl.ds(i, 1), :] = src_ref[pl.ds(idx_ref[i], 1), :]
            return 0
        jax.lax.fori_loop(0, h, body, 0)

    @jax.jit
    def run(src, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((h, w), src.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        )(idx, src)

    try:
        ms = timeit(run, src, idx)
        ref = np.asarray(src)[np.asarray(idx)]
        ok = np.allclose(np.asarray(run(src, idx)), ref)
        print(f"C row-slice loop ({h} rows): OK={ok} {ms:.3f} ms = {ms*1e6/h:.1f} ns/row")
    except Exception as e:
        print(f"C row-slice loop: FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), "jax", jax.__version__)
    probe_a()
    probe_b()
    probe_c()
