"""Can Mosaic vectorize dynamic per-element gathers inside a Pallas kernel?

P1: take_along_axis along axis 0 (sublane-dimension gather, per-lane indices)
P2: take_along_axis along axis 1 (lane-dimension shuffle, per-element indices)
P3: full bilinear warp of one (H, W) channel via P1+P2 composition.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 448, 1024   # padded Sintel-ish


def _sync(x):
    return float(x.ravel()[0])


def timeit_once(fn, *args, iters=5):
    jfn = jax.jit(fn)
    _sync(jfn(*args))
    _sync(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def try_bench(name, fn, *args):
    try:
        t = timeit_once(fn, *args)
        print(f"{name:58s} {t * 1e3:9.3f} ms", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:58s} FAILED: {type(e).__name__}: {msg}", flush=True)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W).astype(np.float32))
    y0 = jnp.asarray(rng.randint(0, H, size=(H, W)).astype(np.int32))
    x0 = jnp.asarray(rng.randint(0, W, size=(H, W)).astype(np.int32))

    # P1: sublane gather
    def k1(img_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(img_ref[:], idx_ref[:], axis=0)

    def p1(img, idx):
        return pl.pallas_call(
            k1,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(img, idx)

    try_bench("P1 pallas take_along_axis axis=0 (sublane)", p1, img, y0)

    # P2: lane shuffle
    def k2(img_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(img_ref[:], idx_ref[:], axis=1)

    def p2(img, idx):
        return pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(img, x0)

    try_bench("P2 pallas take_along_axis axis=1 (lane)", p2, img, x0)

    # P2b: lane shuffle via one-hot matmul inside kernel (128-lane blocks)?
    # P3: full per-element 2D gather: img[y0, x0]
    def k3(img_ref, y_ref, x_ref, out_ref):
        flat = img_ref[:].reshape(1, H * W)
        idx = y_ref[:] * W + x_ref[:]
        out_ref[:] = jnp.take_along_axis(
            jnp.broadcast_to(flat, (H, H * W)), idx, axis=1)[:, :W] * 0 + \
            jnp.take_along_axis(flat, idx.reshape(1, H * W), axis=1).reshape(H, W)

    # simpler: 1D flat gather
    def k3b(img_ref, y_ref, x_ref, out_ref):
        flat = img_ref[:].reshape(1, H * W)
        idx = (y_ref[:] * W + x_ref[:]).reshape(1, H * W)
        out_ref[:] = jnp.take_along_axis(flat, idx, axis=1).reshape(H, W)

    def p3(img, y, x):
        return pl.pallas_call(
            k3b,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(img, y, x)

    try_bench("P3 pallas flat 1D take_along_axis (full 2D gather)", p3, img, y0, x0)

    # P4: two-step: sublane gather of row, then lane shuffle within row —
    # NOT equivalent to 2D gather but tests composition cost
    def k4(img_ref, y_ref, x_ref, out_ref):
        rows = jnp.take_along_axis(img_ref[:], y_ref[:], axis=0)
        out_ref[:] = jnp.take_along_axis(rows, x_ref[:], axis=1)

    def p4(img, y, x):
        return pl.pallas_call(
            k4,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(img, y, x)

    try_bench("P4 pallas rowsel+laneshuffle compose", p4, img, y0, x0)

    # XLA equivalents for comparison
    try_bench("XLA take_along_axis axis=0",
              lambda a, i: jnp.take_along_axis(a, i, axis=0), img, y0)
    try_bench("XLA flat take_along_axis (2D gather)",
              lambda a, y, x: jnp.take_along_axis(
                  a.reshape(1, H * W), (y * W + x).reshape(1, H * W),
                  axis=1).reshape(H, W), img, y0, x0)


if __name__ == "__main__":
    main()
