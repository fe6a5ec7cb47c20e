"""Micro-benchmarks of bilinear-warp gather formulations at Sintel full res.

Goal: find the fastest exact formulation of 'fetch 4 bilinear taps per
output pixel' on TPU. Shape under test: B=8, 436x1024, C channels.
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOOPS = 10


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


def device_loop(stage, *args):
    def fn(*a):
        def body(carry, i):
            pert = i.astype(jnp.float32) * 1e-12
            a2 = [x + pert.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating)
                  else x for x in a]
            y = stage(*a2)
            leaf = jax.tree_util.tree_leaves(y)[0]
            return carry + leaf.ravel()[0].astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(LOOPS))
        return out
    return fn


FLOOR = [0.0]


def timeit_once(fn, *args, iters=3):
    jfn = jax.jit(fn)
    _sync(jfn(*args))
    _sync(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench(name, stage, *args):
    t = (timeit_once(device_loop(stage, *args), *args) - FLOOR[0]) / LOOPS
    print(f"{name:58s} {t * 1e3:9.3f} ms", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--C", type=int, default=5)
    args = ap.parse_args()
    B, H, W, C = 8, 436, 1024, args.C

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    flow = jnp.asarray((rng.rand(B, H, W, 2) * 100 - 50).astype(np.float32))

    FLOOR[0] = timeit_once(device_loop(lambda a: a * 2.0, jnp.ones((8, 128))),
                           jnp.ones((8, 128)))
    print(f"floor: {FLOOR[0] * 1e3:.2f} ms")

    from irr_tpu.ops.warp import (warp_multi, grid_sample_aligned,
                                  _gather_patches, _corner_data, _pwc_mask,
                                  _flow_to_coords)

    dvf = 0.05

    bench("warp_multi x+flow (current, all-in)",
          lambda a, f: warp_multi([a, f], f, H, W, dvf), x, flow)

    def coords(f):
        return _flow_to_coords((H, W), f, H, W, dvf, True)

    bench("grid_sample only (no mask)",
          lambda a, f: grid_sample_aligned(
              jnp.concatenate([a, f.astype(a.dtype)], -1), *coords(f)), x, flow)

    bench("reference mask only",
          lambda f: _pwc_mask((H, W), f, H, W, dvf, jnp.bfloat16), flow)

    def just_gather(a, f):
        ix, iy = coords(f)
        x0 = jnp.floor(ix).astype(jnp.int32)
        y0 = jnp.floor(iy).astype(jnp.int32)
        return _gather_patches(a, y0, x0)

    bench("patch gather only (2,2,C) slices",
          just_gather, x, flow)

    # --- variant: channel-major layout, slice (C,2,2) ----------------------
    def gather_cmajor(a, f):
        ix, iy = coords(f)
        y0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), -1, H) + 1
        x0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), -1, W) + 1
        ap = jnp.pad(a.transpose(0, 3, 1, 2), ((0, 0), (0, 0), (1, 1), (1, 1)))
        idx = jnp.stack([y0, x0], -1).reshape(B, H * W, 2)

        def g(img, ind):
            return jax.lax.gather(
                img, ind,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                    start_index_map=(1, 2)),
                slice_sizes=(C, 2, 2), mode="clip")
        return jax.vmap(g)(ap, idx)

    bench("patch gather, channel-major (C,2,2) slices",
          gather_cmajor, x, flow)

    # --- variant: flat 1D gather of (2, C) row-pairs, 2 per pixel -----------
    def gather_flat2(a, f):
        ix, iy = coords(f)
        y0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), -1, H) + 1
        x0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), -1, W) + 1
        ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
        apf = ap.reshape(B, (H + 2) * (W + 2), C)
        base = y0 * (W + 2) + x0
        idx = jnp.stack([base, base + (W + 2)], -1).reshape(B, -1, 1)

        def g(img, ind):
            return jax.lax.gather(
                img, ind,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2), collapsed_slice_dims=(),
                    start_index_map=(0,)),
                slice_sizes=(2, C), mode="clip")
        return jax.vmap(g)(apf, idx)

    bench("flat gather, 2 descriptors/px of (2,C)",
          gather_flat2, x, flow)

    # --- variant: int32-packed channels (bf16 pairs) -------------------------
    def gather_packed(a, f):
        ix, iy = coords(f)
        y0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), -1, H) + 1
        x0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), -1, W) + 1
        cpad = (-C) % 2
        ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, cpad)))
        api = jax.lax.bitcast_convert_type(
            ap.reshape(B, H + 2, W + 2, (C + cpad) // 2, 2), jnp.int32)
        idx = jnp.stack([y0, x0], -1).reshape(B, H * W, 2)

        def g(img, ind):
            return jax.lax.gather(
                img, ind,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                    start_index_map=(0, 1)),
                slice_sizes=(2, 2, (C + cpad) // 2), mode="clip")
        return jax.vmap(g)(api, idx)

    bench("patch gather int32-packed channels",
          gather_packed, x, flow)

    # --- descriptor-count scaling probe --------------------------------------
    for cc in (8, 32, 128):
        xb = jnp.asarray(rng.rand(B, H, W, cc).astype(np.float32)).astype(jnp.bfloat16)
        bench(f"patch gather only, C={cc}", just_gather, xb, flow)

    # --- half the descriptors (half-res query) probe -------------------------
    flow_h = flow[:, ::2, :, :]
    xh = x
    def gather_half(a, f):
        ix, iy = _flow_to_coords((H // 2, W), f, H, W, dvf, True)
        x0 = jnp.floor(ix).astype(jnp.int32)
        y0 = jnp.floor(iy).astype(jnp.int32)
        return _gather_patches(a, y0, x0)
    bench("patch gather, half the queries (218x1024)",
          gather_half, xh, flow_h)


if __name__ == "__main__":
    main()
