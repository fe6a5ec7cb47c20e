"""Micro-benchmarks round 2: gather locality + block-window formulations."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOOPS = 10
FLOOR = [0.0]


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


def gather_patches(x, y0, x0, ph=2, pw=2):
    b, h, w, c = x.shape
    ho, wo = y0.shape[1], y0.shape[2]
    idx = jnp.stack([y0, x0], axis=-1).reshape(b, ho * wo, 2)

    def g(img, ind):
        return jax.lax.gather(
            img, ind,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(ph, pw, c), mode="clip")
    return jax.vmap(g)(x, idx).reshape(b, ho, wo, ph, pw, c)


def main():
    B, H, W, C = 8, 436, 1024, 5
    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.rand(B, H + 2, W + 2, C).astype(np.float32)).astype(jnp.bfloat16)
    # realistic flow-ish indices: identity + smooth +-50px + noise
    base_y = np.arange(H)[None, :, None] + rng.rand(B, H, 1) * 100 - 50
    base_x = np.arange(W)[None, None, :] + rng.rand(B, 1, W) * 100 - 50
    y0_np = np.clip(base_y + rng.randn(B, H, W) * 2, 0, H).astype(np.int32)
    x0_np = np.clip(base_x + rng.randn(B, H, W) * 2, 0, W).astype(np.int32)
    y0 = jnp.asarray(y0_np)
    x0 = jnp.asarray(x0_np)

    FLOOR[0] = timeit_once(device_loop(lambda a: a * 2.0, jnp.ones((8, 128))),
                           jnp.ones((8, 128)))
    print(f"floor: {FLOOR[0] * 1e3:.2f} ms", flush=True)

    bench("gather (2,2,C), full queries (baseline)",
          lambda a: gather_patches(a, y0, x0), xp)
    bench("gather (2,2,C), half queries",
          lambda a: gather_patches(a, y0[:, ::2], x0[:, ::2]), xp)
    z = jnp.zeros_like(y0)
    bench("gather (2,2,C), all-zero indices",
          lambda a: gather_patches(a, z, z), xp)
    iy = jnp.broadcast_to(jnp.arange(H)[None, :, None], (B, H, W))
    ix = jnp.broadcast_to(jnp.arange(W)[None, None, :], (B, H, W))
    bench("gather (2,2,C), identity indices",
          lambda a: gather_patches(a, iy, ix), xp)

    # block-window: one (4,4,C) descriptor per 2x2 output block
    yb = jnp.min(y0.reshape(B, H // 2, 2, W // 2, 2), axis=(2, 4))
    xb = jnp.min(x0.reshape(B, H // 2, 2, W // 2, 2), axis=(2, 4))
    bench("gather (4,4,C), quarter queries (block window)",
          lambda a: gather_patches(a, yb, xb, 4, 4), xp)
    bench("gather (8,8,C), quarter queries",
          lambda a: gather_patches(a, yb, xb, 8, 8), xp)
    # one (4,4,C) descriptor per 2x2 block + VPU one-hot select of each
    # pixel's (2,2) patch from the window
    def block_select(a):
        win = gather_patches(a, yb, xb, 4, 4)     # (B, H/2, W/2, 4, 4, C)
        dy = (y0.reshape(B, H // 2, 2, W // 2, 2) -
              yb[:, :, None, :, None])            # (B,H/2,2,W/2,2) in [0..]
        dx = (x0.reshape(B, H // 2, 2, W // 2, 2) -
              xb[:, :, None, :, None])
        # build (2,2,C) per pixel via weighted sum over 9 window offsets
        acc = jnp.zeros((B, H // 2, 2, W // 2, 2, 2, 2, C), jnp.bfloat16)
        for a_off in range(3):
            for b_off in range(3):
                sel = ((dy == a_off) & (dx == b_off))
                selb = sel[..., None, None, None].astype(jnp.bfloat16)
                patch = win[:, :, :, a_off:a_off + 2, b_off:b_off + 2, :]
                acc = acc + selb * patch[:, :, None, :, None]
        return acc
    bench("block window + VPU 9-way select (full pipeline)", block_select, xp)

    # scatter throughput probes (for the training backward)
    upd = jnp.ones((B, H * W, C), jnp.float32)
    flat = (y0 * (W + 2) + x0).reshape(B, H * W)
    xflat = jnp.zeros((B, (H + 2) * (W + 2), C), jnp.float32)

    def seg_sum(u, f):
        return jax.ops.segment_sum(
            u.reshape(-1, C),
            (f + jnp.arange(B, dtype=jnp.int32)[:, None] * (H + 2) * (W + 2)).reshape(-1),
            num_segments=B * (H + 2) * (W + 2))
    bench("segment_sum scatter, N items (backward est.)", seg_sum, upd, flat)


if __name__ == "__main__":
    main()
