"""Conv tower formulations at the L4 shape (16, 109, 256): can grouped
convs merge the flow+occ towers (2x wider N, no zero-block FLOPs)?
Also: head-conv dtype cost (f32 heads on bf16 activations), dense-tower
concat overhead, and the refine tower.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

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


def conv(x, w, b=None, dil=1, dt=jnp.bfloat16, groups=1):
    pad = dil
    y = lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), (1, 1), [(pad, pad), (pad, pad)],
        rhs_dilation=(dil, dil), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=dt)
    if b is not None:
        y = y + b.astype(dt)
    return jnp.where(y >= 0, y, y * 0.1)


def main():
    B, H, W = 16, 109, 256
    rng = np.random.RandomState(0)
    FLOOR[0] = timeit_once(device_loop(lambda a: a * 2.0, jnp.ones((8, 128))),
                           jnp.ones((8, 128)))
    print(f"floor: {FLOOR[0] * 1e3:.2f} ms", flush=True)

    def rw(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)

    x = jnp.asarray(rng.rand(B, H, W, 115).astype(np.float32)).astype(jnp.bfloat16)

    # 1. dense tower (flow estimator) as-is
    widths = [128, 128, 96, 64, 32]
    ws = []
    cin = 115
    for w_ in widths:
        ws.append(rw(3, 3, cin, w_))
        cin += w_
    whead = rw(3, 3, cin, 2)

    def dense_tower(x, *ws_all):
        ws_, whead_ = ws_all[:-1], ws_all[-1]
        m = x
        for w_ in ws_:
            y = conv(m, w_)
            m = jnp.concatenate([y, m], axis=-1)
        return lax.conv_general_dilated(
            m.astype(jnp.float32), whead_.astype(jnp.float32), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
    bench("dense tower x1 (flow est, f32 head)", dense_tower, x, *ws, whead)

    def dense_tower_bf16head(x, *ws_all):
        ws_, whead_ = ws_all[:-1], ws_all[-1]
        m = x
        for w_ in ws_:
            y = conv(m, w_)
            m = jnp.concatenate([y, m], axis=-1)
        return lax.conv_general_dilated(
            m, whead_.astype(jnp.bfloat16), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
    bench("dense tower x1 (bf16 head, f32 out)", dense_tower_bf16head, x, *ws, whead)

    bench("dense tower x2 sequential (flow+occ as today)",
          lambda a, *w_: (dense_tower(a, *w_), dense_tower(a, *w_)), x, *ws, whead)

    # 2. grouped merge: one tower with feature_group_count=2
    x2g = jnp.concatenate([x, x], axis=-1)   # (B,H,W,230): [in_f ; in_o]
    wsg = []
    cin = 115
    for w_ in widths:
        wsg.append(rw(3, 3, cin, 2 * w_))    # HWIO grouped: I=cin per group
        cin += w_

    def grouped_tower(xg, *wsg_):
        m = xg
        cin_g = 115
        for w_ in wsg_:
            y = conv(m, w_, groups=2)
            half = m.shape[-1] // 2
            w_out = w_.shape[-1] // 2
            m = jnp.concatenate([y[..., :w_out], m[..., :half],
                                 y[..., w_out:], m[..., half:]], axis=-1)
        return m
    bench("grouped tower (2 groups, interleaved concat)", grouped_tower, x2g, *wsg)

    # 3. context net: 7 dilated convs
    cws = [rw(3, 3, 565, 128), rw(3, 3, 128, 128), rw(3, 3, 128, 128),
           rw(3, 3, 128, 96), rw(3, 3, 96, 64), rw(3, 3, 64, 32)]
    chead = rw(3, 3, 32, 2)
    xc = jnp.asarray(rng.rand(B, H, W, 565).astype(np.float32)).astype(jnp.bfloat16)

    def ctx(xc, *ws_all):
        ws_, head = ws_all[:-1], ws_all[-1]
        dils = [1, 2, 4, 8, 16, 1]
        h = xc
        for w_, d in zip(ws_, dils):
            h = conv(h, w_, dil=d)
        return lax.conv_general_dilated(
            h.astype(jnp.float32), head.astype(jnp.float32), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
    bench("context net x1", ctx, xc, *cws, chead)

    cwsg = [rw(3, 3, 565, 256), rw(3, 3, 128, 256), rw(3, 3, 128, 256),
            rw(3, 3, 128, 192), rw(3, 3, 96, 128), rw(3, 3, 64, 64)]

    def ctxg(xcg, *ws_):
        dils = [1, 2, 4, 8, 16, 1]
        h = xcg
        for w_, d in zip(ws_, dils):
            h = conv(h, w_, dil=d, groups=2)
        return h
    xcg = jnp.concatenate([xc, xc], axis=-1)
    bench("context net grouped (2 groups)", ctxg, xcg, *cwsg)

    # 4. refine tower
    rws = [rw(3, 3, 35, 128), rw(3, 3, 128, 128), rw(3, 3, 128, 64),
           rw(3, 3, 64, 64), rw(3, 3, 64, 32), rw(3, 3, 32, 32)]
    rhead = rw(3, 3, 32, 9)
    xr = jnp.asarray(rng.rand(B, H, W, 35).astype(np.float32)).astype(jnp.bfloat16)

    def refine(xr, *ws_all):
        ws_, head = ws_all[:-1], ws_all[-1]
        h = xr
        for w_ in ws_:
            h = conv(h, w_)
        return lax.conv_general_dilated(
            h.astype(jnp.float32), head.astype(jnp.float32), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
    bench("refine tower x1 (f32 head)", refine, xr, *rws, rhead)


if __name__ == "__main__":
    main()
