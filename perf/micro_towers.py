"""Estimator-tower MXU efficiency: plain vs space-to-depth execution.

The dense towers' late convs are lane-starved (N=96/64/32 of 128 lanes).
s2d(2x2) runs the SAME math as a conv on (H/2, W/2, 4C) with 4x wider
output (exact identity, nn/core.py:conv3x3_s2d), filling the MXU.

In-graph scan + scalar sync (see micro2.py discipline).
Usage: python perf/micro_towers.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

REPS = 10


def bench_ingraph(make_body, iters=3):
    def rep():
        def body(carry, i):
            return carry + make_body(carry, i), None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return out

    jfn = jax.jit(rep)
    float(jfn().ravel()[0])
    float(jfn().ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = jfn()
    float(o.ravel()[0])
    return (time.perf_counter() - t0) / iters / REPS * 1000


def main():
    from irr_tpu.nn.pwc import FlowEstimatorDense, ContextNetwork
    from irr_tpu.nn.core import (set_compute_dtype, space_to_depth,
                                 depth_to_space, conv3x3_s2d)

    set_compute_dtype(jnp.bfloat16)
    rng = np.random.RandomState(0)
    # L4 eval shape, stacked bidirectional batch
    b, h, w = 16, 110, 256   # 109 padded to even
    ch_in = 115
    est = FlowEstimatorDense(ch_in)
    params = est.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.rand(b, h, w, ch_in).astype(np.float32)).astype(jnp.bfloat16)

    def plain(carry, i):
        x5, out = est(params, x + carry.astype(jnp.bfloat16) * 0)
        return out.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(plain)
    print(f"FlowEstimatorDense plain {b}x{h}x{w}x{ch_in}: {ms:.2f} ms")

    # s2d execution of the same dense tower
    def s2d_tower(carry, i):
        z = space_to_depth(x + carry.astype(jnp.bfloat16) * 0)
        names = ["conv1", "conv2", "conv3", "conv4", "conv5"]
        cur = z
        for nme in names:
            y = conv3x3_s2d(params[nme], cur, relu=True)
            cur = jnp.concatenate([y, cur], axis=-1)
        out = conv3x3_s2d(params["conv_last"], cur, relu=False)
        return out.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(s2d_tower)
    print(f"FlowEstimatorDense s2d                 : {ms:.2f} ms")

    ctx = ContextNetwork(448 + ch_in + 2)
    pctx = ctx.init(jax.random.PRNGKey(1))
    xc = jnp.asarray(rng.rand(b, h, w, 448 + ch_in + 2).astype(np.float32)).astype(jnp.bfloat16)

    def ctx_plain(carry, i):
        out = ctx(pctx, xc + carry.astype(jnp.bfloat16) * 0)
        return out.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(ctx_plain)
    print(f"ContextNetwork plain                   : {ms:.2f} ms")


if __name__ == "__main__":
    main()
