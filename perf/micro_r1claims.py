"""Re-validate round-1 measurement claims with the clean in-graph method
(see micro2.py discipline): s2d vs plain OccUpsampleNetwork, matmul
resize vs jax.image, merged vs separate warp gathers.

Usage: python perf/micro_r1claims.py
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
    from irr_tpu.nn.irr import OccUpsampleNetwork
    from irr_tpu.nn.core import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)
    rng = np.random.RandomState(0)

    # --- OccUpsampleNetwork s2d vs plain at the L6 shape ----------------
    net = OccUpsampleNetwork(11, 1)
    params = net.init(jax.random.PRNGKey(0))
    b, h, w = 8, 218, 512           # occ comes in at half-res, upsampled x2
    occ = jnp.asarray(rng.rand(b, h, w, 1).astype(np.float32)).astype(jnp.bfloat16)
    x = jnp.asarray(rng.rand(b, 2 * h, 2 * w, 10).astype(np.float32)).astype(jnp.bfloat16)

    def occup(carry, i):
        out = net(params, occ + carry.astype(jnp.bfloat16) * 0, x)
        return out.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(occup)
    print(f"OccUpsampleNetwork s2d path (even dims) : {ms:.2f} ms")

    # plain path: odd width disables s2d internally
    xo = x[:, :, : 2 * w - 1, :]

    def occup_plain(carry, i):
        out = net(params, occ + carry.astype(jnp.bfloat16) * 0, xo)
        return out.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(occup_plain)
    print(f"OccUpsampleNetwork plain path (odd dims): {ms:.2f} ms")

    # --- matmul resize vs jax.image -------------------------------------
    from irr_tpu.ops.resize import upsample2d_as
    small = jnp.asarray(rng.rand(8, 109, 256, 2).astype(np.float32))
    big_ref = jnp.zeros((8, 436, 1024, 2), jnp.float32)

    def matmul_resize(carry, i):
        out = upsample2d_as(small + carry, big_ref)
        return out.ravel()[0]

    ms = bench_ingraph(matmul_resize)
    print(f"matmul align-corners resize 109x256->436x1024: {ms:.2f} ms")

    def jaximg_resize(carry, i):
        out = jax.image.resize(small + carry, (8, 436, 1024, 2), "bilinear")
        return out.ravel()[0]

    ms = bench_ingraph(jaximg_resize)
    print(f"jax.image.resize (different semantics!)      : {ms:.2f} ms")

    # --- merged vs separate gathers (warp_multi claim) ------------------
    from irr_tpu.ops.warp import warp_masked, warp_multi
    img = jnp.asarray(rng.rand(8, 436, 1024, 3).astype(np.float32)).astype(jnp.bfloat16)
    fb = jnp.asarray(rng.rand(8, 436, 1024, 2).astype(np.float32)).astype(jnp.bfloat16)
    flow = jnp.asarray((rng.rand(8, 436, 1024, 2) * 0.5 - 0.25).astype(np.float32))

    def merged(carry, i):
        outs = warp_multi([img, fb], flow + carry * 1e-9, 436, 1024, 0.05)
        return outs[0].ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(merged)
    print(f"warp_multi (img+flow one gather)             : {ms:.2f} ms")

    def separate(carry, i):
        a = warp_masked(img, flow + carry * 1e-9, 436, 1024, 0.05)
        b2 = warp_masked(fb, flow + carry * 1e-9, 436, 1024, 0.05)
        return (a.ravel()[0] + b2.ravel()[0]).astype(jnp.float32)

    ms = bench_ingraph(separate)
    print(f"two separate warps                           : {ms:.2f} ms")


if __name__ == "__main__":
    main()
