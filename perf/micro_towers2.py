"""Where do the dense-tower milliseconds go? Per-conv split + variants.

Times each tower conv alone (in-graph scan discipline, see micro2.py),
compares each against a FLOP-equivalent plain matmul (the MXU ceiling for
the same math), times the dense concats alone, and tests a grouped-conv
fusion of the flow+occ tower pair (feature_group_count=2: per-group
weights, zero redundant FLOPs — unlike the zero-block merged stage).

Usage: python perf/micro_towers2.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

REPS = 10
B, H, W = 16, 110, 256   # L4 eval shape, stacked bidirectional batch


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


def conv3x3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def dev_rand(shape, dt):
    """Generate on-device (host literals would ship through the tunnel:
    a 1.9 GB matmul operand previously 413'd the remote compile)."""
    k = jax.random.PRNGKey(hash(shape) % (2**31))
    return jax.jit(lambda k: jax.random.uniform(k, shape, jnp.float32).astype(dt))(k)


def main():
    dt = jnp.bfloat16
    tower = [(115, 128), (243, 128), (371, 96), (467, 64), (531, 32),
             (563, 2)]
    print(f"shape {B}x{H}x{W}, bf16; v5e bf16 peak ~197 TFLOP/s")
    tot_conv = tot_mm = 0.0
    for cin, cout in tower:
        x = dev_rand((B, H, W, cin), dt)
        w = dev_rand((3, 3, cin, cout), dt)

        def body(c, i, x=x, w=w):
            return conv3x3(x + c.astype(dt) * 0, w).ravel()[0].astype(jnp.float32)

        ms = bench_ingraph(body)
        gflop = 2 * 9 * cin * cout * B * H * W / 1e9
        tot_conv += ms

        # FLOP-equivalent matmul: (B*H*W, 9*cin) @ (9*cin, cout)
        m = B * H * W
        k = 9 * cin
        a = dev_rand((m, k), dt)
        bm = dev_rand((k, cout), dt)

        def body_mm(c, i, a=a, bm=bm):
            return jnp.dot(a + c.astype(dt) * 0, bm,
                           preferred_element_type=dt).ravel()[0].astype(jnp.float32)

        ms_mm = bench_ingraph(body_mm)
        tot_mm += ms_mm
        print(f"conv {cin:4d}->{cout:4d}: {ms:7.3f} ms ({gflop/ms:6.1f} TF/s)"
              f"   matmul-equiv: {ms_mm:7.3f} ms ({gflop/ms_mm:6.1f} TF/s)")
    print(f"tower convs total: {tot_conv:.2f} ms; matmul ceiling: {tot_mm:.2f} ms")

    # concat cost alone (the dense trail)
    xs = [dev_rand((B, H, W, c), dt) for c in (128, 115, 128, 96, 64, 32)]

    def body_cat(c, i):
        acc = xs[1] + c.astype(dt) * 0
        for t in (xs[0], xs[2], xs[3], xs[4], xs[5]):
            acc = jnp.concatenate([t, acc], axis=-1)
        return acc.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(body_cat)
    print(f"5 dense concats alone: {ms:.3f} ms")

    # grouped conv: flow+occ conv pair as ONE conv, feature_group_count=2
    for cin, cout in [(116, 128), (244, 128)]:
        x2 = dev_rand((B, H, W, 2 * cin), dt)
        wg = dev_rand((3, 3, cin, 2 * cout), dt)

        def body_g(c, i, x2=x2, wg=wg):
            y = lax.conv_general_dilated(
                x2 + c.astype(dt) * 0, wg, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=2, preferred_element_type=dt)
            return y.ravel()[0].astype(jnp.float32)

        ms_g = bench_ingraph(body_g)

        # vs 2 separate convs
        x1 = dev_rand((B, H, W, cin), dt)
        w1 = dev_rand((3, 3, cin, cout), dt)

        def body_2(c, i, x1=x1, w1=w1):
            y1 = conv3x3(x1 + c.astype(dt) * 0, w1)
            y2 = conv3x3(x1 + c.astype(dt) * 0 + 1, w1)
            return (y1.ravel()[0] + y2.ravel()[0]).astype(jnp.float32)

        ms_2 = bench_ingraph(body_2)
        print(f"pair {cin}->{cout}: grouped(fg=2) {ms_g:.3f} ms vs 2 convs {ms_2:.3f} ms")


if __name__ == "__main__":
    main()
