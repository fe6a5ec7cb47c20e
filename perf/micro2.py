"""Clean micro-benchmarks: in-graph scan repetition + scalar sync.

Discipline (learned the hard way): standalone dispatch through the axon
tunnel costs tens of ms and `np.asarray(out)` transfers the whole result
at ~130 MB/s — both swamp real kernel time. Every measurement here loops
the op ON DEVICE inside one jit (carry-perturbed so XLA cannot hoist) and
syncs ONE scalar.

Usage: python perf/micro2.py [gather|scatter|all]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

REPS = 10


def bench_ingraph(make_body, iters=3):
    """make_body(carry) -> scalar-contribution; runs REPS times in one jit."""

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


def gather_suite():
    from irr_tpu.ops import warp as W
    rng = np.random.RandomState(0)
    b, h, w, c = 8, 436, 1024, 5   # L6 guidance warp shape
    x = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
    flow = jnp.asarray((rng.rand(b, h, w, 2) * 30 - 15).astype(np.float32))
    ix0 = jnp.arange(w, dtype=jnp.float32)[None, None, :] + flow[..., 0]
    iy0 = jnp.arange(h, dtype=jnp.float32)[None, :, None] + flow[..., 1]
    px = b * h * w

    def full_warp(carry, i):
        out = W.grid_sample_aligned(x, ix0 + carry * 1e-9, iy0)
        return out.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(full_warp)
    print(f"grid_sample_aligned {b}x{h}x{w}x{c}: {ms:.2f} ms  ({ms*1e6/px:.1f} ns/px)")

    # raw rowpair gather only (no index math, no weights)
    y0 = jnp.clip(iy0.astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(ix0.astype(jnp.int32), 0, w - 1)

    def taps_only(carry, i):
        t00, _, _, _ = W._gather_taps(x, y0 + (carry * 0).astype(jnp.int32), x0)
        return t00.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(taps_only)
    print(f"_gather_taps raw            : {ms:.2f} ms  ({ms*1e6/px:.1f} ns/px)")

    # plain flat 1-slice gather (1 descriptor/px, slice (1, C))
    xf = x.reshape(b, h * w, c)
    idx = (y0 * w + x0).reshape(b, h * w, 1)

    def flat_take(carry, i):
        out = jnp.take_along_axis(xf, idx + (carry * 0).astype(jnp.int32), axis=1)
        return out.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(flat_take)
    print(f"take_along_axis (1,C) slice : {ms:.2f} ms  ({ms*1e6/px:.1f} ns/px)")


def scatter_suite():
    rng = np.random.RandomState(0)
    b, h, w, c = 8, 192, 256, 32    # L5-train-ish feature scatter shape
    n = b * h * w
    seg = b * (h + 2) * (w + 2)
    ids_np = rng.randint(0, seg, size=n).astype(np.int32)
    ids = jnp.asarray(ids_np)
    v1 = jnp.asarray(rng.rand(n, c).astype(np.float32)).astype(jnp.bfloat16)
    v4 = jnp.asarray(rng.rand(n, 4 * c).astype(np.float32)).astype(jnp.bfloat16)

    def quad(carry, i):
        acc = jax.ops.segment_sum(v4 + carry.astype(jnp.bfloat16) * 0, ids,
                                  num_segments=seg)
        return acc.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(quad)
    print(f"segment_sum 1x items, 4C ({4*c}) ch: {ms:.2f} ms  ({ms*1e6/n:.1f} ns/item)")

    def four(carry, i):
        acc = jax.ops.segment_sum(v1 + carry.astype(jnp.bfloat16) * 0, ids,
                                  num_segments=seg)
        for k in range(3):
            acc = acc + jax.ops.segment_sum(v1, jnp.roll(ids, k + 1),
                                            num_segments=seg)
        return acc.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(four)
    print(f"segment_sum 4x items, C ({c}) ch  : {ms:.2f} ms  ({ms*1e6/n:.1f} ns/item)")

    # element-count control: 1x items at C channels
    def single(carry, i):
        acc = jax.ops.segment_sum(v1 + carry.astype(jnp.bfloat16) * 0, ids,
                                  num_segments=seg)
        return acc.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(single)
    print(f"segment_sum 1x items, C ch       : {ms:.2f} ms  ({ms*1e6/n:.1f} ns/item)")

    # sorted ids (locality) control
    ids_s = jnp.asarray(np.sort(ids_np))

    def sorted_ids(carry, i):
        acc = jax.ops.segment_sum(v4 + carry.astype(jnp.bfloat16) * 0, ids_s,
                                  num_segments=seg)
        return acc.ravel()[0].astype(jnp.float32)

    ms = bench_ingraph(sorted_ids)
    print(f"segment_sum 1x items 4C, SORTED  : {ms:.2f} ms  ({ms*1e6/n:.1f} ns/item)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("gather", "all"):
        gather_suite()
    if which in ("scatter", "all"):
        scatter_suite()
