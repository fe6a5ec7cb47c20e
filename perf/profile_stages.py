"""Stage-bisection profiler for the IRR-PWC eval path at Sintel resolution.

Each stage is looped N times ON DEVICE inside one jit (lax.scan with an
iteration-dependent input perturbation so XLA cannot hoist the stage out of
the loop), reduced to a scalar. This amortizes the ~7 ms axon-tunnel
dispatch/sync floor that would otherwise swamp sub-millisecond stages.

Usage: python perf/profile_stages.py [--batch 8] [--levels 4,5,6] [--loops 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


LOOPS = 10


def device_loop(stage, *args):
    """Run `stage(*args)` LOOPS times serially on device, return scalar."""

    def fn(*a):
        def body(carry, i):
            pert = (i.astype(jnp.float32) * 1e-12)
            a2 = [x + pert.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating)
                  else x for x in a]
            y = stage(*a2)
            leaf = jax.tree_util.tree_leaves(y)[0]
            return carry + leaf.ravel()[0].astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(LOOPS))
        return out

    return fn


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


_FLOOR = [0.0]


def timeit_once(fn, *args, iters=3):
    jfn = jax.jit(fn)
    _sync(jfn(*args))
    _sync(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def timeit_stage(stage, *args):
    """Per-call device time of stage via the on-device loop."""
    t = timeit_once(device_loop(stage, *args), *args)
    return max(t - _FLOOR[0], 0.0) / LOOPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--levels", type=str, default="2,3,4,5,6")
    ap.add_argument("--loops", type=int, default=LOOPS)
    args = ap.parse_args()
    LOOPS_local = args.loops
    _FLOOR[0] = 0.0
    globals()["LOOPS"] = LOOPS_local
    levels = [int(s) for s in args.levels.split(",")]

    from irr_tpu import models
    from irr_tpu.nn.core import set_compute_dtype, leaky_relu, cat_features
    from irr_tpu.ops.cost_volume import cost_volume
    from irr_tpu.ops.warp import warp_masked, warp_multi
    from irr_tpu.ops.resize import upsample2d_as

    set_compute_dtype(jnp.bfloat16)
    B = args.batch
    H, W = 436, 1024
    model = models.IRR_PWC()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "input1": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "input2": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
    }

    # measure the dispatch floor: an on-device loop over a trivial stage
    _FLOOR[0] = timeit_once(device_loop(lambda x: x * 2.0, jnp.ones((8, 128))),
                            jnp.ones((8, 128)))
    print(f"dispatch+loop floor: {_FLOOR[0] * 1e3:.2f} ms")

    def rec(name, dt_s):
        print(f"{name:55s} {dt_s * 1e3:9.3f} ms", flush=True)

    full = timeit_once(lambda p, b: model.apply(p, b, training=False),
                       params, batch, iters=5)
    rec(f"FULL eval forward (B={B} pairs)", full)

    b2 = 2 * B
    raw = jnp.concatenate([batch["input1"], batch["input2"]], axis=0)
    rec("extractor (batch 2B, full res)",
        timeit_stage(lambda x: model.extractor(
            params["feature_pyramid_extractor"], x), raw))

    pyr = jax.jit(lambda p, x: model.extractor(p, x))(
        params["feature_pyramid_extractor"], raw)
    pyr = [jax.block_until_ready(t) for t in pyr] + [raw]
    print("pyramid shapes:", [tuple(t.shape) for t in pyr], flush=True)

    dvf = 0.05
    key = jax.random.PRNGKey(1)

    for l in levels:
        if l > 4:
            break
        x = pyr[l].astype(jnp.bfloat16)
        bl, hl, wl, cl = x.shape
        flow = jax.random.normal(jax.random.fold_in(key, l), (bl, hl, wl, 2),
                                 jnp.float32) * 0.2
        occ = jnp.zeros((bl, hl, wl, 1), jnp.float32)
        rec(f"L{l} warp_masked  {hl}x{wl}x{cl}",
            timeit_stage(lambda a, f: warp_masked(a, f, H, W, dvf), x, flow))
        rec(f"L{l} cost_volume  {hl}x{wl}x{cl}",
            timeit_stage(lambda a, c: leaky_relu(cost_volume(a, c, 4)), x, x))
        corr = jnp.zeros((bl, hl, wl, 81), jnp.bfloat16)
        if l < 4:
            x32 = jnp.zeros((bl, hl, wl, 32), jnp.bfloat16)
            rec(f"L{l} conv_1x1    {hl}x{wl}x{cl}->32",
                timeit_stage(lambda a: model.conv_1x1[l](params["conv_1x1"][l], a), x))
        else:
            x32 = x
        feat = cat_features(corr, x32, flow)
        rec(f"L{l} flow_est+ctx {hl}x{wl}",
            timeit_stage(lambda f: model.context_networks(
                params["context_networks"],
                cat_features(model.flow_estimators(params["flow_estimators"], f)[0],
                             flow)), feat))
        featocc = cat_features(corr, x32, occ)
        rec(f"L{l} occ_est+ctx  {hl}x{wl}",
            timeit_stage(lambda f: model.occ_context_networks(
                params["occ_context_networks"],
                cat_features(model.occ_estimators(params["occ_estimators"], f)[0],
                             occ)), featocc))
        img_r = jnp.zeros((bl, hl, wl, 3), jnp.bfloat16)
        rec(f"L{l} refine_flow  {hl}x{wl}",
            timeit_stage(lambda f, d, ft: model.refine_flow(
                params["refine_flow"], f, d, ft), flow, img_r, x32))
        rec(f"L{l} refine_occ   {hl}x{wl}",
            timeit_stage(lambda o, a2, c2: model.refine_occ(
                params["refine_occ"], o, a2, c2), occ, x32, x32))
        rec(f"L{l} img resize+warp {hl}x{wl}",
            timeit_stage(lambda r, f: warp_masked(
                upsample2d_as(r, f).astype(jnp.bfloat16), f, H, W, dvf),
                raw, flow))

    for l in (5, 6):
        if l not in levels:
            continue
        x = pyr[l].astype(jnp.bfloat16)
        bl, hl, wl, cl = x.shape
        x_f = x[:B]
        flow = jax.random.normal(jax.random.fold_in(key, 10 + l),
                                 (B, hl, wl, 2), jnp.float32) * 0.2
        rec(f"L{l} flow upsample x2 -> {hl}x{wl}",
            timeit_stage(lambda f: upsample2d_as(f, x_f),
                         jnp.zeros((B, (hl + 1) // 2, (wl + 1) // 2, 2), jnp.float32)))
        rec(f"L{l} warp_multi(x+flow) {hl}x{wl}x{cl + 2}",
            timeit_stage(lambda a, f: warp_multi([a, f], f, H, W, dvf), x_f, flow))
        if l != 6:
            rec(f"L{l} conv_1x1_1 x2 {hl}x{wl}",
                timeit_stage(lambda a: (model.conv_1x1_1(params["conv_1x1_1"], a),
                                        model.conv_1x1_1(params["conv_1x1_1"], a)), x_f))
        occ_half = jnp.zeros((B, (hl + 1) // 2, (wl + 1) // 2, 1), jnp.float32)
        guidance = jnp.zeros((B, hl, wl, 10), jnp.bfloat16)
        rec(f"L{l} occ_shuffle_upsample {hl}x{wl}",
            timeit_stage(lambda o, g: model.occ_shuffle_upsample(
                params["occ_shuffle_upsample"], o, g), occ_half, guidance))

    fl = jnp.zeros((B, 218, 512, 2), jnp.float32)
    rec("final flow upsample 218x512->436x1024",
        timeit_stage(lambda f: upsample2d_as(f, batch["input1"]) * 20.0, fl))


if __name__ == "__main__":
    main()
