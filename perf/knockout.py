"""Knockout-differencing profiler: time the FULL IRR-PWC eval forward with
individual subsystems replaced by shape-preserving cheap stand-ins. The
delta vs the intact forward is that subsystem's in-situ cost (including
fusion/layout effects stage bisection misses).

Usage: python perf/knockout.py [--batch 8]
"""

import argparse
import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])  # jax-array scalar index: 1-element transfer


def timeit_once(fn, *args, iters=5):
    # fresh lambda: pjit caches on function identity, mocks need a retrace
    jfn = jax.jit(lambda *a, _f=fn: _f(*a))
    _sync(jfn(*args))
    _sync(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    B, H, W = args.batch, 436, 1024

    from irr_tpu import models
    from irr_tpu.models import irr_pwc as m_irr
    from irr_tpu.nn.core import set_compute_dtype
    from irr_tpu.nn import irr as nn_irr
    from irr_tpu.ops import warp as ops_warp

    set_compute_dtype(jnp.bfloat16)
    model = models.IRR_PWC()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "input1": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "input2": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
    }

    def run():
        return timeit_once(lambda p, b: model.apply(p, b, training=False),
                           params, batch)

    base = run()
    print(f"{'FULL':52s} {base * 1e3:9.2f} ms", flush=True)

    def rec(name, t):
        print(f"{name:52s} {t * 1e3:9.2f} ms   delta {(base - t) * 1e3:+8.2f} ms",
              flush=True)

    # 1. no gathers anywhere: grid_sample returns its input (same shape)
    fake_gs = lambda x, ix, iy: x
    with mock.patch.object(ops_warp, "grid_sample_aligned", fake_gs):
        rec("no grid_sample gathers (passthrough)", run())

    # 2. no reference masks (keep gathers)
    fake_mask = lambda shape_hw, flow, h, w, dvf, dt: jnp.ones(
        (flow.shape[0], shape_hw[0], shape_hw[1], 1), dt)
    with mock.patch.object(ops_warp, "_pwc_mask", fake_mask):
        rec("no pwc masks (ones)", run())

    # 3. no cost volume (broadcast stand-in)
    fake_cv = lambda f1, f2, md=4, relu=False: jnp.broadcast_to(
        jnp.mean(f1, axis=-1, keepdims=True),
        f1.shape[:3] + ((2 * md + 1) ** 2,))
    with mock.patch.object(m_irr, "cost_volume", fake_cv):
        rec("no cost volume (broadcast)", run())

    # 4. no refine nets (identity on flow/occ)
    class FakeRefine:
        def __call__(self, p, a, *rest):
            return a
    with mock.patch.object(model, "refine_flow", FakeRefine()), \
         mock.patch.object(model, "refine_occ", FakeRefine()):
        rec("no refine nets", run())

    # 5. no occ upsample net at l>4 (plain x2 upsample)
    class FakeOccUp:
        def __call__(self, p, occ, x):
            from irr_tpu.ops.resize import upsample_factor2
            return upsample_factor2(occ, x)
    with mock.patch.object(model, "occ_shuffle_upsample", FakeOccUp()):
        rec("no OccUpsampleNetwork (plain x2)", run())

    # 6. no estimator/context towers (zeros residuals)
    class FakeEst:
        def __init__(self, ch):
            self.ch = ch
        def __call__(self, p, x):
            z = jnp.zeros(x.shape[:3] + (448 + x.shape[-1],), x.dtype)
            return z, jnp.zeros(x.shape[:3] + (self.ch,), jnp.float32)
    class FakeCtx:
        def __init__(self, ch):
            self.ch = ch
        def __call__(self, p, x):
            return jnp.zeros(x.shape[:3] + (self.ch,), jnp.float32)
    with mock.patch.object(model, "flow_estimators", FakeEst(2)), \
         mock.patch.object(model, "occ_estimators", FakeEst(1)), \
         mock.patch.object(model, "context_networks", FakeCtx(2)), \
         mock.patch.object(model, "occ_context_networks", FakeCtx(1)):
        rec("no estimator+context towers", run())

    # 6b. separate flow towers / occ towers / context nets
    with mock.patch.object(model, "flow_estimators", FakeEst(2)):
        rec("no flow estimator tower", run())
    with mock.patch.object(model, "occ_estimators", FakeEst(1)):
        rec("no occ estimator tower", run())
    with mock.patch.object(model, "context_networks", FakeCtx(2)), \
         mock.patch.object(model, "occ_context_networks", FakeCtx(1)):
        rec("no context networks", run())

    # 6c. no feature extractor (broadcast pyramid stand-in is hard; instead
    # time the extractor alone)
    def extractor_only(p, b):
        x = jnp.concatenate([b["input1"], b["input2"]], axis=0)
        return model.feature_pyramid_extractor(p["feature_pyramid_extractor"], x)
    rec("extractor alone (x2 images)", timeit_once(extractor_only, params, batch))

    # 7. f32 heads forced to bf16 (measures the dtype-switch cost)
    from irr_tpu.nn import core as nn_core
    with mock.patch.object(nn_core, "head_dtype", lambda cout: jnp.bfloat16):
        rec("heads in bf16 too", run())


if __name__ == "__main__":
    main()
