"""Train-step stage profiler at the stage-1 curriculum shape (B=4 384x512).

Bisects the 2.33 s/step (round-1 README) into: eval fwd, train fwd (multi
scale outputs), fwd+loss, full grad, grad+optimizer. Each timed as one
jitted program with a host-read sync (block_until_ready is unreliable
through the axon tunnel).

Usage: python perf/profile_train.py [--batch 4] [--h 384] [--w 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).ravel()[0])


def timeit(fn, *args, iters=5):
    # fresh lambda per call: pjit's global cache is keyed on function
    # identity, so re-jitting the SAME fn under different mock.patch
    # contexts would silently reuse the first compiled executable
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=512)
    args = ap.parse_args()
    B, H, W = args.batch, args.h, args.w

    from irr_tpu import models, losses, optim
    from irr_tpu.nn.core import set_compute_dtype
    from irr_tpu.parallel.train import TrainState

    set_compute_dtype(jnp.bfloat16)
    model = models.IRR_PWC()
    loss_mod = losses.MultiScaleEPE_PWC_Bi_Occ_upsample(batch_size=B, div_flow=0.05)
    optimizer = optim.Adam(lr=1e-4)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)

    rng = np.random.RandomState(0)
    batch = {
        "input1": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "input2": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "target1": jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32)),
        "target2": jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32)),
        "target_occ1": jnp.asarray((rng.rand(B, H, W, 1) > 0.8).astype(np.float32)),
        "target_occ2": jnp.asarray((rng.rand(B, H, W, 1) > 0.8).astype(np.float32)),
    }

    def rec(name, t):
        print(f"{name:40s} {t * 1e3:9.1f} ms", flush=True)

    rec("eval fwd", timeit(
        lambda p, b: model.apply(p, b, training=False), params, batch))
    rec("train fwd", timeit(
        lambda p, b: model.apply(p, b, training=True), params, batch))
    rec("train fwd + loss", timeit(
        lambda p, b: loss_mod(model.apply(p, b, training=True), b,
                              training=True)["total_loss"], params, batch))

    def grad_fn(p, b):
        return jax.grad(lambda pp: loss_mod(
            model.apply(pp, b, training=True), b,
            training=True)["total_loss"])(p)

    rec("grad (fwd+bwd)", timeit(grad_fn, params, batch))

    def full_step(state, b):
        g = grad_fn(state.params, b)
        import optax
        upd, os_ = optimizer.update(g, state.opt_state, state.params)
        return TrainState(optax.apply_updates(state.params, upd), os_)

    state = TrainState(params, opt_state)
    rec("full step (grad+opt)", timeit(full_step, state, batch))

    # knockouts inside grad: stub cost volume / warp to locate bwd cost
    from unittest import mock
    from irr_tpu.models import irr_pwc as m_irr
    from irr_tpu.ops import warp as ops_warp

    fake_cv = lambda f1, f2, md=4, relu=False: jnp.broadcast_to(
        jnp.mean(f1, axis=-1, keepdims=True),
        f1.shape[:3] + ((2 * md + 1) ** 2,))
    with mock.patch.object(m_irr, "cost_volume", fake_cv):
        rec("grad, no cost volume", timeit(grad_fn, params, batch))

    fake_gs = lambda x, ix, iy: x
    with mock.patch.object(ops_warp, "grid_sample_aligned", fake_gs):
        rec("grad, no gathers", timeit(grad_fn, params, batch))

    with mock.patch.object(m_irr, "cost_volume", fake_cv), \
         mock.patch.object(ops_warp, "grid_sample_aligned", fake_gs):
        rec("grad, no cv+gathers", timeit(grad_fn, params, batch))

    # towers / refine / occ-upsample knockouts inside grad
    class FakeEst:
        def __init__(self, ch):
            self.ch = ch
        def __call__(self, p, x):
            z = jnp.zeros(x.shape[:3] + (448 + x.shape[-1],), x.dtype)
            return z, jnp.mean(x, axis=-1, keepdims=True) * jnp.ones(
                (1, 1, 1, self.ch), jnp.float32)
    class FakeCtx:
        def __init__(self, ch):
            self.ch = ch
        def __call__(self, p, x):
            return jnp.mean(x, axis=-1, keepdims=True) * jnp.ones(
                (1, 1, 1, self.ch), jnp.float32)
    with mock.patch.object(model, "flow_estimators", FakeEst(2)), \
         mock.patch.object(model, "occ_estimators", FakeEst(1)), \
         mock.patch.object(model, "context_networks", FakeCtx(2)), \
         mock.patch.object(model, "occ_context_networks", FakeCtx(1)):
        rec("grad, no towers", timeit(grad_fn, params, batch))

    class FakeRefine:
        def __call__(self, p, a, *rest):
            return a + 0.0 * sum(jnp.mean(r) for r in rest)
    with mock.patch.object(model, "refine_flow", FakeRefine()), \
         mock.patch.object(model, "refine_occ", FakeRefine()):
        rec("grad, no refine nets", timeit(grad_fn, params, batch))

    class FakeOccUp:
        def __call__(self, p, occ, x):
            from irr_tpu.ops.resize import upsample_factor2
            return upsample_factor2(occ, x) + 0.0 * jnp.mean(x)
    with mock.patch.object(model, "occ_shuffle_upsample", FakeOccUp()):
        rec("grad, no occ upsample net", timeit(grad_fn, params, batch))

    # loss-only cost: grad of a trivial pixel-sum "loss" over the outputs
    def grad_triv(p, b):
        def f(pp):
            out = model.apply(pp, b, training=True)
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(out)) * 1e-9
        return jax.grad(f)(p)
    rec("grad, trivial loss (no EPE)", timeit(grad_triv, params, batch))


if __name__ == "__main__":
    main()
