"""Fused flow+occ stage formulations must equal the separate towers."""

import numpy as np
import jax
import jax.numpy as jnp

from irr_tpu.nn.pwc import (FlowEstimatorDense, OccEstimatorDense,
                            ContextNetwork, OccContextNetwork)

DIM_CORR = 81


def test_grouped_stage_matches_separate_paths():
    """grouped (feature_group_count=2) formulation: exact vs the separate
    towers, with no zero-block FLOP doubling (nn/pwc.py)."""
    from irr_tpu.nn.pwc import grouped_flow_occ_stage

    fe = FlowEstimatorDense(DIM_CORR + 32 + 2)
    oe = OccEstimatorDense(DIM_CORR + 32 + 1)
    cf = ContextNetwork(DIM_CORR + 32 + 2 + 448 + 2)
    co = OccContextNetwork(DIM_CORR + 32 + 1 + 448 + 1)
    k = jax.random.PRNGKey(7)
    pfe, poe = fe.init(jax.random.fold_in(k, 1)), oe.init(jax.random.fold_in(k, 2))
    pcf, pco = cf.init(jax.random.fold_in(k, 3)), co.init(jax.random.fold_in(k, 4))

    rng = np.random.RandomState(1)
    b, h, w = 2, 12, 16
    corr = jnp.asarray(rng.randn(b, h, w, 81).astype(np.float32))
    x1by1 = jnp.asarray(rng.randn(b, h, w, 32).astype(np.float32))
    flow = jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32) * 0.3)
    occ = jnp.asarray(rng.randn(b, h, w, 1).astype(np.float32) * 0.3)

    x_intm, flow_res = fe(pfe, jnp.concatenate([corr, x1by1, flow], -1))
    flow_est = flow + flow_res
    flow_cont = flow_est + cf(pcf, jnp.concatenate([x_intm, flow_est], -1))
    x_io, occ_res = oe(poe, jnp.concatenate([corr, x1by1, occ], -1))
    occ_est = occ + occ_res
    occ_cont = occ_est + co(pco, jnp.concatenate([x_io, occ_est], -1))

    fc, oc = grouped_flow_occ_stage(pfe, poe, pcf, pco, corr, x1by1, flow, occ)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(flow_cont), atol=1e-4)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(occ_cont), atol=1e-4)


def test_model_grouped_towers_flag():
    """--model_grouped_towers wiring: same outputs up to iterative ulp
    amplification. The single-stage error is ~2e-6 (tests above); the
    5 shared-weight refinement levels + warps amplify ulp-level conv
    reassociation to ~1e-3-level output deltas — the same class of
    divergence the reference exhibits between torch CPU and GPU
    (ops/warp.py mask-mode docstring)."""
    from irr_tpu.models import IRR_PWC

    m0 = IRR_PWC()
    m1 = IRR_PWC(grouped_towers=True)
    p = m0.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {"input1": jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32)),
             "input2": jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))}
    f0 = np.asarray(m0.apply(p, batch, training=False)["flow"])
    f1 = np.asarray(m1.apply(p, batch, training=False)["flow"])
    d = np.abs(f0 - f1)
    assert d.max() < 0.05 and d.mean() < 0.005, (d.max(), d.mean())
