"""Golden-value loss tests: pin each loss class to hand-computed values
using independent torch/numpy implementations of the published formulas."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tf

from irr_tpu import losses


def _rand(*shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(*shape) * scale).astype(np.float32)


def _adaptive_down_t(x_nhwc, h, w):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    d = tf.adaptive_avg_pool2d(t, (h, w))
    return np.transpose(d.numpy(), (0, 2, 3, 1))


def test_f1_score_bal_loss_golden():
    y_pred = 1 / (1 + np.exp(-_rand(2, 8, 8, 1, seed=1)))
    y_true = (np.random.RandomState(2).rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    eps = 1e-8
    tp = -(y_true * np.log(y_pred + eps)).sum(axis=(1, 2, 3))
    fn = -((1 - y_true) * np.log(1 - y_pred + eps)).sum(axis=(1, 2, 3))
    denom_tp = y_true.sum(axis=(1, 2, 3)) + y_pred.sum(axis=(1, 2, 3)) + eps
    denom_fn = (1 - y_true).sum(axis=(1, 2, 3)) + (1 - y_pred).sum(axis=(1, 2, 3)) + eps
    want = ((tp / denom_tp).sum() + (fn / denom_fn).sum()) * 8 * 8 * 0.5
    got = float(losses.f1_score_bal_loss(jnp.asarray(y_pred), jnp.asarray(y_true)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_f1_score_golden():
    y_pred = (np.random.RandomState(3).rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    y_true = (np.random.RandomState(4).rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    eps = 1e-8
    tp = (y_pred * y_true).sum(axis=(1, 2))
    precision = tp / (y_pred.sum(axis=(1, 2)) + eps)
    recall = tp / (y_true.sum(axis=(1, 2)) + eps)
    want = float(np.mean(precision * recall / (precision + recall + eps) * 2))
    got = float(losses.f1_score(jnp.asarray(y_true), jnp.asarray(y_pred)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _epe_np(a, b):
    return np.linalg.norm(b - a, axis=-1, keepdims=True)


def test_multiscale_epe_pwc_golden():
    """MultiScaleEPE_PWC: per-level weighted sum of EPE vs adaptive-pooled
    target, / batch (reference losses.py:344-372)."""
    b = 2
    target = _rand(b, 32, 32, 2, seed=5)
    level_hw = [(1, 1), (2, 2), (4, 4), (8, 8), (16, 16)]
    outs = [jnp.asarray(_rand(b, h, w, 2, seed=10 + i))
            for i, (h, w) in enumerate(level_hw)]
    weights = [0.32, 0.08, 0.02, 0.01, 0.005]

    want = 0.0
    for wgt, out in zip(weights, outs):
        t_i = _adaptive_down_t(0.05 * target, out.shape[1], out.shape[2])
        want += wgt * _epe_np(np.asarray(out), t_i).sum()
    want /= b

    loss = losses.MultiScaleEPE_PWC(batch_size=b, div_flow=0.05)
    got = loss({"flow": outs}, {"target1": jnp.asarray(target)}, training=True)
    np.testing.assert_allclose(float(got["total_loss"]), want, rtol=1e-4)


def test_multiscale_epe_pwc_eval():
    b = 2
    flow = _rand(b, 16, 16, 2, seed=6)
    target = _rand(b, 16, 16, 2, seed=7)
    loss = losses.MultiScaleEPE_PWC(batch_size=b, div_flow=0.05)
    got = loss({"flow": jnp.asarray(flow)}, {"target1": jnp.asarray(target)}, training=False)
    np.testing.assert_allclose(float(got["epe"]), _epe_np(flow, target).mean(), rtol=1e-5)


def test_balance_scales_smaller_loss():
    """Auto balancing multiplies the smaller loss up to the larger one's
    magnitude (reference losses.py:194-205)."""
    f, o = jnp.asarray(4.0), jnp.asarray(2.0)
    total = losses._balance(f, o)
    np.testing.assert_allclose(float(total), 4.0 + 2.0 * 2.0)
    total2 = losses._balance(o, f)
    np.testing.assert_allclose(float(total2), 2.0 * 2.0 + 4.0)


def test_bi_occ_upsample_structure():
    """IRR_PWC loss consumes [cont_f, cont_b, ref_f, ref_b] lists; check a
    2-entry toy case against a direct computation."""
    b = 1
    target_f = _rand(b, 8, 8, 2, seed=8)
    target_b = _rand(b, 8, 8, 2, seed=9)
    tof = (np.random.RandomState(1).rand(b, 8, 8, 1) > 0.5).astype(np.float32)
    tob = (np.random.RandomState(2).rand(b, 8, 8, 1) > 0.5).astype(np.float32)

    flows, occs = [], []
    for lvl in range(7):
        h = 8  # keep all levels same size for the toy check
        n = 4 if lvl < 5 else 2
        flows.append([jnp.asarray(_rand(b, h, h, 2, seed=20 + lvl * 4 + k)) for k in range(n)])
        occs.append([jnp.asarray(_rand(b, h, h, 1, seed=60 + lvl * 4 + k)) for k in range(n)])

    loss = losses.MultiScaleEPE_PWC_Bi_Occ_upsample(batch_size=b, div_flow=0.05)
    got = loss({"flow": flows, "occ": occs},
               {"target1": jnp.asarray(target_f), "target2": jnp.asarray(target_b),
                "target_occ1": jnp.asarray(tof), "target_occ2": jnp.asarray(tob)},
               training=True)

    weights = [0.32, 0.08, 0.02, 0.01, 0.005, 0.00125, 0.0003125]
    flow_want = 0.0
    for i, outs in enumerate(flows):
        li = 0.0
        for j in range(len(outs) // 2):
            li += _epe_np(np.asarray(outs[2 * j]), 0.05 * target_f).sum()
            li += _epe_np(np.asarray(outs[2 * j + 1]), 0.05 * target_b).sum()
        flow_want += weights[i] * li / len(outs)
    np.testing.assert_allclose(float(got["flow_loss"]), flow_want / b, rtol=1e-4)
    assert np.isfinite(float(got["total_loss"]))


def test_kitti_loss_train_and_eval():
    b, h, w = 2, 16, 16
    target = _rand(b, h, w, 2, seed=11, scale=5.0)
    valid = (np.random.RandomState(5).rand(b, h, w, 1) > 0.3).astype(np.float32)
    flows = []
    for lvl in range(7):
        n = 4 if lvl < 5 else 2
        flows.append([jnp.asarray(_rand(b, 8, 8, 2, seed=30 + lvl * 4 + k)) for k in range(n)])
    occs = [[jnp.zeros((b, 8, 8, 1))] * (4 if lvl < 5 else 2) for lvl in range(7)]

    loss = losses.MultiScaleEPE_PWC_Bi_Occ_upsample_KITTI(batch_size=b, div_flow=0.05)
    td = {"target1": jnp.asarray(target), "input_valid": jnp.asarray(valid)}
    got = loss({"flow": flows, "occ": occs}, td, training=True)
    assert np.isfinite(float(got["total_loss"]))

    # eval: per-image normalized epe + outlier rate
    pred = jnp.asarray(target + _rand(b, h, w, 2, seed=12, scale=2.0))
    got_eval = loss({"flow": pred, "occ": jnp.zeros((b, h, w, 1))}, td, training=False)
    epe = _epe_np(np.asarray(pred), target) * valid
    want_epe = np.mean(epe.reshape(b, -1).sum(1) / valid.reshape(b, -1).sum(1))
    np.testing.assert_allclose(float(got_eval["epe"]), want_epe, rtol=1e-5)
    gt_mag = np.linalg.norm(target, axis=-1, keepdims=True) + 1e-8
    outl = (epe > 3) * ((epe / gt_mag) > 0.05) * valid
    want_out = np.mean(outl.reshape(b, -1).sum(1) / valid.reshape(b, -1).sum(1))
    np.testing.assert_allclose(float(got_eval["outlier"]), want_out, rtol=1e-5)


def test_sintel_loss_forward_only_gradient():
    """Backward-direction outputs must receive zero gradient in the Sintel
    loss (reference detaches them, losses.py:610,617)."""
    b = 1
    target_f = jnp.asarray(_rand(b, 8, 8, 2, seed=13))
    tof = jnp.asarray((np.random.RandomState(6).rand(b, 8, 8, 1) > 0.5).astype(np.float32))
    loss = losses.MultiScaleEPE_PWC_Bi_Occ_upsample_Sintel(batch_size=b, div_flow=0.05)

    def fn(fwd, bwd):
        flows = [[fwd, bwd, fwd, bwd] if l < 5 else [fwd, bwd] for l in range(7)]
        occs = [[fwd[..., :1], bwd[..., :1], fwd[..., :1], bwd[..., :1]] if l < 5
                else [fwd[..., :1], bwd[..., :1]] for l in range(7)]
        out = loss({"flow": flows, "occ": occs},
                   {"target1": target_f, "target_occ1": tof}, training=True)
        return out["total_loss"]

    fwd = jnp.asarray(_rand(b, 8, 8, 2, seed=14))
    bwd = jnp.asarray(_rand(b, 8, 8, 2, seed=15))
    g_fwd, g_bwd = jax.grad(fn, argnums=(0, 1))(fwd, bwd)
    assert float(jnp.abs(g_fwd).max()) > 0
    assert float(jnp.abs(g_bwd).max()) == 0.0


def test_flownet_loss_golden():
    b = 2
    target = _rand(b, 32, 32, 2, seed=16)
    outs = {f"flow{i}": jnp.asarray(_rand(b, 32 // 2 ** (i - 1), 32 // 2 ** (i - 1), 2,
                                          seed=40 + i))
            for i in range(2, 7)}
    loss = losses.MultiScaleEPE_FlowNet(batch_size=b, div_flow=0.05)
    got = loss(outs, {"target1": jnp.asarray(target)}, training=True)
    weights = [0.005, 0.01, 0.02, 0.08, 0.32]
    want = 0.0
    for i, key in enumerate(["flow2", "flow3", "flow4", "flow5", "flow6"]):
        o = np.asarray(outs[key])
        t = _adaptive_down_t(0.05 * target, o.shape[1], o.shape[2])
        want += weights[i] * _epe_np(o, t).sum() / b
    np.testing.assert_allclose(float(got["total_loss"]), want, rtol=1e-4)
