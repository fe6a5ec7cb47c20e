"""Training-quality regression test (slow).

Pins the round-1 result "flagship CLI training converges" (git d46239e:
val EPE 21.7 -> 10.0 over 2 synthetic epochs on-chip) as a repeatable
small-scale check: a short IRR_PWC training run on a synthetic
constant-flow dataset must reduce eval EPE substantially. Catches
training-quality regressions (bad grads, NaN plumbing, optimizer wiring),
not just step mechanics.

Skipped unless IRR_TPU_SLOW_TESTS=1 (takes minutes on a 1-core CPU box);
the driver/bench environment can opt in.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from irr_tpu import models, losses, optim
from irr_tpu.parallel.train import make_train_step, make_eval_step, TrainState

pytestmark = pytest.mark.skipif(
    os.environ.get("IRR_TPU_SLOW_TESTS", "0") != "1",
    reason="slow convergence test; set IRR_TPU_SLOW_TESTS=1")


def _synthetic_batch(rng, b, h, w, shift=3):
    """Image pairs related by a constant +shift px horizontal translation."""
    big = rng.rand(b, h, w + shift, 3).astype(np.float32)
    img1 = big[:, :, :w]
    img2 = big[:, :, shift:shift + w]
    # flow maps img1 -> img2 sampling positions: u = +shift
    flow = np.zeros((b, h, w, 2), np.float32)
    flow[..., 0] = shift
    # physically-correct occlusion: pixels whose correspondence leaves the
    # frame. (All-zero occ targets drive occ_loss -> 0, and the reference's
    # auto loss balancing, losses.py:194-205, amplifies the occ gradient by
    # flow_loss/occ_loss -> divergence. Real datasets never have all-zero
    # occ maps, so give the synthetic data a real occlusion band.)
    occ1 = np.zeros((b, h, w, 1), np.float32)
    occ1[:, :, w - shift:] = 1.0
    occ2 = np.zeros((b, h, w, 1), np.float32)
    occ2[:, :, :shift] = 1.0
    return {
        "input1": jnp.asarray(img1), "input2": jnp.asarray(img2),
        "target1": jnp.asarray(flow), "target2": jnp.asarray(-flow),
        "target_occ1": jnp.asarray(occ1), "target_occ2": jnp.asarray(occ2),
    }


def test_irr_pwc_short_training_reduces_epe():
    # Regime calibration: a zero-flow prediction already scores EPE=shift,
    # so the shift must be large enough that "learned the constant motion"
    # is distinguishable from noise, and there must be enough optimizer
    # steps for the flow heads to move. (An earlier 24-step shift=3
    # variant oscillated around the zero-flow baseline.)
    rng = np.random.RandomState(0)
    b, h, w, shift = 2, 64, 64, 6
    model = models.IRR_PWC()
    loss_mod = losses.MultiScaleEPE_PWC_Bi_Occ_upsample(batch_size=b, div_flow=0.05)

    def loss_fn(out, batch, training):
        return loss_mod(out, batch, training=training)

    optimizer = optim.Adam(lr=3e-4)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    state = TrainState(params, optimizer.init(params))
    step = make_train_step(model, loss_fn, optimizer)
    eval_step = make_eval_step(model, loss_fn)

    batches = [_synthetic_batch(rng, b, h, w, shift=shift) for _ in range(6)]
    val = _synthetic_batch(np.random.RandomState(99), b, h, w, shift=shift)

    epe0 = float(eval_step(state.params, val)[0]["epe"])
    history = [epe0]
    for epoch in range(10):
        for batch in batches:
            state, ld = step(state, batch)
            assert np.isfinite(float(ld["total_loss"]))
        history.append(float(eval_step(state.params, val)[0]["epe"]))
    print("epe history:", ["%.3f" % e for e in history])
    epe1 = min(history[-3:])  # tail min: tolerate one noisy eval

    # zero-flow baseline scores ~shift=6; training must beat it by >=40%
    assert np.isfinite(epe0) and np.isfinite(epe1)
    assert epe1 < 0.6 * epe0, (epe0, epe1, history)
