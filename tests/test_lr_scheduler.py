"""LR scheduler semantics (torch-parity as the reference uses them)."""

import numpy as np

from irr_tpu.lr_scheduler import (MultiStepLR, StepLR, ExponentialLR,
                                  CosineAnnealingLR, ReduceLROnPlateau)


def test_multistep_lr():
    s = MultiStepLR(milestones=[54, 72, 90], gamma=0.5)
    assert s.lr(1e-4, 0) == 1e-4
    assert s.lr(1e-4, 53) == 1e-4
    np.testing.assert_allclose(s.lr(1e-4, 54), 5e-5)
    np.testing.assert_allclose(s.lr(1e-4, 72), 2.5e-5)
    np.testing.assert_allclose(s.lr(1e-4, 90), 1.25e-5)
    np.testing.assert_allclose(s.lr(1e-4, 200), 1.25e-5)


def test_multistep_lr_scheduler_restart_quirk():
    """A resumed stage restarts the step count at 0 (the reference rebuilds
    the torch scheduler fresh; milestones count scheduler steps, not
    absolute epochs)."""
    s = MultiStepLR(milestones=[128, 139, 149], gamma=0.5)
    # stage 2 runs epochs 109..159 -> at most 51 steps: no decay fires
    assert s.lr(1e-5, 159 - 109) == 1e-5


def test_step_and_exponential():
    np.testing.assert_allclose(StepLR(step_size=10, gamma=0.1).lr(1.0, 25), 0.01)
    np.testing.assert_allclose(ExponentialLR(gamma=0.9).lr(1.0, 3), 0.9 ** 3)


def test_cosine():
    s = CosineAnnealingLR(T_max=100, eta_min=0.0)
    np.testing.assert_allclose(s.lr(1.0, 0), 1.0)
    np.testing.assert_allclose(s.lr(1.0, 100), 0.0, atol=1e-12)
    np.testing.assert_allclose(s.lr(1.0, 50), 0.5, atol=1e-12)


def test_plateau():
    s = ReduceLROnPlateau(factor=0.5, patience=1)
    s.step(1.0)   # best
    s.step(1.0)   # bad 1
    s.step(1.0)   # bad 2 -> reduce
    np.testing.assert_allclose(s.lr(1.0), 0.5)
