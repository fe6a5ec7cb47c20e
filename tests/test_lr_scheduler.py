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


def test_lambda_lr():
    from irr_tpu.lr_scheduler import LambdaLR
    s = LambdaLR(lr_lambda=lambda e: 0.5 ** e)
    assert abs(s.lr(1e-3, 0) - 1e-3) < 1e-12
    assert abs(s.lr(1e-3, 2) - 0.25e-3) < 1e-12
    s2 = LambdaLR(lr_lambda="0.1 ** epoch")
    assert abs(s2.lr(1.0, 1) - 0.1) < 1e-12


def test_new_optimizers_step():
    """ASGD / Rprop / LBFGS registry names construct and take a step."""
    import jax, jax.numpy as jnp
    from irr_tpu import optim
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}
    for name, kw in (("ASGD", {}), ("Rprop", {}), ("LBFGS", {"lr": 0.1})):
        opt = getattr(optim, name)(**kw)
        st = opt.init(params)
        try:
            upd, st = opt.update(grads, st, params)
        except TypeError:
            upd, st = opt.update(grads, st, params, value=jnp.asarray(1.0),
                                 grad=grads, value_fn=lambda p: jnp.asarray(1.0))
        new = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        assert jnp.isfinite(new["w"]).all(), name
        assert not jnp.allclose(new["w"], params["w"]), name


def test_asgd_matches_torch_trajectory():
    """ASGD parameter trajectory == torch.optim.ASGD over a few steps."""
    import torch
    import jax, jax.numpy as jnp
    from irr_tpu import optim
    w0 = np.asarray([1.0, -2.0, 0.5], np.float32)
    gs = [np.asarray(g, np.float32) for g in
          ([0.3, -0.1, 0.2], [0.05, 0.4, -0.3], [-0.2, 0.1, 0.1])]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.ASGD([tw], lr=1e-2, lambd=1e-4, alpha=0.75, t0=1e6,
                            weight_decay=1e-3)
    for g in gs:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = optim.ASGD(lr=1e-2, lambd=1e-4, alpha=0.75, t0=1e6, weight_decay=1e-3)
    params = {"w": jnp.asarray(w0)}
    st = opt.init(params)
    for g in gs:
        upd, st = opt.update({"w": jnp.asarray(g)}, st, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5)


def test_rprop_matches_torch_trajectory():
    import torch
    import jax, jax.numpy as jnp
    from irr_tpu import optim
    w0 = np.asarray([1.0, -2.0, 0.5], np.float32)
    gs = [np.asarray(g, np.float32) for g in
          ([0.3, -0.1, 0.2], [0.05, 0.4, -0.3], [-0.2, 0.1, 0.1],
           [0.0, -0.1, 0.2])]
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Rprop([tw], lr=1e-2, etas=(0.5, 1.2),
                             step_sizes=(1e-6, 50.0))
    for g in gs:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = optim.Rprop(lr=1e-2, etas=(0.5, 1.2), step_sizes=(1e-6, 50.0))
    params = {"w": jnp.asarray(w0)}
    st = opt.init(params)
    for g in gs:
        upd, st = opt.update({"w": jnp.asarray(g)}, st, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-6)


def test_resolve_stage_start_epoch(tmp_path):
    """A preemption resume (resume_from_latest + exact opt restore) keeps
    the stage's original LR-schedule origin from the sidecar; a curriculum
    stage change (resume_from_best, fresh optimizer) restarts the count at
    start_epoch (the reference quirk). Without this, every supervisor
    relaunch shifted MultiStepLR milestones by the resume offset."""
    import json
    import os
    import types
    from irr_tpu.config import resolve_stage_start_epoch

    side = os.path.join(str(tmp_path), "checkpoint_latest.json")
    with open(side, "w") as f:
        json.dump({"resume_epoch": 17, "stage_start_epoch": 1}, f)

    resume = types.SimpleNamespace(
        start_epoch=17, checkpoint=str(tmp_path),
        checkpoint_mode="resume_from_latest",
        checkpoint_resume_optimizer=True)
    assert resolve_stage_start_epoch(resume) == 1

    stage_change = types.SimpleNamespace(
        start_epoch=31, checkpoint=str(tmp_path),
        checkpoint_mode="resume_from_best",
        checkpoint_resume_optimizer=False)
    assert resolve_stage_start_epoch(stage_change) == 31

    with open(side, "w") as f:  # legacy sidecar without the field
        json.dump({"resume_epoch": 17}, f)
    assert resolve_stage_start_epoch(resume) == 17

    fresh = types.SimpleNamespace(start_epoch=1, checkpoint=None,
                                  checkpoint_mode="resume_from_latest",
                                  checkpoint_resume_optimizer=False)
    assert resolve_stage_start_epoch(fresh) == 1


def test_warn_unreachable_milestones(caplog):
    """The stage-2 r4 silent no-op (milestone [36] in a stage covering
    epochs 31-40 with stage-relative counting) must produce a loud
    configure-time warning; reachable milestones must stay silent."""
    import logging
    import types
    from irr_tpu.config import warn_unreachable_milestones
    from irr_tpu.lr_scheduler import MultiStepLR

    # the r4 miss: stage epochs 31..40, milestone written absolute
    args = types.SimpleNamespace(start_epoch=31, total_epochs=40,
                                 checkpoint=None)
    sched = MultiStepLR(milestones=[36], gamma=0.5)
    with caplog.at_level(logging.WARNING):
        bad = warn_unreachable_milestones(args, sched)
    assert bad == [36]
    assert any("NEVER fire" in r.message for r in caplog.records)
    assert any("NEVER DECAY" in r.getMessage() for r in caplog.records)

    # correctly stage-relative milestone [5]: silent
    caplog.clear()
    sched_ok = MultiStepLR(milestones=[5], gamma=0.5)
    with caplog.at_level(logging.WARNING):
        assert warn_unreachable_milestones(args, sched_ok) == []
    assert not caplog.records

    # mixed: only the unreachable one is reported, softer wording
    caplog.clear()
    sched_mix = MultiStepLR(milestones=[5, 36], gamma=0.5)
    with caplog.at_level(logging.WARNING):
        assert warn_unreachable_milestones(args, sched_mix) == [36]

    # schedulers without milestones (e.g. StepLR) are a no-op
    from irr_tpu.lr_scheduler import StepLR
    assert warn_unreachable_milestones(args, StepLR(step_size=3)) == []
