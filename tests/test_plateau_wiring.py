"""ReduceLROnPlateau must actually reduce the LR leaf in opt_state when the
validation metric plateaus (wired in runtime/loop.exec_runtime; the
reference marks the case at runtime.py:487 but its `step()` call at :570
omits the metric, so the torch path would raise — ours steps with the
validation key after eval, taking effect the next epoch)."""

import types

import jax
import jax.numpy as jnp
import numpy as np

from irr_tpu import optim
from irr_tpu.lr_scheduler import ReduceLROnPlateau
from irr_tpu.parallel.train import TrainState
from irr_tpu.runtime.loop import exec_runtime


def _args(**kw):
    a = types.SimpleNamespace(
        start_epoch=1, total_epochs=6, save=None,
        validation_key="epe", validation_key_minimize=True)
    for k, v in kw.items():
        setattr(a, k, v)
    return a


class _OneBatchLoader:
    def __iter__(self):
        yield {"input1": np.zeros((1, 4, 4, 3), np.float32)}

    def __len__(self):
        return 1


def test_plateaued_metric_reduces_lr_leaf():
    params = {"w": jnp.ones((3,))}
    optimizer = optim.Adam(lr=1e-3)
    base_lr = 1e-3
    opt_state = optimizer.init(params)
    state = TrainState(params, opt_state)
    base_lrs = optim.get_lr_leaves(opt_state)
    assert base_lrs, "expected an lr leaf in opt_state"

    sched = ReduceLROnPlateau(mode="min", factor=0.5, patience=1)
    applied_lrs = []

    def step_fn(state, batch):
        return state, {"total_loss": jnp.asarray(0.5)}

    def eval_fn(params, batch):
        return {"epe": jnp.asarray(3.0)}, {}  # constant -> plateau

    def lr_for_epoch(epoch):
        return sched.lr(base_lr)

    def set_lr(state, lr):
        applied_lrs.append(lr)
        scale = lr / base_lr
        return TrainState(state.params,
                          optim.scale_lr(state.opt_state, base_lrs, scale))

    state, best = exec_runtime(
        _args(), checkpoint_saver=None, state=state,
        step_fn=step_fn, eval_fn=eval_fn,
        train_loader=_OneBatchLoader(), validation_loader=_OneBatchLoader(),
        lr_for_epoch=lr_for_epoch, set_lr=set_lr, plateau_scheduler=sched)

    # patience=1: epoch1 sets best, epochs 2-3 are bad -> reduce before
    # epoch 4; epochs 5-6 bad again -> reduce before... (counter resets)
    assert applied_lrs[0] == base_lr
    assert min(applied_lrs) <= base_lr * 0.5 + 1e-12
    final_lrs = optim.get_lr_leaves(state.opt_state)
    assert all(abs(v - base_lr * sched._scale) < 1e-9 for v in final_lrs.values()), \
        (final_lrs, sched._scale)


def test_non_plateau_scheduler_unaffected():
    """Without a plateau scheduler the constant metric leaves lr alone."""
    params = {"w": jnp.ones((3,))}
    optimizer = optim.Adam(lr=1e-3)
    base_lr = 1e-3
    state = TrainState(params, optimizer.init(params))
    base_lrs = optim.get_lr_leaves(state.opt_state)

    def step_fn(state, batch):
        return state, {"total_loss": jnp.asarray(0.5)}

    def eval_fn(params, batch):
        return {"epe": jnp.asarray(3.0)}, {}

    def set_lr(state, lr):
        return TrainState(state.params,
                          optim.scale_lr(state.opt_state, base_lrs, lr / base_lr))

    state, _ = exec_runtime(
        _args(total_epochs=3), checkpoint_saver=None, state=state,
        step_fn=step_fn, eval_fn=eval_fn,
        train_loader=_OneBatchLoader(), validation_loader=_OneBatchLoader(),
        lr_for_epoch=lambda e: base_lr, set_lr=set_lr)
    final = optim.get_lr_leaves(state.opt_state)
    assert all(abs(v - base_lr) < 1e-9 for v in final.values())
