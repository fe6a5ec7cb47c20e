"""Optimizer param groups (reference configuration.py:488-573): fnmatch
patterns route parameters to group-specific hyperparameters."""

import types

import numpy as np
import jax
import jax.numpy as jnp

from irr_tpu import config, optim


def _args(groups):
    return types.SimpleNamespace(
        optimizer="Adam", optimizer_class=optim.Adam,
        optimizer_lr=1e-3, optimizer_weight_decay=0.0,
        optimizer_betas=(0.9, 0.999), optimizer_eps=1e-8,
        optimizer_amsgrad=False, optimizer_group=groups)


def test_param_groups_apply_different_lrs():
    params = {"backbone": {"w": jnp.ones((4,))}, "head": {"w": jnp.ones((4,))}}
    args = _args([{"params": "head*", "lr": 1e-1}])
    tx, base_lr = config.configure_optimizer(args, params)
    assert base_lr == 1e-3
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # head uses lr=1e-1, backbone the default 1e-3 (Adam step ~= -lr for
    # unit gradients at t=1)
    np.testing.assert_allclose(np.asarray(updates["head"]["w"]), -1e-1, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(updates["backbone"]["w"]), -1e-3, rtol=1e-3)


def test_scheduler_scales_all_group_lrs():
    params = {"backbone": {"w": jnp.ones((4,))}, "head": {"w": jnp.ones((4,))}}
    args = _args([{"params": "head*", "lr": 1e-1}])
    tx, base_lr = config.configure_optimizer(args, params)
    state = tx.init(params)
    base_lrs = optim.get_lr_leaves(state)
    np.testing.assert_allclose(sorted(base_lrs.values()), [1e-3, 1e-1], rtol=1e-5)
    state2 = optim.scale_lr(state, base_lrs, 0.5)
    got = sorted(optim.get_lr_leaves(state2).values())
    np.testing.assert_allclose(got, [5e-4, 5e-2], rtol=1e-5)
