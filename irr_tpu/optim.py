"""Optimizer registry with torch.optim-compatible names and kwargs.

The reference re-exports every torch.optim class so the reflection CLI can
expose `--optimizer=Adam --optimizer_lr=... --optimizer_weight_decay=...`
(optim/__init__.py:1-13). Here each name builds the equivalent optax
transformation with the same hyperparameter names and semantics
(weight_decay is torch-style L2-into-gradient, applied before the moment
estimates, not decoupled).

All optimizers are wrapped in `optax.inject_hyperparams` with `lr` as the
only injected (runtime-settable) hyperparameter, so the runtime's LR
scheduler can rescale lr per epoch without recompiling (the torch
MultiStepLR contract).
"""

import functools

import jax

import jax.numpy as jnp
import optax


def _inject_lr(fn):
    """inject_hyperparams with every arg except lr static."""
    import inspect
    static = tuple(p for p in inspect.signature(fn).parameters if p != "lr")
    wrapped = optax.inject_hyperparams(fn, static_args=static)
    functools.update_wrapper(wrapped, fn)
    return wrapped


@_inject_lr
def Adam(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, amsgrad=False):
    b1, b2 = betas
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-1.0))
    parts.append(optax.scale(lr))
    return optax.chain(*parts)


@_inject_lr
def AdamW(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2, amsgrad=False):
    b1, b2 = betas
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-1.0),
        optax.scale(lr))


@_inject_lr
def SGD(lr=1e-3, momentum=0.0, dampening=0.0, weight_decay=0.0, nesterov=False):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale(-1.0))
    parts.append(optax.scale(lr))
    return optax.chain(*parts)


@_inject_lr
def RMSprop(lr=1e-2, alpha=0.99, eps=1e-8, weight_decay=0.0, momentum=0.0,
            centered=False):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_rms(decay=alpha, eps=eps))
    if momentum:
        parts.append(optax.trace(decay=momentum))
    parts.append(optax.scale(-1.0))
    parts.append(optax.scale(lr))
    return optax.chain(*parts)


@_inject_lr
def Adagrad(lr=1e-2, lr_decay=0.0, weight_decay=0.0, eps=1e-10):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_rss(initial_accumulator_value=0.0, eps=eps))
    parts.append(optax.scale(-1.0))
    parts.append(optax.scale(lr))
    return optax.chain(*parts)


@_inject_lr
def Adadelta(lr=1.0, rho=0.9, eps=1e-6, weight_decay=0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adadelta(rho=rho, eps=eps))
    parts.append(optax.scale(-1.0))
    parts.append(optax.scale(lr))
    return optax.chain(*parts)


@_inject_lr
def Adamax(lr=2e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    b1, b2 = betas
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adamax(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-1.0))
    parts.append(optax.scale(lr))
    return optax.chain(*parts)


@_inject_lr
def Rprop(lr=1e-2, etas=(0.5, 1.2), step_sizes=(1e-6, 50.0)):
    """torch.optim.Rprop, trajectory-exact (reference optim/__init__.py
    re-export; no script uses it). NOT optax.rprop: that one initializes
    the previous gradient to zero and so emits a ZERO first step, while
    torch steps immediately with step_size=lr."""
    eta_minus, eta_plus = etas
    min_step, max_step = step_sizes

    def init(params):
        return {
            "step_size": jax.tree_util.tree_map(
                lambda p: jnp.full(p.shape, lr, jnp.float32), params),
            "prev_grad": jax.tree_util.tree_map(jnp.zeros_like, params),
            "t": jnp.zeros((), jnp.int32),
        }

    def update(updates, state, params=None):
        def per_leaf(g, prev, step):
            sign = g * prev
            new_step = jnp.where(
                sign > 0, jnp.minimum(step * eta_plus, max_step),
                jnp.where(sign < 0, jnp.maximum(step * eta_minus, min_step),
                          step))
            g_eff = jnp.where(sign < 0, 0.0, g)
            return -jnp.sign(g_eff) * new_step, g_eff, new_step

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_p = treedef.flatten_up_to(state["prev_grad"])
        flat_s = treedef.flatten_up_to(state["step_size"])
        outs = [per_leaf(g, p, s) for g, p, s in zip(flat_g, flat_p, flat_s)]
        upd = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        prev = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
        steps = jax.tree_util.tree_unflatten(treedef, [o[2] for o in outs])
        return upd, {"step_size": steps, "prev_grad": prev,
                     "t": state["t"] + 1}

    return optax.GradientTransformation(init, update)


@_inject_lr
def ASGD(lr=1e-2, lambd=1e-4, alpha=0.75, t0=1e6, weight_decay=0.0):
    """torch.optim.ASGD's optimization path. torch's ASGD keeps a Polyak
    average in state['ax'] but STEPS with the plain (decayed) gradient and
    never exposes the average through .step(); the parameter trajectory —
    all the reference could consume — uses eta_t = lr/(1+lambd*lr*t)^alpha
    with the lambd shrinkage term."""
    def init(params):
        return {"t": jnp.zeros((), jnp.float32)}

    def update(updates, state, params=None):
        t = state["t"] + 1.0
        eta = lr / (1.0 + lambd * lr * t) ** alpha
        def upd(g, p):
            g = g + weight_decay * p if weight_decay else g
            # torch: p = p*(1 - lambd*eta) - eta*grad, as an additive update
            return -(lambd * eta) * p - eta * g
        return (jax.tree_util.tree_map(upd, updates, params), {"t": t})

    return optax.GradientTransformation(init, update)


def LBFGS(lr=1.0, **unused_kwargs):
    """torch.optim.LBFGS name parity (reference optim/__init__.py; no
    script uses it, and its closure-based .step() contract does not fit
    the jitted step). optax.lbfgs provides the same math; history/line-
    search knobs use optax defaults."""
    return optax.lbfgs(learning_rate=lr)


# torch.optim.SparseAdam is intentionally absent: it exists solely for
# torch sparse gradients, which have no JAX counterpart (all gradients are
# dense); Adam covers the dense case. (COMPONENTS.md)


def _path_names(path):
    names = []
    for p in path:
        if hasattr(p, "name"):
            names.append(str(p.name))
        elif hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
    return names


def _is_lr_leaf(path):
    names = _path_names(path)
    return bool(names) and names[-1] == "lr" and "hyperparams" in names


def get_lr_leaves(opt_state):
    """{path: base_lr} for every inject_hyperparams lr leaf (incl. groups)."""
    import jax
    flat, _ = jax.tree_util.tree_flatten_with_path(opt_state)
    return {"/".join(_path_names(p)): float(v) for p, v in flat if _is_lr_leaf(p)}


def scale_lr(opt_state, base_lrs, scale):
    """Return opt_state with every lr leaf set to base_lr * scale (the torch
    scheduler contract: each param group's lr scales together)."""
    import jax

    def f(path, leaf):
        key = "/".join(_path_names(path))
        if key in base_lrs:
            return jnp.asarray(base_lrs[key] * scale, jnp.float32)
        return leaf

    return jax.tree_util.tree_map_with_path(f, opt_state)


def set_lr(opt_state, lr):
    """Set the learning rate on an inject_hyperparams state (LR scheduling)."""
    opt_state.hyperparams["lr"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_lr(opt_state):
    return float(opt_state.hyperparams["lr"])


REGISTRY = {
    "Adam": Adam,
    "AdamW": AdamW,
    "SGD": SGD,
    "RMSprop": RMSprop,
    "Adagrad": Adagrad,
    "Adadelta": Adadelta,
    "Adamax": Adamax,
}
