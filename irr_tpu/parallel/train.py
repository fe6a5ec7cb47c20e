"""Jitted, sharded train/eval steps.

One fused XLA program per step: forward -> loss -> backward -> optimizer
update, with donated params/opt_state buffers (in-place on device) and no
per-step host syncs — the loss dict comes back as device arrays that the
runtime loop reads asynchronously (contrast the reference's per-batch
`.item()` sync, runtime.py:182-183).
"""

from typing import Any, NamedTuple

import jax
import optax

from .mesh import batch_sharding, replicated_sharding
from ..nn.core import normalize_image_batch


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


def pack_losses(ld):
    """Add a `_packed` vector of all scalar losses (sorted-key order).

    The runtime loop fetches loss scalars once per step; reading each dict
    entry separately costs one device->host round-trip EACH (~0.4 s/step
    through a tunneled device, measured: drain 187 s of a 572 s epoch).
    Packing in-graph makes the whole fetch ONE small transfer
    (runtime/loop.py _fetch_floats unpacks it)."""
    import jax.numpy as jnp
    keys = sorted(ld)
    return dict(ld, _packed=jnp.stack([ld[k].astype(jnp.float32)
                                       for k in keys]))


def make_train_step(model, loss_fn, optimizer, mesh=None, donate=True):
    """Returns jitted `step(state, batch) -> (state, loss_dict)`.

    batch carries both inputs (input1/input2) and targets (target*) — the
    model reads what it needs, the loss reads the rest (mirroring the
    reference's single example_dict contract, configuration.py:45-62).
    With a mesh: batch sharded over the data axis, state replicated; XLA
    inserts the gradient all-reduce.
    """

    def step(state, batch):
        import jax.numpy as jnp
        batch = normalize_image_batch(batch)

        def loss_of(params):
            out = model.apply(params, batch, training=True)
            ld = loss_fn(out, batch, training=True)
            return ld["total_loss"], ld

        (_, loss_dict), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # In-graph non-finite containment: if this batch's loss is not
        # finite, KEEP the previous params/opt state — the poisoned
        # gradients never enter the model. A transient NaN batch then
        # costs one skipped step instead of a process death + supervisor
        # restart + recompile (the r3/r4 synth runs crashed 4-9x on
        # occ-branch NaN transients; each restart burns 5-17 min of chip).
        # The skip is REPORTED (skipped_nonfinite in the loss dict): the
        # runtime loop logs it, dumps the batch for post-mortem, and
        # still fail-fasts if skips persist (real divergence, not a
        # transient). Cost: one isfinite + select per leaf, noise vs the
        # step. The reference has no equivalent (it asserts and dies,
        # runtime.py:183).
        ok = jnp.isfinite(loss_dict["total_loss"])
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, old)
        params = keep(params, state.params)
        opt_state = keep(opt_state, state.opt_state)
        loss_dict = dict(loss_dict,
                         skipped_nonfinite=(1.0 - ok.astype(jnp.float32)))
        return TrainState(params, opt_state), pack_losses(loss_dict)

    if mesh is not None:
        rs = replicated_sharding(mesh)
        bs = batch_sharding(mesh)
        state_sh = TrainState(rs, rs)
        return jax.jit(step,
                       in_shardings=(state_sh, bs),
                       out_shardings=(state_sh, rs),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, loss_fn, mesh=None, pad_to=None):
    """Returns jitted `eval_step(params, batch) -> (loss_dict, output_dict)`.

    pad_to: canonical eval batch size. A partial tail batch (B < pad_to,
    drop_last=False) is padded IN-GRAPH by repeating its last example, the
    model runs at the one canonical batch shape, and outputs are sliced
    back to B before the loss — so metrics are exact and the model never
    compiles (or executes) an odd-batch executable. Two reasons, both
    TPU-first: (1) static canonical shapes — the expensive model program
    exists in exactly one batch shape, and a sharded eval batch stays
    divisible across the mesh; (2) a measured axon/XLA:TPU miscompile: the
    B=3 eval executable of IRR_PWC returns all-NaN occ on data that the
    SAME program evaluates cleanly on (a) XLA:CPU, (b) eager TPU, and
    (c) jit TPU with intermediates returned (perf/repro_f1_nan.py — the
    r3 synth run's val-F1 NaN). Padding to B=4 sidesteps the bad
    executable entirely.
    """
    import jax.numpy as jnp

    def step(params, batch):
        batch = normalize_image_batch(batch)
        b = batch["input1"].shape[0]
        if pad_to is not None and b < pad_to:  # trace-time: tail executable
            reps = pad_to - b

            def pad(v):
                if not hasattr(v, "shape") or v.ndim == 0 or v.shape[0] != b:
                    return v
                tail = jnp.broadcast_to(v[-1:], (reps,) + v.shape[1:])
                return jnp.concatenate([v, tail.astype(v.dtype)], axis=0)

            out = model.apply(params, {k: pad(v) for k, v in batch.items()},
                              training=False)
            out = jax.tree_util.tree_map(lambda t: t[:b], out)
        else:
            out = model.apply(params, batch, training=False)
        ld = loss_fn(out, batch, training=False)
        return pack_losses(ld), out

    if mesh is not None:
        return jax.jit(step, in_shardings=(replicated_sharding(mesh),
                                           batch_sharding(mesh)))
    return jax.jit(step)


def init_state(model, optimizer, key):
    params = model.init(key)
    return TrainState(params, optimizer.init(params))
