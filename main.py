"""Entry point (mirrors reference main.py:14-86): parse the reflection CLI,
build every subsystem via factories, run the epoch loop.

TPU specifics: the train step is one jitted sharded program over a
data-parallel mesh (all local devices by default); --compute_dtype=bfloat16
runs convs on the MXU in bf16 with f32 accumulation.
"""

import logging

import numpy as np


def main(argv=None):
    from irr_tpu import config, optim
    from irr_tpu import lr_scheduler as lr_scheduler_mod
    from irr_tpu.runtime import LoggingBlock, exec_runtime
    from irr_tpu.runtime.loop import EvaluationEpoch
    from irr_tpu.parallel import make_mesh, make_train_step, make_eval_step
    from irr_tpu.parallel.train import TrainState
    import jax

    args = config.setup_logging_and_parse_arguments(blocktitle="Commandline Arguments",
                                                    argv=argv)

    # persistent XLA compilation cache: the IRR models take 20-40 s to
    # compile cold; curriculum stages and re-runs hit the cache instead
    import os
    cache_dir = os.environ.get("IRR_TPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/irr_tpu_xla"))
    if cache_dir and cache_dir != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # older jax without the knob: non-fatal
            pass

    if getattr(args, "multihost", False):
        # DCN multi-host: join the global runtime BEFORE touching devices.
        from irr_tpu.parallel.mesh import initialize_multihost
        pid, pcount = initialize_multihost(args.coordinator_address,
                                           args.num_processes, args.process_id)
        logging.info("multihost: process %d/%d, %d global devices",
                     pid, pcount, len(jax.devices()))
        args._process_index, args._process_count = pid, pcount
    else:
        args._process_index, args._process_count = 0, 1

    key = config.configure_random_seed(args)

    n_devices = args.data_parallel_devices or len(jax.devices())
    mesh = make_mesh(n_devices) if n_devices > 1 else None

    train_loader, validation_loader = config.configure_data_loaders(args, mesh=mesh)
    if train_loader is None and validation_loader is None:
        logging.info("No dataset could be loaded successfully. "
                     "Please check dataset paths!")
        return None

    training_augmentation, validation_augmentation = \
        config.configure_runtime_augmentations(args)
    model, training_loss, validation_loss = config.configure_model_and_loss(args)

    checkpoint_saver = config.configure_checkpoint_saver(args)
    params = jax.jit(model.init)(key)
    params = config.restore_if_requested(args, checkpoint_saver, params)

    with LoggingBlock("Devices", emph=True):
        logging.info("backend: %s", jax.default_backend())
        logging.info("devices: %d (data-parallel mesh: %s)",
                     len(jax.devices()), "yes" if mesh is not None else "no")

    optimizer, base_lr = config.configure_optimizer(args, params)
    lr_scheduler = config.configure_lr_scheduler(args)

    state = step_fn = None
    if not args.evaluation and training_loss is not None:
        opt_state = optimizer.init(params)
        if getattr(args, "checkpoint_resume_optimizer", False) \
                and checkpoint_saver is not None:
            # exact resume (opt-in): Adam moments / step counts saved under
            # 'opt/'. Off by default — curriculum warm starts restore params
            # only and restart the optimizer, like the reference.
            ckpt_file = config.resolve_checkpoint_file(args, checkpoint_saver)
            if ckpt_file is not None:
                opt_state = checkpoint_saver.restore_opt_state(ckpt_file, opt_state)
        state = TrainState(params, opt_state)
        if mesh is not None:
            from irr_tpu.parallel.mesh import replicate
            state = replicate(state, mesh)
        step_fn = make_train_step(model, training_loss, optimizer, mesh=mesh)
    eval_fn = make_eval_step(model, validation_loss, mesh=mesh,
                             pad_to=getattr(args, "batch_size_val", None)) \
        if validation_loss is not None else None

    if args._process_count > 1 and mesh is not None:
        # host-local batch shards -> one global sharded array per leaf
        from irr_tpu.parallel.mesh import global_batch_from_local
        if step_fn is not None:
            _raw_step = step_fn
            step_fn = lambda state, batch: _raw_step(
                state, global_batch_from_local(batch, mesh))
        if eval_fn is not None:
            _raw_eval = eval_fn
            eval_fn = lambda params, batch: _raw_eval(
                params, global_batch_from_local(batch, mesh))
        if args._process_index != 0:
            checkpoint_saver = None  # only rank 0 writes checkpoints

    if args.evaluation:
        args.start_epoch = 1
        args.total_epochs = 1
        train_loader = None
        checkpoint_saver = None
        if validation_loader is not None and eval_fn is not None:
            with LoggingBlock("Epoch 1/1", emph=True):
                avg = EvaluationEpoch(args, eval_fn, validation_loader,
                                      augmentation=validation_augmentation,
                                      desc="Validate").run(params)
                for k in sorted(avg):
                    logging.info("%s: %1.4f", k, avg[k])
            logging.info("Finished.")
            return avg
        return None

    # torch scheduler contract: n steps taken before epoch e = e - start_epoch.
    # EXCEPT a preemption resume (resume_from_latest + exact opt-state
    # restore): that is a CONTINUATION of the same stage, so the schedule
    # origin is the stage's ORIGINAL start epoch (persisted as
    # stage_start_epoch in the checkpoint sidecar) — otherwise every
    # supervisor relaunch silently shifts the MultiStepLR milestones by
    # the resume offset (this run's stage-1 milestone 15 drifted to 26
    # before the fix). A curriculum stage change (resume_from_best, fresh
    # optimizer) keeps the reference's restart-from-0 quirk.
    stage_start = config.resolve_stage_start_epoch(args)
    args._stage_start_epoch = stage_start
    base_lrs = optim.get_lr_leaves(state.opt_state) if state is not None else {}

    def lr_for_epoch(epoch):
        if lr_scheduler is None:
            return base_lr
        return lr_scheduler.lr(base_lr, epoch - stage_start)

    def set_lr(state, lr):
        scale = lr / base_lr if base_lr else 1.0
        return TrainState(state.params,
                          optim.scale_lr(state.opt_state, base_lrs, scale))

    state, best = exec_runtime(
        args,
        checkpoint_saver=checkpoint_saver,
        state=state,
        step_fn=step_fn,
        eval_fn=eval_fn,
        train_loader=train_loader,
        validation_loader=validation_loader,
        training_augmentation=training_augmentation,
        validation_augmentation=validation_augmentation,
        lr_for_epoch=lr_for_epoch if lr_scheduler is not None else None,
        set_lr=set_lr,
        plateau_scheduler=(lr_scheduler if isinstance(
            lr_scheduler, lr_scheduler_mod.ReduceLROnPlateau) else None))
    return best


if __name__ == "__main__":
    main()
