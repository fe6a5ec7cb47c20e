"""Epoch driver (mirrors reference runtime.py:113-605, TPU-async).

Differences from the reference's eager loop, by design:
  - the train step is one jitted XLA program (forward+loss+backward+update)
    with donated state buffers;
  - loss scalars are fetched with a ONE-STEP DELAY: step N's device->host
    read happens while step N+1 runs, so the accelerator never idles on the
    reference's per-batch `.item()` sync (runtime.py:182-183,228);
  - the NaN fail-fast assert (runtime.py:183) runs on the delayed value.
"""

import collections
import logging
import os
import time

import numpy as np

from tqdm import tqdm

from .logbook import LoggingBlock, logbook as _logbook_write
from .meters import MovingAverage
from ..utils.flow_io import write_flow, write_flow_png
from ..utils.flow_viz import flow_to_rgb_middlebury


def _progressbar(iterable, desc, total=None, unit="it"):
    return tqdm(iterable, desc=desc, total=total, unit=unit, leave=True,
                dynamic_ncols=True, ascii=True, smoothing=0.0)


def _fetch_floats(loss_dict):
    if "_packed" in loss_dict:
        # one transfer for all scalars (parallel/train.py pack_losses):
        # per-key reads cost a device->host round-trip each
        keys = sorted(k for k in loss_dict if k != "_packed")
        vals = np.asarray(loss_dict["_packed"])
        return {k: float(v) for k, v in zip(keys, vals)}
    return {k: float(v) for k, v in loss_dict.items()}


class StageTimers:
    """Per-epoch wall-clock split (--profile): where an epoch's time goes.

    Stages: data  = waiting on the loader (host decode/stack),
            aug   = on-device augmentation dispatch,
            step  = jitted step dispatch (enqueue; async),
            drain = device->host loss fetch = time actually blocked on the
                    accelerator. data-bound epochs show large `data`;
                    device-bound epochs show large `drain`.
            ckpt  = mid-epoch checkpoint writes (--save_every_batches),
            trace = jax.profiler capture overhead (--profile_trace_dir),
            save  = eval artifact writes (EvaluationEpoch only).
    """

    def __init__(self, enabled):
        self.enabled = enabled
        self.t = collections.defaultdict(float)

    class _Span:
        def __init__(self, timers, key):
            self._timers, self._key = timers, key

        def __enter__(self):
            self._t0 = time.perf_counter()

        def __exit__(self, *exc):
            self._timers.t[self._key] += time.perf_counter() - self._t0

    def span(self, key):
        return self._Span(self, key) if self.enabled else _NULL_SPAN

    def log(self, desc, n_batches):
        if not self.enabled or not n_batches:
            return
        total = sum(self.t.values())
        parts = "  ".join("%s %.2fs (%.0f%%)" % (k, v, 100 * v / max(total, 1e-9))
                          for k, v in sorted(self.t.items()))
        logging.info("[profile] %s: %d batches, %.2fs accounted: %s",
                     desc, n_batches, total, parts)


class _NullSpan:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


_NULL_SPAN = _NullSpan()


class TrainingEpoch:
    """One training epoch over a loader of numpy batches."""

    def __init__(self, args, step_fn, loader, augmentation=None,
                 desc="Training Epoch", periodic_save=None):
        self._args = args
        self._desc = desc
        self._loader = loader
        self._step_fn = step_fn          # (state, batch) -> (state, loss_dict)
        self._augmentation = augmentation
        self._training_key = getattr(args, "training_key", "total_loss")
        # preemption insurance: save state every N batches (--save_every_batches)
        self._periodic_save = periodic_save  # callable(state, batch_index)
        self._save_every = int(getattr(args, "save_every_batches", 0) or 0)

    def _dump_nan_artifact(self, pending, loss_vals):
        """Write the offending batch + losses to <save>/nan_dump_*.npz.

        The training NaN fail-fast used to only abort; on a preemptible
        chip the supervisor then restarts from the last mid-epoch
        checkpoint and the batch that blew up is lost (the r3 synth run
        crashed 4x in epoch 9 with nothing to examine). The dump turns the
        transient into an artifact: replay it against checkpoint_latest
        with perf/nan_postmortem.py to localize where the NaN is born.
        """
        save_dir = getattr(self._args, "save", None)
        if not save_dir or pending[2] is None:
            return None
        loss_dict, _, batch, batch_idx = pending
        path = os.path.join(save_dir, "nan_dump_batch%04d.npz" % batch_idx)
        try:
            arrays = {k: np.asarray(v) for k, v in batch.items()}
            arrays.update({"loss__" + k: np.asarray(v, np.float64)
                           for k, v in loss_vals.items()})
            np.savez_compressed(path, **arrays)
            logging.warning("training_loss NaN at batch %d: post-aug batch "
                            "dumped to %s (replay: perf/nan_postmortem.py)",
                            batch_idx, path)
            return path
        except Exception as e:  # the dump must never mask the fail-fast
            logging.warning("NaN batch dump failed: %s", e)
            return None

    def _dump_nan_params(self, state, batch_idx):
        """Opt-in (--nan_dump_params): also dump the live param tree next
        to the batch dump.

        Why: both r5 postmortems failed to REPRODUCE their NaN — the
        nearest mid-epoch checkpoint (<=200 steps away) replays clean, so
        the blowup lives in the exact in-flight params that no artifact
        captured. By drain time the offending batch's own update was
        skipped in-graph (params untouched) and exactly ONE later batch
        has committed, so this dump is one update away from the tensors
        that produced the NaN — close enough for a divergence-regime
        replay. Off by default: it costs a params-sized sync + write,
        and fires at most once per epoch.
        """
        save_dir = getattr(self._args, "save", None)
        if not save_dir or not getattr(self._args, "nan_dump_params", False):
            return None
        from .checkpoint import _flatten
        path = os.path.join(save_dir,
                            "nan_dump_params_batch%04d.npz" % batch_idx)
        try:
            flat = {k: np.asarray(v)
                    for k, v in _flatten(state.params).items()}
            np.savez_compressed(path, **flat)
            logging.warning("in-flight params (one update past the NaN "
                            "forward) dumped to %s", path)
            return path
        except Exception as e:
            logging.warning("NaN params dump failed: %s", e)
            return None

    # a NaN batch that the in-graph guard contained (parallel/train.py:
    # the update was skipped, params untouched) is logged and survived;
    # more than this many in one epoch is divergence, not a transient
    MAX_NONFINITE_SKIPS = 10
    MAX_NAN_DUMPS = 2  # keep post-mortem artifacts for the first few only

    def run(self, state, aug_state=None):
        moving_averages = None
        # (loss_dict device arrays, batch_size, batch device arrays, index)
        # from the previous step; holding the batch costs one batch of HBM
        # and zero transfers — it is only fetched if the fail-fast fires
        pending = None
        nan_skips = 0
        nan_dumps = 0

        def drain(pending):
            nonlocal moving_averages, nan_skips, nan_dumps
            loss_vals = _fetch_floats(pending[0])
            tl = loss_vals[self._training_key]
            if not np.isfinite(tl):
                if nan_dumps < self.MAX_NAN_DUMPS:
                    nan_dumps += 1
                    self._dump_nan_artifact(pending, loss_vals)
                    if nan_dumps == 1:
                        # `state` reads the loop's CURRENT value: the
                        # offending update was skipped in-graph, one later
                        # batch has committed (see _dump_nan_params)
                        self._dump_nan_params(state, pending[3])
                contained = loss_vals.get("skipped_nonfinite", 0.0) >= 1.0
                assert contained, "training_loss is NaN"
                nan_skips += 1
                logging.warning(
                    "training_loss non-finite at batch %d — update skipped "
                    "in-graph, params untouched (%d this epoch)",
                    pending[3], nan_skips)
                assert nan_skips <= self.MAX_NONFINITE_SKIPS, (
                    "training_loss non-finite on %d batches this epoch — "
                    "divergence, not a transient" % nan_skips)
                return collections.OrderedDict()  # keep meters clean
            if moving_averages is None:
                moving_averages = {k: MovingAverage() for k in loss_vals
                                   if k != "skipped_nonfinite"}
            for k, v in loss_vals.items():
                if k in moving_averages:
                    moving_averages[k].add_average(v, addcount=pending[1])
            return collections.OrderedDict(
                (k + "_ema", "%1.4f" % moving_averages[k].mean())
                for k in sorted(moving_averages))

        timers = StageTimers(getattr(self._args, "profile", False))
        # consume the flag unconditionally at epoch start: exactly one
        # capture attempt per run, even if this epoch turns out too short
        # to reach the preferred start batch (ADVICE r2)
        trace_dir = getattr(self._args, "profile_trace_dir", None)
        if trace_dir and self._args is not None:
            self._args.profile_trace_dir = None
        n_batches = len(self._loader)
        if trace_dir and n_batches == 0:
            logging.warning("profile_trace_dir: empty epoch, no trace captured")
            trace_dir = None
        # skip the first 2 (compile/warmup) batches when the epoch allows it
        trace_start = 2 if n_batches > 2 else 0
        trace_active = False
        progress = _progressbar(self._loader, self._desc, total=n_batches)
        stream_every = max(1, n_batches // 10)
        it = enumerate(progress)
        n = 0

        def stop_trace(loss_dict):
            # complete the traced steps before stopping; the fetch is trace
            # overhead, not drain time (the same loss_dict is drained again
            # by the normal delayed path, which then finds it host-ready)
            import jax
            with timers.span("trace"):
                _fetch_floats(loss_dict)
                jax.profiler.stop_trace()

        while True:
            with timers.span("data"):
                try:
                    i, batch = next(it)
                except StopIteration:
                    break
            n += 1
            if trace_dir and i == trace_start:
                import jax
                jax.profiler.start_trace(trace_dir)
                trace_active = True
            batch = {k: v for k, v in batch.items()
                     if isinstance(v, np.ndarray) and v.dtype != object}
            if self._augmentation is not None:
                with timers.span("aug"):
                    batch, aug_state = self._augmentation(batch, aug_state)
            batch_size = batch["input1"].shape[0]
            with timers.span("step"):
                state, loss_dict = self._step_fn(state, batch)
            if pending is not None:
                with timers.span("drain"):
                    progress.set_postfix(drain(pending))
            pending = (loss_dict, batch_size, batch, i)
            if (self._periodic_save is not None and self._save_every
                    and (i + 1) % self._save_every == 0):
                # the host read inside the save syncs on the in-flight step;
                # amortized over save_every batches this is noise
                with timers.span("ckpt"):
                    self._periodic_save(state, i + 1)
            if trace_active and i == trace_start + 3:
                stop_trace(loss_dict)
                trace_active = False
                trace_dir = None
            # stream bar snapshots into the logbook during the epoch, like
            # the reference's TqdmToLogger (tools.py:328-378)
            if (i + 1) % stream_every == 0:
                _logbook_write(str(progress))
        if trace_active:
            # short epoch (< 6 batches): still finish and write the trace
            stop_trace(pending[0] if pending is not None else {})
        if pending is not None:
            with timers.span("drain"):
                progress.set_postfix(drain(pending))
        progress.close()
        _logbook_write(str(progress))
        timers.log(self._desc, n)

        ema = {k: m.mean() for k, m in (moving_averages or {}).items()}
        if nan_skips:
            logging.warning("epoch had %d non-finite batches (updates "
                            "skipped in-graph)", nan_skips)
            ema["nan_skipped_batches"] = nan_skips
        return state, ema, aug_state


class EvaluationEpoch:
    """One evaluation epoch (mirrors runtime.py:258-469)."""

    def __init__(self, args, eval_fn, loader, augmentation=None,
                 desc="Evaluation Epoch"):
        self._args = args
        self._desc = desc
        self._loader = loader
        self._eval_fn = eval_fn          # (params, batch) -> (loss_dict, output_dict)
        self._augmentation = augmentation
        self._save_output = bool(
            getattr(args, "save_result_img", False)
            or getattr(args, "save_result_flo", False)
            or getattr(args, "save_result_png", False))

    def save_outputs(self, example_dict, output_dict):
        """Write eval artifacts (runtime.py:276-351): Middlebury viz /
        occlusion PNGs under save/img, .flo / KITTI 16-bit PNG under save/flo."""
        from PIL import Image
        args = self._args
        save_root_img = os.path.join(args.save, "img")
        save_root_flo = os.path.join(args.save, "flo")
        flow_f = np.asarray(output_dict["flow"])          # (B, H, W, 2)
        b_size = flow_f.shape[0]
        bidir = getattr(args, "save_result_bidirection", False)
        if bidir:
            flow_b = np.asarray(output_dict["flow_b"])
        if getattr(args, "save_result_occ", False):
            occ = np.round(1 / (1 + np.exp(-np.asarray(output_dict["occ"])))) * 255
            if bidir:
                occ_b = np.round(1 / (1 + np.exp(-np.asarray(output_dict["occ_b"])))) * 255

        basenames = example_dict["basename"]
        basedirs = example_dict.get("basedir", [""] * b_size)
        # pre-pad native sizes (bucket-and-pad eval, datasets.py
        # pad_to_multiple): artifacts are cropped back, e.g. KITTI
        # submission PNGs must be native-resolution
        sizes = example_dict.get("input_size")
        for ii in range(b_size):
            if sizes is not None:
                hh, ww = int(sizes[ii][0]), int(sizes[ii][1])
            else:
                hh, ww = flow_f[ii].shape[:2]
            img_base = os.path.join(save_root_img, str(basedirs[ii]), str(basenames[ii]))
            flo_base = os.path.join(save_root_flo, str(basedirs[ii]), str(basenames[ii]))
            os.makedirs(os.path.dirname(img_base), exist_ok=True)
            os.makedirs(os.path.dirname(flo_base), exist_ok=True)

            if getattr(args, "save_result_img", False):
                if getattr(args, "save_result_occ", False):
                    o = np.repeat(occ[ii, :hh, :ww].astype(np.uint8), 3, axis=-1)
                    Image.fromarray(o).save(img_base + "_occ.png")
                    if bidir:
                        ob = np.repeat(occ_b[ii, :hh, :ww].astype(np.uint8), 3, axis=-1)
                        Image.fromarray(ob).save(img_base + "_occ_b.png")
                Image.fromarray(flow_to_rgb_middlebury(flow_f[ii, :hh, :ww])).save(
                    img_base + "_flow.png")
                if bidir:
                    Image.fromarray(flow_to_rgb_middlebury(flow_b[ii, :hh, :ww])).save(
                        img_base + "_flow_b.png")
            if getattr(args, "save_result_flo", False):
                write_flow(flo_base + ".flo", flow_f[ii, :hh, :ww])
            if getattr(args, "save_result_png", False):
                write_flow_png(flo_base + ".png", flow_f[ii, :hh, :ww])

    def run(self, params, aug_state=None):
        moving_averages = None
        nan_batches = collections.Counter()   # metric -> non-finite batches
        progress = _progressbar(self._loader, self._desc, total=len(self._loader))
        stream_every = max(1, len(self._loader) // 10)
        pending = None  # (loss_dict device arrays, batch_size, batch index)

        def drain(p):
            # fetch the PREVIOUS batch's losses while the current batch is
            # in flight on device — same async pattern as TrainingEpoch
            # (the reference reads every batch synchronously,
            # runtime.py:436-448; a per-batch device sync caps throughput)
            nonlocal moving_averages
            ld, bs, bi = p
            loss_vals = _fetch_floats(ld)
            if moving_averages is None:
                moving_averages = {k: MovingAverage() for k in loss_vals}
            # eval counterpart of the training NaN fail-fast: a non-finite
            # metric batch is warned about and EXCLUDED from the epoch
            # average (aborting eval would lose the epoch; silently
            # averaging NaN corrupts best-checkpoint selection and the
            # stats sidecars — which is what happened on the r3 synth run)
            bad = sorted(k for k, v in loss_vals.items() if not np.isfinite(v))
            if bad:
                nan_batches.update(bad)
                logging.warning(
                    "Evaluation batch %d: non-finite metric(s) %s — "
                    "excluded from the epoch average", bi, ", ".join(bad))
            for k, v in loss_vals.items():
                if np.isfinite(v):
                    moving_averages[k].add_average(v, addcount=bs)
            return collections.OrderedDict(
                (k + "_avg", "%1.4f" % moving_averages[k].mean())
                for k in sorted(moving_averages))

        timers = StageTimers(getattr(self._args, "profile", False))
        it = enumerate(progress)
        n = 0
        while True:
            with timers.span("data"):
                try:
                    i, batch = next(it)
                except StopIteration:
                    break
            n += 1
            if (i + 1) % stream_every == 0:
                _logbook_write(str(progress))
            meta = {k: v for k, v in batch.items()
                    if not isinstance(v, np.ndarray) or v.dtype == object}
            batch = {k: v for k, v in batch.items()
                     if isinstance(v, np.ndarray) and v.dtype != object}
            if self._augmentation is not None:
                with timers.span("aug"):
                    batch, aug_state = self._augmentation(batch, aug_state)
            batch_size = batch["input1"].shape[0]
            with timers.span("step"):
                loss_dict, output_dict = self._eval_fn(params, batch)
            if self._save_output:
                with timers.span("save"):
                    meta.setdefault("basename", [str(i) for i in batch.get(
                        "index", range(batch_size))])
                    self.save_outputs(meta, output_dict)
            if pending is not None:
                with timers.span("drain"):
                    progress.set_postfix(drain(pending))
            pending = (loss_dict, batch_size, i)
        if pending is not None:
            with timers.span("drain"):
                progress.set_postfix(drain(pending))
        progress.close()
        _logbook_write(str(progress))
        timers.log(self._desc, n)
        stats = {k: m.mean() for k, m in (moving_averages or {}).items()}
        for k, c in sorted(nan_batches.items()):
            logging.warning("Evaluation: metric %s was non-finite on %d/%d "
                            "batches", k, c, n)
            if moving_averages[k]._count == 0:
                # EVERY batch was non-finite: report NaN loudly rather than
                # the meter's empty-default 0.0 (a 0.0 epe would win
                # best-checkpoint selection)
                stats[k] = float("nan")
            stats[k + "_nan_batches"] = c
        return stats


def exec_runtime(args, checkpoint_saver, state, step_fn, eval_fn,
                 train_loader, validation_loader,
                 training_augmentation=None, validation_augmentation=None,
                 lr_for_epoch=None, set_lr=None, plateau_scheduler=None):
    """Epoch loop with best-checkpoint selection (runtime.py:472-605).

    lr_for_epoch(epoch) -> lr implements the torch scheduler contract
    (MultiStepLR etc.); set_lr(state, lr) -> state applies it.

    plateau_scheduler: a ReduceLROnPlateau instance, stepped with the
    validation key after each evaluation epoch. (The reference marks this
    case at runtime.py:487 but then calls `lr_scheduler.step()` WITHOUT the
    metric at :570 — which raises in torch, so ReduceLROnPlateau is dead
    code there. Here it is wired as intended: step(validation_loss), the
    reduced lr takes effect from the next epoch via lr_for_epoch.)
    """
    with LoggingBlock("Runtime", emph=True):
        logging.info("start_epoch: %i", args.start_epoch)
        logging.info("total_epochs: %i", args.total_epochs)

    best_validation_loss = (float("inf") if args.validation_key_minimize
                            else -float("inf"))
    store_as_best = False
    avg_loss_dict = {}
    # persisted in every sidecar so a preemption resume keeps the stage's
    # LR-schedule origin (config.resolve_stage_start_epoch)
    stage_start = int(getattr(args, "_stage_start_epoch", args.start_epoch))

    # one augmentation key chain for the WHOLE run, seeded by --seed:
    # restarting it every epoch would replay the identical jitter/affine
    # parameter sequence each epoch (the host path gets fresh per-epoch
    # draws via dataset.set_epoch; this is the device-side equivalent)
    train_aug_state = None
    if training_augmentation is not None:
        import jax
        train_aug_state = jax.random.PRNGKey(getattr(args, "seed", 0) or 0)

    # total progress over epochs; every update is streamed into the logbook
    # (reference runtime.py:505-514: logging_on_update=True on this bar)
    total_progress = _progressbar(
        range(args.start_epoch, args.total_epochs + 1), "Progress",
        total=args.total_epochs - args.start_epoch + 1, unit="ep")

    for epoch in total_progress:
        with LoggingBlock("Epoch %i/%i" % (epoch, args.total_epochs), emph=True):
            if lr_for_epoch is not None:
                lr = lr_for_epoch(epoch)
                logging.info("lr: %s", lr)
                if set_lr is not None and state is not None:
                    state = set_lr(state, lr)

            if train_loader is not None:
                periodic_save = None
                if (checkpoint_saver is not None
                        and getattr(args, "save_every_batches", 0)):
                    def periodic_save(s, batch_idx, _epoch=epoch):
                        checkpoint_saver.save_latest(
                            directory=args.save, params=s.params,
                            stats_dict={"epoch": _epoch - 1,
                                        "resume_epoch": _epoch,
                                        "phase": "mid_epoch",
                                        "batches_done": batch_idx,
                                        "stage_start_epoch": stage_start},
                            opt_state=s.opt_state)
                state, avg_loss_dict, train_aug_state = TrainingEpoch(
                    args, step_fn, train_loader,
                    augmentation=training_augmentation, desc="   Train",
                    periodic_save=periodic_save).run(
                        state, aug_state=train_aug_state)
                if checkpoint_saver is not None and state is not None \
                        and validation_loader is not None:
                    # bank the epoch's training before validation starts:
                    # a crash during validation keeps the trained weights
                    checkpoint_saver.save_latest(
                        directory=args.save, params=state.params,
                        stats_dict=dict(avg_loss_dict, epoch=epoch,
                                        resume_epoch=epoch + 1,
                                        phase="trained",
                                        stage_start_epoch=stage_start),
                        opt_state=state.opt_state)

            if validation_loader is not None:
                params = state.params if state is not None else None
                avg_loss_dict = EvaluationEpoch(
                    args, eval_fn, validation_loader,
                    augmentation=validation_augmentation, desc="Validate").run(params)
                validation_loss = avg_loss_dict[args.validation_key]
                if not np.isfinite(validation_loss):
                    logging.warning(
                        "validation %s is non-finite (%s) — epoch not "
                        "eligible for best-checkpoint selection",
                        args.validation_key, validation_loss)
                    store_as_best = False
                elif args.validation_key_minimize:
                    store_as_best = validation_loss < best_validation_loss
                else:
                    store_as_best = validation_loss > best_validation_loss
                if store_as_best:
                    best_validation_loss = validation_loss
                logging.info("best %s: %1.4f", args.validation_key, best_validation_loss)
                if plateau_scheduler is not None:
                    plateau_scheduler.step(validation_loss)

            if checkpoint_saver is not None and state is not None:
                checkpoint_saver.save_latest(
                    directory=args.save,
                    params=state.params,
                    stats_dict=dict(avg_loss_dict, epoch=epoch,
                                    resume_epoch=epoch + 1,
                                    phase="validated",
                                    stage_start_epoch=stage_start),
                    store_as_best=store_as_best,
                    opt_state=state.opt_state)
        if validation_loader is not None and np.isfinite(best_validation_loss):
            total_progress.set_postfix(collections.OrderedDict(
                [("best_" + args.validation_key,
                  "%1.4f" % best_validation_loss)]))
        _logbook_write(str(total_progress))
    total_progress.close()
    logging.info("Finished.")
    return state, best_validation_loss
