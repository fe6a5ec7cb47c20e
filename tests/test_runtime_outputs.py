"""Eval artifact writers (runtime.py:276-351 contract): .flo, KITTI PNG,
Middlebury viz and occlusion images land in save/{img,flo}/<basedir>/."""

import os
import types

import numpy as np

from irr_tpu.runtime.loop import EvaluationEpoch
from irr_tpu.data.common import read_flo, read_png16_flow


def test_save_outputs_writes_all_artifacts(tmp_path):
    args = types.SimpleNamespace(
        save=str(tmp_path), save_result_img=True, save_result_flo=True,
        save_result_png=True, save_result_occ=True,
        save_result_bidirection=True)
    epoch = EvaluationEpoch(args, eval_fn=None, loader=None)

    rng = np.random.RandomState(0)
    b, h, w = 2, 16, 24
    output = {
        "flow": rng.randn(b, h, w, 2).astype(np.float32),
        "flow_b": rng.randn(b, h, w, 2).astype(np.float32),
        "occ": rng.randn(b, h, w, 1).astype(np.float32),
        "occ_b": rng.randn(b, h, w, 1).astype(np.float32),
    }
    example = {"basename": ["frame_0001", "frame_0002"],
               "basedir": ["clean/alley_1", "clean/alley_1"]}
    epoch.save_outputs(example, output)

    base = os.path.join(str(tmp_path), "img", "clean/alley_1", "frame_0001")
    for suffix in ("_flow.png", "_flow_b.png", "_occ.png", "_occ_b.png"):
        assert os.path.isfile(base + suffix), suffix
    flo_base = os.path.join(str(tmp_path), "flo", "clean/alley_1", "frame_0001")
    got = read_flo(flo_base + ".flo")
    np.testing.assert_array_equal(got, output["flow"][0])
    got_png, _ = read_png16_flow(flo_base + ".png")
    np.testing.assert_allclose(got_png, output["flow"][0], atol=1 / 64)

    # bucket-and-pad eval: with input_size metadata the artifacts are
    # cropped back to native resolution (KITTI submission contract)
    example2 = {"basename": ["k_0001", "k_0002"],
                "input_size": [(13, 21), (14, 19)]}
    epoch.save_outputs(example2, output)
    flo2 = os.path.join(str(tmp_path), "flo", "k_0001")
    got2 = read_flo(flo2 + ".flo")
    assert got2.shape == (13, 21, 2)
    np.testing.assert_array_equal(got2, output["flow"][0][:13, :21])
    got2_png, _ = read_png16_flow(flo2 + ".png")
    assert got2_png.shape == (13, 21, 2)


def test_profile_trace_consumed_on_short_epoch(tmp_path, monkeypatch):
    """--profile_trace_dir captures exactly once even when the first epoch
    is shorter than the preferred [2, 5] batch window, and the flag is
    consumed at epoch start so later epochs never silently retry (ADVICE r2)."""
    import jax.profiler
    from irr_tpu.runtime.loop import TrainingEpoch

    calls = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: calls.append(("start", d)))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: calls.append(("stop", None)))

    def step_fn(state, batch):
        return state, {"total_loss": np.float32(1.0)}

    batch = {"input1": np.zeros((2, 8, 8, 3), np.float32)}
    args = types.SimpleNamespace(profile=False,
                                 profile_trace_dir=str(tmp_path))
    epoch = TrainingEpoch(args, step_fn, [batch, batch])  # 2 batches < window
    epoch.run(state=None)
    assert calls == [("start", str(tmp_path)), ("stop", None)]
    assert args.profile_trace_dir is None  # consumed
    epoch2 = TrainingEpoch(args, step_fn, [batch, batch])
    epoch2.run(state=None)
    assert len(calls) == 2  # no re-capture


def test_aug_key_threads_across_epochs(tmp_path):
    """The augmentation key chain advances across epochs (seeded by
    --seed): restarting it every epoch would replay the identical
    jitter/affine parameter sequence each epoch."""
    import jax
    from irr_tpu.runtime.loop import exec_runtime

    keys_seen = []

    def aug(batch, key):
        keys_seen.append(np.asarray(jax.random.key_data(key)).copy())
        key, _ = jax.random.split(key)
        return batch, key

    def step_fn(state, batch):
        return state, {"total_loss": np.float32(1.0)}

    batch = {"input1": np.zeros((2, 8, 8, 3), np.float32)}
    args = types.SimpleNamespace(
        profile=False, profile_trace_dir=None, save=str(tmp_path),
        start_epoch=1, total_epochs=2, validation_key="total_loss",
        validation_key_minimize=True, training_key="total_loss", seed=7)
    exec_runtime(args, checkpoint_saver=None, state=None, step_fn=step_fn,
                 eval_fn=None, train_loader=[batch, batch],
                 validation_loader=None, training_augmentation=aug)
    assert len(keys_seen) == 4  # 2 epochs x 2 batches
    # epoch 2 continues the chain, not a restart of epoch 1's keys
    assert not np.array_equal(keys_seen[0], keys_seen[2])
    # ... and the chain starts from --seed, not PRNGKey(0)
    np.testing.assert_array_equal(
        keys_seen[0], np.asarray(jax.random.key_data(jax.random.PRNGKey(7))))


def test_eval_nan_guard_excludes_and_marks(tmp_path, caplog):
    """A non-finite eval metric batch is warned about, excluded from the
    epoch average, and surfaced as <key>_nan_batches — never silently
    averaged into the stats sidecar (the r3 synth run wrote F1=NaN into
    checkpoint_best.json this way)."""
    import logging as _logging

    # 3 batches; F1 NaN on the last one, epe always finite
    batches = [{"input1": np.zeros((2, 8, 8, 3), np.float32)}] * 3
    vals = [(1.0, 0.5), (3.0, 0.7), (2.0, float("nan"))]
    calls = iter(vals)

    def eval_fn(params, batch):
        epe, f1 = next(calls)
        return {"epe": np.float32(epe), "F1": np.float32(f1)}, {}

    args = types.SimpleNamespace(profile=False, save=str(tmp_path))
    with caplog.at_level(_logging.WARNING):
        stats = EvaluationEpoch(args, eval_fn, batches).run(params=None)
    assert any("non-finite metric" in r.message for r in caplog.records)
    # F1 average over the two finite batches only
    np.testing.assert_allclose(stats["F1"], 0.6)
    np.testing.assert_allclose(stats["epe"], 2.0)
    assert stats["F1_nan_batches"] == 1
    assert "epe_nan_batches" not in stats


def test_eval_nan_guard_all_nan_reports_nan(tmp_path):
    """If EVERY batch of a metric is non-finite the epoch stat is NaN, not
    the meter's empty-default 0.0 (a 0.0 epe would win best-ckpt)."""
    batches = [{"input1": np.zeros((1, 8, 8, 3), np.float32)}] * 2

    def eval_fn(params, batch):
        return {"epe": np.float32("nan")}, {}

    args = types.SimpleNamespace(profile=False, save=str(tmp_path))
    stats = EvaluationEpoch(args, eval_fn, batches).run(params=None)
    assert np.isnan(stats["epe"])
    assert stats["epe_nan_batches"] == 2


def test_nonfinite_validation_never_best(tmp_path):
    """exec_runtime: a NaN validation key is not eligible for
    best-checkpoint selection (and a later finite epoch still wins)."""
    from irr_tpu.runtime.loop import exec_runtime
    from irr_tpu.runtime.checkpoint import CheckpointSaver
    import json

    epochs = iter([float("nan"), 4.0])

    def eval_fn(params, batch):
        return {"epe": np.float32(next(epochs))}, {}

    batch = {"input1": np.zeros((1, 8, 8, 3), np.float32)}
    args = types.SimpleNamespace(
        profile=False, profile_trace_dir=None, save=str(tmp_path),
        start_epoch=1, total_epochs=2, validation_key="epe",
        validation_key_minimize=True, training_key="total_loss", seed=0)

    class _State:
        params = {"w": np.zeros((1,), np.float32)}
        opt_state = None

    exec_runtime(args, checkpoint_saver=CheckpointSaver(), state=_State(),
                 step_fn=None, eval_fn=eval_fn, train_loader=None,
                 validation_loader=[batch])
    best = json.load(open(os.path.join(str(tmp_path), "checkpoint_best.json")))
    assert best["epoch"] == 2 and best["epe"] == 4.0


def test_training_nan_failfast_dumps_batch(tmp_path):
    """When the training NaN fail-fast fires, the offending post-aug batch
    and the recorded losses are dumped to <save>/nan_dump_*.npz for
    perf/nan_postmortem.py — a preempted/restarted run no longer loses the
    evidence (the r3 synth run crashed 4x in epoch 9 with nothing left to
    examine)."""
    import pytest
    from irr_tpu.runtime.loop import TrainingEpoch

    batches = [
        {"input1": np.full((2, 8, 8, 3), float(i), np.float32)}
        for i in range(3)
    ]
    losses_seq = iter([1.0, float("nan"), 2.0])

    def step_fn(state, batch):
        return state, {"total_loss": np.float32(next(losses_seq))}

    args = types.SimpleNamespace(profile=False, save=str(tmp_path),
                                 save_every_batches=0)
    with pytest.raises(AssertionError, match="training_loss is NaN"):
        TrainingEpoch(args, step_fn, batches).run(state=None)

    dumps = [f for f in os.listdir(str(tmp_path)) if f.startswith("nan_dump")]
    assert dumps == ["nan_dump_batch0001.npz"]
    data = np.load(os.path.join(str(tmp_path), dumps[0]))
    np.testing.assert_array_equal(data["input1"],
                                  batches[1]["input1"])  # the NaN batch
    assert np.isnan(data["loss__total_loss"])


def test_training_contained_nan_skips_and_survives(tmp_path, caplog):
    """A non-finite batch whose update the in-graph guard skipped
    (skipped_nonfinite=1) is warned about and survived — training
    continues, the batch stays out of the EMA meters, the epoch stats
    carry nan_skipped_batches, and a dump is written for post-mortem."""
    import logging as _logging
    from irr_tpu.runtime.loop import TrainingEpoch

    batches = [{"input1": np.zeros((2, 8, 8, 3), np.float32)}] * 4
    seq = iter([(1.0, 0.0), (float("nan"), 1.0), (3.0, 0.0), (5.0, 0.0)])

    def step_fn(state, batch):
        tl, skipped = next(seq)
        return state, {"total_loss": np.float32(tl),
                       "skipped_nonfinite": np.float32(skipped)}

    args = types.SimpleNamespace(profile=False, save=str(tmp_path),
                                 save_every_batches=0)
    with caplog.at_level(_logging.WARNING):
        _, ema, _ = TrainingEpoch(args, step_fn, batches).run(state=None)
    assert any("update skipped in-graph" in r.message for r in caplog.records)
    np.testing.assert_allclose(ema["total_loss"], 3.0)  # mean of 1, 3, 5
    assert ema["nan_skipped_batches"] == 1
    assert len([f for f in os.listdir(str(tmp_path))
                if f.startswith("nan_dump")]) == 1


def test_nan_dump_params_flag(tmp_path):
    """--nan_dump_params also captures the live param tree next to the
    batch dump (one committed update past the offending forward), in the
    checkpoint _flatten key format so nan_postmortem --params can load it
    through CheckpointSaver.restore."""
    from irr_tpu.runtime.loop import TrainingEpoch
    from irr_tpu.runtime.checkpoint import CheckpointSaver

    class _State:
        params = {"stem": {"w": np.arange(4, dtype=np.float32)},
                  "head": {"b": np.ones((2,), np.float32)}}

    batches = [{"input1": np.zeros((2, 8, 8, 3), np.float32)}] * 3
    seq = iter([(1.0, 0.0), (float("nan"), 1.0), (3.0, 0.0)])

    def step_fn(state, batch):
        tl, skipped = next(seq)
        return state, {"total_loss": np.float32(tl),
                       "skipped_nonfinite": np.float32(skipped)}

    args = types.SimpleNamespace(profile=False, save=str(tmp_path),
                                 save_every_batches=0,
                                 nan_dump_params=True)
    TrainingEpoch(args, step_fn, batches).run(state=_State())

    pdumps = [f for f in os.listdir(str(tmp_path))
              if f.startswith("nan_dump_params")]
    assert pdumps == ["nan_dump_params_batch0001.npz"]
    path = os.path.join(str(tmp_path), pdumps[0])
    data = np.load(path)
    np.testing.assert_array_equal(data["stem/w"],
                                  np.arange(4, dtype=np.float32))
    # loadable through the restore path (what --params uses)
    restored = CheckpointSaver().restore(path, _State.params)
    np.testing.assert_array_equal(restored["head"]["b"], np.ones(2))

    # default OFF: no params dump
    for f in os.listdir(str(tmp_path)):
        os.unlink(os.path.join(str(tmp_path), f))
    seq = iter([(1.0, 0.0), (float("nan"), 1.0), (3.0, 0.0)])
    args.nan_dump_params = False
    TrainingEpoch(args, step_fn, batches).run(state=_State())
    assert not [f for f in os.listdir(str(tmp_path))
                if f.startswith("nan_dump_params")]


def test_training_persistent_nan_still_failfasts(tmp_path):
    """More contained skips than MAX_NONFINITE_SKIPS in one epoch is
    divergence — the fail-fast must still abort the run."""
    import pytest
    from irr_tpu.runtime.loop import TrainingEpoch

    n = TrainingEpoch.MAX_NONFINITE_SKIPS + 2
    batches = [{"input1": np.zeros((1, 8, 8, 3), np.float32)}] * n

    def step_fn(state, batch):
        return state, {"total_loss": np.float32("nan"),
                       "skipped_nonfinite": np.float32(1.0)}

    args = types.SimpleNamespace(profile=False, save=str(tmp_path),
                                 save_every_batches=0)
    with pytest.raises(AssertionError, match="divergence"):
        TrainingEpoch(args, step_fn, batches).run(state=None)
